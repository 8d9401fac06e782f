"""Per-component profile of pipeline_pretrain_corpus's GATED stage
(VERDICT r15 next-round #1): the 1.96 s steady block between pass B and
the budget stage has never had its own decomposition.  Reproduces the
composition's internals verbatim and times each component in isolation
(noop sink, eager checkpoints to cut lineage between probes), 3 warm
passes each in one JVM, median reported.

Usage: PYTHONPATH=/root/repo python tests/exp_r16_pretrain_profile.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import queries
    from thesis_iceberg_spark.queries.bpe import BPE_MERGES, bpe_encode_df
    from thesis_iceberg_spark.queries.classify import (
        hashed_classifier_score_expr,
        hashed_classifier_weights,
    )
    from thesis_iceberg_spark.queries.dedup import (
        _capped_shingles,
        _norm,
        edit_verify_pairs,
        ngram_jaccard_pairs_from_shingles,
    )
    from thesis_iceberg_spark.queries.pipeline_q import (
        _EMAIL_RE,
        _PHONE_RE,
        _keyed_u32,
        PRETRAIN_EDIT_SIM_MIN,
        PRETRAIN_HC_SCORE_MIN,
        PRETRAIN_MIN_STOP_HITS,
        QUALITY_MIN,
        decontaminate_from_shingles,
        token_budget_select_df,
    )
    from thesis_iceberg_spark.queries.text import (
        GOPHER_MAX_SYMBOL_WORD_RATIO,
        GOPHER_MIN_ALPHA_WORD_FRAC,
        c4_badwords_flags_df,
        fingerprint_expr,
        garbage_flags_df,
        gopher_lexical_flags_df,
        lang_id_df,
        quality_frame,
    )
    from thesis_iceberg_spark.sources.registry import load_table

    queries()
    spark = get_spark(app_name="exp_r16_pretrain_profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def canary() -> float:
        a = np.full((1024, 1024), 1.0003, dtype=np.float64)
        t0 = time.perf_counter()
        for _ in range(8):
            a = np.clip(a @ a, 0.5, 1.5)
        return time.perf_counter() - t0

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    results: dict[str, float] = {}

    def probe(label: str, fn) -> None:
        ts = []
        for _ in range(PASSES):
            sc.setJobDescription(f"profile: {label}")
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        results[label] = statistics.median(ts)
        print(f"  {label:42s} med {results[label]:6.3f}s  all "
              f"{[round(v, 3) for v in ts]}", flush=True)

    print(f"canary_numpy={statistics.median(canary() for _ in range(3)):.3f}s "
          "(quiet band ~0.10-0.15)")

    docs = load_table(spark, sf_dir, "documents")
    scrub = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    staged = docs.select("doc_id", "source", "lang", scrub.alias("text"))

    def build_feats():
        gflags = garbage_flags_df(
            staged, keep_cols=("source", "lang", "text")
        ).select("doc_id", "source", "lang", "text", F.col("keep").alias("garbage_keep"))
        return (
            c4_badwords_flags_df(
                gopher_lexical_flags_df(
                    lang_id_df(
                        quality_frame(
                            gflags, keep_cols=("source", "lang", "text", "garbage_keep")
                        ),
                        keep_cols=("source", "lang", "text", "garbage_keep",
                                   "n_tokens", "quality_score"),
                    ),
                    keep_cols=("source", "lang", "text", "garbage_keep",
                               "n_tokens", "quality_score", "detected_lang"),
                ).withColumn(
                    "gopher_keep",
                    (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_WORD_FRAC)
                    & (F.col("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_WORD_RATIO)
                    & (F.col("n_stop_hits") >= PRETRAIN_MIN_STOP_HITS),
                ),
                keep_cols=("source", "lang", "text", "garbage_keep", "n_tokens",
                           "quality_score", "detected_lang", "gopher_keep"),
            )
            .withColumnRenamed("keep", "c4_keep")
            .select(
                "doc_id", "source", "lang", "n_tokens", "quality_score",
                "detected_lang", "garbage_keep", "gopher_keep", "c4_keep",
                fingerprint_expr().alias("fingerprint"),
                _norm().alias("norm_text"),
            )
            .localCheckpoint(eager=True)
        )

    # --- pass A ---------------------------------------------------------
    feats_box = {}
    def pass_a():
        feats_box["feats"] = build_feats()
    probe("passA: fused feature projection + ckpt", pass_a)
    feats = feats_box["feats"]
    n = feats.count()

    # --- pass B ---------------------------------------------------------
    sh_box = {}
    def pass_b():
        sh_box["sh"] = _capped_shingles(staged, n, hash_keys=True)
    probe("passB: capped shingle explode + ckpt", pass_b)
    sh = sh_box["sh"]

    # --- gated-stage components, isolated by checkpoint fences ----------
    probe("g1: jaccard self-join (cand pairs)",
          lambda: force(ngram_jaccard_pairs_from_shingles(sh).select("doc_a", "doc_b")))
    cand_pairs = (
        ngram_jaccard_pairs_from_shingles(sh)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    nt = feats.select("doc_id", F.col("norm_text").alias("t"))
    probe("g2: banded edit verify (from ckpt pairs)",
          lambda: force(edit_verify_pairs(cand_pairs, nt,
                                          min_sim=PRETRAIN_EDIT_SIM_MIN)))
    probe("g3: decontaminate containment join",
          lambda: force(decontaminate_from_shingles(sh)))

    hc_toks = F.filter(
        F.split(F.coalesce(F.col("norm_text"), F.lit("")), " "),
        lambda t: t != F.lit(""),
    )
    probe("g4: classifier fit (weights)",
          lambda: force(hashed_classifier_weights(feats, toks_col=hc_toks)))
    hc_w = hashed_classifier_weights(feats, toks_col=hc_toks).localCheckpoint(eager=True)

    probe("g5: classifier score gate alone",
          lambda: force(
              feats.crossJoin(F.broadcast(hc_w)).select(
                  "doc_id",
                  (hashed_classifier_score_expr(hc_toks) > PRETRAIN_HC_SCORE_MIN)
                  .alias("hc_keep"),
              )
          ))

    canon = F.min("doc_id").over(Window.partitionBy("fingerprint"))
    probe("g6: canonical window over feats",
          lambda: force(feats.select("doc_id", canon.alias("canonical"))))

    fuzzy_victims = (
        edit_verify_pairs(cand_pairs, nt, min_sim=PRETRAIN_EDIT_SIM_MIN)
        .select(F.col("doc_b").alias("doc_id"))
        .localCheckpoint(eager=True)
    )
    contaminated = (
        decontaminate_from_shingles(sh).select("doc_id").localCheckpoint(eager=True)
    )

    def gated_txt_df():
        return (
            feats.crossJoin(F.broadcast(hc_w))
            .withColumn("canonical", canon)
            .filter(
                F.col("garbage_keep")
                & (hashed_classifier_score_expr(hc_toks) > PRETRAIN_HC_SCORE_MIN)
                & (F.col("quality_score") >= QUALITY_MIN)
                & (F.col("detected_lang") == "en")
                & F.col("gopher_keep")
                & F.col("c4_keep")
                & (_keyed_u32("split:") % 100 < 90)
                & (F.col("doc_id") == F.col("canonical"))
            )
            .join(fuzzy_victims, "doc_id", "left_anti")
            .join(contaminated, "doc_id", "left_anti")
            .select("doc_id", "source", "quality_score",
                    F.col("norm_text").alias("text"))
        )

    probe("g7: gate filter + anti-joins (inputs ckpt)",
          lambda: force(gated_txt_df()))
    gated_txt = gated_txt_df().localCheckpoint(eager=True)

    probe("g8: BPE encode over survivors",
          lambda: force(bpe_encode_df(gated_txt, list(BPE_MERGES),
                                      keep_cols=("source", "quality_score"))))

    gated = (
        bpe_encode_df(gated_txt, list(BPE_MERGES),
                      keep_cols=("source", "quality_score"))
        .select("doc_id", "source", "quality_score",
                F.col("n_subwords").cast("bigint").alias("n_tokens"))
        .localCheckpoint(eager=True)
    )

    # --- tail stages for reference ---------------------------------------
    probe("t1: token budget select",
          lambda: force(token_budget_select_df(gated, pre_scored=True)
                        .select("doc_id", "n_tokens")))

    print("\nsummary (medians):")
    total = 0.0
    for k, v in results.items():
        total += v
        print(f"  {k:42s} {v:6.3f}s")
    print(f"  {'TOTAL probed':42s} {total:6.3f}s")
    print(f"canary_numpy_end={statistics.median(canary() for _ in range(3)):.3f}s")


if __name__ == "__main__":
    main()
