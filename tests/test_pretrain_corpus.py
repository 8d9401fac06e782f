"""pipeline_pretrain_corpus (r11, VERDICT r10 #6): the end-to-end
composition's plan audit + stage semantics.

Correctness vs the composed DuckDB oracle is covered by the driver
harness (and by tests/test_correctness.py, which parametrizes every
registered query); this file pins the SCALE claims the composition makes:
the per-doc feature stage is ONE fused text scan, the final plan reads
text from no parquet scan at all (both text passes are staged), and the
stage gates behave on crafted corpora.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thesis_iceberg_spark.plans import formatted_plan
from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.sources.registry import load_table

queries()


def _text_file_scans(plan: str) -> int:
    """Count parquet FileScans whose ReadSchema includes the text column."""
    n = 0
    for line in plan.splitlines():
        if "ReadSchema" in line and "text:string" in line:
            n += 1
    return n


def test_feature_stage_is_one_fused_scan(spark, sf_dir):
    # the pass-A chain from the composition, rebuilt from the public
    # helpers: scrub -> quality -> lang -> gopher-lexical -> c4 ->
    # fingerprint must collapse into ONE parquet scan (pure projections;
    # the keep_cols threading exists for exactly this)
    from thesis_iceberg_spark.queries.pipeline_q import _EMAIL_RE, _PHONE_RE
    from thesis_iceberg_spark.queries.text import (
        c4_badwords_flags_df,
        fingerprint_expr,
        gopher_lexical_flags_df,
        lang_id_df,
        quality_frame,
    )

    docs = load_table(spark, sf_dir, "documents")
    scrub = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    staged = docs.select("doc_id", "source", scrub.alias("text"))
    feats = c4_badwords_flags_df(
        gopher_lexical_flags_df(
            lang_id_df(
                quality_frame(staged, keep_cols=("source", "text")),
                keep_cols=("source", "text", "n_tokens", "quality_score"),
            ),
            keep_cols=("source", "text", "n_tokens", "quality_score", "detected_lang"),
        ).withColumnRenamed("keep", "gopher_keep"),
        keep_cols=("source", "text", "n_tokens", "quality_score", "detected_lang"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        "quality_score",
        "detected_lang",
        fingerprint_expr().alias("fingerprint"),
    )
    plan = formatted_plan(feats)
    assert _text_file_scans(plan) == 1, plan


def test_final_plan_reads_no_raw_text(spark, sf_dir):
    # both text passes are checkpointed stages: the composed query's final
    # plan must contain ZERO parquet scans of the text column (everything
    # downstream runs on narrow staged projections)
    df = REGISTRY["pipeline_pretrain_corpus"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert _text_file_scans(plan) == 0, plan


def test_composition_output_shape(spark, sf_dir):
    rows = REGISTRY["pipeline_pretrain_corpus"].fn(spark, sf_dir).collect()
    assert rows, "composition produced an empty corpus at driver scale"
    # pack ids are dense-from-zero per source and doc_ids unique
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        packs = sorted({r.pack_id for r in rs})
        assert packs[0] == 0, (src, packs)
        assert packs == list(range(len(packs))), (src, packs)


def test_every_stage_actually_gates(spark, sf_dir):
    """Per-stage non-vacuity (review r11: `0 < final < all` alone lets any
    single stage silently no-op).  Each ACTIVE stage is shown to have real
    work at driver scale via its own registered operator; the stages that
    ARE no-ops on this synthetic corpus are pinned explicitly so a corpus
    change that activates them is a deliberate event:
      * quality >= 0.5: every synthetic doc scores above it;
      * Gopher alpha/symbol arms: synthetic text is all-alpha; the
        stop-hits arm is the relaxed PRETRAIN_MIN_STOP_HITS=1;
      * C4 badwords: the corpus contains none (crafted badword corpora
        exercise the operator in test_c4 suites);
      * exact dedup: the generator emits no byte-identical documents
        (fuzzy dedup is the active dedup stage here)."""
    from thesis_iceberg_spark.queries.pipeline_q import PRETRAIN_MIN_STOP_HITS

    assert PRETRAIN_MIN_STOP_HITS == 1  # the documented corpus tuning
    docs = load_table(spark, sf_dir, "documents")
    n_all = docs.count()
    # active stage: language gate removes the non-'en' documents
    n_en = (
        REGISTRY["text_lang_id"].fn(spark, sf_dir)
        .filter("detected_lang = 'en'")
        .count()
    )
    assert 0 < n_en < n_all
    # active stage: the 90/10 split removes ~10%
    splits = {
        r.split: r.n_docs
        for r in REGISTRY["pipeline_train_eval_split"].fn(spark, sf_dir).collect()
    }
    assert splits.get("train", 0) > 0 and splits.get("eval", 0) > 0
    # active stage: fuzzy dedup has victims, decontamination has hits
    assert REGISTRY["dedup_ngram_jaccard_pairs"].fn(spark, sf_dir).count() > 0
    assert REGISTRY["pipeline_decontaminate"].fn(spark, sf_dir).count() > 0
    # budget + mixture: the final corpus is a strict subset of the gated
    # set (token budget halves the mass; mixture rebalances the sources)
    n_final = REGISTRY["pipeline_pretrain_corpus"].fn(spark, sf_dir).count()
    assert 0 < n_final < n_en
