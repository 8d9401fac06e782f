"""Scale rehearsal for the round-9 text families: run the LM-rarity
filter (production V=65536) and BM25 top-k at 1x / 10x / 100x the sf0.1
documents corpus and record wall scaling.

Both queries claim scan-dominated shapes (LM: one word-count shuffle +
TakeOrdered(V) + a one-row broadcast map score; BM25: narrow HOF tf/dl
map + one single-row stats aggregate + TakeOrdered) — the rehearsal
checks the claim EXECUTES linearly, not just reads linearly, and that
the 100x corpus (500k docs, ~9M DISTINCT doc-unique junk tokens) puts a
vocab far larger than V through the word-count fit and the top-V cut.

Timing methodology: every corpus is repartitioned to 32 and pinned with
an eager localCheckpoint BEFORE timing — Spark's small-file packing
otherwise reads the 10x corpus (~30 MB) as 1-2 input partitions, and a
1-2-core run vs the 100x corpus's 32-core run falsifies the scaling
ratio (measured exactly that: bm25 "6.8x at 10x, 7.7x at 100x").  Walls
are MIN of 5 (this host shows 13x pass-to-pass variance on fixed work —
shared-host CPU steal) with a fixed-work canary per scale.

Run:  python tests/exp_text_scale_rehearsal.py [max_replication]
(defaults to 100; prints one summary line per scale)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time


def main() -> None:
    max_repl = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    import pyspark.sql.functions as F

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries.search import bm25_topk_df
    from thesis_iceberg_spark.queries.text import LM_VOCAB_SIZE, lm_rarity_df
    from thesis_iceberg_spark.sources.registry import load_table

    spark = get_spark(app_name="text-scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def build(repl: int) -> str:
        copies = spark.range(repl).withColumnRenamed("id", "copy")
        toks = F.split(F.col("text"), r"\s+")
        # copies >= 3 rewrite every 3rd token to a DOC-unique junk token
        # (keyed on doc_id + copy + position), so distinct tokens grow
        # with the corpus (~9M at 100x) and the top-V=65536 cut plus the
        # OOV arm are genuinely exercised, not just the word count
        perturbed = F.array_join(
            F.transform(
                toks,
                lambda t, i: F.when(
                    (F.col("copy") >= 3) & (i % 3 == 0),
                    F.concat(
                        F.lit("zq"),
                        F.col("doc_id").cast("string"),
                        F.lit("c"),
                        F.col("copy").cast("string"),
                        F.lit("x"),
                        i.cast("string"),
                    ),
                ).otherwise(t),
            ),
            " ",
        )
        corpus = src.crossJoin(copies).select(
            (F.col("doc_id") + F.col("copy") * F.lit(1_000_000)).alias("doc_id"),
            perturbed.alias("text"),
        )
        d = tempfile.mkdtemp(prefix=f"textscale{repl}x_")
        corpus.repartition(32).write.parquet(f"{d}/documents.parquet")
        return d

    def timeit(fn, runs: int = 5) -> float:
        # MIN of 5, not median of 3: this host showed 13x pass-to-pass
        # variance on FIXED JVM work (shared-host CPU steal) — min is the
        # standard noise-robust throughput estimator under external
        # contention, and each scale also prints a fixed-work canary so
        # drift between scales is visible
        fn()  # warm (plan + JIT)
        return round(
            min(
                (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
                for _ in range(runs)
            ),
            3,
        )

    def canary() -> float:
        return timeit(
            lambda: spark.range(0, 100_000_000, 1, 32)
            .select(F.expr("bit_xor(xxhash64(id))"))
            .collect(),
            runs=5,
        )

    base = {}
    for repl in [r for r in (1, 10, 100) if r <= max_repl]:
        d = build(repl)
        # pin partitioning + materialize BEFORE timing (see module doc:
        # small-file packing would otherwise under-parallelize small scales)
        docs = (
            load_table(spark, d, "documents")
            .repartition(32)
            .localCheckpoint(eager=True)
        )
        n = docs.count()
        n_tok = docs.select(
            F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).alias("s")
        ).first()["s"]

        t_lm = timeit(
            lambda: lm_rarity_df(spark, docs, v=LM_VOCAB_SIZE)
            .agg(F.count(F.lit(1)), F.sum("n_oov"))
            .collect()
        )
        t_ppl = timeit(
            lambda: lm_rarity_df(spark, docs, v=LM_VOCAB_SIZE, perplexity=True)
            .agg(F.count(F.lit(1)), F.sum("ppl"))
            .collect()
        )
        t_bm = timeit(lambda: bm25_topk_df(spark, docs).collect())
        # corpus is pinned by the localCheckpoint; the parquet (hundreds
        # of MB at 100x) must not accumulate in /tmp across runs
        shutil.rmtree(d, ignore_errors=True)
        base.setdefault("lm", t_lm)
        base.setdefault("ppl", t_ppl)
        base.setdefault("bm", t_bm)
        print(
            f"repl={repl:>3} docs={n:>7} tokens={n_tok:>9} "
            f"lm_rarity={t_lm:.3f}s ({t_lm / base['lm']:.1f}x) "
            f"lm_ppl={t_ppl:.3f}s ({t_ppl / base['ppl']:.1f}x) "
            f"bm25={t_bm:.3f}s ({t_bm / base['bm']:.1f}x) "
            f"canary={canary():.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
