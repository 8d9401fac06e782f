"""Dedup-family scale rehearsal (VERDICT r6 ask #4 / r5 ask #7): run
minhash-LSH pairs + exact-substr spans once at ~10x the sf0.1 corpus size
(50k docs vs 5k) and record candidate volume, wall time, and executor-side
cache behavior, so the linear-scaling claim is empirical.

Corpus: the real sf0.1 documents replicated 10x with controlled duplicate
structure — copy 0 is the original, copies 1-2 are verbatim duplicates
(exact + near-dup signal), copies 3-9 get every 3rd token rewritten to a
copy-unique token (breaks shingle overlap: NOT near-dups).  Known ground
shape: 5k dup groups of >= 3 members each.

Run:  python tests/exp_dedup_scale_rehearsal.py [replication]
Numbers land in PERFORMANCE.md.
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    import pyspark.sql.functions as F

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import dedup

    spark = get_spark(app_name="dedup-scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n_src = src.count()
    copies = spark.range(repl).withColumnRenamed("id", "copy")
    # perturb: for copies >= 3, rewrite every 3rd token to a copy-unique
    # junk token (JVM-side transform, no Python in the corpus build)
    toks = F.split(F.col("text"), r"\s+")
    perturbed = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(
                (F.col("copy") >= 3) & (i % 3 == 0),
                F.concat(F.lit("zq"), F.col("copy").cast("string"), F.lit("x"), i.cast("string")),
            ).otherwise(t),
        ),
        " ",
    )
    corpus = (
        src.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * F.lit(1_000_000)).alias("doc_id"),
            perturbed.alias("text"),
            "copy",
        )
        .drop("copy")
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="dedup10x_")
    corpus.repartition(32).write.parquet(f"{d}/documents.parquet")
    n_total = n_src * repl
    print(f"corpus: {n_total} docs ({repl}x sf0.1) at {d}", flush=True)

    t0 = time.perf_counter()
    pairs = dedup.dedup_minhash_lsh_pairs(spark, d)
    n_pairs = pairs.count()
    t_minhash = time.perf_counter() - t0
    print(
        f"minhash_lsh: pairs={n_pairs} wall={t_minhash:.1f}s "
        f"pairs/doc={n_pairs / n_total:.2f}",
        flush=True,
    )

    t0 = time.perf_counter()
    spans = dedup.dedup_exact_substr_spans(spark, d)
    n_spans = spans.count()
    t_substr = time.perf_counter() - t0
    print(
        f"exact_substr: spans={n_spans} wall={t_substr:.1f}s "
        f"spans/doc={n_spans / n_total:.2f}",
        flush=True,
    )

    # reference point: the same two queries at 1x for the scaling ratio
    t0 = time.perf_counter()
    p1 = dedup.dedup_minhash_lsh_pairs(spark, "/root/testdata/sf0.1").count()
    t_minhash1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    s1 = dedup.dedup_exact_substr_spans(spark, "/root/testdata/sf0.1").count()
    t_substr1 = time.perf_counter() - t0
    print(
        f"1x reference: minhash pairs={p1} wall={t_minhash1:.1f}s; "
        f"substr spans={s1} wall={t_substr1:.1f}s",
        flush=True,
    )
    print(
        f"scaling: minhash {t_minhash / t_minhash1:.1f}x wall for {repl}x docs; "
        f"substr {t_substr / t_substr1:.1f}x wall for {repl}x docs",
        flush=True,
    )


if __name__ == "__main__":
    main()
