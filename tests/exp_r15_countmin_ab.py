"""Interleaved A/B: single-tokenize countmin_topk_df (r15) vs the
two-pass pre-r15 form (separate corpus tokenize for the sketch cells and
for the exact counts).  Same JVM, alternating passes — host drift
cancels pairwise (the r12 methodology).

Usage: PYTHONPATH=/root/repo python tests/exp_r15_countmin_ab.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 7


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import numpy as np
    from pyspark.sql import functions as F

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import queries
    from thesis_iceberg_spark.queries.text import (
        CM_ROWS,
        CM_TOPK,
        _cm_hash,
        _docs,
        _lm_ftoks,
        countmin_sketch_df,
        countmin_topk_df,
    )

    queries()
    spark = get_spark(app_name="exp_r15_countmin_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def old_form(docs):
        """The pre-r15 two-pass shape, reproduced explicitly (the
        registered form now stages one token-counts frame)."""
        toks = docs.select(F.explode(_lm_ftoks()).alias("t"))
        js = F.array([F.lit(j) for j in range(CM_ROWS)])
        cells = countmin_sketch_df(docs)
        top = (
            toks.groupBy("t")
            .agg(F.count("*").alias("exact_n"))
            .orderBy(F.col("exact_n").desc(), F.col("t"))
            .limit(CM_TOPK)
        )
        probes = top.select("t", "exact_n", F.explode(js).alias("j")).withColumn(
            "c", _cm_hash(F.col("j"), F.col("t"))
        )
        return (
            cells.join(F.broadcast(probes), ["j", "c"])
            .groupBy("t", "exact_n")
            .agg(F.min("cell_n").alias("est_n"))
            .select(
                F.col("t").alias("token"),
                F.col("exact_n").cast("bigint").alias("exact_n"),
                F.col("est_n").cast("bigint").alias("est_n"),
            )
        )

    def canary() -> float:
        a = np.full((1024, 1024), 1.0003, dtype=np.float64)
        t0 = time.perf_counter()
        for _ in range(8):
            a = np.clip(a @ a, 0.5, 1.5)
        return time.perf_counter() - t0

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    docs = _docs(spark, sf_dir)

    # value equivalence first: identical rows out of both forms
    new_rows = sorted(map(tuple, countmin_topk_df(docs).collect()))
    old_rows = sorted(map(tuple, old_form(docs).collect()))
    assert new_rows == old_rows, "restructured countmin diverged from the two-pass form"
    print(f"value check: {len(new_rows)} rows identical")

    new_t, old_t = [], []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        force(countmin_topk_df(docs))
        new_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        force(old_form(docs))
        old_t.append(time.perf_counter() - t0)
    c = statistics.median(canary() for _ in range(3))
    nm, om = statistics.median(new_t), statistics.median(old_t)
    print(f"canary_numpy={c:.3f}s (quiet band ~0.10-0.15)")
    print(f"one-pass arm: med {nm:.2f}s  all {[round(v, 2) for v in new_t]}")
    print(f"two-pass arm: med {om:.2f}s  all {[round(v, 2) for v in old_t]}")
    print(f"ratio one/two = {nm / om:.3f}")


if __name__ == "__main__":
    main()
