"""Interleaved A/B: _bucket_candidates as groupBy(bucket)+narrow pair
generation (r16) vs the r15 count-window + merge self-join form.  Same
JVM, alternating passes over the SAME checkpointed (vec_id, bucket)
frame, so only the candidate step differs.

Asserts identical candidate-pair sets first, then also re-times the two
full registered consumers (dedup_embedding_lsh_pairs,
dedup_embedding_kmeans_pairs run their own staging per pass).

Usage: PYTHONPATH=/root/repo python tests/exp_r16_bucketcand_ab.py
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
    from pyspark.sql.window import Window

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import REGISTRY, queries
    from thesis_iceberg_spark.queries import dedup as D
    from thesis_iceberg_spark.sources.registry import load_table

    queries()
    spark = get_spark(app_name="exp_r16_bucketcand_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def old_bucket_candidates(buckets, overflow_hint):
        """The r15 window + merge self-join form, reproduced verbatim."""
        wb = Window.partitionBy("bucket")
        guarded = buckets.withColumn("bsz", F.count(F.lit(1)).over(wb)).filter(
            F.when(F.col("bsz") <= D.BUCKET_CAP, F.lit(True)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("bucket overflow (> "),
                        F.lit(str(D.BUCKET_CAP)),
                        F.lit(" members) in bucket "),
                        F.col("bucket").cast("string"),
                        F.lit(" — " + overflow_hint),
                    )
                )
            )
        ).drop("bsz")
        return (
            guarded.alias("x").hint("merge")
            .join(guarded.alias("y").hint("merge"), "bucket")
            .filter(F.col("x.vec_id") < F.col("y.vec_id"))
            .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
            .distinct()
        )

    raw = load_table(spark, sf_dir, "embeddings")
    n = D._emb_norms(raw)

    # capture the buckets frame the shipped path builds, checkpoint it so
    # both arms time ONLY the candidate step
    captured = {}
    orig = D._bucket_candidates
    def cap(buckets, hint):
        captured["b"] = buckets
        return orig(buckets, hint)
    D._bucket_candidates = cap
    try:
        D._embedding_lsh_candidates(spark, raw, n)
    finally:
        D._bucket_candidates = orig
    bk = captured["b"].localCheckpoint(eager=True)

    # --- value equivalence ---------------------------------------------------
    a = sorted(map(tuple, D._bucket_candidates(bk, "x").collect()))
    b = sorted(map(tuple, old_bucket_candidates(bk, "x").collect()))
    assert a == b, f"candidate sets diverged: {len(a)} vs {len(b)}"
    print(f"value check: {len(a)} candidate pairs identical")

    def canary() -> float:
        x = np.full((1024, 1024), 1.0003, dtype=np.float64)
        t0 = time.perf_counter()
        for _ in range(8):
            x = np.clip(x @ x, 0.5, 1.5)
        return time.perf_counter() - t0

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # --- candidate-step timing over the same checkpointed buckets ------------
    new_t, old_t = [], []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        force(D._bucket_candidates(bk, "x"))
        new_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        force(old_bucket_candidates(bk, "x"))
        old_t.append(time.perf_counter() - t0)
    nm, om = statistics.median(new_t), statistics.median(old_t)
    print(f"candidate step, grouped form: med {nm:.3f}s  all {[round(v, 3) for v in new_t]}")
    print(f"candidate step, window+join:  med {om:.3f}s  all {[round(v, 3) for v in old_t]}")
    print(f"step ratio new/old = {nm / om:.3f}")

    # --- full consumers at the shipped form (series context) -----------------
    for qname in ("dedup_embedding_lsh_pairs", "dedup_embedding_kmeans_pairs"):
        fn = REGISTRY[qname].fn
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            ts.append(time.perf_counter() - t0)
        print(f"{qname}: med {statistics.median(ts):.2f}s  all {[round(v, 2) for v in ts]}")
    print(f"canary_numpy={statistics.median(canary() for _ in range(3)):.3f}s "
          "(quiet band ~0.10-0.15)")


if __name__ == "__main__":
    main()
