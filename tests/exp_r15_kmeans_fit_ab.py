"""Interleaved A/B: local BLAS-3 spherical fit vs pyspark.ml KMeans fit
inside the registered dedup_embedding_kmeans_pairs (r15 optimization
round, guide §1).  Same JVM, alternating passes, so host drift cancels
pairwise (the r12 bm25 gate-cost methodology).  Arm selection rides the
KMEANS_LOCAL_FIT_K_THRESHOLD module constant: 0 -> local fit (the r15
default), 4096 -> the pre-r15 pyspark.ml small-k path.

Usage: PYTHONPATH=/root/repo python tests/exp_r15_kmeans_fit_ab.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import numpy as np

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import dedup, queries

    queries()
    spark = get_spark(app_name="exp_r15_kmeans_fit_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def canary() -> float:
        a = np.full((1024, 1024), 1.0003, dtype=np.float64)
        t0 = time.perf_counter()
        for _ in range(8):
            a = np.clip(a @ a, 0.5, 1.5)
        return time.perf_counter() - t0

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def one_pass(threshold: int) -> float:
        old = dedup.KMEANS_LOCAL_FIT_K_THRESHOLD
        dedup.KMEANS_LOCAL_FIT_K_THRESHOLD = threshold
        try:
            t0 = time.perf_counter()
            force(dedup.dedup_embedding_kmeans_pairs(spark, sf_dir))
            return time.perf_counter() - t0
        finally:
            dedup.KMEANS_LOCAL_FIT_K_THRESHOLD = old

    # warm both arms once (JIT, python workers) before measuring
    one_pass(0)
    one_pass(4096)

    local, mllib = [], []
    for _ in range(PASSES):
        local.append(one_pass(0))
        mllib.append(one_pass(4096))
    c = statistics.median(canary() for _ in range(3))
    lm, mm = statistics.median(local), statistics.median(mllib)
    print(f"canary_numpy={c:.3f}s (quiet band ~0.10-0.15)")
    print(f"local-fit  arm: med {lm:.2f}s  all {[round(v, 2) for v in local]}")
    print(f"mllib-fit  arm: med {mm:.2f}s  all {[round(v, 2) for v in mllib]}")
    print(f"ratio local/mllib = {lm / mm:.3f}")


if __name__ == "__main__":
    main()
