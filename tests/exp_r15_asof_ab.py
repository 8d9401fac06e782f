"""Interleaved A/B: asof_join_last_event as hash MAX(struct) aggregation
(r15) vs the pre-r15 row_number window form.  Same JVM, alternating
passes — host drift cancels pairwise.  Also asserts the two forms return
identical rows before timing anything.

Usage: PYTHONPATH=/root/repo python tests/exp_r15_asof_ab.py
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
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import queries
    from thesis_iceberg_spark.queries.extended import asof_join_last_event
    from thesis_iceberg_spark.sources.registry import load_table

    queries()
    spark = get_spark(app_name="exp_r15_asof_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def window_form():
        """The pre-r15 row_number shape, reproduced explicitly."""
        o = load_table(spark, sf_dir, "orders")
        e = load_table(spark, sf_dir, "events")
        j = o.join(e, (e.user_id == o.o_custkey) & (e.ts <= o.o_orderdate), "left")
        w = Window.partitionBy("o_orderkey").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            j.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "o_orderkey",
                "o_custkey",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts_s"),
                F.col("value").alias("last_value"),
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

    new_rows = sorted(map(tuple, asof_join_last_event(spark, sf_dir).collect()))
    old_rows = sorted(map(tuple, window_form().collect()))
    assert new_rows == old_rows, "aggregate form diverged from the window form"
    print(f"value check: {len(new_rows)} rows identical")

    new_t, old_t = [], []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        force(asof_join_last_event(spark, sf_dir))
        new_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        force(window_form())
        old_t.append(time.perf_counter() - t0)
    c = statistics.median(canary() for _ in range(3))
    nm, om = statistics.median(new_t), statistics.median(old_t)
    print(f"canary_numpy={c:.3f}s (quiet band ~0.10-0.15)")
    print(f"agg    arm: med {nm:.2f}s  all {[round(v, 2) for v in new_t]}")
    print(f"window arm: med {om:.2f}s  all {[round(v, 2) for v in old_t]}")
    print(f"ratio agg/window = {nm / om:.3f}")


if __name__ == "__main__":
    main()
