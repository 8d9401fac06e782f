"""Scaling measurement for the r15 new surfaces across the three driver
scale factors (sf0.001 / sf0.01 / sf0.1 = 1x / 10x / 100x rows).

Claims under test:
  * hll_merge_segments_df — ONE corpus scan into a <= 64-key map-side-
    combined groupBy with two conditional maxes + one all-combine agg
    (the exact arm adds one distinct-key groupBy): flat, like
    hll_distinct.
  * ams_join_size_df — one narrow projection + a single all-combine
    aggregate with 2K conditional sign sums (zero keyed shuffle on the
    sketch arm): flat, like ams_f2.
  * kcore_near_dup_df — wall dominated by the one checkpointed
    pair-generation job (the pagerank shape); the peel rounds are
    bounded map-side degree aggs + semi-joins over a shrinking edge
    frame, each round's plan O(1) and its predecessor's blocks freed.

Protocol (exp_r10_scale_rehearsal): steady = MIN of 5 warm passes after
one warm run, one JVM, fixed-work JVM canary per scale so host drift is
visible next to every number.

Run:  python tests/exp_r15_new_ops_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import queries
    from thesis_iceberg_spark.queries.graph import kcore_near_dup_df
    from thesis_iceberg_spark.queries.sketch import (
        ams_join_size_q,
        hll_merge_segments_q,
    )

    queries()
    spark = get_spark(app_name="r15-new-ops-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def timeit(fn, runs: int = 5) -> float:
        fn()
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
            runs=3,
        )

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        print(f"{sf}: canary_jvm={canary()}")
        t = timeit(lambda: hll_merge_segments_q(spark, d).collect())
        print(f"  hll_merge_segments_q: steady_min={t}s")
        t = timeit(lambda: ams_join_size_q(spark, d).collect())
        print(f"  ams_join_size_q: steady_min={t}s")
        t = timeit(lambda: kcore_near_dup_df(spark, d).count())
        print(f"  kcore_near_dup_df: steady_min={t}s")


if __name__ == "__main__":
    main()
