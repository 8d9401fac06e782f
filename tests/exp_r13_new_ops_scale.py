"""Scaling measurement for the r13-new surfaces across the three driver
scale factors (sf0.001 / sf0.01 / sf0.1 = 1x / 10x / 100x rows).

Claims under test:
  * events_cohort_retention — one user_id window + bounded-key agg:
    wall ~ n, never cohorts x weeks x n.
  * events_funnel_4step — 3 windows on ONE partitioning: a deeper
    funnel costs window operators, not shuffles; wall ~ n.
  * text_bpe_encode — zero-shuffle Arrow encode with a per-task type
    memo: wall ~ token volume (Zipf: the memo amortizes merge loops).
  * ann_int8_range_search_stored — narrow int8-column scan + broadcast
    closures (table CTAS excluded: build-once cost measured separately).
  * hll_distinct_df — narrow projection + <= 64-row-per-task combine.
  * time_hopping_window_rollup_df — JVM window generation + one
    map-side-combined agg (2 windows/event).

Protocol (exp_r10_scale_rehearsal): steady = MIN of 5 warm passes after
one warm run, one JVM, fixed-work JVM canary per scale so host drift is
visible next to every number.

Run:  python tests/exp_r13_new_ops_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import REGISTRY, queries
    from thesis_iceberg_spark.queries.sketch import hll_distinct_df
    from thesis_iceberg_spark.queries.timeseries_q import (
        time_hopping_window_rollup_df,
    )
    from thesis_iceberg_spark.sources.registry import load_table

    queries()
    spark = get_spark(app_name="r13-new-ops-scale")
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

    reg_names = (
        "events_cohort_retention",
        "events_funnel_4step",
        "text_bpe_encode",
        "ann_int8_range_search_stored",
    )
    for sf in ("0.001", "0.01", "0.1"):
        d = f"/root/testdata/sf{sf}"
        print(f"sf{sf}: canary_jvm={canary()}")
        for name in reg_names:
            fn = REGISTRY[name].fn
            fn(spark, d).count()  # stored-table variant: CTAS once, outside timing
            t = timeit(lambda: fn(spark, d).collect())
            n = fn(spark, d).count()
            print(f"  {name}: steady_min={t}s rows={n}")
        ev = load_table(spark, d, "events")
        t = timeit(lambda: hll_distinct_df(ev, "user_id").collect())
        print(f"  hll_distinct_df(user_id): steady_min={t}s")
        t = timeit(lambda: time_hopping_window_rollup_df(ev).count())
        print(f"  time_hopping_window_rollup_df: steady_min={t}s")
        from thesis_iceberg_spark.queries.datacard import corpus_datacard_df
        from thesis_iceberg_spark.queries.graph import pagerank_near_dup_df
        from thesis_iceberg_spark.queries.pipeline_q import (
            pipeline_weighted_sample_df,
        )
        from thesis_iceberg_spark.queries.sketch import quantile_sampled_df

        t = timeit(lambda: pagerank_near_dup_df(spark, d).collect())
        print(f"  pagerank_near_dup_df: steady_min={t}s")
        t = timeit(lambda: quantile_sampled_df(ev, "value", "event_id").collect())
        print(f"  quantile_sampled_df: steady_min={t}s")
        t = timeit(lambda: pipeline_weighted_sample_df(spark, d).collect())
        print(f"  pipeline_weighted_sample_df: steady_min={t}s")
        t = timeit(lambda: corpus_datacard_df(spark, d).count())
        print(f"  corpus_datacard_df: steady_min={t}s")


if __name__ == "__main__":
    main()
