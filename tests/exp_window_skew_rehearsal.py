"""Hot-user skew rehearsal for the user_id-windowed event operators.

funnel_df and sessionize_events document "a skewed user costs one
partition's sort, like any per-user window".  This executes that claim:
the sf0.1 events table (100k events, 1500 users) is augmented with ONE
user owning 0 / 100k / 500k extra events, and the operators' steady
walls are measured.  Expected shape: roughly linear in the hot
partition's size, no failure — the hot task sorts H events while the
other 31 cores sit on the normal users.

Run:  python tests/exp_window_skew_rehearsal.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pyspark.sql.functions as F

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import REGISTRY, queries
    from thesis_iceberg_spark.queries.timeseries_q import funnel_df
    from thesis_iceberg_spark.sources.registry import load_table

    queries()
    spark = get_spark(app_name="window-skew")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, "/root/testdata/sf0.1", "events")

    def build(hot_n: int) -> str:
        d = tempfile.mkdtemp(prefix=f"skew{hot_n}_")
        if hot_n:
            hot = spark.range(hot_n).select(
                (F.col("id") + 10_000_000).alias("event_id"),
                (
                    F.timestamp_micros(
                        (F.lit(1704067200_000_000) + F.col("id") * 60_000_000)
                    ).cast("timestamp_ntz")
                ).alias("ts"),
                F.lit(999_999).alias("user_id"),
                F.element_at(
                    F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                    (F.col("id") % 3 + 1).cast("int"),
                ).alias("event_type"),
                F.lit(1.0).alias("value"),
                F.lit("{}").alias("props"),
            )
            out = base.unionByName(hot)
        else:
            out = base
        out.repartition(32).write.parquet(f"{d}/events.parquet")
        return d

    def timeit(fn, runs: int = 3) -> float:
        fn()
        return round(
            min(
                (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
                for _ in range(runs)
            ),
            3,
        )

    for hot_n in (0, 100_000, 500_000):
        d = build(hot_n)
        ev = load_table(spark, d, "events")
        t_funnel = timeit(lambda: funnel_df(ev).collect())
        t_sess = timeit(
            lambda: REGISTRY["sessionize_events"].fn(spark, d).count()
        )
        print(f"hot_user_events={hot_n}: funnel={t_funnel}s sessionize={t_sess}s")


if __name__ == "__main__":
    main()
