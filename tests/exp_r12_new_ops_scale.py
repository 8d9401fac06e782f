"""Scaling measurement for the four r12-new operators across the three
driver scale factors (sf0.001 / sf0.01 / sf0.1 = 1x / 10x / 100x rows).

Claims under test:
  * dedup_incremental_bloom — build + probe are narrow Arrow passes over
    the staged fingerprint frame; wall ~ corpus size, never candidate^2.
  * text_hashed_classifier — fit is one 64-key map-side-combined
    shuffle; scoring is a zero-shuffle HOF map: wall ~ token volume.
  * ann_int8_range_search — narrow quantize+dot+filter scan: wall ~ n.
  * events_funnel_conversion — one user_id shuffle + windows: wall ~ n.

Protocol (exp_r10_scale_rehearsal): steady = MIN of 5 warm passes after
one warm run, one JVM, fixed-work JVM canary per scale so host drift is
visible next to every number.

Run:  python tests/exp_r12_new_ops_scale.py
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

    queries()
    spark = get_spark(app_name="r12-new-ops-scale")
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

    names = (
        "dedup_incremental_bloom",
        "text_hashed_classifier",
        "ann_int8_range_search",
        "events_funnel_conversion",
    )
    for sf in ("0.001", "0.01", "0.1"):
        d = f"/root/testdata/sf{sf}"
        print(f"sf{sf}: canary_jvm={canary()}")
        for name in names:
            fn = REGISTRY[name].fn
            t = timeit(lambda: fn(spark, d).collect())
            n = fn(spark, d).count()
            print(f"  {name}: steady_min={t}s rows={n}")


if __name__ == "__main__":
    main()
