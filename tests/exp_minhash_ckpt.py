"""One-off experiment (VERDICT r3 #1/#3): time dedup_minhash_lsh_pairs under
three materialization strategies for the exploded+hashed shingle set:

  lazy  — localCheckpoint(eager=False)   (round-3 HEAD; suspected source of
          the "non-existent accumulator" error in BENCH_r03)
  eager — localCheckpoint(eager=True)
  none  — no checkpoint (recompute the explode+md5 pass per consumer)

Run: python tests/exp_minhash_ckpt.py [sf_dir]  (default /root/testdata/sf0.1)
Not a pytest test; kept under tests/ for provenance.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import pyspark.sql.classic.dataframe as cdf

_ORIG_LCP = cdf.DataFrame.localCheckpoint

MODES = {
    "lazy": lambda self, eager=True: _ORIG_LCP(self, eager=False),
    "eager": lambda self, eager=True: _ORIG_LCP(self, eager=True),
    "none": lambda self, eager=True: self,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import queries

    qs = queries()
    spark = get_spark(app_name="exp-minhash-ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM + codegen + scan-layout cache
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    from thesis_iceberg_spark.sources.registry import register_tables

    for df in register_tables(spark, sf_dir).values():
        df.limit(1).count()

    fn = qs["dedup_minhash_lsh_pairs"]
    results: dict[str, list[float]] = {m: [] for m in MODES}
    for rnd in range(4):
        for mode, patch in MODES.items():
            cdf.DataFrame.localCheckpoint = patch
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[mode].append(round(dt, 3))
            print(f"round {rnd} mode {mode:5s}: {dt:.3f}s", flush=True)
    cdf.DataFrame.localCheckpoint = _ORIG_LCP
    print("---")
    for mode, ts in results.items():
        print(
            f"{mode:5s} first={ts[0]:.3f} warm_min={min(ts[1:]):.3f} "
            f"warm_med={sorted(ts[1:])[len(ts[1:]) // 2]:.3f} all={ts}"
        )


if __name__ == "__main__":
    main()
