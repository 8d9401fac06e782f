"""Does ball-bound bucket pruning actually buy wall-clock at scale?

Generates a CLUSTERED synthetic corpus (32 tight clusters of int8-range
vectors, d=64 — the regime the pruned path exists for; the isotropic
driver corpus measurably prunes nothing) at 1e5 and 1e6 vectors, then
measures brute ann_int8_range_search vs ann_int8_range_search_pruned
wall and the fraction of corpus rows the semi-join lets through.

Protocol: corpus written to parquet (the operators read sf_dir), steady
= MIN of 3 warm passes after one warm run, JVM canary per scale.

Run:  python tests/exp_pruned_range_scale.py [max_n]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    import pyspark.sql.functions as F

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries.similarity import (
        _pruned_range_parts,
        ann_int8_range_search,
        ann_int8_range_search_pruned,
    )

    spark = get_spark(app_name="pruned-range-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def build(n: int) -> str:
        # 32 clusters: center c has coordinates derived from xxhash64 so
        # clusters sit far apart in the +/-100 box; members jitter +/-3.
        # Deterministic, all-JVM generation (no driver-side data).
        d = 64
        df = spark.range(n).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % 32).alias("cl"),
        )
        coords = F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            # pmod, not %: Java % keeps the hash's sign, which would give
            # every coordinate a -100 mean and correlate all vectors
            # (measured: cross-cluster dots ~0.4*qself instead of ~0)
            lambda i: (
                (F.pmod(F.xxhash64(F.col("cl") * F.lit(1000) + i), F.lit(201)) - 100)
                .cast("double")
                + (
                    F.pmod(F.xxhash64(F.col("vec_id") * F.lit(10000) + i), F.lit(7))
                    - 3
                ).cast("double")
                * F.lit(0.5)
            ).cast("float"),
        )
        out = df.select(
            "vec_id", coords.alias("embedding"), F.col("cl").cast("int").alias("label")
        )
        loc = tempfile.mkdtemp(prefix=f"prng{n}_")
        out.repartition(32).write.parquet(f"{loc}/embeddings.parquet")
        return loc

    def timeit(fn, runs: int = 3) -> float:
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
            .collect()
        )

    for n in [x for x in (100_000, 1_000_000) if x <= max_n]:
        loc = build(n)
        print(f"n={n}: canary_jvm={canary()}")
        nb = ann_int8_range_search(spark, loc)
        # inline = pays the assignment shuffle per query; indexed =
        # assignment checkpointed once (the write-time simulation the
        # 100 TB claim assumes — bucket id as partition key)
        np_inline = ann_int8_range_search_pruned(spark, loc, n_centroids=32)
        np_indexed = ann_int8_range_search_pruned(
            spark, loc, n_centroids=32, materialize_index=True
        )
        rows_b = [tuple(r) for r in nb.collect()]
        assert rows_b == [tuple(r) for r in np_inline.collect()], "diverged!"
        assert rows_b == [tuple(r) for r in np_indexed.collect()], "diverged!"
        assigned, keep, _ = _pruned_range_parts(spark, loc, n_centroids=32)
        n_buckets = assigned.select("bucket").distinct().count()
        n_kept_buckets = keep.count()
        surviving = assigned.join(keep, "bucket", "left_semi").count()
        t_brute = timeit(lambda: nb.collect())
        t_inline = timeit(lambda: np_inline.collect())
        t_indexed = timeit(lambda: np_indexed.collect())
        print(
            f"  matches={len(rows_b)} buckets={n_kept_buckets}/{n_buckets} "
            f"rows_scanned={surviving}/{n} "
            f"brute={t_brute}s pruned_inline={t_inline}s "
            f"pruned_indexed={t_indexed}s"
        )


if __name__ == "__main__":
    main()
