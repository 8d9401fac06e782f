"""Scaling measurement for the r14-changed/new surfaces across the three
driver scale factors (sf0.001 / sf0.01 / sf0.1 = 1x / 10x / 100x rows).

Claims under test:
  * quantile_sampled (REGISTERED r14, refinement re-cut) — the job count
    is BOUNDED (<= levels x arms histogram aggregates, <= 64-row
    shuffles, <= 4096-row final pick), so wall is fixed-cost dominated
    at local scales and each job stays map-side-combined at any corpus
    size.  The r13 table's 0.36/0.35/0.47 s was the OLD single-window
    form — fast locally precisely because it funnels one task.
  * pagerank_near_dup (REGISTERED r14, per-iteration checkpoints) —
    wall still dominated by the one checkpointed pair-generation job;
    K materializations are fixed overhead.
  * session_window_stats_df (NEW r14) — one user_id-keyed native
    session-merge aggregation: flat.
  * pipeline_shard_shuffle_df (NEW r14) — staged md5 projection +
    bounded counts agg + (shard, bucket)-partitioned row_number: flat.
  * pipeline_pretrain_corpus (re-oracled r14) — the subword encode
    rides the pass-A checkpoint over the survivor set: the stage is
    invisible next to the candidate-pair joins.

Protocol (exp_r10_scale_rehearsal): steady = MIN of 5 warm passes after
one warm run, one JVM, fixed-work JVM canary per scale so host drift is
visible next to every number.

Run:  python tests/exp_r14_new_ops_scale.py
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
    from thesis_iceberg_spark.queries.pipeline_q import (
        pipeline_shard_shuffle_df,
    )
    from thesis_iceberg_spark.queries.timeseries_q import (
        session_window_stats_df,
    )
    from thesis_iceberg_spark.sources.registry import load_table

    queries()
    spark = get_spark(app_name="r14-new-ops-scale")
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
        ev = load_table(spark, d, "events")
        for name in ("quantile_sampled", "pagerank_near_dup"):
            fn = REGISTRY[name].fn
            t = timeit(lambda: fn(spark, d).collect())
            print(f"  {name}: steady_min={t}s")
        t = timeit(lambda: session_window_stats_df(ev).count())
        print(f"  session_window_stats_df: steady_min={t}s")
        t = timeit(lambda: pipeline_shard_shuffle_df(spark, d).count())
        print(f"  pipeline_shard_shuffle_df: steady_min={t}s")
        t = timeit(
            lambda: REGISTRY["pipeline_pretrain_corpus"].fn(spark, d).count()
        )
        print(f"  pipeline_pretrain_corpus: steady_min={t}s")
        # second r14 batch (r15/r16 queue): triangles, AMS F2, image dHash
        from thesis_iceberg_spark.queries.graph import triangle_near_dup_df
        from thesis_iceberg_spark.queries.multimodal_q import (
            multimodal_dhash_clusters_df,
        )
        from thesis_iceberg_spark.queries.sketch import ams_f2_df

        t = timeit(lambda: triangle_near_dup_df(spark, d).count())
        print(f"  triangle_near_dup_df: steady_min={t}s")
        t = timeit(lambda: ams_f2_df(ev, "event_type").collect())
        print(f"  ams_f2_df(event_type): steady_min={t}s")
        t = timeit(lambda: multimodal_dhash_clusters_df(spark, d).count())
        print(f"  multimodal_dhash_clusters_df: steady_min={t}s")


if __name__ == "__main__":
    main()
