#!/usr/bin/env python
"""Benchmark harness (driver contract): run headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query seconds.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side collect) — the same way a cluster job would be measured.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def force(df) -> None:
    """Fully execute a DataFrame without materializing it on the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import REGISTRY, queries

    queries()  # force registration
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [
        "agg_pricing_summary",
        "agg_q6_revenue",
        "q3_unshipped_topk",
        "star_join_revenue_by_nation",
        "join_inner_cust_orders",
        "window_rank_orders",
        "topk_orders",
        "agg_count_distinct",
        "set_ops_customer_segments",
        "sessionize_events",
        "asof_join_last_event",
    ]
    # Include any later-registered headline ops if present.
    for extra in (
        "dedup_exact_hash",
        "dedup_minhash_lsh_pairs",
        "dedup_embedding_lsh_pairs",
        "ann_cosine_topk",
        "text_quality_scores",
        # round 4: widen the measured surface to the pipeline family
        "pipeline_decontaminate",
        "ann_batch_topk",
        "text_gopher_repetition_signals",
    ):
        if extra in REGISTRY:
            headline.append(extra)

    # Warm-up: JVM/codegen startup and the one-time scan-layout cache
    # (ingest-time file/row-group sizing, see sources/registry.py) are
    # setup, not query time.
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    from thesis_iceberg_spark.sources.registry import register_tables

    for df in register_tables(spark, sf_dir).values():
        df.limit(1).count()

    def timed_pass() -> dict[str, float]:
        out: dict[str, float] = {}
        for name in headline:
            fn = REGISTRY[name].fn
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            out[name] = round(time.perf_counter() - t0, 4)
        return out

    # Cold pass (includes per-query whole-stage-codegen JIT) is the
    # headline number; a second pass separates JIT from plan cost so
    # round-over-round deltas can be attributed (VERDICT r4 #7).
    timings = timed_pass()
    steady = timed_pass()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_steady": steady,
                "value_steady": round(sum(steady.values()), 4),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
