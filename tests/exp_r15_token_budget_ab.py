"""Interleaved A/B: the r15 one-collect histogram threshold in
token_budget_select_df vs the pre-r15 three-action form (corpus-sum
action + 64-row window+agg action + boundary-stats action per level).
The old form is reconstructed verbatim from the pre-change revision and
driven on the same session; rows are asserted identical before timing.

Usage: PYTHONPATH=/root/repo python tests/exp_r15_token_budget_ab.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 7


def old_token_budget_select_df(docs, budget_frac, boundary_sort_cap):
    """The pre-r15 form, verbatim shape (window threshold_stats + budget
    action + per-level boundary stats action)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from thesis_iceberg_spark.queries.binning import range_bin
    from thesis_iceberg_spark.queries.pipeline_q import MAX_REFINE_DEPTH, NB_QBUCKETS
    from thesis_iceberg_spark.queries.text import quality_frame

    scored = (
        quality_frame(docs)
        .filter(F.col("quality_score").isNotNull())
        .select(
            "doc_id",
            "quality_score",
            "n_tokens",
            F.least(
                F.floor(F.col("quality_score") * NB_QBUCKETS),
                F.lit(NB_QBUCKETS - 1).cast("bigint"),
            ).alias("sel_bucket"),
        )
        .localCheckpoint(eager=True)
    )
    out_cols = [
        F.col("doc_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("sel_bucket"),
    ]
    empty = scored.filter(F.lit(False)).select(*out_cols)
    budget_row = scored.agg(
        F.floor(F.sum("n_tokens") * budget_frac).cast("bigint").alias("budget")
    ).first()
    if budget_row["budget"] is None:
        return empty
    budget = int(budget_row["budget"])

    def threshold_stats(df, bucket_col, offset):
        w_hist = Window.orderBy(F.col("b").desc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        hist = (
            df.groupBy(bucket_col.alias("b"))
            .agg(F.sum("n_tokens").alias("btok"))
            .withColumn("cum_through", F.lit(offset) + F.sum("btok").over(w_hist))
            .withColumn("cum_before", F.col("cum_through") - F.col("btok"))
        )
        boundary = (F.col("cum_before") <= budget) & (F.col("cum_through") > budget)
        return hist.agg(
            F.min(F.when(F.col("cum_through") <= budget, F.col("b"))).alias("full_min"),
            F.max(F.when(boundary, F.col("b"))).alias("b_star"),
            F.max(F.when(boundary, F.col("cum_before"))).alias("b_offset"),
        ).first()

    parts = []
    st = threshold_stats(scored, F.col("sel_bucket"), 0)
    if st["full_min"] is not None:
        parts.append(scored.filter(F.col("sel_bucket") >= int(st["full_min"])))
    if st["b_star"] is None:
        return parts[0].select(*out_cols) if parts else empty
    boundary_df = scored.filter(F.col("sel_bucket") == int(st["b_star"]))
    offset = int(st["b_offset"])
    depth = 0
    while depth < MAX_REFINE_DEPTH:
        m = boundary_df.agg(
            F.count("*").alias("cnt"),
            F.min("quality_score").alias("smin"),
            F.max("quality_score").alias("smax"),
            F.min("doc_id").alias("imin"),
            F.max("doc_id").alias("imax"),
        ).first()
        if m["cnt"] <= boundary_sort_cap:
            break
        if m["smin"] < m["smax"]:
            sub = range_bin(
                F.col("quality_score"), m["smin"], m["smax"] - m["smin"], NB_QBUCKETS
            )
        elif m["imin"] < m["imax"]:
            sub = F.lit(NB_QBUCKETS - 1).cast("bigint") - range_bin(
                F.col("doc_id"), m["imin"], m["imax"] - m["imin"], NB_QBUCKETS
            )
        else:
            break
        sst = threshold_stats(boundary_df, sub, offset)
        if sst["full_min"] is not None:
            parts.append(boundary_df.filter(sub >= int(sst["full_min"])))
        if sst["b_star"] is None:
            boundary_df = None
            break
        boundary_df = boundary_df.filter(sub == int(sst["b_star"])).localCheckpoint(
            eager=True
        )
        offset = int(sst["b_offset"])
        depth += 1

    if boundary_df is not None:
        w_bin = Window.orderBy(F.col("quality_score").desc(), F.col("doc_id")).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        parts.append(
            boundary_df.withColumn(
                "cum", F.lit(offset) + F.sum("n_tokens").over(w_bin)
            ).filter(F.col("cum") <= budget)
        )
    if not parts:
        return empty
    out = parts[0].select(*out_cols)
    for p in parts[1:]:
        out = out.unionByName(p.select(*out_cols))
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import numpy as np

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import queries
    from thesis_iceberg_spark.queries.pipeline_q import (
        BOUNDARY_SORT_CAP,
        BUDGET_FRAC,
        token_budget_select_df,
    )
    from thesis_iceberg_spark.sources.registry import load_table

    queries()
    spark = get_spark(app_name="exp_r15_token_budget_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def canary() -> float:
        a = np.full((1024, 1024), 1.0003, dtype=np.float64)
        t0 = time.perf_counter()
        for _ in range(8):
            a = np.clip(a @ a, 0.5, 1.5)
        return time.perf_counter() - t0

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    docs = load_table(spark, sf_dir, "documents")

    new_rows = sorted(map(tuple, token_budget_select_df(docs).collect()))
    old_rows = sorted(
        map(tuple, old_token_budget_select_df(docs, BUDGET_FRAC, BOUNDARY_SORT_CAP).collect())
    )
    assert new_rows == old_rows, "one-collect form diverged from the window form"
    print(f"value check: {len(new_rows)} rows identical")

    tracker = spark.sparkContext.statusTracker
    new_t, old_t = [], []
    for i in range(PASSES):
        j0 = len(spark.sparkContext.statusTracker().getJobIdsForGroup() or [])
        t0 = time.perf_counter()
        force(token_budget_select_df(docs))
        new_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        force(old_token_budget_select_df(docs, BUDGET_FRAC, BOUNDARY_SORT_CAP))
        old_t.append(time.perf_counter() - t0)
    c = statistics.median(canary() for _ in range(3))
    nm, om = statistics.median(new_t), statistics.median(old_t)
    print(f"canary_numpy={c:.3f}s (quiet band ~0.10-0.15)")
    print(f"one-collect arm: med {nm:.2f}s  all {[round(v, 2) for v in new_t]}")
    print(f"three-action arm: med {om:.2f}s  all {[round(v, 2) for v in old_t]}")
    print(f"ratio new/old = {nm / om:.3f}")


if __name__ == "__main__":
    main()
