"""Sketch ALGEBRA (r15, df-level): HLL bucket-wise merge + inclusion-
exclusion, and the AMS inner-product join-size estimate.  Pins (a)
DuckDB parity on the driver corpus, (b) the DISTRIBUTIVITY contract —
the merged union sketch is bit-identical to sketching the union
directly (the property that lets every executor sketch its split
independently), (c) hand-checkable degenerate segments, and (d) the
zero-keyed-shuffle plan claim on the AMS sketch arm.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.plans import formatted_plan
from thesis_iceberg_spark.queries.sketch import (
    AMSJ_SEG_A,
    AMSJ_SEG_B,
    HLLM_SEG_A,
    HLLM_SEG_B,
    ams_join_size_df,
    ams_join_size_q,
    hll_distinct_df,
    hll_merge_segments_df,
    hll_merge_segments_q,
    sql_ams_join_size,
    sql_hll_merge_segments,
)
from thesis_iceberg_spark.sources.registry import load_table


def test_hll_merge_parity_on_driver_corpus(spark, sf_dir):
    got = canonical_rows(hll_merge_segments_q(spark, sf_dir).toPandas())
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "orders")
    want = canonical_rows(
        con.sql(
            sql_hll_merge_segments(
                "orders", "o_custkey", "o_orderstatus", HLLM_SEG_A, HLLM_SEG_B
            )
        ).df()
    )
    assert got == want


def test_hll_merged_union_sketch_is_the_direct_union_sketch(spark, sf_dir):
    # THE distributivity contract: bucket-wise max of the two segment
    # sketches must equal the sketch of the union stream computed
    # directly — same denominator, hence same estimate, bit for bit
    orders = load_table(spark, sf_dir, "orders")
    merged = hll_merge_segments_df(
        orders, "o_custkey", "o_orderstatus", HLLM_SEG_A, HLLM_SEG_B
    ).first()
    direct = hll_distinct_df(
        orders.filter(F.col("o_orderstatus").isin(HLLM_SEG_A, HLLM_SEG_B)),
        "o_custkey",
    ).first()
    assert merged.denom_union == direct.denom
    assert merged.est_union == direct.est_raw
    assert merged.n_exact_union == direct.n_exact


def test_hll_merge_exact_arm_and_inclusion_exclusion(spark, sf_dir):
    # the exact harness columns must satisfy |A|+|B| = |union|+|inter|
    # and the estimate identity est_inter = est_a + est_b - est_union
    row = hll_merge_segments_q(spark, sf_dir).first()
    assert row.n_exact_a + row.n_exact_b == row.n_exact_union + row.n_exact_inter
    assert row.est_inter == (row.est_a + row.est_b) - row.est_union
    assert row.n_exact_inter > 0  # non-degenerate segments at driver scale
    assert row.n_exact_union > max(row.n_exact_a, row.n_exact_b)


def test_hll_merge_disjoint_and_identical_segments(spark):
    # disjoint segments: intersection exact = 0 and the union sketch
    # differs from both arms; identical segments: the merge is a no-op
    # (denom_a == denom_b == denom_union) and est_inter == est_a
    disj = spark.range(200).selectExpr(
        "CASE WHEN id < 100 THEN 'a' ELSE 'b' END AS seg",
        "id AS k",
    )
    row = hll_merge_segments_df(disj, "k", "seg", "a", "b").first()
    assert row.n_exact_inter == 0
    assert row.n_exact_union == 200
    same = spark.range(100).selectExpr("'a' AS seg", "id AS k").union(
        spark.range(100).selectExpr("'b' AS seg", "id AS k")
    )
    row = hll_merge_segments_df(same, "k", "seg", "a", "b").first()
    assert row.denom_a == row.denom_b == row.denom_union
    assert row.est_inter == row.est_a
    assert row.n_exact_inter == 100


def test_ams_join_size_parity_on_driver_corpus(spark, sf_dir):
    got = canonical_rows(ams_join_size_q(spark, sf_dir).toPandas())
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "events")
    want = canonical_rows(
        con.sql(
            sql_ams_join_size(
                "events", "user_id", "event_type", AMSJ_SEG_A, AMSJ_SEG_B
            )
        ).df()
    )
    assert got == want


def test_ams_join_size_single_key_is_exact(spark):
    # one shared key: ZA_j = +-na, ZB_j = +-nb with the SAME sign (same
    # draw), so every product is na*nb exactly and est == exact — the
    # hand-checkable degenerate case
    df = spark.range(70).selectExpr(
        "CASE WHEN id < 30 THEN 'a' ELSE 'b' END AS seg", "'x' AS k"
    )
    row = ams_join_size_df(df, "k", "seg", "a", "b").first()
    assert (row.n_rows_a, row.n_rows_b) == (30, 40)
    assert row.join_exact == "1200"
    assert row.est_join == 1200.0


def test_ams_join_size_disjoint_keys(spark):
    # no shared keys: the exact join size is 0; the estimate is noisy
    # but the EXACT column is the contract
    df = spark.range(100).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS seg",
        "CASE WHEN id % 2 = 0 THEN concat('l', id) ELSE concat('r', id) END AS k",
    )
    row = ams_join_size_df(df, "k", "seg", "a", "b").first()
    assert row.join_exact == "0"


def test_ams_join_size_estimate_tracks_exact(spark, sf_dir):
    # statistical sanity: relative std of the K=16 mean is ~sqrt(2/K);
    # the deterministic draw landed within a generous band at driver
    # scale (pins the seed keys, not luck)
    row = ams_join_size_q(spark, sf_dir).first()
    exact = float(row.join_exact)
    assert exact > 0
    assert abs(row.est_join - exact) / exact < 1.5, (row.est_join, exact)


def test_ams_join_sketch_arm_has_no_keyed_shuffle(spark, sf_dir):
    # the sketch arm is one all-combine aggregate: the ONLY
    # hashpartitioning in the plan belongs to the exact arm's groupBy
    # (the verification harness, not the product)
    plan = formatted_plan(ams_join_size_q(spark, sf_dir))
    assert plan.count("hashpartitioning") <= 1, plan
