"""HyperLogLog distinct sketch (r13, df-level; r14 registration
candidate): cross-engine parity of every sketch intermediate, accuracy
in/out of the linear-counting domain, degenerate inputs, and the
bounded-shuffle plan claim.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.plans import formatted_plan
from thesis_iceberg_spark.queries.sketch import (
    HLL_BUCKETS,
    hll_corrected_estimate,
    hll_distinct_df,
    sql_hll_distinct,
)
from thesis_iceberg_spark.sources.registry import load_table


def _parity(spark, sf_dir, col="user_id"):
    got = canonical_rows(
        hll_distinct_df(load_table(spark, sf_dir, "events"), col).toPandas()
    )
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "events")
    want = canonical_rows(con.sql(sql_hll_distinct("events", col)).df())
    assert got == want


def test_parity_on_driver_corpus(spark, sf_dir):
    _parity(spark, sf_dir)


def test_parity_on_string_column(spark, sf_dir):
    # the sketch hashes the VARCHAR form, so a string column must agree
    # the same way an integer one does
    _parity(spark, sf_dir, col="event_type")


def test_accuracy_in_the_raw_domain(spark):
    # 5000 distinct ids: comfortably past 2.5m = 160, so est_raw is the
    # operative estimate; published standard error is 1.04/sqrt(64) =
    # 13% — assert a generous 3-sigma band
    df = spark.range(5000).select(F.col("id").alias("user_id"))
    row = hll_distinct_df(df, "user_id").first()
    assert not row.use_linear
    assert abs(row.est_raw - 5000) / 5000 < 0.39, row.est_raw
    assert hll_corrected_estimate(row) == row.est_raw


def test_linear_counting_domain_flagged_and_corrected(spark):
    # 15 distinct values: raw HLL is known-biased here, the domain flag
    # must fire, and the linear-counting correction must land far closer
    # than the raw estimate
    df = spark.range(15).select(F.col("id").alias("user_id"))
    row = hll_distinct_df(df, "user_id").first()
    assert row.use_linear
    corrected = hll_corrected_estimate(row)
    assert abs(corrected - 15) < abs(row.est_raw - 15)
    assert abs(corrected - 15) / 15 < 0.35, corrected


def test_duplicates_do_not_move_the_sketch(spark):
    # COUNT(DISTINCT) semantics: 100 copies of each id give the same
    # sketch as one copy (max per bucket is idempotent)
    ids = spark.range(200).select(F.col("id").alias("user_id"))
    dup = ids.crossJoin(spark.range(100).select(F.lit(1).alias("_x"))).select(
        "user_id"
    )
    a = hll_distinct_df(ids, "user_id").first()
    b = hll_distinct_df(dup, "user_id").first()
    assert (a.denom, a.v_empty, a.est_raw, a.n_exact) == (
        b.denom,
        b.v_empty,
        b.est_raw,
        b.n_exact,
    )


def test_all_null_input(spark):
    df = spark.range(10).select(
        F.lit(None).cast("bigint").alias("user_id")
    )
    row = hll_distinct_df(df, "user_id").first()
    assert row.n_exact == 0
    assert row.v_empty == HLL_BUCKETS
    assert row.use_linear  # the degenerate corner of the small-range rule


def test_plan_is_one_bounded_groupby_no_python(spark, sf_dir):
    plan = formatted_plan(
        hll_distinct_df(load_table(spark, sf_dir, "events"), "user_id")
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    # partial aggregation before the exchange = the per-partition
    # partial-sketch merge (<= m rows per task cross the wire)
    assert "partial" in plan.lower()


def test_float_column_raises_loudly(spark, sf_dir):
    # review r13: Spark renders doubles as '1.0E20' where DuckDB says
    # '1e+20' — a silent cross-engine parity break the guard makes loud
    import pytest

    with pytest.raises(ValueError, match="canonical string"):
        hll_distinct_df(load_table(spark, sf_dir, "events"), "value")


# --- deterministic sampled quantiles (sketch family #3, same module) --------


def test_quantile_sampled_parity(spark, sf_dir):
    from thesis_iceberg_spark.queries.sketch import (
        quantile_sampled_df,
        sql_quantile_sampled,
    )

    got = canonical_rows(
        quantile_sampled_df(
            load_table(spark, sf_dir, "events"), "value", "event_id"
        ).toPandas()
    )
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "events")
    want = canonical_rows(
        con.sql(sql_quantile_sampled("events", "value", "event_id")).df()
    )
    assert got == want
    assert len(got) == 4  # one row per QS_QUANTILES entry


def test_quantile_estimates_converge_and_are_stored_values(spark, sf_dir):
    from thesis_iceberg_spark.queries.sketch import quantile_sampled_df

    ev = load_table(spark, sf_dir, "events")
    rows = {
        r.q_pct: r
        for r in quantile_sampled_df(ev, "value", "event_id").collect()
    }
    vals = {r.value for r in ev.select("value").collect() if r.value is not None}
    for q, r in rows.items():
        # order statistics are STORED input doubles, never arithmetic
        assert r.exact_q in vals and r.sample_q in vals
        # a 25% uniform sample's percentile lands near the true one
        # (driver corpus: within the q +- 6 percentile band, generous)
        assert abs(r.sample_q - r.exact_q) / max(abs(r.exact_q), 1e-9) < 0.25, (q, r)
    assert rows[25].exact_q <= rows[50].exact_q <= rows[75].exact_q <= rows[95].exact_q


def test_quantile_exact_side_is_percentile_disc(spark):
    # hand-checkable 10-row frame: percentile_disc(50) of 1..10 = 5
    from pyspark.sql import functions as F

    from thesis_iceberg_spark.queries.sketch import quantile_sampled_df

    df = spark.range(1, 11).select(
        F.col("id").cast("double").alias("value"), F.col("id").alias("event_id")
    )
    rows = {
        r.q_pct: r.exact_q
        for r in quantile_sampled_df(df, "value", "event_id").collect()
    }
    assert rows == {25: 3.0, 50: 5.0, 75: 8.0, 95: 10.0}


def test_heavy_equal_value_run_larger_than_sort_cap(spark):
    # r14 review #1: a bin narrowing to a SINGLE-VALUE run larger than
    # QS_SELECT_CAP must resolve as that value through the vmin==vmax
    # short-circuit (no sort of the run) — the heavy-hitter shape
    # (millions of identical 0.0s) real value columns carry.  All four
    # quantiles land inside the 3*cap-row 7.0 run here, so every
    # resolution exercises the short-circuit branch.
    from thesis_iceberg_spark.queries.sketch import (
        QS_SELECT_CAP,
        quantile_sampled_df,
    )

    n = QS_SELECT_CAP * 3
    df = spark.range(n).selectExpr(
        "id AS event_id",
        "CAST(CASE WHEN id < 100 THEN 1.0 ELSE 7.0 END AS DOUBLE) AS value",
    )
    rows = {
        r.q_pct: r for r in quantile_sampled_df(df, "value", "event_id").collect()
    }
    assert set(rows) == {25, 50, 75, 95}
    for q, r in rows.items():
        assert r.exact_q == 7.0, (q, r)
        assert r.sample_q == 7.0, (q, r)
        assert r.n_total == n


def test_quantile_integral_value_column(spark):
    # ADVICE r14 #1: the output schema pins exact_q/sample_q DOUBLE but
    # an integral value column collects Python ints — createDataFrame
    # used to raise TypeError at runtime.  Widening an order statistic
    # int -> double is exact, so a bigint column must just work.
    from thesis_iceberg_spark.queries.sketch import quantile_sampled_df

    df = spark.range(1, 101).selectExpr(
        "id AS event_id", "CAST(id AS BIGINT) AS value"
    )
    rows = {
        r.q_pct: r for r in quantile_sampled_df(df, "value", "event_id").collect()
    }
    assert set(rows) == {25, 50, 75, 95}
    # percentile_disc over 1..100: index ceil(q) exactly
    for q, r in rows.items():
        assert r.exact_q == float(q), (q, r.exact_q)
        assert isinstance(r.exact_q, float)
        assert isinstance(r.sample_q, float)


def test_quantile_wide_bigint_range_no_overflow(spark):
    # r15 review #1: range_bin used to evaluate (x - lo) * n in BIGINT
    # for integral columns, wrapping silently once the span approaches
    # 2^63/64 — non-monotone bins, wrong quantiles, no error.  The
    # double-domain map must return exact order statistics over a
    # full-width span.  Values id * 2^50 (id < 2^13) are exactly
    # double-representable, so the widened doubles are exact too.
    from thesis_iceberg_spark.queries.sketch import quantile_sampled_df

    n = 8_000  # id * 2^50 must itself stay inside int64: 7999 * 2^50
    # ~ 9.0e18 < 2^63-1, while the span still breaks the OLD bigint bin
    # map ((x - lo) * 64 needs x - lo < 2^57) — review r15 pass 2 #1
    # caught the first cut of this test overflowing its own test data
    df = spark.range(n).selectExpr(
        "id AS event_id", "CAST(id * 1125899906842624 AS BIGINT) AS value"
    )
    rows = {
        r.q_pct: r for r in quantile_sampled_df(df, "value", "event_id").collect()
    }
    for q, r in rows.items():
        idx = (q * n + 99) // 100  # percentile_disc index, 1-based
        assert r.exact_q == float((idx - 1) * 1125899906842624), (q, r)


def test_quantile_integral_column_twin_parity(spark):
    # r15 review pass 2 #5: over an integral column the twin used to
    # emit BIGINT order statistics where the df side pins DOUBLE — the
    # same selected value, hash-mismatching canonical form.  Full
    # cross-engine parity over a crafted bigint column pins the CAST.
    import pandas as pd

    from thesis_iceberg_spark.queries.sketch import (
        quantile_sampled_df,
        sql_quantile_sampled,
    )

    pdf = pd.DataFrame(
        {"event_id": range(1, 201), "value": [3 * x for x in range(1, 201)]}
    )
    got = canonical_rows(
        quantile_sampled_df(
            spark.createDataFrame(pdf), "value", "event_id"
        ).toPandas()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want = canonical_rows(
        con.sql(sql_quantile_sampled("t", "value", "event_id")).df()
    )
    assert got == want


def test_quantile_empty_input_releases_checkpoints(spark):
    # r15 review pass 2 #4: the empty-input early return used to leak
    # the base/samp staging checkpoints the non-empty path frees
    from thesis_iceberg_spark.queries.sketch import quantile_sampled_df

    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    out = quantile_sampled_df(
        spark.range(10).selectExpr(
            "id AS event_id", "CAST(NULL AS DOUBLE) AS value"
        ),
        "value",
        "event_id",
    )
    assert out.count() == 0
    assert n_persistent() == before


def test_quantile_releases_checkpoint_storage(spark, sf_dir):
    # ADVICE r14 #3: _rank_values / quantile_sampled_df localCheckpoint
    # staging + per-bin frames must not accumulate block-manager storage
    # across invocations in a long-lived session.  Invariant: the
    # persistent-RDD census returns to its pre-call level afterwards.
    from thesis_iceberg_spark.queries.sketch import quantile_sampled_df

    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    quantile_sampled_df(
        load_table(spark, sf_dir, "events"), "value", "event_id"
    ).collect()
    assert n_persistent() == before


# --- AMS F2 / self-join-size sketch (sketch family #4, same module) ----------


def test_ams_f2_parity(spark, sf_dir):
    from thesis_iceberg_spark.queries.sketch import ams_f2_df, sql_ams_f2

    got = canonical_rows(
        ams_f2_df(load_table(spark, sf_dir, "events"), "event_type").toPandas()
    )
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "events")
    want = canonical_rows(con.sql(sql_ams_f2("events", "event_type")).df())
    assert got == want


def test_ams_f2_single_value_is_exact(spark):
    # one distinct value: every Z_j = +-n, so Z_j^2 = n^2 exactly and the
    # estimate EQUALS f2_exact — the hand-checkable degenerate case
    from thesis_iceberg_spark.queries.sketch import ams_f2_df

    df = spark.range(1000).selectExpr("'x' AS k")
    row = ams_f2_df(df, "k").first()
    assert row.n_rows == 1000
    # exact integers ride as DECIMAL STRINGS (overflow headroom past
    # 2^63, r14 review #1)
    assert row.f2_exact == "1000000"
    assert row.est_f2 == float(row.f2_exact)


def test_ams_f2_estimate_tracks_exact(spark, sf_dir):
    # statistical sanity at driver scale: relative std of the K=16 mean
    # is ~sqrt(2/16) ~ 35%; assert the estimate lands within a generous
    # 4-sigma band (deterministic draw — this pins the chosen seed keys,
    # not luck)
    from thesis_iceberg_spark.queries.sketch import ams_f2_df

    row = ams_f2_df(
        load_table(spark, sf_dir, "events"), "event_type"
    ).first()
    f2 = float(row.f2_exact)
    assert f2 > 0
    rel = abs(row.est_f2 - f2) / f2
    assert rel < 1.4, (row.est_f2, row.f2_exact, rel)


def test_ams_f2_empty_and_null_only(spark):
    from thesis_iceberg_spark.queries.sketch import ams_f2_df

    df = spark.createDataFrame([(None,), (None,)], "k STRING")
    row = ams_f2_df(df, "k").first()
    assert (row.n_rows, row.f2_exact, row.sum_z2) == (0, "0", "0")
    assert row.est_f2 == 0.0


def test_ams_f2_plan_has_no_keyed_shuffle_on_sketch_arm(spark, sf_dir):
    # the sketch arm is one projection + one all-combine aggregate; the
    # only groupBy in the operator is the EXACT arm's verification
    # harness (dropped at production scale, the countmin framing)
    from thesis_iceberg_spark.plans import formatted_plan
    from thesis_iceberg_spark.queries.sketch import ams_f2_df

    plan = formatted_plan(
        ams_f2_df(load_table(spark, sf_dir, "events"), "event_type")
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    # exactly ONE keyed exchange in the whole operator — the exact arm's
    # groupBy(v); the sketch arm must contribute only all-combine
    # (SinglePartition) aggregation (r14 review #3: the name promised
    # this, the assert didn't check it)
    assert plan.count("hashpartitioning") == 1, plan
    assert "partial" in plan.lower()
