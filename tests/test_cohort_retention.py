"""cohort_retention_df (r12, df-level; registration candidate for r13 —
the r12 cap is met): weekly cohort retention matrix.

Pins (a) DuckDB value parity on the driver corpus AND a crafted
two-cohort stream (the harness every registered query gets, run here
manually since the operator is not yet registered), (b) the retention
semantics — decay, week-0 census, single-event users — and (c) the plan
shape (one user_id window, no sort-merge join).
"""

from __future__ import annotations

import datetime as dt

import duckdb

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.plans import formatted_plan
from thesis_iceberg_spark.queries.timeseries_q import cohort_retention_df
from thesis_iceberg_spark.sources.registry import load_table

_ORACLE = """
WITH e AS (SELECT user_id, ts FROM events WHERE ts IS NOT NULL),
f AS (SELECT user_id, ts, min(ts) OVER (PARTITION BY user_id) AS first_ts FROM e),
x AS (SELECT strftime(date_trunc('week', first_ts), '%Y-%m-%d') AS cohort_week,
             date_diff('second', first_ts, ts) // 604800 AS week_no,
             user_id
      FROM f),
a AS (SELECT cohort_week, CAST(week_no AS BIGINT) AS week_no,
             COUNT(DISTINCT user_id) AS n_active
      FROM x GROUP BY 1, 2),
s AS (SELECT *, max(CASE WHEN week_no = 0 THEN n_active END)
                  OVER (PARTITION BY cohort_week) AS cohort_size
      FROM a)
SELECT cohort_week, week_no, n_active,
       CAST(n_active AS DOUBLE) / cohort_size AS frac_of_cohort
FROM s
"""

_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def _parity(spark, d):
    import os

    got = canonical_rows(cohort_retention_df(load_table(spark, d, "events")).toPandas())
    con = duckdb.connect()
    duckdb_table_view(con, d, "events")
    want = canonical_rows(con.sql(_ORACLE).df())
    assert sorted(got) == sorted(want)


def test_parity_on_driver_corpus(spark, sf_dir):
    _parity(spark, sf_dir)


def test_two_cohorts_with_decay(spark, tmp_path_factory):
    t0 = dt.datetime(2024, 1, 1)  # a Monday
    rows = []
    # cohort A: users 1-3 start week 0; user 3 returns in week 1, user 1
    # returns in weeks 1 and 2
    rows += [(10, t0, 1, "view", 1.0, "{}"),
             (11, t0 + dt.timedelta(days=8), 1, "view", 1.0, "{}"),
             (12, t0 + dt.timedelta(days=15), 1, "view", 1.0, "{}"),
             (20, t0, 2, "view", 1.0, "{}"),
             (30, t0, 3, "view", 1.0, "{}"),
             (31, t0 + dt.timedelta(days=7), 3, "view", 1.0, "{}")]
    # cohort B: users 4-5 start week 2 (t0+14d is still a Monday week)
    t2 = t0 + dt.timedelta(days=14)
    rows += [(40, t2, 4, "view", 1.0, "{}"),
             (50, t2, 5, "view", 1.0, "{}"),
             (51, t2 + dt.timedelta(days=7), 5, "view", 1.0, "{}")]
    # NULL-ts row: excluded everywhere
    rows += [(60, None, 6, "view", 1.0, "{}")]
    d = str(tmp_path_factory.mktemp("cohort"))
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    out = {
        (r.cohort_week, r.week_no): (r.n_active, r.frac_of_cohort)
        for r in cohort_retention_df(load_table(spark, d, "events")).collect()
    }
    a, b = "2024-01-01", "2024-01-15"
    assert out[(a, 0)] == (3, 1.0)
    assert out[(a, 1)] == (2, 2 / 3)   # users 1 and 3
    assert out[(a, 2)] == (1, 1 / 3)   # user 1 only
    assert out[(b, 0)] == (2, 1.0)
    assert out[(b, 1)] == (1, 1 / 2)   # user 5
    assert (a, 3) not in out and (b, 2) not in out
    _parity(spark, d)


def test_plan_is_one_user_window_no_smj(spark, sf_dir):
    plan = formatted_plan(cohort_retention_df(load_table(spark, sf_dir, "events")))
    assert "SortMergeJoin" not in plan
    assert "Window" in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
