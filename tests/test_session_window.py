"""session_window_stats_df (r14, df-level; r15 registration candidate):
per-user session windows via Spark's NATIVE F.session_window, pinned
against the gaps-and-islands DuckDB twin — including the exact boundary
rule (an event EXACTLY gap seconds after its predecessor opens a new
session, where sessionize_events' `>` rule would merge it), plus the
streaming twin's stream == batch == oracle parity.
"""

from __future__ import annotations

import datetime as dt

import duckdb

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.plans import formatted_plan
from thesis_iceberg_spark.queries.timeseries_q import (
    SESSION_GAP_SEC,
    session_window_stats_df,
    sql_session_stats,
)
from thesis_iceberg_spark.sources.registry import load_table


def _parity(spark, d):
    got = canonical_rows(
        session_window_stats_df(load_table(spark, d, "events")).toPandas()
    )
    con = duckdb.connect()
    duckdb_table_view(con, d, "events")
    want = canonical_rows(con.sql(sql_session_stats()).df())
    assert got == want
    return got


def test_parity_on_driver_corpus(spark, sf_dir):
    assert _parity(spark, sf_dir), "no sessions at driver scale"


_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def test_crafted_gap_boundary(spark, tmp_path_factory):
    # the rule under test: diff <= gap MERGES (measured: the native
    # operator's window closes at ts+gap INCLUSIVE, so exactly-gap-apart
    # events share a session — the same `>`-splits rule as
    # sessionize_events), diff == gap+1 splits
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # user 1: merge at EXACTLY gap (the boundary), split at gap+1
        (1, s(0), 1, "view", 1.0, "{}"),
        (2, s(SESSION_GAP_SEC), 1, "view", 2.0, "{}"),
        (3, s(2 * SESSION_GAP_SEC + 1), 1, "view", 4.0, "{}"),
        # user 2: gap+1 apart -> two one-event sessions
        (4, s(0), 2, "click", 8.0, "{}"),
        (5, s(SESSION_GAP_SEC + 1), 2, "click", 16.0, "{}"),
        # NULL ts: excluded in both twins
        (6, None, 2, "click", 32.0, "{}"),
    ]
    d = str(tmp_path_factory.mktemp("sess"))
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    _parity(spark, d)
    out = session_window_stats_df(load_table(spark, d, "events")).collect()
    u1 = sorted(
        (r.session_start_s, r.n_events, r.total_value)
        for r in out
        if r.user_id == 1
    )
    assert u1 == [
        ("2024-01-01 12:00:00", 2, 3.0),
        ("2024-01-01 13:00:01", 1, 4.0),
    ]
    u2 = sorted((r.n_events, r.total_value) for r in out if r.user_id == 2)
    assert u2 == [(1, 8.0), (1, 16.0)]
    # session_end = last event ts + gap (the window close): last event of
    # the merged session is at t0+gap, so it closes at t0+2*gap
    first_u1 = min(
        (r for r in out if r.user_id == 1), key=lambda r: r.session_start_s
    )
    assert first_u1.session_end_s == "2024-01-01 13:00:00"


def test_plan_shape(spark, sf_dir):
    # native session merge: one user_id-keyed aggregation — no python
    # kernels, no join, no unpartitioned window
    plan = formatted_plan(
        session_window_stats_df(load_table(spark, sf_dir, "events"))
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Join" not in plan


def test_streaming_session_equals_batch_and_oracle(spark, sf_dir):
    # the SAME session spec under watermarked streaming replay must equal
    # the batch twin AND the DuckDB gaps-and-islands twin — data-dependent
    # window extents (state MERGE, not grid assignment) were the one
    # windowed streaming shape the family lacked (r14)
    from thesis_iceberg_spark.streaming.events import session_event_stats

    stream_rows = canonical_rows(session_event_stats(spark, sf_dir).toPandas())
    batch_rows = canonical_rows(
        session_window_stats_df(load_table(spark, sf_dir, "events")).toPandas()
    )
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "events")
    oracle_rows = canonical_rows(con.sql(sql_session_stats()).df())
    assert stream_rows == batch_rows == oracle_rows
    assert stream_rows
