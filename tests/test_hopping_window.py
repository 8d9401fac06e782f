"""time_hopping_window_rollup_df (r13, df-level; r14 registration
candidate): overlapping-window rollup via Spark's built-in F.window
generator, DuckDB-parity-pinned against the hop-offset enumeration twin.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.plans import formatted_plan
from thesis_iceberg_spark.queries.timeseries_q import (
    HOP_SLIDE_SEC,
    HOP_WIDTH_SEC,
    sql_hopping_rollup,
    time_hopping_window_rollup_df,
)
from thesis_iceberg_spark.sources.registry import load_table


def _parity(spark, d, width=HOP_WIDTH_SEC, slide=HOP_SLIDE_SEC):
    got = canonical_rows(
        time_hopping_window_rollup_df(
            load_table(spark, d, "events"), width, slide
        ).toPandas()
    )
    con = duckdb.connect()
    duckdb_table_view(con, d, "events")
    want = canonical_rows(con.sql(sql_hopping_rollup(width, slide)).df())
    assert got == want


def test_parity_on_driver_corpus(spark, sf_dir):
    _parity(spark, sf_dir)


def test_parity_with_four_hops(spark, sf_dir):
    # width/slide = 4: every event in four windows, both twins agree
    _parity(spark, sf_dir, width=3600, slide=900)


_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def test_crafted_boundary_membership(spark, tmp_path_factory):
    # one event exactly ON a slide boundary: member of exactly
    # width/slide = 2 windows, [t, ...) inclusive and [t-slide, ...)
    t0 = dt.datetime(2024, 1, 1, 0, 30, 0)  # epoch multiple of 900
    rows = [
        (1, t0, 1, "view", 2.0, "{}"),
        # NULL ts: excluded from a temporal rollup in both twins
        (2, None, 1, "view", 5.0, "{}"),
    ]
    d = str(tmp_path_factory.mktemp("hop"))
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    out = {
        r.window_start_epoch: (r.n, r.total_value)
        for r in time_hopping_window_rollup_df(
            load_table(spark, d, "events")
        ).collect()
    }
    e = int(t0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert out == {e: (1, 2.0), e - 900: (1, 2.0)}
    _parity(spark, d)


def test_rejects_unaligned_slide(spark, sf_dir):
    with pytest.raises(ValueError, match="multiple"):
        time_hopping_window_rollup_df(
            load_table(spark, sf_dir, "events"), 1000, 900
        )


def test_plan_shape(spark, sf_dir):
    # the window expansion is JVM-side generation + ONE map-side-combined
    # aggregation — no python, no join
    plan = formatted_plan(
        time_hopping_window_rollup_df(load_table(spark, sf_dir, "events"))
    )
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "Join" not in plan
    assert "partial" in plan.lower()


def test_streaming_hopping_equals_batch_and_oracle(spark, sf_dir):
    # the SAME window spec under watermarked streaming replay must equal
    # the batch rollup AND the DuckDB hop-enumeration twin — overlapping
    # windows were the one streaming shape the family lacked (r13)
    from thesis_iceberg_spark.streaming.events import hopping_event_stats

    stream_rows = canonical_rows(hopping_event_stats(spark, sf_dir).toPandas())
    batch_rows = canonical_rows(
        time_hopping_window_rollup_df(
            load_table(spark, sf_dir, "events")
        ).toPandas()
    )
    assert stream_rows == batch_rows
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "events")
    want = canonical_rows(con.sql(sql_hopping_rollup()).df())
    assert stream_rows == want
