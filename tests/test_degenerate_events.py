"""Degenerate-events robustness (r12, the events-table sibling of the
r7 degenerate-documents sweep): every batch events operator must
SURVIVE an events table containing NULL timestamps, NULL user ids, NULL
event types, NULL values/props — and a fully EMPTY events table — under
Spark 4's ANSI mode.  The funnel additionally pins its zero-rows
contract (counts 0, not NULL — the SUM-over-empty-frame NULL this sweep
caught on day one).
"""

from __future__ import annotations

import datetime as dt
import glob
import shutil

import pytest

from thesis_iceberg_spark.queries import REGISTRY, queries

queries()

# batch events-consuming registered queries (hand-audited; streaming_*
# replay sinks are exercised by their own suites)
_EVENT_QUERIES = [
    "events_funnel_conversion",
    "events_funnel_4step",  # r13
    "events_cohort_retention",  # r13
    "sessionize_events",
    "time_bucket_rollup",
    "resample_gapfill_locf",
    "asof_join_last_event",
    "range_join_event_window",
    "window_lag_user_values",
    "dedup_drop_duplicates",
    "agg_salted_skew",
    "json_extract_props",
    "map_funcs_event_props",
    "time_funcs_profile",
    "agg_count_distinct",
    "agg_approx_count_distinct",
    "distinct_values",
    "filter_neq",
    "filter_null",
]

_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)
_T0 = dt.datetime(2024, 1, 1)


def _clone_sf(dirpath: str) -> None:
    # the non-events tables ride along unchanged so join-bearing queries
    # still resolve their other inputs
    for f in glob.glob("/root/testdata/sf0.001/*.parquet"):
        if not f.endswith("/events.parquet"):
            shutil.copy(f, dirpath)


@pytest.fixture(scope="module")
def nasty_events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nastyev"))
    _clone_sf(d)
    rows = [
        (1, _T0, 1, "view", 1.0, '{"k": 1}'),  # one ordinary event
        (2, None, 1, "click", 1.0, "{}"),  # NULL ts
        (3, _T0, None, "purchase", 1.0, "{}"),  # NULL user
        (4, _T0, 2, None, None, None),  # NULL type/value/props
        (5, _T0, 2, "view", float("nan"), "not json"),  # NaN + bad json
    ]
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    return d


@pytest.fixture(scope="module")
def empty_events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("emptyev"))
    _clone_sf(d)
    spark.createDataFrame([], _SCHEMA).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    return d


@pytest.mark.parametrize("name", _EVENT_QUERIES)
def test_event_operator_survives_nasty_rows(spark, nasty_events_dir, name):
    REGISTRY[name].fn(spark, nasty_events_dir).collect()  # must not raise


@pytest.mark.parametrize("name", _EVENT_QUERIES)
def test_event_operator_survives_empty_table(spark, empty_events_dir, name):
    REGISTRY[name].fn(spark, empty_events_dir).collect()  # must not raise


def test_funnel_zero_rows_contract(spark, empty_events_dir):
    # zero timestamped events: counts are 0 (not NULL), fractions NULL
    rows = {r.step: r for r in REGISTRY["events_funnel_conversion"]
            .fn(spark, empty_events_dir).collect()}
    assert [rows[k].n_users_reached for k in (1, 2, 3)] == [0, 0, 0]
    assert all(rows[k].frac_of_prev is None for k in (1, 2, 3))
