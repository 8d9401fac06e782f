"""Seeded-random differential tests for the event-analytics operators.

Crafted cases pin known hazards; these pin the SEMANTICS on arbitrary
streams: five seeded random corpora per operator, compared against
independent pure-Python references that implement the documented
contract directly (linear scan per user for the funnel; dict arithmetic
for the cohort matrix).  Not hypothesis-driven because each example
costs a Spark job — five seeded corpora keep the suite fast while still
leaving crafted-case territory.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from thesis_iceberg_spark.queries.timeseries_q import (
    FUNNEL_STEPS,
    cohort_retention_df,
    funnel_df,
)
from thesis_iceberg_spark.sources.registry import load_table

_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)
_T0 = dt.datetime(2024, 1, 1)
_TYPES = ("view", "click", "purchase", "error")
_WIN = dt.timedelta(days=1)


def _random_rows(seed: int):
    rng = random.Random(seed)
    rows = []
    for eid in range(rng.randint(10, 120)):
        ts = (
            None
            if rng.random() < 0.05
            else _T0 + dt.timedelta(minutes=rng.randint(0, 5 * 24 * 60))
        )
        rows.append(
            (eid, ts, rng.randint(1, 6), rng.choice(_TYPES), 1.0, "{}")
        )
    return rows


def _write(spark, tmp_path_factory, name, rows):
    d = str(tmp_path_factory.mktemp(name))
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    return d


def _ref_funnel(rows, steps, win):
    """Documented contract, implemented directly: step k counts only
    events strictly later in (ts, event_id) order than the first
    qualifying step-(k-1) event AND within ``win`` of it."""
    by_user: dict[int, list] = {}
    for eid, ts, uid, etype, _v, _p in rows:
        if ts is None:
            continue
        by_user.setdefault(uid, []).append((ts, eid, etype))
    reached = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()
        # prev[k] = min ts of qualifying step-k events seen so far
        prev: list = [None] * len(steps)
        hit = [False] * len(steps)
        for ts, _eid, etype in evs:
            # evaluate hits against PREV state (strictly-earlier events
            # only), then fold this event into prev
            new_prev = list(prev)
            for k, step in enumerate(steps):
                if etype != step:
                    continue
                ok = k == 0 or (prev[k - 1] is not None and ts <= prev[k - 1] + win)
                if ok:
                    hit[k] = True
                    if new_prev[k] is None or ts < new_prev[k]:
                        new_prev[k] = ts
            prev = new_prev
        for k in range(len(steps)):
            reached[k] += hit[k]
    return len(by_user), reached


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_funnel_matches_reference_on_random_streams(
    spark, tmp_path_factory, seed
):
    rows = _random_rows(seed)
    d = _write(spark, tmp_path_factory, f"fr{seed}", rows)
    got = {
        r.step: r.n_users_reached
        for r in funnel_df(load_table(spark, d, "events")).collect()
    }
    _n_users, reached = _ref_funnel(rows, FUNNEL_STEPS, _WIN)
    assert got == {k + 1: reached[k] for k in range(len(FUNNEL_STEPS))}, seed


def _ref_cohort(rows):
    first: dict[int, dt.datetime] = {}
    for _eid, ts, uid, _t, _v, _p in rows:
        if ts is None:
            continue
        if uid not in first or ts < first[uid]:
            first[uid] = ts
    cells: dict[tuple[str, int], set] = {}
    for _eid, ts, uid, _t, _v, _p in rows:
        if ts is None:
            continue
        f = first[uid]
        monday = f - dt.timedelta(days=f.weekday())
        cw = monday.strftime("%Y-%m-%d")
        wk = int((ts - f).total_seconds()) // 604800
        cells.setdefault((cw, wk), set()).add(uid)
    return {k: len(v) for k, v in cells.items()}


@pytest.mark.parametrize("seed", [11, 12, 13, 14, 15])
def test_cohort_matches_reference_on_random_streams(
    spark, tmp_path_factory, seed
):
    rows = _random_rows(seed)
    d = _write(spark, tmp_path_factory, f"cr{seed}", rows)
    got = {
        (r.cohort_week, r.week_no): r.n_active
        for r in cohort_retention_df(load_table(spark, d, "events")).collect()
    }
    assert got == _ref_cohort(rows), seed
