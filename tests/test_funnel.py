"""events_funnel_conversion (r12): ordered funnel with a transition window.

The driver oracle pins cross-engine value parity; these tests pin the
SEMANTICS the one-row-per-step output can't show — order violations,
window expiry, same-timestamp tie-breaks, NULL-ts exclusion — plus the
one-shuffle plan claim (the per-user rollup must reuse the window's
partitioning).
"""

from __future__ import annotations

import datetime as dt

import duckdb

from thesis_iceberg_spark.oracle import compare_query
from thesis_iceberg_spark.plans import formatted_plan
from thesis_iceberg_spark.queries import REGISTRY, queries

queries()

_FN = REGISTRY["events_funnel_conversion"].fn
_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)
_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, user, etype, hours=0.0, ts=_T0):
    return (eid, ts + dt.timedelta(hours=hours) if hours is not None else None,
            user, etype, 1.0, "{}")


def _write_events(spark, tmp_path_factory, name, rows):
    d = str(tmp_path_factory.mktemp(name))
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        f"{d}/events.parquet"
    )
    return d


def _crafted_rows():
    rows = []
    # u1 completes in order within the window at every step
    rows += [_ev(10, 1, "view", 0), _ev(11, 1, "click", 1), _ev(12, 1, "purchase", 2)]
    # u2: click BEFORE the first view -> step 2 never reached
    rows += [_ev(20, 2, "click", 0), _ev(21, 2, "view", 1)]
    # u3: click 2 days after the view -> outside the 1-day window
    rows += [_ev(30, 3, "view", 0), _ev(31, 3, "click", 48)]
    # u4: purchase 2 days after the qualifying click -> step 3 expired
    rows += [_ev(40, 4, "view", 0), _ev(41, 4, "click", 1), _ev(42, 4, "purchase", 60)]
    # u5: same timestamp as the view, but click's HIGHER event_id makes it
    # strictly later in (ts, event_id) order -> counts
    rows += [_ev(50, 5, "view", 0), _ev(51, 5, "click", 0)]
    # u6: same timestamp, click's LOWER event_id sorts BEFORE the view ->
    # not "after", step 2 not reached
    rows += [_ev(61, 6, "view", 0), _ev(60, 6, "click", 0)]
    # u7: only a NULL-ts view (excluded) plus a timestamped click: the
    # user stays in the denominator but never reaches step 1
    rows += [(70, None, 7, "view", 1.0, "{}"), _ev(71, 7, "click", 1)]
    # u8: NULL-ts events only -> not even in the denominator
    rows += [(80, None, 8, "view", 1.0, "{}")]
    return rows


def test_crafted_semantics(spark, tmp_path_factory):
    d = _write_events(spark, tmp_path_factory, "funnel_sem", _crafted_rows())
    got = {r.step: r for r in _FN(spark, d).collect()}
    # denominators: users 1-7 have timestamped events (8 does not)
    # step1 (view): u1 u2 u3 u4 u5 u6 -> 6   (u7's view is NULL-ts)
    # step2 (click after view, <=1d): u1 u4 u5 -> 3
    # step3 (purchase after that, <=1d): u1 -> 1
    assert (got[1].n_users_reached, got[2].n_users_reached,
            got[3].n_users_reached) == (6, 3, 1)
    assert got[1].frac_of_prev == 6 / 7
    assert got[2].frac_of_prev == 3 / 6
    assert got[3].frac_of_prev == 1 / 3


def test_crafted_corpus_matches_oracle(spark, tmp_path_factory):
    d = _write_events(spark, tmp_path_factory, "funnel_oracle", _crafted_rows())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS "
        f"SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    spec = REGISTRY["events_funnel_conversion"]
    r = compare_query(
        spark, con, "events_funnel_conversion", spec.fn, spec.oracle, d
    )
    assert r.ok, r.mismatches


def test_driver_corpus_dropoff_is_real(spark, sf_dir):
    # the funnel window exists so every arm is exercised at driver scale:
    # strict drop-off at each step, nothing degenerate-zero
    n = {r.step: r.n_users_reached for r in _FN(spark, sf_dir).collect()}
    assert n[1] > n[2] > n[3] > 0, n


def test_single_shuffle_plan(spark, sf_dir):
    # exactly two Exchanges: the user_id hash partitioning every window
    # and the per-user rollup share, plus the one-row global aggregate;
    # a third would mean the groupBy re-shuffled what the windows
    # already partitioned
    plan = formatted_plan(_FN(spark, sf_dir))
    assert plan.count("Exchange") <= 2 * 2, plan  # each node appears twice
    # in formatted output (tree + detail); 2 physical Exchanges
    assert "SortMergeJoin" not in plan
    assert plan.count("Window") >= 2


def test_general_funnel_df_four_steps(spark, tmp_path_factory):
    # the df-level API generalizes to N steps sharing ONE partitioning:
    # a 4-step funnel over a crafted stream, with one user completing
    # all four in order and one breaking the chain at step 3
    from thesis_iceberg_spark.queries.timeseries_q import funnel_df
    from thesis_iceberg_spark.sources.registry import load_table

    rows = [
        _ev(10, 1, "signup", 0), _ev(11, 1, "view", 1),
        _ev(12, 1, "click", 2), _ev(13, 1, "purchase", 3),
        _ev(20, 2, "signup", 0), _ev(21, 2, "view", 1),
        _ev(22, 2, "purchase", 2),  # skipped click -> chain stops at 2
    ]
    d = _write_events(spark, tmp_path_factory, "funnel4", rows)
    out = {r.step: r.n_users_reached for r in funnel_df(
        load_table(spark, d, "events"),
        ("signup", "view", "click", "purchase"),
    ).collect()}
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}
    # a 4-step funnel must still be ONE data shuffle (3 windows share
    # the partitioning) + the singleton rollup
    plan = formatted_plan(funnel_df(
        load_table(spark, d, "events"),
        ("signup", "view", "click", "purchase"),
    ))
    assert plan.count("Exchange") <= 2 * 2
    assert plan.count("Window") >= 3


def test_registered_4step_dropoff_is_real(spark, sf_dir):
    # the r13-registered 4-step funnel (signup -> view -> click ->
    # purchase) must exercise every transition arm at driver scale —
    # strict drop-off, nothing degenerate (sf0.01: 150/39/16/5)
    fn = REGISTRY["events_funnel_4step"].fn
    n = {r.step: r.n_users_reached for r in fn(spark, sf_dir).collect()}
    assert n[1] > n[2] > n[3] > n[4] > 0, n


def test_oracle_generator_matches_handwritten_3step_shape():
    # _funnel_oracle(FUNNEL_STEPS) replaced r12's hand-written SQL; the
    # clause inventory must be the hand-written shape (3 steps -> 2
    # chained-window CTEs, 3 rollup arms, 3 UNION'd step rows)
    from thesis_iceberg_spark.queries.timeseries_q import (
        FUNNEL_STEPS,
        FUNNEL_STEPS_4,
        _funnel_oracle,
    )

    s3 = _funnel_oracle(FUNNEL_STEPS)
    assert s3.count("OVER (PARTITION BY user_id") == 2
    assert s3.count("UNION ALL") == 2
    s4 = _funnel_oracle(FUNNEL_STEPS_4)
    assert s4.count("OVER (PARTITION BY user_id") == 3
    assert s4.count("UNION ALL") == 3
    assert "prev3" in s4 and "prev4" not in s4


def test_funnel_df_rejects_single_step():
    import pytest

    from thesis_iceberg_spark.queries.timeseries_q import funnel_df

    with pytest.raises(ValueError, match="at least two steps"):
        funnel_df(None, ("view",))
