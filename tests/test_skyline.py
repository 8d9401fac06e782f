"""skyline_2d: exact-correctness on anti-correlated data (the worst case —
every point is on the skyline), the tree-reduce fold, and the survivor cap
(VERDICT r3 #7: the global phase must not be one unbounded task)."""

from __future__ import annotations

import pytest

from thesis_iceberg_spark.operators import skyline as sk


def _naive(points):
    out = []
    for px, py in points:
        if not any(
            (qx <= px and qy <= py and (qx < px or qy < py)) for qx, qy in points
        ):
            out.append((px, py))
    return sorted(out)


def test_skyline_anticorrelated_exact_under_tree_reduce(spark):
    # anti-correlated: y = 1000 - x — NOTHING dominates anything, all 500
    # points survive every fold; correctness must hold through the tree
    pts = [(float(i), float(1000 - i)) for i in range(500)]
    df = spark.createDataFrame(pts, "x DOUBLE, y DOUBLE").repartition(37)
    got = sorted((r.x, r.y) for r in sk.skyline_2d(df, "x", "y").collect())
    assert got == _naive(pts)


def test_skyline_mixed_exact(spark):
    pts = [(float(i % 13), float((i * 7) % 17)) for i in range(1000)]
    df = spark.createDataFrame(pts, "x DOUBLE, y DOUBLE").repartition(11)
    got = sorted(set((r.x, r.y) for r in sk.skyline_2d(df, "x", "y").collect()))
    assert got == sorted(set(_naive(pts)) & set(got)) and got == sorted(
        set(_naive(list(set(pts))))
    )


def test_skyline_survivor_cap_raises_loudly(spark, monkeypatch):
    monkeypatch.setattr(sk, "MAX_GLOBAL_POINTS", 100)
    pts = [(float(i), float(1000 - i)) for i in range(500)]
    df = spark.createDataFrame(pts, "x DOUBLE, y DOUBLE").repartition(8)
    with pytest.raises(RuntimeError, match="anti-correlated"):
        sk.skyline_2d(df, "x", "y")


def test_skyline_check_cap_opt_out_stays_lazy_and_exact(spark, monkeypatch):
    """check_cap=False (VERDICT r4 #6): no job at DataFrame-build time —
    even a would-trip cap must not raise until execution — and the result
    is still the exact skyline."""
    monkeypatch.setattr(sk, "MAX_GLOBAL_POINTS", 100)
    pts = [(float(i), float(1000 - i)) for i in range(500)]
    df = spark.createDataFrame(pts, "x DOUBLE, y DOUBLE").repartition(37)
    lazy = sk.skyline_2d(df, "x", "y", check_cap=False)  # must NOT raise
    assert sorted((r.x, r.y) for r in lazy.collect()) == _naive(pts)
