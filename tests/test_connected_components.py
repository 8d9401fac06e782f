"""connected_components (large-star/small-star): correctness vs a Python
union-find, and the round-complexity claim — a 64-node CHAIN must converge
under a 12-round budget, where plain min-label propagation needs ~diameter
(64) rounds."""

from __future__ import annotations

from thesis_iceberg_spark.queries.dedup import connected_components


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a BIGINT, b BIGINT")
    return {r.node: r.label for r in connected_components(df, **kw).collect()}


def test_chain_converges_in_log_rounds(spark):
    # 64-node path graph: diameter 63. Star contraction must finish well
    # under 12 rounds (min-label propagation would raise here).
    edges = [(i, i + 1) for i in range(63)]
    got = _run(spark, edges, max_rounds=12)
    assert got == {i: 0 for i in range(64)}


def test_mixed_components_match_union_find(spark):
    edges = (
        [(i, i + 1) for i in range(10)]  # path 0..10
        + [(100, 101), (101, 102), (100, 102)]  # triangle
        + [(200, 201)]  # pair
        + [(300, 301), (302, 301), (303, 300), (301, 303)]  # dense blob
        + [(5, 5)]  # self-loop must be ignored
    )
    got = _run(spark, edges)
    assert got == _union_find((a, b) for a, b in edges if a != b)


def test_duplicate_and_reversed_edges(spark):
    edges = [(2, 1), (1, 2), (2, 1), (3, 2)]
    got = _run(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1}
