"""kcore_pairs_df / kcore_near_dup_df (r15, df-level): synchronous
K-core peel over the near-dup graph.  Pins (a) hand-checkable crafted
graphs (triangle survives, trees/chains empty, K4 under K=3, pendant
trimmed), (b) duplicate/reversed-edge collapse, (c) DuckDB parity on
the driver corpus against the unrolled-peel twin, (d) the loud
non-convergence guard, and (e) the checkpoint lifecycle (no
block-manager storage left behind — the ADVICE r14 #3 discipline,
applied from birth here).
"""

from __future__ import annotations

import duckdb
import pytest

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.graph import (
    kcore_near_dup_df,
    kcore_pairs_df,
    sql_kcore_near_dup,
)

queries()


def _core(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "doc_a BIGINT, doc_b BIGINT")
    return {r.doc_id: r.core_degree for r in kcore_pairs_df(df, **kw).collect()}


def test_triangle_survives_chain_does_not(spark):
    # triangle + a tail: the 2-core is exactly the triangle (each member
    # keeps degree 2 inside it); the tail peels away over two rounds
    got = _core(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    assert got == {1: 2, 2: 2, 3: 2}
    # a pure chain (tree) has NO 2-core
    assert _core(spark, [(1, 2), (2, 3), (3, 4)]) == {}


def test_k4_under_k3_and_pendant_trim(spark):
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    # K4 is a 3-core: every node keeps degree 3
    assert _core(spark, k4, k=3) == {i: 3 for i in (1, 2, 3, 4)}
    # a pendant on node 1 does not change the 3-core and is trimmed
    assert _core(spark, k4 + [(1, 99)], k=3) == {i: 3 for i in (1, 2, 3, 4)}
    # under K=4, K4 has no core (degree 3 < 4 everywhere)
    assert _core(spark, k4, k=4) == {}


def test_duplicate_and_reversed_edges_collapse(spark):
    tri = [(1, 2), (2, 3), (1, 3)]
    noisy = tri + [(2, 1), (3, 2), (1, 2), (5, 5)]  # dups, reversals, loop
    assert _core(spark, noisy) == _core(spark, tri)


def test_two_rounds_needed(spark):
    # triangle + chain of 3: round 1 peels node 6, round 2 peels 5 and 4,
    # round 3 confirms the fixpoint — inside the KCORE_ROUNDS budget
    g = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    assert _core(spark, g) == {1: 2, 2: 2, 3: 2}


def test_empties_exactly_on_last_round_is_converged(spark):
    # r15 review #3: a 13-node chain's 12 canonical edges peel
    # 12 -> 10 -> 8 -> 6 -> 4 -> 2 -> 0, emptying EXACTLY on round 6 of
    # the 6-round budget; an empty set is a proven fixpoint, so this
    # must return the empty core, not raise
    chain = [(i, i + 1) for i in range(1, 13)]
    assert _core(spark, chain) == {}


def test_nonconvergence_raises_loudly(spark):
    # a chain of 9 needs ~4 peel rounds; rounds=1 must raise, never
    # return the partially-peeled edge set as if it were the core
    chain = [(i, i + 1) for i in range(1, 10)]
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _core(spark, chain, rounds=1)


def test_driver_corpus_duckdb_parity_and_nonvacuous(spark, sf_dir):
    got = canonical_rows(kcore_near_dup_df(spark, sf_dir).toPandas())
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "documents")
    want = canonical_rows(
        con.sql(
            sql_kcore_near_dup(REGISTRY["dedup_ngram_jaccard_pairs"].oracle)
        ).df()
    )
    assert got == want
    assert got, "empty 2-core at driver scale — pick a denser corpus"


def test_result_plan_is_o1_checkpoint_read(spark):
    # the returned frame is pinned to the small RESULT checkpoint (the
    # pagerank final-rank shape), so the consumer-visible plan is a
    # constant-size materialization read — independent of how many peel
    # rounds ran, with no join or corpus lineage embedded
    from thesis_iceberg_spark.plans import formatted_plan

    tri = [(1, 2), (2, 3), (1, 3)]
    deep = tri + [(3, 4), (4, 5), (5, 6), (6, 7)]  # needs more rounds
    df1 = spark.createDataFrame(tri, "doc_a BIGINT, doc_b BIGINT")
    df2 = spark.createDataFrame(deep, "doc_a BIGINT, doc_b BIGINT")
    p1 = formatted_plan(kcore_pairs_df(df1))
    p2 = formatted_plan(kcore_pairs_df(df2))
    assert "ExistingRDD" in p1 or "LocalTableScan" in p1
    assert p2.count("Join") == p1.count("Join") == 0
    assert len(p2) < 1.5 * len(p1)


def test_checkpoint_storage_released(spark):
    # every per-round localCheckpoint (and the pairs/edges staging) must
    # be freed by the time the result materializes
    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    _core(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    # the FINAL surviving edge frame is still referenced by the returned
    # (already-collected) plan; everything intermediate must be gone.
    # _core collected and dropped the frame, so at most the last edges
    # checkpoint may linger until GC — assert no more than one.
    assert n_persistent() - before <= 1
