"""pagerank_near_dup_df (r13, df-level; r14 registration candidate):
exact-integer PageRank over the near-dup Jaccard graph.  Pins (a)
DuckDB parity of the full unrolled iteration on the driver corpus, (b)
the recurrence itself against an independent pure-Python reference on
crafted graphs (star, path, two components), (c) the hub-outranks-leaf
semantics a boilerplate detector needs, and (d) the loop-invariant
plan shape.
"""

from __future__ import annotations

import duckdb

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.graph import (
    PR_ITERS,
    PR_SCALE,
    pagerank_near_dup_df,
    pagerank_pairs_df,
    sql_pagerank_near_dup,
)

queries()


def _py_reference(pairs: list[tuple[int, int]], iters: int) -> dict[int, int]:
    """Independent implementation of the integer recurrence (plain dicts,
    no shared code with the Spark/SQL forms)."""
    edges: list[tuple[int, int]] = []
    for a, b in pairs:
        edges.append((a, b))
        edges.append((b, a))
    nodes = sorted({s for s, _ in edges})
    n = len(nodes)
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: PR_SCALE // n for v in nodes}
    for _ in range(iters):
        s_in: dict[int, int] = {v: 0 for v in nodes}
        for s, d in edges:
            s_in[d] += r[s] // deg[s]
        r = {v: (15 * PR_SCALE) // (100 * n) + (85 * s_in[v]) // 100 for v in nodes}
    return r


def _spark_ranks(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a BIGINT, doc_b BIGINT")
    return {
        r.doc_id: r.rank_scaled for r in pagerank_pairs_df(df).collect()
    }


def test_star_graph_matches_reference_and_hub_outranks(spark):
    pairs = [(1, 10), (1, 11), (1, 12)]  # hub 1, leaves 10-12
    got = _spark_ranks(spark, pairs)
    assert got == _py_reference(pairs, PR_ITERS)
    assert got[1] > got[10] == got[11] == got[12]


def test_path_and_disconnected_components_match_reference(spark):
    # a 4-path plus a separate 2-clique: per-component mass, middle of
    # the path outranks its endpoints
    pairs = [(1, 2), (2, 3), (3, 4), (50, 51)]
    got = _spark_ranks(spark, pairs)
    assert got == _py_reference(pairs, PR_ITERS)
    assert got[2] > got[1] and got[3] > got[4]


def test_driver_corpus_duckdb_parity(spark, sf_dir):
    got = canonical_rows(pagerank_near_dup_df(spark, sf_dir).toPandas())
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "documents")
    want = canonical_rows(
        con.sql(
            sql_pagerank_near_dup(REGISTRY["dedup_ngram_jaccard_pairs"].oracle)
        ).df()
    )
    assert got == want
    assert got, "empty similarity graph at driver scale"


def test_oracle_generator_unrolls_k_rounds():
    s2 = sql_pagerank_near_dup("SELECT 1 AS doc_a, 2 AS doc_b", iters=2)
    assert "r2 AS" in s2 and "r3 AS" not in s2 and s2.strip().endswith("FROM r2")


def test_pair_generation_runs_once_not_per_iteration(spark, sf_dir):
    # the PAIR frame is checkpointed before anything derives from it
    # (review r13): the final plan reads the checkpoint everywhere —
    # no parquet scan, no shingle self-join, no Jaccard filter — so the
    # expensive generation lineage can only have executed in the one
    # checkpoint job
    from thesis_iceberg_spark.plans import formatted_plan

    plan = formatted_plan(pagerank_near_dup_df(spark, sf_dir))
    assert "ExistingRDD" in plan or "LocalTableScan" in plan  # checkpoint read
    assert "documents.parquet" not in plan
    assert "jaccard" not in plan.lower()


def test_iteration_plan_is_o1_not_growing(spark):
    # per-iteration rank checkpoint (VERDICT r13 #5, the Pregel
    # discipline): iteration k's plan must read the k-1 materialization,
    # not embed all prior join+agg subtrees — so the FINAL plan's size
    # and join count stay constant as K grows.  Without the checkpoint,
    # K=8 carries 8 nested join+agg rounds and this assert fails.
    from thesis_iceberg_spark.plans import formatted_plan

    pairs = [(1, 2), (2, 3), (3, 4), (1, 4)]
    df = spark.createDataFrame(pairs, "doc_a BIGINT, doc_b BIGINT")
    p1 = formatted_plan(pagerank_pairs_df(df, iters=1))
    p8 = formatted_plan(pagerank_pairs_df(df, iters=8))
    assert p8.count("Join") == p1.count("Join")
    assert len(p8) < 1.5 * len(p1)
