"""Graph centrality over the near-duplicate similarity graph (§2B).

Connected components (dedup.cluster) answer "which docs form one
near-dup cluster"; the OTHER graph signal a curation pipeline wants is
CENTRALITY — a document with high PageRank in the similarity graph is a
boilerplate HUB (a template many pages instantiate), which is exactly
the content quality filters want to down-weight.  This module runs a
fixed-iteration PageRank over the undirected Jaccard-pair graph.

Determinism discipline: the textbook iteration is float arithmetic with
order-dependent sums — excluded by the 1-ulp rules.  This implementation
keeps EVERYTHING in scaled integers (PR_SCALE = 1e12 units of mass):

    r_0(v)    = SCALE div N
    r_{k+1}(v) = (15 * SCALE) div (100 * N)
               + (85 * sum_{u->v} (r_k(u) div deg(u))) div 100

Integer sums are order-free, integer division is deterministic, and the
truncation bias (mass lost to div) is identical in every engine — so
the whole K-iteration fixed point is FULLY value-oracle-able, unlike
any float PageRank.  The iteration is the classic damping-0.85 form;
total mass is not exactly conserved (truncation), which a ranking
consumer never needed.

Scale slots: one Jaccard pair generation (the existing df-capped
shingle join), then per iteration ONE equi-join of the edge list with
the rank frame and ONE groupBy(dst) — the Pregel shape.  deg(src) is
joined onto the edge list ONCE outside the loop and the combined frame
checkpointed (loop-invariant); at 100 TB both sides pre-partition by id
so the per-iteration join reuses one partitioning.  Every node of the
undirected graph has in-degree >= 1, so the inner-join form drops
nobody.

ref: the reference engine has no graph surface; §2B extension beside
dedup_cluster_canonical's connected components.  df-level in r13 (the
+4 registration cap is met); r14 registration candidate —
sql_pagerank_near_dup() is the ready oracle builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register

PR_SCALE = 10**12  # integer mass units; 1e12 keeps div truncation tiny
# (<= 1e-12 of total mass per op) while N * SCALE stays far inside bigint
PR_ITERS = 3


def pagerank_near_dup_df(
    spark: SparkSession, sf_dir: str, iters: int = PR_ITERS
) -> DataFrame:
    """(doc_id, rank_scaled): ``iters`` exact-integer PageRank rounds
    over the undirected near-dup Jaccard graph (nodes = docs appearing
    in at least one pair)."""
    from thesis_iceberg_spark.queries.dedup import dedup_ngram_jaccard_pairs

    return pagerank_pairs_df(
        dedup_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b"),
        iters,
    )


def pagerank_pairs_df(pairs: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """The iteration over ANY undirected (doc_a, doc_b) pair frame — the
    level crafted-graph tests drive directly (a star graph's hub/leaf
    ranks are hand-computable; the near-dup wrapper only supplies the
    edge source)."""
    # pin the PAIR frame first: every downstream piece (edges, nodes, nn,
    # deg, r0 and all K iterations) derives from this one
    # materialization, so the expensive pair-generation lineage — the
    # shingle self-join for the near-dup wrapper — executes exactly ONCE
    # (review r13: checkpointing only the edge+degree frame left
    # nodes/nn/r0 carrying the full generation lineage into the final
    # job)
    pairs = pairs.localCheckpoint(eager=True)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    nodes = edges.select(F.col("src").alias("doc_id")).distinct()
    nn = nodes.agg(F.count("*").alias("n"))
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # deg(src) is loop-invariant: pin the joined frame too, so the K
    # iterations reference one materialized edge list instead of
    # re-deriving the union+groupBy+join subtree K times in the final
    # plan (cheap: it reads the pairs checkpoint)
    ew = edges.join(deg, "src").localCheckpoint(eager=True)
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "doc_id", F.expr(f"CAST({PR_SCALE} AS BIGINT) div n").alias("r")
    )
    for _ in range(iters):
        contrib = (
            ew.join(r, ew.src == r.doc_id)
            .select(F.col("dst"), F.expr("r div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        r = (
            contrib.crossJoin(F.broadcast(nn))
            .select(
                F.col("dst").alias("doc_id"),
                F.expr(
                    f"CAST(15 * {PR_SCALE} AS BIGINT) div (100 * n)"
                    " + (85 * s) div 100"
                ).alias("r"),
            )
            # per-iteration checkpoint (VERDICT r13 #5, the GraphX/Pregel
            # discipline): without it iteration k's plan embeds all k-1
            # prior join+agg subtrees, so the final job's plan grows
            # linearly in K and the lineage re-derivation cost with it;
            # with it every iteration's plan is O(1) — one equi-join +
            # one groupBy over the ew checkpoint and the previous rank
            # materialization (tiny: one row per node).  Plan-size pinned
            # in tests/test_pagerank.py.
            .localCheckpoint(eager=True)
        )
    return r.select("doc_id", F.col("r").alias("rank_scaled"))


def sql_pagerank_near_dup(pairs_sql: str, iters: int = PR_ITERS) -> str:
    """DuckDB twin builder: unrolls ``iters`` rounds of the same integer
    iteration over the registered Jaccard-pairs oracle fragment — one
    generator for any K, the _funnel_oracle discipline."""
    # MATERIALIZED: DuckDB inlines (re-evaluates) a CTE per reference by
    # default, and pairs/edges are referenced from every unrolled round —
    # without the hint the expensive Jaccard fragment ran ~10x (measured
    # 28.2 -> 9.1 s at sf0.01, identical rows; r14)
    ctes = [
        f"pairs AS MATERIALIZED ({pairs_sql})",
        "edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs"
        " UNION ALL SELECT doc_b, doc_a FROM pairs)",
        "nodes AS (SELECT DISTINCT src AS doc_id FROM edges)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS (SELECT src AS doc_id, COUNT(*) AS d FROM edges GROUP BY 1)",
        f"r0 AS (SELECT doc_id, CAST({PR_SCALE} AS BIGINT) // n AS r"
        " FROM nodes, nn)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"r{k} AS (\n"
            f"  SELECT e.dst AS doc_id,\n"
            f"         CAST(15 * {PR_SCALE} AS BIGINT) // (100 * nn.n)\n"
            f"           + (85 * SUM(p.r // deg.d)) // 100 AS r\n"
            f"  FROM edges e\n"
            f"  JOIN r{k - 1} p ON p.doc_id = e.src\n"
            f"  JOIN deg ON deg.doc_id = e.src, nn\n"
            f"  GROUP BY e.dst, nn.n)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT doc_id, CAST(r AS BIGINT) AS rank_scaled FROM r{iters}"
    )


def _pagerank_oracle() -> str:
    # imported for its registration side effect (the _pretrain_oracle
    # pattern): the composed oracle reads the registered Jaccard-pairs
    # fragment, and a standalone `import graph` must not depend on
    # _load_all having imported dedup first
    from thesis_iceberg_spark.queries import REGISTRY, dedup  # noqa: F401

    return sql_pagerank_near_dup(REGISTRY["dedup_ngram_jaccard_pairs"].oracle)


@register(
    "pagerank_near_dup",
    oracle=_pagerank_oracle(),
    doc=f"Exact-integer PageRank ({PR_ITERS} damping-0.85 rounds, all "
    f"mass in scaled {PR_SCALE} bigint units) over the undirected "
    "near-dup Jaccard graph — boilerplate-HUB detection beside "
    "connected components (registered r14, VERDICT r13 #1). Integer "
    "sums are order-free and integer division deterministic, so the "
    "whole K-round fixed point carries a FULL value oracle (the "
    "K-round-unrolled DuckDB generator shares the registered Jaccard "
    "fragment, the composed-oracle discipline) — where float PageRank "
    "never can. Scale shape: pair generation checkpointed ONCE, deg "
    "joined onto edges once outside the loop, then per iteration ONE "
    "id equi-join + ONE groupBy(dst) with the rank frame checkpointed "
    "per round (the Pregel discipline — every iteration's plan is "
    "O(1), plan-size pinned in tests/test_pagerank.py).",
)
def pagerank_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank_near_dup_df(spark, sf_dir)
