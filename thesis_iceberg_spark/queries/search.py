"""Lexical search: BM25 top-k retrieval over the documents table.

The reference engine's query surface is relational + vector; a training-
data pipeline at 100 TB also needs KEYWORD retrieval (corpus triage,
targeted decontamination, eval-set mining).  BM25 (Robertson &
Sparck Jones's probabilistic ranking function, the Okapi/Lucene default)
is public knowledge; this is a from-scratch Spark-first expression, not
a port (ref has no lexical search endpoint — this extends §2B alongside
the ANN family in similarity.py).

Spark shape (and why it survives 100 TB):
  * per-doc stats — dl (token count) and tf per query term — are
    higher-order functions over the token array: a NARROW map, no
    explode, no shuffle, whole-stage codegen;
  * corpus stats (N, avgdl, df per term) fold into ONE single-row
    aggregate (map-side combined) that is crossJoin(broadcast)ed back —
    a broadcast nested-loop of exactly one row, i.e. a free
    per-partition closure;
  * scoring is literal arithmetic per row; top-k is orderBy+limit =
    TakeOrderedAndProject (per-partition heaps + one k-row reduce, no
    global sort) — plan-gated in tests/test_bm25_search.py.
So the whole query is: one scan -> one scalar-agg shuffle of ONE row ->
one top-k reduce.  Query terms are a handful of literals; k1/b are the
classic defaults.

Exactness split (cross-engine cookbook, DEVNOTES): the BM25 score uses
ln(), which differs by 1 ulp between JVM StrictMath and libm, so the
SCORE never appears in oracle output.  The registered query returns the
RANKING (rank, doc_id) plus exact integer evidence columns (n_match_terms,
tf_sum, dl) — safe because the measured adjacent-rank score margin on the
synthetic corpus is ~4e-3 absolute (floor-asserted at 1e-6 in
tests/test_bm25_search.py) while cross-engine ln noise is ~1e-15: the
argsort cannot flip between engines (same precedent as the value-oracled
semdedup centroid-far keeper, dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.queries.text import _SQL_LM_FTOKS, _docs, _lm_ftoks

# Classic Okapi defaults (Robertson et al., TREC-3).
BM25_K1 = 1.2
BM25_B = 0.75

# Registered query: one rare term ('dup', df ~5% of docs on the synthetic
# corpus) + two common terms, so the idf spread actually exercises the
# ranking.  Terms must be lowercase (the tokenizer lowercases).
BM25_QUERY_TERMS = ("dup", "join", "slow")
BM25_TOP_K = 10


def bm25_topk_df(
    spark: SparkSession,
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    with_score: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Top-``k`` docs by BM25 over ``terms``: (rank, doc_id, n_match_terms,
    tf_sum, dl[, score]).

    Semantics pinned for the oracle: N and avgdl are over docs with at
    least one token (empty/NULL/whitespace docs carry no mass); docs
    matching zero query terms are excluded (inner-join search semantics);
    idf is the always-positive Lucene plus-one variant
    ln(1 + (N - df + 0.5)/(df + 0.5)); ties break on doc_id ASC.
    ``with_score`` exposes the ln-based score for the margin/pin tests —
    it is NEVER part of the value-oracled output (1-ulp rule).
    """
    if not terms:
        raise ValueError("BM25 needs at least one query term")

    def tf_of(term: str):
        # NB: a 2-param lambda in F.filter is (element, index) — a
        # default-arg capture would be overridden by the index column
        return F.size(F.filter(F.col("toks"), lambda x: x == F.lit(term)))

    # The certified token array is HOISTED into one projected column so
    # fold+certify (the _jvm_certify regex scan of the full text) costs
    # once per row BY CONSTRUCTION, not by codegen subexpression
    # elimination (VERDICT r11 #1 — CollapseProject keeps the projection
    # because the tokenizer chain is non-cheap and multiply referenced).
    toked = docs.select("doc_id", _lm_ftoks().alias("toks"))
    # per_doc feeds BOTH the corpus-stats aggregate and the scoring probe
    # side; without materialization Spark executes the tokenize+certify
    # subtree once per branch.  ``materialize`` (default ON) pins the
    # NARROW frame (doc_id + ints, ~16 B/row vs KBs of text) so the
    # second branch never re-reads text — the 100 TB configuration, and
    # ALSO the measured sf0.1 winner: interleaved same-JVM A/B (r12,
    # tests/exp_bm25_gate_cost.py protocol) put mat at 0.63 s vs 0.76 s
    # no-mat steady median — the saved tokenize+certify pass beats the
    # checkpoint's fixed job overhead even at 17 MB of text.
    per_doc = toked.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[tf_of(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    ).filter(F.col("dl") > 0)
    if materialize:
        per_doc = per_doc.localCheckpoint(eager=True)
    # ONE row of corpus stats: N, avgdl, df per term — map-side combined
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.crossJoin(F.broadcast(stats))
    # idf uses exact-integer inputs, so (N - df + 0.5)/(df + 0.5) is the
    # same rational in both engines; only the final ln() is 1-ulp noisy.
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        term = idf * tf * F.lit(k1 + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
        score = term if score is None else score + term
    matched = scored.select(
        "doc_id",
        score.alias("score"),
        sum(
            ((F.col(f"tf_{i}") > 0).cast("long") for i in range(len(terms))),
            F.lit(0).cast("long"),
        ).alias("n_match_terms"),
        sum(
            (F.col(f"tf_{i}").cast("long") for i in range(len(terms))),
            F.lit(0).cast("long"),
        ).alias("tf_sum"),
        F.col("dl").cast("long").alias("dl"),
    ).filter(F.col("n_match_terms") > 0)
    top = matched.orderBy(F.col("score").desc(), "doc_id").limit(k)
    # rank the k survivors: a window over <= k rows (single tiny task)
    rank = F.row_number().over(
        Window.orderBy(F.col("score").desc(), "doc_id")
    )
    cols = ["rank", "doc_id", "n_match_terms", "tf_sum", "dl"] + (
        ["score"] if with_score else []
    )
    return top.select(rank.cast("long").alias("rank"), *top.columns).select(*cols)


def _sql_terms_values(terms: tuple[str, ...]) -> str:
    return ", ".join("('" + t.replace("'", "''") + "')" for t in terms)


@register(
    "search_bm25_topk",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_LM_FTOKS}) AS t FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
corpus AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
q(t) AS (VALUES {_sql_terms_values(BM25_QUERY_TERMS)}),
tf AS (SELECT tok.doc_id, tok.t, count(*) AS tf
       FROM tok JOIN q ON tok.t = q.t GROUP BY tok.doc_id, tok.t),
dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
sc AS (
  SELECT tf.doc_id,
         sum( ln(1 + (corpus.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf * {BM25_K1 + 1.0}
              / (tf.tf + {BM25_K1} * ({1.0 - BM25_B}
                                      + {BM25_B} * dl.dl / corpus.avgdl)) )
             AS score,
         count(*) AS n_match_terms,
         CAST(sum(tf.tf) AS BIGINT) AS tf_sum,
         CAST(any_value(dl.dl) AS BIGINT) AS dl
  FROM tf JOIN dl ON dl.doc_id = tf.doc_id, corpus, dfreq
  WHERE dfreq.t = tf.t
  GROUP BY tf.doc_id)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, n_match_terms, tf_sum, dl
FROM sc ORDER BY score DESC, doc_id LIMIT {BM25_TOP_K}
""",
    doc="BM25 lexical top-k retrieval (Okapi/Lucene plus-one idf, k1=1.2 "
    "b=0.75) over a 3-term query mixing one rare and two common terms. "
    "Value-oracled on the RANKING + exact integer evidence columns; the "
    "ln-based score itself is excluded by the 1-ulp rule and is safe to "
    "rank on because the measured adjacent-rank margin (~4e-3) is ~1e12 "
    "x cross-engine ln noise (floor-asserted in tests/test_bm25_search"
    ".py, same precedent as the semdedup keeper).  Plan: narrow HOF "
    "tf/dl map (no explode), ONE single-row stats aggregate broadcast "
    "back, TakeOrderedAndProject top-k — one scan, one one-row shuffle, "
    "one k-row reduce at any corpus size.",
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk_df(spark, _docs(spark, sf_dir))


# --- hybrid retrieval: reciprocal-rank fusion of BM25 + ANN (r14) ------------
#
# A retrieval stack at scale runs BOTH a lexical and a vector retriever
# and FUSES their rankings; reciprocal rank fusion (Cormack/Clarke/
# Buettcher 2009) is the standard zero-training fuser: score(d) =
# sum over arms of 1/(C + rank_arm(d)), C = 60.  Determinism: each term
# is ONE exactly-rounded IEEE division and the two-term sum is one
# exactly-rounded addition, so identical ranks give identical scores in
# every engine — the fusion is fully value-oracle-able, with ties broken
# by doc_id.  Scale shape: both arms end in top-k (TakeOrdered), so the
# fusion is a full-outer join + window over two <= k-row frames — free
# at any corpus size; the arms' own scale arguments carry the operator.

RRF_C = 60  # the published constant; dampens the head so a consistent
# mid-ranker beats a single lucky #1


def hybrid_rrf_topk_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank, doc_id, bm25_rank, ann_rank, rrf_score): RRF fusion of the
    registered BM25 lexical top-k and the brute-force cosine top-k (the
    embeddings table's vec_id aligns with documents.doc_id in this
    corpus).  A doc missing from one arm contributes only the other
    arm's term — the standard convention.  The fused depth is pinned at
    the ARMS' registered ks (both 10): a k parameter existed in the
    first draft but only half-reached the twin (the composed BM25
    fragment is frozen at its registered LIMIT and the ANN arm at
    TOP_K on both sides), so it was dropped rather than shipped broken
    (r14 review pass 3 #2).  r15/r16 registration candidate;
    sql_hybrid_rrf() is the ready oracle builder."""
    from pyspark.sql.window import Window as W

    from thesis_iceberg_spark.queries.similarity import ann_cosine_topk

    bm = bm25_topk_df(spark, _docs(spark, sf_dir), k=BM25_TOP_K).select(
        "doc_id", F.col("rank").alias("bm25_rank")
    )
    # re-rank the <= k-row ANN result (a window over a tiny frame; the
    # registered query's own (cosine DESC, vec_id) order)
    ann = ann_cosine_topk(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(W.orderBy(F.col("cosine").desc(), F.col("vec_id")))
        .cast("long")
        .alias("ann_rank"),
    )
    term = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(RRF_C)) + r.cast("double")), F.lit(0.0)
    )
    fused = (
        bm.join(ann, "doc_id", "full_outer")
        .select(
            "doc_id",
            "bm25_rank",
            "ann_rank",
            (term(F.col("bm25_rank")) + term(F.col("ann_rank"))).alias(
                "rrf_score"
            ),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )
    rank = F.row_number().over(
        W.orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    )
    return fused.select(
        rank.cast("long").alias("rank"),
        "doc_id",
        "bm25_rank",
        "ann_rank",
        "rrf_score",
    )


def sql_hybrid_rrf() -> str:
    """DuckDB twin of hybrid_rrf_topk_df, composed from the two arms'
    REGISTERED oracle fragments (the composed-oracle discipline): the
    ANN arm re-derives its rank from its own output ordering, the RRF
    terms are the identical two divisions + one addition.  Fused depth
    pinned at the arms' registered ks (see hybrid_rrf_topk_df)."""
    # imported for the registration side effect (_pagerank_oracle
    # pattern): a standalone consumer of this builder must not depend on
    # _load_all having imported similarity first (r14 review pass 3 #1 —
    # reproduced as a KeyError)
    from thesis_iceberg_spark.queries import REGISTRY, similarity  # noqa: F401

    bm = REGISTRY["search_bm25_topk"].oracle
    ann = REGISTRY["ann_cosine_topk"].oracle
    return f"""
WITH bm AS ({bm}),
ann0 AS ({ann}),
ann AS (SELECT vec_id AS doc_id,
               CAST(row_number() OVER (ORDER BY cosine DESC, vec_id)
                    AS BIGINT) AS ann_rank
        FROM ann0),
fused AS (
  SELECT COALESCE(bm.doc_id, ann.doc_id) AS doc_id,
         bm.rank AS bm25_rank, ann.ann_rank,
         COALESCE(1.0 / ({RRF_C} + CAST(bm.rank AS DOUBLE)), 0.0)
           + COALESCE(1.0 / ({RRF_C} + CAST(ann.ann_rank AS DOUBLE)), 0.0)
             AS rrf_score
  FROM bm FULL OUTER JOIN ann ON ann.doc_id = bm.doc_id)
SELECT CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT)
           AS rank,
       doc_id, bm25_rank, ann_rank, rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {BM25_TOP_K}
"""
