"""hybrid_rrf_topk_df (r14, df-level; r15/r16 registration candidate):
reciprocal-rank fusion of the registered BM25 and cosine-ANN arms.
Pins DuckDB parity via the composed twin, the exact two-division score
arithmetic, and the both-arms-beat-one-arm fusion semantics.
"""

from __future__ import annotations

import duckdb

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.queries import queries
from thesis_iceberg_spark.queries.search import (
    RRF_C,
    hybrid_rrf_topk_df,
    sql_hybrid_rrf,
)

queries()


def test_parity_on_driver_corpus(spark, sf_dir):
    got = canonical_rows(hybrid_rrf_topk_df(spark, sf_dir).toPandas())
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "documents")
    duckdb_table_view(con, sf_dir, "embeddings")
    want = canonical_rows(con.sql(sql_hybrid_rrf()).df())
    assert got == want
    assert got, "fusion returned nothing at driver scale"


def test_scores_are_the_exact_two_term_sum(spark, sf_dir):
    rows = hybrid_rrf_topk_df(spark, sf_dir).collect()
    both = one = 0
    for r in rows:
        want = 0.0
        if r.bm25_rank is not None:
            want += 1.0 / (RRF_C + float(r.bm25_rank))
        if r.ann_rank is not None:
            want += 1.0 / (RRF_C + float(r.ann_rank))
        assert r.rrf_score == want, r  # exact IEEE, not approx
        if r.bm25_rank is not None and r.ann_rank is not None:
            both += 1
        else:
            one += 1
    # ranks are dense from 1 and ordered by score
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    # the fusion is non-vacuous: the two arms genuinely overlap AND
    # genuinely disagree on this corpus — and because scores are exact
    # and ordered, any both-arms doc mechanically outranks a single-arm
    # doc whose one rank is no better (1/(C+r) + 1/(C+r') > 1/(C+r))
    assert both > 0, "no doc retrieved by both arms"
    assert one > 0, "the arms returned identical lists"
