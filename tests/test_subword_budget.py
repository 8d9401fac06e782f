"""token_budget_select_subword_df (r13, df-level; r14 registration
candidate): the budget stage denominated in BPE subword tokens instead
of whitespace words — DuckDB parity via the composed quality + bpe +
prefix-rule twin, plus the semantic delta vs the word-count stage.
"""

from __future__ import annotations

import duckdb

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.bpe import _bpe_oracle
from thesis_iceberg_spark.queries.pipeline_q import (
    sql_token_budget_select,
    token_budget_select_subword_df,
)

queries()


def _oracle() -> str:
    # the SAME builder the registered word-count query's oracle uses —
    # only the token-mass CTE differs, so the prefix rule cannot drift
    # between the two (review r13)
    return sql_token_budget_select(
        f"SELECT doc_id, n_subwords AS n_tokens FROM ({_bpe_oracle()})",
        "sel.doc_id, CAST(sel.n_tokens AS BIGINT) AS n_tokens",
    )


def test_parity_on_driver_corpus(spark, sf_dir):
    got = canonical_rows(
        token_budget_select_subword_df(spark, sf_dir).toPandas()
    )
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "documents")
    want = canonical_rows(con.sql(_oracle()).df())
    assert got == want
    assert got, "budget kept nothing at driver scale"


def test_subword_budget_differs_from_word_budget(spark, sf_dir):
    # the point of the variant: subword mass != whitespace-word mass, so
    # the kept token totals differ even when the kept SETS overlap
    # heavily (quality order is the same; only the masses move the
    # boundary).  Guard against the vacuous case where both stages
    # select identical (doc_id, n_tokens) rows.
    sub = {
        (r.doc_id, r.n_tokens)
        for r in token_budget_select_subword_df(spark, sf_dir).collect()
    }
    word = {
        (r.doc_id, r.n_tokens)
        for r in REGISTRY["pipeline_token_budget_select"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert sub != word
    # every document still carries MORE subwords than words (the leading
    # space marker guarantees >= 1 subword per word; merges only fuse)
    n_sub = dict(sub)
    for doc_id, n_words in word:
        if doc_id in n_sub:
            assert n_sub[doc_id] >= n_words
