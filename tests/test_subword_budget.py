"""token_budget_select_subword_df (r13, df-level; r14 registration
candidate): the budget stage denominated in BPE subword tokens instead
of whitespace words — DuckDB parity via the composed quality + bpe +
prefix-rule twin, plus the semantic delta vs the word-count stage.
"""

from __future__ import annotations

import duckdb

from thesis_iceberg_spark.oracle import canonical_rows
from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.bpe import _bpe_oracle
from thesis_iceberg_spark.queries.pipeline_q import (
    BUDGET_FRAC,
    token_budget_select_subword_df,
)

queries()


def _oracle() -> str:
    quality = REGISTRY["text_quality_scores"].oracle
    return f"""
WITH q AS ({quality}),
e AS ({_bpe_oracle()}),
s AS (SELECT q.doc_id, q.quality_score, e.n_subwords AS n_tokens
      FROM q JOIN e ON e.doc_id = q.doc_id
      WHERE q.quality_score IS NOT NULL),
b AS (SELECT CAST(floor(SUM(n_tokens) * {BUDGET_FRAC}) AS BIGINT) AS budget
      FROM s),
sel AS (SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM s)
SELECT sel.doc_id, CAST(sel.n_tokens AS BIGINT) AS n_tokens
FROM sel, b WHERE sel.cum <= b.budget
"""


def test_parity_on_driver_corpus(spark, sf_dir):
    got = canonical_rows(
        token_budget_select_subword_df(spark, sf_dir).toPandas()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
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
