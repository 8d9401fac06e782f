"""Degenerate-document robustness (round 7): every text/pipeline/dedup
operator over the documents table must SURVIVE empty, whitespace-only, and
NULL text — a certainty in any real corpus — under Spark 4's default ANSI
mode, where a bare `x / 0` or `array[i]` out-of-bounds THROWS instead of
yielding NULL.  The round-7 sweep found three operators crashing with
DIVIDE_BY_ZERO on an empty doc (text_quality_scores and its composer
pipeline_clean_corpus, pipeline_dedup_paragraphs); they now use try_divide,
which also matches the DuckDB oracles (division by zero is NULL there)."""

from __future__ import annotations

import pytest

from thesis_iceberg_spark.queries import REGISTRY, queries

queries()

# operators whose only input is the documents table
_DOC_QUERIES = sorted(
    name
    for name in REGISTRY
    if (
        name.startswith(("text_", "pipeline_", "dedup_"))
        and "embedding" not in name
        and "semdedup" not in name
        and "kmeans" not in name
        and name != "dedup_drop_duplicates"  # events-table operator
    )
)


@pytest.fixture(scope="module")
def degenerate_docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degen"))
    rows = [
        (1, "hello world this is a perfectly ordinary document", "en", "web", 50),
        (2, "", "en", "web", 0),  # empty text
        (3, "   ", "en", "web", 3),  # whitespace only
        (4, None, "en", "web", None),  # NULL text
        (5, "dup dup dup dup dup dup dup dup", "en", "web", 31),
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.parquet(f"{d}/documents.parquet")
    return d


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_doc_operator_survives_degenerate_docs(spark, degenerate_docs_dir, name):
    # must not raise (DIVIDE_BY_ZERO, INVALID_ARRAY_INDEX, NPE-class); the
    # VALUES for degenerate rows are NULL-propagating per operator contract
    REGISTRY[name].fn(spark, degenerate_docs_dir).collect()


def test_quality_scores_null_contract(spark, degenerate_docs_dir):
    got = {
        r.doc_id: r.asDict()
        for r in REGISTRY["text_quality_scores"]
        .fn(spark, degenerate_docs_dir)
        .collect()
    }
    assert got[1]["alpha_ratio"] is not None
    # empty text: 0/0 ratios are NULL (DuckDB parity), not a crash
    assert got[2]["punct_ratio"] is None and got[2]["alpha_ratio"] is None
