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


# --- degenerate EMBEDDINGS (round 7, second sweep) --------------------------
# zero-norm vectors (plain divides threw DIVIDE_BY_ZERO under ANSI), NULL
# embeddings and ragged widths (pyspark.ml KMeans threw opaquely from fit)

_EMB_QUERIES = sorted(
    n
    for n in REGISTRY
    if ("ann" in n or "embedding" in n or "semdedup" in n or "kmeans" in n)
)


@pytest.fixture(scope="module")
def degenerate_emb_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degen_emb"))
    rows = [
        (1, [1.0] * 64, "a"),
        (2, [0.0] * 64, "b"),  # zero-norm: NULL cosine, never a neighbor
        (3, None, "c"),  # NULL embedding: excluded everywhere
        (4, [2.0] * 64, "d"),
        (5, [1.0, 2.0], "e"),  # ragged width: excluded from kmeans fit
    ] + [(10 + i, [float(i + j) for j in range(64)], "x") for i in range(12)]
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label STRING"
    ).write.parquet(f"{d}/embeddings.parquet")
    return d


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_embedding_operator_survives_degenerate_vectors(
    spark, degenerate_emb_dir, name
):
    REGISTRY[name].fn(spark, degenerate_emb_dir).collect()


def test_zero_norm_vector_is_null_cosine_not_neighbor(spark, degenerate_emb_dir):
    rows = REGISTRY["ann_cosine_topk"].fn(spark, degenerate_emb_dir).collect()
    by_id = {r.vec_id: r.cosine for r in rows}
    # the zero vector may appear only with NULL cosine at the tail (both
    # engines sort NULLs last under DESC), never with a fabricated score
    assert by_id.get(2, None) is None
