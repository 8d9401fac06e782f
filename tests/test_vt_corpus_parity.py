"""\\x0B (vertical tab) corpus parity (r10 unification, VERDICT r9 gap #1).

Before r10 the md5-portable shingle kernels REJECTED \\x0B text (Java/
Python `\\s` includes it, RE2's excludes it) — a real-world corpus with
one vertical tab made ~10 text/pipeline queries raise instead of answer.
Every twin family now folds \\x0B to a space before trimming in all three
engines, so the whole documents-table operator surface must return
IDENTICAL answers from Spark and the DuckDB oracle on a \\x0B-bearing
corpus.  This test runs the full oracle comparison — the same harness the
driver uses — for every registered documents-only query over a crafted
corpus where \\x0B appears interior, edge, in runs, and mixed with other
whitespace.
"""

from __future__ import annotations

import pytest

from thesis_iceberg_spark.oracle import compare_query, duckdb_connection
from thesis_iceberg_spark.queries import REGISTRY, queries

queries()

# registered documents-only operators WITH a DuckDB value oracle (the
# embedding/kmeans/semdedup families read embeddings.parquet; drop_duplicates
# reads events) — mirrors test_empty_doc_robustness's selection
_DOC_QUERIES = sorted(
    name
    for name, spec in REGISTRY.items()
    if (
        spec.oracle is not None
        and name.startswith(("text_", "pipeline_", "dedup_"))
        and "embedding" not in name
        and "semdedup" not in name
        and "kmeans" not in name
        and name != "dedup_drop_duplicates"
    )
) + ["pandas_udf_scalar_text", "udtf_tokenize_positions"]


@pytest.fixture(scope="module")
def vt_docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vtcorp"))
    base = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "naps in the warm afternoon sun near the old barn"
    )
    rows = [
        # ordinary docs so pair-finding operators have real work
        (1, base, "en", "web", len(base)),
        (2, base + " extra trailing words here", "en", "web", len(base) + 26),
        # interior \x0B between tokens — must split exactly like a space
        (3, base.replace(" fox ", "\x0bfox\x0b", 1), "en", "web", len(base)),
        # edge \x0B — must fold BEFORE the space-only trim (no empty token)
        (4, "\x0b" + base + "\x0b", "en", "web", len(base) + 2),
        # \x0B runs mixed with tabs/newlines
        (5, base.replace(" dog ", " \x0b\x0b\tdog\n\x0b ", 1), "en", "books", len(base)),
        # a near-duplicate pair where ONLY the whitespace flavor differs:
        # after the fold both normalize identically -> exact-dedup hit
        (6, "alpha beta gamma delta epsilon zeta eta theta", "de", "web", 45),
        (7, "alpha\x0bbeta gamma\x0bdelta epsilon zeta eta theta", "de", "web", 46),
        # degenerate shapes stay in contract
        (8, "\x0b", "en", "web", 1),
        (9, "", "en", "web", 0),
        (10, None, "fr", "web", None),
        # edge \n/\t: pandas .str.strip() eats them, space-only trim()
        # keeps them as an empty token — the empty-drop contract must
        # absorb the difference (review r10)
        (11, "edge newline doc\n", "en", "web", 17),
        (12, "\ttab lead doc", "en", "web", 13),
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.parquet(f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def vt_con(vt_docs_dir):
    # duckdb_connection registers every testdata table eagerly; the crafted
    # dir has only documents, so register that one view the same way
    import duckdb

    con = duckdb.connect()
    con.sql(
        # Spark wrote a parquet DIRECTORY (unlike the driver's plain files)
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{vt_docs_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_vt_corpus_oracle_parity(spark, vt_docs_dir, vt_con, name):
    spec = REGISTRY[name]
    r = compare_query(spark, vt_con, name, spec.fn, spec.oracle, vt_docs_dir)
    assert r.ok, str(r)


def test_vt_whitespace_flavor_pair_is_exact_dup(spark, vt_docs_dir):
    """Docs 6 and 7 differ only in \\x0B-vs-space — after the unified fold
    they share one fingerprint and the exact-dedup operator groups them
    (canonical 6, group of 2)."""
    rows = REGISTRY["dedup_exact_hash"].fn(spark, vt_docs_dir).collect()
    assert any(r.canonical_doc_id == 6 and r.n_docs == 2 for r in rows), rows
