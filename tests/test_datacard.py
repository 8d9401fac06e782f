"""corpus_datacard_df (r13, df-level; r14 registration candidate): the
one-pass grouping-sets corpus profile — DuckDB parity, rollup
consistency, a crafted-duplicates corpus, and the one-scan plan gate.
"""

from __future__ import annotations

import duckdb

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.queries import queries
from thesis_iceberg_spark.queries.datacard import (
    corpus_datacard_df,
    sql_corpus_datacard,
)

queries()


def _parity(spark, d):
    got = canonical_rows(corpus_datacard_df(spark, d).toPandas())
    con = duckdb.connect()
    duckdb_table_view(con, d, "documents")
    want = canonical_rows(con.sql(sql_corpus_datacard()).df())
    assert got == want
    return got


def test_parity_on_driver_corpus(spark, sf_dir):
    rows = _parity(spark, sf_dir)
    assert rows


def test_rollup_rows_are_consistent_sums(spark, sf_dir):
    out = corpus_datacard_df(spark, sf_dir).collect()
    total = [r for r in out if r.gid == 3]
    assert len(total) == 1
    per_lang = [r for r in out if r.gid == 1]
    per_pair = [r for r in out if r.gid == 0]
    assert sum(r.n_docs for r in per_lang) == total[0].n_docs
    assert sum(r.n_tokens_total for r in per_pair) == total[0].n_tokens_total
    # distinct fingerprints do NOT sum across slices (cross-slice dups
    # collapse in the rollup): total <= sum of slices
    assert total[0].n_distinct_fp <= sum(r.n_distinct_fp for r in per_lang)


def test_crafted_duplicates_show_in_dup_frac(spark, tmp_path_factory):
    rows = [
        (1, "the same text twice", "en", "web", 19),
        (2, "the same text twice", "en", "web", 19),  # exact dup of 1
        (3, "something different here", "en", "web", 24),
        (4, "autre texte unique", "fr", "books", 18),
    ]
    d = str(tmp_path_factory.mktemp("datacard"))
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    out = {(r.gid, r.lang, r.source): r for r in corpus_datacard_df(spark, d).collect()}
    en = out[(0, "en", "web")]
    assert (en.n_docs, en.n_distinct_fp) == (3, 2)
    assert abs(en.dup_frac - 1 / 3) < 1e-12
    fr = out[(0, "fr", "books")]
    assert (fr.n_docs, fr.dup_frac) == (1, 0.0)
    total = out[(3, None, None)]
    assert (total.n_docs, total.n_distinct_fp) == (4, 3)
    _parity(spark, d)


def test_plan_is_one_scan_one_expand(spark, sf_dir):
    from thesis_iceberg_spark.plans import formatted_plan

    plan = formatted_plan(corpus_datacard_df(spark, sf_dir))
    # the per-doc features fuse into ONE documents scan; grouping sets
    # are Catalyst's Expand over it, partial-aggregated pre-exchange
    assert plan.count("documents.parquet") == 1, plan
    assert "Expand" in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
