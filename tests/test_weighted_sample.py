"""pipeline_weighted_sample_df (r13, df-level; r14 registration
candidate): bottom-k priority sampling (Duffield/Lund/Thorup u/w rule)
with the keyed-md5 draw — weight-proportional inclusion, cross-engine
bit-exact (one IEEE division, no sums, no libm).
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.queries import queries
from thesis_iceberg_spark.queries.pipeline_q import (
    pipeline_weighted_sample_df,
    sql_weighted_sample,
    weighted_sample_df,
)

queries()


def test_parity_on_driver_corpus(spark, sf_dir):
    got = canonical_rows(pipeline_weighted_sample_df(spark, sf_dir).toPandas())
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "documents")
    want = canonical_rows(con.sql(sql_weighted_sample()).df())
    assert got == want
    assert len(got) == 50


def test_inclusion_tracks_weight(spark):
    # 1000 docs, half weight 1 and half weight 100: the heavy half must
    # dominate a k=100 sample far beyond its 50% population share
    rows = [(i, 100 if i % 2 == 0 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, w BIGINT")
    heavy = sum(
        1 for r in weighted_sample_df(df, k=100).collect() if r.w == 100
    )
    assert heavy > 85, heavy  # E[heavy] ~ 99; 85 is a generous floor


def test_zero_and_negative_weights_never_sampled(spark):
    rows = [(1, 10), (2, 0), (3, -5), (4, 1)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, w BIGINT")
    ids = {r.doc_id for r in weighted_sample_df(df, k=10).collect()}
    assert ids == {1, 4}


def test_deterministic_across_runs_and_key_sensitivity(spark):
    df = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
    )
    a = [tuple(r) for r in weighted_sample_df(df, k=20).collect()]
    b = [tuple(r) for r in weighted_sample_df(df, k=20).collect()]
    assert a == b  # pure function of (doc_id, w, key)
    c = [tuple(r) for r in weighted_sample_df(df, k=20, key="other:").collect()]
    assert a != c  # the key actually enters the draw


def test_plan_is_take_ordered_no_global_sort(spark, sf_dir):
    from thesis_iceberg_spark.plans import formatted_plan

    plan = formatted_plan(pipeline_weighted_sample_df(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_null_doc_id_never_sampled_and_quote_key_escapes(spark):
    # review r13 #4: a NULL key draws a NULL priority (Spark sorts it
    # FIRST, DuckDB LAST) — excluded outright in both twins; and a key
    # containing a quote must produce parseable oracle SQL
    rows = [(None, 1000), (1, 5), (2, 3)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, w BIGINT")
    ids = {r.doc_id for r in weighted_sample_df(df, k=10).collect()}
    assert ids == {1, 2}
    sql = sql_weighted_sample(key="o'key:")
    assert "md5('o''key:'" in sql
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1 AS doc_id, 'a b' AS text, "
        "'en' AS lang, 'web' AS source, 3 AS n_chars"
    )
    con.sql(sql).fetchall()  # must parse and run
