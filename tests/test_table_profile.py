"""table_profile_df (r14, df-level; r15/r16 registration candidate):
ANALYZE-style per-column statistics in one aggregate pass — DuckDB
parity, hand-checkable crafted stats incl. NULLs, the one-scan plan
claim, and the portable-type guard.
"""

from __future__ import annotations

import duckdb
import pytest

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.plans import formatted_plan
from thesis_iceberg_spark.queries.relational import (
    PROFILE_EVENT_COLS,
    relational_table_profile_df,
    sql_table_profile,
    table_profile_df,
)
from thesis_iceberg_spark.sources.registry import load_table


def test_parity_on_driver_corpus(spark, sf_dir):
    got = canonical_rows(relational_table_profile_df(spark, sf_dir).toPandas())
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "events")
    want = canonical_rows(con.sql(sql_table_profile()).df())
    assert got == want
    assert len(got) == len(PROFILE_EVENT_COLS)


def test_crafted_stats_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b"), (None, None)],
        "k BIGINT, s STRING",
    )
    rows = {r.column_name: r for r in table_profile_df(df, ("k", "s")).collect()}
    assert set(rows) == {"k", "s"}
    k, s = rows["k"], rows["s"]
    assert (k.n_rows, k.n_nulls, k.n_distinct, k.min_s, k.max_s) == (
        5, 2, 3, "1", "3",
    )
    assert (s.n_rows, s.n_nulls, s.n_distinct, s.min_s, s.max_s) == (
        5, 2, 2, "a", "b",
    )


def test_one_scan_plan(spark, sf_dir):
    # every column's stats ride ONE Aggregate over one FileScan — the
    # Expand for the multiple distincts multiplies rows, not scans
    plan = formatted_plan(relational_table_profile_df(spark, sf_dir))
    # count TREE nodes ("Scan parquet  (<id>)"), not the detail section's
    # repetition of the same node
    assert plan.count("Scan parquet  (") == 1, plan
    assert "Join" not in plan
    assert "partial" in plan.lower()


def test_unportable_column_raises(spark, sf_dir):
    with pytest.raises(ValueError, match="canonical string"):
        table_profile_df(load_table(spark, sf_dir, "events"), ("value",))


def test_empty_table_and_weird_column_names(spark):
    # pass 4 #1: the null count of an empty column is 0, not NULL;
    # pass 4 #2: legal-but-awkward column names (space, quote) profile
    # safely through the index-aliased/escaped construction
    empty = spark.createDataFrame([], "k BIGINT")
    r = table_profile_df(empty, ("k",)).first()
    assert (r.n_rows, r.n_nulls, r.n_distinct) == (0, 0, 0)
    assert r.min_s is None and r.max_s is None
    import duckdb

    weird = spark.createDataFrame([(1,), (2,)], ["my col"])
    rows = table_profile_df(weird, ("my col",)).collect()
    assert rows[0].column_name == "my col" and rows[0].n_distinct == 2
    con = duckdb.connect()
    con.execute('CREATE VIEW t AS SELECT unnest([1, 2]) AS "my col"')
    got = con.sql(sql_table_profile("t", ("my col",))).fetchall()
    assert got[0][0] == "my col" and got[0][3] == 2
