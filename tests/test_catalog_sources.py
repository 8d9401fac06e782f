"""Tests for the DDL catalog (SURVEY.md §2A D1-D10), CSV ingestion with the
two-digit-year repair (S4), JSON metadata introspection (S5/T8), and the
JSON-records API edge (S10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thesis_iceberg_spark.sources.csv import read_csv
from thesis_iceberg_spark.tablefmt.catalog import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


def _toy(spark):
    return spark.createDataFrame([(1, "a"), (2, "b")], "id INT, name STRING")


def test_ddl_lifecycle(spark, cat):
    cat.create_database("db1")
    assert "db1" in cat.databases()  # SHOW DATABASES (D3)
    cat.create_database("db1")  # IF NOT EXISTS (D1)
    with pytest.raises(ValueError):
        cat.create_database("db1", if_not_exists=False)
    cat.use("db1")  # D2
    cat.create_table("t", df=_toy(spark), properties={"write.format": "parquet"})
    assert cat.tables() == ["t"]  # SHOW TABLES (D3)
    assert cat.tables("db1") == ["t"]
    # D6 set properties + D5 create-time properties
    vt = cat.table("t")
    assert vt.properties["write.format"] == "parquet"
    vt.set_properties({"commit.retries": "3"})
    assert cat.table("t").properties["commit.retries"] == "3"
    # D7-D9 column DDL through the catalog handle
    vt.add_column("age", "int")
    vt.rename_column("age", "years")
    vt.drop_column("years")
    assert cat.table("t").columns == ["id", "name"]
    # D10 describe
    desc = {r.col_name: r.data_type for r in cat.describe("t").collect()}
    assert desc == {"id": "int", "name": "string"}
    ext = [r.col_name for r in cat.describe("t", extended=True).collect()]
    assert "# current_snapshot" in ext
    cat.drop_table("t")
    assert cat.tables() == []


def test_register_view_sql_bridge(spark, cat):
    cat.create_table("default.v1", df=_toy(spark))
    cat.register_view("default.v1", "v1_view")
    assert spark.sql("SELECT COUNT(*) AS n FROM v1_view").collect()[0].n == 2


def test_csv_ingest_with_date_repair(spark, tmp_path):
    """S4: dd-MM-yy parsing + future-year minus-100 repair + quoted commas
    (ref: #cell-66; FIXTURES.md F1 'Job Title' like 'Editor, commissioning')."""
    p = tmp_path / "people.csv"
    p.write_text(
        "Index,First Name,Date of birth,Job Title\n"
        '1,Sarah,23-05-39,"Editor, commissioning"\n'
        "2,Bob,01-12-99,Engineer\n"
        "3,Ann,15-06-06,Analyst\n"
    )
    df = read_csv(spark, str(p), date_columns={"Date of birth": "dd-MM-yy"})
    rows = {r["Index"]: r for r in df.collect()}
    assert str(rows[1]["Date of birth"]) == "1939-05-23"  # 2039 -> 1939
    assert str(rows[2]["Date of birth"]) == "1999-12-01"  # already past
    assert str(rows[3]["Date of birth"]) == "2006-06-15"  # past, stays
    assert rows[1]["Job Title"] == "Editor, commissioning"  # quoted comma


def test_json_metadata_introspection(spark, cat):
    """S5/T8: the versioned metadata JSON is itself queryable with
    spark.read.json (ref: #cell-49/50 reading v1.metadata.json)."""
    cat.create_table("default.j1", df=_toy(spark))
    vt = cat.table("default.j1")
    import os

    meta_file = os.path.join(vt.location, "metadata", "version-hint.text")
    version = open(meta_file).read().strip()
    df = spark.read.option("multiLine", True).json(
        os.path.join(vt.location, "metadata", f"v{version}.metadata.json")
    )
    row = df.collect()[0]
    assert row.current_schema_id == 0
    assert row.current_snapshot_id == 1


def test_json_records_edge(spark):
    """S10: the API edge materializes a DataFrame as JSON records
    (ref: api.py:67 toPandas().to_dict('records')) — edge-only, never
    inside operators."""
    df = _toy(spark).filter(F.col("id") == 1)
    records = df.toPandas().to_dict(orient="records")
    assert records == [{"id": 1, "name": "a"}]
