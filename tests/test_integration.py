"""Integration flows spanning multiple engine layers.

test_thesis_reenactment replays the reference's complete story end to end
(SURVEY.md §0/§3.3): CSV with broken two-digit years -> distributed ingest
with date repair -> CTAS into a catalog namespace -> RENAME COLUMN (the
Phone -> 'Phone number' moment) -> the API view keeps answering, resolving
the old name through field-id history -- the thesis's success criterion,
without the LLM.

test_stream_ingest_versioned lands a bounded stream in a VersionedTable
snapshot-per-microbatch and checks time travel over the ingested data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries.extended import CSV_FIXTURE, _ensure_csv_fixture
from thesis_iceberg_spark.sources.csv import read_csv
from thesis_iceberg_spark.tablefmt.catalog import Catalog
from thesis_iceberg_spark.views import ApiView, ViewRegistry


def test_thesis_reenactment(spark, tmp_path):
    _ensure_csv_fixture()
    # 1. ingest the CSV with date repair (ref notebook cell 66)
    df = read_csv(spark, CSV_FIXTURE, date_columns={"Date of birth": "dd-MM-yy"})
    assert df.filter(F.col("Date of birth") > F.current_date()).count() == 0

    # 2. CTAS into a catalog namespace (ref cell 68)
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_database("employee_db")
    cat.create_table("employee_db.employee", df=df)
    emp = cat.table("employee_db.employee")

    # 3. an API view bound to the original column names (ref api.py routes)
    reg = ViewRegistry()
    reg.register(
        ApiView(
            "employee_api",
            emp,
            {"id": "Index", "name": "First Name", "dob": "Date of birth"},
        )
    )
    before = {r.id: (r.name, r.dob) for r in reg.dataframe("employee_api").collect()}

    # 4. the schema evolves (ref api.py:351 rename endpoint)
    emp.rename_column("First Name", "Given Name")
    emp.rename_column("Date of birth", "Birth Date")

    # 5. the view still answers, identically — the thesis success criterion
    # (no manual rebinding: ApiView reloads table metadata per execution)
    after = {r.id: (r.name, r.dob) for r in reg.dataframe("employee_api").collect()}
    assert before == after
    report = reg.report()[0]
    assert report["bindings"]["name"]["resolved_to"] == "Given Name"
    assert report["bindings"]["dob"]["resolved_to"] == "Birth Date"
    assert report["schema_id"] == 2

    # 6. DESCRIBE shows the evolved schema; SQL works with backticks
    cat.register_view("employee_db.employee", "employee")
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM employee WHERE `Given Name` LIKE 'Person%'"
    ).collect()[0].n
    assert n == 200


def test_stream_ingest_versioned(spark, tmp_path, sf_dir):
    from thesis_iceberg_spark.streaming.events import events_stream
    from thesis_iceberg_spark.streaming.ingest import stream_into_table
    from thesis_iceberg_spark.sources.registry import load_table

    loc = str(tmp_path / "events_vt")
    stream = events_stream(spark, sf_dir).select("event_id", "user_id", "event_type")
    vt = stream_into_table(spark, stream, loc, now_ms_base=10_000)
    total = load_table(spark, sf_dir, "events").count()
    assert vt.read().count() == total
    snaps = vt.snapshots().collect()
    assert len(snaps) >= 1 and snaps[0].operation == "append"
    # time travel to the first micro-batch commit
    first = vt.read(snapshot_id=1).count()
    assert 0 < first <= total


def test_stream_ingest_empty_source_raises(spark, tmp_path):
    import pytest as _pytest

    from thesis_iceberg_spark.streaming.ingest import stream_into_table

    schema = "id BIGINT"
    empty_dir = tmp_path / "empty_src"
    empty_dir.mkdir()
    stream = spark.readStream.schema(schema).parquet(str(empty_dir))
    with _pytest.raises(Exception):
        stream_into_table(spark, stream, str(tmp_path / "t"))
