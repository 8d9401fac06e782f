"""TableSQL front-end: statement routing, time-travel rewrite, SET/WHERE
parsing edge cases, and passthrough of non-table SQL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thesis_iceberg_spark.tablefmt import TableSQL, VersionedTable
from thesis_iceberg_spark.tablefmt.sql import _parse_as_of_ms, _split_assignments


@pytest.fixture()
def vt(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id INT, s STRING, v DOUBLE"
    )
    return VersionedTable.create(spark, str(tmp_path / "t"), df=df, now_ms=1_000)


def _fe(spark, vt):
    return TableSQL(spark, {"t": vt}.__getitem__)


def test_version_as_of_select(spark, vt):
    vt.append(
        spark.createDataFrame([(4, "d", 40.0)], "id INT, s STRING, v DOUBLE"),
        now_ms=2_000,
    )
    fe = _fe(spark, vt)
    assert fe.sql("SELECT COUNT(*) AS n FROM t VERSION AS OF 1").first().n == 3
    assert fe.sql("SELECT COUNT(*) AS n FROM t FOR VERSION AS OF 2").first().n == 4
    # timestamp travel, both epoch-ms and quoted-literal forms
    assert fe.sql("SELECT COUNT(*) AS n FROM t FOR SYSTEM_TIME AS OF 1500").first().n == 3
    assert (
        fe.sql("SELECT COUNT(*) AS n FROM t TIMESTAMP AS OF '1970-01-02'").first().n == 4
    )


def test_update_and_delete_sql(spark, vt):
    fe = _fe(spark, vt)
    # function call + comma inside an argument list must not split the SET
    fe.sql("UPDATE t SET s = concat(s, '!'), v = v * 2 WHERE id IN (1, 2)")
    got = {r.id: (r.s, r.v) for r in vt.read().collect()}
    assert got == {1: ("a!", 20.0), 2: ("b!", 40.0), 3: ("c", 30.0)}
    fe.sql("DELETE FROM t WHERE v >= 40.0")
    assert sorted(r.id for r in vt.read().collect()) == [1, 3]
    fe.sql("DELETE FROM t")  # no WHERE -> delete everything
    assert vt.read().count() == 0


def test_merge_sql(spark, vt):
    fe = _fe(spark, vt)
    spark.createDataFrame(
        [(2, "B", 200.0), (9, "Z", 90.0)], "id INT, s STRING, v DOUBLE"
    ).createOrReplaceTempView("merge_src")
    fe.sql(
        "MERGE INTO t USING merge_src ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET s = s.s, v = s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {r.id: (r.s, r.v) for r in vt.read().collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 200.0), 3: ("c", 30.0), 9: ("Z", 90.0)}
    # conditional matched-delete
    fe.sql(
        "MERGE INTO t USING merge_src ON id WHEN MATCHED AND t.v > 100 THEN DELETE"
    )
    assert sorted(r.id for r in vt.read().collect()) == [1, 3, 9]


def test_non_table_sql_passes_through(spark, vt):
    fe = _fe(spark, vt)
    spark.range(5).createOrReplaceTempView("plain_view")
    assert fe.sql("SELECT COUNT(*) AS n FROM plain_view").first().n == 5


def test_travel_clause_composes_with_joins(spark, vt):
    vt.delete(F.col("id") == 1)
    fe = _fe(spark, vt)
    spark.createDataFrame([(1, "x"), (2, "y")], "id INT, tag STRING").createOrReplaceTempView(
        "dims"
    )
    rows = fe.sql(
        "SELECT d.tag FROM t FOR VERSION AS OF 1 JOIN dims d USING (id) ORDER BY d.tag"
    ).collect()
    assert [r.tag for r in rows] == ["x", "y"]  # snapshot 1 still has id=1


def test_parse_helpers():
    assert _parse_as_of_ms("12345") == 12345
    assert _parse_as_of_ms("'1970-01-01 00:00:01'") == 1000
    assert _split_assignments("a = f(x, y), b = 'lit, comma', c=1+2") == {
        "a": "f(x, y)",
        "b": "'lit, comma'",
        "c": "1+2",
    }
    with pytest.raises(ValueError):
        _split_assignments("a 1")


def test_merge_sql_conditional_update(spark, vt):
    """WHEN MATCHED AND <cond> THEN UPDATE applies the update ONLY to rows
    passing the condition; other matched rows keep their values."""
    fe = _fe(spark, vt)
    spark.createDataFrame(
        [(1, "A", 1.0), (2, "B", 2.0)], "id INT, s STRING, v DOUBLE"
    ).createOrReplaceTempView("cond_src")
    fe.sql(
        "MERGE INTO t USING cond_src ON id "
        "WHEN MATCHED AND s.v >= 2.0 THEN UPDATE SET s = s.s, v = s.v"
    )
    got = {r.id: (r.s, r.v) for r in vt.read().collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 2.0), 3: ("c", 30.0)}


def test_update_set_literal_containing_where(spark, vt):
    """A string literal containing ' where ' inside SET must not be split
    as the WHERE clause."""
    fe = _fe(spark, vt)
    fe.sql("UPDATE t SET s = 'x where y' WHERE id = 1")
    got = {r.id: r.s for r in vt.read().collect()}
    assert got == {1: "x where y", 2: "b", 3: "c"}


def test_merge_update_then_delete_clause_order(spark, vt):
    """SQL evaluates WHEN MATCHED clauses in order: rows claimed by a
    conditional UPDATE must NOT fall through to a later DELETE."""
    fe = _fe(spark, vt)
    spark.createDataFrame(
        [(1, "A", 100.0), (2, "B", 1.0), (3, "C", 2.0)], "id INT, s STRING, v DOUBLE"
    ).createOrReplaceTempView("ord_src")
    fe.sql(
        "MERGE INTO t USING ord_src ON id "
        "WHEN MATCHED AND s.v >= 50.0 THEN UPDATE SET v = s.v "
        "WHEN MATCHED THEN DELETE"
    )
    got = {r.id: r.v for r in vt.read().collect()}
    assert got == {1: 100.0}  # id=1 updated (claimed first), 2 and 3 deleted
    with pytest.raises(ValueError):  # dead DELETE after unconditional UPDATE
        fe.sql(
            "MERGE INTO t USING ord_src ON id "
            "WHEN MATCHED THEN UPDATE SET v = s.v WHEN MATCHED THEN DELETE"
        )


def test_update_double_quoted_literal_with_where(spark, vt):
    fe = _fe(spark, vt)
    fe.sql('UPDATE t SET s = "x where y" WHERE id = 2')
    got = {r.id: r.s for r in vt.read().collect()}
    assert got[2] == "x where y" and got[1] == "a"


@pytest.fixture()
def cat(spark, tmp_path):
    from thesis_iceberg_spark.tablefmt.catalog import Catalog

    return Catalog(spark, str(tmp_path / "wh"))


def test_sql_create_insert_values(spark, cat):
    cat.sql(
        "CREATE TABLE default.t (id INT, name STRING, added_at TIMESTAMP) "
        "PARTITIONED BY (day(added_at)) TBLPROPERTIES ('k'='v')"
    )
    vt = cat.table("default.t")
    assert vt.properties == {"k": "v"}
    [spec] = vt._meta["partition_spec"]
    assert spec["source_name"] == "added_at" and spec["transform"] == "day"
    assert isinstance(spec["source_id"], int)  # field-id-bound (rename-proof)
    cat.sql(
        "INSERT INTO default.t VALUES "
        "(1, 'a', TIMESTAMP '2024-01-01 10:00:00'), "
        "(2, 'b', TIMESTAMP '2024-01-02 10:00:00')"
    )
    assert sorted(r.id for r in cat.table("default.t").read().collect()) == [1, 2]
    # IF NOT EXISTS is a no-op; bare CREATE on an existing table errors
    cat.sql("CREATE TABLE IF NOT EXISTS default.t (x INT)")
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE TABLE default.t (x INT)")
    # INSERT arity mismatch is an error, not silent misalignment
    with pytest.raises(ValueError, match="columns"):
        cat.sql("INSERT INTO default.t VALUES (3, 'c')")


def test_sql_insert_select_and_ctas(spark, cat):
    cat.sql("CREATE TABLE default.src (id INT, v INT)")
    cat.sql("INSERT INTO default.src VALUES (1, 10), (2, 20), (3, 30)")
    cat.register_view("default.src", "src_view")
    cat.sql("INSERT INTO default.src SELECT id + 10, v FROM src_view WHERE v >= 20")
    assert cat.table("default.src").read().count() == 5
    cat.sql("CREATE TABLE default.big AS SELECT * FROM src_view WHERE v > 10")
    assert sorted(r.id for r in cat.table("default.big").read().collect()) == [2, 3]
    cat.sql("DROP TABLE default.big")
    assert "big" not in cat.tables("default")
    cat.sql("DROP TABLE IF EXISTS default.never_existed")  # no error


def test_sql_alter_forms(spark, cat):
    cat.sql("CREATE TABLE default.t (id INT, name STRING)")
    cat.sql("INSERT INTO default.t VALUES (1, 'a')")
    cat.sql("ALTER TABLE default.t ADD COLUMN dept STRING")
    cat.sql("ALTER TABLE default.t ADD COLUMNS (score DOUBLE, note STRING)")
    assert cat.table("default.t").columns == ["id", "name", "dept", "score", "note"]
    cat.sql("ALTER TABLE default.t RENAME COLUMN name TO full_name")
    cat.sql("ALTER TABLE default.t DROP COLUMN note")
    assert cat.table("default.t").columns == ["id", "full_name", "dept", "score"]
    cat.sql("ALTER TABLE default.t SET TBLPROPERTIES ('owner'='hr', 'x'='1')")
    assert cat.table("default.t").properties == {"owner": "hr", "x": "1"}
    # spaced identifier via backticks
    cat.sql("ALTER TABLE default.t ADD COLUMN `Phone number` STRING")
    assert "Phone number" in cat.table("default.t").columns
    with pytest.raises(ValueError, match="unsupported ALTER"):
        cat.sql("ALTER TABLE default.t FROBNICATE")


def test_sql_partition_field_evolution(spark, cat):
    """Iceberg's ADD/DROP PARTITION FIELD DDL routes to
    set_partition_spec: new writes pick up the evolved layout, old files
    keep theirs (per-entry spec_id)."""
    cat.sql("CREATE TABLE default.pt (id INT, ts TIMESTAMP)")
    cat.sql("INSERT INTO default.pt VALUES (1, TIMESTAMP '2024-04-01 08:00:00')")
    cat.sql("ALTER TABLE default.pt ADD PARTITION FIELD day(ts)")
    cat.sql("INSERT INTO default.pt VALUES (2, TIMESTAMP '2024-04-02 08:00:00')")
    vt = cat.table("default.pt")
    m = vt._current_manifest()
    assert [e["spec_id"] for e in m] == [0, 1]
    assert all("_p_day=" not in f["path"] for f in m[0]["files"])
    assert any("_p_day=2024-04-02" in f["path"] for f in m[1]["files"])
    assert vt.read().count() == 2
    # ADD over an existing field errors (Iceberg: ADD adds, never replaces)
    with pytest.raises(ValueError, match="already partitioned"):
        cat.sql("ALTER TABLE default.pt ADD PARTITION FIELD day(ts)")
    # DROP must name the actual field (or name none)
    with pytest.raises(ValueError, match="cannot find partition field"):
        cat.sql("ALTER TABLE default.pt DROP PARTITION FIELD day(id)")
    cat.sql("ALTER TABLE default.pt DROP PARTITION FIELD day(ts)")
    with pytest.raises(ValueError, match="no partition field"):
        cat.sql("ALTER TABLE default.pt DROP PARTITION FIELD")
    cat.sql("INSERT INTO default.pt VALUES (3, TIMESTAMP '2024-04-03 08:00:00')")
    vt = cat.table("default.pt")
    assert vt._meta["partition_spec"] == []
    assert vt.read().count() == 3
    # identical re-ADD after re-partitioning is a no-op (no new spec id)
    cat.sql("ALTER TABLE default.pt ADD PARTITION FIELD day(ts)")
    vt = cat.table("default.pt")
    n_specs = len(vt._meta["partition_specs"])
    vt.set_partition_spec("ts")  # same field+transform: dedup'd
    assert len(vt._meta["partition_specs"]) == n_specs


def test_sql_doubled_quote_escapes(spark, vt):
    """ADVICE: SQL doubled-quote escapes must not desync the tokenizer —
    a literal containing WHERE/comma after '' must stay one literal."""
    fe = _fe(spark, vt)
    fe.sql("UPDATE t SET s = 'it''s not where, you think' WHERE id = 1")
    got = {r.id: r.s for r in vt.read().collect()}
    assert got[1] == "it's not where, you think"
    assert got[2] == "b" and got[3] == "c"


def test_merge_sql_rejects_unparsed_clauses(spark, vt):
    """ADVICE: clause forms outside the grammar must ERROR, not silently
    half-execute."""
    fe = _fe(spark, vt)
    spark.createDataFrame([(9, "Z", 90.0)], "id INT, s STRING, v DOUBLE"
    ).createOrReplaceTempView("strict_src")
    with pytest.raises(ValueError, match="conditional WHEN NOT MATCHED"):
        fe.sql(
            "MERGE INTO t USING strict_src ON id "
            "WHEN NOT MATCHED AND id > 5 THEN INSERT *"
        )
    with pytest.raises(ValueError, match="unsupported MERGE clause"):
        fe.sql(
            "MERGE INTO t USING strict_src ON id "
            "WHEN MATCHED THEN UPDATE SET s = 'x' "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE"
        )
    with pytest.raises(ValueError, match="unsupported MERGE clause"):
        fe.sql(
            "MERGE INTO t USING strict_src ON id "
            "WHEN NOT MATCHED THEN INSERT (id, s, v) VALUES (1, 'x', 2.0)"
        )
    # nothing executed: the table is untouched by the failed statements
    assert vt.read().count() == 3


def test_sql_insert_column_list_rejected(spark, cat):
    cat.sql("CREATE TABLE default.t (id INT, name STRING)")
    with pytest.raises(ValueError, match="VALUES/SELECT"):
        cat.sql("INSERT INTO default.t (id, name) VALUES (1, 'a')")


# --- round 4: RTAS + database/introspection statement routing ---------------


def test_sql_replace_table_as_select(spark, cat):
    """REPLACE TABLE ... AS SELECT (ref #cell-13): full rewrite as ONE new
    snapshot — history stays time-travelable."""
    cat.sql("CREATE TABLE default.r (id INT, v DOUBLE)")
    cat.sql("INSERT INTO default.r VALUES (1, 10.0), (2, 20.0)")
    pre = cat.table("default.r")._meta["current_snapshot_id"]
    cat.register_view("default.r")
    cat.sql("REPLACE TABLE default.r AS SELECT id, v * 2 AS v FROM r")
    got = {r.id: r.v for r in cat.table("default.r").read().collect()}
    assert got == {1: 20.0, 2: 40.0}
    old = {
        r.id: r.v
        for r in cat.sql(f"SELECT * FROM default.r VERSION AS OF {pre}").collect()
    }
    assert old == {1: 10.0, 2: 20.0}


def test_sql_replace_table_missing_errors_create_or_replace_creates(spark, cat):
    spark.createDataFrame([(1, "x")], "id INT, s STRING").createOrReplaceTempView(
        "rtas_src"
    )
    with pytest.raises(ValueError, match="does not exist"):
        cat.sql("REPLACE TABLE default.nope AS SELECT * FROM rtas_src")
    cat.sql("CREATE OR REPLACE TABLE default.fresh AS SELECT * FROM rtas_src")
    assert [r.s for r in cat.table("default.fresh").read().collect()] == ["x"]


def test_sql_replace_table_schema_change_rejected(spark, cat):
    cat.sql("CREATE TABLE default.rs (id INT, s STRING)")
    cat.sql("INSERT INTO default.rs VALUES (1, 'a')")
    cat.register_view("default.rs")
    with pytest.raises(ValueError, match="schema-changing"):
        cat.sql("REPLACE TABLE default.rs AS SELECT id FROM rs")


def test_sql_database_and_introspection_statements(spark, cat):
    cat.sql("CREATE DATABASE IF NOT EXISTS extra")
    cat.sql("CREATE TABLE extra.t1 (id INT)")
    cat.sql("CREATE TABLE default.t2 (id INT)")
    dbs = [r.namespace for r in cat.sql("SHOW DATABASES").collect()]
    assert dbs == ["default", "extra"]
    assert [r.tableName for r in cat.sql("SHOW TABLES IN extra").collect()] == ["t1"]
    cat.sql("USE extra")
    assert [r.tableName for r in cat.sql("SHOW TABLES").collect()] == ["t1"]
    cat.sql("USE default")
    desc = cat.sql("DESCRIBE default.t2").collect()
    assert [(r.col_name, r.data_type) for r in desc] == [("id", "int")]
    ext = {r.col_name for r in cat.sql("DESCRIBE EXTENDED default.t2").collect()}
    assert "# current_snapshot" in ext


# --- SQL route to equality deletes (round 6, VERDICT r5 #8) -----------------


@pytest.fixture()
def mor_vt(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "it's"), (4, "d")], "id INT, s STRING"
    )
    return VersionedTable.create(
        spark, str(tmp_path / "mt"), df=df,
        properties={"write.delete.mode": "merge-on-read"},
    )


def _eq_entries(vt):
    snap = vt._current_snapshot_dict()
    _pos, eq = vt._split_deletes(snap.get("delete_manifest", []))
    return eq


def test_sql_delete_in_list_routes_to_eq_delete(spark, mor_vt):
    fe = TableSQL(spark, {"t": mor_vt}.__getitem__)
    fe.sql("DELETE FROM t WHERE id IN (1, 3)")
    assert sorted(r.id for r in mor_vt.read().collect()) == [2, 4]
    eq = _eq_entries(mor_vt)
    assert len(eq) == 1 and eq[0]["eq_cols"] == ["id"]  # the O(keys) path


def test_sql_delete_key_eq_and_string_literals(spark, mor_vt):
    fe = TableSQL(spark, {"t": mor_vt}.__getitem__)
    fe.sql("DELETE FROM t WHERE s = 'it''s'")  # doubled-quote escape
    assert sorted(r.id for r in mor_vt.read().collect()) == [1, 2, 4]
    assert _eq_entries(mor_vt)[0]["eq_cols"] == ["s"]
    fe.sql("DELETE FROM t WHERE s IN ('a', 'd')")
    assert sorted(r.id for r in mor_vt.read().collect()) == [2]


def test_sql_delete_null_in_list_uses_generic_path(spark, mor_vt):
    """SQL `IN (NULL)` never matches; eq-delete files match null-safely —
    so a NULL-bearing list must NOT route (semantics would change)."""
    fe = TableSQL(spark, {"t": mor_vt}.__getitem__)
    fe.sql("DELETE FROM t WHERE id IN (2, NULL)")
    assert sorted(r.id for r in mor_vt.read().collect()) == [1, 3, 4]
    assert _eq_entries(mor_vt) == []  # position deletes, not equality


def test_sql_delete_cow_table_keeps_rewrite_path(spark, vt):
    fe = _fe(spark, vt)
    fe.sql("DELETE FROM t WHERE id IN (1, 2)")  # CoW default: no routing
    assert sorted(r.id for r in vt.read().collect()) == [3]
    assert _eq_entries(vt) == []


def test_sql_delete_non_key_shapes_not_routed(spark, mor_vt):
    fe = TableSQL(spark, {"t": mor_vt}.__getitem__)
    fe.sql("DELETE FROM t WHERE id IN (1, 2) AND s = 'a'")  # conjunction
    assert sorted(r.id for r in mor_vt.read().collect()) == [2, 3, 4]
    assert _eq_entries(mor_vt) == []


def test_parse_key_only_delete_shapes():
    from thesis_iceberg_spark.tablefmt.sql import _parse_key_only_delete as p

    assert p("id IN (1, 2, 3)") == ("id", [1, 2, 3])
    assert p("id = 7") == ("id", [7])
    assert p("s = 'x,y'") == ("s", ["x,y"])
    assert p("s IN ('a,b', 'c')") == ("s", ["a,b", "c"])  # comma in literal
    assert p("v IN (1.5, -2)") == ("v", [1.5, -2])
    assert p("`k` IN (1)") == ("k", [1])
    assert p("id IN (1, NULL)") is None
    assert p("id IN (1 + 1)") is None
    assert p("id IN (SELECT id FROM t)") is None
    assert p("id < 5") is None
    assert p("id IN (1) OR s = 'a'") is None
