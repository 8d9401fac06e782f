"""Equality-delete files (round 5): Iceberg v2's second merge-on-read
delete flavor.  delete_by_key(keys_df) writes the key set WITHOUT reading
the table; reads subtract matching rows from data files with a smaller
data sequence number (commit-time stamps), so rows appended after the
delete keep living even when their keys match.  Field-id tracking makes
the key columns rename-proof; compact() folds the deletes in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thesis_iceberg_spark.tablefmt import VersionedTable


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id bigint")


def test_eq_delete_basic_and_metadata(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 10))
    vt.delete_by_key(_keys(spark, [2, 3]))
    assert sorted(r.id for r in vt.read().collect()) == [0, 1, 4, 5, 6, 7, 8, 9]
    snap = vt._current_snapshot_dict()
    assert snap["operation"] == "delete"
    _pos, eq = vt._split_deletes(snap["delete_manifest"])
    assert len(eq) == 1 and eq[0]["eq_cols"] == ["id"] and "seq" in eq[0]


def test_eq_delete_does_not_touch_later_appends(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 5))
    vt.delete_by_key(_keys(spark, [1, 2]))
    vt.append(_df(spark, 1, 3))  # same ids appended AFTER the delete
    ids = sorted(r.id for r in vt.read().collect())
    assert ids == [0, 1, 2, 3, 4]  # re-appended 1,2 live; originals gone
    # and the original rows really were removed, not shadowed: only one
    # copy of each re-appended id remains
    assert vt.read().count() == 5


def test_eq_delete_key_survives_rename(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 6))
    vt.delete_by_key(_keys(spark, [4]))
    vt.rename_column("id", "ident")
    assert sorted(r.ident for r in vt.read().collect()) == [0, 1, 2, 3, 5]
    # a post-rename equality delete keys on the new name
    vt.delete_by_key(
        spark.createDataFrame([(0,)], "ident bigint"), columns=["ident"]
    )
    assert sorted(r.ident for r in vt.read().collect()) == [1, 2, 3, 5]


def test_eq_delete_null_safe(spark, loc):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id bigint, tag string"
    )
    vt = VersionedTable.create(spark, loc, df=df)
    vt.delete_by_key(
        spark.createDataFrame([(None,)], "tag string"), columns=["tag"]
    )
    assert sorted(r.id for r in vt.read().collect()) == [1, 3]


def test_eq_delete_not_resurrected_by_cow_update(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 6))
    vt.delete_by_key(_keys(spark, [1]))
    vt.update({"v": "v + 100"}, "id >= 0")  # CoW rewrite of every file
    rows = {r.id: r.v for r in vt.read().collect()}
    assert 1 not in rows and rows[0] == 100


def test_eq_delete_not_resurrected_by_mor_update(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 6))
    vt.delete_by_key(_keys(spark, [2]))
    vt.update({"v": "v + 100"}, "id >= 0", mode="merge-on-read")
    rows = {r.id: r.v for r in vt.read().collect()}
    assert 2 not in rows and rows[3] == 106


def test_compact_folds_eq_deletes(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 8))
    vt.delete_by_key(_keys(spark, [5, 6]))
    vt.compact()
    snap = vt._current_snapshot_dict()
    assert snap["delete_manifest"] == []
    assert sorted(r.id for r in vt.read().collect()) == [0, 1, 2, 3, 4, 7]


def test_eq_delete_time_travel(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 4))
    before = vt._current_snapshot_dict()["snapshot_id"]
    vt.delete_by_key(_keys(spark, [0]))
    assert sorted(r.id for r in vt.read(snapshot_id=before).collect()) == [0, 1, 2, 3]
    assert sorted(r.id for r in vt.read().collect()) == [1, 2, 3]


def test_eq_delete_dropped_key_column_raises(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 4))
    vt.delete_by_key(_keys(spark, [1]), columns=["id"])
    vt.drop_column("id")
    with pytest.raises(ValueError, match="dropped field id"):
        vt.read().collect()


def test_eq_delete_empty_keys_no_snapshot(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 4))
    v_before = len(vt._meta["snapshots"])
    vt.delete_by_key(_keys(spark, []))
    assert len(vt._meta["snapshots"]) == v_before
