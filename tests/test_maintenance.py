"""Table maintenance: compaction, snapshot expiry, branches/tags — the
operational half of the 100 TB story (Iceberg rewrite_data_files /
expire_snapshots equivalents)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from thesis_iceberg_spark.tablefmt import VersionedTable


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_compact_binpacks_without_changing_rows(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 100))
    for i in range(1, 4):  # many small appends -> many small files
        vt.append(_df(spark, 100 * i, 100 * (i + 1)))
    before = vt.read()
    n_entries_before = len(vt._current_manifest())
    assert n_entries_before == 4
    vt.compact(target_partitions=1)
    assert len(vt._current_manifest()) == 1
    after = vt.read()
    assert after.count() == 400
    assert before.exceptAll(after).count() == 0 and after.exceptAll(before).count() == 0
    # compaction is a new snapshot; history is intact for time travel
    assert vt.read(snapshot_id=1).count() == 100
    assert vt.snapshots().collect()[-1].operation == "replace"


def test_expire_snapshots_deletes_dead_files(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 100))
    vt.overwrite(_df(spark, 0, 50))  # snapshot 2 references only new files
    vt.overwrite(_df(spark, 0, 10))  # snapshot 3
    assert len(glob.glob(os.path.join(loc, "data", "snap-*"))) == 3
    expired = vt.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    assert len(glob.glob(os.path.join(loc, "data", "snap-*"))) == 1
    assert vt.read().count() == 10
    with pytest.raises(KeyError):
        vt.read(snapshot_id=1)


def test_refs_pin_snapshots_through_expiry(spark, loc):
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 100))
    vt.create_ref("v1", ref_type="tag")  # tag snapshot 1
    vt.overwrite(_df(spark, 0, 50))
    vt.overwrite(_df(spark, 0, 10))
    expired = vt.expire_snapshots(keep_last=1)
    assert expired == [2]  # snapshot 1 survives because the tag pins it
    assert vt.read_ref("v1").count() == 100
    refs = {r.name: (r.type, r.snapshot_id) for r in vt.refs().collect()}
    assert refs["v1"] == ("tag", 1)
    assert refs["main"][1] == 3
