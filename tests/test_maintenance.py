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


def test_file_pruned_cow_delete_keeps_untouched_files(spark, loc):
    """DML must rewrite ONLY files that can contain matches: after deleting
    rows that live only in the second append, the first append's entry is
    carried untouched, and the second append survives as (at most) the
    subset of its files holding no matching rows."""
    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 100))
    vt.append(_df(spark, 100, 200))
    snap2_entry = vt._current_manifest()[-1]
    vt.delete("id >= 150")
    manifest = vt._current_manifest()
    paths = [e["path"] for e in manifest]
    assert any(p.startswith("data/snap-1-") for p in paths)  # untouched entry carried whole
    for e in manifest:  # any surviving snap-2 reference is a strict file subset
        if e["path"].startswith("data/snap-2-"):
            assert {f["path"] for f in e["files"]} < {
                f["path"] for f in snap2_entry["files"]
            }
    assert vt.read().count() == 150
    assert vt.read().filter("id >= 150").count() == 0
    # a predicate matching nothing commits no snapshot (Iceberg semantics)
    n_snaps = len(vt._meta["snapshots"])
    vt.delete("id > 10000")
    assert len(vt._meta["snapshots"]) == n_snaps


def test_cow_delete_is_file_granular_within_an_entry(spark, loc):
    """CoW pruning works at FILE granularity, not directory granularity: a
    delete matching rows in one partition's file rewrites only that file —
    the touched entry survives as a subset carrying the other partitions'
    files by reference."""
    df = (
        spark.range(0, 100)
        .selectExpr(
            "id",
            "timestamp('2024-01-01 00:00:00') + make_interval(0,0,0,CAST(id % 4 AS INT),0,0,0) AS ts",
        )
    )
    vt = VersionedTable.create(spark, loc, df=df, partition_day="ts")
    entry = vt._current_manifest()[0]
    assert len(entry["files"]) >= 4  # one file per day partition at least
    files_before = {f["path"] for f in entry["files"]}
    vt.delete("ts = timestamp('2024-01-01 00:00:00')")
    manifest = vt._current_manifest()
    kept = [e for e in manifest if e["path"] == entry["path"]]
    assert kept, "touched entry must survive as a file subset"
    kept_files = {f["path"] for f in kept[0]["files"]}
    assert kept_files < files_before  # strict subset: day-0 files pruned out
    assert all("_p_day=2024-01-01" not in p for p in kept_files)
    assert vt.read().count() == 75
    assert vt.read().filter("ts = timestamp('2024-01-01 00:00:00')").count() == 0
    # time travel still sees all 100 rows from the original files
    assert vt.read(snapshot_id=1).count() == 100


def test_cow_probe_is_manifest_pruned(spark, loc, monkeypatch):
    """The CoW probe job reads ONLY files whose manifest min/max bounds
    could satisfy the predicate (Iceberg prunes its CoW scan the same
    way): on a write-time-sorted table a bounded DELETE's probe plan
    holds a strict subset of the files, and the result is unchanged."""
    from thesis_iceberg_spark.tablefmt.table import _MIN, VersionedTable

    df = (
        spark.range(0, 100)
        .selectExpr("id", "id * 2 AS v")
        .repartitionByRange(4, "id")  # disjoint per-file id ranges
    )
    vt = VersionedTable.create(spark, loc, df=df, sort_by=["id"])
    total_files = sum(len(e["files"]) for e in vt._current_manifest())
    assert total_files >= 4
    seen = {}
    orig = vt.plan_files

    def spy(ranges=None, **kw):
        out = orig(ranges, **kw)
        seen["ranges"] = ranges
        seen["files"] = sum(len(e.get("files") or []) for e in out)
        return out

    monkeypatch.setattr(vt, "plan_files", spy)
    vt.delete("id <= 10")
    assert seen["ranges"] == {"id": (_MIN, 10)}
    assert 0 < seen["files"] < total_files  # probe plan pruned by bounds
    fresh = VersionedTable(spark, loc)
    assert sorted(r.id for r in fresh.read().collect()) == list(range(11, 100))


def test_merge_probe_is_manifest_pruned(spark, loc, monkeypatch):
    """MERGE bounds every target scan by the source keys' min/max: files
    whose manifest bounds exclude the key range are neither probed for
    matches nor read for the insert anti-join (they can't contain either),
    and the result is unchanged."""
    from thesis_iceberg_spark.tablefmt.table import VersionedTable

    df = (
        spark.range(0, 100)
        .selectExpr("id", "id * 2 AS v")
        .repartitionByRange(4, "id")
    )
    vt = VersionedTable.create(spark, loc, df=df, sort_by=["id"])
    total_files = sum(len(e["files"]) for e in vt._current_manifest())
    seen = {}
    orig = vt.plan_files

    def spy(ranges=None, **kw):
        out = orig(ranges, **kw)
        seen["ranges"] = ranges
        seen["files"] = sum(len(e.get("files") or []) for e in out)
        return out

    monkeypatch.setattr(vt, "plan_files", spy)
    src = spark.createDataFrame([(3, -1), (5, -1)], "id bigint, v bigint")
    vt.merge(src, on="id", when_matched_update={"v": "s.v"},
             mode="merge-on-read")
    assert seen["ranges"] == {"id": (3, 5)}
    assert 0 < seen["files"] < total_files
    fresh = VersionedTable(spark, loc)
    rows = {r.id: r.v for r in fresh.read().collect()}
    assert rows[3] == -1 and rows[5] == -1
    assert rows[4] == 8 and rows[90] == 180 and len(rows) == 100


def test_probe_pruning_survives_rename_with_name_reuse(spark, loc):
    """Footer stats are keyed by WRITE-TIME column names; after
    rename('id','old_id'); rename('v','id') an old file's 'id' stats
    describe a different field than today's 'id'. The probe pruning must
    resolve stats by FIELD ID (like reads do) — looking them up by
    current name would prune files that DO match and silently commit a
    no-op DELETE / duplicate-key MERGE."""
    from thesis_iceberg_spark.tablefmt.table import VersionedTable

    df = (
        spark.range(0, 100)
        .selectExpr("id", "id + 1000 AS v")
        .repartitionByRange(4, "id")
    )
    vt = VersionedTable.create(spark, loc, df=df, sort_by=["id"])
    vt.rename_column("id", "old_id")
    vt.rename_column("v", "id")  # current 'id' is the OLD 'v' (1000..1099)
    # matches every row; name-keyed stats ('id': 0..99) would prune all
    vt.delete("id >= 1000 and id <= 1009", mode="merge-on-read")
    fresh = VersionedTable(spark, loc)
    ids = sorted(r.id for r in fresh.read().collect())
    assert ids == list(range(1010, 1100))
    # MERGE on the renamed key: must match, not insert a duplicate
    src = spark.createDataFrame([(1050, -1)], "id bigint, old_id bigint")
    fresh.merge(src, on="id", when_matched_update={"old_id": "s.old_id"},
                mode="merge-on-read")
    rows = [r.old_id for r in fresh.read().filter("id = 1050").collect()]
    assert rows == [-1]
    # pruning still engages when bounds REALLY exclude: no new snapshot
    n_snaps = len(fresh._meta["snapshots"])
    fresh.delete("id >= 5000")
    assert len(fresh._meta["snapshots"]) == n_snaps


def test_partition_spec_evolution(spark, loc):
    """Iceberg updateSpec semantics: after set_partition_spec, NEW writes
    use the new layout while OLD files keep theirs, and planning prunes
    each entry with the spec it was WRITTEN under (per-entry spec_id)."""
    from thesis_iceberg_spark.tablefmt.table import VersionedTable

    df = spark.range(0, 100).selectExpr(
        "id",
        "timestamp('2024-01-01 00:00:00') + make_interval(0,0,0,CAST(id % 4 AS INT),0,0,0) AS ts",
    )
    vt = VersionedTable.create(spark, loc, df=df, partition_day="ts")
    vt.set_partition_spec(None)  # unpartitioned from now on
    vt.append(
        spark.range(100, 150).selectExpr(
            "id", "timestamp('2024-02-01 00:00:00') AS ts"
        )
    )
    manifest = vt._current_manifest()
    assert [e["spec_id"] for e in manifest] == [0, 1]
    assert all("_p_day=" in f["path"] for f in manifest[0]["files"])
    assert all("_p_day=" not in f["path"] for f in manifest[1]["files"])
    assert vt.read().count() == 150
    # old entry still prunes by its _p_day dirs; the new entry survives on
    # footer stats alone (its ts bounds exclude January)
    planned = vt.plan_files({"ts": ("2024-01-02", "2024-01-02")})
    planned_files = [f["path"] for e in planned for f in e["files"]]
    assert planned_files and all("_p_day=2024-01-02" in p for p in planned_files)
    # a day-bounded delete under the evolved spec stays correct
    vt.delete("ts = timestamp('2024-01-01 00:00:00')")
    assert vt.read().count() == 125


def test_one_sided_date_bound_probes_midnight_file(spark, loc):
    """'ts <= DATE' casts the date to MIDNIGHT in Spark, so a file whose
    min is exactly midnight contains a matching row; the date-vs-timestamp
    stats comparison must widen per SIDE (a one-sided/mixed predicate has
    only one date-shaped bound) or the probe prunes the file and the
    DELETE silently no-ops."""
    from thesis_iceberg_spark.tablefmt.table import VersionedTable

    df = spark.range(0, 4).selectExpr(
        "id",
        "timestamp('2024-04-02 00:00:00') + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts",
    )
    vt = VersionedTable.create(spark, loc, df=df.coalesce(1))
    vt.delete("ts <= '2024-04-02'", mode="merge-on-read")
    assert vt.read().count() == 3  # exactly the midnight row removed


def test_partition_source_rename_keeps_writes_working(spark, loc):
    """The spec binds its source column by FIELD ID: renaming it must not
    break the write path or day pruning (pre-fix, appends raised a missing
    column error because the spec recorded only the creation-time name)."""
    from thesis_iceberg_spark.tablefmt.table import VersionedTable

    df = spark.range(0, 8).selectExpr(
        "id",
        "timestamp('2024-03-01 00:00:00') + make_interval(0,0,0,CAST(id % 2 AS INT),0,0,0) AS ts",
    )
    vt = VersionedTable.create(spark, loc, df=df, partition_day="ts")
    vt.rename_column("ts", "event_ts")
    vt.append(
        spark.range(8, 12).selectExpr(
            "id", "timestamp('2024-03-02 00:00:00') AS event_ts"
        )
    )
    assert vt.read().count() == 12
    planned = vt.plan_files({"event_ts": ("2024-03-01", "2024-03-01")})
    planned_files = [f["path"] for e in planned for f in e["files"]]
    assert planned_files and all("_p_day=2024-03-01" in p for p in planned_files)


def test_update_uses_original_row_values(spark, loc):
    """All UPDATE assignments evaluate against the pre-update row (SQL
    semantics), even when one assigned column feeds another's RHS."""
    vt = VersionedTable.create(spark, loc, df=_df(spark, 1, 4))  # v = 2*id
    vt.update({"id": "v", "v": "id"}, "id >= 2")  # swap
    rows = {r.id: r.v for r in vt.read().collect()}
    assert rows == {1: 2, 4: 2, 6: 3}  # swapped, not chained


def test_commit_conflict_rebases_append(spark, loc):
    """Round 4: a stale APPEND handle no longer surfaces CommitConflict —
    the commit rebases onto the winner's snapshot and retries (Iceberg
    fast-append). Nothing is clobbered; see test_concurrency.py for the
    row-level conflict matrix."""
    from thesis_iceberg_spark.tablefmt.table import VersionedTable as VT

    vt1 = VersionedTable.create(spark, loc, df=_df(spark, 0, 10))
    vt2 = VT(spark, loc)  # second writer handle
    vt1.append(_df(spark, 10, 20))  # writer 1 commits
    vt2.append(_df(spark, 20, 30))  # stale handle: rebase + retry, no clobber
    final = VT(spark, loc)
    assert final.read().count() == 30
    snaps = final._meta["snapshots"]
    assert len(snaps) == 3
    # linear history: each snapshot's parent is the previous one
    assert [s["parent_id"] for s in snaps] == [None] + [
        s["snapshot_id"] for s in snaps[:-1]
    ]


def test_remove_orphan_files(spark, loc):
    import os
    import shutil

    vt = VersionedTable.create(spark, loc, df=_df(spark, 0, 10))
    # simulate a failed write: an unreferenced data dir appears
    orphan = os.path.join(loc, "data", "snap-999")
    os.makedirs(orphan)
    # a FRESH orphan is protected by the age threshold — it may be a
    # commit in flight (data files are written before the metadata lock)
    assert vt.remove_orphan_files() == []
    assert os.path.exists(orphan)
    removed = vt.remove_orphan_files(older_than_ms=0)
    assert removed == ["data/snap-999"]
    assert not os.path.exists(orphan)
    assert vt.read().count() == 10  # referenced data untouched
    # an OLD orphan falls to the default threshold
    os.makedirs(orphan)
    old = (os.path.getmtime(orphan)) - 4 * 24 * 3600
    os.utime(orphan, (old, old))
    assert vt.remove_orphan_files() == ["data/snap-999"]
    shutil.rmtree(loc, ignore_errors=True)


def test_sorted_write_orders_files_internally(spark, loc):
    """sort_by produces internally-sorted data files (tight row-group
    min/max stats for predicate skipping), preserved through appends."""
    import glob

    import pyarrow.parquet as pq

    df = _df(spark, 0, 1000).orderBy(F.rand(seed=7))  # scrambled input
    vt = VersionedTable.create(spark, loc, df=df.repartition(3), sort_by=["id"])
    vt.append(_df(spark, 1000, 2000).orderBy(F.rand(seed=9)).repartition(2))
    files = glob.glob(os.path.join(loc, "data", "snap-*", "*.parquet"))
    assert len(files) >= 5
    for f in files:
        ids = pq.read_table(f, columns=["id"]).column("id").to_pylist()
        assert ids == sorted(ids), f"file not internally sorted: {f}"
    assert vt._meta["sort_order"] == ["id"]
    assert vt.read().count() == 2000


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


def test_stats_based_file_skipping_on_sorted_table(spark, loc):
    """Write-time sort + footer min/max bounds -> a selective range scan
    plans k of n files from the MANIFEST alone (no file opened)."""
    df = spark.range(0, 10_000).selectExpr("id", "id * 2 AS v").repartitionByRange(8, "id")
    vt = VersionedTable.create(spark, loc, df=df, sort_by=["id"])
    entry = vt._current_manifest()[0]
    assert len(entry["files"]) == 8
    assert all("id" in f["stats"] for f in entry["files"])
    planned = vt.plan_files(ranges={"id": (2_000, 2_100)})
    n_sel = sum(len(e["files"]) for e in planned)
    assert n_sel == 1, f"expected 1 of 8 files, planned {n_sel}"
    got = vt.scan(ranges={"id": (2_000, 2_100)}).filter("id BETWEEN 2000 AND 2100")
    assert got.count() == 101
    # unpruned correctness: full scan equals read()
    assert vt.scan().count() == vt.read().count() == 10_000


def test_partition_day_pruning_from_manifest(spark, loc):
    """Hidden day() partitioning prunes at the manifest level: a one-day
    range plans only that day's files (paths carry _p_day=...)."""
    df = spark.range(0, 120).selectExpr(
        "id",
        "timestamp('2024-03-01 00:00:00') + make_interval(0,0,0,CAST(id % 3 AS INT),0,0,0) AS ts",
    )
    vt = VersionedTable.create(spark, loc, df=df, partition_day="ts")
    planned = vt.plan_files(ranges={"ts": ("2024-03-02 00:00:00", "2024-03-02 23:59:59")})
    files = [f for e in planned for f in e["files"]]
    assert files and all("_p_day=2024-03-02" in f["path"] for f in files)
    got = vt.scan(ranges={"ts": ("2024-03-02 00:00:00", "2024-03-02 23:59:59")})
    assert got.count() == 40


def test_zorder_compaction_gives_multi_column_skipping(spark, loc):
    """Z-order rewrite: after compact(zorder_by=["x","y"]), a selective
    box query on EITHER column prunes most files from the manifest — the
    multi-dimensional locality a lexicographic sort can't provide."""
    df = (
        spark.range(0, 10_000)
        .selectExpr("CAST(id % 100 AS BIGINT) AS x", "CAST(id / 100 AS BIGINT) AS y")
        .orderBy(F.rand(seed=3))
    )
    vt = VersionedTable.create(spark, loc, df=df.repartition(4))
    vt.compact(target_partitions=16, zorder_by=["x", "y"])
    entry = vt._current_manifest()[0]
    n_files = len(entry["files"])
    assert n_files >= 8
    box = {"x": (10, 19), "y": (10, 19)}
    planned = vt.plan_files(ranges=box)
    n_sel = sum(len(e["files"]) for e in planned)
    assert n_sel <= n_files // 2, f"z-order box query planned {n_sel}/{n_files} files"
    got = vt.scan(ranges=box).filter("x BETWEEN 10 AND 19 AND y BETWEEN 10 AND 19")
    assert got.count() == 100
    # single-column ranges also prune (each file has a bounded z-box)
    n_x = sum(len(e["files"]) for e in vt.plan_files(ranges={"x": (0, 5)}))
    n_y = sum(len(e["files"]) for e in vt.plan_files(ranges={"y": (0, 5)}))
    assert n_x < n_files and n_y < n_files
    assert vt.read().count() == 10_000


def test_skipping_never_prunes_on_incomparable_or_string_bounds(spark, loc):
    """Pruning must stay conservative: bounds of the wrong type, or string
    ranges containing spaces, can never prove a file empty (a blanket
    space normalization once reordered ordinary strings)."""
    df = spark.createDataFrame([("AA", 1), ("AB", 2)], "s STRING, v INT")
    vt = VersionedTable.create(spark, loc, df=df)
    # 'A Z' < 'AA' raw, but a space->'T' rewrite would flip it past 'AB'
    assert vt.scan(ranges={"s": ("A Z", "B")}).count() == 2
    # integer bounds against a string column: incomparable -> no pruning
    assert vt.scan(ranges={"s": (0, 1)}).count() == 2
    # partitioned table + non-date bounds on the source column -> no pruning
    df2 = spark.range(0, 30).selectExpr(
        "id", "timestamp('2024-05-01 00:00:00') AS ts"
    )
    vt2 = VersionedTable.create(spark, loc + "2", df=df2, partition_day="ts")
    assert vt2.scan(ranges={"ts": (0, 1)}).count() == 30
