"""Multi-writer commit semantics (rounds 4-5): the optimistic-concurrency
conflict matrix for VersionedTable._commit_delta / _commit_replace.

  concurrent winner ->   append        row-level (MoR)     CoW rewrite
  our commit
  append                 rebase OK     rebase OK           rebase OK
  row-level (MoR)        rebase OK     CommitConflict      CommitConflict
  compaction (replace)   rebase OK     CommitConflict      CommitConflict
  CoW rewrite            CommitConflict (no auto-retry: the rewrite itself
                         is stale, the whole operation must re-run)

Compaction rebases like Iceberg's RewriteDataFiles: the rewritten files
are replaced, a concurrent append's files are carried over untouched, and
anything that removed a rewritten file or added delete files conflicts.
Data files are written before the metadata swap under unique paths, so a
rebase retries ONLY the swap — never the Spark job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thesis_iceberg_spark.tablefmt import VersionedTable
from thesis_iceberg_spark.tablefmt.table import CommitConflict


@pytest.fixture()
def loc(tmp_path):
    return str(tmp_path / "t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def _stale_pair(spark, loc):
    vt1 = VersionedTable.create(spark, loc, df=_df(spark, 0, 10))
    vt2 = VersionedTable(spark, loc)  # loads now; stale after vt1 commits
    return vt1, vt2


def test_mor_delete_rebases_across_concurrent_append(spark, loc):
    vt1, vt2 = _stale_pair(spark, loc)
    vt1.append(_df(spark, 10, 20))
    # stale handle's MoR delete targets base files the append left intact
    vt2.delete("id < 3", mode="merge-on-read")
    final = VersionedTable(spark, loc).read()
    assert sorted(r.id for r in final.collect()) == list(range(3, 20))


def test_mor_update_conflicts_with_concurrent_row_level(spark, loc):
    vt1, vt2 = _stale_pair(spark, loc)
    vt1.delete("id = 1", mode="merge-on-read")  # winner adds delete files
    with pytest.raises(CommitConflict, match="concurrent commit modified"):
        vt2.update({"v": "v + 100"}, "id < 5", mode="merge-on-read")
    # the loser's operation re-run on a fresh handle succeeds
    fresh = VersionedTable(spark, loc)
    fresh.update({"v": "v + 100"}, "id < 5", mode="merge-on-read")
    rows = {r.id: r.v for r in fresh.read().collect()}
    assert 1 not in rows and rows[0] == 100 and rows[5] == 10


def test_mor_delete_conflicts_with_concurrent_cow_rewrite(spark, loc):
    vt1, vt2 = _stale_pair(spark, loc)
    vt1.update({"v": "v + 1"}, "id >= 0")  # CoW: rewrites every base file
    with pytest.raises(CommitConflict, match="concurrent commit modified"):
        vt2.delete("id < 3", mode="merge-on-read")


def test_cow_rewrite_never_auto_retries(spark, loc):
    vt1, vt2 = _stale_pair(spark, loc)
    vt1.append(_df(spark, 10, 20))
    with pytest.raises(CommitConflict):
        vt2.update({"v": "v + 1"}, "id < 5")  # CoW on a stale handle
    with pytest.raises(CommitConflict):
        vt2.overwrite(_df(spark, 0, 5))


def test_append_rebases_across_mor_delete(spark, loc):
    vt1, vt2 = _stale_pair(spark, loc)
    vt1.delete("id < 2", mode="merge-on-read")
    vt2.append(_df(spark, 10, 15))  # pure append composes with anything
    final = VersionedTable(spark, loc).read()
    assert sorted(r.id for r in final.collect()) == list(range(2, 15))


def test_compact_rebases_across_concurrent_append(spark, loc):
    """Maintenance commits rebase too (VERDICT r4 #8): a compaction that
    read the pre-append snapshot replaces only the files it rewrote; the
    concurrent append's files carry over untouched."""
    vt1, vt2 = _stale_pair(spark, loc)
    vt1.append(_df(spark, 10, 20))
    vt2.compact(target_partitions=2)
    final = VersionedTable(spark, loc)
    assert sorted(r.id for r in final.read().collect()) == list(range(20))
    snaps = final._meta["snapshots"]
    assert [s["operation"] for s in snaps] == ["append", "append", "replace"]
    # the append's file survived the rebased replace
    appended = {e["path"] for e in snaps[1]["manifest"]} - {
        e["path"] for e in snaps[0]["manifest"]
    }
    assert appended <= {e["path"] for e in snaps[2]["manifest"]}


def test_compact_conflicts_with_concurrent_mor_delete(spark, loc):
    """A concurrent row-level commit adds position deletes the rewrite
    folded nothing in for — rebasing would resurrect the deleted rows."""
    vt1, vt2 = _stale_pair(spark, loc)
    vt1.delete("id < 3", mode="merge-on-read")
    with pytest.raises(CommitConflict):
        vt2.compact(target_partitions=1)


def test_compact_conflicts_with_concurrent_cow_rewrite(spark, loc):
    """The CoW winner removed files the compaction rewrote — stale input."""
    vt1, vt2 = _stale_pair(spark, loc)
    vt1.update({"v": "v + 1"}, "id >= 0")  # CoW: rewrites every base file
    with pytest.raises(CommitConflict):
        vt2.compact(target_partitions=1)


def test_compact_vs_append_threaded_race(spark, loc):
    """Real race: appends land while a compaction commits; nothing is lost
    and the compactor either rebases or (losing repeatedly) conflicts
    loudly — it must never silently drop an appended file."""
    import threading

    VersionedTable.create(spark, loc, df=_df(spark, 0, 10))
    errors: list = []

    def appender(t):
        try:
            vt = VersionedTable(spark, loc)
            for k in range(2):
                lo = 1000 * (t + 1) + 100 * k
                vt.append(_df(spark, lo, lo + 10))
        except Exception as ex:
            errors.append(ex)

    def compactor():
        try:
            VersionedTable(spark, loc).compact(target_partitions=1)
        except CommitConflict:
            pass  # allowed: losing the race loudly is correct

    threads = [threading.Thread(target=appender, args=(t,)) for t in range(2)]
    threads.append(threading.Thread(target=compactor))
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert VersionedTable(spark, loc).read().count() == 10 + 4 * 10


def test_parallel_appends_all_land(spark, loc):
    """Real races, not simulated staleness: 4 threads each append 3 times
    through their own handle. Every commit must land (fcntl lock + rebase
    retry), history must be linear, and no rows may be lost."""
    import threading

    VersionedTable.create(spark, loc, df=_df(spark, 0, 10))
    errors: list = []

    def writer(t):
        try:
            vt = VersionedTable(spark, loc)
            for k in range(3):
                lo = 1000 * (t + 1) + 100 * k
                vt.append(_df(spark, lo, lo + 10))
        except Exception as ex:  # surfaced after join
            errors.append(ex)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    final = VersionedTable(spark, loc)
    assert final.read().count() == 10 + 12 * 10
    snaps = final._meta["snapshots"]
    assert len(snaps) == 13
    assert [s["parent_id"] for s in snaps] == [None] + [
        s["snapshot_id"] for s in snaps[:-1]
    ]


# ---------------------------------------------------------------------------
# serializable isolation (round 5; DEFAULT since round 6, matching Iceberg's
# row-level default — VERDICT r5 #2): a row-level rebase over a concurrent
# pure append CONFLICTS whenever the append's file bounds could satisfy the
# operation predicate.  ``write.isolation-level=snapshot`` opts back in to
# rebase-over-any-append.
# ---------------------------------------------------------------------------


def _stale_serializable_pair(spark, loc):
    # no property: serializable is the default (round 6)
    vt1 = VersionedTable.create(spark, loc, df=_df(spark, 0, 10))
    vt2 = VersionedTable(spark, loc)
    return vt1, vt2


def test_serializable_delete_conflicts_with_matching_append(spark, loc):
    vt1, vt2 = _stale_serializable_pair(spark, loc)
    vt1.append(_df(spark, 1, 3))  # ids 1,2 — inside the delete predicate
    with pytest.raises(CommitConflict, match="serializable isolation"):
        vt2.delete("id < 5", mode="merge-on-read")
    # re-run on a fresh handle deletes the appended matches too
    fresh = VersionedTable(spark, loc)
    fresh.delete("id < 5", mode="merge-on-read")
    assert sorted(r.id for r in fresh.read().collect()) == list(range(5, 10))


def test_serializable_delete_rebases_when_append_provably_disjoint(spark, loc):
    vt1, vt2 = _stale_serializable_pair(spark, loc)
    vt1.append(_df(spark, 100, 110))  # bounds [100,110): cannot match id < 5
    vt2.delete("id < 5", mode="merge-on-read")  # rebases — no conflict
    final = VersionedTable(spark, loc).read()
    assert sorted(r.id for r in final.collect()) == list(range(5, 10)) + list(
        range(100, 110)
    )


def test_serializable_update_unparseable_predicate_is_pessimistic(spark, loc):
    vt1, vt2 = _stale_serializable_pair(spark, loc)
    vt1.append(_df(spark, 100, 110))  # disjoint from any id < 5 row
    # OR-predicate: ranges unknown -> any concurrent append conflicts
    with pytest.raises(CommitConflict, match="serializable isolation"):
        vt2.update({"v": "v + 1"}, "id < 2 or id > 8", mode="merge-on-read")


def test_serializable_merge_uses_source_key_bounds(spark, loc):
    vt1, vt2 = _stale_serializable_pair(spark, loc)
    vt1.append(_df(spark, 100, 110))
    # source keys [0,3]: outside the append's [100,110) bounds -> rebase OK
    src = _df(spark, 0, 4).withColumn("v", F.lit(-1).cast("bigint"))
    vt2.merge(src, on="id", when_matched_update={"v": "s.v"}, mode="merge-on-read")
    rows = {r.id: r.v for r in VersionedTable(spark, loc).read().collect()}
    assert rows[0] == -1 and rows[3] == -1 and rows[100] == 200
    # source key RANGE overlapping the append's bounds -> conflict (105
    # matches a stale row so the MoR path runs; 205 stretches the key
    # bounds over the concurrent append's [200,210) files)
    vt3 = VersionedTable(spark, loc)
    VersionedTable(spark, loc).append(_df(spark, 200, 210))
    src2 = (
        spark.createDataFrame([(105,), (205,)], "id bigint")
        .withColumn("v", F.lit(-2).cast("bigint"))
    )
    with pytest.raises(CommitConflict, match="serializable isolation"):
        vt3.merge(src2, on="id", when_matched_update={"v": "s.v"},
                  mode="merge-on-read")


def test_serializable_merge_insert_only_conflicts_with_matching_append(spark, loc):
    """A MERGE that degenerates to a pure insert (no key overlap in ITS
    snapshot) still read the table to decide that; under serializable
    isolation the commit must conflict with a concurrent append whose
    files could contain a matching key — otherwise the pair commits a
    duplicate key no serial order could produce."""
    vt1, vt2 = _stale_serializable_pair(spark, loc)
    vt1.append(_df(spark, 100, 101))  # key 100 lands concurrently
    src = spark.createDataFrame([(100, -1)], "id bigint, v bigint")
    with pytest.raises(CommitConflict, match="serializable isolation"):
        vt2.merge(src, on="id", when_matched_update={"v": "s.v"})
    # a fresh re-run sees key 100 and takes the matched path: one row, updated
    fresh = VersionedTable(spark, loc)
    fresh.merge(src, on="id", when_matched_update={"v": "s.v"},
                mode="merge-on-read")
    rows = [r.v for r in fresh.read().filter("id = 100").collect()]
    assert rows == [-1]


def test_serializable_merge_insert_only_rebases_when_disjoint(spark, loc):
    vt1, vt2 = _stale_serializable_pair(spark, loc)
    vt1.append(_df(spark, 100, 110))  # bounds [100,110): cannot match key 50
    src = spark.createDataFrame([(50, -1)], "id bigint, v bigint")
    vt2.merge(src, on="id", when_matched_update={"v": "s.v"})  # rebases
    ids = sorted(r.id for r in VersionedTable(spark, loc).read().collect())
    assert 50 in ids and 100 in ids and len(ids) == 21


def test_serializable_eq_delete_with_null_key_conflicts(spark, loc):
    """Equality deletes match null-safely, so a key set containing a NULL
    must leave that column UNCONSTRAINED in the serializable bounds: a
    concurrent append whose only matching row is NULL-keyed has
    null-ignoring footer stats disjoint from the non-null key range, and
    bounding on min/max alone would rebase over rows a serial re-run of
    the delete would have removed."""
    vt1, vt2 = _stale_serializable_pair(spark, loc)
    vt1.append(
        spark.createDataFrame([(None, 0), (9, 18)], "id bigint, v bigint")
    )  # footer stats for id: (9, 9) — disjoint from key 1 — plus a NULL
    keys = spark.createDataFrame([(1,), (None,)], "id bigint")
    with pytest.raises(CommitConflict, match="serializable isolation"):
        vt2.delete_by_key(keys)
    # non-null key sets with disjoint bounds still rebase
    vt3 = VersionedTable(spark, loc)
    VersionedTable(spark, loc).append(_df(spark, 200, 210))
    vt3.delete_by_key(spark.createDataFrame([(1,)], "id bigint"))
    ids = [r.id for r in VersionedTable(spark, loc).read().collect()]
    assert 1 not in ids and 200 in ids


def test_snapshot_opt_in_rebases_matching_append(spark, loc):
    """write.isolation-level=snapshot opts back in to the weaker
    rebase-over-any-append behavior (the pre-round-6 default)."""
    vt1 = VersionedTable.create(
        spark, loc, df=_df(spark, 0, 10),
        properties={"write.isolation-level": "snapshot"},
    )
    vt2 = VersionedTable(spark, loc)
    vt1.append(_df(spark, 1, 3))
    vt2.delete("id < 5", mode="merge-on-read")  # no conflict under snapshot
    ids = sorted(r.id for r in VersionedTable(spark, loc).read().collect())
    assert 1 in ids and 2 in ids  # appended matches survive (snapshot iso)


def test_per_op_isolation_property_overrides_default(spark, loc):
    """write.delete.isolation-level=snapshot weakens ONLY deletes; an
    update through the same handle keeps the serializable default."""
    vt1 = VersionedTable.create(
        spark, loc, df=_df(spark, 0, 10),
        properties={"write.delete.isolation-level": "snapshot"},
    )
    vt2 = VersionedTable(spark, loc)
    vt1.append(_df(spark, 1, 3))  # ids 1,2 — inside both predicates
    vt2.delete("id < 5", mode="merge-on-read")  # snapshot: rebases
    vt3 = VersionedTable(spark, loc)
    VersionedTable(spark, loc).append(_df(spark, 3, 4))
    with pytest.raises(CommitConflict, match="serializable isolation"):
        vt3.update({"v": "v + 1"}, "id < 5", mode="merge-on-read")


def test_ranges_from_predicate_shapes():
    from thesis_iceberg_spark.tablefmt.table import (
        _MAX, _MIN, _ranges_from_predicate,
    )

    assert _ranges_from_predicate("id < 5") == {"id": (_MIN, 5)}
    assert _ranges_from_predicate("id >= 3 and id <= 7") == {"id": (3, 7)}
    assert _ranges_from_predicate("id between 3 and 7") == {"id": (3, 7)}
    assert _ranges_from_predicate("name = 'it''s'") == {"name": ("it's", "it's")}
    assert _ranges_from_predicate("a = 1 and b > 2.5") == {
        "a": (1, 1), "b": (2.5, _MAX),
    }
    # unbounded sentinels compare below/above everything
    assert not (_MIN > 0) and not (_MAX < 10**9) and (_MIN < -1) and (_MAX > 1)
    # unparseable shapes -> None (pessimistic)
    assert _ranges_from_predicate("id < 5 or id > 8") is None
    assert _ranges_from_predicate(None) is None
    assert _ranges_from_predicate("not id = 1") is None
    assert _ranges_from_predicate("(id = 1)") is None
    assert _ranges_from_predicate(F.col("id") < 5) is None
    # AND inside a string literal collapses safely to None
    assert _ranges_from_predicate("name = 'rock and roll'") is None
