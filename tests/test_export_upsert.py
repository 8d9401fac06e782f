"""Corpus export (sharded JSONL) round-trip and CDC-style streaming upsert
(foreachBatch + MERGE per micro-batch into a VersionedTable)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from thesis_iceberg_spark.sources.export import export_jsonl
from thesis_iceberg_spark.sources.registry import load_table
from thesis_iceberg_spark.streaming.ingest import stream_upsert_into_table
from thesis_iceberg_spark.tablefmt import VersionedTable


def test_export_jsonl_round_trip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = str(tmp_path / "corpus")
    files = export_jsonl(docs, out, shards=4)
    assert len(files) == 4
    back = spark.read.json(out)
    assert back.count() == docs.count()
    # value-exact round trip (json preserves strings/longs)
    a = {(r.doc_id, r.lang, r.text) for r in docs.collect()}
    b = {(r.doc_id, r.lang, r.text) for r in back.collect()}
    assert a == b


def test_stream_upsert_merges_per_microbatch(spark, tmp_path):
    loc = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k INT, s STRING, v INT"
    )
    vt = VersionedTable.create(spark, loc, df=base, now_ms=1_000)
    # bounded "stream": CDC rows landing as files (2 updates + 1 insert)
    src_dir = str(tmp_path / "cdc")
    cdc = spark.createDataFrame(
        [(2, "B", 200), (3, "C", 300), (9, "z", 90)], "k INT, s STRING, v INT"
    )
    cdc.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(cdc.schema).parquet(src_dir)
    stream_upsert_into_table(stream, vt, key="k", now_ms_base=2_000)
    got = {r.k: (r.s, r.v) for r in vt.read().collect()}
    assert got == {1: ("a", 10), 2: ("B", 200), 3: ("C", 300), 9: ("z", 90)}
    # the upsert committed snapshots; pre-upsert state is still reachable
    assert {r.k for r in vt.read(snapshot_id=1).collect()} == {1, 2, 3}


def test_stream_upsert_mor_writes_o_batch_per_epoch(spark, tmp_path):
    """With write.merge.mode=merge-on-read, N micro-batches over a T-row
    table write O(batch) rows per epoch — existing data files are never
    rewritten, each epoch adds one delete file + one small data file set."""
    import glob
    import os

    loc = str(tmp_path / "t")
    big = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    vt = VersionedTable.create(
        spark, loc, df=big.repartition(8), now_ms=1_000,
        properties={"write.merge.mode": "merge-on-read"},
    )
    base_dirs = sorted(glob.glob(os.path.join(loc, "data", "snap-1-*")))
    base_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for d in base_dirs for dp, _, fs in os.walk(d) for f in fs
    )
    # 3 micro-batches of 10 rows each (5 updates + 5 inserts per batch)
    src_dir = str(tmp_path / "cdc")
    for b in range(3):
        batch = spark.createDataFrame(
            [(b * 5 + i, -1) for i in range(5)]
            + [(100_000 + b * 5 + i, -2) for i in range(5)],
            "k BIGINT, v BIGINT",
        )
        batch.coalesce(1).write.mode("append").parquet(src_dir)
    stream = (
        spark.readStream.schema("k BIGINT, v BIGINT")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    stream_upsert_into_table(stream, vt, key="k", now_ms_base=2_000)
    # original data files byte-identical (never rewritten)
    assert sorted(glob.glob(os.path.join(loc, "data", "snap-1-*"))) == base_dirs
    after_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for d in base_dirs for dp, _, fs in os.walk(d) for f in fs
    )
    assert after_bytes == base_bytes
    # each epoch appended only its own rows: every post-base manifest entry
    # holds <= 10 rows (the batch), not ~10k (the table)
    snap = vt._select_snapshot()
    new_entries = [e for e in snap["manifest"] if not e["path"].startswith("data/snap-1-")]
    assert len(new_entries) >= 1
    assert all(0 < e["rows"] <= 10 for e in new_entries)
    assert sum(e["rows"] for e in new_entries) == 30  # 3 epochs x 10 rows
    # and the state is right: 10_015 live keys, updates applied
    assert vt.read().count() == 10_015
    assert {r.v for r in vt.read().filter(F.col("k") >= 100_000).collect()} == {-2}
    assert vt.read().filter((F.col("k") < 15) & (F.col("v") == -1)).count() == 15


def test_stream_cdc_apply_upserts_and_eq_deletes(spark, tmp_path):
    """Full CDC apply (round 5): per micro-batch, upserts land as one MERGE
    and deletes as one EQUALITY-delete file — the delete half never reads
    the target table."""
    from thesis_iceberg_spark.streaming.ingest import stream_cdc_apply_into_table

    loc = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k INT, s STRING, v INT"
    )
    vt = VersionedTable.create(spark, loc, df=base, now_ms=1_000)
    src_dir = str(tmp_path / "cdc")
    cdc = spark.createDataFrame(
        [
            (2, "B", 200, "upsert"),   # update
            (9, "z", 90, "upsert"),    # insert
            (1, None, None, "delete"), # delete
        ],
        "k INT, s STRING, v INT, _op STRING",
    )
    cdc.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(cdc.schema).parquet(src_dir)
    stream_cdc_apply_into_table(
        stream, vt, key="k", now_ms_base=2_000, mode="merge-on-read"
    )
    got = {r.k: (r.s, r.v) for r in vt.read().collect()}
    assert got == {2: ("B", 200), 3: ("c", 30), 9: ("z", 90)}
    # the delete is an equality-delete file, not a position delete
    _pos, eq = vt._split_deletes(vt._current_delete_manifest())
    assert len(eq) == 1 and eq[0]["eq_cols"] == ["k"]


def test_stream_cdc_apply_rejects_ambiguous_batch(spark, tmp_path):
    from thesis_iceberg_spark.streaming.ingest import stream_cdc_apply_into_table

    loc = str(tmp_path / "t")
    vt = VersionedTable.create(
        spark,
        loc,
        df=spark.createDataFrame([(1, 1)], "k INT, v INT"),
        now_ms=1_000,
    )
    src_dir = str(tmp_path / "cdc")
    cdc = spark.createDataFrame(
        [(1, 5, "upsert"), (1, None, "delete")], "k INT, v INT, _op STRING"
    )
    cdc.coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema(cdc.schema).parquet(src_dir)
    with pytest.raises(Exception, match="both upserts and deletes"):
        stream_cdc_apply_into_table(stream, vt, key="k", now_ms_base=2_000)
