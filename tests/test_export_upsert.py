"""Corpus export (sharded JSONL) round-trip and CDC-style streaming upsert
(foreachBatch + MERGE per micro-batch into a VersionedTable)."""

from __future__ import annotations

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
