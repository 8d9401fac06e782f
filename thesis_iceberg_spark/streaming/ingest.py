"""Streaming ingestion into VersionedTable via foreachBatch.

Connects the two halves of the engine: a Structured Streaming source lands
in a snapshot-versioned table, one snapshot per micro-batch — which is
exactly how Iceberg streaming writes work (each epoch commits a snapshot),
so downstream readers get time travel and changelog over the ingested
stream for free.

Scale notes: foreachBatch hands the micro-batch DataFrame to the normal
distributed append path (executors write the files); the commit itself is
metadata-only. Exactly-once here relies on the single-writer commit
protocol + the source's replayable offsets, like any foreachBatch sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.tablefmt import VersionedTable


def stream_into_table(
    spark: SparkSession,
    stream: DataFrame,
    location: str,
    now_ms_base: int | None = None,
) -> VersionedTable:
    """Run a (bounded, availableNow) stream to completion, appending each
    micro-batch to a VersionedTable at ``location`` (created from the
    stream schema on first batch). Returns the table."""
    state: dict[str, VersionedTable] = {}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        now = (now_ms_base + batch_id) if now_ms_base is not None else None
        if "t" not in state:
            if VersionedTable.exists(location):
                state["t"] = VersionedTable(spark, location)
                state["t"].append(batch_df, now_ms=now)
            else:
                state["t"] = VersionedTable.create(spark, location, df=batch_df, now_ms=now)
        else:
            state["t"].append(batch_df, now_ms=now)

    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    if "t" not in state:  # empty source: still create the (empty) table
        raise ValueError("stream produced no micro-batches")
    return state["t"]


def stream_upsert_into_table(
    stream: DataFrame,
    table: VersionedTable,
    key: str,
    now_ms_base: int | None = None,
    mode: str | None = None,
) -> VersionedTable:
    """CDC-style streaming UPSERT: every micro-batch MERGEs into the target
    on ``key`` (last-writer-wins within a batch by max ``key`` groupBy is
    NOT applied — batches with duplicate keys are rejected by merge(), the
    SQL-standard behavior; dedupe upstream with dropDuplicates if needed).

    This is the foreachBatch + MERGE pattern every lakehouse CDC pipeline
    uses: matched rows update, new keys insert, each epoch commits one
    snapshot — so the target stays time-travelable through the upserts.

    Write amplification: merge() is file-pruned, so an epoch only rewrites
    the data files its keys actually land in. For a steady CDC feed the
    right table setting is write.merge.mode=merge-on-read (or ``mode=``
    here): each epoch then writes O(batch) bytes — a position-delete file
    plus one small data file set — and NEVER rewrites existing data files;
    compact() folds the accumulated deletes back in off the hot path."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        now = (now_ms_base + batch_id) if now_ms_base is not None else None
        cols = table.columns
        updates = {c: f"s.`{c}`" for c in cols if c != key}
        table.merge(
            batch_df.select(*cols),
            on=key,
            when_matched_update=updates,
            when_not_matched_insert=True,
            now_ms=now,
            mode=mode,
        )

    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    return table


def stream_cdc_apply_into_table(
    stream: DataFrame,
    table: VersionedTable,
    key: str,
    op_col: str = "_op",
    now_ms_base: int | None = None,
    mode: str | None = None,
) -> VersionedTable:
    """FULL CDC apply: a change stream whose ``op_col`` is 'upsert' or
    'delete' lands per micro-batch as one MERGE (upserts) plus one
    EQUALITY-delete file (deletes).  The delete half never reads the
    target — delete_by_key() just writes the batch's key set, applied at
    read time by sequence number — so a delete-heavy CDC feed stays
    O(batch) per epoch even on a table position deletes would have to
    scan.  Within a batch, a key both upserted and deleted is an error
    (ambiguous order inside one epoch; make the source emit the final
    image per key per batch, the standard CDC-compaction contract)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        now = (now_ms_base + batch_id) if now_ms_base is not None else None
        ups = batch_df.filter(F.col(op_col) == "upsert").drop(op_col)
        dels = batch_df.filter(F.col(op_col) == "delete").select(key)
        both = ups.select(key).join(dels, key, "left_semi").limit(1).collect()
        if both:
            raise ValueError(
                f"CDC batch {batch_id} both upserts and deletes key "
                f"{key}={both[0][0]!r}; emit one final image per key per batch"
            )
        if not dels.isEmpty():
            table.delete_by_key(dels, columns=[key], now_ms=now)
        if not ups.isEmpty():
            cols = table.columns
            table.merge(
                ups.select(*cols),
                on=key,
                when_matched_update={c: f"s.`{c}`" for c in cols if c != key},
                when_not_matched_insert=True,
                now_ms=now,
                mode=mode,
            )

    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    return table
