"""Custom stateful streaming operator via applyInPandasWithState
(north-star §2B: 'applyInPandasWithState for custom stateful operators').

Running per-user event counts: state = one counter per user, updated per
micro-batch, emitted in update mode.  The availableNow replay of the
parquet backlog exercises real state persistence across micro-batches —
the same code tails a Kafka topic on a cluster, with state sharded by the
grouping key across executors (RocksDB-backed at scale).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from thesis_iceberg_spark.streaming.events import events_stream


def stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running event counts with explicit group state."""

    def update_counts(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (count,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [count]})

    stream = events_stream(spark, sf_dir).select("user_id", "event_id")
    counted = stream.groupBy("user_id").applyInPandasWithState(
        update_counts,
        outputStructType="user_id BIGINT, n_events BIGINT",
        stateStructType="n BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"stateful_counts_{uuid.uuid4().hex[:8]}"
    q = (
        counted.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the update-mode sink holds one row per (user, micro-batch) update;
    # counts are monotone so the final value per user is the max
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )


def stateful_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: one canonical row per key survives the stream.

    State per user is the lowest event_id seen so far (canonical-by-id, so
    the result is independent of micro-batch arrival order — the property a
    distributed replay needs); each batch emits the current canonical id in
    update mode, and the final canonical set is the per-key minimum of the
    updates. This is the streaming twin of dedup_exact_hash's
    min(doc_id)-per-fingerprint rule."""

    def keep_first(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (best,) = state.get if state.exists else (None,)
        for pdf in pdfs:
            batch_min = int(pdf["event_id"].min())
            best = batch_min if best is None else min(best, batch_min)
        state.update((best,))
        yield pd.DataFrame({"user_id": [key[0]], "canonical_event_id": [best]})

    stream = events_stream(spark, sf_dir).select("user_id", "event_id")
    canon = stream.groupBy("user_id").applyInPandasWithState(
        keep_first,
        outputStructType="user_id BIGINT, canonical_event_id BIGINT",
        stateStructType="best BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    sink = f"stateful_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        canon.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(F.min("canonical_event_id").alias("canonical_event_id"))
    )
