"""Registered queries for the Structured Streaming operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.streaming.events import stream_batch_parity, windowed_event_stats


@register(
    "streaming_windowed_event_stats",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Structured Streaming: tumbling 1-day event-time windows with a "
    "watermark, run to completion with trigger(availableNow) into a memory "
    "sink. Full value oracle: epoch-aligned windows equal date_trunc('day').",
)
def streaming_windowed_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_event_stats(spark, sf_dir)


@register(
    "streaming_stateful_user_counts",
    oracle="SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id",
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user counters updated across availableNow micro-batches in update "
    "mode; the final state must equal the batch GROUP BY.",
)
def streaming_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thesis_iceberg_spark.streaming.stateful import stateful_user_counts

    return stateful_user_counts(spark, sf_dir)


@register(
    "streaming_stateful_dedup",
    oracle="SELECT user_id, MIN(event_id) AS canonical_event_id FROM events GROUP BY user_id",
    doc="Streaming dedup via applyInPandasWithState: per-key state keeps "
    "the canonical (lowest) event_id across micro-batches — arrival-order "
    "independent, so the replay matches the batch MIN exactly.",
)
def streaming_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thesis_iceberg_spark.streaming.stateful import stateful_streaming_dedup

    return stateful_streaming_dedup(spark, sf_dir)


@register(
    "sessionize_events",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked)
SELECT user_id, session_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start_s,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end_s,
       COUNT(*) AS n_events
FROM sessions GROUP BY user_id, session_id
""",
    doc="Sessionization (30-min inactivity gap) via gaps-and-islands window "
    "composition — the batch twin of a stateful-streaming session operator. "
    "One shuffle on user_id; windows sort within partitions only.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from thesis_iceberg_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = marked.withColumn("session_id", F.sum("new_session").over(cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start_s"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end_s"),
        F.count("*").alias("n_events"),
    )


@register(
    "streaming_static_dim_join",
    oracle="""
SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
    doc="Stream-static join: the event stream enriched against the static "
    "customer dimension, aggregated in complete mode. No forced broadcast "
    "hint — customer scales with SF, so the per-micro-batch join strategy "
    "is left to the planner (broadcast when the dim is genuinely small; at "
    "scale a pre-bucketed dim or a state-store join keeps it bounded). "
    "Oracle is the batch equivalent.",
)
def streaming_static_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from thesis_iceberg_spark.sources.registry import load_table
    from thesis_iceberg_spark.streaming.events import events_stream

    stream = events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = stream.join(dim, stream.user_id == dim.c_custkey)
    agg = joined.groupBy("c_mktsegment", "event_type").agg(F.count("*").alias("n"))
    sink = f"ssd_{_uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


@register(
    "streaming_batch_parity",
    oracle="SELECT '' AS day, '' AS event_type, "
    "CAST(0 AS BIGINT) AS n_events, CAST(0.0 AS DOUBLE) AS total_value WHERE 1=0",
    doc="Self-check: streaming result XOR batch result — must be EMPTY "
    "(oracle is the empty relation with the same schema).",
)
def streaming_batch_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_batch_parity(spark, sf_dir)
