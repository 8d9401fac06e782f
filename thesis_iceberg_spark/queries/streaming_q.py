"""Registered queries for the Structured Streaming operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    "streaming_batch_parity",
    oracle="SELECT '' AS day, '' AS event_type, "
    "CAST(0 AS BIGINT) AS n_events, CAST(0.0 AS DOUBLE) AS total_value WHERE 1=0",
    doc="Self-check: streaming result XOR batch result — must be EMPTY "
    "(oracle is the empty relation with the same schema).",
)
def streaming_batch_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_batch_parity(spark, sf_dir)
