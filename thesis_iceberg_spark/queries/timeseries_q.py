"""Time-series operators over `events`: time-bucket rollup, gap-filled
resampling with LOCF, stream-stream join (north-star §2B custom operators:
'hypertable rollup', streaming).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.sources.registry import load_table

DEC = "decimal(18,4)"


@register(
    "time_bucket_rollup",
    oracle=f"""
SELECT CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 AS bucket_epoch,
       event_type,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS {DEC})) AS VARCHAR) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Hypertable-style rollup: 15-minute time buckets (epoch-aligned "
    "integer arithmetic, the time_bucket() primitive) x event_type. "
    "Map-side-combinable; bucket count bounds the shuffle at any scale.",
)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # epoch-aligned integer bucketing (time_bucket(900s, ts)); epoch seconds
    # as the output key keeps the comparison timezone-free
    bucket = (
        F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")) / 900).cast("bigint") * 900
    )
    return (
        e.groupBy(bucket.alias("bucket_epoch"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("string").cast("double").alias("total_value"),
        )
    )


@register(
    "resample_gapfill_locf",
    oracle="""
WITH bounds AS (
  SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0,
         CAST(MAX(date_trunc('day', ts)) AS DATE) AS d1
  FROM events WHERE user_id <= 20 GROUP BY user_id),
grid AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds),
daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(*) AS n_events
  FROM events WHERE user_id <= 20 GROUP BY 1, 2)
SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day_s,
       COALESCE(d.n_events, 0) AS n_events,
       CAST(last_value(d.n_events IGNORE NULLS)
                OVER (PARTITION BY g.user_id ORDER BY g.day
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS locf_events
FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
""",
    doc="Gap-filled daily resampling: per-user dense day grid via "
    "sequence+explode, left join of observed counts (missing days -> 0), "
    "and a LOCF-style window marking whether any prior observation exists. "
    "The grid explode is bounded by the date span, not the row count.",
)
def resample_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") <= 20)
    day = F.date_trunc("day", "ts").cast("date")
    bounds = e.groupBy("user_id").agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = e.groupBy("user_id", day.alias("day")).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    return j.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day_s"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        # LOCF: last observed daily count carried across gap days
        F.last("n_events", ignorenulls=True).over(w).cast("bigint").alias("locf_events"),
    )


@register(
    "streaming_stream_stream_join",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 1 HOUR
""",
    doc="Stream-stream inner join with watermarks + event-time bound: "
    "purchases joined to same-user clicks within the preceding hour, "
    "replayed with availableNow into a memory sink. The time bound + "
    "watermark is what makes join state evictable at scale; the oracle is "
    "the equivalent bounded batch join.",
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thesis_iceberg_spark.streaming.events import events_stream

    s = events_stream(spark, sf_dir)
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("purchase_id", "click_id", "user_id")
    sink = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


@register(
    "dedup_drop_duplicates",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    doc="dropDuplicates() — the §2B-named exact-dedup API over full rows "
    "(set semantics, deterministic); dedup_exact_hash is the keyed "
    "canonical-row variant.",
)
def dedup_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .dropDuplicates()
    )
