"""Extended relational operators: as-of join, range join, Python UDF paths
(SURVEY.md §2B — operators the reference lacks entirely).

The UDF queries demonstrate the engine's Python escape hatches the RIGHT
way: Arrow-vectorized ``pandas_udf`` (scalar and grouped-agg), never
row-at-a-time Python UDFs. Everything else in this engine is JVM-side;
these exist because a real pipeline sometimes needs numpy/pandas logic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.sources.registry import load_table


@register(
    "asof_join_last_event",
    oracle="""
WITH j AS (
  SELECT o.o_orderkey, o.o_custkey,
         strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
         e.ts, e.event_id, e.value,
         ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
  FROM orders o
  LEFT JOIN events e ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate)
SELECT o_orderkey, o_custkey, o_orderdate_s,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts_s,
       value AS last_value
FROM j WHERE rn = 1
""",
    doc="As-of join: for every order, the customer's most recent event at "
    "or before the order date (deterministic event_id tie-break). Spark "
    "plan: equi-join on the user key + per-order top-1 window — one shuffle "
    "on the key, no inequality cross-product. DuckDB's native ASOF JOIN "
    "computes the same relation (the window oracle pins tie-breaks).",
)
def asof_join_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    j = o.join(
        e, (e.user_id == o.o_custkey) & (e.ts <= o.o_orderdate), "left"
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts_s"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "range_join_event_window",
    oracle="""
SELECT o.o_orderkey, COUNT(e.event_id) AS n_events_7d
FROM orders o
LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey
""",
    doc="Range (band) join: events of the same customer within 7 days after "
    "each order. The equality key carries the shuffle; the range predicate "
    "filters within each key group — never a cartesian.",
)
def range_join_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    cond = (
        (e.user_id == o.o_custkey)
        & (e.ts >= o.o_orderdate)
        & (e.ts < F.expr("o_orderdate + INTERVAL 7 DAYS"))
    )
    return (
        o.join(e, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events_7d"))
    )


@register(
    "pandas_udf_scalar_text",
    oracle="""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_words_udf,
       length(text) - length(replace(text, 'a', '')) AS n_letter_a
FROM documents
""",
    doc="Arrow-vectorized SCALAR pandas_udf (the sanctioned Python hot "
    "path): pandas str ops over whole Arrow batches, ~10-100x faster than "
    "row-at-a-time Python UDFs. Integer outputs keep it exactly oracle-able.",
)
def pandas_udf_scalar_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("long")
    def n_words(texts: pd.Series) -> pd.Series:
        return texts.str.strip().str.split(r"\s+").map(len)

    @F.pandas_udf("long")
    def n_letter_a(texts: pd.Series) -> pd.Series:
        return texts.str.count("a")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_words("text").alias("n_words_udf"),
        n_letter_a("text").alias("n_letter_a"),
    )


@register(
    "pandas_udf_grouped_median",
    oracle="""
SELECT o_orderstatus, median(o_totalprice) AS median_price, COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
""",
    doc="Grouped-aggregate pandas_udf (UDAF path): per-status median order "
    "price via numpy over Arrow groups. Median is selection/interpolation, "
    "not summation, so it reproduces exactly across engines.",
)
def pandas_udf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf("double")
    def median_udaf(prices: pd.Series) -> float:
        return float(np.median(prices.values))

    @F.pandas_udf("long")
    def count_udaf(prices: pd.Series) -> int:
        # grouped-agg pandas UDFs can't mix with built-in aggregates in one
        # agg() — so the row count is a pandas UDAF too
        return int(prices.size)

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        median_udaf("o_totalprice").alias("median_price"),
        count_udaf("o_totalprice").alias("n"),
    )
