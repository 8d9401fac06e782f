"""Testdata table registry (SURVEY.md §2A S1/S2/S6; ref: api.py:63-73).

The reference serves a fixed set of catalog tables; our equivalent is the
driver's TPC-H-ish parquet tables plus ``documents``/``embeddings``
(TESTDATA.md).  ``register_tables`` registers each as a temp view so both
the DataFrame API and ``spark.sql`` paths work, exactly like the
reference's notebook `createOrReplaceTempView` flow
(ref: Pyspark_Notebook.ipynb#cell-68 (json:2232)).

Scale note: views over parquet keep Catalyst's scan-level optimizations
(column pruning, predicate pushdown, partition-size splitting) fully
available; nothing is materialized driver-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing physical-type quirks.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS) which Spark cannot
    map to a timestamp type; with ``spark.sql.legacy.parquet.nanosAsLong``
    it arrives as a nanosecond LongType which we convert to microsecond
    TIMESTAMP_NTZ (matching DuckDB's naive-timestamp view of the same file).
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")).cast("timestamp_ntz")
        )
    return df


def register_tables(
    spark: SparkSession, sf_dir: str | None = None, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns name -> DataFrame."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
