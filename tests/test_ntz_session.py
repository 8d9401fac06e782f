"""The streaming family must stay green under a session configured with
``spark.sql.timestampType=TIMESTAMP_NTZ`` (VERDICT r4 #4): the string cast
``"timestamp"`` resolves THROUGH that conf, so only an explicit
``TimestampType()`` cast (streaming/events.py) guarantees the LTZ column
``withWatermark`` requires.  Regression tests for both normalization
branches — nanos-as-long testdata and a MICROS/NTZ-encoded file."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def ntz_spark(spark):
    ns = spark.newSession()
    ns.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    return ns


def test_windowed_event_stats_under_ntz_session(ntz_spark, spark, sf_dir):
    from thesis_iceberg_spark.streaming.events import windowed_event_stats

    got = sorted(map(tuple, windowed_event_stats(ntz_spark, sf_dir).collect()))
    want = sorted(map(tuple, windowed_event_stats(spark, sf_dir).collect()))
    assert got and got == want


def test_micros_encoded_stream_branch_under_ntz(ntz_spark, tmp_path, sf_dir):
    """A TIMESTAMP(MICROS)/NTZ-encoded events.parquet types its static read
    as timestamp_ntz under an NTZ session — the branch where the string
    cast would be a no-op and withWatermark would reject the column."""
    from thesis_iceberg_spark.sources.registry import load_table
    from thesis_iceberg_spark.streaming.events import windowed_event_stats

    ev = load_table(ntz_spark, sf_dir, "events").limit(200)
    stage = str(tmp_path / "stage")
    ev.withColumn("ts", F.col("ts").cast("timestamp_ntz")).coalesce(1).write.parquet(stage)
    part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
    d = str(tmp_path / "ntzdir")
    os.makedirs(d)
    os.rename(os.path.join(stage, part), os.path.join(d, "events.parquet"))

    got = windowed_event_stats(ntz_spark, d)
    assert got.count() > 0
