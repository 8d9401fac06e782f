"""SparkSession bootstrap (SURVEY.md §7 step 1; ref: api.py:19-26).

The reference builds one module-level SparkSession with the Iceberg runtime
and a Hadoop catalog.  This engine is catalog-agnostic: it runs on plain
parquet + the built-in ``spark_catalog``, with the versioned-table layer
(``thesis_iceberg_spark.tablefmt``) providing snapshot/time-travel/schema-
history semantics natively (no external runtime jars are available in this
environment).

Scale posture: these configs are chosen for a real multi-executor cluster
reading ~100 TB, then sized down via env vars for local[N] testing:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing).
* Arrow for every Python<->JVM columnar hop.
* ``shuffle.partitions`` defaults to 2x cores locally; on a cluster you
  would set it to ~2-3x total executor cores (or rely on AQE coalescing
  with a high initial value).
* zstd parquet writes (matches the reference warehouse's codec —
  ref: spark-warehouse/.../v15.metadata.json write.parquet.compression-codec).
* UTC session timezone so timestamp semantics are stable across
  driver/executor machines (and match the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "thesis-iceberg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Mirrors the reference's single-session bootstrap (api.py:19-26) but with
    an explicitly scale-oriented config block.  Safe to call repeatedly —
    Spark returns the existing session if one is already running.
    """
    cores = _default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", max(2 * cores, 8))
    )

    conf: dict[str, str] = {
        # --- correctness / determinism ---
        "spark.sql.session.timeZone": "UTC",
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no ns
        # timestamp type, so read as long and convert in the loader.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # --- adaptive execution: the 100 TB safety net ---
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # --- python <-> jvm boundary ---
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # --- shuffle sizing ---
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # 128 MB split targets keep scan partitions executor-memory friendly
        "spark.sql.files.maxPartitionBytes": "134217728",
        # --- storage ---
        "spark.sql.parquet.compression.codec": "zstd",
        # Spark's legacy default INT96 timestamps carry NO parquet min/max
        # statistics, silently disabling footer-stats range pruning on
        # every timestamp column (VersionedTable.plan_files, sorted-table
        # skipping); TIMESTAMP_MICROS is the modern annotated INT64 form
        # with full stats, readable by every engine here.
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        # --- misc ---
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        # managed tables (bucketed-join layouts) live outside the repo
        "spark.sql.warehouse.dir": os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/tisw_spark_warehouse"
        ),
    }
    if extra_conf:
        conf.update(extra_conf)

    builder = SparkSession.builder.master(master).appName(app_name)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark
