from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from thesis_iceberg_spark import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def duck():
    from thesis_iceberg_spark.oracle import duckdb_connection

    return duckdb_connection(SF_DIR)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
