"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``thesis_iceberg_spark`` package; this module
is the thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from thesis_iceberg_spark.queries import oracle_sql as _oracle_sql
from thesis_iceberg_spark.queries import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star-join revenue by nation.

    Exercises the scan -> broadcast-join x4 -> partial/final agg pipeline
    that dominates at 100 TB (see queries/relational.py
    star_join_revenue_by_nation).
    """
    from thesis_iceberg_spark.queries.relational import star_join_revenue_by_nation

    return star_join_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query in ``queries()``."""
    return _oracle_sql()
