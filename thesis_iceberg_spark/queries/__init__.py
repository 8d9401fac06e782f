"""Query registry: every implemented operator gets a named entry.

This is the engine's equivalent of the reference's endpoint surface
(ref: api.py:427-445 routes) re-expressed as named query functions, plus the
driver contract from __spark_entry__.py: each entry has a Spark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, a DuckDB oracle
SQL string that must produce hash-identical results (same column names!).

Determinism rules applied throughout (SURVEY.md §5/§7):
  * money/quantity aggregates go through DECIMAL(18,4) so sums are exact and
    engine-order-independent, then CAST to DOUBLE for a stable output type;
  * every computed column is aliased identically in Spark and oracle SQL;
  * LIMIT always rides on a total ORDER BY with a unique tie-break key;
  * timestamps in outputs are cast to DATE or formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> rows-only check (non-SQL op)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    # Import for side effects: each module registers its queries.
    from thesis_iceberg_spark.queries import (  # noqa: F401
        dedup,
        extended,
        functions_q,
        multimodal_q,
        pipeline_q,
        relational,
        similarity,
        sql_shapes,
        streaming_q,
        tablefmt_checks,
        text,
        timeseries_q,
    )


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
