"""Local mirror of the driver's correctness gate (SURVEY.md §5).

Runs a registered Spark query and its DuckDB oracle SQL side-by-side on the
same parquet tables and compares row-count + column names + an
order-insensitive value comparison.  Used by tests/ so every operator is
verified the same way the driver will verify it, before the driver ever runs.

The comparison is EXACT on values (no float tolerance): queries are designed
so both engines produce bit-identical doubles (decimal-exact aggregation,
see queries/__init__.py docstring).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from thesis_iceberg_spark.sources.registry import TABLES


def duckdb_table_view(
    con: duckdb.DuckDBPyConnection, sf_dir: str, name: str
) -> None:
    """Register ``{sf_dir}/{name}.parquet`` as view ``name`` — handling
    BOTH layouts: the driver testdata ships single parquet FILES, while
    crafted test corpora are spark-written DIRECTORIES of part files
    (review r13: this dir-or-file sniff existed as three verbatim test
    copies)."""
    import os

    src = f"{sf_dir}/{name}.parquet"
    pat = f"{src}/*.parquet" if os.path.isdir(src) else src
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with every testdata table registered as a view."""
    con = duckdb.connect()
    for name in TABLES:
        duckdb_table_view(con, sf_dir, name)
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "␀"
        # repr round-trips doubles exactly; -0.0 normalized to 0.0
        return repr(v + 0.0 if v == 0 else v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Columns sorted by name, every cell stringified, rows sorted."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "FAIL"
        msg = f"{self.name}: {status} (spark={self.spark_rows}, oracle={self.oracle_rows})"
        for m in self.mismatches[:5]:
            msg += f"\n    {m}"
        return msg


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    fn,
    oracle: str,
    sf_dir: str,
) -> CompareResult:
    spark_pdf = fn(spark, sf_dir).toPandas()
    oracle_pdf = con.sql(oracle).df()

    res = CompareResult(name, True, len(spark_pdf), len(oracle_pdf))
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        res.ok = False
        res.mismatches.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return res
    if len(spark_pdf) != len(oracle_pdf):
        res.ok = False
        res.mismatches.append("row counts differ")
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        res.ok = False
        only_s = [r for r in s_rows if r not in set(o_rows)][:3]
        only_o = [r for r in o_rows if r not in set(s_rows)][:3]
        for r in only_s:
            res.mismatches.append(f"spark-only row: {r}")
        for r in only_o:
            res.mismatches.append(f"oracle-only row: {r}")
    return res
