"""Versioned-table layer: snapshot/time-travel/schema-history semantics.

The reference delegates these to the Iceberg runtime (SURVEY.md §2A D/M/T
operator groups); no Iceberg jars exist in this environment, so this package
provides the same table semantics natively on parquet + JSON metadata,
deliberately mirroring Iceberg's Hadoop-catalog protocol (versioned
metadata JSON + version-hint.text + immutable data files + field-id-based
schema evolution) so the concepts transfer 1:1.
"""

from thesis_iceberg_spark.tablefmt.sql import TableSQL
from thesis_iceberg_spark.tablefmt.table import VersionedTable

__all__ = ["TableSQL", "VersionedTable"]
