"""thesis_iceberg_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo Morlbor0/Thesis-Iceberg (a PySpark +
Iceberg analytical store with schema-evolution resilience; see SURVEY.md),
extended with the operators a large-scale LLM training-data pipeline needs
(dedup, similarity search, text analysis, multimodal columns).

Design principles (SURVEY.md §7):
  * DataFrame / Spark SQL everywhere; Catalyst + AQE do the optimizing.
  * No ``collect()`` / ``toPandas()`` inside operators — edge only.
  * Pandas UDFs (Arrow) only where built-ins genuinely can't express
    the semantics; never row-at-a-time Python UDFs in a hot path.
  * Every operator ships with a DuckDB oracle twin where SQL-expressible.
"""

from thesis_iceberg_spark.session import get_spark
from thesis_iceberg_spark.sources.registry import TABLES, load_table, register_tables
from thesis_iceberg_spark.tablefmt import VersionedTable
from thesis_iceberg_spark.tablefmt.catalog import Catalog
from thesis_iceberg_spark.views import ApiView, ViewRegistry

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "register_tables",
    "VersionedTable",
    "Catalog",
    "ApiView",
    "ViewRegistry",
]

__version__ = "0.1.0"
