"""Namespace catalog over VersionedTable (SURVEY.md §2A D1-D10).

The reference uses a Hadoop-type catalog named `iceberg` with two
namespaces (ref: api.py:23-25, #cell-2..6 CREATE DATABASE / USE / SHOW).
This is the engine-native equivalent: a warehouse directory of
``<warehouse>/<database>/<table>`` VersionedTable locations, with the
DDL verbs as methods and ``register_view`` bridging tables into
``spark.sql`` (quoted identifiers with spaces round-trip through
backticks, ref: api.py:368 `Phone number`).

Scale note: catalog operations touch only directory listings and metadata
JSON — never data files — so they are O(tables), not O(data), like any
production metastore.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from thesis_iceberg_spark.tablefmt.table import VersionedTable


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self.current_database = "default"
        os.makedirs(os.path.join(warehouse, "default"), exist_ok=True)

    # --- namespaces (D1-D3) ------------------------------------------------

    def create_database(self, name: str, if_not_exists: bool = True) -> None:
        """CREATE DATABASE [IF NOT EXISTS] (ref: #cell-6)."""
        path = os.path.join(self.warehouse, name)
        if os.path.exists(path):
            if if_not_exists:
                return
            raise ValueError(f"database {name} already exists")
        os.makedirs(path)

    def use(self, name: str) -> None:
        """USE <namespace> (ref: #cell-4)."""
        if name not in self.databases():
            raise KeyError(f"database {name} does not exist")
        self.current_database = name

    def databases(self) -> list[str]:
        """SHOW DATABASES (ref: #cell-2)."""
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )

    def tables(self, database: str | None = None) -> list[str]:
        """SHOW TABLES (ref: #cell-5)."""
        db = database or self.current_database
        path = os.path.join(self.warehouse, db)
        if not os.path.isdir(path):
            raise KeyError(f"database {db} does not exist")
        return sorted(t for t in os.listdir(path) if VersionedTable.exists(os.path.join(path, t)))

    # --- tables (D4-D5, S7) -------------------------------------------------

    def _split(self, name: str) -> tuple[str, str]:
        if "." in name:
            db, t = name.rsplit(".", 1)
        else:
            db, t = self.current_database, name
        return db, t

    def location(self, name: str) -> str:
        db, t = self._split(name)
        return os.path.join(self.warehouse, db, t)

    def create_table(
        self,
        name: str,
        df: DataFrame | None = None,
        schema: T.StructType | None = None,
        partition_day: str | None = None,
        properties: dict[str, str] | None = None,
        now_ms: int | None = None,
    ) -> VersionedTable:
        """CREATE TABLE [... PARTITIONED BY (day(col))] [TBLPROPERTIES ...]
        [AS SELECT] (ref: #cell-7/21/68)."""
        db, _ = self._split(name)
        self.create_database(db, if_not_exists=True)
        return VersionedTable.create(
            self.spark,
            self.location(name),
            df=df,
            schema=schema,
            partition_day=partition_day,
            properties=properties,
            now_ms=now_ms,
        )

    def table(self, name: str) -> VersionedTable:
        loc = self.location(name)
        if not VersionedTable.exists(loc):
            raise KeyError(f"table {name} does not exist")
        return VersionedTable(self.spark, loc)

    def drop_table(self, name: str) -> None:
        import shutil

        shutil.rmtree(self.location(name))

    # --- introspection (D10) ------------------------------------------------

    def describe(self, name: str, extended: bool = False) -> DataFrame:
        """DESCRIBE [EXTENDED] (ref: #cell-15/20/69): column name/type/field
        id rows, plus partition spec, properties and snapshot info when
        extended."""
        vt = self.table(name)
        rows = [(f.name, f.type, str(f.id)) for f in vt.current_schema]
        if extended:
            rows.append(("", "", ""))
            for spec in vt._meta["partition_spec"]:
                # field-id-resolved CURRENT name (renames); fall back to the
                # recorded name if the source was dropped — resolved per
                # entry, not off the whole list's first element
                cur = vt._spec_source_name([spec]) or spec["source_name"]
                rows.append(
                    ("# partition", f"{spec['transform']}({cur})", "")
                )
            for k, v in vt.properties.items():
                rows.append(("# property", f"{k}={v}", ""))
            rows.append(("# current_snapshot", str(vt._meta["current_snapshot_id"]), ""))
            rows.append(("# schema_id", str(vt._meta["current_schema_id"]), ""))
        return self.spark.createDataFrame(rows, "col_name STRING, data_type STRING, field_id STRING")

    # --- SQL bridge (S6) ----------------------------------------------------

    def sql(self, statement: str) -> DataFrame | None:
        """Catalog-scoped SQL entry point: time-travel SELECTs, DML
        (UPDATE/DELETE/MERGE/INSERT) and DDL (CREATE/DROP/ALTER TABLE)
        route to VersionedTable/Catalog; everything else goes to
        spark.sql (see tablefmt/sql.py for the grammar)."""
        from thesis_iceberg_spark.tablefmt.sql import TableSQL

        return TableSQL(self.spark, self.table, catalog=self).sql(statement)

    def register_view(self, name: str, view_name: str | None = None) -> str:
        """Expose a table's current snapshot to spark.sql as a temp view
        (ref: #cell-68 createOrReplaceTempView)."""
        view = view_name or self._split(name)[1]
        self.table(name).read().createOrReplaceTempView(view)
        return view
