"""VersionedTable — snapshot-versioned parquet tables with evolving schemas.

A from-scratch, Spark-native re-implementation of the table semantics the
reference gets from Apache Iceberg (ref: api.py:19-26 catalog bootstrap;
notebook cells 7-65 exercise the features):

  * snapshot history + time travel by snapshot id / timestamp
    (ref: api.py:151-168 FOR SYSTEM_TIME AS OF; #cell-45 VERSION AS OF)
  * metadata tables .history / .snapshots / .metadata_log_entries / .refs
    (ref: api.py:78-88; #cell-16/17/39/44)
  * schema evolution via immutable FIELD IDS — add/drop/rename columns,
    old-name resolution by field id, drop/re-add gets a NEW id
    (ref: api.py:170-215; iceberg_db/test/metadata/v8.metadata.json)
  * row-level DML: INSERT/UPDATE/DELETE/MERGE, copy-on-write
    (ref: #cell-11/19/24; merge-on-read is an Iceberg storage optimization —
    semantics here are identical, see class docstring)
  * changelog between snapshots (ref: #cell-32/34/35 create_changelog_view)
  * hidden day() partitioning (ref: #cell-7 PARTITIONED BY (day(added_at)))

Storage layout (mirrors Iceberg's Hadoop catalog protocol):

    <location>/data/snap-<id>/...parquet     immutable data files
    <location>/metadata/v<N>.metadata.json   full table metadata, versioned
    <location>/metadata/version-hint.text    latest metadata version

Scale notes: data files are written by Spark executors (never collected);
reads are parquet scans; only the metadata JSON (KBs) is driver-side,
exactly as in Iceberg. DML is copy-on-write over the current snapshot (one
distributed read -> filter/when -> write); file-level pruning of untouched
partitions and merge-on-read deletes are storage optimizations Iceberg
adds on top — query semantics here are identical. Single-writer semantics
(no commit lock) — the reference's notebook flow is single-writer too.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTITION_COL = "_p_day"  # materialized hidden-partition column


class CommitConflict(RuntimeError):
    """Another writer committed since this handle loaded its metadata."""


@dataclass
class _Field:
    id: int
    name: str
    type: str  # Spark DDL type string

    def to_json(self) -> dict:
        return {"id": self.id, "name": self.name, "type": self.type}


def _spark_type(ddl: str) -> T.DataType:
    return T._parse_datatype_string(ddl)


def _schema_fields(df_schema: T.StructType, start_id: int = 1) -> list[_Field]:
    return [
        _Field(id=start_id + i, name=f.name, type=f.dataType.simpleString())
        for i, f in enumerate(df_schema.fields)
    ]


class VersionedTable:
    """A snapshot-versioned parquet table with field-id schema evolution."""

    def __init__(self, spark: SparkSession, location: str):
        self.spark = spark
        self.location = location
        self._meta = self._load_meta()

    # ------------------------------------------------------------------
    # metadata protocol
    # ------------------------------------------------------------------

    @property
    def _meta_dir(self) -> str:
        return os.path.join(self.location, "metadata")

    def _load_meta(self) -> dict:
        hint = os.path.join(self._meta_dir, "version-hint.text")
        with open(hint) as f:
            version = int(f.read().strip())
        with open(os.path.join(self._meta_dir, f"v{version}.metadata.json")) as f:
            return json.load(f)

    def _commit(self, meta: dict) -> None:
        """Write v{N+1}.metadata.json then flip version-hint (atomic rename),
        the same two-step commit the Hadoop catalog uses. Optimistic
        concurrency: if another writer committed since this handle loaded
        its metadata, the commit is rejected (Iceberg's
        CommitFailedException) — callers re-load and retry."""
        hint = os.path.join(self._meta_dir, "version-hint.text")
        with open(hint) as f:
            on_disk = int(f.read().strip())
        if on_disk != self._meta["version"]:
            raise CommitConflict(
                f"table advanced to v{on_disk} since this handle loaded "
                f"v{self._meta['version']}; reload and retry"
            )
        version = meta["version"] = self._meta["version"] + 1
        meta["metadata_log"] = self._meta.get("metadata_log", []) + [
            {
                "version": self._meta["version"],
                "file": f"v{self._meta['version']}.metadata.json",
                "timestamp_ms": self._meta["timestamp_ms"],
            }
        ]
        meta["timestamp_ms"] = _now_ms()
        path = os.path.join(self._meta_dir, f"v{version}.metadata.json")
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.rename(tmp, path)
        hint = os.path.join(self._meta_dir, "version-hint.text")
        tmp = hint + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.rename(tmp, hint)
        self._meta = meta

    # ------------------------------------------------------------------
    # creation
    # ------------------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        location: str,
        df: DataFrame | None = None,
        schema: T.StructType | None = None,
        partition_day: str | None = None,
        properties: dict[str, str] | None = None,
        sort_by: list[str] | None = None,
        now_ms: int | None = None,
    ) -> VersionedTable:
        """CREATE TABLE (+ optional AS SELECT).  ``partition_day=col`` is the
        hidden ``day(col)`` partition transform (ref: #cell-7);
        ``properties`` are free-form TBLPROPERTIES (ref: #cell-21);
        ``sort_by`` is a write-time sort order (Iceberg SORTED BY): every
        data file is internally sorted on these columns so parquet row-group
        min/max stats become tight, selective range predicates skip whole
        row groups, and the layout compresses better."""
        if df is None and schema is None:
            raise ValueError("need df (CTAS) or schema (CREATE TABLE)")
        os.makedirs(os.path.join(location, "metadata"), exist_ok=False)
        os.makedirs(os.path.join(location, "data"), exist_ok=True)
        fields = _schema_fields(schema or df.schema)
        meta = {
            "format_version": 1,
            "version": 1,
            "timestamp_ms": now_ms or _now_ms(),
            "last_field_id": len(fields),
            "current_schema_id": 0,
            "schemas": [{"schema_id": 0, "fields": [f.to_json() for f in fields]}],
            "partition_spec": (
                [{"source_name": partition_day, "transform": "day"}] if partition_day else []
            ),
            "sort_order": list(sort_by or []),
            "properties": dict(properties or {}),
            "current_snapshot_id": None,
            "snapshots": [],
            "metadata_log": [],
            "refs": {},
        }
        path = os.path.join(location, "metadata", "v1.metadata.json")
        with open(path, "w") as f:
            json.dump(meta, f, indent=1)
        with open(os.path.join(location, "metadata", "version-hint.text"), "w") as f:
            f.write("1")
        table = cls(spark, location)
        if df is not None:
            table.append(df, now_ms=now_ms)
        return table

    @staticmethod
    def exists(location: str) -> bool:
        return os.path.exists(os.path.join(location, "metadata", "version-hint.text"))

    # ------------------------------------------------------------------
    # schema accessors
    # ------------------------------------------------------------------

    def _schema_by_id(self, schema_id: int) -> list[_Field]:
        for s in self._meta["schemas"]:
            if s["schema_id"] == schema_id:
                return [_Field(**f) for f in s["fields"]]
        raise KeyError(f"schema_id {schema_id} not found")

    @property
    def current_schema(self) -> list[_Field]:
        return self._schema_by_id(self._meta["current_schema_id"])

    @property
    def columns(self) -> list[str]:
        return [f.name for f in self.current_schema]

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, _spark_type(f.type)) for f in self.current_schema]
        )

    # ------------------------------------------------------------------
    # writes
    # ------------------------------------------------------------------

    def _write_data_files(self, df: DataFrame, snapshot_id: int) -> list[dict]:
        """Write df as parquet under data/snap-<id>/ with the current schema's
        column names; returns manifest entries (relative paths are the
        snapshot dirs — files are listed lazily at read time)."""
        cols = self.columns
        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(f"write is missing columns {missing}")
        out = df.select(*cols)
        # unique suffix per write attempt: concurrent/failed writers can
        # never collide on a path; losers become orphans for
        # remove_orphan_files (Iceberg writes UUID filenames for the same
        # reason)
        rel = f"data/snap-{snapshot_id}-{uuid.uuid4().hex[:8]}"
        path = os.path.join(self.location, rel)
        spec = self._meta["partition_spec"]
        sort_order = self._meta.get("sort_order", [])
        if spec:
            src = spec[0]["source_name"]
            out = out.withColumn(_PARTITION_COL, F.date_format(F.col(src), "yyyy-MM-dd"))
        if sort_order:
            # write-time sort: tight row-group min/max for predicate skipping
            out = out.sortWithinPartitions(*sort_order)
        writer = out.write.mode("errorifexists")
        if spec:
            writer = writer.partitionBy(_PARTITION_COL)
        writer.parquet(path)
        # row count from the written files' parquet footers (metadata-only
        # aggregate scan) — avoids recomputing the input lineage twice
        n_rows = self.spark.read.parquet(path).count()
        return [
            {
                "path": rel,
                "schema_id": self._meta["current_schema_id"],
                "rows": n_rows,
            }
        ]

    def _new_snapshot(
        self, operation: str, manifest: list[dict], now_ms: int | None = None
    ) -> dict:
        sid = len(self._meta["snapshots"]) + 1
        parent = self._meta["current_snapshot_id"]
        return {
            "snapshot_id": sid,
            "parent_id": parent,
            "timestamp_ms": now_ms or _now_ms(),
            "operation": operation,
            "manifest": manifest,
            "summary": {
                "added-files": len(manifest),
                "total-records": sum(m["rows"] for m in manifest),
            },
        }

    def append(self, df: DataFrame, now_ms: int | None = None) -> None:
        """INSERT INTO semantics (ref: #cell-11 INSERT VALUES)."""
        sid = len(self._meta["snapshots"]) + 1
        manifest = self._current_manifest() + self._write_data_files(df, sid)
        self._commit_snapshot("append", manifest, now_ms)

    def overwrite(
        self, df: DataFrame, now_ms: int | None = None, operation: str = "overwrite"
    ) -> None:
        """REPLACE TABLE ... AS SELECT semantics (ref: #cell-13 RTAS)."""
        sid = len(self._meta["snapshots"]) + 1
        manifest = self._write_data_files(df, sid)
        self._commit_snapshot(operation, manifest, now_ms)

    def _commit_snapshot(
        self, operation: str, manifest: list[dict], now_ms: int | None = None
    ) -> None:
        snap = self._new_snapshot(operation, manifest, now_ms)
        meta = json.loads(json.dumps(self._meta))
        meta["snapshots"].append(snap)
        meta["current_snapshot_id"] = snap["snapshot_id"]
        meta.setdefault("refs", {})["main"] = {"snapshot_id": snap["snapshot_id"]}
        self._commit(meta)

    def _current_manifest(self) -> list[dict]:
        sid = self._meta["current_snapshot_id"]
        if sid is None:
            return []
        for s in self._meta["snapshots"]:
            if s["snapshot_id"] == sid:
                return list(s["manifest"])
        raise KeyError(f"snapshot {sid} not found")

    # ------------------------------------------------------------------
    # reads (schema-id-aware: files map to the current schema by field id)
    # ------------------------------------------------------------------

    def read(
        self, snapshot_id: int | None = None, as_of_ms: int | None = None
    ) -> DataFrame:
        """Scan the table; time travel via snapshot_id (VERSION AS OF) or
        as_of_ms (FOR SYSTEM_TIME AS OF) — ref: api.py:151-168, #cell-45."""
        snap = self._select_snapshot(snapshot_id, as_of_ms)
        if snap is None:
            return self.spark.createDataFrame([], self.spark_schema())
        entries = [e for e in snap["manifest"] if e["rows"] > 0]
        if not entries:
            return self.spark.createDataFrame([], self.spark_schema())
        # each manifest entry is its own directory root (possibly with
        # partition subdirs), so read per-entry and union — mixing roots in
        # one read() call trips CONFLICTING_DIRECTORY_STRUCTURES
        parts = [self._read_entry(e) for e in entries]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _read_entry(self, entry: dict) -> DataFrame:
        """Scan one manifest entry mapped to the CURRENT schema by field id."""
        df = self.spark.read.parquet(os.path.join(self.location, entry["path"]))
        written = {f.id: f for f in self._schema_by_id(entry["schema_id"])}
        cols = []
        for f in self.current_schema:
            if f.id in written and written[f.id].name in df.columns:
                cols.append(F.col(written[f.id].name).cast(f.type).alias(f.name))
            else:
                # column added after these files were written (or re-added
                # under a new field id): null-fill, exactly like Iceberg
                cols.append(F.lit(None).cast(f.type).alias(f.name))
        return df.select(*cols)

    def _select_snapshot(
        self, snapshot_id: int | None = None, as_of_ms: int | None = None
    ) -> dict | None:
        snaps = self._meta["snapshots"]
        if snapshot_id is not None:
            for s in snaps:
                if s["snapshot_id"] == snapshot_id:
                    return s
            raise KeyError(f"snapshot {snapshot_id} not found")
        if as_of_ms is not None:
            eligible = [s for s in snaps if s["timestamp_ms"] <= as_of_ms]
            if not eligible:
                return None
            return max(eligible, key=lambda s: s["timestamp_ms"])
        sid = self._meta["current_snapshot_id"]
        return self._select_snapshot(sid) if sid is not None else None

    # ------------------------------------------------------------------
    # row-level DML (copy-on-write)
    # ------------------------------------------------------------------

    def _cow_rewrite(
        self,
        condition: Column,
        rewrite,
        operation: str,
        now_ms: int | None = None,
    ) -> None:
        """File-pruned copy-on-write: manifest entries with NO matching rows
        are carried into the new snapshot untouched; only touched files are
        rewritten (Iceberg's CoW file pruning). The probe per entry is a
        pushdown-backed existence scan — row-group min/max skipping makes it
        a metadata read when the predicate misses; a production build would
        use manifest-level column stats instead of probing."""
        snap = self._select_snapshot()
        if snap is None:
            return  # empty table: nothing to do
        match = F.coalesce(condition, F.lit(False))
        kept_entries: list[dict] = []
        touched: list[dict] = []
        for entry in snap["manifest"]:
            if entry["rows"] == 0:
                continue
            if self._read_entry(entry).filter(match).limit(1).count() == 0:
                kept_entries.append(entry)
            else:
                touched.append(entry)
        if not touched:
            return  # no rows match: no new snapshot (Iceberg does the same)
        df = self._read_entry(touched[0])
        for e in touched[1:]:
            df = df.unionByName(self._read_entry(e))
        sid = len(self._meta["snapshots"]) + 1
        manifest = kept_entries + self._write_data_files(rewrite(df, match), sid)
        self._commit_snapshot(operation, manifest, now_ms)

    def delete(self, condition: Column | str, now_ms: int | None = None) -> None:
        """DELETE FROM t WHERE cond (ref: #cell-11). File-pruned copy-on-
        write: untouched files survive by reference; Iceberg's merge-on-read
        positional deletes are a storage-level optimization with identical
        query semantics."""
        cond = F.expr(condition) if isinstance(condition, str) else condition
        self._cow_rewrite(
            cond, lambda df, match: df.filter(~match), "delete", now_ms
        )

    def update(
        self,
        assignments: dict[str, Column | str],
        condition: Column | str | None = None,
        now_ms: int | None = None,
    ) -> None:
        """UPDATE t SET ... WHERE cond (ref: #cell-19/24); file-pruned CoW
        like delete()."""
        cond = (
            F.expr(condition)
            if isinstance(condition, str)
            else (condition if condition is not None else F.lit(True))
        )
        assigns = {
            col: (F.expr(v) if isinstance(v, str) else v) for col, v in assignments.items()
        }
        out_cols = list(self.columns)

        def rewrite(df: DataFrame, match: Column) -> DataFrame:
            # one select so every RHS and the predicate see ORIGINAL row
            # values (SQL UPDATE semantics), regardless of assignment order
            return df.select(
                *[
                    F.when(match, assigns[c]).otherwise(F.col(c)).alias(c)
                    if c in assigns
                    else F.col(c)
                    for c in out_cols
                ]
            )

        self._cow_rewrite(cond, rewrite, "update", now_ms)

    def merge(
        self,
        source: DataFrame,
        on: str,
        when_matched_update: dict[str, str] | None = None,
        when_not_matched_insert: bool = True,
        when_matched_delete: Column | str | None = None,
        now_ms: int | None = None,
    ) -> None:
        """MERGE INTO target USING source ON target.<on> = source.<on>
        (ref: SURVEY.md §2A M3 — configured but never executed in the
        reference; implemented for capability parity).

        Spark-first plan: one full-outer join between target and source on
        the key, then per-row CASE logic — a single shuffle on the merge key.
        """
        target = self.read()
        cols = self.columns
        src = source.select(*cols)
        # SQL-standard MERGE semantics: more than one source row matching a
        # target row is an error (Iceberg raises the same), otherwise the
        # full-outer join below would silently duplicate target rows
        dup = src.groupBy(on).count().filter(F.col("count") > 1).limit(1).collect()
        if dup:
            raise ValueError(
                f"MERGE source has multiple rows for key {on}={dup[0][0]!r}"
            )
        t = target.alias("t")
        s = src.alias("s")
        joined = t.join(s, F.col(f"t.{on}") == F.col(f"s.{on}"), "full_outer")
        matched = F.col(f"t.{on}").isNotNull() & F.col(f"s.{on}").isNotNull()
        out_cols = []
        delete_cond = (
            F.expr(when_matched_delete)
            if isinstance(when_matched_delete, str)
            else when_matched_delete
        )
        for c in cols:
            tcol, scol = F.col(f"t.{c}"), F.col(f"s.{c}")
            if when_matched_update and c in when_matched_update:
                upd = F.expr(when_matched_update[c])
            else:
                upd = tcol
            expr = (
                F.when(matched, upd)
                .when(F.col(f"t.{on}").isNotNull(), tcol)  # target-only row
                .otherwise(scol)  # source-only row -> insert
            )
            out_cols.append(expr.alias(c))
        base = joined
        if delete_cond is not None:
            base = base.filter(~(matched & F.coalesce(delete_cond, F.lit(False))))
        if not when_not_matched_insert:
            base = base.filter(F.col(f"t.{on}").isNotNull())
        self.overwrite(base.select(*out_cols), now_ms=now_ms, operation="merge")

    # ------------------------------------------------------------------
    # schema evolution (field-id based — ref: api.py:170-215)
    # ------------------------------------------------------------------

    def _evolve(self, new_fields: list[_Field]) -> None:
        meta = json.loads(json.dumps(self._meta))
        new_id = meta["current_schema_id"] + 1
        meta["schemas"].append(
            {"schema_id": new_id, "fields": [f.to_json() for f in new_fields]}
        )
        meta["current_schema_id"] = new_id
        meta["last_field_id"] = max(
            meta["last_field_id"], max((f.id for f in new_fields), default=0)
        )
        self._commit(meta)

    @property
    def properties(self) -> dict[str, str]:
        return dict(self._meta.get("properties", {}))

    def set_properties(self, props: dict[str, str]) -> None:
        """ALTER TABLE SET TBLPROPERTIES (ref: #cell-18 (json:557))."""
        meta = json.loads(json.dumps(self._meta))
        meta.setdefault("properties", {}).update(props)
        self._commit(meta)

    def add_column(self, name: str, ddl_type: str) -> None:
        """ALTER TABLE ADD COLUMN (ref: api.py:92-102). A re-added name gets
        a NEW field id (ref: iceberg_db/test v8 metadata — id 4 absent)."""
        if name in self.columns:
            raise ValueError(f"column {name} already exists")
        fields = self.current_schema + [
            _Field(id=self._meta["last_field_id"] + 1, name=name, type=ddl_type)
        ]
        self._evolve(fields)

    def drop_column(self, name: str) -> None:
        """ALTER TABLE DROP COLUMN (ref: api.py:120-130)."""
        if name not in self.columns:
            raise ValueError(f"column {name} does not exist")
        self._evolve([f for f in self.current_schema if f.name != name])

    # Iceberg's safe type promotions (spec v2): int->long, float->double,
    # decimal scale-preserving precision widening (not modeled here).
    _WIDENINGS = {("int", "bigint"), ("float", "double")}

    def change_column_type(self, name: str, new_type: str) -> None:
        """ALTER TABLE ALTER COLUMN TYPE — only Iceberg-safe widenings
        (int->bigint, float->double): existing files keep their narrow
        physical type and widen at read time via the per-entry cast."""
        field = next((f for f in self.current_schema if f.name == name), None)
        if field is None:
            raise ValueError(f"column {name} does not exist")
        if field.type != new_type and (field.type, new_type) not in self._WIDENINGS:
            raise ValueError(
                f"unsafe type change {field.type} -> {new_type}; allowed: "
                f"{sorted(self._WIDENINGS)}"
            )
        fields = [
            _Field(id=f.id, name=f.name, type=new_type if f.name == name else f.type)
            for f in self.current_schema
        ]
        self._evolve(fields)

    def rename_column(self, old: str, new: str) -> None:
        """ALTER TABLE RENAME COLUMN (ref: api.py:351-363): same field id,
        new name — historical data files keep working via id mapping."""
        if old not in self.columns:
            raise ValueError(f"column {old} does not exist")
        fields = [
            _Field(id=f.id, name=new if f.name == old else f.name, type=f.type)
            for f in self.current_schema
        ]
        self._evolve(fields)

    def resolve_column(self, name: str) -> str | None:
        """Resolve a (possibly historical) column name to its CURRENT name via
        field ids — the reference's signature operator (ref: api.py:187-204;
        SURVEY.md §2A P4). Searches schema history newest-first so a reused
        name resolves to its most recent binding; returns None if unknown."""
        current = {f.id: f.name for f in self.current_schema}
        if name in current.values():
            return name
        for s in sorted(self._meta["schemas"], key=lambda s: -s["schema_id"]):
            for f in s["fields"]:
                if f["name"] == name and f["id"] in current:
                    return current[f["id"]]
        return None

    def select_by_history(self, *names: str) -> DataFrame:
        """Project columns referenced by ANY historical name (ref: the
        GET /<table>/<column> endpoint surviving renames, api.py:170-215)."""
        resolved = []
        for n in names:
            r = self.resolve_column(n)
            if r is None:
                raise KeyError(f"column {n} not found in any schema version")
            resolved.append(r)
        return self.read().select(*resolved)

    # ------------------------------------------------------------------
    # metadata tables (ref: SURVEY.md §2A T3-T6)
    # ------------------------------------------------------------------

    def snapshots(self) -> DataFrame:
        rows = [
            (
                s["snapshot_id"],
                s["parent_id"],
                s["timestamp_ms"],
                s["operation"],
                s["summary"]["total-records"],
            )
            for s in self._meta["snapshots"]
        ]
        return self.spark.createDataFrame(
            rows, "snapshot_id BIGINT, parent_id BIGINT, timestamp_ms BIGINT, "
            "operation STRING, total_records BIGINT"
        )

    def history(self) -> DataFrame:
        cur = self._meta["current_snapshot_id"]
        ancestors = set()
        by_id = {s["snapshot_id"]: s for s in self._meta["snapshots"]}
        sid = cur
        while sid is not None:
            ancestors.add(sid)
            sid = by_id[sid]["parent_id"]
        rows = [
            (s["timestamp_ms"], s["snapshot_id"], s["parent_id"], s["snapshot_id"] in ancestors)
            for s in self._meta["snapshots"]
        ]
        return self.spark.createDataFrame(
            rows,
            "made_current_at BIGINT, snapshot_id BIGINT, parent_id BIGINT, "
            "is_current_ancestor BOOLEAN",
        )

    def metadata_log_entries(self) -> DataFrame:
        rows = [
            (e["version"], e["file"], e["timestamp_ms"])
            for e in self._meta.get("metadata_log", [])
        ] + [(self._meta["version"], f"v{self._meta['version']}.metadata.json", self._meta["timestamp_ms"])]
        return self.spark.createDataFrame(
            rows, "version INT, file STRING, timestamp_ms BIGINT"
        )

    def refs(self) -> DataFrame:
        rows = [
            (name, r.get("type", "branch"), r["snapshot_id"])
            for name, r in self._meta["refs"].items()
        ]
        return self.spark.createDataFrame(rows, "name STRING, type STRING, snapshot_id BIGINT")

    def create_ref(self, name: str, ref_type: str = "tag", snapshot_id: int | None = None) -> None:
        """Create a named branch/tag pointing at a snapshot (ref: #cell-44
        .refs metadata table)."""
        sid = snapshot_id if snapshot_id is not None else self._meta["current_snapshot_id"]
        if sid is None:
            raise ValueError("table has no snapshots to reference")
        self._select_snapshot(sid)  # validates existence
        meta = json.loads(json.dumps(self._meta))
        meta.setdefault("refs", {})[name] = {"snapshot_id": sid, "type": ref_type}
        self._commit(meta)

    def read_ref(self, name: str) -> DataFrame:
        """Scan the snapshot a branch/tag points at."""
        ref = self._meta["refs"].get(name)
        if ref is None:
            raise KeyError(f"ref {name} does not exist")
        return self.read(snapshot_id=ref["snapshot_id"])

    # ------------------------------------------------------------------
    # table maintenance (the 100 TB operational story: Iceberg's
    # rewrite_data_files / expire_snapshots as engine-native methods)
    # ------------------------------------------------------------------

    def compact(self, target_partitions: int | None = None, now_ms: int | None = None) -> None:
        """Bin-pack the current snapshot's data files into ``target_partitions``
        well-sized files (Iceberg's rewrite_data_files). Logically a no-op:
        same rows, new layout, new 'replace' snapshot — historical snapshots
        keep their old files for time travel."""
        df = self.read()
        if target_partitions:
            df = df.repartition(target_partitions)
        self.overwrite(df, now_ms=now_ms, operation="replace")

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots and delete data
        directories no surviving snapshot references (Iceberg's
        expire_snapshots). Returns the expired snapshot ids."""
        import shutil

        snaps = self._meta["snapshots"]
        if len(snaps) <= keep_last:
            return []
        keep = snaps[-keep_last:]
        expired = snaps[:-keep_last]
        live_paths = {e["path"] for s in keep for e in s["manifest"]}
        # named refs pin their snapshots' files too
        by_id = {s["snapshot_id"]: s for s in snaps}
        kept_ids = {s["snapshot_id"] for s in keep}
        for ref in self._meta.get("refs", {}).values():
            snap = by_id.get(ref["snapshot_id"])
            if snap is not None and ref["snapshot_id"] not in kept_ids:
                keep = [snap] + keep
                kept_ids.add(ref["snapshot_id"])
                live_paths |= {e["path"] for e in snap["manifest"]}
        expired = [s for s in snaps if s["snapshot_id"] not in kept_ids]
        dead_paths = {
            e["path"] for s in expired for e in s["manifest"]
        } - live_paths
        meta = json.loads(json.dumps(self._meta))
        meta["snapshots"] = [s for s in snaps if s["snapshot_id"] in kept_ids]
        self._commit(meta)
        for rel in sorted(dead_paths):
            shutil.rmtree(os.path.join(self.location, rel), ignore_errors=True)
        return sorted(s["snapshot_id"] for s in expired)

    def remove_orphan_files(self) -> list[str]:
        """Delete data directories no snapshot references (Iceberg's
        remove_orphan_files): failed/partial writes and dirs left behind by
        external tools. Never touches referenced data."""
        import shutil

        live = {
            e["path"]
            for s in self._meta["snapshots"]
            for e in s["manifest"]
        }
        data_dir = os.path.join(self.location, "data")
        removed = []
        for d in sorted(os.listdir(data_dir)):
            rel = f"data/{d}"
            if rel not in live:
                shutil.rmtree(os.path.join(data_dir, d), ignore_errors=True)
                removed.append(rel)
        return removed

    # ------------------------------------------------------------------
    # changelog (ref: SURVEY.md §2A T7 create_changelog_view)
    # ------------------------------------------------------------------

    def changelog(
        self, from_snapshot: int | None = None, to_snapshot: int | None = None
    ) -> DataFrame:
        """Row-level diff between two snapshots, tagged with _change_type in
        {'INSERT','DELETE'} (an UPDATE appears as DELETE+INSERT, matching
        Iceberg's changelog view for copy-on-write tables)."""
        before = (
            self.read(snapshot_id=from_snapshot)
            if from_snapshot is not None
            else self.spark.createDataFrame([], self.spark_schema())
        )
        after = self.read(snapshot_id=to_snapshot)  # None -> current
        inserts = after.exceptAll(before).withColumn("_change_type", F.lit("INSERT"))
        deletes = before.exceptAll(after).withColumn("_change_type", F.lit("DELETE"))
        return inserts.unionByName(deletes)


def _now_ms() -> int:
    return int(time.time() * 1000)
