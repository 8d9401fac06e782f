"""SQL-string front-end for VersionedTable time travel and DML.

The reference drives these features as SQL, not API calls — time travel via
``SELECT ... FOR SYSTEM_TIME AS OF ...`` / ``VERSION AS OF`` (ref:
api.py:151-168, Pyspark_Notebook.ipynb#cell-45 (json:1349)) and row DML via
``UPDATE``/``DELETE`` statements (ref: #cell-19 (json:586)).  The engine's
capability lives in VersionedTable; this module closes the SURFACE gap: a
small parser routes the statement forms to the table API and delegates
everything else verbatim to ``spark.sql``.

Grammar (case-insensitive keywords):

    SELECT ... FROM <table> FOR SYSTEM_TIME AS OF {'ts' | <epoch_ms>} ...
    SELECT ... FROM <table> [FOR] {TIMESTAMP | VERSION} AS OF {...} ...
    UPDATE <table> SET col = expr [, ...] [WHERE <cond>]
    DELETE FROM <table> [WHERE <cond>]
        -- on a merge-on-read table, `WHERE k IN (lit, ...)` / `k = lit`
        -- routes to EQUALITY-delete files (delete_by_key): O(keys), no
        -- table scan.  NULL literals / other shapes use the generic path.
    MERGE INTO <table> USING <view> ON {key | t.key = s.key}
        [WHEN MATCHED [AND cond] THEN {UPDATE SET col = expr, ... | DELETE}]
        [WHEN NOT MATCHED THEN INSERT *]
    -- inside MERGE expressions, `t` aliases the target and `s` the source
    INSERT INTO <table> {VALUES (...), (...) | SELECT ...}
    CREATE TABLE [IF NOT EXISTS] <table> (col TYPE, ...)
        [USING iceberg] [PARTITIONED BY (day(col))]
        [TBLPROPERTIES ('k'='v', ...)]          -- needs a Catalog
    CREATE TABLE <table> [USING ...] [PARTITIONED BY (day(col))]
        [TBLPROPERTIES (...)] AS SELECT ...     -- CTAS, needs a Catalog
    [CREATE OR] REPLACE TABLE <table> [PARTITIONED BY (day(col))]
        [TBLPROPERTIES (...)] AS SELECT ...     -- RTAS (history-preserving)
        -- DEVIATION from Iceberg RTAS: omitting PARTITIONED BY PRESERVES
        -- the existing partition spec (Iceberg replaces it with unpartit-
        -- ioned), and a schema-changing SELECT is REJECTED rather than
        -- replacing the schema — replacement here is content-only, so
        -- time travel across the replace keeps resolving by field id.
        -- Port reference notebooks accordingly.
    DROP TABLE [IF EXISTS] <table>              -- needs a Catalog
    CREATE {DATABASE | SCHEMA | NAMESPACE} [IF NOT EXISTS] <db>
    SHOW TABLES [{IN | FROM} <db>]              -- needs a Catalog
    SHOW {DATABASES | NAMESPACES | SCHEMAS}     -- needs a Catalog
    DESC[RIBE] [TABLE] [EXTENDED] <table>       -- versioned tables only
    USE <db>                                    -- catalog-known dbs only
    ALTER TABLE <table> ADD COLUMN[S] [(]col TYPE [, ...][)]
    ALTER TABLE <table> DROP COLUMN col
    ALTER TABLE <table> RENAME COLUMN old TO new
    ALTER TABLE <table> SET TBLPROPERTIES ('k'='v', ...)
    ALTER TABLE <table> ADD PARTITION FIELD day(col)
    ALTER TABLE <table> DROP PARTITION FIELD [day(col)]

DDL references: CREATE TABLE ... PARTITIONED BY (day(added_at))
(`Pyspark_Notebook.ipynb#cell-7 (json:196)`), INSERT INTO ... VALUES
(`#cell-11 (json:329)`, the notebook's most-used write), ALTER TABLE
ADD/DROP/RENAME COLUMN (api.py:92-130, 351-363, `#cell-28/29`), ALTER
TABLE SET TBLPROPERTIES (`#cell-18 (json:557)`).

Time-travel SELECTs rewrite the travel clause to a temp view over
``VersionedTable.read(snapshot_id=/as_of_ms=)`` and hand the query to
Catalyst — so projections/filters/joins around the clause keep full
optimizer support (this is exactly how Spark's own ``VERSION AS OF``
resolves against a data source: pin the snapshot, then plan normally).
Expressions in SET/WHERE are parsed by Spark (``F.expr``), never by us.

Scale note: the front-end touches only statement TEXT; data movement is
whatever the underlying table operation does (file-pruned CoW or MoR
position deletes for DML, manifest-pinned scans for time travel).
"""

from __future__ import annotations

import re
import uuid
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.tablefmt.table import VersionedTable

_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*|`[^`]+`"
_SIMPLE_IDENT = r"[A-Za-z_][A-Za-z0-9_]*|`[^`]+`"

_TRAVEL = re.compile(
    rf"(?P<table>{_IDENT})\s+"
    r"(?:FOR\s+)?(?P<kind>SYSTEM_TIME|TIMESTAMP|VERSION)\s+AS\s+OF\s+"
    r"(?P<val>'[^']*'|\d+)",
    re.IGNORECASE,
)
_UPDATE = re.compile(
    rf"^\s*UPDATE\s+(?P<table>{_IDENT})\s+SET\s+(?P<rest>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE = re.compile(
    rf"^\s*DELETE\s+FROM\s+(?P<table>{_IDENT})"
    r"(?:\s+WHERE\s+(?P<where>.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE = re.compile(
    rf"^\s*MERGE\s+INTO\s+(?P<table>{_IDENT})\s+USING\s+(?P<source>{_IDENT})\s+"
    r"ON\s+(?P<on>.+?)\s+(?P<clauses>WHEN\s+.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_WHEN = re.compile(
    r"WHEN\s+(?P<not_>NOT\s+)?MATCHED(?:\s+AND\s+(?P<cond>.*?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+.*?|DELETE|INSERT\s+\*)\s*(?=WHEN\s|$)",
    re.IGNORECASE | re.DOTALL,
)
_INSERT = re.compile(
    rf"^\s*INSERT\s+INTO\s+(?:TABLE\s+)?(?P<table>{_IDENT})\s+"
    r"(?P<rest>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_HEAD = re.compile(
    rf"^\s*CREATE\s+TABLE\s+(?:(?P<ine>IF\s+NOT\s+EXISTS)\s+)?(?P<table>{_IDENT})\s*"
    r"(?P<rest>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_TABLE = re.compile(
    rf"^\s*DROP\s+TABLE\s+(?:(?P<ie>IF\s+EXISTS)\s+)?(?P<table>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_REPLACE_HEAD = re.compile(
    rf"^\s*(?:(?P<cor>CREATE\s+OR\s+)?REPLACE)\s+TABLE\s+(?P<table>{_IDENT})\s*"
    r"(?P<rest>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_DB = re.compile(
    r"^\s*CREATE\s+(?:DATABASE|SCHEMA|NAMESPACE)\s+"
    rf"(?:(?P<ine>IF\s+NOT\s+EXISTS)\s+)?(?P<db>{_SIMPLE_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_TABLES = re.compile(
    rf"^\s*SHOW\s+TABLES(?:\s+(?:IN|FROM)\s+(?P<db>{_SIMPLE_IDENT}))?\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_DBS = re.compile(
    r"^\s*SHOW\s+(?:DATABASES|NAMESPACES|SCHEMAS)\s*;?\s*$", re.IGNORECASE
)
_DESCRIBE = re.compile(
    rf"^\s*DESC(?:RIBE)?\s+(?:TABLE\s+)?(?P<ext>EXTENDED\s+)?(?P<table>{_IDENT})\s*;?\s*$",
    re.IGNORECASE,
)
_USE = re.compile(rf"^\s*USE\s+(?P<db>{_SIMPLE_IDENT})\s*;?\s*$", re.IGNORECASE)
_ALTER = re.compile(
    rf"^\s*ALTER\s+TABLE\s+(?P<table>{_IDENT})\s+(?P<rest>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_ADD = re.compile(r"^ADD\s+COLUMNS?\s+(?P<cols>.+)$", re.IGNORECASE | re.DOTALL)
_ALTER_DROP = re.compile(r"^DROP\s+COLUMN\s+(?P<col>.+?)\s*$", re.IGNORECASE)
_ALTER_RENAME = re.compile(
    r"^RENAME\s+COLUMN\s+(?P<old>.+?)\s+TO\s+(?P<new>.+?)\s*$", re.IGNORECASE
)
_ALTER_PROPS = re.compile(
    r"^SET\s+TBLPROPERTIES\s*\((?P<props>.*)\)\s*$", re.IGNORECASE | re.DOTALL
)
# Iceberg partition-spec evolution DDL (spec 'ALTER TABLE ... ADD/DROP
# PARTITION FIELD'): only the day() transform exists here, so DROP takes
# either the transform or nothing
_ALTER_ADD_PART = re.compile(
    r"^ADD\s+PARTITION\s+FIELD\s+days?\s*\(\s*(?P<col>[^)]+?)\s*\)\s*$",
    re.IGNORECASE,
)
_ALTER_DROP_PART = re.compile(
    r"^DROP\s+PARTITION\s+FIELD"
    r"(?:\s+days?\s*\(\s*(?P<col>[^)]+?)\s*\))?\s*$",
    re.IGNORECASE,
)
_PARTITIONED = re.compile(
    r"PARTITIONED\s+BY\s*\(\s*days?\s*\(\s*(?P<col>[^)]+?)\s*\)\s*\)", re.IGNORECASE
)
_TBLPROPS = re.compile(r"TBLPROPERTIES\s*\((?P<props>.*?)\)", re.IGNORECASE | re.DOTALL)
_PROP_PAIR = re.compile(r"'(?P<k>[^']*)'\s*=\s*'(?P<v>[^']*)'")
_MERGE_ON = re.compile(
    rf"^\s*(?:(?:{_SIMPLE_IDENT})\.)?(?P<a>{_SIMPLE_IDENT})\s*=\s*"
    rf"(?:(?:{_SIMPLE_IDENT})\.)?(?P<b>{_SIMPLE_IDENT})\s*$"
)
_MERGE_ON_BARE = re.compile(rf"^\s*(?P<a>{_SIMPLE_IDENT})\s*$")


def _unquote(ident: str) -> str:
    return ident[1:-1] if ident.startswith("`") else ident


# key-only DELETE predicates (round 6, VERDICT r5 #8): `k IN (lit, ...)` or
# `k = lit` route to the O(keys) equality-delete path when the table's
# delete mode is merge-on-read.  Literals only — a NULL in the list falls
# through to the generic path on purpose: SQL `IN (NULL)` never matches,
# while equality-delete files match null-safely, so routing it would
# change semantics.
_KEY_IN = re.compile(
    rf"^\s*(?P<col>{_SIMPLE_IDENT})\s+IN\s*\(\s*(?P<vals>[^()]+?)\s*\)\s*$",
    re.IGNORECASE,
)
_KEY_EQ = re.compile(
    rf"^\s*(?P<col>{_SIMPLE_IDENT})\s*=\s*(?P<val>'(?:[^']|'')*'|-?\d+(?:\.\d+)?)\s*$"
)
_IN_ITEM = re.compile(r"\s*(?:'(?P<s>(?:[^']|'')*)'|(?P<n>-?\d+(?:\.\d+)?))\s*(?P<sep>,|$)")


def _literal_value(s: str | None, n: str | None):
    if s is not None:
        return s.replace("''", "'")
    return float(n) if ("." in n or "e" in n or "E" in n) else int(n)


def _parse_key_only_delete(where: str) -> tuple[str, list] | None:
    """(column, values) when ``where`` is exactly `col IN (literals)` or
    `col = literal`; None for every other shape (generic delete path)."""
    m = _KEY_EQ.match(where)
    if m:
        lit = m.group("val")
        if lit.startswith("'"):
            return _unquote_col(m.group("col")), [lit[1:-1].replace("''", "'")]
        return _unquote_col(m.group("col")), [_literal_value(None, lit)]
    m = _KEY_IN.match(where)
    if not m:
        return None
    vals, pos, out = m.group("vals"), 0, []
    last_sep = None
    while pos < len(vals):
        item = _IN_ITEM.match(vals, pos)
        if not item or (item.group("s") is None and item.group("n") is None):
            return None  # NULL, expression, or malformed — generic path
        out.append(_literal_value(item.group("s"), item.group("n")))
        pos = item.end()
        last_sep = item.group("sep")
        if last_sep != "," and pos < len(vals):
            return None
    if last_sep == ",":
        return None  # trailing comma (`IN (1,)`) — malformed, generic path
    return (_unquote_col(m.group("col")), out) if out else None


def _unquote_col(col: str) -> str:
    return _unquote(col.strip())


def _parse_props(text: str) -> dict[str, str]:
    """TBLPROPERTIES body: 'k'='v' pairs (the only form the reference
    uses, ref: #cell-18/21)."""
    return {p.group("k"): p.group("v") for p in _PROP_PAIR.finditer(text)}


def _parse_as_of_ms(val: str) -> int:
    """'YYYY-MM-DD[ HH:MM:SS[.ffffff]]' (UTC) or bare epoch-milliseconds."""
    if not val.startswith("'"):
        return int(val)
    text = val[1:-1].strip()
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            dt = datetime.strptime(text, fmt).replace(tzinfo=timezone.utc)
            return int(dt.timestamp() * 1000)
        except ValueError:
            continue
    raise ValueError(f"cannot parse time-travel timestamp {val}")


def _scan_step(text: str, i: int, depth: int, quote: str | None) -> tuple[int, int, str | None]:
    """Advance one scanner step over SQL text: tracks paren depth and
    quoted-literal state, honoring BOTH escape forms Spark accepts — the
    SQL-standard doubled quote (``'it''s'``) and backslash escapes
    (``'it\\'s'``). Returns (next_i, depth, quote)."""
    ch = text[i]
    if quote is not None:
        if ch == "\\":
            return i + 2, depth, quote  # backslash-escaped char stays inside
        if ch == quote:
            if i + 1 < len(text) and text[i + 1] == quote:
                return i + 2, depth, quote  # doubled quote: still inside
            return i + 1, depth, None
        return i + 1, depth, quote
    if ch in "'\"":
        return i + 1, depth, ch
    if ch in "([":
        return i + 1, depth + 1, None
    if ch in ")]":
        return i + 1, depth - 1, None
    return i + 1, depth, None


def _split_set_where(rest: str) -> tuple[str, str | None]:
    """Split an UPDATE's ``SET <assignments> [WHERE <cond>]`` tail at the
    first TOP-LEVEL ``WHERE`` keyword — not one inside a single- OR
    double-quoted literal (Spark treats both as strings) or parentheses,
    so ``SET s = 'x where y'`` / ``SET s = "x where y"`` parse correctly."""
    depth, quote, i = 0, None, 0
    while i < len(rest):
        if (
            quote is None
            and depth == 0
            and rest[i : i + 5].upper() == "WHERE"
            and (i == 0 or rest[i - 1].isspace())
            and (i + 5 == len(rest) or rest[i + 5].isspace())
        ):
            return rest[:i].rstrip(), rest[i + 5 :].strip()
        i, depth, quote = _scan_step(rest, i, depth, quote)
    return rest.rstrip(), None


def _split_top_level(body: str, sep: str = ",") -> list[str]:
    """Split on top-level ``sep`` (not inside parens or quoted literals,
    escape-aware)."""
    parts: list[str] = []
    depth, quote, start, i = 0, None, 0, 0
    while i < len(body):
        if quote is None and depth == 0 and body[i] == sep:
            parts.append(body[start:i])
            start = i + 1
            i += 1
            continue
        i, depth, quote = _scan_step(body, i, depth, quote)
    parts.append(body[start:])
    return parts


def _split_assignments(body: str) -> dict[str, str]:
    """Split ``a = e1, b = e2`` on top-level commas (not inside parens or
    single/double-quoted literals), then on the first top-level '='."""
    out: dict[str, str] = {}
    for part in _split_top_level(body):
        col, eq, expr = part.partition("=")
        if not eq:
            raise ValueError(f"malformed SET assignment: {part.strip()!r}")
        out[_unquote(col.strip())] = expr.strip()
    return out


class TableSQL:
    """Statement router: VersionedTable verbs handled natively, the rest
    delegated to ``spark.sql`` untouched.

    ``resolve`` maps a statement's table name to a VersionedTable (e.g.
    ``Catalog.table``); names that don't resolve fall through to Spark, so
    ordinary temp-view SQL keeps working through the same entry point.
    """

    def __init__(
        self,
        spark: SparkSession,
        resolve: Callable[[str], VersionedTable],
        catalog=None,
    ):
        self.spark = spark
        self._resolve = resolve
        self._catalog = catalog  # Catalog, for CREATE/DROP TABLE routing

    def _table(self, ident: str) -> VersionedTable | None:
        try:
            return self._resolve(_unquote(ident))
        except (KeyError, FileNotFoundError):
            return None

    def _route_eq_delete(self, vt: VersionedTable, where: str) -> bool:
        """DELETE FROM t WHERE k IN (...) / k = lit on a merge-on-read
        table routes to the O(keys) equality-delete path (delete_by_key):
        no table scan, just a key file applied at read time — the path a
        CDC-style keyed delete needs at 100 TB.  Copy-on-write tables keep
        the pruned-rewrite semantics their layout expects; any non-key or
        NULL-bearing predicate keeps the generic path.  Returns True when
        routed."""
        if vt._dml_mode("delete", None) != "merge-on-read":
            return False
        parsed = _parse_key_only_delete(where)
        if parsed is None:
            return False
        col, vals = parsed
        field = next((f for f in vt.current_schema if f.name == col), None)
        if field is None:
            return False  # unknown column: let the generic path error
        try:
            keys = self.spark.createDataFrame(
                [(v,) for v in vals], f"`{col}` {field.type}"
            )
        except (TypeError, ValueError):
            return False  # literal/type mismatch: generic path handles it
        vt.delete_by_key(keys, [col])
        return True

    def sql(self, statement: str) -> DataFrame | None:
        """Execute one statement. SELECTs return a DataFrame; DML/DDL
        commit and return None."""
        m = _UPDATE.match(statement)
        if m and (vt := self._table(m.group("table"))) is not None:
            body, where = _split_set_where(m.group("rest"))
            vt.update(_split_assignments(body), where)
            return None
        m = _DELETE.match(statement)
        if m and (vt := self._table(m.group("table"))) is not None:
            where = m.group("where")
            if where and self._route_eq_delete(vt, where):
                return None
            vt.delete(where if where else "true")
            return None
        m = _MERGE.match(statement)
        if m and (vt := self._table(m.group("table"))) is not None:
            self._merge(vt, m)
            return None
        m = _INSERT.match(statement)
        if m and (vt := self._table(m.group("table"))) is not None:
            self._insert(vt, m.group("rest"))
            return None
        m = _ALTER.match(statement)
        if m and (vt := self._table(m.group("table"))) is not None:
            self._alter(vt, m.group("rest"))
            return None
        m = _REPLACE_HEAD.match(statement)
        if m and (
            self._table(m.group("table")) is not None or self._catalog is not None
        ):
            # ours only if the name resolves or a catalog could create it;
            # otherwise fall through so Spark's own catalog handles it
            self._replace(m)
            return None
        m = _DESCRIBE.match(statement)
        if m and (vt := self._table(m.group("table"))) is not None:
            if self._catalog is None:
                raise ValueError("DESCRIBE on a versioned table needs a Catalog")
            return self._catalog.describe(
                _unquote(m.group("table")), extended=bool(m.group("ext"))
            )
        if self._catalog is not None:
            m = _CREATE_HEAD.match(statement)
            if m:
                self._create(m)
                return None
            m = _DROP_TABLE.match(statement)
            if m:
                name = _unquote(m.group("table"))
                if self._table(m.group("table")) is None and m.group("ie"):
                    return None
                self._catalog.drop_table(name)
                return None
            m = _CREATE_DB.match(statement)
            if m:
                self._catalog.create_database(
                    _unquote(m.group("db")), if_not_exists=bool(m.group("ine"))
                )
                return None
            m = _SHOW_TABLES.match(statement)
            if m:
                db = _unquote(m.group("db")) if m.group("db") else None
                return self.spark.createDataFrame(
                    [(db or self._catalog.current_database, t)
                     for t in self._catalog.tables(db)],
                    "namespace STRING, tableName STRING",
                )
            if _SHOW_DBS.match(statement):
                return self.spark.createDataFrame(
                    [(d,) for d in self._catalog.databases()], "namespace STRING"
                )
            m = _USE.match(statement)
            if m and _unquote(m.group("db")) in self._catalog.databases():
                self._catalog.use(_unquote(m.group("db")))
                return None
        return self.spark.sql(self._rewrite_time_travel(statement))

    # --- DDL / INSERT routing ---------------------------------------------

    def _insert(self, vt: VersionedTable, rest: str) -> None:
        """INSERT INTO t VALUES (...)[, ...] | INSERT INTO t SELECT ...
        (ref: #cell-11 (json:329)). Values/select evaluate through Spark
        SQL; columns bind BY POSITION and cast to the table schema."""
        if rest.upper().startswith("VALUES"):
            df = self.spark.sql(rest)  # an inline table is a valid query
        elif rest.upper().startswith("SELECT"):
            df = self.spark.sql(self._rewrite_time_travel(rest))
        else:
            # e.g. INSERT INTO t (a, b) VALUES ... — error loudly instead
            # of falling through to a confusing Spark table-not-found
            raise ValueError(
                f"INSERT INTO supports only VALUES/SELECT forms (got {rest[:40]!r})"
            )
        cols = vt.columns
        if len(df.columns) != len(cols):
            raise ValueError(
                f"INSERT provides {len(df.columns)} columns, table has {len(cols)}"
            )
        schema = {f.name: f.dataType for f in vt.spark_schema().fields}
        aligned = df.toDF(*cols).select(*[F.col(f"`{c}`").cast(schema[c]) for c in cols])
        vt.append(aligned)

    def _alter(self, vt: VersionedTable, rest: str) -> None:
        rest = rest.strip()
        if m := _ALTER_ADD.match(rest):
            cols = m.group("cols").strip()
            if cols.startswith("(") and cols.endswith(")"):
                cols = cols[1:-1]
            for item in _split_top_level(cols):
                item = item.strip()
                if item.startswith("`"):
                    end = item.index("`", 1)
                    name, ddl_type = item[1:end], item[end + 1 :].strip()
                else:
                    name, _, ddl_type = item.partition(" ")
                if not ddl_type.strip():
                    raise ValueError(f"ADD COLUMN needs 'name TYPE' (got {item!r})")
                vt.add_column(name, ddl_type.strip())
            return
        if m := _ALTER_DROP.match(rest):
            vt.drop_column(_unquote(m.group("col").strip()))
            return
        if m := _ALTER_RENAME.match(rest):
            vt.rename_column(
                _unquote(m.group("old").strip()), _unquote(m.group("new").strip())
            )
            return
        if m := _ALTER_PROPS.match(rest):
            vt.set_properties(_parse_props(m.group("props")))
            return
        if m := _ALTER_ADD_PART.match(rest):
            # Iceberg semantics: ADD adds a field — with single-field day()
            # specs, adding over an existing field must error (DROP first),
            # never silently replace it
            if vt._meta["partition_spec"]:
                spec = vt._meta["partition_spec"]
                # fall back to the recorded name when the source column was
                # dropped (field-id resolution returns None)
                cur = vt._spec_source_name(spec) or spec[0]["source_name"]
                raise ValueError(
                    f"table is already partitioned by day({cur}); "
                    "DROP PARTITION FIELD first"
                )
            vt.set_partition_spec(_unquote(m.group("col").strip()))
            return
        if m := _ALTER_DROP_PART.match(rest):
            spec = vt._meta["partition_spec"]
            if not spec:
                raise ValueError("table has no partition field to drop")
            cur = vt._spec_source_name(spec) or spec[0]["source_name"]
            named = m.group("col")
            if named is not None and _unquote(named.strip()) != cur:
                raise ValueError(
                    f"cannot find partition field day({_unquote(named.strip())}); "
                    f"the table is partitioned by day({cur})"
                )
            vt.set_partition_spec(None)
            return
        raise ValueError(f"unsupported ALTER TABLE form: {rest!r}")

    def _create(self, m: re.Match) -> None:
        """CREATE TABLE (col defs) / CTAS, with PARTITIONED BY (day(col))
        and TBLPROPERTIES (ref: #cell-7 (json:196), #cell-21 (json:665))."""
        from pyspark.sql import types as T

        name = _unquote(m.group("table"))
        rest = m.group("rest").strip()
        existing = self._table(m.group("table"))
        if existing is not None:
            if m.group("ine"):
                return
            raise ValueError(f"table {name} already exists")
        cols_ddl = None
        if rest.startswith("("):
            # depth-scan to the matching ')' — column types may nest parens
            depth, quote, i, end = 0, None, 0, None
            while i < len(rest):
                if quote is None and depth == 1 and rest[i] == ")":
                    end = i
                    break
                i, depth, quote = _scan_step(rest, i, depth, quote)
            if end is None:
                raise ValueError("unbalanced column list in CREATE TABLE")
            cols_ddl, rest = rest[1:end], rest[end + 1 :].strip()
        ctas = re.search(r"\bAS\s+(?P<select>SELECT\s+.+)$", rest, re.IGNORECASE | re.DOTALL)
        clauses = rest[: ctas.start()] if ctas else rest
        pday = _PARTITIONED.search(clauses)
        props_m = _TBLPROPS.search(clauses)
        if cols_ddl is None and ctas is None:
            raise ValueError("CREATE TABLE needs a column list or AS SELECT")
        self._catalog.create_table(
            name,
            df=(
                self.spark.sql(self._rewrite_time_travel(ctas.group("select")))
                if ctas
                else None
            ),
            schema=T.StructType.fromDDL(cols_ddl) if cols_ddl is not None else None,
            partition_day=_unquote(pday.group("col").strip()) if pday else None,
            properties=_parse_props(props_m.group("props")) if props_m else None,
        )

    def _replace(self, m: re.Match) -> None:
        """[CREATE OR] REPLACE TABLE <t> [PARTITIONED BY (day(col))]
        [TBLPROPERTIES (...)] AS SELECT ... (ref: Pyspark_Notebook.ipynb
        #cell-13 (json:409), the reference's RTAS). Routes to
        ``VersionedTable.overwrite`` — a full rewrite committed as a new
        snapshot, so table HISTORY (time travel, changelog) survives the
        replace; bare REPLACE errors if the table does not exist, CREATE OR
        REPLACE creates it (needs a Catalog)."""
        name = _unquote(m.group("table"))
        rest = m.group("rest").strip()
        ctas = re.search(r"\bAS\s+(?P<select>SELECT\s+.+)$", rest, re.IGNORECASE | re.DOTALL)
        if ctas is None:
            raise ValueError("REPLACE TABLE requires an AS SELECT clause")
        clauses = rest[: ctas.start()]
        pday = _PARTITIONED.search(clauses)
        props_m = _TBLPROPS.search(clauses)
        df = self.spark.sql(self._rewrite_time_travel(ctas.group("select")))
        vt = self._table(m.group("table"))
        if vt is None:
            if not m.group("cor"):
                raise ValueError(
                    f"REPLACE TABLE: {name} does not exist "
                    "(use CREATE OR REPLACE to create it)"
                )
            if self._catalog is None:
                raise ValueError("CREATE OR REPLACE TABLE needs a Catalog")
            self._catalog.create_table(
                name,
                df=df,
                partition_day=_unquote(pday.group("col").strip()) if pday else None,
                properties=_parse_props(props_m.group("props")) if props_m else None,
            )
            return
        if pday is not None:
            # compare against the FIELD-ID-resolved current name, not the
            # creation-time source_name, so a renamed partition column
            # matches its current name (and only that)
            current_day = (
                [vt._spec_source_name(vt._meta["partition_spec"])]
                if vt._meta["partition_spec"]
                else []
            )
            if [_unquote(pday.group("col").strip())] != current_day:
                raise ValueError(
                    "REPLACE TABLE cannot change the partition spec "
                    f"(current: day({current_day}), requested: {pday.group(0)!r}); "
                    "DROP + CREATE for a new layout"
                )
        cols = vt.columns
        schema = {f.name: f.dataType for f in vt.spark_schema().fields}
        if set(df.columns) == set(cols):
            aligned = df.select(*[F.col(f"`{c}`").cast(schema[c]) for c in cols])
        elif len(df.columns) == len(cols):
            aligned = df.toDF(*cols).select(
                *[F.col(f"`{c}`").cast(schema[c]) for c in cols]
            )
        else:
            raise ValueError(
                f"REPLACE TABLE AS SELECT provides {len(df.columns)} columns, "
                f"table has {len(cols)} — schema-changing replace is not "
                "supported; evolve with ALTER TABLE or DROP + CREATE"
            )
        vt.overwrite(aligned)
        if props_m:
            vt.set_properties(_parse_props(props_m.group("props")))

    def _merge(self, vt: VersionedTable, m: re.Match) -> None:
        on_m = _MERGE_ON.match(m.group("on")) or _MERGE_ON_BARE.match(m.group("on"))
        if on_m is None or (
            "b" in on_m.groupdict()
            and on_m.groupdict().get("b") is not None
            and _unquote(on_m.group("a")) != _unquote(on_m.group("b"))
        ):
            raise ValueError(
                f"MERGE ON must be a single equality on one key column "
                f"(got {m.group('on')!r})"
            )
        key = _unquote(on_m.group("a"))
        update: dict[str, str] | None = None
        update_cond: str | None = None
        update_first = False
        delete_cond: str | None = None
        insert = False
        matched_seen = False
        # STRICT clause coverage: any WHEN-clause text the grammar does not
        # recognize (INSERT with a column list, WHEN NOT MATCHED BY SOURCE,
        # a malformed action, ...) must be an ERROR, not silently skipped —
        # finditer alone would just not match it and part of the statement
        # would simply not happen.
        clauses_text = m.group("clauses")
        prev_end = 0
        spans = list(_MERGE_WHEN.finditer(clauses_text))
        for w in spans:
            gap = clauses_text[prev_end : w.start()]
            if gap.strip():
                raise ValueError(f"unsupported MERGE clause text: {gap.strip()!r}")
            prev_end = w.end()
        if clauses_text[prev_end:].strip():
            raise ValueError(
                f"unsupported MERGE clause text: {clauses_text[prev_end:].strip()!r}"
            )
        for w in spans:
            action = w.group("action").strip()
            if w.group("not_"):
                if not action.upper().startswith("INSERT"):
                    raise ValueError("WHEN NOT MATCHED supports only INSERT *")
                if w.group("cond"):
                    raise ValueError(
                        "conditional WHEN NOT MATCHED (AND ...) is not supported — "
                        "a condition here would otherwise be silently ignored"
                    )
                insert = True
                continue
            matched_seen = True
            if action.upper().startswith("UPDATE"):
                if update is not None:
                    raise ValueError("MERGE supports one WHEN MATCHED ... UPDATE clause")
                update = _split_assignments(re.sub(r"(?i)^UPDATE\s+SET\s+", "", action))
                update_cond = w.group("cond").strip() if w.group("cond") else None
                update_first = delete_cond is None
                if update_cond:
                    # conditional matched-update: rows matching the key but
                    # not the condition keep their target values
                    update = {
                        col: f"CASE WHEN ({update_cond}) THEN ({expr}) ELSE t.`{col}` END"
                        for col, expr in update.items()
                    }
            else:  # DELETE
                if delete_cond is not None:
                    raise ValueError("MERGE supports one WHEN MATCHED ... DELETE clause")
                delete_cond = w.group("cond") or "true"
        # SQL evaluates WHEN MATCHED clauses IN ORDER, first match wins per
        # row. merge() applies delete before update, which natively models
        # DELETE-before-UPDATE; for UPDATE-before-DELETE the delete must
        # exclude rows the update clause already claimed.
        if update is not None and delete_cond is not None and update_first:
            if update_cond is None:
                raise ValueError(
                    "WHEN MATCHED ... DELETE after an unconditional UPDATE "
                    "clause is unreachable"
                )
            delete_cond = f"({delete_cond}) AND NOT ({update_cond})"
        if not (matched_seen or insert):
            raise ValueError("MERGE needs at least one WHEN clause")
        vt.merge(
            self.spark.table(_unquote(m.group("source"))),
            on=key,
            when_matched_update=update,
            when_not_matched_insert=insert,
            when_matched_delete=delete_cond,
        )

    def _rewrite_time_travel(self, statement: str) -> str:
        """Replace every ``<table> [FOR] <kind> AS OF <val>`` clause with a
        temp view pinned to the selected snapshot."""

        def repl(m: re.Match) -> str:
            vt = self._table(m.group("table"))
            if vt is None:
                return m.group(0)  # not ours — let Spark error or resolve it
            kind = m.group("kind").upper()
            if kind == "VERSION":
                df = vt.read(snapshot_id=int(m.group("val").strip("'")))
            else:
                df = vt.read(as_of_ms=_parse_as_of_ms(m.group("val")))
            # deterministic name per (table, travel target): repeated travel
            # queries REPLACE their view instead of leaking one per statement
            tag = uuid.uuid5(
                uuid.NAMESPACE_URL, f"{vt.location}|{kind}|{m.group('val')}"
            ).hex[:12]
            view = f"_asof_{_unquote(m.group('table')).replace('.', '_')}_{tag}"
            df.createOrReplaceTempView(view)
            return view

        return _TRAVEL.sub(repl, statement)
