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
    MERGE INTO <table> USING <view> ON {key | t.key = s.key}
        [WHEN MATCHED [AND cond] THEN {UPDATE SET col = expr, ... | DELETE}]
        [WHEN NOT MATCHED THEN INSERT *]
    -- inside MERGE expressions, `t` aliases the target and `s` the source

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

from thesis_iceberg_spark.tablefmt.table import VersionedTable

_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*|`[^`]+`"

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
_SIMPLE_IDENT = r"[A-Za-z_][A-Za-z0-9_]*|`[^`]+`"
_MERGE_ON = re.compile(
    rf"^\s*(?:(?:{_SIMPLE_IDENT})\.)?(?P<a>{_SIMPLE_IDENT})\s*=\s*"
    rf"(?:(?:{_SIMPLE_IDENT})\.)?(?P<b>{_SIMPLE_IDENT})\s*$"
)
_MERGE_ON_BARE = re.compile(rf"^\s*(?P<a>{_SIMPLE_IDENT})\s*$")


def _unquote(ident: str) -> str:
    return ident[1:-1] if ident.startswith("`") else ident


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


def _split_set_where(rest: str) -> tuple[str, str | None]:
    """Split an UPDATE's ``SET <assignments> [WHERE <cond>]`` tail at the
    first TOP-LEVEL ``WHERE`` keyword — not one inside a single- OR
    double-quoted literal (Spark treats both as strings) or parentheses,
    so ``SET s = 'x where y'`` / ``SET s = "x where y"`` parse correctly."""
    depth, quote, i = 0, None, 0
    while i < len(rest):
        ch = rest[i]
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif (
            depth == 0
            and rest[i : i + 5].upper() == "WHERE"
            and (i == 0 or rest[i - 1].isspace())
            and (i + 5 == len(rest) or rest[i + 5].isspace())
        ):
            return rest[:i].rstrip(), rest[i + 5 :].strip()
        i += 1
    return rest.rstrip(), None


def _split_assignments(body: str) -> dict[str, str]:
    """Split ``a = e1, b = e2`` on top-level commas (not inside parens or
    single/double-quoted literals), then on the first top-level '='."""
    parts: list[str] = []
    depth, quote, start = 0, None, 0
    for i, ch in enumerate(body):
        if quote is not None:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    out: dict[str, str] = {}
    for part in parts:
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
        self, spark: SparkSession, resolve: Callable[[str], VersionedTable]
    ):
        self.spark = spark
        self._resolve = resolve

    def _table(self, ident: str) -> VersionedTable | None:
        try:
            return self._resolve(_unquote(ident))
        except (KeyError, FileNotFoundError):
            return None

    def sql(self, statement: str) -> DataFrame | None:
        """Execute one statement. SELECTs return a DataFrame; UPDATE/DELETE
        commit a snapshot and return None."""
        m = _UPDATE.match(statement)
        if m and (vt := self._table(m.group("table"))) is not None:
            body, where = _split_set_where(m.group("rest"))
            vt.update(_split_assignments(body), where)
            return None
        m = _DELETE.match(statement)
        if m and (vt := self._table(m.group("table"))) is not None:
            vt.delete(m.group("where") if m.group("where") else "true")
            return None
        m = _MERGE.match(statement)
        if m and (vt := self._table(m.group("table"))) is not None:
            self._merge(vt, m)
            return None
        return self.spark.sql(self._rewrite_time_travel(statement))

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
        for w in _MERGE_WHEN.finditer(m.group("clauses")):
            action = w.group("action").strip()
            if w.group("not_"):
                if not action.upper().startswith("INSERT"):
                    raise ValueError("WHEN NOT MATCHED supports only INSERT *")
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
