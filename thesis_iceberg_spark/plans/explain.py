"""Physical-plan assertions: the engine's "is this the plan I'd want at
100 TB?" gate (SURVEY.md §4).

Correctness tests prove the VALUES are right; these prove the PLAN is
right — filters reached the parquet scan, projections pruned the read
schema, dimension joins broadcast instead of shuffling the fact table, and
nothing degenerated into a cartesian product.  tests/test_plans.py runs
them over the headline queries so a regression in plan shape fails CI just
like a regression in results.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear inside a PushedFilters: [...] clause."""
    plan = formatted_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln]
    joined = " ".join(pushed)
    missing = [f for f in fragments if f not in joined]
    assert not missing, f"filters not pushed to scan: {missing}\n{joined or plan}"


def assert_read_schema_pruned(df: DataFrame, table_fragment: str, max_columns: int) -> None:
    """The scan of ``table_fragment`` must read at most ``max_columns``
    columns (column pruning reached the parquet reader)."""
    plan = formatted_plan(df)
    # locate 'Output [N]' lines adjacent to the matching Location
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Location:" in ln and table_fragment in ln:
            for back in range(i - 1, max(i - 6, -1), -1):
                if "Output [" in lines[back]:
                    n = int(lines[back].split("Output [")[1].split("]")[0])
                    assert n <= max_columns, (
                        f"scan of {table_fragment} reads {n} columns, "
                        f"expected <= {max_columns}"
                    )
                    return
    raise AssertionError(f"no parquet scan of {table_fragment} found in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    """At least ``min_count`` BroadcastHashJoin nodes (dimensions broadcast,
    fact table not shuffled)."""
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= min_count, f"expected >= {min_count} broadcast joins, found {n}\n{plan}"


def analyzed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().analyzed().toString()  # noqa: SLF001


def assert_broadcast_hints_only(df: DataFrame, *allowed_markers: str) -> None:
    """Every ``ResolvedHint`` in the ANALYZED plan must sit over a relation
    identified by one of ``allowed_markers`` (a column unique to that table,
    e.g. ``n_nationkey``).

    This is the 100 TB hint-discipline gate: ``F.broadcast`` is only
    legitimate on BOUNDED-cardinality dimensions (nation: 25 rows, region: 5
    at any TPC-H SF).  A forced hint on an SF-scaling table (orders,
    customer, lineitem) overrides autoBroadcastJoinThreshold and OOMs
    building the broadcast at scale — the physical plan can't reveal this at
    small SF (AQE legitimately picks broadcast there from measured sizes),
    so the gate reads the analyzed logical plan where hints are explicit.
    """
    plan = analyzed_plan(df)
    lines = plan.splitlines()

    # tree position = column of the "+-" / ":-" node marker, ANCHORED to
    # the indentation structure: a node line is sibling-bars/spaces
    # ("[ :]*") followed by the marker.  A literal "+- " deeper inside a
    # node's expression text no longer counts as a node, and a line with
    # no structural marker (wrapped continuation text) is a CONTINUATION
    # of the current node, not a subtree terminator (review r10 ADVICE —
    # the old first-substring scan could over- or under-extend the
    # hinted subtree and let a sibling's marker vacuously pass).
    node_re = re.compile(r"^([ :]*)(?:\+-|:-) ")

    def depth(ln: str) -> int | None:
        m = node_re.match(ln)
        return len(m.group(1)) if m else None

    hints = [i for i, ln in enumerate(lines) if "ResolvedHint" in ln]
    for i in hints:
        # the hinted SUBTREE = following lines strictly deeper than the
        # hint; searching past it could attribute the hint to a sibling's
        # scan and vacuously pass (review r10)
        d0 = depth(lines[i])
        if d0 is None:  # hint at the plan root (no marker): depth -1
            d0 = -1
        subtree = []
        for ln in lines[i + 1 :]:
            d = depth(ln)
            if d is not None and d <= d0:
                break
            # blank lines and "== Section ==" headers end the tree text
            # entirely (review r11 ADVICE: a marker-less trailing line
            # after the subtree's last node would otherwise still be
            # attributed to the hint and could satisfy the gate
            # vacuously).  analyzed().toString() is a bare tree today,
            # but a future multi-section plan string stays safe.
            if not ln.strip() or ln.lstrip().startswith("=="):
                break
            subtree.append(ln)
        assert any(any(m in ln for m in allowed_markers) for ln in subtree), (
            f"forced hint over a non-allowed subtree (allowed markers "
            f"{allowed_markers}):\n" + "\n".join(subtree) + f"\nfull analyzed plan:\n{plan}"
        )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"plan degenerated to cartesian:\n{plan}"
