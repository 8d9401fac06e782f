"""Skyline (Pareto-dominance) operator — 2D minimize/minimize.

A skyline query returns the points no other point dominates (dominates =
<= in both dimensions, < in at least one). Spark has no skyline operator;
the idiomatic distributed form (cf. "Integration of Skyline Queries into
Spark SQL", EDBT 2023 — PAPERS.md corpus) is the two-phase pattern:

  1. LOCAL skyline per partition (Arrow-batched mapInPandas, numpy
     sort-and-sweep, O(n log n) per partition) — this prunes the corpus to
     the tiny set of per-partition non-dominated points;
  2. GLOBAL skyline as a TREE-REDUCE over the local skylines: partitions
     fold FAN_IN at a time (coalesce + local sweep per round) until one
     remains — correct because dominance is transitive: any global skyline
     point survives every intermediate sweep.

At 100 TB phase 1 is a narrow pass (no shuffle) with enormous selectivity;
the tree bounds every GLOBAL task to ~FAN_IN partitions' survivors instead
of funnelling all of them into one unbounded task.  The residual hazard is
the DATA, not the plan: on anti-correlated inputs the skyline itself is
O(n) and no exact algorithm can bound the final fold — so the fold raises
loudly when a round stops shrinking the survivor set below
MAX_GLOBAL_POINTS rather than OOM-ing mid-task.  Ties: coordinate-equal
duplicates dominate neither and are all kept.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _sweep(pdf: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Exact 2D minimize/minimize skyline of one pandas frame."""
    if pdf.empty:
        return pdf
    s = pdf.sort_values([x, y], kind="mergesort")
    keep = []
    best_x = best_y = None
    for idx, row in zip(s.index, s.itertuples(index=False)):
        px, py = getattr(row, x), getattr(row, y)
        if best_y is None or py < best_y:
            keep.append(idx)
            best_x, best_y = px, py
        elif py == best_y and px == best_x:  # exact duplicate: not dominated
            keep.append(idx)
    return s.loc[keep]


FAN_IN = 8  # partitions folded per tree-reduce round
MAX_GLOBAL_POINTS = 4_000_000  # survivor cap: ~few hundred MB of points


def skyline_2d(df: DataFrame, x: str, y: str, check_cap: bool = True) -> DataFrame:
    """Distributed exact skyline over (x, y), both minimized.

    With ``check_cap`` (default), phase 1 materializes (eager
    localCheckpoint) so the survivor count can gate the fold:
    anti-correlated data can leave the skyline itself O(n), and no exact
    fold can bound that — better a loud error before the reduce than an
    executor OOM inside it.  That gate runs a Spark job at DataFrame-BUILD
    time, which surprises composition (building a larger plan around the
    skyline triggers work); pass ``check_cap=False`` to stay fully lazy
    and accept the OOM risk on anti-correlated inputs.
    """

    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches]
        if not parts:
            return
        yield _sweep(pd.concat(parts, ignore_index=True), x, y)

    locally = df.mapInPandas(local, schema)
    if check_cap:
        locally = locally.localCheckpoint(eager=True)
        survivors = locally.count()
        if survivors > MAX_GLOBAL_POINTS:
            raise RuntimeError(
                f"skyline_2d: {survivors} local-skyline survivors exceed the "
                f"{MAX_GLOBAL_POINTS} global-phase cap — the input looks "
                "anti-correlated (skyline is O(n)); partition the domain and "
                "merge per-range skylines, or raise MAX_GLOBAL_POINTS"
            )
    # tree-reduce: fold partitions FAN_IN-to-1 per round, re-sweeping each
    # fold.  repartition (NOT coalesce) on purpose: coalesce is a narrow
    # dependency, so chained coalesce+mapInPandas rounds would pipeline
    # into the single final task and the per-round bound would be fiction;
    # the shuffle is a stage barrier that actually executes each round in
    # its own bounded tasks, and it moves only survivors (tiny)
    p = locally.rdd.getNumPartitions()
    while p > 1:
        p = max(1, -(-p // FAN_IN))
        locally = locally.repartition(p).mapInPandas(local, schema)
    return locally
