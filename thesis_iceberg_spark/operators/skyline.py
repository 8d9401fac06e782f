"""Skyline (Pareto-dominance) operator — 2D minimize/minimize.

A skyline query returns the points no other point dominates (dominates =
<= in both dimensions, < in at least one). Spark has no skyline operator;
the idiomatic distributed form (cf. "Integration of Skyline Queries into
Spark SQL", EDBT 2023 — PAPERS.md corpus) is the two-phase pattern:

  1. LOCAL skyline per partition (Arrow-batched mapInPandas, numpy
     sort-and-sweep, O(n log n) per partition) — this prunes the corpus to
     the tiny set of per-partition non-dominated points;
  2. GLOBAL skyline over the union of local skylines on one partition —
     correct because dominance is transitive: any global skyline point
     survives its partition's local skyline.

At 100 TB phase 1 is a narrow pass (no shuffle) with enormous selectivity;
phase 2 moves only the surviving points. Ties: coordinate-equal duplicates
dominate neither and are all kept.
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


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Distributed exact skyline over (x, y), both minimized."""

    schema = df.schema

    def local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches]
        if not parts:
            return
        yield _sweep(pd.concat(parts, ignore_index=True), x, y)

    locally = df.mapInPandas(local, schema)
    # global pass: union of local skylines is small; one partition finishes
    return locally.coalesce(1).mapInPandas(local, schema)
