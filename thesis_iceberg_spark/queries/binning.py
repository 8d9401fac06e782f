"""Shared range-histogram bin expression for the refinement operators.

One canonical ``range_bin`` (the hashkit consolidation move, r14 review:
the clamped bin map existed as three drifting copies — token_budget's
score bins, its doc_id tie-break bins, and the quantile sketch's value
bins — each re-stating the monotonicity argument in its own comment).

Correctness contract, stated ONCE here: for lo <= x <= lo+span with
span > 0, ``floor((x - lo) * n / span)`` clamped to [0, n-1] is
MONOTONE NONDECREASING in x — subtraction of a fixed lo, multiplication
by a positive constant, division by a positive constant and floor are
each exactly-rounded IEEE operations that preserve order — so bins are
value-contiguous runs of the sort order and a refinement loop can
filter to one bin without splitting equal values across bins (equal
inputs always share a bin).  The clamp covers the two float edges
(x == lo+span maps to n; rounding can excurse one step past either
end); it never reorders.

The map runs in the DOUBLE domain regardless of x's type (r15 review
#1): evaluating (x - lo) * n on a wide BIGINT column wraps silently
once the span approaches 2^63/n — bins stop being monotone, the
histogram counts still sum correctly, and the refinement returns WRONG
order statistics with no error (reachable since quantile_sampled_df
accepted integral columns).  The bigint -> double cast is monotone
(round-to-nearest preserves order), so the contract holds; the one
cost is that integers distinguishable only below double resolution
(same 2^53-scale magnitude, tiny differences) can share a bin, in
which case a refinement level makes no progress and the caller's
depth-cap fallback sorts the remainder — slower, never wrong.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def range_bin(x: Column, lo, span, n: int) -> Column:
    """The canonical clamped range bin: floor((x - lo) * n / span) bounded
    to [0, n-1], computed in the double domain (see module contract).
    ``lo``/``span`` are driver-side numbers from a prior min/max
    aggregate; callers guarantee span > 0 (equal-min/max subsets take
    their own short-circuit)."""
    return F.least(
        F.greatest(
            F.floor((x.cast("double") - float(lo)) * n / float(span)),
            F.lit(0).cast("bigint"),
        ),
        F.lit(n - 1).cast("bigint"),
    )
