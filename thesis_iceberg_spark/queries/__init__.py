"""Query registry: every implemented operator gets a named entry.

This is the engine's equivalent of the reference's endpoint surface
(ref: api.py:427-445 routes) re-expressed as named query functions, plus the
driver contract from __spark_entry__.py: each entry has a Spark callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, a DuckDB oracle
SQL string that must produce hash-identical results (same column names!).

Determinism rules applied throughout (SURVEY.md §5/§7):
  * money/quantity aggregates go through DECIMAL(18,4) so sums are exact and
    engine-order-independent, then CAST to DOUBLE for a stable output type;
  * every computed column is aliased identically in Spark and oracle SQL;
  * LIMIT always rides on a total ORDER BY with a unique tie-break key;
  * timestamps in outputs are cast to DATE or formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> rows-only check (non-SQL op)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    # Import for side effects: each module registers its queries.
    from thesis_iceberg_spark.queries import (  # noqa: F401
        bpe,
        classify,
        datacard,
        dedup,
        extended,
        functions_q,
        graph,
        multimodal_q,
        pipeline_q,
        relational,
        search,
        similarity,
        sketch,
        sql_shapes,
        streaming_q,
        tablefmt_checks,
        text,
        timeseries_q,
    )


# The driver's correctness gate oracles the FIRST 50 registry entries per
# round, so ordering is rotation control.  POLICY (structural since r7,
# after VERDICT r6 found the hand-maintained 50-name block had frozen the
# window for two rounds):
#   * DRIVER_WINDOW_PRIORITY holds ONLY queries that are NEW or whose code
#     changed this round.  It is hard-capped at _PRIORITY_CAP names
#     (runtime assertion below + tests/test_window_policy.py), so the
#     stalest-green-first fallback ALWAYS fills the bulk of the window:
#     never-driver-checked queries first, then oldest green, from the
#     driver's own CORRECTNESS_r*.json records.
#   * Names not (yet) registered are skipped harmlessly.
#
# REGISTRY-SIZE / STALENESS POLICY (decided r15, VERDICT r14 #4 asked
# for the decision before r17): with N registered names, a 50-name
# driver window, and stalest-first fill, every name is re-checked
# every ceil(N/50) rounds (minus priority-block overlap).  The ledger
# target is therefore STALENESS <= ceil(N/50) - 1 ROUNDS: <=2 rounds
# while N <= 150, <=3 rounds once N crosses 150.  Registration cadence
# stays capped at +4/round while the r14 pre-certified queue drains
# (through ~r17, landing N ~= 146 — still inside the <=2-round
# regime); after the queue, net-new registrations require a NEW
# capability family (not a variant of a registered one), so N should
# sit at ~146-150 long-term and the <=2-round ledger holds.  If a new
# family ever pushes N past 150, the 3-round bound becomes the
# documented invariant (the math above), and near-duplicate
# registrations (e.g. the two funnel forms) are the consolidation
# candidates.  tests/test_window_policy.py pins the cap; the ledger is
# recomputed from CORRECTNESS_r*.json by _last_green_rounds below.
_PRIORITY_CAP = 16  # window is 50; >=34 slots must remain for rotation —
# comfortably above the worst-case stale backlog (the registry grows ~2-4
# queries/round, so <=20 queries can age past the 2-round line between
# windows; raised 12 -> 16 in r7 when the ANSI-robustness sweep touched
# the four ANN queries late in the round)

DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # Round 16 block (optimization round 2 of 2): queries whose CODE
    # changed this round, plus the one r15 change the r15 window missed.
    # r15 change #6 (semdedup members-frame staging, commit bc031ea)
    # landed AFTER the r15 priority-block update, so its post-change
    # output was covered only by gate_sim/pytest — VERDICT r15 #2 asks
    # for the driver-oracle row this round closes: (also rides this
    # round's LSH-kernel / bucket-candidate / CC changes below)
    "dedup_semdedup_centroid_far",
    # r16 optimization changes: batched LSH signature kernel +
    # groupBy-generated bucket candidates (replacing the count-window +
    # merge self-join) + connected_components' fused per-round
    # signature action — every registered consumer of those paths:
    "dedup_embedding_lsh_pairs",
    "dedup_embedding_kmeans_pairs",
    "dedup_embedding_cluster_canonical",
    "dedup_cluster_canonical",
    # r16: per-vector centroid assignment as MAX(struct) aggregation
    # (window deleted; both value-oracled) and the IVF index build's
    # local Euclidean Lloyd fit (gate booleans unchanged, 34 -> 4 jobs):
    "ann_batch_topk",
    "ann_ivf_topk",
    "ann_ivf_kmeans_topk",
    # r16: single-pass shingle staging + lazy-checkpoint action fusion
    # (the CC pattern) across the budget/composition paths — results
    # identical by construction, re-verified:
    "pipeline_pretrain_corpus",
    "pipeline_token_budget_select",
    "pipeline_decontaminate",
    "dedup_ngram_jaccard_pairs",
    "dedup_edit_verified_pairs",
    "search_bm25_topk",
    "pipeline_shard_shuffle",
)

assert len(DRIVER_WINDOW_PRIORITY) <= _PRIORITY_CAP, (
    "DRIVER_WINDOW_PRIORITY must stay small: it exists for this round's "
    "new/changed queries only; the stalest-first fallback owns the rest "
    "of the driver window (VERDICT r6 'What's wrong' #1)"
)


def _last_green_rounds() -> dict[str, int]:
    """name -> newest round with a fully-green driver row, parsed from the
    CORRECTNESS_r*.json files the driver leaves at the repo root.  Used to
    order the post-priority window remainder STALEST-FIRST, so queries the
    manual priority block doesn't name still rotate through the driver's
    50-query window by age instead of accumulating stale greens (the
    failure mode VERDICT r4 called out).  Missing or unparseable files are
    ignored (fresh checkout: everything ties at never-checked)."""
    import glob
    import json
    import os
    import re

    out: dict[str, int] = {}
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, res in data.items():
            if (
                isinstance(res, dict)
                and res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match")
                and not res.get("err")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


_LAST_GREEN_CACHE: dict[str, int] | None = None


def _ordered() -> dict[str, QuerySpec]:
    global _LAST_GREEN_CACHE
    _load_all()
    out: dict[str, QuerySpec] = {}
    for name in DRIVER_WINDOW_PRIORITY:
        if name in REGISTRY:
            out[name] = REGISTRY[name]
    if _LAST_GREEN_CACHE is None:
        # memoized: the round files cannot change mid-process, and
        # queries()/oracle_sql()/bench each call _ordered()
        _LAST_GREEN_CACHE = _last_green_rounds()
    last_green = _LAST_GREEN_CACHE
    reg_index = {name: i for i, name in enumerate(REGISTRY)}
    rest = [n for n in REGISTRY if n not in out]
    # never-checked first (new queries missed by the priority block), then
    # oldest green; registration order breaks ties deterministically
    rest.sort(key=lambda n: (last_green.get(n, -1), reg_index[n]))
    for name in rest:
        out[name] = REGISTRY[name]
    return out


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
