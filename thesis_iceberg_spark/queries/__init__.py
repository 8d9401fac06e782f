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
# Round 11 block: queries whose code changed this round — the unicode
# tokenizer fold (textnorm.py replaces the r10 \x0B-only fold in every
# twin; identical results on the ASCII driver corpus EXCEPT
# text_token_stats, whose avg_token_len numerator now counts non-space
# chars over the FOLDED text — a real cross-engine fix), the kmeans
# floor/probe re-choice (KMEANS_MIN_K 128->256, p=3 tier removed — the
# registered self-check's recall/ratio both move), and the extended.py
# Python twins that now fold invisible chars.  The fold touches ~30
# queries' oracle text; the cap holds the 16 most material — the
# md5-portable shingle/fingerprint family (certify contract changed),
# the two semantics changes, and the Python-twin extended queries —
# while the symmetric-fold-only rest rides the stalest-first fallback;
# ALL are value-oracle-verified locally at sf0.001
# (tests/test_correctness.py) and sf0.01 (gate sim), plus the crafted
# unicode corpus (tests/test_unicode_corpus_parity.py).
_PRIORITY_CAP = 16  # window is 50; >=34 slots must remain for rotation —
# comfortably above the worst-case stale backlog (the registry grows ~2-4
# queries/round, so <=20 queries can age past the 2-round line between
# windows; raised 12 -> 16 in r7 when the ANSI-robustness sweep touched
# the four ANN queries late in the round)

DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # Round 14 block: queries whose CODE or ORACLE changed this round.
    # the composition's token budget / mixture / packing now spend BPE
    # SUBWORD counts (VERDICT r13 #2 — a deliberate oracle
    # re-registration: n_tokens := n_subwords end to end post-gate)
    "pipeline_pretrain_corpus",
    # the stored-table builder's /tmp artifact became marker-gated
    # reuse + atomic publish instead of rmtree+rebuild (ADVICE r13 #1;
    # results identical by construction, re-verified anyway)
    "ann_int8_range_search_stored",
    # import-time assert -> ValueError on the SQL twin's preconditions
    # (ADVICE r13 #2; no semantic change, re-verified anyway)
    "text_bpe_encode",
    # NOT listed: the four r14 registrations (hll_distinct,
    # quantile_sampled, pagerank_near_dup, corpus_datacard — VERDICT
    # r13 #1) enter the window via the never-checked-first fallback.
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
