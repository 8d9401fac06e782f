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
        dedup,
        extended,
        functions_q,
        multimodal_q,
        pipeline_q,
        relational,
        similarity,
        sql_shapes,
        streaming_q,
        tablefmt_checks,
        text,
        timeseries_q,
    )


# The driver's correctness gate oracles the FIRST 50 registry entries per
# round, so ordering is rotation control: round 1 verified the first 50 in
# module-import order; this list front-loads (a) every query round 1 could
# not check, (b) the 11 round-1 errors now fixed, and (c) this round's new
# queries — so every family accumulates driver signal across rounds.
# Names not (yet) registered are skipped harmlessly; unlisted queries keep
# registration order after the prioritized block.
DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # --- round 3: the 9 queries no driver round has ever checked ---
    "dedup_cluster_canonical",
    "text_gopher_quality_flags",
    "pipeline_pii_scrub",
    "pipeline_chunk_documents",
    "pipeline_stratified_sample",
    "pipeline_pack_sequences",
    "pipeline_topk_per_lang_sample",
    "agg_approx_count_distinct",  # now a value oracle (exact count + 5% self-check)
    "ann_ivf_kmeans_topk",  # now a value oracle (recall@10 self-check)
    # --- new this round ---
    "sql_ddl_lifecycle",
    "tablefmt_merge_incremental",
    "ann_batch_topk",
    "pipeline_decontaminate",
    # --- 37 green veterans, one+ per family, as regression guards ---
    # (exactly fills the 50-slot window with the 13 entries above)
    # relational scans / filters / topk
    "scan_full",
    "topk_orders",
    # aggregation
    "agg_pricing_summary",
    "agg_q6_revenue",
    "agg_count_distinct",
    "agg_salted_skew",
    "grouping_sets_sql",
    # joins
    "join_inner_cust_orders",
    "join_anti_inactive_customers",
    "join_bucketed_colocated",
    "star_join_revenue_by_nation",
    "q3_unshipped_topk",
    "asof_join_last_event",
    # windows / set ops / subqueries
    "window_rank_orders",
    "window_funcs_extended",
    "set_ops_customer_segments",
    "in_exists_subqueries",
    # dedup / similarity
    "dedup_exact_hash",
    "dedup_minhash_lsh_pairs",
    "dedup_embedding_lsh_pairs",
    "ann_cosine_topk",
    "ann_ivf_topk",
    # text / multimodal / pipeline
    "text_token_stats",
    "text_lang_id",
    "multimodal_metadata",
    "multimodal_features",
    "pipeline_train_eval_split",
    # streaming / timeseries
    "streaming_windowed_event_stats",
    "streaming_batch_parity",
    "sessionize_events",
    "time_bucket_rollup",
    # table format / SQL front-end
    "tablefmt_lifecycle_final_state",
    "tablefmt_time_travel",
    "tablefmt_changelog",
    "tablefmt_schema_evolution",
    "sql_time_travel",
    "sql_dml_update_delete",
)


def _ordered() -> dict[str, QuerySpec]:
    _load_all()
    out: dict[str, QuerySpec] = {}
    for name in DRIVER_WINDOW_PRIORITY:
        if name in REGISTRY:
            out[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        if name not in out:
            out[name] = spec
    return out


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
