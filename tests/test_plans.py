"""Plan-shape gates (SURVEY.md §4): filters pushed to the scan, read schema
pruned, dimensions broadcast, no cartesian degeneration — the properties
that decide whether a query survives a 100x scale-up."""

from __future__ import annotations

from thesis_iceberg_spark.plans import (
    assert_broadcast_hints_only,
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
)
from thesis_iceberg_spark.queries import REGISTRY, queries

queries()


def _q(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_point_lookup_pushes_equality(spark, sf_dir):
    df = _q("point_lookup", spark, sf_dir)
    assert_pushed_filters(df, "EqualTo(o_orderkey,42)")
    assert_read_schema_pruned(df, "orders", 3)


def test_range_filter_pushes_bounds(spark, sf_dir):
    df = _q("filter_range_ts", spark, sf_dir)
    assert_pushed_filters(df, "GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate")


def test_projection_prunes_scan(spark, sf_dir):
    df = _q("project_columns", spark, sf_dir)
    assert_read_schema_pruned(df, "customer", 3)


def test_agg_prunes_to_referenced_columns(spark, sf_dir):
    # Q1 touches 7 of 11 lineitem columns; the scan must not read the rest
    df = _q("agg_pricing_summary", spark, sf_dir)
    assert_read_schema_pruned(df, "lineitem", 7)
    assert_pushed_filters(df, "LessThanOrEqual(l_shipdate")


def test_star_join_hint_discipline(spark, sf_dir):
    # Forced F.broadcast is legal ONLY on bounded-cardinality dims (nation
    # 25 rows / region 5 rows at ANY SF).  Orders and customer scale with
    # SF — a hint there overrides autoBroadcastJoinThreshold and OOMs at
    # 100 TB, so the analyzed plan must carry hints on nation/region only;
    # AQE still picks broadcast for all four at sf0.1 from measured sizes.
    df = _q("star_join_revenue_by_nation", spark, sf_dir)
    assert_broadcast_hints_only(df, "n_nationkey", "r_regionkey")
    assert_broadcast_join(df, min_count=2)  # nation + region always broadcast
    assert_no_cartesian(df)


def test_cust_orders_join_has_no_forced_hint(spark, sf_dir):
    # customer is 150k rows per TPC-H SF — NOT a bounded dim; the join must
    # leave the strategy to AQE (no ResolvedHint at all in the analyzed plan)
    df = _q("join_inner_cust_orders", spark, sf_dir)
    assert_broadcast_hints_only(df)  # no markers allowed => zero hints
    assert_no_cartesian(df)


def test_tpch_analogs_hint_discipline(spark, sf_dir):
    # q3/q14 join SF-scaling tables (customer, part) — no forced hints
    # anywhere in either analyzed plan; AQE owns the strategy
    assert_broadcast_hints_only(_q("q3_unshipped_topk", spark, sf_dir))
    assert_broadcast_hints_only(_q("q14_promo_revenue", spark, sf_dir))


def test_asof_join_not_cartesian(spark, sf_dir):
    assert_no_cartesian(_q("asof_join_last_event", spark, sf_dir))


def test_range_join_not_cartesian(spark, sf_dir):
    assert_no_cartesian(_q("range_join_event_window", spark, sf_dir))


def test_lsh_join_not_cartesian(spark, sf_dir):
    assert_no_cartesian(_q("dedup_minhash_lsh_pairs", spark, sf_dir))


def test_embedding_lsh_join_not_cartesian(spark, sf_dir):
    # candidate generation must never go cartesian.  r16: it is no
    # longer a join at all — one bucket-keyed aggregation collects each
    # bucket's sorted member list and the i<j pairs are generated
    # NARROWLY from the array (posexplode + slice), so the pin is the
    # bucket-keyed exchange + the generator, with no join able to
    # blow up on the candidate path
    from thesis_iceberg_spark.plans import formatted_plan

    df = _q("dedup_embedding_lsh_pairs", spark, sf_dir)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "collect_list" in plan  # the per-bucket member aggregation
    assert "Generate" in plan  # narrow pair generation, not a self-join


def test_topk_uses_take_ordered(spark, sf_dir):
    from thesis_iceberg_spark.plans import formatted_plan

    plan = formatted_plan(_q("topk_orders", spark, sf_dir))
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT 20


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    from thesis_iceberg_spark.plans import formatted_plan

    plan = formatted_plan(_q("join_bucketed_colocated", spark, sf_dir))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # bucket layout replaces the shuffle
    assert "SelectedBucketsCount" in plan


def test_q6_pushes_all_predicates(spark, sf_dir):
    df = _q("agg_q6_revenue", spark, sf_dir)
    assert_pushed_filters(
        df,
        "GreaterThanOrEqual(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.03)",
        "LessThan(l_quantity,24.0)",
    )


def test_batch_ann_not_cartesian(spark, sf_dir):
    # the KNN-join must fan out through the bucket equi-join (broadcast
    # probe table), never |corpus| x |queries|
    assert_no_cartesian(_q("ann_batch_topk", spark, sf_dir))


def test_decontaminate_not_cartesian(spark, sf_dir):
    # train x eval docs meet ONLY through the shared-shingle inverted index
    assert_no_cartesian(_q("pipeline_decontaminate", spark, sf_dir))


def test_repetition_signals_plan_shape(spark, sf_dir):
    """Gopher repetition: per-document bounded state makes the scalable
    plan the NARROW one — a single Arrow mapInPandas over the scan with
    ZERO exchanges (the earlier all-JVM window+explode+aggregate form
    moved the full gram mass through two doc_id shuffles and measured
    4-5x slower; see the query docstring)."""
    from thesis_iceberg_spark.plans import formatted_plan

    df = _q("text_gopher_repetition_signals", spark, sf_dir)
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "MapInPandas" in plan  # Arrow-batched, not row-at-a-time
    assert "Exchange" not in plan  # zero shuffles: embarrassingly parallel
    assert "ReadSchema" in plan and "text" in plan  # straight off the scan


def test_kmeans_candidate_join_not_cartesian(spark, sf_dir):
    # the 1e8+ scale path (round 7): assignment is a shuffle-free Arrow
    # mapInPandas and candidate generation must never go cartesian (and
    # never broadcast the corpus-sized bucket table).  r16: candidates
    # come from the bucket-keyed member aggregation + narrow pair
    # generation (no join on the candidate path at all) — pin that shape
    from thesis_iceberg_spark.plans import formatted_plan
    from thesis_iceberg_spark.queries.dedup import (
        dedup_embedding_kmeans_candidates,
        load_table,
    )

    df = dedup_embedding_kmeans_candidates(
        spark, load_table(spark, sf_dir, "embeddings")
    )
    assert_no_cartesian(df)
    plan = formatted_plan(df)
    assert "collect_list" in plan  # the per-bucket member aggregation
    assert "Generate" in plan  # narrow pair generation, not a self-join


# --- hint-gate subtree scoping on crafted plan text (review r10 ADVICE) -----


def _gate_on(monkeypatch, plan_text, *markers):
    import thesis_iceberg_spark.plans.explain as ex

    monkeypatch.setattr(ex, "analyzed_plan", lambda _df: plan_text)
    ex.assert_broadcast_hints_only(object(), *markers)


def test_hint_gate_sibling_marker_does_not_satisfy(monkeypatch):
    # the r10 vacuity fix, now on crafted text: the allowed marker sits on
    # a SIBLING of the hinted subtree -> the gate must still raise
    import pytest

    plan = "\n".join(
        [
            "Join Inner, (c_nationkey#1 = n_nationkey#2)",
            ":- ResolvedHint (strategy=broadcast)",
            ":  +- Relation spark_catalog.db.customer[c_custkey#0] parquet",
            "+- Relation spark_catalog.db.nation[n_nationkey#2] parquet",
        ]
    )
    with pytest.raises(AssertionError, match="non-allowed subtree"):
        _gate_on(monkeypatch, plan, "n_nationkey")


def test_hint_gate_continuation_lines_are_not_terminators(monkeypatch):
    # a wrapped (marker-less) continuation line inside the hinted subtree
    # used to TERMINATE the scan before the marker was seen (false raise);
    # anchored parsing treats it as part of the current node
    plan = "\n".join(
        [
            "Join Inner, (c_nationkey#1 = n_nationkey#2)",
            ":- ResolvedHint (strategy=broadcast)",
            ":  +- Relation spark_catalog.db.nation[n_name#3,",
            "n_nationkey#2, n_regionkey#4] parquet",
            "+- Relation spark_catalog.db.customer[c_custkey#0] parquet",
        ]
    )
    _gate_on(monkeypatch, plan, "n_nationkey")


def test_hint_gate_literal_marker_in_expression_text_is_not_a_node(monkeypatch):
    # a literal "+- " deep inside a marker-less continuation line must not
    # be read as a (deeper) node that extends the hinted subtree into the
    # sibling below it
    import pytest

    plan = "\n".join(
        [
            "Join Inner",
            ":- ResolvedHint (strategy=broadcast)",
            ":  +- Relation spark_catalog.db.customer[c_comment#9] parquet",
            "    note concat(a, '+- ', b) wrapped expression text",
            "+- Relation spark_catalog.db.nation[n_nationkey#2] parquet",
        ]
    )
    # the continuation belongs to the hinted customer subtree; nation is a
    # sibling -> its marker must NOT satisfy the gate
    with pytest.raises(AssertionError, match="non-allowed subtree"):
        _gate_on(monkeypatch, plan, "n_nationkey")


def test_hint_gate_root_hint_covers_whole_plan(monkeypatch):
    # a hint at the plan root (no structural marker on its own line) scopes
    # over everything below it
    plan = "\n".join(
        [
            "ResolvedHint (strategy=broadcast)",
            "+- Relation spark_catalog.db.nation[n_nationkey#2] parquet",
        ]
    )
    _gate_on(monkeypatch, plan, "n_nationkey")
