"""pipeline_shard_shuffle_df (r14, df-level; r15 registration candidate):
deterministic shuffle-shard assignment with dense within-shard positions
via the two-phase bucketed construction — pinned against the naive
one-window-per-shard DuckDB twin, plus the invariants a shard writer
relies on (dense 1..n per shard, determinism, bounded window tasks).
"""

from __future__ import annotations

import duckdb

from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
from thesis_iceberg_spark.plans import formatted_plan
from thesis_iceberg_spark.queries.pipeline_q import (
    SHARD_N,
    pipeline_shard_shuffle_df,
    shard_shuffle_df,
    sql_shard_shuffle,
)
from thesis_iceberg_spark.sources.registry import load_table


def test_parity_on_driver_corpus(spark, sf_dir):
    got = canonical_rows(pipeline_shard_shuffle_df(spark, sf_dir).toPandas())
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "documents")
    want = canonical_rows(con.sql(sql_shard_shuffle()).df())
    assert got == want
    assert got


def test_positions_dense_and_deterministic(spark, sf_dir):
    rows = pipeline_shard_shuffle_df(spark, sf_dir).collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.shard_pos)
    assert set(by_shard) <= set(range(SHARD_N))
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    again = pipeline_shard_shuffle_df(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_order_is_draw_shuffled_not_id_order(spark, sf_dir):
    # the point of the operator: within a shard, position order must NOT
    # be doc_id order (it is the md5 draw's order — a real shuffle)
    rows = pipeline_shard_shuffle_df(spark, sf_dir).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r)
    shuffled = 0
    for rs in by_shard.values():
        in_pos = [r.doc_id for r in sorted(rs, key=lambda r: r.shard_pos)]
        if in_pos != sorted(in_pos):
            shuffled += 1
    assert shuffled == len(by_shard), "a shard came out in doc_id order"


def test_windows_are_bucket_partitioned(spark, sf_dir):
    # the scale contract: NO unpartitioned window and no per-shard-only
    # row_number over the corpus — every Window operator in the plan
    # carries a partition spec that includes the bucket key, so a task's
    # share is corpus/(K*B), not corpus/K (module comment; the naive
    # form is the ORACLE, not the plan)
    plan = formatted_plan(pipeline_shard_shuffle_df(spark, sf_dir))
    rn_lines = [
        ln
        for ln in plan.splitlines()
        if "row_number() windowspecdefinition(" in ln
    ]
    assert rn_lines, plan  # the position window must appear
    for ln in rn_lines:
        spec = ln.split("specifiedwindowframe")[0]
        assert "shard_id" in spec and "bucket" in spec, ln
    # the offsets cumulative window runs over the <= K*B counts frame and
    # is shard-partitioned (never the corpus)
    off_lines = [
        ln for ln in plan.splitlines() if "sum(" in ln and "windowspecdefinition" in ln
    ]
    for ln in off_lines:
        assert "shard_id" in ln.split("specifiedwindowframe")[0], ln


def test_small_crafted_shard_layout(spark):
    # 1-row-per-doc hand-checkable case on a two-shard layout
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 21)], "doc_id BIGINT"
    )
    rows = shard_shuffle_df(docs, n_shards=2).collect()
    assert len(rows) == 20
    for shard in (0, 1):
        ps = sorted(r.shard_pos for r in rows if r.shard_id == shard)
        assert ps == list(range(1, len(ps) + 1))
