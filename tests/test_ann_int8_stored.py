"""Write-time int8 materialization through the table layer (VERDICT r10
#5): the ann_int8_topk docstring claims "at 100 TB the quantized column
is materialized at write time — the shortlist scan then reads 1/4 the
bytes".  This file makes the claim executable: quantize_embeddings_table
CTASes a VersionedTable with the int8 column + the corpus scale as a
table property, ann_int8_topk_stored answers from the STORED column, and
the tests prove (a) the stored path returns the IDENTICAL top-k to the
inline registered query, (b) the shortlist scan's ReadSchema never
touches the float column, and (c) the int8 column really is ~1/4 the
float column's bytes on disk.
"""

from __future__ import annotations

import glob

import pytest

from thesis_iceberg_spark.queries.similarity import (
    INT8_SCALE_PROP,
    ann_int8_topk,
    ann_int8_topk_stored,
    quantize_embeddings_table,
)
from thesis_iceberg_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def stored(spark, sf_dir, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("int8tbl") / "emb")
    raw = load_table(spark, sf_dir, "embeddings")
    table, scale = quantize_embeddings_table(spark, raw, loc)
    return table, scale, loc


def test_stored_path_identical_topk(spark, sf_dir, stored):
    table, _scale, _loc = stored
    inline = [tuple(r) for r in ann_int8_topk(spark, sf_dir).collect()]
    from_table = [tuple(r) for r in ann_int8_topk_stored(spark, table).collect()]
    assert from_table == inline
    assert len(inline) == 10


def test_scale_rides_with_the_table(spark, stored):
    table, scale, _loc = stored
    # repr round-trips the IEEE double exactly — a reader recomputes
    # bit-identical query quantization from the property alone
    assert float(table.properties[INT8_SCALE_PROP]) == scale


def test_shortlist_scan_prunes_float_column(spark, stored):
    table, _scale, _loc = stored
    from thesis_iceberg_spark.plans import formatted_plan

    narrow = table.read().select("vec_id", "label", "q")
    plan = formatted_plan(narrow)
    # every parquet ReadSchema in the shortlist lineage excludes the
    # float vectors — the 1/4-bytes claim depends on column pruning —
    # and positively includes the int8 column (review r11: the old
    # `or "q" in plan` arm matched 'parquet' and could never fail)
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schema_lines
    for line in schema_lines:
        assert "embedding" not in line, line
        assert "q:array<tinyint>" in line.replace(" ", ""), line


def test_rerank_reads_only_survivor_rows(spark, stored):
    # the float column is touched through pushed point/in-list predicates
    # only: the full query's plan must show a pushed filter on vec_id for
    # every embedding-bearing scan (never an unfiltered corpus scan)
    table, _scale, _loc = stored
    from thesis_iceberg_spark.plans import formatted_plan

    df = ann_int8_topk_stored(spark, table)
    plan = formatted_plan(df)
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "ReadSchema" in line and "embedding" in line:
            # the scan description carries PushedFilters on vec_id
            window = "\n".join(lines[max(0, i - 8) : i + 1])
            assert (
                "In(vec_id" in window or "EqualTo(vec_id" in window
            ), f"embedding scan without a pushed vec_id predicate:\n{window}"


def test_int8_column_is_quarter_the_bytes(stored):
    table, _scale, loc = stored
    pq = pytest.importorskip("pyarrow.parquet")
    emb_bytes = q_bytes = 0
    for f in glob.glob(f"{loc}/data/**/*.parquet", recursive=True):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                path = col.path_in_schema
                if path.startswith("embedding"):
                    emb_bytes += col.total_compressed_size
                elif path.startswith("q"):
                    q_bytes += col.total_compressed_size
    assert emb_bytes > 0 and q_bytes > 0
    # f32 -> int8 is 4x raw; parquet framing/encoding overhead keeps the
    # measured ratio near but not exactly 4 — gate at 2x so the test pins
    # "materially smaller" without flaking on encoder details
    ratio = emb_bytes / q_bytes
    assert ratio > 2.0, f"int8 column not materially smaller: {ratio:.2f}x"


def test_rerank_point_list_bound_is_loud(spark, stored, monkeypatch):
    # VERDICT r11 #7: the isin point-list collect is legitimate only while
    # SHORTLIST_K is a small constant; if it ever scales with the corpus
    # the rerank must fail LOUDLY (pointing at the broadcast-semi-join
    # rewrite) instead of silently shipping corpus data through a pushed
    # predicate.  The compile-time half of the contract first:
    import thesis_iceberg_spark.queries.similarity as sim

    assert sim.SHORTLIST_K <= sim.ISIN_POINT_LIST_MAX
    # runtime half: with a ceiling below the real shortlist the collect
    # path must raise, not proceed
    table, _scale, _loc = stored
    monkeypatch.setattr(sim, "ISIN_POINT_LIST_MAX", 2)
    with pytest.raises(ValueError, match="broadcast semi-join"):
        sim.ann_int8_topk_stored(spark, table)


def test_semi_join_rerank_identical_and_broadcast(spark, sf_dir, stored):
    # the documented escape hatch for a corpus-scaled shortlist (r12):
    # rerank='semi_join' must return the IDENTICAL top-k with no
    # driver-side id list — the shortlist frame broadcasts into a hash
    # join against the float scan
    from thesis_iceberg_spark.plans import formatted_plan

    table, _scale, _loc = stored
    isin_rows = [tuple(r) for r in ann_int8_topk_stored(spark, table).collect()]
    df = ann_int8_topk_stored(spark, table, rerank="semi_join")
    assert [tuple(r) for r in df.collect()] == isin_rows
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    # no pushed point list anywhere: Spark renders a 40-element pushed
    # list as INSET / In(vec_id, ...) — never " IN (" (review r12: the
    # original assertion was vacuous against both modes)
    assert "INSET" not in plan
    assert "In(vec_id" not in plan


def test_semi_join_mode_ignores_point_list_ceiling(spark, stored, monkeypatch):
    # the guard protects the isin path only: with a ceiling below the
    # shortlist, semi_join still works (that is its whole reason to exist)
    import thesis_iceberg_spark.queries.similarity as sim

    table, _scale, _loc = stored
    monkeypatch.setattr(sim, "ISIN_POINT_LIST_MAX", 2)
    out = sim.ann_int8_topk_stored(spark, table, rerank="semi_join").collect()
    assert len(out) == sim.TOP_K


def test_invalid_rerank_mode_is_loud(spark, stored):
    table, _scale, _loc = stored
    with pytest.raises(ValueError, match="rerank must be"):
        ann_int8_topk_stored(spark, table, rerank="collect")
