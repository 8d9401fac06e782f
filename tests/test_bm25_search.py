"""BM25 lexical top-k retrieval (round 9).

The registered search_bm25_topk value-oracles the RANKING + exact
integer evidence columns; the ln-based score stays out of the oracle
(1-ulp rule) and is pinned here against a pure-Python reference, with
the cross-engine safety MARGIN (adjacent-rank score gap around the
top-k cut) floor-asserted — the same precedent that makes the semdedup
centroid-far keeper value-oracle-safe.
"""

from __future__ import annotations

import math
import os

import pytest

from thesis_iceberg_spark.queries.search import (
    BM25_B,
    BM25_K1,
    BM25_QUERY_TERMS,
    BM25_TOP_K,
    bm25_topk_df,
)
from thesis_iceberg_spark.sources.registry import load_table


def _write_docs(spark, tmp_path, rows, name="bm25corpus"):
    d = str(tmp_path / name)
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.parquet(f"{d}/documents.parquet")
    return d


def _docs_df(spark, d):
    return load_table(spark, d, "documents")


def _ref_bm25(rows, terms, k1=BM25_K1, b=BM25_B):
    """Pure-Python BM25 over the same tokenizer contract."""
    toks = {
        did: (text or "").strip().lower().split() for did, text in rows
    }
    toks = {did: t for did, t in toks.items() if t}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {
        q: sum(1 for t in toks.values() if q in t) for q in terms
    }
    out = {}
    for did, t in toks.items():
        s = 0.0
        matched = 0
        for q in terms:
            tf = t.count(q)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if matched:
            out[did] = s
    return out


CRAFTED = [
    (1, "alpha beta alpha gamma"),  # tf(alpha)=2
    (2, "alpha beta"),  # shorter doc, tf=1 each
    (3, "ALPHA  beta\tbeta"),  # case + whitespace normalization
    (4, "gamma gamma gamma delta"),  # matches only gamma
    (5, ""),  # empty -> excluded
    (6, None),  # NULL -> excluded
    (7, "delta epsilon"),  # zero query terms -> excluded
    (8, "alpha beta alpha gamma"),  # exact dup of 1 -> tie, doc_id break
]
TERMS = ("alpha", "beta", "gamma")


@pytest.fixture()
def crafted_dir(spark, tmp_path):
    return _write_docs(spark, tmp_path, CRAFTED)


def test_ranking_matches_python_reference(spark, crafted_dir):
    got = bm25_topk_df(
        spark, _docs_df(spark, crafted_dir), terms=TERMS, k=10, with_score=True
    ).collect()
    ref = _ref_bm25(CRAFTED, TERMS)
    # excluded docs never appear
    assert {r.doc_id for r in got}.isdisjoint({5, 6, 7})
    # ranking = ref scores desc, doc_id asc
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [r.doc_id for r in got] == [d for d, _ in want]
    assert [r.rank for r in got] == list(range(1, len(want) + 1))
    for r, (_, s) in zip(got, want):
        assert r.score == pytest.approx(s, rel=1e-12)
    # exact duplicate docs tie exactly and break on doc_id
    g = {r.doc_id: r for r in got}
    assert g[1].score == g[8].score and g[1].rank == g[8].rank - 1


def test_evidence_columns_exact(spark, crafted_dir):
    g = {
        r.doc_id: r
        for r in bm25_topk_df(
            spark, _docs_df(spark, crafted_dir), terms=TERMS, k=10
        ).collect()
    }
    assert (g[1].n_match_terms, g[1].tf_sum, g[1].dl) == (3, 4, 4)
    assert (g[3].n_match_terms, g[3].tf_sum, g[3].dl) == (2, 3, 3)
    assert (g[4].n_match_terms, g[4].tf_sum, g[4].dl) == (1, 3, 4)


def test_single_term_and_k_cut(spark, crafted_dir):
    got = bm25_topk_df(
        spark, _docs_df(spark, crafted_dir), terms=("gamma",), k=2
    ).collect()
    # gamma: tf 3 in doc 4 (dl 4), tf 1 in docs 1/8 (dl 4) -> doc 4 first,
    # then the doc_id tie-break between the equal-scored 1 and 8
    assert [(r.rank, r.doc_id) for r in got] == [(1, 4), (2, 1)]


def test_no_match_returns_empty(spark, crafted_dir):
    got = bm25_topk_df(
        spark, _docs_df(spark, crafted_dir), terms=("zzz",), k=5
    ).collect()
    assert got == []


@pytest.mark.parametrize("sf_name", ["sf0.001", "sf0.01", "sf0.1"])
def test_margin_floor_on_synthetic_corpus(spark, sf_name):
    """The value-oracle safety argument: adjacent-rank score gaps around
    the registered top-k cut must dwarf cross-engine ln noise (~1e-15).
    Exact ties (identical score bits) are legitimate — doc_id breaks them
    identically in both engines — so only NONZERO gaps are floored.
    Asserted at EVERY scale factor the driver oracles or benches (ADVICE
    r9: a sub-noise nonzero gap straddling the cut at an unasserted sf
    would make the two engines return different row sets); missing
    fixtures skip loudly rather than silently passing."""
    sf = f"/root/testdata/{sf_name}"
    if not os.path.isdir(sf):
        pytest.skip(f"testdata fixture {sf} not present on this host")
    rows = bm25_topk_df(
        spark,
        _docs_df(spark, sf),
        terms=BM25_QUERY_TERMS,
        k=BM25_TOP_K + 3,  # gaps across the cut itself
        with_score=True,
    ).collect()
    assert len(rows) >= BM25_TOP_K + 3
    scores = [r.score for r in rows]
    gaps = [a - b for a, b in zip(scores, scores[1:])]
    assert all(g >= 0 for g in gaps)
    nonzero = [g for g in gaps if g != 0.0]
    assert nonzero and min(nonzero) > 1e-6


def test_plan_is_topk_broadcast_only(spark, crafted_dir):
    plan = (
        bm25_topk_df(spark, _docs_df(spark, crafted_dir), terms=TERMS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # no global sort for the top-k
    assert "SortMergeJoin" not in plan  # stats ride a one-row broadcast
    assert "Exchange hashpartitioning" not in plan  # zero keyed shuffles


def test_materialized_plan_never_rescans_text(spark, crafted_dir):
    # r12 (VERDICT r11 #1): with the default materialize=True, the
    # corpus-stats branch AND the scoring branch both read the
    # checkpointed narrow per-doc frame — the final plan must contain NO
    # parquet scan of the text column at all (tokenize+certify ran
    # exactly once, at checkpoint build)
    df = bm25_topk_df(spark, _docs_df(spark, crafted_dir), terms=TERMS)
    from thesis_iceberg_spark.plans import formatted_plan

    fplan = formatted_plan(df)
    assert not any(
        "ReadSchema" in ln and "text:string" in ln for ln in fplan.splitlines()
    ), fplan
    # the non-materialized form keeps the old two-branch shape (the knob
    # is real, not dead code)
    df2 = bm25_topk_df(
        spark, _docs_df(spark, crafted_dir), terms=TERMS, materialize=False
    )
    fplan2 = formatted_plan(df2)
    assert any(
        "ReadSchema" in ln and "text:string" in ln for ln in fplan2.splitlines()
    ), fplan2


def test_empty_corpus(spark, tmp_path):
    d = _write_docs(spark, tmp_path, [(1, None), (2, "")], name="bm25empty")
    assert bm25_topk_df(spark, _docs_df(spark, d), terms=("x",)).collect() == []


def test_registered_query_matches_duckdb_oracle(spark, tmp_path):
    import duckdb

    from thesis_iceberg_spark.oracle import compare_query
    from thesis_iceberg_spark.queries import REGISTRY, queries

    queries()
    # crafted corpus INCLUDING the registered terms with ties + edge docs
    rows = CRAFTED + [
        (9, "dup join slow"),
        (10, "dup dup filler filler filler"),
        (11, "join slow join slow"),
        (12, "slow"),
        (13, "dup join slow"),  # dup of 9: exact tie across the engines
        (14, "dup\x0bjoin slow"),  # \x0B folds to a space in BOTH engines
    ]
    d = _write_docs(spark, tmp_path, rows, name="bm25oracle")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    spec = REGISTRY["search_bm25_topk"]
    res = compare_query(spark, con, "search_bm25_topk", spec.fn, spec.oracle, d)
    assert res.ok, str(res)
