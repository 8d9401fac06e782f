"""CCNet-style unigram-LM rarity / perplexity filter (round 9).

The registered text_lm_rarity_stats carries the EXACT half (integer
counts + single-division ratios, full DuckDB value oracle); the ln-based
perplexity column is excluded from the oracle (JVM StrictMath vs libm
differ by 1 ulp) and pinned here against a pure-Python reference.
"""

from __future__ import annotations

import math

import pytest

from thesis_iceberg_spark.queries.text import (
    LM_VOCAB_SIZE_REGISTERED,
    lm_rarity_df,
    lm_unigram_vocab,
)


def _write_docs(spark, tmp_path, rows, name="lmcorpus"):
    d = str(tmp_path / name)
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").coalesce(
        1
    ).write.parquet(f"{d}/documents.parquet")
    return d


# corpus token counts: the=7, cat/mat/on/sat=2, dog/zebra/quark=1.
# At v=4 the vocab is {the, cat, mat, on} — 'sat' ties the boundary count
# (2) but loses the token-ASC tie-break, so it is OOV: the cut is pinned.
CRAFTED = [
    (1, "The cat sat on the  mat"),  # mixed case + double space
    (2, "the the the dog"),
    (3, ""),  # empty
    (4, None),  # NULL text scores as empty
    (5, "   "),  # whitespace-only
    (6, "zebra quark"),  # all-OOV at v=4
    (7, "the cat sat on the mat"),  # duplicate of 1 (normalized)
]


@pytest.fixture()
def crafted_dir(spark, tmp_path):
    return _write_docs(spark, tmp_path, CRAFTED)


def _docs_df(spark, d):
    from thesis_iceberg_spark.sources.registry import load_table

    return load_table(spark, d, "documents")


def test_vocab_topv_tie_breaks_on_token_asc(spark, crafted_dir):
    vocab = {
        r.t: r.c for r in lm_unigram_vocab(_docs_df(spark, crafted_dir), 4).collect()
    }
    assert vocab == {"the": 7, "cat": 2, "mat": 2, "on": 2}


def test_exact_stats_match_hand_computation(spark, crafted_dir):
    got = {
        r.doc_id: r.asDict()
        for r in lm_rarity_df(spark, _docs_df(spark, crafted_dir), v=4).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}
    for empty in (3, 4, 5):
        e = got[empty]
        assert (e["n_tokens"], e["n_oov"], e["sum_vocab_cnt"]) == (0, 0, 0)
        assert e["oov_frac"] is None and e["mean_vocab_cnt"] is None
    d1 = got[1]
    assert (d1["n_tokens"], d1["n_oov"], d1["sum_vocab_cnt"]) == (6, 1, 20)
    assert d1["oov_frac"] == pytest.approx(1 / 6)
    assert d1["mean_vocab_cnt"] == 4.0
    d2 = got[2]
    assert (d2["n_tokens"], d2["n_oov"], d2["sum_vocab_cnt"]) == (4, 1, 21)
    assert d2["oov_frac"] == 0.25 and d2["mean_vocab_cnt"] == 7.0
    d6 = got[6]
    assert (d6["n_tokens"], d6["n_oov"], d6["sum_vocab_cnt"]) == (2, 2, 0)
    assert d6["oov_frac"] == 1.0 and d6["mean_vocab_cnt"] is None
    assert got[7] == {**got[1], "doc_id": 7}  # normalization-equal dup


def test_perplexity_matches_python_reference(spark, crafted_dir):
    got = {
        r.doc_id: r.ppl
        for r in lm_rarity_df(
            spark, _docs_df(spark, crafted_dir), v=4, perplexity=True
        ).collect()
    }
    # reference LM: add-one smoothing, N = 18 corpus tokens, V = 4
    counts = {"the": 7, "cat": 2, "mat": 2, "on": 2}
    n_total, v_size = 18, 4

    def ref_ppl(text):
        toks = (text or "").strip().lower().split()
        if not toks:
            return None
        nll = -sum(
            math.log((counts.get(t, 0) + 1) / (n_total + v_size + 1)) for t in toks
        )
        return math.exp(nll / len(toks))

    for doc_id, text in CRAFTED:
        if ref_ppl(text) is None:
            assert got[doc_id] is None
        else:
            assert got[doc_id] == pytest.approx(ref_ppl(text), rel=1e-9)
    assert got[1] == got[7]  # duplicate docs score identically
    # all-OOV doc must score strictly worse than the stopword-heavy doc
    assert got[6] > got[2]


def test_map_and_join_modes_agree(spark, crafted_dir):
    """The O(V)-per-token map path and the broadcast-hash-join path must
    produce identical rows (integers exactly, ppl to float summation
    order) — the auto switch at LM_SCORE_JOIN_V_CEILING must never change
    results, only the plan."""
    docs = _docs_df(spark, crafted_dir)
    for ppl in (False, True):
        a = {
            r.doc_id: r.asDict()
            for r in lm_rarity_df(spark, docs, v=4, perplexity=ppl, mode="map").collect()
        }
        b = {
            r.doc_id: r.asDict()
            for r in lm_rarity_df(
                spark, docs, v=4, perplexity=ppl, mode="join"
            ).collect()
        }
        assert set(a) == set(b)
        for did in a:
            ra, rb = a[did], b[did]
            pa, pb = ra.pop("ppl", None), rb.pop("ppl", None)
            assert ra == rb, (did, ra, rb)
            if pa is None or pb is None:
                assert pa == pb
            else:
                assert pb == pytest.approx(pa, rel=1e-12)


def test_join_mode_is_default_at_production_v(spark, crafted_dir):
    from thesis_iceberg_spark.queries.text import (
        LM_SCORE_JOIN_V_CEILING,
        LM_VOCAB_SIZE,
    )

    assert LM_VOCAB_SIZE > LM_SCORE_JOIN_V_CEILING  # production V auto-joins
    assert LM_VOCAB_SIZE_REGISTERED <= LM_SCORE_JOIN_V_CEILING  # driver: map
    docs = _docs_df(spark, crafted_dir)
    plan = (
        lm_rarity_df(spark, docs, v=LM_VOCAB_SIZE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # hash-probed broadcast join, not a per-token map scan; the per-doc
    # re-aggregation is the one keyed shuffle
    assert "BroadcastHashJoin" in plan
    assert "map_from_entries" not in plan


def test_registered_query_matches_duckdb_oracle(spark, tmp_path):
    # cross-engine gate on a corpus with MORE distinct tokens than the
    # registered V=16, so the OOV left-join-miss arm is exercised end to
    # end (the driver's synthetic corpus has 31 distinct tokens — same
    # regime); includes empty/NULL/whitespace docs and a boundary tie.
    import duckdb

    from thesis_iceberg_spark.oracle import compare_query
    from thesis_iceberg_spark.queries import REGISTRY, queries

    queries()
    rows = list(CRAFTED) + [
        (8, " ".join(f"w{i:02d} common common" for i in range(20))),
        (9, "common " * 30),
        # \x0B: Java \s matches it, RE2's does not — _lm_ftoks folds it
        # to a space in BOTH engines so the twins agree (the Arrow
        # shingle kernels certify-and-raise instead; this family
        # normalizes because the whole query runs JVM-side)
        (10, "common\x0bcommon the\x0b\x0bcat"),
    ]
    d = _write_docs(spark, tmp_path, rows, name="lmoracle")
    assert (
        _docs_df(spark, d).count() == len(rows)
        and LM_VOCAB_SIZE_REGISTERED < 8 + 20 + 1
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    spec = REGISTRY["text_lm_rarity_stats"]
    res = compare_query(spark, con, "text_lm_rarity_stats", spec.fn, spec.oracle, d)
    assert res.ok, str(res)


def test_scoring_side_is_broadcast_only(spark, crafted_dir):
    # the per-doc scoring joins must be broadcast (one-row vocab map +
    # one-row totals): no SortMergeJoin anywhere in the plan
    plan = lm_rarity_df(spark, _docs_df(spark, crafted_dir), v=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
