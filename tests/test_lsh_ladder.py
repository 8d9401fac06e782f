"""Closed-form scale guarantees for the generative embedding-LSH ladder
(VERDICT r4 #1: the former fixed top rung reverted to c*n^2 past 1e8
vectors).  No giant corpus needed: the guarantees are arithmetic over the
bucket space C(128, arity), verified for every count up to 1e9 and past
the ladder's end, plus small forced-execution runs proving the high-arity
join chains, base-128 keys, and the per-bucket overflow guard are live
code paths, not dead configuration."""

from __future__ import annotations

import math

import pytest

from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.dedup import (
    _ANCHOR_OFFSET,
    _SIGNED_DIMS,
    _lsh_tier,
    SIG_TIERS,
    dedup_embedding_cosine_pairs,
)

queries()

# a log-spaced count grid: every decade 1e3..1e9 plus each rung boundary
# from both sides
_GRID = sorted(
    {10**e for e in range(3, 10)}
    | {3 * 10**e for e in range(3, 9)}
    | {b - 1 for b, *_ in SIG_TIERS if b is not None}
    | {b for b, *_ in SIG_TIERS if b is not None and b < SIG_TIERS[-1][0]}
)


def test_random_collision_floor_linear_up_to_1e9():
    """The selected rung's random-collision candidate floor n^2/B must stay
    <= 0.05*n^2 everywhere AND <= n/10 for every generative rung (n >= 1M),
    for BOTH the main component and the anchor component."""
    for n in _GRID:
        arity, dims, anchor = _lsh_tier(n)
        b_main = math.comb(_SIGNED_DIMS, arity)
        assert n * n / b_main <= 0.05 * n * n, (n, arity)
        if n >= 1_000_000:
            assert n * n / b_main <= n / 10, (n, arity, b_main)
            if anchor:
                # anchor buckets live one arity down, so their floor
                # constant is (129-a)/(10a) <= 3.125 at a=4 — still O(n)
                b_anchor = math.comb(_SIGNED_DIMS, arity - 1)
                assert n * n / b_anchor <= 3.2 * n, (n, arity, b_anchor)


def test_ladder_shape_and_key_arithmetic():
    """Arity is monotone in n, feasible (arity <= sig width, anchor rank <=
    sig width), per-vector bucket rows stay bounded, and base-128 long keys
    never collide across the main/anchor namespaces or overflow."""
    prev_arity = 0
    for n in _GRID:
        arity, dims, anchor = _lsh_tier(n)
        assert arity >= prev_arity, "arity must not shrink as n grows"
        prev_arity = arity
        assert arity <= dims and (not anchor or anchor <= dims)
        # bounded per-vector work: signature cost independent of corpus size
        rows = math.comb(dims, arity) + (
            math.comb(anchor, arity - 1) if anchor else 0
        )
        # C(16,8) main + C(13,7) anchor at the top rung
        assert rows <= 12870 + 1716, (n, rows)
        # main keys stay below the anchor namespace; anchor keys fit a long
        assert 128**arity <= _ANCHOR_OFFSET
        assert _ANCHOR_OFFSET + 128 ** (arity - 1) < 2**63


def test_past_the_ladder_raises_loudly():
    top_bound = SIG_TIERS[-1][0]
    assert top_bound is not None and top_bound > 10**11
    with pytest.raises(NotImplementedError, match="exceeds the LSH ladder"):
        _lsh_tier(top_bound)


def test_forced_arity7_rung_executes(spark, sf_dir, monkeypatch):
    """The arity-7 rung (selected around n=1e9) on tiny data: the 7-way
    tuple join, anchor 6-tuples, and base-128 key build must execute and
    keep precision 1.0 (candidates are exact-verified)."""
    from thesis_iceberg_spark.queries import dedup

    monkeypatch.setattr(
        dedup, "SIG_TIERS", ((1, 2, 16, 0), (2, 3, 12, 6), (None, 7, 16, 11))
    )
    lsh = {
        (r.vec_a, r.vec_b)
        for r in REGISTRY["dedup_embedding_lsh_pairs"]
        .fn(spark, sf_dir)
        .select("vec_a", "vec_b")
        .collect()
    }
    brute = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_cosine_pairs(spark, sf_dir)
        .select("vec_a", "vec_b")
        .collect()
    }
    assert lsh <= brute, f"false positives: {sorted(lsh - brute)[:5]}"


def test_bucket_overflow_guard_fires(spark, sf_dir, monkeypatch):
    """With the cap forced to 1, any bucket collision (which near-dup data
    must produce) raises the executor-side overflow error instead of
    squaring into candidates."""
    from thesis_iceberg_spark.queries import dedup

    monkeypatch.setattr(dedup, "BUCKET_CAP", 1)
    with pytest.raises(Exception, match="LSH bucket overflow"):
        REGISTRY["dedup_embedding_lsh_pairs"].fn(spark, sf_dir).collect()


def _planted_fixture(tmp_path):
    """n=1200 embeddings: 600 random unit vectors + 150 planted near-dups
    at each pair cosine in {0.7, 0.8, 0.9, 0.95} (v' = c*v + sqrt(1-c^2)*u
    with u orthonormal — the pair cosine is exact by construction).
    Deterministic seed: the measurement is exactly reproducible."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    dim, nbase = 64, 600
    base = rng.standard_normal((nbase, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows, pairs = [], {}
    for i in range(nbase):
        rows.append(base[i])
    vid = nbase
    for c in (0.7, 0.8, 0.9, 0.95):
        for i in range(0, nbase, 4):
            v = base[i]
            g = rng.standard_normal(dim)
            g -= g @ v * v
            g /= np.linalg.norm(g)
            rows.append(c * v + math.sqrt(1 - c * c) * g)
            pairs[(i, vid)] = c
            vid += 1
    t = pa.table(
        {
            "vec_id": pa.array(range(len(rows)), pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in r] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array(["x"] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path), pairs


@pytest.mark.parametrize(
    "arity,gates",
    [
        (5, {0.7: 0.95, 0.8: 0.95, 0.9: 0.95}),  # measured 1.0 everywhere
        (8, {0.8: 0.90, 0.9: 0.95}),  # measured 0.94 / 1.0
    ],
)
def test_generative_rung_recall_on_planted_near_dups(
    spark, tmp_path, monkeypatch, arity, gates
):
    """MEASURED recall at the generative rungs (round-5 sweep, documented
    at SIG_TIERS): on planted near-dups the first (a=5) and top (a=8)
    rungs hold recall at the similarity grades near-dup mining actually
    targets at 1e8-1e9 vectors (cosine >= 0.8); the a=8 gate at 0.8 is
    deliberately the weakest measured point (0.94).  Deterministic
    fixture + deterministic algorithm -> no flake margin needed beyond
    the documented gates."""
    from thesis_iceberg_spark.queries import dedup

    loc, pairs = _planted_fixture(tmp_path)
    monkeypatch.setattr(
        dedup,
        "SIG_TIERS",
        ((1, 2, 16, 0), (2, 3, 12, 6), (None, arity, 16, dedup._ANCHOR_RANK)),
    )
    raw = dedup.load_table(spark, loc, "embeddings")
    cand = {
        (r.vec_a, r.vec_b)
        for r in dedup._embedding_lsh_candidates(
            spark, raw, dedup._emb_norms(raw)
        ).collect()
    }
    cand = {(min(a, b), max(a, b)) for a, b in cand}
    n = 1200
    assert len(cand) <= 0.05 * n * n, f"candidates {len(cand)} > 0.05*n^2"
    for cos, floor in gates.items():
        tp = {p for p, c in pairs.items() if c == cos}
        recall = len(cand & tp) / len(tp)
        assert recall >= floor, f"arity {arity} recall@{cos} {recall:.3f} < {floor}"


def test_null_and_short_vectors_degrade_gracefully(spark, tmp_path):
    """A NULL embedding emits no signature rows (like the replaced
    posexplode-of-NULL form and the oracle); a vector with fewer coords
    than the signature width emits the fewer valid tuples instead of
    crashing the precomputed-pattern indexing."""
    from thesis_iceberg_spark.queries import dedup

    loc = str(tmp_path / "degenerate")
    rows = [
        (1, [float(i) for i in range(64)]),
        (2, [float(i) for i in range(64)]),  # duplicate of 1 -> candidate
        (3, None),  # NULL embedding
        (4, [1.0, -2.0, 3.0]),  # 3 coords < sig_dims=16 -> C(3,2) tuples
    ]
    spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>").write.parquet(
        f"{loc}/embeddings.parquet"
    )
    raw = dedup.load_table(spark, loc, "embeddings")
    cand = {
        (r.vec_a, r.vec_b)
        for r in dedup._embedding_lsh_candidates(
            spark, raw, dedup._emb_norms(raw)
        ).collect()
    }
    assert (1, 2) in cand
    assert not any(3 in p for p in cand)  # NULL vec never a candidate


def test_exact_substr_spans_crafted(spark, tmp_path):
    """Known span geometry: a 20-token passage shared by two docs yields
    one merged span each ([10,30) and [0,20)); an internal 16-token
    repeat with a 17-token gap stays TWO spans (merge rule: gap <= K);
    an all-unique doc emits nothing."""
    from thesis_iceberg_spark.queries import REGISTRY
    from thesis_iceberg_spark.queries.dedup import EXACT_SUBSTR_K

    assert EXACT_SUBSTR_K == 16  # the geometry below depends on K
    common = [f"w{i}" for i in range(20)]
    x = [f"p{i}" for i in range(16)]
    rows = [
        (1, " ".join([f"a{i}" for i in range(10)] + common + ["b0", "b1"])),
        (2, " ".join(common + [f"c{i}" for i in range(7)])),
        (3, " ".join(f"u{i}" for i in range(30))),
        (4, " ".join(x + ["q0"] + x)),
    ]
    loc = str(tmp_path / "spans")
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").write.parquet(
        f"{loc}/documents.parquet"
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in REGISTRY["dedup_exact_substr_spans"].fn(spark, loc).collect()
    )
    assert got == [
        (1, 10, 30, 20),
        (2, 0, 20, 20),
        (4, 0, 16, 16),
        (4, 17, 33, 16),
    ]
    # the APPLY step cuts exactly those spans and keeps everything else
    cleaned = {
        r.doc_id: r.asDict()
        for r in REGISTRY["pipeline_remove_dup_spans"].fn(spark, loc).collect()
    }
    assert cleaned[1]["kept_text"] == " ".join(
        [f"a{i}" for i in range(10)] + ["b0", "b1"]
    )
    assert cleaned[1]["n_removed_tokens"] == 20
    assert cleaned[2]["kept_text"] == " ".join(f"c{i}" for i in range(7))
    assert cleaned[3]["n_removed_tokens"] == 0  # unique doc untouched
    assert cleaned[3]["kept_text"] == " ".join(f"u{i}" for i in range(30))
    assert cleaned[4]["kept_text"] == "q0"  # both repeats of x cut
