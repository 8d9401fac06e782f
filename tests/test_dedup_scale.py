"""The LSH/IVF-bucketed embedding near-dup operator vs its brute-force
baseline: the registered query must find (a subset of) the true near-dup
pairs with high recall and zero false positives — candidates are exact-
verified, so precision is 1.0 by construction and we assert it."""

from __future__ import annotations

import os

import pytest

from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.dedup import dedup_embedding_cosine_pairs

queries()

SF01 = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")


def test_embedding_lsh_recall_and_precision(spark, sf_dir):
    brute = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_cosine_pairs(spark, sf_dir)
        .select("vec_a", "vec_b")
        .collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in REGISTRY["dedup_embedding_lsh_pairs"]
        .fn(spark, sf_dir)
        .select("vec_a", "vec_b")
        .collect()
    }
    assert lsh <= brute, f"false positives: {sorted(lsh - brute)[:5]}"
    assert brute, "baseline found no near-dup pairs — threshold broken?"
    recall = len(lsh & brute) / len(brute)
    # tiered LSH measures 1.0 at sf0.001/sf0.01 (pair tier) and 0.861 at
    # sf0.1 (triple+anchor tier); 0.85 is the regression floor
    assert recall >= 0.85, f"recall {recall:.2f} < 0.85 ({len(lsh)}/{len(brute)})"


@pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.1 testdata not present on this machine"
)
def test_embedding_lsh_sf01_candidates_subquadratic_and_recall(spark):
    """The VERDICT r3 scale gate, pinned to sf0.1 (n=2000 — the smallest
    corpus where the compound triple+anchor tier engages): candidate
    volume <= 0.05*n^2 AND recall >= 0.85 simultaneously.  The round-3
    fixed-width signature sat at 0.18*n^2 — quadratic with a big constant;
    the tiny-corpus pair tier deliberately trades candidate volume for
    recall and is exempt from the volume gate."""
    from thesis_iceberg_spark.queries.dedup import (
        _emb_norms,
        _embedding_lsh_candidates,
    )
    from thesis_iceberg_spark.sources.registry import load_table

    sf01 = SF01
    raw = load_table(spark, sf01, "embeddings")
    n = raw.count()
    cand = _embedding_lsh_candidates(spark, raw, _emb_norms(raw)).count()
    assert cand <= 0.05 * n * n, f"candidates {cand} > 0.05*{n}^2"

    brute = {
        (r.vec_a, r.vec_b)
        for r in dedup_embedding_cosine_pairs(spark, sf01)
        .select("vec_a", "vec_b")
        .collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in REGISTRY["dedup_embedding_lsh_pairs"]
        .fn(spark, sf01)
        .select("vec_a", "vec_b")
        .collect()
    }
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.85, f"sf0.1 recall {recall:.3f} < 0.85"


def test_embedding_lsh_big_corpus_tier_executes(spark, sf_dir, monkeypatch):
    """The >=1M-vector tier (quads over top-16 + anchor triples) is dead
    code at test scale; force it via SIG_TIERS so the arity-4 join chain
    and anchor union actually execute, produce only verified-true pairs,
    and keep a non-cartesian plan."""
    from thesis_iceberg_spark.queries import dedup

    monkeypatch.setattr(
        dedup, "SIG_TIERS", ((1, 2, 16, 0), (2, 3, 12, 6), (None, 4, 16, 8))
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
    assert lsh <= brute  # exact verification: precision 1.0 by construction
    assert brute and len(lsh & brute) / len(brute) >= 0.85
