"""semdedup_keepers: both keeper modes on crafted clusters (round 6,
VERDICT r5 #6).  The registered query keeps min vec_id (deterministic
integers, engine-portable hashing); keeper='centroid_far' implements
Abbas et al.'s published rule — keep the member with the LOWEST cosine to
the cluster centroid, preserving diversity.  Floats argmin near-ties are
why this mode is pytest-pinned instead of SQL-oracled."""

from __future__ import annotations

import pytest

from thesis_iceberg_spark.queries.dedup import semdedup_keepers


@pytest.fixture()
def emb_dir(spark, tmp_path):
    # cluster A (ids 1,2,3): 3 is scaled on its first 8 dims — every pair
    # stays above the 0.45 LSH threshold and shares its top-16 signed
    # dims (bucket collision certain), but 3 is the least-typical member:
    # cos(v3, centroid) < cos(v1, centroid) ~ cos(v2, centroid).
    # cluster B (ids 10,11): identical vectors — all centroid cosines tie
    # at 1.0, so the keeper falls back to min vec_id.
    # id 20: singleton, never paired, absent from the output (near-dup
    # convention: unpaired vectors are their own canonical).
    a = [1.0] * 64
    v2 = a[:]
    v2[63] = 1.1
    v3 = [3.0] * 8 + [1.0] * 56
    neg = [-1.0] * 64
    lone = [1.0] * 32 + [-1.0] * 32
    rows = [(1, a), (2, v2), (3, v3), (10, neg), (11, neg[:]), (20, lone)]
    d = str(tmp_path / "sem")
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).write.parquet(f"{d}/embeddings.parquet")
    return d


def test_min_id_keeper_matches_registered_rule(spark, emb_dir):
    got = {
        r.vec_id: r.canonical_vec_id
        for r in semdedup_keepers(spark, emb_dir, keeper="min_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_centroid_far_keeper_picks_least_typical(spark, emb_dir):
    got = {
        r.vec_id: r.canonical_vec_id
        for r in semdedup_keepers(spark, emb_dir, keeper="centroid_far").collect()
    }
    # cluster A keeps 3 (lowest centroid cosine); B ties -> min id 10
    assert got == {1: 3, 2: 3, 3: 3, 10: 10, 11: 10}


def test_unknown_keeper_rejected(spark, emb_dir):
    with pytest.raises(ValueError, match="unknown semdedup keeper"):
        semdedup_keepers(spark, emb_dir, keeper="median")
