"""The LSH/IVF-bucketed embedding near-dup operator vs its brute-force
baseline: the registered query must find (a subset of) the true near-dup
pairs with high recall and zero false positives — candidates are exact-
verified, so precision is 1.0 by construction and we assert it."""

from __future__ import annotations

from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.dedup import dedup_embedding_cosine_pairs

queries()


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
    # compound cross-polytope LSH measures 1.0 at sf0.001/sf0.01 and 0.889
    # at sf0.1; 0.85 is the regression floor at the default test SF
    assert recall >= 0.85, f"recall {recall:.2f} < 0.85 ({len(lsh)}/{len(brute)})"
