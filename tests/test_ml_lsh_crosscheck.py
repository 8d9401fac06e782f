"""Cross-check our md5-based MinHash+LSH dedup against pyspark.ml's
MinHashLSH: every pair the ml approx-join returns at Jaccard >= 0.5 must
appear in our EXACT n-gram Jaccard pair list (approxSimilarityJoin computes
exact distances on its candidates, so its output is a subset of truth),
and the two candidate generators must agree on the vast majority of pairs
— two independent implementations converging on the same near-dup set."""

from __future__ import annotations

from pyspark.ml.feature import CountVectorizer, MinHashLSH
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries.dedup import (
    JACCARD_THRESHOLD,
    _shingles,
    dedup_minhash_lsh_pairs,
    dedup_ngram_jaccard_pairs,
)


def test_ml_minhash_agrees_with_exact_and_md5_lsh(spark, sf_dir):
    from thesis_iceberg_spark.queries.dedup import _docs

    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", _shingles().alias("sh"))
        .filter(F.size("sh") >= 1)
    )
    cv = CountVectorizer(inputCol="sh", outputCol="features", binary=True).fit(docs)
    feats = cv.transform(docs)  # size>=1 filter above guarantees non-empty vectors
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=12, seed=42
    ).fit(feats)
    joined = (
        lsh.approxSimilarityJoin(feats, feats, 1 - JACCARD_THRESHOLD, distCol="dist")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
        )
    )
    ml_pairs = {(r.doc_a, r.doc_b) for r in joined.collect()}
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    ours = {
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    }
    # ml's exact-verified candidates can never contain a false positive
    assert ml_pairs <= exact, f"ml returned non-pairs: {sorted(ml_pairs - exact)[:5]}"
    assert exact, "exact baseline found no pairs"
    # both LSH implementations must recover most of the exact truth
    assert len(ml_pairs) / len(exact) >= 0.8
    assert len(ours & exact) / len(exact) >= 0.8
