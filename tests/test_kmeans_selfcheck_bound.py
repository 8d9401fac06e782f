"""Bounded brute-force denominator in the registered kmeans self-check
(VERDICT r6-r8, ask #1): past BRUTE_CHECK_CEILING vectors the recall
ground truth runs on a deterministic md5-keyed subsample, so the CHECK
itself is O(n) instead of O(n^2).  sf0.1 (2,000 vectors) exercises the
sampled path; the driver's sf0.01 corpus (500) stays below the ceiling
and remains bit-exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from thesis_iceberg_spark.queries.dedup import BRUTE_CHECK_CEILING
from thesis_iceberg_spark.queries.dedup import dedup_embedding_kmeans_pairs
from thesis_iceberg_spark.sources.registry import load_table

SF01 = "/root/testdata/sf0.1"


def test_ceiling_keeps_driver_sf001_exact():
    """The driver oracles at sf0.01 (500 vectors): the ceiling must sit
    above it so the driver-checked result is the EXACT pre-r9 check, and
    below sf0.1's 2,000 so the sampled path has test coverage at all."""
    assert 500 <= BRUTE_CHECK_CEILING < 2000


def test_booleans_hold_on_sampled_path(spark):
    """sf0.1 is above the ceiling: recall is estimated on pairs within the
    md5 sample and must still clear the 0.7 gate (measured path recall is
    ~1.0, PERFORMANCE.md), and the candidate-ratio gate is untouched."""
    (row,) = dedup_embedding_kmeans_pairs(spark, SF01).collect()
    assert row["n_docs"] == 2000
    assert row["subquadratic_ok"] is True
    assert row["recall_ok"] is True


def test_md5_sample_is_deterministic_and_exact_size(spark):
    ids = load_table(spark, SF01, "embeddings").select("vec_id")
    take = lambda: [  # noqa: E731
        r["vec_id"]
        for r in ids.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(BRUTE_CHECK_CEILING)
        .collect()
    ]
    a, b = take(), take()
    assert a == b
    assert len(a) == BRUTE_CHECK_CEILING
    assert len(set(a)) == BRUTE_CHECK_CEILING
