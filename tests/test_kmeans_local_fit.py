"""Local BLAS-3 spherical-kmeans fit for the large-k regime (round 9):
pyspark.ml's k-means|| init is O(k^2) single-threaded on the driver and
never finishes by k ~ 15k, so past KMEANS_LOCAL_FIT_K_THRESHOLD the fit
runs locally on the bounded sample.  These tests pin determinism, cluster
recovery on separable data, the empty-cluster reseed, and the m >= k
contract — no SparkSession needed, the kernel is pure numpy."""

from __future__ import annotations

import numpy as np
import pytest

from thesis_iceberg_spark.queries.dedup import _fit_centroids_spherical


def _separable(n_per: int = 50, k: int = 4, d: int = 16, seed: int = 7):
    """k well-separated direction clusters on the unit sphere."""
    rng = np.random.default_rng(seed)
    anchors = rng.standard_normal((k, d))
    anchors /= np.linalg.norm(anchors, axis=1)[:, None]
    rows, labels = [], []
    for c, a in enumerate(anchors):
        noise = rng.standard_normal((n_per, d)) * 0.05
        rows.append(a[None, :] + noise)
        labels += [c] * n_per
    return np.vstack(rows), np.array(labels), anchors


def test_deterministic_across_calls():
    X, _, _ = _separable()
    a = _fit_centroids_spherical(X, k=4, seed=42)
    b = _fit_centroids_spherical(X, k=4, seed=42)
    assert a == b
    c = _fit_centroids_spherical(X, k=4, seed=43)
    assert a != c  # different seed, different init


def test_recovers_separable_clusters():
    X, labels, anchors = _separable()
    C = np.array(_fit_centroids_spherical(X, k=4, seed=1))
    # every learned centroid should be ~parallel to exactly one anchor
    sims = (C / np.linalg.norm(C, axis=1)[:, None]) @ anchors.T
    best = sims.max(axis=1)
    assert (best > 0.99).all()
    assert len(set(sims.argmax(axis=1))) == 4  # a bijection, not a collapse
    # and assignment by cosine must reproduce the generating partition
    assign = np.argmax((X / np.linalg.norm(X, axis=1)[:, None]) @ C.T, axis=1)
    for c in range(4):
        members = assign[labels == c]
        assert (members == members[0]).all()


def test_centroids_unit_norm_and_shape():
    X, _, _ = _separable()
    C = np.array(_fit_centroids_spherical(X, k=4, seed=5))
    assert C.shape == (4, 16)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-5)


def test_duplicate_point_corpus_reseeds_empty_clusters():
    # 3 distinct directions but k=8: >= 5 clusters go empty every round and
    # must reseed without NaNs or collapse
    base = np.eye(3, 12)
    X = np.repeat(base, 20, axis=0)
    C = np.array(_fit_centroids_spherical(X, k=8, seed=3))
    assert np.isfinite(C).all()
    assert C.shape == (8, 12)
    # the 3 real directions are all represented
    sims = C @ base.T
    assert (sims.max(axis=0) > 0.99).all()


def test_zero_rows_dropped_from_fit():
    """Zero-norm rows have no direction: they are excluded before init,
    so no centroid can be seeded dead-zero and every centroid stays unit
    norm (pre-fix they argmaxed to centroid 0 and could seed a dead one)."""
    X = np.vstack([np.zeros((5, 8)), np.eye(8)[:4]])
    C = np.array(_fit_centroids_spherical(X, k=2, seed=11))
    assert np.isfinite(C).all()
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-6)


def test_zero_rows_do_not_count_toward_k():
    # 5 zero rows + 1 real row cannot seed k=2 centroids
    X = np.vstack([np.zeros((5, 8)), np.eye(8)[:1]])
    with pytest.raises(ValueError, match="zero-norm"):
        _fit_centroids_spherical(X, k=2, seed=0)


def test_sample_smaller_than_k_raises():
    X = np.random.default_rng(0).standard_normal((10, 8))
    with pytest.raises(ValueError, match="sample"):
        _fit_centroids_spherical(X, k=11, seed=0)


def test_fit_centers_arrow_collection_path(spark, monkeypatch):
    """_kmeans_fit_centers' large-k branch collects the sample as ONE
    Arrow table and views the flat values buffer (ADVICE r9: the pandas
    object-column path held a Python list per row).  Force the branch at
    tiny k via the threshold and pin shape, unit norm, determinism."""
    from thesis_iceberg_spark.operators.ann import clean_embeddings
    from thesis_iceberg_spark.queries import dedup

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(64)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    clean, _, n = clean_embeddings(df)
    monkeypatch.setattr(dedup, "KMEANS_LOCAL_FIT_K_THRESHOLD", 2)
    c1 = dedup._kmeans_fit_centers(spark, clean, k=4, n=n, seed=5)
    c2 = dedup._kmeans_fit_centers(spark, clean, k=4, n=n, seed=5)
    C = np.array(c1)
    assert C.shape == (4, 8)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0, atol=1e-6)
    assert c1 == c2  # deterministic across calls
