"""Learned IVF index for ANN search (pyspark.ml KMeans integration).

similarity.py's ann_ivf_topk uses deterministic fixed centroids so it can
be value-oracled; this is the production variant: centroids LEARNED with
seeded KMeans (pyspark.ml, JVM-side), vectors assigned at "index build"
time, queries probing only the nprobe nearest buckets.

At 100 TB the assignment is the write-time partition key (one pass at
ingest); a query then scans nprobe/k of the corpus — the same partition-
pruning shape as the fixed-centroid variant, with much better bucket
balance on real embedding distributions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _dot(u: Column, w: Column) -> Column:
    return F.aggregate(F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda a, p: a + p)


def _cosine(u: Column, w: Column) -> Column:
    # try_divide: zero-norm vectors yield NULL (sorts last in both Spark
    # and DuckDB under DESC) instead of throwing under ANSI
    return F.try_divide(_dot(u, w), F.sqrt(_dot(u, u)) * F.sqrt(_dot(w, w)))


def build_ivf_index(
    spark: SparkSession, embeddings: DataFrame, k: int = 8, seed: int = 42
) -> tuple[DataFrame, "KMeansModel"]:  # noqa: F821 — pyspark.ml imported lazily
    """Fit seeded KMeans on the embedding column; returns (corpus with a
    ``bucket`` column — the learned inverted-file assignment, fitted model).

    Degenerate rows: NULL embeddings and rows whose width differs from the
    corpus's canonical dimension (the first non-null row's) are excluded
    from BOTH fit and assignment — pyspark.ml KMeans throws opaquely on
    null/ragged features, and a wrong-width vector has no meaningful
    bucket anyway."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    clean, _dim, n_clean = clean_embeddings(embeddings)
    if n_clean < 2:
        raise ValueError(
            "build_ivf_index: fewer than 2 clean (non-null, modal-width) "
            "embeddings — nothing meaningful to index"
        )
    # k must not exceed the CLEAN point count (KMeans indexes centers by
    # point otherwise); callers size k off the raw count, which can be
    # larger when degenerate rows were dropped above
    k = max(2, min(k, n_clean))
    vecs = clean.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="bucket").fit(vecs)
    return model.transform(vecs).drop("features"), model


def clean_embeddings(embeddings: DataFrame) -> tuple[DataFrame, int, int]:
    """(clean_df, dim, count): rows restricted to the corpus's MODAL
    embedding width, NULLs dropped.

    The canonical dimension is the MOST COMMON width (ties broken toward
    the wider), not the arbitrary first row's — one truncated row ahead
    of a million good ones must not silently redefine the corpus width
    and drop the majority (review finding, round 7).  One cheap
    aggregation on size(embedding)."""
    nn = embeddings.filter(F.col("embedding").isNotNull())
    mode = (
        nn.groupBy(F.size("embedding").alias("d"))
        .count()
        .orderBy(F.col("count").desc(), F.col("d").desc())
        .first()
    )
    if mode is None:
        return nn, 0, 0
    dim = int(mode["d"])
    return nn.filter(F.size("embedding") == dim), dim, int(mode["count"])


def ivf_topk(
    spark: SparkSession,
    indexed: DataFrame,
    model,
    query_vec_id: int,
    top_k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k cosine neighbors of ``query_vec_id`` probing only the nprobe
    centroids closest to the query."""
    import numpy as np

    q_row = indexed.filter(F.col("vec_id") == query_vec_id).select("embedding").first()
    if q_row is None:
        raise KeyError(f"vec_id {query_vec_id} not found")
    q = np.asarray(q_row[0], dtype=np.float64)
    centers = model.clusterCenters()

    def cos(a, b):
        # zero-norm guard: NaN would make the probe sort arbitrary; -inf
        # deterministically ranks degenerate centroids last
        d = np.linalg.norm(a) * np.linalg.norm(b)
        return float(np.dot(a, b) / d) if d > 0 else float("-inf")

    probe = sorted(
        range(len(centers)), key=lambda i: (-cos(q, np.asarray(centers[i])), i)
    )[:nprobe]

    qv = F.array(*[F.lit(float(x)) for x in q])
    v = F.transform("embedding", lambda x: x.cast("double"))
    return (
        indexed.filter(F.col("bucket").isin(probe))
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "label", "bucket", _cosine(v, qv).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(top_k)
    )
