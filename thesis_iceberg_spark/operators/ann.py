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

    clean = embeddings.filter(F.col("embedding").isNotNull())
    head = clean.select(F.size("embedding").alias("d")).first()
    if head is None:
        raise ValueError("build_ivf_index: no non-null embeddings to index")
    clean = clean.filter(F.size("embedding") == head["d"])
    # k must not exceed the CLEAN point count (KMeans indexes centers by
    # point otherwise); callers size k off the raw count, which can be
    # larger when degenerate rows were dropped above
    k = max(2, min(k, clean.count()))
    vecs = clean.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="bucket").fit(vecs)
    return model.transform(vecs).drop("features"), model


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
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

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
