"""Interleaved A/B: build_ivf_index with the local Euclidean Lloyd fit
(r16) vs the r15 pyspark.ml KMeans fit.  Same JVM, alternating passes;
Spark-job counts per build via job groups (the fit's cost at cluster
scale is scheduler round-trips, not local seconds).

The neighbor LIST can differ (different centroids — the registered
output is gate booleans), so the value checks are the gates themselves:
ann_ivf_kmeans_topk's (top_k, n_returned, recall_ok) row at sf0.1 for
both forms, plus the pytest recall/determinism suite on the shipped
form.

Usage: PYTHONPATH=/root/repo python tests/exp_r16_ivf_fit_ab.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import numpy as np
    from pyspark.sql import functions as F

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.operators.ann import build_ivf_index, clean_embeddings, ivf_topk
    from thesis_iceberg_spark.queries import queries
    from thesis_iceberg_spark.sources.registry import load_table

    queries()
    spark = get_spark(app_name="exp_r16_ivf_fit_ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def old_build_ivf_index(embeddings, k=8, seed=42):
        """The r15 pyspark.ml form, reproduced verbatim."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        clean, _dim, n_clean = clean_embeddings(embeddings)
        if n_clean < 2:
            raise ValueError("fewer than 2 clean embeddings")
        k = max(2, min(k, n_clean))
        vecs = clean.withColumn(
            "features", array_to_vector(F.col("embedding").cast("array<double>"))
        )
        model = KMeans(
            k=k, seed=seed, featuresCol="features", predictionCol="bucket"
        ).fit(vecs)
        return model.transform(vecs).drop("features"), model

    corpus = load_table(spark, sf_dir, "embeddings")

    def jobs_in(tag, fn):
        sc.setJobGroup(tag, tag)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        return out, dt, len(sc.statusTracker().getJobIdsForGroup(tag))

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # --- gate parity: both forms' IVF result clears the 0.5 recall gate ------
    def recall_of(build):
        indexed, model = build()
        qid = indexed.agg(F.min("vec_id")).first()[0]
        got = {r.vec_id for r in
               ivf_topk(spark, indexed, model, qid, top_k=10, nprobe=4).collect()}
        from thesis_iceberg_spark.queries.similarity import _cosine, _vecs
        e = _vecs(spark, sf_dir)
        qv = e.filter(F.col("vec_id") == qid).select(F.col("v").alias("qv"))
        truth = {r.vec_id for r in (
            e.crossJoin(F.broadcast(qv))
            .filter(F.col("vec_id") != qid)
            .select("vec_id", _cosine(F.col("v"), F.col("qv")).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col("vec_id"))
            .limit(10)).collect()}
        return len(got & truth) / len(truth), len(got)

    r_new, n_new = recall_of(lambda: build_ivf_index(spark, corpus, k=8))
    r_old, n_old = recall_of(lambda: old_build_ivf_index(corpus, k=8))
    print(f"recall@10 nprobe=4: local fit {r_new:.2f} ({n_new} returned), "
          f"mllib fit {r_old:.2f} ({n_old} returned) — gate is >= 0.5")
    assert r_new >= 0.5 and n_new == 10

    # --- build cost: jobs + seconds per (build + force assignment) -----------
    new_t, old_t, new_j, old_j = [], [], [], []
    for i in range(PASSES):
        (_, dt, nj) = jobs_in(
            f"ivf_new_{i}",
            lambda: force(build_ivf_index(spark, corpus, k=8)[0]),
        )
        new_t.append(dt); new_j.append(nj)
        (_, dt, nj) = jobs_in(
            f"ivf_old_{i}",
            lambda: force(old_build_ivf_index(corpus, k=8)[0]),
        )
        old_t.append(dt); old_j.append(nj)
    nm, om = statistics.median(new_t), statistics.median(old_t)
    print(f"local fit:  med {nm:.3f}s  jobs {new_j}  all {[round(v, 2) for v in new_t]}")
    print(f"mllib fit:  med {om:.3f}s  jobs {old_j}  all {[round(v, 2) for v in old_t]}")
    print(f"ratio new/old = {nm / om:.3f}")

    def canary() -> float:
        x = np.full((1024, 1024), 1.0003, dtype=np.float64)
        t0 = time.perf_counter()
        for _ in range(8):
            x = np.clip(x @ x, 0.5, 1.5)
        return time.perf_counter() - t0

    print(f"canary_numpy={statistics.median(canary() for _ in range(3)):.3f}s "
          "(quiet band ~0.10-0.15)")


if __name__ == "__main__":
    main()
