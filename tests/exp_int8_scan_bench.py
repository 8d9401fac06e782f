"""int8-quantized ANN scan bench: measure the claim behind ann_int8_topk
— that a write-time-quantized corpus makes the shortlist scan cheaper
than the full-precision scan — at 1e6 x 64-dim vectors.

Materializes the SAME corpus twice the way a table maintenance job
would (float32 `embedding` vs int8 `q8` + one stored corpus scale),
then times the two top-k scans:

  * f64 cosine over array<float>  (the ann_cosine_topk shape)
  * int64 quantized-dot over array<tinyint>  (the ann_int8_topk
    shortlist shape; the k-row rerank is excluded — it is O(k*D) and
    identical for both)

and reports parquet bytes on disk for each layout.  Expectations, not
assumptions: parquet encodes small ints compactly but Spark's
vectorized reader widens them in memory, so the win need not be the
naive 4x — this script records what it actually is.

Run:  python tests/exp_int8_scan_bench.py [n_vectors]   (default 1e6)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    import pyspark.sql.functions as F

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries.similarity import Q_SCALE_TOP

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exp_lsh_generative_rung import make_corpus_df

    spark = get_spark(app_name="int8-scan-bench")
    spark.sparkContext.setLogLevel("ERROR")

    corpus, _ = make_corpus_df(spark, n, max(3, n // 1000))
    d = tempfile.mkdtemp(prefix="int8bench_")
    f32_path = f"{d}/f32.parquet"
    corpus.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("float")).alias("embedding"),
    ).repartition(32).write.parquet(f32_path)

    e = spark.read.parquet(f32_path).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # the write-time quantization job: one corpus-max aggregate, then a
    # narrow map to int8 (exactly ann_int8_topk's quantizer)
    s = e.agg(
        F.try_divide(
            F.lit(Q_SCALE_TOP),
            F.max(F.array_max(F.transform("v", lambda x: F.abs(x)))),
        ).alias("s")
    )
    q8_path = f"{d}/int8.parquet"
    e.crossJoin(F.broadcast(s)).select(
        "vec_id",
        F.transform(
            "v", lambda x: F.floor(x * F.col("s") + F.lit(0.5)).cast("byte")
        ).alias("q8"),
    ).repartition(32).write.parquet(q8_path)
    s_val = s.first()["s"]

    f32_bytes = _du(f32_path)
    q8_bytes = _du(q8_path)

    def timeit(fn, runs: int = 5) -> float:
        fn()
        return round(
            min(
                (lambda t0: (fn(), time.perf_counter() - t0)[1])(time.perf_counter())
                for _ in range(runs)
            ),
            3,
        )

    def dot(u, w):
        return F.aggregate(
            F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda a, p: a + p
        )

    def run_f64():
        ef = spark.read.parquet(f32_path).select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
        )
        q = (
            ef.orderBy("vec_id")
            .limit(1)
            .select(F.col("v").alias("qv"), F.col("vec_id").alias("qid"))
        )
        cos = F.try_divide(
            dot(F.col("v"), F.col("qv")),
            F.sqrt(dot(F.col("v"), F.col("v"))) * F.sqrt(dot(F.col("qv"), F.col("qv"))),
        )
        return (
            ef.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("qid"))
            .select("vec_id", cos.alias("score"))
            .orderBy(F.col("score").desc(), "vec_id")
            .limit(10)
            .collect()
        )

    def run_int8(k: int = 10):
        eq = spark.read.parquet(q8_path)
        q = (
            eq.orderBy("vec_id")
            .limit(1)
            .select(F.col("q8").alias("qq"), F.col("vec_id").alias("qid"))
        )
        qdot = F.aggregate(
            F.zip_with("q8", F.col("qq"), lambda a, b: a.cast("long") * b),
            F.lit(0).cast("bigint"),
            lambda acc, p: acc + p,
        )
        return (
            eq.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("qid"))
            .select("vec_id", qdot.alias("score"))
            .orderBy(F.col("score").desc(), "vec_id")
            .limit(k)
            .collect()
        )

    t_f64 = timeit(run_f64)
    t_i8 = timeit(run_int8)
    canary = timeit(
        lambda: spark.range(0, 100_000_000, 1, 32)
        .select(F.expr("bit_xor(xxhash64(id))"))
        .collect()
    )
    # Shortlist recall LADDER.  An iid-normal corpus is the ADVERSARIAL
    # case for a same-size shortlist: the true top-10 are near-ties
    # separated by margins below the quantization noise, so int8-top-10
    # alone loses some of them.  The production recipe is
    # oversample-then-rerank: shortlist k' >= k by quantized dot, rerank
    # those k' rows in full precision, keep top-k — measured below at
    # k' = 10 (same-size), 40 (ann_int8_topk's SHORTLIST_K default) and
    # 100 (x10), all derived from ONE 100-row shortlist collect carrying
    # both the quantized dot and the f64 cosine.
    top_f = {r.vec_id for r in run_f64()}
    ef = spark.read.parquet(f32_path).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    qrow = ef.orderBy("vec_id").limit(1).select(F.col("v").alias("qv"))
    short100 = [r.vec_id for r in run_int8(100)]
    qd_rank = {vid: i for i, vid in enumerate(short100)}
    scored100 = (
        ef.filter(F.col("vec_id").isin(short100))
        .crossJoin(F.broadcast(qrow))
        .select(
            "vec_id",
            F.try_divide(
                dot(F.col("v"), F.col("qv")),
                F.sqrt(dot(F.col("v"), F.col("v")))
                * F.sqrt(dot(F.col("qv"), F.col("qv"))),
            ).alias("cos"),
        )
        .collect()
    )
    overlaps = {}
    for kp in (10, 40, 100):
        pool = [r for r in scored100 if qd_rank[r.vec_id] < kp]
        pool.sort(key=lambda r: (-(r.cos if r.cos is not None else -2), r.vec_id))
        overlaps[kp] = len(top_f & {r.vec_id for r in pool[:10]})
    shutil.rmtree(d, ignore_errors=True)
    print(
        f"n={n} scale={s_val:.4f} "
        f"f32_parquet={f32_bytes / 1e6:.1f}MB int8_parquet={q8_bytes / 1e6:.1f}MB "
        f"({f32_bytes / q8_bytes:.2f}x smaller) "
        f"scan_f64_cosine={t_f64:.3f}s scan_int8_dot={t_i8:.3f}s "
        f"({t_f64 / t_i8:.2f}x faster) "
        f"overlap@10(k'=10)={overlaps[10]} "
        f"overlap@10(k'=40 default)={overlaps[40]} "
        f"overlap@10(k'=100)={overlaps[100]} "
        f"canary={canary:.3f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
