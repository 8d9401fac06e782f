"""Generative-rung experiment (VERDICT r6 ask #3): execute EVERY generative
LSH rung (arity 4..8 over top-16 + anchor (a-1)-tuples over top-13) on real
data — synthetic 64-dim embeddings with planted near-dup pairs at cosine
0.7/0.8/0.9 — and measure candidate volume and recall EMPIRICALLY.

Key question the analytic model couldn't answer: the ladder's admission
bounds assumed a uniform-bucket random-collision floor n^2/B with
B = C(128, arity).  But a pair collides iff the two top-16 signatures
share >= arity signed dims (the buckets enumerate ALL arity-subsets), so
the per-pair collision probability is the OVERLAP TAIL — n-invariant per
rung — and candidates grow as T(arity) * n^2, not n^2/B.  This script
measures T(arity) and recall per planted cosine.

Run:  python tests/exp_lsh_generative_rung.py [n_base] [n_planted] [arities]
Numbers land in PERFORMANCE.md + the ladder recalibration in dedup.py;
the regression gate is tests/test_lsh_ladder.py.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def make_corpus(n_base: int, n_planted: int, dim: int = 64, seed: int = 20260814):
    """(ids, vectors, planted_pairs): iid normal base + exact-cosine dups
    planted at 0.7 / 0.8 / 0.9 round-robin."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    cosines = (0.7, 0.8, 0.9)
    dup_src = rng.choice(n_base, size=n_planted, replace=False)
    dups, planted = [], []
    for i, src in enumerate(dup_src):
        c = cosines[i % len(cosines)]
        u = base[src] / np.linalg.norm(base[src])
        w = rng.standard_normal(dim)
        w -= w.dot(u) * u
        w /= np.linalg.norm(w)
        dups.append((c * u + np.sqrt(1 - c * c) * w) * np.linalg.norm(base[src]))
        planted.append((int(src), n_base + i, c))
    vecs = np.vstack([base, np.array(dups)])
    ids = np.arange(len(vecs))
    return ids, vecs, planted


def run_rung(spark, dedup, emb, planted, n_total: int, arity: int) -> dict:
    real_tier = dedup._lsh_tier
    dedup._lsh_tier = lambda count: (arity, 16, 13)
    try:
        norms = dedup._emb_norms(emb)
        t0 = time.perf_counter()
        cand = dedup._embedding_lsh_candidates(spark, emb, norms)
        planted_set = sorted(
            {(a, b) if a < b else (b, a) for a, b, _ in planted}
        )
        pdf_pl = spark.createDataFrame(planted_set, "a BIGINT, b BIGINT")
        n_cand = cand.count()
        t_cand = time.perf_counter() - t0
        got = {
            (r.a, r.b)
            for r in cand.toDF("a", "b").join(pdf_pl, ["a", "b"]).collect()
        }
    finally:
        dedup._lsh_tier = real_tier
    by_cos: dict[float, tuple[int, int]] = {}
    for a, b, c in planted:
        key = (a, b) if a < b else (b, a)
        t, h = by_cos.get(c, (0, 0))
        by_cos[c] = (t + 1, h + (key in got))
    return {
        "arity": arity,
        "n": n_total,
        "candidates": n_cand,
        "ratio": n_cand / n_total**2,
        "recall": {c: h / t for c, (t, h) in sorted(by_cos.items())},
        "wall_sec": round(t_cand, 1),
    }


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_planted = int(sys.argv[2]) if len(sys.argv) > 2 else 1_500
    arities = (
        [int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [4]
    )

    import pandas as pd

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import dedup

    spark = get_spark(app_name="lsh-rung-exp")
    spark.sparkContext.setLogLevel("ERROR")

    ids, vecs, planted = make_corpus(n_base, n_planted)
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    emb = spark.createDataFrame(pdf).repartition(32).cache()
    emb.count()
    n_total = len(ids)

    for arity in arities:
        r = run_rung(spark, dedup, emb, planted, n_total, arity)
        rec = "  ".join(f"r@{c}={v:.3f}" for c, v in r["recall"].items())
        print(
            f"arity={r['arity']} n={r['n']} cand={r['candidates']} "
            f"ratio={r['ratio']:.6f} {rec} wall={r['wall_sec']}s",
            flush=True,
        )




def kmeans_mode() -> None:
    """Measure the kmeans-bounded path on the same planted corpus:
    python tests/exp_lsh_generative_rung.py --kmeans [n_base] [n_planted]"""
    n_base = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_planted = int(sys.argv[3]) if len(sys.argv) > 3 else 1_500

    import pandas as pd

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import dedup

    spark = get_spark(app_name="kmeans-pairs-exp")
    spark.sparkContext.setLogLevel("ERROR")
    ids, vecs, planted = make_corpus(n_base, n_planted)
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    emb = spark.createDataFrame(pdf).repartition(32).cache()
    emb.count()
    n_total = len(ids)
    t0 = time.perf_counter()
    cand = dedup.dedup_embedding_kmeans_candidates(spark, emb)
    n_cand = cand.count()
    wall = time.perf_counter() - t0
    planted_set = sorted({(a, b) if a < b else (b, a) for a, b, _ in planted})
    got = {
        (r.a, r.b)
        for r in cand.toDF("a", "b")
        .join(spark.createDataFrame(planted_set, "a BIGINT, b BIGINT"), ["a", "b"])
        .collect()
    }
    by_cos: dict[float, tuple[int, int]] = {}
    for a, b, c in planted:
        key = (a, b) if a < b else (b, a)
        t, h = by_cos.get(c, (0, 0))
        by_cos[c] = (t + 1, h + (key in got))
    rec = "  ".join(f"r@{c}={h / t:.3f}" for c, (t, h) in sorted(by_cos.items()))
    k = max(dedup.KMEANS_MIN_K, n_total // dedup.KMEANS_BUCKET_TARGET)
    print(
        f"kmeans k={k} nprobe={dedup._kmeans_nprobe(k)} n={n_total} "
        f"cand={n_cand} ratio={n_cand / n_total**2:.6f} {rec} wall={wall:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--kmeans":
        kmeans_mode()
    else:
        main()
