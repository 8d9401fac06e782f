"""Interleaved A/B: batched LSH signature/bucket kernel (r16) vs the
r15 per-vector loop.  Same JVM, alternating passes.

Asserts the (vec_id, bucket) multiset is IDENTICAL between kernels
(collected and compared), then times the bucket-generation pass alone
(mapInPandas + noop — the ~0.9 s component VERDICT r15 #5 flagged) and
the full registered dedup_embedding_lsh_pairs query.

Usage: PYTHONPATH=/root/repo python tests/exp_r16_lsh_sig_ab.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 7


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import numpy as np

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import REGISTRY, queries
    from thesis_iceberg_spark.queries.dedup import (
        _ANCHOR_OFFSET,
        _emb_norms,
        _lsh_tier,
    )
    from thesis_iceberg_spark.sources.registry import load_table

    queries()
    spark = get_spark(app_name="exp_r16_lsh_sig_ab")
    spark.sparkContext.setLogLevel("ERROR")

    raw = load_table(spark, sf_dir, "embeddings")
    n = _emb_norms(raw)
    arity, sig_dims, anchor = _lsh_tier(raw.count())
    offset = _ANCHOR_OFFSET
    print(f"tier: arity={arity} sig_dims={sig_dims} anchor={anchor}")

    def old_buckets_udf(batches):
        """The r15 per-vector kernel, reproduced verbatim."""
        from itertools import combinations

        import numpy as np
        import pandas as pd

        main_idx = np.array(
            list(combinations(range(sig_dims), arity)), dtype=np.int64
        )
        anch_idx = (
            np.array(list(combinations(range(anchor), arity - 1)), dtype=np.int64)
            if anchor
            else None
        )

        def fold(sel):
            keys = sel[:, 0].copy()
            for j in range(1, sel.shape[1]):
                keys = keys * 128 + sel[:, j]
            return keys

        def tuples_of(d, k, width, idx):
            ds = np.sort(d)
            if len(ds) == width:
                return fold(ds[idx])
            if len(ds) < k:
                return np.array([], dtype=np.int64)
            sel = np.array(list(combinations(ds.tolist(), k)), dtype=np.int64)
            return fold(sel)

        for pdf in batches:
            ids, bks = [], []
            for vec_id, v in zip(pdf["vec_id"].to_numpy(), pdf["v"]):
                if v is None:
                    continue
                a = np.asarray(v, dtype=np.float64)
                order = np.lexsort((np.arange(len(a)), -np.abs(a)))[:sig_dims]
                d = order * 2 + (a[order] < 0)
                keys = tuples_of(d, arity, sig_dims, main_idx)
                if anchor:
                    keys = np.concatenate(
                        [keys, tuples_of(d[:anchor], arity - 1, anchor, anch_idx) + offset]
                    )
                if not len(keys):
                    continue
                ids.append(np.full(len(keys), int(vec_id), dtype=np.int64))
                bks.append(keys)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(ids) if ids else np.array([], dtype=np.int64),
                    "bucket": np.concatenate(bks) if bks else np.array([], dtype=np.int64),
                }
            )

    # the shipped kernel is a closure inside _embedding_lsh_candidates;
    # to A/B the PASS alone, capture the buckets frame it builds by
    # interposing on _bucket_candidates for one construction call
    from thesis_iceberg_spark.queries import dedup as D

    captured = {}
    real_bucket_candidates = D._bucket_candidates

    def capture_bucket_candidates(buckets, hint):
        captured["buckets"] = buckets
        return real_bucket_candidates(buckets, hint)

    D._bucket_candidates = capture_bucket_candidates
    try:
        D._embedding_lsh_candidates(spark, raw, n)
    finally:
        D._bucket_candidates = real_bucket_candidates
    new_b = captured["buckets"]
    old_b = n.select("vec_id", "v").mapInPandas(
        old_buckets_udf, "vec_id bigint, bucket bigint"
    )

    # --- value equivalence: identical (vec_id, bucket) multisets ------------
    a = sorted(map(tuple, new_b.collect()))
    b = sorted(map(tuple, old_b.collect()))
    assert a == b, (
        f"bucket rows diverged: {len(a)} new vs {len(b)} old; "
        f"first diff {next((x for x, y in zip(a, b) if x != y), None)}"
    )
    print(f"value check: {len(a)} (vec_id, bucket) rows identical")

    def canary() -> float:
        x = np.full((1024, 1024), 1.0003, dtype=np.float64)
        t0 = time.perf_counter()
        for _ in range(8):
            x = np.clip(x @ x, 0.5, 1.5)
        return time.perf_counter() - t0

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # --- pass-only timing ----------------------------------------------------
    new_t, old_t = [], []
    for _ in range(PASSES):
        t0 = time.perf_counter()
        force(new_b)
        new_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        force(old_b)
        old_t.append(time.perf_counter() - t0)
    nm, om = statistics.median(new_t), statistics.median(old_t)
    print(f"signature pass, batched kernel: med {nm:.3f}s  all {[round(v, 3) for v in new_t]}")
    print(f"signature pass, per-row kernel: med {om:.3f}s  all {[round(v, 3) for v in old_t]}")
    print(f"pass ratio new/old = {nm / om:.3f}")

    # --- full registered query (shipped kernel only; series context) ---------
    q = REGISTRY["dedup_embedding_lsh_pairs"].fn
    full_t = []
    for _ in range(3):
        t0 = time.perf_counter()
        force(q(spark, sf_dir))
        full_t.append(time.perf_counter() - t0)
    print(f"dedup_embedding_lsh_pairs full query: med {statistics.median(full_t):.2f}s "
          f"all {[round(v, 2) for v in full_t]}")
    print(f"canary_numpy={statistics.median(canary() for _ in range(3)):.3f}s "
          "(quiet band ~0.10-0.15)")


if __name__ == "__main__":
    main()
