"""Interleaved A/B: the shipped connected_components (r16 — no
all_nodes checkpoint) vs the r15 form (eager all_nodes checkpoint).

Asserts identical (node, label) rows on the real near-dup pair input,
counts Spark jobs per invocation via job groups, and times both forms
interleaved in one JVM.

History: the r16 round ALSO measured a lazy per-round checkpoint here
(signature aggregate as the materializing action — 29 -> 25 jobs,
0.91x, labels identical under this harness), but that variant was
REVERTED after a full bench run reproduced the round-3 accumulator
error (see the comment at the round checkpoint in dedup.py and
OPTIMIZATION_r16.md #8); the shipped form keeps eager round
checkpoints, so re-running this script today measures only the
all_nodes-removal delta (one job).

Usage: PYTHONPATH=/root/repo python tests/exp_r16_cc_ab.py
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
    from thesis_iceberg_spark.queries import queries
    from thesis_iceberg_spark.queries import dedup as D
    from thesis_iceberg_spark.sources.registry import load_table

    queries()
    spark = get_spark(app_name="exp_r16_cc_ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def old_connected_components(pairs, max_rounds=25):
        """The r15 form, reproduced verbatim."""
        edges = (
            pairs.filter(F.col("a") != F.col("b"))
            .select("a", "b")
            .distinct()
            .localCheckpoint(eager=True)
        )
        all_nodes = (
            edges.select(F.col("a").alias("node"))
            .unionAll(edges.select(F.col("b").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        prev_sig = None
        converged = False
        for _ in range(max_rounds):
            und = edges.unionAll(
                edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            mins = (
                und.groupBy("a")
                .agg(F.min("b").alias("mb"))
                .select("a", F.least(F.col("mb"), F.col("a")).alias("mn"))
            )
            edges = (
                und.join(mins, "a")
                .filter(F.col("b") > F.col("a"))
                .select(F.col("b").alias("a"), F.col("mn").alias("b"))
                .filter(F.col("a") != F.col("b"))
                .distinct()
            )
            sm = edges.select(
                F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
            )
            smins = sm.groupBy("u").agg(F.min("v").alias("mn"))
            edges = (
                sm.join(smins, "u")
                .filter(F.col("v") != F.col("mn"))
                .select(F.col("v").alias("a"), F.col("mn").alias("b"))
                .unionAll(smins.select(F.col("u").alias("a"), F.col("mn").alias("b")))
                .distinct()
                .localCheckpoint(eager=True)
            )
            sig = edges.agg(
                F.count("*").alias("c"),
                F.expr("bit_xor(xxhash64(a, b))").alias("h"),
            ).first()
            sig = (sig["c"], sig["h"])
            if sig == prev_sig:
                converged = True
                break
            prev_sig = sig
        if not converged:
            raise RuntimeError("old CC did not converge")
        labels = edges.select(F.col("a").alias("node"), F.col("b").alias("label"))
        roots = all_nodes.join(labels, "node", "left_anti").select(
            "node", F.col("node").alias("label")
        )
        return labels.unionByName(roots)

    # real pair input: the embedding near-dup pairs (what semdedup feeds CC)
    pairs = (
        D.dedup_embedding_lsh_pairs(spark, sf_dir)
        .filter(F.col("cosine") >= 0.45)
        .select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b"))
        .localCheckpoint(eager=True)
    )
    print(f"edge input: {pairs.count()} pairs")

    # --- value equivalence ---------------------------------------------------
    a = sorted(map(tuple, D.connected_components(pairs).collect()))
    b = sorted(map(tuple, old_connected_components(pairs).collect()))
    assert a == b, f"labels diverged: {len(a)} vs {len(b)}"
    print(f"value check: {len(a)} (node, label) rows identical")

    def canary() -> float:
        x = np.full((1024, 1024), 1.0003, dtype=np.float64)
        t0 = time.perf_counter()
        for _ in range(8):
            x = np.clip(x @ x, 0.5, 1.5)
        return time.perf_counter() - t0

    def jobs_in(tag, fn) -> tuple[float, int]:
        sc.setJobGroup(tag, tag)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        ids = sc.statusTracker().getJobIdsForGroup(tag)
        return dt, len(ids)

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    new_t, old_t, new_j, old_j = [], [], [], []
    for i in range(PASSES):
        dt, nj = jobs_in(f"cc_new_{i}", lambda: force(D.connected_components(pairs)))
        new_t.append(dt); new_j.append(nj)
        dt, nj = jobs_in(f"cc_old_{i}", lambda: force(old_connected_components(pairs)))
        old_t.append(dt); old_j.append(nj)
    nm, om = statistics.median(new_t), statistics.median(old_t)
    print(f"fused form:  med {nm:.3f}s  jobs {new_j}  all {[round(v, 3) for v in new_t]}")
    print(f"r15 form:    med {om:.3f}s  jobs {old_j}  all {[round(v, 3) for v in old_t]}")
    print(f"ratio new/old = {nm / om:.3f}")
    print(f"canary_numpy={statistics.median(canary() for _ in range(3)):.3f}s "
          "(quiet band ~0.10-0.15)")


if __name__ == "__main__":
    main()
