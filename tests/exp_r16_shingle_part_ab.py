"""Interleaved A/B (r16, measured DEAD END — recorded as evidence):
staging _capped_shingles hash-partitioned by s vs the shipped form.

Hypothesis (guide §2.4): the downstream s-keyed joins (Jaccard
inverted-index self-join, decontamination containment join) could reuse
a repartition("s")-before-checkpoint's outputPartitioning and skip
their own exchanges of the corpus-scaled shingle frame.

Measured outcome at sf0.1: every one of those joins plans as a
BroadcastHashJoin (the checkpoint's stats are visible and one side fits
the threshold), so NO s-keyed exchange exists in the shipped form's
final plans either — the staging exchange is pure added cost:
ratio partitioned/shipped = 1.145 (5 interleaved passes, rows
identical in both consumers).  The shipped form therefore stays
unpartitioned; the repartition-before-staging posture is the right one
only once both join sides exceed the broadcast threshold (a
persist/staging-table layout decision at 100 TB scale).

Usage: PYTHONPATH=/root/repo python tests/exp_r16_shingle_part_ab.py
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
    from pyspark.sql import functions as F  # noqa: F401

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.queries import queries
    from thesis_iceberg_spark.queries.dedup import (
        _capped_shingles,
        _docs,
        ngram_jaccard_pairs_from_shingles,
    )
    from thesis_iceberg_spark.queries.pipeline_q import decontaminate_from_shingles

    queries()
    spark = get_spark(app_name="exp_r16_shingle_part_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def partitioned_capped_shingles(docs, n_docs, hash_keys=False):
        """The experimental arm: the shipped staging + repartition(s)
        immediately before the checkpoint (everything upstream of the
        checkpoint is _capped_shingles itself, so the two arms share one
        code path and cannot drift)."""
        staged = _capped_shingles(docs, n_docs, hash_keys=hash_keys)
        return staged.repartition("s").localCheckpoint(eager=True)

    def canary() -> float:
        a = np.full((1024, 1024), 1.0003, dtype=np.float64)
        t0 = time.perf_counter()
        for _ in range(8):
            a = np.clip(a @ a, 0.5, 1.5)
        return time.perf_counter() - t0

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    docs = _docs(spark, sf_dir)
    n = docs.count()

    # --- value equivalence -------------------------------------------------
    sh_part = partitioned_capped_shingles(docs, n)
    sh_ship = _capped_shingles(docs, n)
    for name, fn in (
        ("jaccard", ngram_jaccard_pairs_from_shingles),
        ("decontaminate", decontaminate_from_shingles),
    ):
        a = sorted(map(tuple, fn(sh_part).collect()))
        b = sorted(map(tuple, fn(sh_ship).collect()))
        assert a == b, f"{name} diverged under the partitioned staging"
        print(f"value check {name}: {len(a)} rows identical")

    # --- plan check: how many s-keyed exchanges exist in EACH form ----------
    for label, sh in (("partitioned", sh_part), ("shipped", sh_ship)):
        plan = (
            ngram_jaccard_pairs_from_shingles(sh)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_ex = plan.count("Exchange hashpartitioning(s#")
        n_bhj = plan.count("BroadcastHashJoin [s#")
        print(f"{label} jaccard plan: {n_ex} s-keyed exchanges, "
              f"{n_bhj} s-keyed broadcast joins")

    # --- interleaved timing: staging + both consumers per pass --------------
    def run(stage_fn) -> float:
        t0 = time.perf_counter()
        sh = stage_fn(docs, n)
        force(ngram_jaccard_pairs_from_shingles(sh))
        force(decontaminate_from_shingles(sh))
        return time.perf_counter() - t0

    part_t, ship_t = [], []
    for _ in range(PASSES):
        part_t.append(run(partitioned_capped_shingles))
        ship_t.append(run(lambda d, m: _capped_shingles(d, m)))
    c = statistics.median(canary() for _ in range(3))
    pm, sm = statistics.median(part_t), statistics.median(ship_t)
    print(f"canary_numpy={c:.3f}s (quiet band ~0.10-0.15)")
    print(f"partitioned staging: med {pm:.2f}s  all {[round(v, 2) for v in part_t]}")
    print(f"shipped staging:     med {sm:.2f}s  all {[round(v, 2) for v in ship_t]}")
    print(f"ratio partitioned/shipped = {pm / sm:.3f}")


if __name__ == "__main__":
    main()
