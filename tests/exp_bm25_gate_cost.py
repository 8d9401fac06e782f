"""Gate-on/gate-off re-measure of the _jvm_certify cost (VERDICT r11 #1).

The r11 driver bench recorded search_bm25_topk at +57% vs r10, the one
mover outside the documented host-noise band, coinciding with the new
_jvm_certify gate inside fold_col(cased=True).  The builder's same-day
final-HEAD bench disputed it (+1.7% overall, bm25 in-band), but the
driver's number is the one of record — so this experiment settles it
with an INTERLEAVED A/B in ONE JVM: for each carrier query the gate-on
and gate-off plans are built side by side (gate-off = _jvm_certify
monkeypatched to identity at expression-build time), then executed in
alternating passes.  Host drift hits both arms identically; the pairwise
per-pass ratio is the measurement.

Run:  SPARK_GRAFT_DRIVER_MEM=16g PYTHONPATH=/root/repo \
        python tests/exp_bm25_gate_cost.py [sf_dir] [passes]
Prints one JSON line per query + a summary line.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from thesis_iceberg_spark.session import get_spark
    import thesis_iceberg_spark.queries.textnorm as tn
    from thesis_iceberg_spark import queries as Q

    spark = get_spark()
    reg = Q.queries()
    names = ["search_bm25_topk", "text_countmin_topk", "dedup_exact_hash"]

    def build(name):
        # REPRODUCIBILITY (review r12): the registered bm25 eagerly
        # localCheckpoints its per-doc frame at BUILD time since the r12
        # restructure — through the registry, the tokenize+certify work
        # under measurement would run untimed during construction and
        # both timed arms would scan identical checkpoints (ratio ~1.0
        # regardless of gate cost).  Build the pre-restructure shape
        # (materialize=False) so the experiment keeps measuring the gate.
        if name == "search_bm25_topk":
            from thesis_iceberg_spark.queries.search import bm25_topk_df
            from thesis_iceberg_spark.queries.text import _docs

            return bm25_topk_df(
                spark, _docs(spark, sf_dir), materialize=False
            )
        return reg[name](spark, sf_dir)

    real_gate = tn._jvm_certify
    results = {}
    for name in names:
        df_on = build(name)
        tn._jvm_certify = lambda c: c  # gate OFF at expression-build time
        try:
            df_off = build(name)
        finally:
            tn._jvm_certify = real_gate
        # warm both plans (JIT + parquet footer cache) before timing
        _noop(df_on)
        _noop(df_off)
        on, off = [], []
        for _ in range(passes):
            on.append(_noop(df_on))
            off.append(_noop(df_off))
        med_on = statistics.median(on)
        med_off = statistics.median(off)
        # pairwise per-pass ratios: host drift cancels
        ratios = sorted(a / b for a, b in zip(on, off))
        results[name] = {
            "steady_on": round(med_on, 4),
            "steady_off": round(med_off, 4),
            "gate_cost_ratio_median": round(statistics.median(ratios), 4),
            "on": [round(x, 4) for x in on],
            "off": [round(x, 4) for x in off],
        }
        print(json.dumps({name: results[name]}), flush=True)

    # fixed-work numpy canary for cross-run host comparison (bench.py twin)
    t0 = time.monotonic()
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 2048))
    for _ in range(3):
        a = a @ a.T / 2048.0
    canary = time.monotonic() - t0
    print(
        json.dumps(
            {
                "summary": {
                    name: r["gate_cost_ratio_median"] for name, r in results.items()
                },
                "canary_numpy_sec": round(canary, 4),
                "sf_dir": sf_dir,
                "passes": passes,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
