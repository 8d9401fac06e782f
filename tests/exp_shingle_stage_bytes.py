"""Measure the shingle-staging byte lever (VERDICT r11 #6): staged bytes
of the capped-shingle checkpoint with raw trigram strings vs 16-byte md5
keys, at a given SF.

The composition only ever JOINS on the staged key (Jaccard self-join,
containment join, per-doc counts), so replacing the string with its md5
is value-identical modulo collision; this experiment quantifies what the
swap saves in the localCheckpoint (at 100 TB: the staging table).

Run:  SPARK_GRAFT_DRIVER_MEM=16g PYTHONPATH=/root/repo \
        python tests/exp_shingle_stage_bytes.py [sf_dir]
"""

from __future__ import annotations

import json
import sys


def _storage_total(spark) -> int:
    return sum(
        info.memSize() + info.diskSize()
        for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from thesis_iceberg_spark.queries.dedup import _capped_shingles
    from thesis_iceberg_spark.session import get_spark
    from thesis_iceberg_spark.sources.registry import load_table

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    out = {}
    keep_alive = []  # review r12: rebinding the frame would drop the last
    # reference to the previous arm's checkpoint, and the async
    # ContextCleaner could unpersist its blocks BETWEEN the next arm's
    # two snapshots, deflating (even negating) that arm's delta — pin
    # every arm's frame for the experiment's lifetime so the
    # "leftovers appear in both snapshots and cancel" invariant holds
    for label, hash_keys in (("raw_string", False), ("md5_16b", True)):
        before = _storage_total(spark)
        sh = _capped_shingles(docs, n, hash_keys=hash_keys)
        keep_alive.append(sh)
        rows = sh.count()
        out[label] = {"rows": rows, "staged_bytes": _storage_total(spark) - before}
    out["ratio"] = round(
        out["md5_16b"]["staged_bytes"] / max(out["raw_string"]["staged_bytes"], 1), 4
    )
    out["sf_dir"] = sf_dir
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
