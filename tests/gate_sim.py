"""Driver-gate simulation: run every registered query against its DuckDB
oracle at a chosen scale factor, exactly like the driver's correctness
gate (row count + columns + order-insensitive values), plus the entry()
smoke check.  Rounds 1-12 ran this ad hoc; r13 commits it as a tool.

Usage:
    python tests/gate_sim.py [sf_dir] [name ...]

With no names, all registered queries run (the full gate sim the
DEVNOTES close-outs cite).  With names, only those queries run — the
fast loop while iterating on one operator.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    # a directory argument is the sf_dir; anything else is a query name
    # (review r13: a '/'-based sniff misrouted relative dirs like sf0.01)
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    from thesis_iceberg_spark import get_spark
    from thesis_iceberg_spark.oracle import compare_query, duckdb_connection
    from thesis_iceberg_spark.queries import REGISTRY, queries

    queries()  # force registration
    spark = get_spark(app_name="gate_sim", shuffle_partitions=16)
    con = duckdb_connection(sf_dir)

    names = args or sorted(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    failures = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            if spec.oracle is None:
                n = spec.fn(spark, sf_dir).count()
                print(f"{name}: ROWS-ONLY ({n} rows, {time.time() - t0:.1f}s)")
                continue
            res = compare_query(spark, con, name, spec.fn, spec.oracle, sf_dir)
            print(f"{str(res)} [{time.time() - t0:.1f}s]")
            if not res.ok:
                failures += 1
        except Exception as exc:  # noqa: BLE001 — the gate records errs too
            failures += 1
            print(f"{name}: ERR {type(exc).__name__}: {exc}")

    if not args:
        import __spark_entry__ as entry_mod

        n = entry_mod.entry(spark).count()
        print(f"entry smoke: {n} rows")

    print(f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
