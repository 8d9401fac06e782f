"""Corpus export sinks: sharded JSONL (the interchange format training
stacks consume) written distributed, one shard per task.

Scale notes: ``repartition(shards)`` sizes output files explicitly (shard
count is a write-time layout decision, like parquet bin-packing); the JSON
encoding runs JVM-side in the writer — no Python in the path. Gzip splits
poorly, so shard size IS the parallelism unit for downstream readers;
pick shards ≈ input-bytes / 256 MB at real scale.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame


def export_jsonl(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    compression: str | None = "gzip",
) -> list[str]:
    """Write ``df`` as sharded JSON-lines under ``path``; returns the shard
    file paths. ``shards=None`` keeps the input partitioning."""
    out = df.repartition(shards) if shards else df
    writer = out.write.mode("errorifexists")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)
    # codec-agnostic listing: any part file except checksum sidecars
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "part-*"))
        if not f.endswith(".crc")
    )
