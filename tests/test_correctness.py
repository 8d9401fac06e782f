"""Every registered query is verified against its DuckDB oracle exactly the
way the driver's correctness gate does it (row count + columns + order-
insensitive values), at sf0.001 for speed. Queries without an oracle get a
rows-only sanity run."""

from __future__ import annotations

import pytest

from thesis_iceberg_spark.oracle import compare_query
from thesis_iceberg_spark.queries import REGISTRY, queries

queries()  # force registration


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = REGISTRY[name]
    if spec.oracle is None:
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0  # rows-only: runs and returns a stable schema
        return
    res = compare_query(spark, duck, name, spec.fn, spec.oracle, sf_dir)
    assert res.ok, str(res)
