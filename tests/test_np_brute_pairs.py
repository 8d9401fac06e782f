"""_np_brute_pairs (the r15 driver-side bounded GEMM form of the kmeans
self-check's ground-truth denominator) must emit the same pair set as the
DataFrame nested-loop form it replaced — including the exclusion
semantics for NULL, ragged-width, and zero-norm vectors."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries.dedup import _brute_cosine_pairs, _np_brute_pairs


def _df_pairs(spark, rows):
    pdf = pd.DataFrame({"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]})
    df = spark.createDataFrame(pdf, "vec_id bigint, embedding array<double>")
    e = df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return sorted(
        (r["vec_a"], r["vec_b"]) for r in _brute_cosine_pairs(spark, e).collect()
    )


def _np_pairs(spark, rows):
    pdf = pd.DataFrame({"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]})
    df = spark.createDataFrame(pdf, "vec_id bigint, embedding array<double>")
    e = df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return _np_brute_pairs(e.select("vec_id", "v").toArrow())


CASES = {
    "plain near-dups": [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.1, 0.0]),  # cos ~ 0.995 with 1
        (3, [0.0, 1.0, 0.0]),  # orthogonal to 1
        (4, [0.6, 0.6, 0.1]),  # cos ~ 0.7 with 1 and 2
    ],
    "null and ragged excluded": [
        (1, [1.0, 0.0, 0.0]),
        (2, None),  # NULL: no pairs
        (3, [1.0, 0.0]),  # ragged: width-2, pairs only within width-2
        (4, [1.0, 0.1]),  # width-2 near-dup of 3
        (5, [0.98, 0.05, 0.05]),  # width-3 near-dup of 1
    ],
    "zero norm excluded": [
        (1, [0.0, 0.0]),
        (2, [0.0, 0.0]),  # zero-zero pair must NOT appear
        (3, [1.0, 0.0]),
        (4, [0.9, 0.2]),
    ],
    "negative cosine excluded": [
        (1, [1.0, 0.0]),
        (2, [-1.0, 0.0]),
        (3, [0.9, 0.1]),
    ],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_np_matches_dataframe_form(spark, name):
    rows = CASES[name]
    assert _np_pairs(spark, rows) == _df_pairs(spark, rows)


def test_pair_order_is_by_vec_id(spark):
    # ids deliberately out of collection order: pairs must be (min, max)
    rows = [(10, [1.0, 0.0]), (2, [0.99, 0.05])]
    assert _np_pairs(spark, rows) == [(2, 10)]
