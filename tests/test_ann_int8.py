"""ann_int8_topk: the quantized shortlist must equal a numpy reference
built from the same floor(x*s + 0.5) rule (pins the rounding twin all
three engines share), and the int8 shortlist must agree closely with the
exact-cosine ranking on the synthetic corpus (quantization quality)."""

from __future__ import annotations

import numpy as np
import pytest

from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.similarity import Q_SCALE_TOP, SHORTLIST_K, TOP_K

queries()

_FN = REGISTRY["ann_int8_topk"].fn


def _numpy_reference(vecs, ids):
    """(vec_id, qdot, cosine-rank) top-k under the exact two-stage twin:
    SHORTLIST_K by quantized dot, then top-k of those by f64 cosine."""
    x = np.asarray(vecs, dtype=np.float64)
    s = Q_SCALE_TOP / np.abs(x).max()
    q8 = np.floor(x * s + 0.5).astype(np.int64)
    qpos = int(np.argmin(ids))
    qid = ids[qpos]
    dots = q8 @ q8[qpos]
    short = [(int(i), int(d), k) for k, (i, d) in enumerate(zip(ids, dots)) if i != qid]
    short.sort(key=lambda t: (-t[1], t[0]))  # ids unique -> total order
    short = short[:SHORTLIST_K]
    qv = x[qpos]
    qn = np.sqrt(qv @ qv)

    def cos(row):
        v = x[row]
        return (v @ qv) / (np.sqrt(v @ v) * qn)

    short.sort(key=lambda t: (-cos(t[2]), t[0]))
    return [(i, d) for i, d, _ in short[:TOP_K]]


def test_matches_numpy_quantization_twin(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = [r.vec_id for r in rows]
    expect = _numpy_reference([r.embedding for r in rows], ids)
    got = [(r.vec_id, r.qdot) for r in _FN(spark, sf_dir).collect()]
    assert sorted(got) == sorted(expect)


def test_output_is_rerank_ordered(spark, sf_dir):
    # final ranking must be by full-precision cosine, not quantized dot
    rows = _FN(spark, sf_dir).collect()
    cosines = [r.cosine for r in rows if r.cosine is not None]
    assert cosines == sorted(cosines, reverse=True)


def test_shortlist_recall_vs_exact_cosine(spark, sf_dir):
    exact = {r.vec_id for r in REGISTRY["ann_cosine_topk"].fn(spark, sf_dir).collect()}
    quant = {r.vec_id for r in _FN(spark, sf_dir).collect()}
    # int8 over a [-1,1]-ish synthetic corpus is a fine-grained grid; the
    # shortlist should recover nearly all of the exact top-10 (measured
    # 1.0 at sf0.001 — floor asserted with margin)
    assert len(exact & quant) >= 8, sorted(exact & quant)


def test_rerank_cosine_is_full_precision(spark, sf_dir):
    rows = _FN(spark, sf_dir).collect()
    assert len(rows) == TOP_K
    for r in rows:
        assert r.cosine is None or -1.0 - 1e-12 <= r.cosine <= 1.0 + 1e-12
