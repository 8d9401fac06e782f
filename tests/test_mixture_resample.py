"""pipeline_mixture_resample: the T/keep_frac arithmetic must match an
independent Python reference on crafted corpora, non-target sources must
drop out with keep_frac 0, and the binding source must keep everything
in expectation (keep_frac == 1.0 exactly when it binds T)."""

from __future__ import annotations

import hashlib

import pytest

from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.pipeline_q import MIX_WEIGHT_DENOM

queries()

_FN = REGISTRY["pipeline_mixture_resample"].fn


def _write_docs(spark, tmp_path_factory, rows, name):
    d = str(tmp_path_factory.mktemp(name))
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.parquet(f"{d}/documents.parquet")
    return d


def _u(doc_id):
    return int(hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()[:8], 16) / 2**32


def test_fractions_match_python_reference(spark, tmp_path_factory):
    # src0 (w=1/210): 4 docs x 5 tokens = 20; src4 (w=5/210): 2 docs x 2
    # tokens = 4 -> ratios: 20/(1/210)=4200, 4/(5/210)=168 -> T=168 ->
    # frac(src0) = (1/210)*168/20 = 0.04, frac(src4) = 1.0 exactly
    rows = (
        [(i, "a b c d e", "en", "src0", 9) for i in range(1, 5)]
        + [(i, "x y", "en", "src4", 3) for i in range(10, 12)]
    )
    d = _write_docs(spark, tmp_path_factory, rows, "mixref")
    out = {r.source: r for r in _FN(spark, d).collect()}
    assert out["src4"].keep_frac == 1.0  # the binding source keeps all
    assert out["src4"].n_kept == 2 and out["src4"].tokens_kept == 4
    w0 = 1 / MIX_WEIGHT_DENOM
    assert out["src0"].keep_frac == (w0 * 168) / 20
    expect_kept = [i for i in range(1, 5) if _u(i) < out["src0"].keep_frac]
    assert out["src0"].n_kept == len(expect_kept)
    assert out["src0"].tokens_kept == 5 * len(expect_kept)


def test_non_target_sources_drop_out(spark, tmp_path_factory):
    rows = [
        (1, "a b c", "en", "src2", 5),
        (2, "d e f", "en", "web", 5),  # not srcN -> share 0
        (3, "g h i", "en", "books", 5),
        (4, None, "fr", "src2", None),  # NULL text rides along
    ]
    d = _write_docs(spark, tmp_path_factory, rows, "mixweb")
    out = {r.source: r for r in _FN(spark, d).collect()}
    assert out["web"].keep_frac == 0.0 and out["web"].n_kept == 0
    assert out["books"].keep_frac == 0.0 and out["books"].tokens_kept == 0
    assert out["src2"].keep_frac == 1.0  # only target source -> binds T
    assert out["src2"].n_docs == 2


def test_out_of_range_srcn_drops_out(spark, tmp_path_factory):
    # 'src-1' parses to N=-1 (w would be 0 -> division by zero) and
    # 'src25' to N=25 (beyond the src0..19 target the 210 denominator
    # assumes) — both must drop out with share 0, not poison T
    # (review r10)
    rows = [
        (1, "a b c d", "en", "src3", 7),
        (2, "e f g h", "en", "src-1", 7),
        (3, "i j k l", "en", "src25", 7),
    ]
    d = _write_docs(spark, tmp_path_factory, rows, "mixrange")
    out = {r.source: r for r in _FN(spark, d).collect()}
    assert out["src-1"].keep_frac == 0.0 and out["src-1"].n_kept == 0
    assert out["src25"].keep_frac == 0.0 and out["src25"].n_kept == 0
    assert out["src3"].keep_frac == 1.0  # only target source -> binds T


def test_no_target_sources_at_all(spark, tmp_path_factory):
    rows = [(1, "a b c", "en", "web", 5), (2, "d e", "en", "books", 4)]
    d = _write_docs(spark, tmp_path_factory, rows, "mixnone")
    out = {r.source: r for r in _FN(spark, d).collect()}
    assert set(out) == {"web", "books"}
    assert all(r.keep_frac == 0.0 and r.n_kept == 0 for r in out.values())
