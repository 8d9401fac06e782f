"""text_countmin_topk: the Spark sketch must equal a pure-Python count-min
reference built with the identical md5 hash family (pins the hash twin
the DuckDB oracle also mirrors), and the classic overestimate property
must hold row-for-row."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pytest

from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.text import CM_COLS, CM_ROWS, CM_TOPK

queries()

_FN = REGISTRY["text_countmin_topk"].fn


def _py_tokens(text):
    # twin of _lm_ftoks: NULL -> '', \x0B -> space, space-only strip,
    # lower, RE2-compatible explicit whitespace class, empty tokens dropped
    t = (text or "").replace("\x0b", " ").strip(" ").lower()
    return [w for w in re.split(r"[\t\n\f\r ]+", t) if w]


def _py_cm_hash(j, tok):
    return int(hashlib.md5(f"cm{j}:{tok}".encode()).hexdigest()[:8], 16) % CM_COLS


def _py_reference(texts):
    counts = Counter()
    for t in texts:
        counts.update(_py_tokens(t))
    cells = Counter()
    for tok, n in counts.items():
        for j in range(CM_ROWS):
            cells[(j, _py_cm_hash(j, tok))] += n
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:CM_TOPK]
    return {
        tok: (n, min(cells[(j, _py_cm_hash(j, tok))] for j in range(CM_ROWS)))
        for tok, n in top
    }


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cmcorp"))
    rows = [
        (1, "zzz " * 100, "en", "web", 400),  # planted heavy hitter
        (2, "alpha beta gamma alpha beta alpha", "en", "web", 33),
        (3, "delta epsilon zeta eta theta iota kappa", "en", "web", 39),
        (4, "beta gamma\tgamma\ngamma", "en", "books", 22),
        (5, "", "en", "web", 0),
        (6, None, "fr", "web", None),
        (7, "\x0bzzz edge\x0b", "en", "web", 10),
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.parquet(f"{d}/documents.parquet")
    return d


def test_sketch_equals_python_reference(spark, crafted_dir):
    texts = [
        r.text
        for r in spark.read.parquet(f"{crafted_dir}/documents.parquet").collect()
    ]
    expect = _py_reference(texts)
    got = {r.token: (r.exact_n, r.est_n) for r in _FN(spark, crafted_dir).collect()}
    assert got == expect
    assert got["zzz"][0] == 101  # 100 planted + 1 in the \x0B doc


def test_overestimate_property_on_corpus(spark, sf_dir):
    rows = _FN(spark, sf_dir).collect()
    assert len(rows) == CM_TOPK
    for r in rows:
        assert r.est_n >= r.exact_n, (r.token, r.exact_n, r.est_n)


def test_empty_corpus(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cmempty"))
    spark.createDataFrame(
        [], "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.parquet(f"{d}/documents.parquet")
    assert _FN(spark, d).count() == 0
