"""Heavy-shingle document-frequency cap (VERDICT r3 #4): a shingle shared
by >max(1000, 0.1% of corpus) documents is dropped before the inverted-index
joins in dedup_ngram_jaccard_pairs and pipeline_decontaminate — it is a hot
join key carrying no containment signal."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.dedup import _capped_shingles, _df_cap

queries()

HOT = "zz yy xx"  # planted boilerplate shingle, df = 1100 > cap


def _split_of(doc_id: int) -> str:
    h = hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:8]
    return "train" if int(h, 16) % 100 < 90 else "eval"


def _planted_corpus(spark, tmp_path) -> str:
    """1100 docs all containing the HOT shingle plus a unique tail; one
    train/eval near-dup pair on rare shingles; one eval doc consisting of
    ONLY the hot shingle."""
    ids = list(range(2_000, 2_000 + 1100))
    rows = [(i, f"{HOT} u{i}a u{i}b u{i}c") for i in ids]
    # T (train) and E2 (eval): identical rare text -> containment 1.0
    t_id = next(i for i in range(100) if _split_of(i) == "train")
    e2_id = next(i for i in range(100) if _split_of(i) == "eval")
    e_id = next(i for i in range(100, 200) if _split_of(i) == "eval")
    rows.append((t_id, "alpha beta gamma delta"))
    rows.append((e2_id, "alpha beta gamma delta"))
    rows.append((e_id, HOT))  # its ONLY shingle is the hot one
    sf_dir = str(tmp_path / "planted")
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    return sf_dir, t_id, e2_id, e_id


def test_capped_shingles_drops_planted_hot_shingle(spark, tmp_path):
    from thesis_iceberg_spark.sources.registry import load_table

    sf_dir, *_ = _planted_corpus(spark, tmp_path)
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    assert n == 1103 and _df_cap(n) < 1100
    sh = _capped_shingles(docs, n)
    assert sh.filter(F.col("s") == HOT).count() == 0, "hot shingle not capped"
    # rare shingles survive
    assert sh.filter(F.col("s") == "alpha beta gamma").count() == 2


def test_decontaminate_ignores_hot_shingle_containment(spark, tmp_path):
    """The result-level effect: an eval doc made ONLY of the hot shingle
    must flag nobody (uncapped, every hot train doc would show containment
    1.0 against it); real rare-shingle containment still flags."""
    sf_dir, t_id, e2_id, e_id = _planted_corpus(spark, tmp_path)
    got = {
        r.doc_id: r.max_containment
        for r in REGISTRY["pipeline_decontaminate"].fn(spark, sf_dir).collect()
    }
    assert got == {t_id: 1.0}, got


def test_ngram_jaccard_pairs_unaffected_signal(spark, tmp_path):
    """The hot shingle no longer fans out; the true near-dup pair (shared
    rare shingles) is still found with its capped-space jaccard of 1.0."""
    sf_dir, t_id, e2_id, e_id = _planted_corpus(spark, tmp_path)
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["dedup_ngram_jaccard_pairs"].fn(spark, sf_dir).collect()
    }
    lo, hi = sorted((t_id, e2_id))
    assert pairs == {(lo, hi): 1.0}, pairs
