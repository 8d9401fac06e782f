"""text_hashed_classifier (r12): fastText-style hashed linear classifier.

The fit/score arithmetic is exact integers, so the registered query
carries a FULL value oracle (auto-covered by tests/test_correctness.py
and both crafted-corpus parity harnesses).  These tests pin what the
oracle compare can't see: that the model actually discriminates on a
separable corpus, the degenerate one-class guard, NULL/empty-text rows,
and the zero-shuffle scoring plan (the 100 TB claim).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thesis_iceberg_spark.plans import formatted_plan
from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.classify import (
    HC_BUCKETS,
    HC_RATE_SCALE,
    hashed_classifier_score,
    hashed_classifier_weights,
)

queries()

_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def _write_docs(spark, tmp_path_factory, name, rows):
    d = str(tmp_path_factory.mktemp(name))
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        f"{d}/documents.parquet"
    )
    return d


def test_separable_corpus_is_classified_correctly(spark):
    # disjoint vocabularies: every en doc scores positive, every de doc
    # negative — the count-based fit IS a working discriminative model
    # when the classes are separable (what a quality classifier assumes)
    rows = [(i, "the cat and the dog sat", "en", "s", 20) for i in range(10)] + [
        (100 + i, "der hund und die katze", "de", "s", 20) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, _SCHEMA)
    out = hashed_classifier_score(docs, hashed_classifier_weights(docs)).collect()
    for r in out:
        assert r.pred == r.is_pos_label, r
        assert r.score > 0 if r.is_pos_label else r.score < 0


def test_weight_array_shape_and_rate_bounds(spark):
    rows = [(i, f"tok{i} the and of", "en" if i % 2 else "fr", "s", 10) for i in range(40)]
    docs = spark.createDataFrame(rows, _SCHEMA)
    [row] = hashed_classifier_weights(docs).collect()
    w = row.w
    assert len(w) == HC_BUCKETS
    # each weight is a ppm-rate difference: |w| <= 1e6 by construction
    assert all(-HC_RATE_SCALE <= x <= HC_RATE_SCALE for x in w)
    # some bucket must be populated on a 40-doc corpus
    assert any(x != 0 for x in w)


def test_one_class_corpus_does_not_crash(spark):
    # tn = 0: the CASE guard must keep integer div away from /0 (ANSI
    # throws); scores are then pure positive-class rates
    rows = [(i, "alpha beta gamma", "en", "s", 16) for i in range(5)]
    docs = spark.createDataFrame(rows, _SCHEMA)
    out = hashed_classifier_score(docs, hashed_classifier_weights(docs)).collect()
    assert len(out) == 5
    assert all(r.score > 0 and r.pred for r in out)


def test_null_and_empty_text_score_zero(spark):
    rows = [
        (1, None, "en", "s", 0),
        (2, "", "de", "s", 0),
        (3, "   ", "fr", "s", 3),
        (4, "the and of", "en", "s", 10),
    ]
    docs = spark.createDataFrame(rows, _SCHEMA)
    out = {r.doc_id: r for r in hashed_classifier_score(
        docs, hashed_classifier_weights(docs)).collect()}
    for i in (1, 2, 3):
        assert out[i].n_toks == 0
        assert out[i].score == 0
        assert out[i].pred is False
    assert out[4].n_toks == 3 and out[4].score != 0


def test_registered_query_matches_oracle_on_crafted_corpus(
    spark, tmp_path_factory
):
    import duckdb

    from thesis_iceberg_spark.oracle import compare_query

    rows = [
        (1, "the cat and the dog", "en", "s", 19),
        (2, "der hund und die katze", "de", "s", 22),
        (3, None, "en", "s", 0),
        (4, "", "fr", "s", 0),
        (5, "the the the", "en", "s", 11),
        (6, "mixed der the und and", "de", "s", 21),
        (7, "unique7 tokens only", None, "s", 19),  # NULL lang arm
    ]
    d = _write_docs(spark, tmp_path_factory, "hc_oracle", rows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    spec = REGISTRY["text_hashed_classifier"]
    res = compare_query(
        spark, con, "text_hashed_classifier", spec.fn, spec.oracle, d
    )
    assert res.ok, res.mismatches


def test_scoring_is_a_zero_shuffle_broadcast_map(spark, sf_dir):
    # the hot path must stay JVM-side and narrow: no Python evaluation
    # anywhere, no sort-merge join, and the only Exchanges in the WHOLE
    # plan belong to the bounded fit aggregates (HC_BUCKETS-key groupBy
    # + spine join + two tiny collects), never to the docs scoring scan
    df = REGISTRY["text_hashed_classifier"].fn(spark, sf_dir)
    plan = formatted_plan(df)
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    # the docs side joins the one-row weight frame via broadcast only
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_fit_shuffle_is_bounded_by_bucket_count(spark, sf_dir):
    # the fit's only corpus-sized shuffle input is the bucket groupBy,
    # whose map-side combine bounds shuffled rows at HC_BUCKETS per task
    from thesis_iceberg_spark.queries.text import _docs

    docs = _docs(spark, sf_dir)
    counts = hashed_classifier_weights(docs)
    [row] = counts.collect()
    assert len(row.w) == HC_BUCKETS


def test_random_corpora_match_python_reference(spark):
    # seeded-random differential: fit + score reimplemented directly in
    # Python (hashlib md5 buckets, integer ppm rates) — pins the whole
    # arithmetic chain beyond the crafted cases
    import hashlib
    import random

    from thesis_iceberg_spark.queries.textnorm import fold_py

    def bucket(tok: str) -> int:
        return int(hashlib.md5(f"hc:{tok}".encode()).hexdigest()[:8], 16) % HC_BUCKETS

    def ref(rows):
        toks_of = lambda t: [
            w for w in fold_py(t or "").strip(" ").lower().split() if w
        ]
        n_pos = [0] * HC_BUCKETS
        n_neg = [0] * HC_BUCKETS
        for _i, text, lang in rows:
            for w in toks_of(text):
                if lang == "en":
                    n_pos[bucket(w)] += 1
                else:
                    n_neg[bucket(w)] += 1
        tp, tn = sum(n_pos), sum(n_neg)
        w = [
            (n_pos[b] * HC_RATE_SCALE // tp if tp else 0)
            - (n_neg[b] * HC_RATE_SCALE // tn if tn else 0)
            for b in range(HC_BUCKETS)
        ]
        return {
            i: sum(w[bucket(t)] for t in toks_of(text))
            for i, text, lang in rows
        }

    vocab = ["the", "and", "der", "und", "alpha", "beta", "x1", "xy2", "zzz"]
    for seed in (7, 8, 9):
        rng = random.Random(seed)
        rows = [
            (
                i,
                None
                if rng.random() < 0.05
                else " ".join(rng.choices(vocab, k=rng.randint(0, 12))),
                rng.choice(["en", "de", "fr", None]),
            )
            for i in range(40)
        ]
        docs = spark.createDataFrame(
            [(i, t, l, "s", 0) for i, t, l in rows], _SCHEMA
        )
        got = {
            r.doc_id: r.score
            for r in hashed_classifier_score(
                docs, hashed_classifier_weights(docs)
            ).collect()
        }
        assert got == ref(rows), seed
