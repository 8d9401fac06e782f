"""BPE tokenizer induction (r12, df-level; r13 registration candidate).

The merge learner is pinned against HAND-COMPUTED merges on the classic
Sennrich corpus (not against itself), the Spark word count against exact
expected counts, and the Arrow encode kernel against the pure-Python
reference encoder over the real driver corpus.
"""

from __future__ import annotations

import pytest

from thesis_iceberg_spark.plans import formatted_plan
from thesis_iceberg_spark.queries.bpe import (
    BOW,
    bpe_encode_df,
    bpe_encode_word,
    bpe_train,
    bpe_word_counts,
)
from thesis_iceberg_spark.sources.registry import load_table

# Sennrich et al.'s worked example
_CLASSIC = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_classic_corpus_merges_match_hand_computation():
    # hand-derived under the leading-space boundary convention:
    # round 1 has (e,s) and (s,t) tied at 9, lexicographic picks (e,s);
    # round 3 has (' ','l'), ('l','o'), ('o','w') tied at 7 and the
    # space sorts first; etc.
    merges = bpe_train(_CLASSIC, n_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        (BOW, "l"),
        (BOW + "l", "o"),
        (BOW + "lo", "w"),
    ]


def test_encode_word_classic():
    merges = bpe_train(_CLASSIC, n_merges=5)
    # the canonical BPE demo: an UNSEEN word segments into learned units
    assert bpe_encode_word("lowest", merges) == [BOW + "low", "est"]
    assert bpe_encode_word("low", merges) == [BOW + "low"]
    assert bpe_encode_word("newest", merges) == [BOW, "n", "e", "w", "est"]


def test_encoding_partitions_the_word():
    # property: concatenating a word's subwords reproduces BOW + word
    merges = bpe_train(_CLASSIC, n_merges=5)
    for w in ("low", "lower", "newest", "widest", "lowest", "zq", ""):
        assert "".join(bpe_encode_word(w, merges)) == BOW + w


def test_min_freq_stops_early():
    merges = bpe_train([("ab", 1), ("cd", 1)], n_merges=10, min_freq=2)
    assert merges == []  # nothing reaches min_freq
    assert bpe_train([], n_merges=3) == []


def test_word_counts_and_cutoff(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("bpewc"))
    rows = [
        (1, "aa bb aa", "en", "s", 8),
        (2, "bb cc", "en", "s", 5),
        (3, None, "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    docs = load_table(spark, d, "documents")
    wc = {r.word: r.c for r in bpe_word_counts(docs).collect()}
    assert wc == {"aa": 2, "bb": 2, "cc": 1}
    top = [tuple(r) for r in bpe_word_counts(docs, max_words=2).collect()]
    # count DESC, word ASC at the cut: aa and bb tie at 2, cc dropped
    assert top == [("aa", 2), ("bb", 2)]


def test_arrow_encode_matches_reference_on_driver_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    counts = [(r.word, r.c) for r in bpe_word_counts(docs).collect()]
    merges = bpe_train(sorted(counts), n_merges=32)
    assert merges, "no merges learned on the driver corpus"
    got = {
        r.doc_id: (r.n_words, r.n_subwords, list(r.subwords))
        for r in bpe_encode_df(docs, merges).collect()
    }
    # independent reference: re-tokenize each doc in Python and encode
    from thesis_iceberg_spark.queries.textnorm import fold_py

    for row in docs.select("doc_id", "text").collect():
        t = fold_py(row.text or "")
        words = [w for w in t.strip(" ").lower().split() if w]
        subs = [s for w in words for s in bpe_encode_word(w, merges)]
        assert got[row.doc_id] == (len(words), len(subs), subs)
    # encode is a narrow Arrow pass: no shuffle anywhere
    plan = formatted_plan(bpe_encode_df(docs, merges))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_train_is_deterministic_under_input_order():
    merges_a = bpe_train(_CLASSIC, n_merges=5)
    merges_b = bpe_train(list(reversed(_CLASSIC)), n_merges=5)
    assert merges_a == merges_b


def test_boundary_marker_is_unforgeable_from_text():
    # an HTML-heavy corpus full of literal "</w>"-ish character runs can
    # never forge the boundary: tokens are whitespace-split so no base
    # symbol is ' ', hence any symbol containing ' ' derives from the
    # prepended marker — and it can only ever be a word's FIRST subword
    corpus = [("</w>", 50), ("a</w>b", 30), ("<</w>>", 20), ("plain", 10)]
    merges = bpe_train(corpus, n_merges=20)
    for w in ("</w>", "a</w>b", "x</w>", "plain"):
        subs = bpe_encode_word(w, merges)
        assert "".join(subs) == BOW + w
        for i, s in enumerate(subs):
            assert (BOW in s) == (i == 0 and s.startswith(BOW)), (w, subs)


# --- the r13 registered query: frozen literal merges + SQL twin -------------


def test_frozen_merges_match_retraining_on_reference_corpus(spark):
    # BPE_MERGES is a literal so the oracle SQL can bake it in; this pin
    # re-derives it through the REAL training path — bpe_word_counts
    # (certified fold tokenizer) over the sf0.001 reference corpus
    # (fixed path: the training corpus, regardless of which sf the suite
    # runs at) — so the literal cannot drift from what bpe_train
    # actually produces.  (Review r13: an earlier draft re-counted words
    # with a fold-less DuckDB tokenizer, which would diverge from the
    # certified path the moment the corpus gains a fold-affected char.)
    from thesis_iceberg_spark.queries.bpe import (
        BPE_MERGES,
        bpe_train,
        bpe_word_counts,
    )

    wc = [
        (r.word, r.c)
        for r in bpe_word_counts(
            load_table(spark, "/root/testdata/sf0.001", "documents")
        ).collect()
    ]
    assert tuple(bpe_train(wc, n_merges=len(BPE_MERGES))) == BPE_MERGES


def test_no_self_pair_merges_in_frozen_list():
    # the SQL twin's two-pass replace diverges from greedy BPE on odd
    # same-symbol runs >= 5 under a self-pair merge (see _enc_sql), so
    # the frozen list must never contain one
    from thesis_iceberg_spark.queries.bpe import BPE_MERGES

    assert all(a != b for a, b in BPE_MERGES)


def test_sql_twin_matches_python_encoder_on_adversarial_words():
    # the delimited two-pass-replace SQL must reproduce bpe_encode_word
    # exactly — including on adjacent-run words where the replace trick
    # has to work for its two passes ('ssss' under (' ','s')-adjacent
    # chains, 'ararar' under ('a','r'), boundary-touching 'sort'/'as')
    import duckdb

    from thesis_iceberg_spark.queries.bpe import (
        BPE_MERGES,
        BPE_SEP,
        _enc_sql,
        bpe_encode_word,
    )

    words = [
        "scan", "column", "window", "order", "sort", "part", "partition",
        "merge", "as", "s", "ssss", "sssss", "ararar", "arar", "inin",
        "owow", "lulu", "aaaa", "vvvv", "atat", "parpar", "erer",
        "xerox", "minnow", "torn", "rust",
    ]
    con = duckdb.connect()
    q = "SELECT " + ", ".join(
        f"({_enc_sql(repr(w))}) AS w{i}" for i, w in enumerate(words)
    )
    row = con.sql(q).fetchone()
    for i, w in enumerate(words):
        assert row[i].split(BPE_SEP) == bpe_encode_word(w, list(BPE_MERGES)), w


def test_registered_encode_output_shape(spark, sf_dir):
    from thesis_iceberg_spark.queries import REGISTRY, queries

    queries()
    df = REGISTRY["text_bpe_encode"].fn(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "n_words", "n_subwords", "subwords_s"
    ]
    plan = formatted_plan(df)
    assert "Exchange" not in plan  # zero-shuffle Arrow encode


def test_fertility_by_lang_parity_and_semantics(spark, sf_dir):
    # r14: per-language tokenizer fertility under the frozen merges —
    # DuckDB parity via the composed text_bpe_encode fragment, plus the
    # two invariants a fertility table must satisfy: fertility >= 1
    # (the leading-space marker guarantees >= 1 subword per word) and
    # doc/word mass conservation vs the encode output
    import duckdb

    from thesis_iceberg_spark.oracle import canonical_rows, duckdb_table_view
    from thesis_iceberg_spark.queries.bpe import (
        BPE_MERGES,
        bpe_encode_df,
        bpe_fertility_by_lang_df,
        sql_bpe_fertility_by_lang,
    )
    from thesis_iceberg_spark.sources.registry import load_table

    got_df = bpe_fertility_by_lang_df(spark, sf_dir)
    got = canonical_rows(got_df.toPandas())
    con = duckdb.connect()
    duckdb_table_view(con, sf_dir, "documents")
    want = canonical_rows(con.sql(sql_bpe_fertility_by_lang()).df())
    assert got == want
    rows = got_df.collect()
    assert rows
    for r in rows:
        if r.n_words > 0:
            assert r.fertility >= 1.0, r
            assert r.n_subwords >= r.n_words, r
    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode_df(docs, list(BPE_MERGES))
    total = enc.groupBy().sum("n_words", "n_subwords").first()
    assert sum(r.n_words for r in rows) == total[0]
    assert sum(r.n_subwords for r in rows) == total[1]
    assert sum(r.n_docs for r in rows) == docs.count()
