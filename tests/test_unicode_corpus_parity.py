"""Unicode corpus parity (round 11, VERDICT r10 #1 — the template is the
r10 \\x0B suite, tests/test_vt_corpus_parity.py).

Before r11 the md5-portable shingle kernels REJECTED any non-ASCII text —
one é in a real web corpus made the minhash/exact-substr/decontaminate
family raise instead of answer.  The textnorm fold brings accents, CJK,
emoji, unicode whitespace and the İ/Σ case edges into the certified
contract, so the whole documents-table operator surface must now return
IDENTICAL answers from Spark and the DuckDB oracle on a corpus full of
them.  This runs the full oracle comparison — the same harness the driver
uses — for every registered documents-only query over a crafted unicode
corpus, plus directed pins for the normalization-equivalence pairs.
"""

from __future__ import annotations

import pytest

from thesis_iceberg_spark.oracle import compare_query, duckdb_connection  # noqa: F401
from thesis_iceberg_spark.queries import REGISTRY, queries

queries()

# same selection rule as the \x0B suite: documents-only operators with a
# DuckDB value oracle, plus the Python-twin extras and BM25 (documents-only
# but prefixed search_)
_DOC_QUERIES = sorted(
    name
    for name, spec in REGISTRY.items()
    if (
        spec.oracle is not None
        and name.startswith(("text_", "pipeline_", "dedup_"))
        and "embedding" not in name
        and "semdedup" not in name
        and "kmeans" not in name
        and name != "dedup_drop_duplicates"
    )
) + ["pandas_udf_scalar_text", "udtf_tokenize_positions", "search_bm25_topk"]

_BASE = (
    "the quick brown fox jumps over the lazy dog and then the fox "
    "naps in the warm afternoon sun near the old barn"
)
_GREEK = "ΟΔΥΣΣΕΥΣ επέστρεψε στην θάλασσα και είδε την θάλασσαν ξανά"


@pytest.fixture(scope="module")
def uni_docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("unicorp"))
    rows = [
        # ordinary ASCII docs so pair-finding operators have real work
        (1, _BASE, "en", "web", len(_BASE)),
        (2, _BASE + " extra trailing words here", "en", "web", len(_BASE) + 26),
        # accents, precomposed vs decomposed (NO implicit NFC anywhere:
        # the two must stay DIFFERENT documents in every engine)
        (3, "café déjà vu résumé naïve encore une fois", "fr", "web", 41),
        (4, "café déjà vu résumé naïve encore une fois", "fr", "web", 46),
        # CJK with ideographic space + fullwidth latin
        (5, "漢字　かな　カナ　ＡＢＣ　ａｂｃ mixed text", "zh", "web", 25),
        # emoji with ZWJ sequences (kept intact by the fold)
        (6, "launch day 🚀 team 👩‍🚀👨‍🚀 celebrates 🎉 again", "en", "web", 43),
        # NBSP near-dup pair: only the whitespace flavor differs -> after
        # the fold both normalize identically (exact-dedup hit)
        (7, "alpha beta gamma delta epsilon zeta eta theta", "de", "web", 45),
        (8, "alpha\xa0beta gamma delta　epsilon zeta eta theta", "de", "web", 45),
        # İ case-edge pair: İstanbul vs i + combining dot above
        (9, "İstanbul lies on the bosphorus strait today", "tr", "web", 43),
        (10, "i̇stanbul lies on the bosphorus strait today", "tr", "web", 44),
        # Greek with final sigma vs pre-folded σ (same doc after the fold)
        (11, _GREEK, "el", "books", len(_GREEK)),
        (12, _GREEK.lower().replace("ς", "σ"), "el", "books", len(_GREEK)),
        # invisible-char pair: soft hyphen + zero-width space vs clean
        (13, "inter\xadnational co​operation treaty signed", "en", "web", 41),
        (14, "international cooperation treaty signed", "en", "web", 39),
        # Cyrillic + Armenian capitals (stable cased blocks)
        (15, "МОСКВА и Санкт-Петербург Հայերեն Տեքստ", "ru", "web", 38),
        # sharp s and capital sharp s
        (16, "ẞTRASSE straße STRASSE ß", "de", "web", 24),
        # line/paragraph separators and information separators as breaks
        (17, "first second third\x1cfourth\x1dfifth", "en", "web", 34),
        # degenerate shapes stay in contract
        (18, "\xa0", "en", "web", 1),
        (19, "　​", "en", "web", 2),
        (20, "", "en", "web", 0),
        (21, None, "fr", "web", None),
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.parquet(f"{d}/documents.parquet")
    return d


@pytest.fixture(scope="module")
def uni_con(uni_docs_dir):
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{uni_docs_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_unicode_corpus_oracle_parity(spark, uni_docs_dir, uni_con, name):
    spec = REGISTRY[name]
    r = compare_query(spark, uni_con, name, spec.fn, spec.oracle, uni_docs_dir)
    assert r.ok, str(r)


def test_nbsp_flavor_pair_is_exact_dup(spark, uni_docs_dir):
    rows = REGISTRY["dedup_exact_hash"].fn(spark, uni_docs_dir).collect()
    assert any(r.canonical_doc_id == 7 and r.n_docs == 2 for r in rows), rows


def test_case_edge_pairs_share_fingerprint(spark, uni_docs_dir):
    fp = {
        r.doc_id: r.fingerprint
        for r in REGISTRY["text_fingerprint"].fn(spark, uni_docs_dir).collect()
    }
    assert fp[9] == fp[10]  # İstanbul == i̇stanbul after fold+lower
    assert fp[11] == fp[12]  # final-sigma text == pre-folded σ text
    assert fp[13] == fp[14]  # invisible chars deleted
    assert fp[3] != fp[4]  # NFC is NOT applied: composed != decomposed


@pytest.mark.parametrize(
    "name",
    [
        # Arrow kernels (certify_py, the Python-vs-utf8proc contract)
        "text_gopher_repetition_signals",
        "text_gopher_line_flags",
        "text_c4_quality_flags",
        "dedup_exact_substr_spans",
        # pure-JVM lower() queries (_jvm_certify inside fold_col, the
        # Java-vs-utf8proc contract — r11 completion: EVERY text operator
        # now raises on uncertifiable input instead of silently diverging)
        "text_fingerprint",
        "dedup_exact_hash",
        "text_lang_id",
        "text_countmin_topk",
        "search_bm25_topk",
    ],
)
def test_md5_kernels_raise_loudly_outside_contract(spark, tmp_path_factory, name):
    # review r11: the md5-comparing Arrow kernels must enforce the same
    # certify contract as the shingle kernels — a cased codepoint outside
    # the stable blocks fails LOUDLY instead of silently hashing
    # CPython-lowered text the utf8proc oracle would lower differently
    d = str(tmp_path_factory.mktemp(f"uncert_{name}"))
    rows = [(1, "deseret \U00010400 capital here today", "en", "src0", 30)]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.parquet(f"{d}/documents.parquet")
    with pytest.raises(Exception, match="tokenizer contract"):
        REGISTRY[name].fn(spark, d).collect()
