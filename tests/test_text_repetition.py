"""text_gopher_repetition_signals: crafted-document checks (the sf-corpus
correctness is oracle-checked by the driver; this pins the semantics)."""

from __future__ import annotations

from thesis_iceberg_spark.queries import REGISTRY, queries

queries()


def _run(spark, tmp_path, rows):
    sf_dir = str(tmp_path / "rep")
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    fn = REGISTRY["text_gopher_repetition_signals"].fn
    return {r.doc_id: r.asDict() for r in fn(spark, sf_dir).collect()}


def test_repetitive_doc_flagged(spark, tmp_path):
    got = _run(
        spark,
        tmp_path,
        [
            # doc 1: "spam ham" * 12 — the top 2-gram covers 96/184 chars
            # (> 0.20) and every 5-gram is duplicated (dup_5 = 1.0 > 0.15)
            (1, " ".join(["spam ham"] * 12)),
            # doc 2: all-distinct tokens, no repeated n-gram of any size
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            # doc 3: too short for any n-gram — vacuously clean
            (3, "one"),
        ],
    )
    # doc 1 has 107 normalized chars; fractions are per DOCUMENT chars
    # (the paper's statistic), so overlapping duplicates exceed 1.0:
    # top-2gram "spam ham" = 12 occurrences * 8 chars = 96/107; the 20
    # 5-grams (10 of 22 chars + 10 of 21) are all duplicated = 430/107.
    assert got[1]["keep"] is False
    assert abs(got[1]["top_2gram_char_frac"] - 96 / 107) < 1e-12
    assert abs(got[1]["dup_5gram_char_frac"] - 430 / 107) < 1e-12
    assert got[2]["keep"] is True
    assert got[2]["dup_5gram_char_frac"] == 0.0
    assert got[3]["keep"] is True
    assert got[3]["top_4gram_char_frac"] == 0.0


def test_top_ngram_fraction(spark, tmp_path):
    # "a b c d a b" (11 chars) -> 2-grams: "a b","b c","c d","d a","a b";
    # top REPEATED 2-gram "a b": 2 occurrences * 3 chars over 11 doc chars
    got = _run(spark, tmp_path, [(1, "a b c d a b")])
    assert abs(got[1]["top_2gram_char_frac"] - 6 / 11) < 1e-12
    assert got[1]["dup_5gram_char_frac"] == 0.0  # both 5-grams unique
    assert got[1]["keep"] is False  # 6/11 > the 0.20 top-2gram gate


def test_null_and_edge_whitespace_text(spark, tmp_path):
    # NULL text mirrors the oracle's LEFT JOIN row: zero fractions, keep.
    # Leading '\n' survives the space-only trim() on BOTH engines, so the
    # \s+ split yields a leading EMPTY token (len 0) exactly like the
    # oracle's regexp_split — a bare Python strip() would eat it and shift
    # every gram hash.  "\na b a b": tokens ['','a','b','a','b'], dl = 8,
    # top repeated 2-gram "a b" = 2 occurrences * 3 chars -> 6/8.
    got = _run(spark, tmp_path, [(1, None), (2, "\na b a b")])
    assert got[1]["keep"] is True
    assert got[1]["top_2gram_char_frac"] == 0.0
    assert got[1]["dup_10gram_char_frac"] == 0.0
    assert abs(got[2]["top_2gram_char_frac"] - 6 / 8) < 1e-12


def test_null_text_line_and_c4_oracle_parity(spark, tmp_path):
    """NULL text must mirror each oracle exactly: the line rules' LEFT
    JOIN path (0.0 fractions, keep) and C4's NULL-propagating page
    columns (n_lines=0 from the empty chunk array, NULL
    n_sentences/has_*/keep)."""
    sf_dir = str(tmp_path / "nulls")
    rows = [(1, None), (2, "a b c d e f g h a b c d e f g h")]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    lf = {
        r.doc_id: r.asDict()
        for r in REGISTRY["text_gopher_line_flags"].fn(spark, sf_dir).collect()
    }
    assert lf[1] == {
        "doc_id": 1,
        "dup_line_frac": 0.0,
        "dup_para_frac": 0.0,
        "dup_line_char_frac": 0.0,
        "dup_para_char_frac": 0.0,
        "keep": True,
    }
    # doc 2: two identical 8-token lines -> dup_line_frac 1.0, chars 30/31
    assert lf[2]["dup_line_frac"] == 1.0
    assert abs(lf[2]["dup_line_char_frac"] - 30 / 31) < 1e-12
    assert lf[2]["keep"] is False
    c4 = {
        r.doc_id: r.asDict()
        for r in REGISTRY["text_c4_quality_flags"].fn(spark, sf_dir).collect()
    }
    assert c4[1]["n_lines"] == 0 and c4[1]["n_kept_lines"] == 0
    assert c4[1]["kept_line_frac"] == 0.0
    assert c4[1]["n_sentences"] is None
    assert c4[1]["has_lorem_ipsum"] is None and c4[1]["keep"] is None
    assert c4[2]["n_lines"] == 2 and c4[2]["keep"] is False  # 0 sentences


def test_lexical_flags_crafted_docs(spark, tmp_path):
    sf_dir = str(tmp_path / "lex")
    rows = [
        # clean English prose: alphabetic, no symbols, >=2 stop words
        (1, "the cat sat with the hat and left"),
        # numeric junk: 1 of 5 words alphabetic (0.2 < 0.8)
        (2, "12 34 56 78 ok"),
        # hashtag spam: 4 '#' over 6 words ~ 0.67 > 0.1
        (3, "#a #b #c #d the of"),
        # alphabetic but only ONE required stop word ('the')
        (4, "purple monkey dishwasher near the river"),
    ]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    fn = REGISTRY["text_gopher_lexical_flags"].fn
    got = {r.doc_id: r.asDict() for r in fn(spark, sf_dir).collect()}
    assert got[1]["keep"] is True and got[1]["n_stop_hits"] >= 2
    assert got[2]["keep"] is False and got[2]["alpha_word_frac"] == 0.2
    assert got[3]["keep"] is False and got[3]["symbol_word_ratio"] > 0.1
    assert got[4]["keep"] is False and got[4]["n_stop_hits"] == 1


def test_line_flags_newline_text(spark):
    """gopher_line_flags_df over REAL newline structure: duplicate lines
    and duplicate paragraphs each counted with the all-occurrence
    convention, char fractions over raw text length."""
    from thesis_iceberg_spark.queries.text import gopher_line_flags_df

    rows = [
        # "aaa" line appears twice of 4 lines -> 2/4 = 0.5 > 0.30; its
        # 6 chars over the 15-char text = 0.4 > 0.20; one paragraph only
        (1, "aaa\nbbb\naaa\nccc"),
        # duplicate PARAGRAPHS: "xxx" para twice of 3 -> 2/3; lines too
        (2, "xxx\n\nyyy\n\nxxx"),
        # all lines and paragraphs unique -> keep
        (3, "one two\nthree four\n\nfive six"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r.doc_id: r.asDict() for r in gopher_line_flags_df(df).collect()}
    assert abs(got[1]["dup_line_frac"] - 0.5) < 1e-12
    assert abs(got[1]["dup_line_char_frac"] - 6 / 15) < 1e-12
    assert got[1]["dup_para_frac"] == 0.0 and got[1]["keep"] is False
    assert abs(got[2]["dup_para_frac"] - 2 / 3) < 1e-12
    assert abs(got[2]["dup_para_char_frac"] - 6 / 13) < 1e-12
    assert abs(got[2]["dup_line_frac"] - 2 / 3) < 1e-12
    assert got[2]["keep"] is False
    assert got[3]["keep"] is True
    assert got[3]["dup_line_frac"] == 0.0 and got[3]["dup_para_frac"] == 0.0


def test_line_flags_registered_chunked(spark, tmp_path):
    """The registered query derives 8-token lines / 32-token paragraphs
    from the flat corpus: a 16-token doc whose halves repeat has two
    identical lines (frac 1.0) but a single paragraph (frac 0)."""
    sf_dir = str(tmp_path / "lines")
    rows = [
        (1, " ".join(["ab"] * 16)),
        (2, " ".join(f"w{i}" for i in range(16))),  # all-distinct chunks
    ]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    fn = REGISTRY["text_gopher_line_flags"].fn
    got = {r.doc_id: r.asDict() for r in fn(spark, sf_dir).collect()}
    # doc 1: dl = 16*2 + 15 = 47; each 8-token line is 23 chars, both
    # occurrences duplicated -> 46/47 of characters
    assert got[1]["dup_line_frac"] == 1.0
    assert abs(got[1]["dup_line_char_frac"] - 46 / 47) < 1e-12
    assert got[1]["dup_para_frac"] == 0.0  # one 32-token paragraph
    assert got[1]["keep"] is False
    assert got[2]["keep"] is True and got[2]["dup_line_frac"] == 0.0


def test_c4_flags_newline_text(spark):
    """c4_quality_flags_df over REAL newline structure: per-line terminal
    punctuation / >=3 words / no-'javascript' rules and the page-level
    sentence-count, lorem-ipsum, and curly-brace gates."""
    from thesis_iceberg_spark.queries.text import c4_quality_flags_df

    rows = [
        # 4 lines: kept; dropped (no terminal punct); dropped (2 words);
        # dropped (javascript) -> kept_line_frac 0.25; 5 sentences -> keep
        (1, "The cat sat down here.\nno punctuation line\nToo short.\n"
            "Please enable JavaScript now!\nOne. Two. Three. Four?"),
        # clean lines but only 2 sentences -> page dropped
        (2, "A good line ends well.\nAnother proper line follows!"),
        # lorem ipsum -> page dropped even with enough sentences
        (3, "Lorem ipsum dolor sit amet. One. Two. Three. Four. Five."),
        # curly brace -> page dropped
        (4, "Code follows {x}. One. Two. Three. Four. Five."),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r.doc_id: r.asDict() for r in c4_quality_flags_df(df).collect()}
    assert got[1]["n_lines"] == 5 and got[1]["n_kept_lines"] == 2
    # "Too short." has 2 words; "no punctuation line" fails the punct rule;
    # the JavaScript line fails the word rule; the last line is kept
    assert abs(got[1]["kept_line_frac"] - 0.4) < 1e-12
    assert got[1]["n_sentences"] >= 5 and got[1]["keep"] is True
    assert got[2]["n_kept_lines"] == 2 and got[2]["keep"] is False
    assert got[3]["has_lorem_ipsum"] is True and got[3]["keep"] is False
    assert got[4]["has_curly_brace"] is True and got[4]["keep"] is False


def test_dedup_paragraphs_real_text(spark):
    """dedup_paragraphs_df: a paragraph that already occurred anywhere in
    the corpus (first occurrence by doc_id, position) is dropped from
    later documents; within-document repeats count too."""
    from thesis_iceberg_spark.queries.pipeline_q import dedup_paragraphs_df

    rows = [
        (1, "alpha beta\n\ngamma delta"),            # both first -> kept
        (2, "gamma delta\n\nunique here"),           # first para is a dup
        (3, "same same\n\nsame same\n\nsame same"),  # self-repeats: keep 1 of 3
        (4, ""),                                     # empty doc edge
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r.doc_id: r.asDict() for r in dedup_paragraphs_df(df).collect()}
    assert got[1]["n_paras"] == 2 and got[1]["n_kept_paras"] == 2
    assert got[2]["n_kept_paras"] == 1  # "gamma delta" dropped (doc 1 owns it)
    assert abs(got[2]["kept_char_frac"] - 11 / 22) < 1e-12
    assert got[3]["n_paras"] == 3 and got[3]["n_kept_paras"] == 1
    assert got[4]["n_paras"] == 0 and got[4]["kept_char_frac"] == 1.0
    # fingerprints: doc1's kept set differs from doc2's
    assert got[1]["cleaned_fingerprint"] != got[2]["cleaned_fingerprint"]


def test_c4_badwords_crafted_docs(spark, tmp_path):
    """Blocklist rule (round 6; real LDNOOBW subset r9): token entries
    match token-wise only (no substring bleed), phrase entries
    substring-match the normalized text, NULL text propagates NULL flags
    like every C4 page column."""
    from thesis_iceberg_spark.queries.text import (
        C4_BADWORDS_FIXTURE,
        c4_badwords_flags_df,
    )

    sf_dir = str(tmp_path / "bw")
    rows = [
        (1, "a dup token and another dup here"),  # 2 fixture token hits
        (2, "duplicate is not dup-licate as a token"),  # substrings don't count
        (3, "the slow  query path"),  # fixture phrase across extra whitespace
        (4, "totally clean text"),
        (5, None),
        (6, "oh Shit that went badly"),  # real-list token, case-folded
        (7, "classic scunthorpe problem text"),  # real token as substring only
        (8, "a golden  shower curtain review"),  # real phrase, whitespace-run
    ]
    spark.createDataFrame(rows, "doc_id BIGINT, text STRING").write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    # the REGISTERED query runs the real curated LDNOOBW subset
    fn = REGISTRY["text_c4_badwords_flags"].fn
    got = {r.doc_id: r.asDict() for r in fn(spark, sf_dir).collect()}
    assert got[1]["has_badword"] is False  # fixture words are NOT real entries
    assert got[4]["has_badword"] is False and got[4]["keep"] is True
    assert got[5]["has_badword"] is None and got[5]["keep"] is None
    assert got[6]["n_badword_tokens"] == 1 and got[6]["keep"] is False
    assert got[7]["n_badword_tokens"] == 0 and got[7]["keep"] is True
    assert got[8]["n_badword_phrases"] == 1 and got[8]["has_badword"] is True

    # the fixture list still exercises both match shapes via the df API
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    fx = {
        r.doc_id: r.asDict()
        for r in c4_badwords_flags_df(df, badwords=C4_BADWORDS_FIXTURE).collect()
    }
    assert fx[1]["n_badword_tokens"] == 2 and fx[1]["keep"] is False
    assert fx[2]["n_badword_tokens"] == 0 and fx[2]["keep"] is True
    assert fx[3]["n_badword_phrases"] == 1 and fx[3]["has_badword"] is True
    custom = {
        r.doc_id: r.n_badword_tokens
        for r in c4_badwords_flags_df(df, badwords=("clean",)).collect()
    }
    assert custom[4] == 1 and custom[1] == 0

    # PHRASE-ONLY list (ADVICE r6): n_badword_tokens is a literal 0 and
    # the phrase HOF filter drops NULL-predicate elements, which used to
    # give a NULL-text doc has_badword=false/keep=true; the explicit
    # text-IS-NOT-NULL gate must make every flag NULL instead.
    phr = {
        r.doc_id: r.asDict()
        for r in c4_badwords_flags_df(df, badwords=("slow query",)).collect()
    }
    assert phr[3]["n_badword_phrases"] == 1 and phr[3]["keep"] is False
    assert phr[5]["n_badword_tokens"] is None
    assert phr[5]["n_badword_phrases"] is None
    assert phr[5]["has_badword"] is None and phr[5]["keep"] is None
    # WORD-ONLY list, same contract
    wrd = {
        r.doc_id: r.asDict()
        for r in c4_badwords_flags_df(df, badwords=("dup",)).collect()
    }
    assert wrd[5]["n_badword_phrases"] is None and wrd[5]["keep"] is None
