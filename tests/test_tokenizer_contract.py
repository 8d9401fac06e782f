"""Tokenizer contract (VERDICT r7 ask #6 / r8 #5 / r10 \\x0B unification):
the three tokenizer implementations — the Python Arrow twin
(`_py_shingles`), Spark's Java-regex `\\s+` pipeline (`_shingles()`), and
the DuckDB RE2 oracle (`_SQL_SHINGLES`) — are certified to agree EXACTLY
on ALL ASCII text, and `_py_shingles` fails LOUDLY on non-ASCII instead
of silently diverging.

Why the contract is what it is (pinned by the directed tests below):
  * RE2 `\\s` is [\\t\\n\\f\\r ] — it excludes \\x0B, which both Java
    `\\s` and Python ASCII `\\s` include.  Since r10 every twin folds
    \\x0B to a space BEFORE trimming (replace() inside trim() on the SQL
    side, translate/str.replace before strip on the Spark/Python sides —
    the recipe the r9 LM/BM25 twins introduced), so \\x0B text is IN
    contract; the raw RE2 divergence is kept as a tripwire test.
  * unicode lower() tailoring differs between engines on exactly İ
    (U+0130: Python/Java full-case to i+U+0307, utf8proc simple-cases to
    bare i) and Σ (final-sigma context rule) — since r11 the textnorm
    fold fixes BOTH up before lower() ever runs, and folds every unicode
    whitespace char to a plain space, so accents/CJK/emoji/NBSP/İ/Σ text
    is IN contract; only cased characters outside the stable
    Latin/Greek/Cyrillic/Armenian/fullwidth blocks (plus unassigned
    codepoints) still raise (see textnorm.certify_py and
    tests/test_unicode_fold_contract.py).
"""

from __future__ import annotations

import string

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from thesis_iceberg_spark.queries.dedup import (
    _SQL_SHINGLES,
    _py_shingles,
    _shingles,
)

# the certified alphabet: ALL of printable ASCII — \x0B included since the
# r10 fold unification (see module doc)
_CONTRACT_ALPHABET = string.printable
assert "\x0b" in _CONTRACT_ALPHABET and "\t" in _CONTRACT_ALPHABET


def _duck_shingles(text: str) -> set[str]:
    (row,) = duckdb.execute(
        f"SELECT {_SQL_SHINGLES} FROM (SELECT ? AS text)", [text]
    ).fetchall()
    return set(row[0])


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_CONTRACT_ALPHABET, max_size=120))
def test_python_twin_matches_duckdb_on_contract_text(text):
    assert _py_shingles(text) == _duck_shingles(text)


def test_python_twin_matches_spark_on_contract_corpus(spark):
    """One batched Spark comparison (a session per hypothesis example would
    be absurd): directed corner shapes + a deterministic pseudo-random
    sample over the contract alphabet, all checked in a single job."""
    import random

    rng = random.Random(42)
    corpus = [
        "",
        " ",
        "one",
        "one two",
        "one two three",
        "a b c d e f g",
        "  leading  and   trailing  ",
        "\tTabs\tbetween\ttokens\there",
        "mixed\ncase\rLINE breaks\fand FORM feeds",
        "punct! mid. tokens? (yes) [no] {maybe} 'quote' \"dquote\"",
        "repeat repeat repeat repeat",
        "UPPER lower MiXeD case tokens",
        "digits 123 456 789 0",
        "a  b   c    d",  # runs of spaces
        # \x0B shapes, in contract since r10: interior, edge, runs, solo
        "a\x0bb c d e",
        "\x0bleading vt then words here",
        "trailing words then vt\x0b",
        "vt\x0b\x0bruns\x0b mixed \x0b\twith tabs",
        "\x0b",
    ] + [
        "".join(rng.choice(_CONTRACT_ALPHABET) for _ in range(rng.randint(0, 80)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id INT, text STRING"
    )
    rows = df.select("doc_id", _shingles().alias("sh")).collect()
    got = {r["doc_id"]: set(r["sh"]) for r in rows}
    for i, t in enumerate(corpus):
        assert got[i] == _py_shingles(t), f"Spark/Python diverge on {t!r}"
        assert _duck_shingles(t) == _py_shingles(t), f"DuckDB diverges on {t!r}"


def test_vertical_tab_diverges_in_raw_re2_split():
    """The reason the fold exists: RE2 does not treat \\x0B as whitespace,
    so a RAW regexp_split keeps 'a\\x0bb' as ONE token where Java and
    Python split it in two.  If DuckDB ever changes this, the fold becomes
    redundant (though still correct) — this test is the tripwire."""
    (row,) = duckdb.execute(
        "SELECT regexp_split_to_array(trim(lower(text)), '\\s+') "
        "FROM (SELECT 'a\x0bb c d e' AS text)"
    ).fetchall()
    raw_tokens = row[0]
    assert "a\x0bb" in raw_tokens  # RE2 kept it as one token
    # ...whereas the folded twins all split it:
    assert _py_shingles("a\x0bb c d e") == {"a b c", "b c d", "c d e"}
    assert _duck_shingles("a\x0bb c d e") == {"a b c", "b c d", "c d e"}


def test_vertical_tab_edge_fold_matches_trim():
    """Edge \\x0B must fold BEFORE the space-only trim in every engine:
    '\\x0bfoo bar baz qux' tokenizes with no leading empty token."""
    t = "\x0bfoo bar baz qux"
    expect = {"foo bar baz", "bar baz qux"}
    assert _py_shingles(t) == expect
    assert _duck_shingles(t) == expect


@pytest.mark.parametrize(
    "text",
    [
        "café au lait latte",  # non-ASCII letter (lower-identity)
        "a\xa0b c d",  # non-breaking space -> token break in all engines
        "İstanbul is very large",  # dotted capital I: pre-folded to i+0307
        "em—dash spaced here",  # caseless punctuation
        "ΟΔΥΣΣΕΥΣ θαλασσης τέλος ΤΕΛΟΣ",  # final-sigma rule pre-folded
        "漢字 かな カナ mixed",  # caseless CJK + ideographic space
        "zero​width soft\xadhyphen gone",  # invisible chars deleted
    ],
)
def test_py_shingles_unicode_in_contract_since_r11(text):
    # the r10 raise on any non-ASCII narrowed to genuinely uncertifiable
    # input; these all run and agree with the DuckDB oracle twin
    assert _py_shingles(text) == _duck_shingles(text)


@pytest.mark.parametrize(
    "bad",
    [
        "deseret \U00010400 capital",  # cased, outside stable blocks
        "cherokee Ꭰ capital",  # cased (lowercase pair added Unicode 8)
        "unassigned ͸ codepoint",
    ],
)
def test_py_shingles_raises_loudly_outside_contract(bad):
    with pytest.raises(ValueError, match="tokenizer contract"):
        _py_shingles(bad)


def test_none_and_empty_are_in_contract():
    assert _py_shingles(None) == set()
    assert _py_shingles("") == set()
