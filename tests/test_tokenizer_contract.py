"""Tokenizer contract (VERDICT r7 ask #6 / r8 #5): the three tokenizer
implementations — the Python Arrow twin (`_py_shingles`), Spark's
Java-regex `\\s+` pipeline (`_shingles()`), and the DuckDB RE2 oracle
(`_SQL_SHINGLES`) — are certified to agree EXACTLY on ASCII text without
a vertical tab, and `_py_shingles` fails LOUDLY outside that contract
instead of silently diverging.

Why the contract is what it is (pinned by the directed tests below):
  * RE2 `\\s` is [\\t\\n\\f\\r ] — it excludes \\x0B, which both Java
    `\\s` and Python ASCII `\\s` include, so a vertical-tab document
    tokenizes differently in the DuckDB oracle than in Spark;
  * unicode lower() tailoring differs between engines on edge codepoints
    (e.g. U+0130 expands to two codepoints under Python), so non-ASCII
    text is out of contract rather than half-certified.
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

# the certified alphabet: printable ASCII plus every ASCII whitespace the
# three engines agree on (\x0B deliberately excluded — see module doc)
_CONTRACT_ALPHABET = string.printable.replace("\x0b", "")
assert "\x0b" not in _CONTRACT_ALPHABET and "\t" in _CONTRACT_ALPHABET


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


def test_vertical_tab_actually_diverges_in_duckdb():
    """The reason \\x0B is out of contract: RE2 does not treat it as
    whitespace, so DuckDB keeps 'a\\x0bb' as ONE token where Java and
    Python split it in two.  If DuckDB ever changes this, the contract
    can widen — this test is the tripwire."""
    text = "a\x0bb c d e"
    duck = _duck_shingles(text)
    py = {"a b c", "b c d", "c d e"}  # Python ASCII \s splits on \x0b
    assert duck != py
    assert any("a\x0bb" in s for s in duck)


@pytest.mark.parametrize(
    "bad",
    [
        "a\x0bb c d e",       # vertical tab: RE2 vs Java/Python \s
        "café au lait",  # non-ASCII letter
        "a b c d",       # non-breaking space
        "İstanbul is large",  # dotted capital I: lower() expands
        "em—dash spaced here",
    ],
)
def test_py_shingles_raises_loudly_outside_contract(bad):
    with pytest.raises(ValueError, match="tokenizer contract"):
        _py_shingles(bad)


def test_none_and_empty_are_in_contract():
    assert _py_shingles(None) == set()
    assert _py_shingles("") == set()
