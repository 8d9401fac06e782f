"""Per-codepoint three-engine certification of the textnorm unicode fold
(round 11, VERDICT r10 #1).

The contract claim textnorm.py makes is empirical: for every character
the fold certifies, ``lower(fold(c))`` is IDENTICAL in CPython, Spark's
JVM ``lower()`` (Java Locale.ROOT full case mapping) and DuckDB's
utf8proc ``lower()`` (simple case mapping).  This file executes that
claim per codepoint — every cased character in STABLE_CASED_RANGES and a
broad caseless-script sample — in all three engines, plus directed pins
for the machinery itself (translate deletion, the İ/Σ fixups, the
whitespace set definition).
"""

from __future__ import annotations

import sys
import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries.textnorm import (
    NORM_DEL,
    NORM_WS,
    STABLE_CASED_RANGES,
    certify_py,
    fold_col,
    fold_py,
    fold_sql,
)


def _duck_lower_fold(strings: list[str]) -> list[str]:
    con = duckdb.connect()
    (row,) = con.execute(
        f"SELECT list_transform(?::VARCHAR[], t -> lower({fold_sql('t')}))",
        [strings],
    ).fetchall()
    return list(row[0])


def _spark_lower_fold(spark, strings: list[str]) -> list[str]:
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "i LONG, t STRING"
    )
    rows = df.select("i", F.lower(fold_col(F.col("t"))).alias("o")).collect()
    out = {r["i"]: r["o"] for r in rows}
    return [out[i] for i in range(len(strings))]


def _certified_cased_chars() -> list[str]:
    chars = []
    for lo, hi in STABLE_CASED_RANGES:
        for cp in range(lo, hi + 1):
            ch = chr(cp)
            if cp == 0x130:  # pre-folded by design, excluded from ranges
                continue
            if unicodedata.category(ch) == "Cn":
                continue
            if ch.lower() != ch:
                chars.append(ch)
    return chars


def test_norm_ws_is_exactly_pythons_extra_whitespace():
    # NORM_WS == {c : c.isspace()} minus the five ASCII chars every
    # engine's \s already agrees on — if a Python upgrade ever widens
    # isspace(), this fails and the set gets revisited deliberately
    expect = {
        chr(cp) for cp in range(sys.maxunicode + 1) if chr(cp).isspace()
    } - set(" \t\n\f\r")
    assert set(NORM_WS) == expect


def test_lower_fold_parity_on_all_certified_cased_codepoints(spark):
    """THE certification: every cased char the contract allows lowers to
    the same string in CPython, Spark and DuckDB (after the fold, which
    for these chars is a no-op except Σ)."""
    chars = _certified_cased_chars()
    # sanity: the sweep is not vacuously small (688 upper/titlecase chars
    # across the six stable blocks at Unicode 15 data)
    assert len(chars) > 600
    py = [fold_py(c).lower() for c in chars]
    dk = _duck_lower_fold(chars)
    sp = _spark_lower_fold(spark, chars)
    bad = [
        (c, f"U+{ord(c):04X}", p, d, s)
        for c, p, d, s in zip(chars, py, dk, sp)
        if not (p == d == s)
    ]
    assert not bad, f"{len(bad)} certified codepoints diverge: {bad[:20]}"


def test_lower_fold_parity_on_caseless_script_sample(spark):
    # lower-identity chars are certified by the stability argument
    # (textnorm module doc); spot-verify it empirically across scripts
    ranges = [
        (0x590, 0x5EA),  # Hebrew
        (0x620, 0x64A),  # Arabic
        (0x900, 0x97F),  # Devanagari
        (0xE00, 0xE5B),  # Thai
        (0x3040, 0x30FF),  # Hiragana + Katakana
        (0x4E00, 0x4E80),  # CJK sample
        (0xAC00, 0xAC80),  # Hangul syllables sample
        (0x2200, 0x22FF),  # math operators
        (0x1F600, 0x1F64F),  # emoji (non-BMP)
    ]
    chars = [
        chr(cp)
        for lo, hi in ranges
        for cp in range(lo, hi + 1)
        if unicodedata.category(chr(cp)) != "Cn" and chr(cp).lower() == chr(cp)
    ]
    py = [fold_py(c).lower() for c in chars]
    assert py == chars  # identity in Python by construction
    assert _duck_lower_fold(chars) == chars
    assert _spark_lower_fold(spark, chars) == chars


@pytest.mark.parametrize(
    ("raw", "folded_lower"),
    [
        ("İstanbul", "i̇stanbul"),  # Python/Java full casing, pinned
        ("ΟΔΥΣΣΕΥΣ", "οδυσσευσ"),  # final-sigma context erased
        ("θαλάσσης", "θαλάσσησ"),  # ς -> σ (casefold semantics)
        ("a\xa0b　c d", "a b c d"),  # unicode whitespace -> space
        ("co\xadop z​ip﻿", "coop zip"),  # invisibles deleted
        ("a‍‌b", "a‍‌b"),  # zwj/zwnj KEPT
        ("ẞ STRASSE ß", "ß strasse ß"),  # sharp s: simple mapping only
        ("Ａｂｃ ＡＢＣ", "ａｂｃ ａｂｃ"),  # fullwidth
    ],
)
def test_fold_directed_shapes_three_engines(spark, raw, folded_lower):
    assert fold_py(raw).lower() == folded_lower
    assert _duck_lower_fold([raw]) == [folded_lower]
    assert _spark_lower_fold(spark, [raw]) == [folded_lower]


def test_certify_accepts_certified_domain():
    for ok in (
        "plain ascii",
        "café déjà vu",
        "漢字 and かな",
        "emoji 👩‍🚀 stays",
        "МОСКВА Москва",
        "Ωμέγα",
        "Հայերեն",  # Armenian (capitals in 0x531-0x556)
        "",
    ):
        certify_py(fold_py(ok))


@pytest.mark.parametrize(
    "bad",
    [
        "deseret \U00010400",  # cased outside stable blocks
        "cherokee Ꭰ",
        "osage \U000104B0",
        "unassigned ͸",
    ],
)
def test_certify_raises_outside_domain(bad):
    with pytest.raises(ValueError, match="tokenizer contract"):
        certify_py(fold_py(bad))


# --- post-Unicode-13 caseless allowlist (review r11 ADVICE) -----------------


def test_post_u13_emoji_certified_in_all_three_engines(spark):
    """Emoji assigned in Unicode 14/15 are \\p{Cn} to Java 17 — before the
    allowlist they raised on every JVM fold_col(cased=True) operator while
    the Arrow kernels accepted the same text.  Certification: lower() is
    identity in all three engines (unassigned-to-Java lowers to itself,
    same as caseless-assigned elsewhere).  _spark_lower_fold goes through
    fold_col and therefore through the _jvm_certify gate: a raise here IS
    the regression."""
    assigned = [
        "\U0001fae0",  # melting face (U14)
        "\U0001faf0",  # hand with index finger and thumb crossed (U14)
        "\U0001f6dd",  # playground slide (U14)
        "鿿",  # CJK URO tail, U+9FFF (U14)
    ]
    # this CPython ships Unicode 14 data, so U15 emoji are Cn even HERE —
    # they ride the allowlist arm of certify_py like the JVM's does
    newer = [
        "\U0001fa75",  # light blue heart (U15)
        "\U0001fae8",  # shaking face (U15)
        "\U0001fabd",  # wing (U15)
    ]
    for c in assigned:  # assigned + caseless per Python's data
        assert unicodedata.category(c) != "Cn" and c.lower() == c, hex(ord(c))
    chars = assigned + newer
    for c in chars:
        certify_py(fold_py(c))  # Arrow-path gate accepts
    assert _spark_lower_fold(spark, chars) == chars  # JVM gate + identity
    assert _duck_lower_fold(chars) == chars


def test_allowlist_ranges_are_lower_identity_everywhere(spark):
    # sweep a sample across every allowlisted range (assigned AND
    # unassigned codepoints): all three engines must lower-fold each to
    # itself, and both gates must accept — the documented residual
    # assumption that these blocks never carry cased characters, made
    # empirical for the engines actually in play
    from thesis_iceberg_spark.queries.textnorm import JVM_CN_CASELESS_ALLOW

    chars = []
    for lo, hi in JVM_CN_CASELESS_ALLOW:
        step = max(1, (hi - lo) // 40)
        chars.extend(chr(cp) for cp in range(lo, hi + 1, step))
        chars.append(chr(hi))
    assert all(c.lower() == c for c in chars)  # never cased, newest data
    for c in chars:
        certify_py(fold_py(c))
    assert _spark_lower_fold(spark, chars) == chars
    assert _duck_lower_fold(chars) == chars


def test_unassigned_outside_allowlist_still_raises():
    # the \p{Cn} arm is narrowed, not removed: a genuinely unassigned
    # codepoint outside the allowlisted blocks still fails loudly
    for bad in ("͸", "΀", "⿠"):
        assert unicodedata.category(bad) == "Cn"
        with pytest.raises(ValueError, match="tokenizer contract"):
            certify_py(fold_py(bad))


def test_fold_is_noop_on_plain_ascii():
    s = "The Quick\tBrown\nFox 123 !?"
    assert fold_py(s) == s
    assert fold_py(s, cased=False) == s
