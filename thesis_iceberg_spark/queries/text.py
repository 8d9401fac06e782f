"""Text-analysis operators over `documents` (north-star §2B).

Training-data-pipeline text primitives, all expressed with built-in
pyspark.sql.functions (JVM-side, whole-stage-codegen friendly — no Python
UDFs anywhere): token counting, language ID, quality scoring, document
fingerprinting, n-gram profiling.

Scale notes: every operator here is embarrassingly parallel over documents
(narrow transformations, no shuffle) except the bigram profile, which
shuffles once on (lang, bigram) — the canonical map-side-combinable
aggregation. At 100 TB none of these change shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.queries.textnorm import certify_py, fold_col, fold_py, fold_sql
from thesis_iceberg_spark.sources.registry import load_table

# Marker stopwords per language for the n-gram/stopword language heuristic.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "es": ("el", "los", "las", "y", "por", "que", "con"),
}

EN_STOPWORDS = ("the", "and", "of", "to", "in", "is", "for", "a", "on", "with")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _toks(col: str = "text"):
    """Whitespace tokens of the lowercased text (split + lower are codegen'd).
    Delegates to _toks_of (defined with the LM-filter family below) so the
    canonical tokenizer expression exists exactly once in this module."""
    return _toks_of(F.col(col))


def _sql_toks(col: str = "text") -> str:
    """DuckDB twin of _toks(); the textnorm unicode fold (whitespace /
    invisible-char / İ-Σ case fixups) runs before trim/lower exactly like
    the Spark side (see _toks_of)."""
    return f"regexp_split_to_array(trim(lower({fold_sql(col)})), '\\s+')"


@register(
    "text_token_stats",
    oracle=f"""
SELECT doc_id,
       len({_sql_toks()}) AS n_tokens,
       length(regexp_extract_all(lower({fold_sql("text")}),
                                 '[a-z0-9]+|[^a-z0-9\\s]')) AS n_tokens_bpe,
       length(text) AS n_chars_m,
       CAST(length(replace(trim({fold_sql("text", cased=False)}), ' ', ''))
                AS DOUBLE) / len({_sql_toks()})
           AS avg_token_len
FROM documents
""",
    doc="Token counting: whitespace tokens + a BPE-ish regex tokenizer "
    "(word pieces and standalone punctuation), char length, mean token "
    "length. Narrow per-row op; zero shuffle.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks()
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(
            F.regexp_extract_all(
                # unicode fold: [^a-z0-9\s] differs Java-vs-RE2 on \x0B
                # and punct-vs-space treatment of unicode whitespace, just
                # like the split tokenizer (see _toks_of)
                F.lower(fold_col(F.col("text"))),
                F.lit(r"[a-z0-9]+|[^a-z0-9\s]"),
                F.lit(0),
            )
        ).alias("n_tokens_bpe"),
        F.length("text").alias("n_chars_m"),
        (
            # non-space chars are counted over the FOLDED text: DuckDB's
            # default trim() eats unicode whitespace where Spark's is
            # space-only — folding unicode WS to plain spaces first makes
            # trim + replace(' ') mean the same thing in both engines
            # (caught by tests/test_unicode_corpus_parity.py on an
            # NBSP-only document)
            F.length(
                F.replace(
                    F.trim(fold_col(F.col("text"), cased=False)),
                    F.lit(" "),
                    F.lit(""),
                )
            ).cast("double")
            / F.size(toks)
        ).alias("avg_token_len"),
    )


def _marker_count(toks_col, words: tuple[str, ...]):
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks_col, lambda t: F.array_contains(arr, t)))


def _sql_marker_count(toks_sql: str, words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks_sql}, t -> t IN ({lst})))"


@register(
    "text_lang_id",
    oracle=f"""
WITH scored AS (
  SELECT doc_id,
         length(regexp_extract_all(text, '[^\\x00-\\x7f]')) AS n_nonascii,
         {_sql_marker_count(_sql_toks(), LANG_MARKERS["en"])} AS c_en,
         {_sql_marker_count(_sql_toks(), LANG_MARKERS["de"])} AS c_de,
         {_sql_marker_count(_sql_toks(), LANG_MARKERS["fr"])} AS c_fr,
         {_sql_marker_count(_sql_toks(), LANG_MARKERS["es"])} AS c_es
  FROM documents)
SELECT doc_id,
       CASE WHEN n_nonascii > 0 THEN 'zh'
            WHEN c_en = 0 AND c_de = 0 AND c_fr = 0 AND c_es = 0 THEN 'unknown'
            WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
            WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
            WHEN c_fr >= c_es THEN 'fr'
            ELSE 'es' END AS detected_lang
FROM scored
""",
    doc="Language ID via stopword-marker scoring (n-gram heuristic): count "
    "language-specific marker words, argmax with deterministic tie-break; "
    "non-ASCII presence routes to 'zh'. Pure builtins, no UDF.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id_df(_docs(spark, sf_dir))


def lang_id_df(docs: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Marker-scoring language ID over any documents frame (doc_id, text);
    extracted from the registered query in r11 so pipeline compositions
    can stack it on a projection chain (``keep_cols`` threads extra
    columns through — see quality_frame)."""
    toks = _toks()
    scored = docs.select(
        *keep_cols,
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"[^\x00-\x7f]"), F.lit(0))).alias("n_nonascii"),
        _marker_count(toks, LANG_MARKERS["en"]).alias("c_en"),
        _marker_count(toks, LANG_MARKERS["de"]).alias("c_de"),
        _marker_count(toks, LANG_MARKERS["fr"]).alias("c_fr"),
        _marker_count(toks, LANG_MARKERS["es"]).alias("c_es"),
    )
    detected = (
        F.when(F.col("n_nonascii") > 0, F.lit("zh"))
        .when(
            (F.col("c_en") == 0) & (F.col("c_de") == 0) & (F.col("c_fr") == 0) & (F.col("c_es") == 0),
            F.lit("unknown"),
        )
        .when(
            (F.col("c_en") >= F.col("c_de"))
            & (F.col("c_en") >= F.col("c_fr"))
            & (F.col("c_en") >= F.col("c_es")),
            F.lit("en"),
        )
        .when((F.col("c_de") >= F.col("c_fr")) & (F.col("c_de") >= F.col("c_es")), F.lit("de"))
        .when(F.col("c_fr") >= F.col("c_es"), F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return scored.select(*keep_cols, "doc_id", detected.alias("detected_lang"))


@register(
    "text_quality_scores",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         length(text) AS n_chars_m,
         len({_sql_toks()}) AS n_tokens,
         length(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         length(regexp_extract_all(lower(text), '[a-z]')) AS n_alpha,
         {_sql_marker_count(_sql_toks(), EN_STOPWORDS)} AS n_stop
  FROM documents)
SELECT doc_id,
       CAST(n_punct AS DOUBLE) / n_chars_m AS punct_ratio,
       CAST(n_alpha AS DOUBLE) / n_chars_m AS alpha_ratio,
       CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
       0.4 * (CAST(n_alpha AS DOUBLE) / n_chars_m)
       + 0.3 * (1 - CAST(n_punct AS DOUBLE) / n_chars_m)
       + 0.3 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100) AS quality_score
FROM m
""",
    doc="Quality scoring from length/punctuation/stopword ratios — the "
    "standard pre-training filter features (Gopher/C4-style rules). All "
    "ratios are integer-count divisions so doubles are exactly reproducible.",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_frame(_docs(spark, sf_dir)).select(
        "doc_id",
        "punct_ratio",
        "alpha_ratio",
        "stopword_ratio",
        "quality_score",
    )


def quality_frame(docs: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """ONE-PASS quality frame: the registered ratio/score columns PLUS the
    raw ``n_tokens`` count they were derived from — so composers that need
    score AND token mass together (pipeline_token_budget_select) get both
    from a single documents scan instead of self-joining two scans on
    doc_id (a pure-overhead shuffle at corpus scale).

    ``keep_cols`` threads extra input columns through unchanged (r11, for
    pipeline_pretrain_corpus): because the result stays a pure projection
    chain over ``docs``, stacking further per-doc stages on the output —
    instead of joining parallel frames on doc_id — keeps the WHOLE
    feature stage one Catalyst-fused scan."""
    m = docs.select(
        *keep_cols,
        "doc_id",
        F.length("text").alias("n_chars_m"),
        F.size(_toks()).alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[.,;:!?]"), F.lit(0))).alias("n_punct"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]"), F.lit(0))).alias("n_alpha"),
        _marker_count(_toks(), EN_STOPWORDS).alias("n_stop"),
    )
    # try_divide: an EMPTY document (n_chars/n_tokens = 0) must yield NULL
    # ratios like the DuckDB oracle (division by zero is NULL there), not
    # throw DIVIDE_BY_ZERO under ANSI (Spark 4 default)
    punct = F.try_divide(F.col("n_punct").cast("double"), F.col("n_chars_m"))
    alpha = F.try_divide(F.col("n_alpha").cast("double"), F.col("n_chars_m"))
    stop = F.try_divide(F.col("n_stop").cast("double"), F.col("n_tokens"))
    qual = (
        F.lit(0.4) * alpha
        + F.lit(0.3) * (F.lit(1) - punct)
        + F.lit(0.3) * (F.least(F.col("n_tokens"), F.lit(100)).cast("double") / F.lit(100))
    )
    return m.select(
        *keep_cols,
        "doc_id",
        "n_tokens",
        punct.alias("punct_ratio"),
        alpha.alias("alpha_ratio"),
        stop.alias("stopword_ratio"),
        qual.alias("quality_score"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       md5(regexp_replace(trim(lower({fold_sql("text")})), '\\s+', ' ', 'g'))
           AS fingerprint
FROM documents
""",
    doc="Document fingerprinting: md5 over whitespace-normalized lowercase "
    "text — the exact-dedup key (a keyed rolling hash would drop in the "
    "same slot; md5 is the portable choice both engines share). The "
    "textnorm unicode fold runs first in both engines (see _toks_of).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select("doc_id", fingerprint_expr().alias("fingerprint"))


def fingerprint_expr(col: str = "text"):
    """The exact-dedup key as a reusable Column (r11: shared with
    pipeline_pretrain_corpus so the composition can never drift from the
    registered fingerprint)."""
    return F.md5(
        F.regexp_replace(F.trim(F.lower(fold_col(F.col(col)))), r"\s+", " ").cast(
            "binary"
        )
    )


@register(
    "text_top_bigrams_by_lang",
    oracle=f"""
WITH toks AS (SELECT doc_id, lang, {_sql_toks()} AS t FROM documents),
bigrams AS (
  SELECT lang, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM toks WHERE len(t) >= 2),
counts AS (SELECT lang, bigram, COUNT(*) AS n FROM bigrams GROUP BY lang, bigram)
SELECT lang, bigram, n,
       ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rnk
FROM counts QUALIFY rnk <= 3
""",
    doc="N-gram profiling: top-3 bigrams per language. explode -> "
    "map-side-combined count -> per-group top-k window; the shuffle key "
    "(lang, bigram) is high-cardinality so no skew at scale.",
)
def text_top_bigrams_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    toks = _docs(spark, sf_dir).select("lang", _toks().alias("t")).filter(F.size("t") >= 2)
    bigrams = toks.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.concat_ws(" ", F.col("t")[i], F.col("t")[i + 1]),
            )
        ).alias("bigram"),
    )
    counts = bigrams.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return counts.select("lang", "bigram", "n", F.row_number().over(w).alias("rnk")).filter(
        F.col("rnk") <= 3
    )


@register(
    "text_gopher_quality_flags",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         {_sql_toks()} AS t,
         len({_sql_toks()}) AS n_tokens,
         len(list_distinct({_sql_toks()})) AS n_distinct
  FROM documents),
r AS (
  SELECT doc_id, n_tokens,
         CAST(length(array_to_string(t, '')) AS DOUBLE) / n_tokens AS mean_word_len,
         1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_frac
  FROM m)
SELECT doc_id,
       (n_tokens BETWEEN 10 AND 100000) AS ok_length,
       (mean_word_len BETWEEN 2.0 AND 10.0) AS ok_word_len,
       (dup_token_frac <= 0.6) AS ok_repetition,
       ((n_tokens BETWEEN 10 AND 100000)
         AND (mean_word_len BETWEEN 2.0 AND 10.0)
         AND (dup_token_frac <= 0.6)) AS keep
FROM r
""",
    doc="Gopher-style corpus quality gates (the rule family large corpus "
    "cleaning pipelines apply document-wise): token-count bounds, mean "
    "word length bounds, duplicate-token fraction cap — each as a boolean "
    "flag plus the conjunctive keep decision. All JVM builtins, narrow "
    "per-row map, zero shuffle; at 100 TB this fuses into the ingest scan.",
)
def text_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _toks()
    m = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        (
            F.length(F.array_join(toks, "")).cast("double") / F.size(toks)
        ).alias("mean_word_len"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("dup_token_frac"),
    )
    ok_length = F.col("n_tokens").between(10, 100_000)
    ok_word_len = F.col("mean_word_len").between(2.0, 10.0)
    ok_repetition = F.col("dup_token_frac") <= 0.6
    return m.select(
        "doc_id",
        ok_length.alias("ok_length"),
        ok_word_len.alias("ok_word_len"),
        ok_repetition.alias("ok_repetition"),
        (ok_length & ok_word_len & ok_repetition).alias("keep"),
    )


# Gopher repetition rules (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", table A1 — public
# paper): a document is removed when the fraction of characters inside the
# single most frequent n-gram exceeds the TOP threshold (n = 2, 3, 4), or
# the fraction of characters inside n-grams that occur more than once
# exceeds the DUP threshold (n = 5..10).  These are the published pairs;
# the line/paragraph duplicate rules are text_gopher_line_flags below.
#
# DELIBERATE DEVIATION from the paper's TOP statistic (ADVICE r4): Rae et
# al. define it over the most frequent n-gram with NO repetition
# requirement; here the top gram must occur MORE THAN ONCE, because in a
# short all-unique document every gram is "most frequent" at count 1 and
# the published thresholds (calibrated on web-scale docs) would flag mere
# shortness as repetition.  Both engines apply the same definition, so
# oracles agree; thresholds are the paper's.
GOPHER_TOP_FRAC = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_FRAC = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
_TOP_NS = tuple(GOPHER_TOP_FRAC)  # aggregate needed per n: top for 2-4,
_DUP_NS = tuple(GOPHER_DUP_FRAC)  # dup for 5-10

# Gram identity is a ROLLING HASH over per-token 40-bit md5 values, not the
# concatenated string: building string n-grams for nine gram sizes copies
# O(sum n^2) ~ 380 characters per token position (measured 16 s at sf0.1);
# the integer fold is ~50 bigint ops per position (measured ~4 s).  Both
# engines compute the identical fold, so collisions (~grams^2 / 2^41 per
# document per n — negligible) are SYMMETRIC and results stay hash-equal.
# Character counts come from token-length sums: len(gram) = sum(len(tok))
# + (n-1) separators, exactly the concatenated string's length.  Fractions
# are normalized by DOCUMENT characters (the normalized text's length) —
# the paper's statistic — so overlapping duplicate grams can push a
# fraction above 1.0; normalizing by total gram-character mass instead
# would systematically deflate every fraction (~2x at n=2) and misapply
# the published thresholds.
_HASH_BASE = 1 << 20
_HASH_MOD = 1 << 40  # base*mod + mod < 2^63: the fold never overflows int64

# Per-task token-hash memoization (VERDICT r5 #4): the Arrow kernels'
# dominant per-core cost was one interpreted hashlib.md5 per token
# OCCURRENCE.  Natural-language token streams repeat heavily (Zipf), so
# hashing each DISTINCT token once per task and dict-hitting the rest is a
# ~7x kernel-step win (measured on the sf0.1 token distribution; recorded
# in PERFORMANCE.md).  The cache clears at _TOK_CACHE_CAP entries to bound
# task memory on adversarial vocabularies — correctness never depends on
# retention.  int.from_bytes(digest()[:5], 'big') equals the previous
# int(hexdigest()[:10], 16) bit-for-bit, so every md5-based oracle is
# unchanged.
_TOK_CACHE_CAP = 1 << 20


def _tok40_hasher():
    """Memoized token -> 40-bit md5-prefix hash (one instance per Arrow
    task; the cache spans every batch and document the task sees)."""
    from hashlib import md5

    cache: dict[str, int] = {}
    get = cache.get

    def h40(tk: str) -> int:
        v = get(tk)
        if v is None:
            if len(cache) >= _TOK_CACHE_CAP:
                cache.clear()
            v = cache[tk] = int.from_bytes(md5(tk.encode()).digest()[:5], "big")
        return v

    return h40


def _sql_rep_tt() -> str:
    toks = _sql_toks()
    return (
        f"SELECT doc_id, "
        f"list_transform({toks}, x -> CAST('0x' || substr(md5(x), 1, 10) AS BIGINT)) AS th, "
        f"list_transform({toks}, x -> length(x)) AS tl FROM documents"
    )


def _sql_rep_grams(n: int) -> str:
    """Per-n parallel unnest of (rolling hash, char length) lists."""
    h = "th[i]"
    for j in range(1, n):
        h = f"(({h}) * {_HASH_BASE} + th[i+{j}]) % {_HASH_MOD}"
    ln = " + ".join(f"tl[i+{j}]" for j in range(n)) + f" + {n - 1}"
    rng = f"range(1, len(th) - {n - 1} + 1)"
    return (
        f"SELECT doc_id, {n} AS n, "
        f"unnest(list_transform({rng}, i -> {h})) AS h, "
        f"unnest(list_transform({rng}, i -> {ln})) AS len FROM tt"
    )


_SQL_REP_EX = " UNION ALL ".join(_sql_rep_grams(n) for n in _TOP_NS + _DUP_NS)
_SQL_REP_WIDE_COLS = ", ".join(
    f"MAX(CASE WHEN n = {n} THEN CAST({agg} AS DOUBLE) / dl.dl END) AS {agg}{n}"
    for agg, ns in (("top", _TOP_NS), ("dup", _DUP_NS))
    for n in ns
)
_SQL_REP_OUT = ", ".join(
    f"COALESCE({agg}{n}, 0.0) AS {agg}_{n}gram_char_frac"
    for agg, ns in (("top", _TOP_NS), ("dup", _DUP_NS))
    for n in ns
)
_SQL_REP_KEEP = " AND ".join(
    f"COALESCE({agg}{n}, 0.0) <= {thr[n]}"
    for agg, ns, thr in (("top", _TOP_NS, GOPHER_TOP_FRAC),
                         ("dup", _DUP_NS, GOPHER_DUP_FRAC))
    for n in ns
)


@register(
    "text_gopher_repetition_signals",
    oracle=f"""
WITH tt AS ({_sql_rep_tt()}),
ex AS ({_SQL_REP_EX}),
c AS (SELECT doc_id, n, h, MAX(len) AS len, COUNT(*) AS c
      FROM ex GROUP BY 1, 2, 3),
dl AS (SELECT doc_id, list_aggregate(tl, 'sum') + len(tl) - 1 AS dl FROM tt),
p AS (SELECT doc_id, n,
             SUM(CASE WHEN c > 1 THEN c * len ELSE 0 END) AS dup,
             COALESCE(MAX(CASE WHEN c > 1 THEN c * len END), 0) AS top
      FROM c GROUP BY 1, 2),
w AS (SELECT p.doc_id, {_SQL_REP_WIDE_COLS}
      FROM p JOIN dl ON dl.doc_id = p.doc_id GROUP BY p.doc_id)
SELECT d.doc_id, {_SQL_REP_OUT}, ({_SQL_REP_KEEP}) AS keep
FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
""",
    doc="Gopher REPETITION rules — the within-document duplicate-n-gram "
    "family the flat dup-token fraction in text_gopher_quality_flags "
    "cannot see, at the PUBLISHED threshold pairs (Rae et al. table A1): "
    "fraction of characters inside the most frequent REPEATED n-gram for "
    "n=2,3,4 (0.20/0.18/0.16; a unique gram in a short doc is not "
    "repetition) and fraction of characters inside duplicated n-grams for "
    "n=5..10 (0.15 down to 0.10), plus the conjunctive keep. Spark shape: "
    "mapInPandas over Arrow document batches — every statistic is a "
    "function of ONE document's tokens (bounded state, no cross-document "
    "term), so the scalable plan is the NARROW one: zero shuffles, zero "
    "joins, embarrassingly parallel over input splits; inside the batch "
    "the nine gram sizes are numpy int64 rolling-hash folds extended "
    "incrementally (n-grams from (n-1)-grams) with sort-based duplicate "
    "counting. The same 40-bit-md5 fold as the DuckDB oracle, so hash "
    "collisions are symmetric and results stay hash-equal. At 100 TB "
    "this is the standard pre-training repetition filter pass.",
)
def text_gopher_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Implementation history (all oracle-exact, timed warm at sf0.1):
    # string-concat grams 16 s; zip_with integer folds (interpreted HOFs)
    # 7.5 s; posexplode + 18-column lead window + explode(array(9 structs))
    # + two keyed aggregates — all-JVM codegen — 5.3-6.9 s, dominated by
    # composition overhead (window sort + 9x generator + a 2.2M-row
    # aggregate of what is only 270k tokens); THIS Arrow form 0.5-0.7 s in
    # the recorded bench (up to ~1.3 s under concurrent machine load).
    # Per-document bounded state means Python sees each doc once and the
    # plan has NO exchange at all — strictly better at 1000 executors,
    # where the JVM form's two doc_id shuffles move the whole gram mass.
    # Tokenizer twin of _toks()/the oracle's regexp_split: re.ASCII \s+
    # equals Java's default-ASCII \s ([ \t\n\x0B\f\r], \x0B == \v); RE2's
    # \s EXCLUDES \x0B, so all three twins fold it to a space FIRST
    # (replace before strip — the fold must precede edge-trimming exactly
    # like the SQL replace() sits inside trim()).  Both engines' trim()
    # removes SPACES only, so the Python twin is strip(' ') — a bare
    # strip() would also eat edge \n/\t and shift the tokenization.  The
    # corpus is ASCII (FIXTURES.md) so lower() agrees across engines.
    # NULL text mirrors the oracle's LEFT JOIN: zero fractions, keep=true.
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    pairs = [("top", n) for n in _TOP_NS] + [("dup", n) for n in _DUP_NS]
    cols = [f"{agg}_{n}gram_char_frac" for agg, n in pairs]
    schema = (
        "doc_id bigint, " + ", ".join(f"{c} double" for c in cols) + ", keep boolean"
    )
    top_ns, dup_ns = _TOP_NS, _DUP_NS
    base, mod = _HASH_BASE, _HASH_MOD
    top_thr, dup_thr = GOPHER_TOP_FRAC, GOPHER_DUP_FRAC

    def compute(batches):
        import re

        import numpy as np
        import pandas as pd

        ws = re.compile(r"\s+", re.ASCII)
        max_n = max(top_ns + dup_ns)
        h40 = _tok40_hasher()  # per-task memoized md5 (oracle-identical)
        for pdf in batches:
            recs = []
            for doc_id, text in zip(pdf["doc_id"].to_numpy(), pdf["text"]):
                folded = fold_py(text or "")
                certify_py(folded)  # md5-comparing kernel: shingle contract
                toks = ws.split(folded.strip(" ").lower())
                t = len(toks)
                hs = np.fromiter(
                    (h40(tk) for tk in toks), dtype=np.int64, count=t
                )
                ls = np.fromiter((len(tk) for tk in toks), dtype=np.int64, count=t)
                # paper denominator: document chars of the normalized text
                # = token chars + single-space separators
                dl = int(ls.sum()) + t - 1
                fr = {}
                g, gl = hs, ls
                for n in range(2, max_n + 1):
                    if len(g) <= 1:  # doc shorter than n tokens
                        g = g[:0]
                        fr[n] = 0.0
                        continue
                    # extend every (n-1)-gram by its next token: hash fold
                    # stays < 2^60 (base*mod + mod), never overflows int64
                    g = (g[:-1] * base + hs[n - 1 :]) % mod
                    gl = gl[:-1] + ls[n - 1 :] + 1
                    order = np.argsort(g, kind="stable")
                    sg, sl = g[order], gl[order]
                    starts = np.flatnonzero(np.r_[True, sg[1:] != sg[:-1]])
                    counts = np.diff(np.r_[starts, len(sg)])
                    # max-per-group mirrors the oracle's MAX(len) exactly,
                    # so 2^-41 hash collisions stay symmetric
                    maxlen = np.maximum.reduceat(sl, starts)
                    rep = counts > 1
                    chars = counts[rep] * maxlen[rep]
                    # top counts only grams occurring MORE THAN ONCE — see
                    # the GOPHER_TOP_FRAC deviation note above
                    if n in top_ns:
                        fr[n] = (int(chars.max()) / dl) if chars.size else 0.0
                    else:
                        fr[n] = (int(chars.sum()) / dl) if chars.size else 0.0
                keep = all(fr[n] <= top_thr[n] for n in top_ns) and all(
                    fr[n] <= dup_thr[n] for n in dup_ns
                )
                recs.append(
                    (int(doc_id), *[fr[n] for n in top_ns + dup_ns], keep)
                )
            yield pd.DataFrame(recs, columns=["doc_id", *cols, "keep"])

    return docs.mapInPandas(compute, schema)


# Gopher lexical gates (Rae et al. table A1, same public paper): at least
# 80% of words must contain an alphabetic character, the symbol-to-word
# ratio for '#' and '...' must not exceed 0.1, and the document must
# contain at least two of eight required English stop words.  (The mean-
# word-length rule lives in text_gopher_quality_flags.)
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MAX_SYMBOL_WORD_RATIO = 0.1
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_STOP_HITS = 2

_SQL_LEX_STOP_HITS = " + ".join(
    f"CASE WHEN list_contains({_sql_toks()}, '{w}') THEN 1 ELSE 0 END"
    for w in GOPHER_STOP_WORDS
)


@register(
    "text_gopher_lexical_flags",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         len({_sql_toks()}) AS n_tokens,
         list_sum(list_transform({_sql_toks()},
           x -> CASE WHEN regexp_matches(x, '[a-z]') THEN 1 ELSE 0 END))
           AS n_alpha,
         length(regexp_extract_all(text, '#')) +
         length(regexp_extract_all(text, '\\.\\.\\.')) AS n_symbols,
         {_SQL_LEX_STOP_HITS} AS n_stop_hits
  FROM documents)
SELECT doc_id,
       CAST(n_alpha AS DOUBLE) / n_tokens AS alpha_word_frac,
       CAST(n_symbols AS DOUBLE) / n_tokens AS symbol_word_ratio,
       n_stop_hits,
       (CAST(n_alpha AS DOUBLE) / n_tokens >= {GOPHER_MIN_ALPHA_WORD_FRAC}
        AND CAST(n_symbols AS DOUBLE) / n_tokens <= {GOPHER_MAX_SYMBOL_WORD_RATIO}
        AND n_stop_hits >= {GOPHER_MIN_STOP_HITS}) AS keep
FROM m
""",
    doc="Gopher LEXICAL gates (Rae et al. table A1) — the rule family "
    "between length stats and repetition: fraction of words containing an "
    "alphabetic character (>= 0.8), symbol-to-word ratio for '#' and "
    "'...' (<= 0.1), and presence of at least two of the paper's eight "
    "required English stop words. Pure narrow map over documents — "
    "builtins inside whole-stage codegen, zero shuffle; at 100 TB this "
    "fuses into the ingest scan alongside the other quality gates.",
)
def text_gopher_lexical_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_lexical_flags_df(_docs(spark, sf_dir))


def gopher_lexical_flags_df(
    docs: DataFrame, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Gopher lexical gates over any documents frame (doc_id, text);
    extracted from the registered query in r11 — a pure projection, so
    pipeline_pretrain_corpus stacks it on its fused per-doc feature
    chain (``keep_cols`` threads extra columns through, see
    quality_frame)."""
    toks = _toks()
    n_tokens = F.size(toks)
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    n_symbols = F.regexp_count(F.col("text"), F.lit("#")) + F.regexp_count(
        F.col("text"), F.lit(r"\.\.\.")
    )
    n_stop_hits = sum(
        F.when(F.array_contains(toks, w), 1).otherwise(0) for w in GOPHER_STOP_WORDS
    )
    m = docs.select(
        *keep_cols,
        "doc_id",
        (n_alpha.cast("double") / n_tokens).alias("alpha_word_frac"),
        (n_symbols.cast("double") / n_tokens).alias("symbol_word_ratio"),
        n_stop_hits.alias("n_stop_hits"),
    )
    keep = (
        (F.col("alpha_word_frac") >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (F.col("symbol_word_ratio") <= GOPHER_MAX_SYMBOL_WORD_RATIO)
        & (F.col("n_stop_hits") >= GOPHER_MIN_STOP_HITS)
    )
    return m.select(
        *keep_cols,
        "doc_id",
        "alpha_word_frac",
        "symbol_word_ratio",
        "n_stop_hits",
        keep.alias("keep"),
    )


# ---------------------------------------------------------------------------
# Gopher duplicate-LINE / duplicate-PARAGRAPH rules (Rae et al. table A1 —
# the last 2 of the 6 repetition sub-families; VERDICT r4 #3): a document
# is removed when the fraction of lines (paragraphs) that are duplicates
# exceeds 0.30, or the fraction of characters inside duplicated lines
# (paragraphs) exceeds 0.20.  "Duplicate" counts ALL occurrences of any
# piece appearing more than once WITHIN the document — the same
# all-occurrence convention as the n-gram DUP rules above, identical in
# both engines so oracles agree.
GOPHER_MAX_DUP_LINE_FRAC = 0.30
GOPHER_MAX_DUP_PARA_FRAC = 0.30
GOPHER_MAX_DUP_LINE_CHAR_FRAC = 0.20
GOPHER_MAX_DUP_PARA_CHAR_FRAC = 0.20
# The driver's synthetic corpus carries no newline structure (flat token
# streams), so the REGISTERED query derives deterministic lines — fixed
# 8-token chunks — and paragraphs — 4 consecutive lines (32 tokens) — in
# both engines; real corpora go through gopher_line_flags_df, which splits
# on '\n' / '\n\n' (crafted-document pytest coverage).
_LINE_TOKS = 8
_PARA_TOKS = 32


def _dup_piece_flags(base: DataFrame) -> DataFrame:
    """(doc_id, dl, lines, paras) -> the four duplicate fractions + keep.

    Shape: one explode per piece kind tagged L/P, a (doc_id, kind, piece)
    count, a (doc_id, kind) roll-up, and a conditional-agg pivot to one
    row per document — two keyed map-side-combinable shuffles whose
    cardinality is bounded by pieces per document.  At 100 TB this is the
    standard pre-training structural-repetition pass next to the n-gram
    rules."""
    pieces = base.select(
        "doc_id", "dl", F.lit("L").alias("kind"), F.explode("lines").alias("piece")
    ).unionByName(
        base.select(
            "doc_id", "dl", F.lit("P").alias("kind"), F.explode("paras").alias("piece")
        )
    )
    cnt = pieces.groupBy("doc_id", "dl", "kind", "piece").agg(
        F.count("*").alias("c")
    )
    dup_c = F.when(F.col("c") > 1, F.col("c")).otherwise(0)
    stats = cnt.groupBy("doc_id", "dl", "kind").agg(
        F.sum("c").alias("np"),
        F.sum(dup_c).alias("dp"),
        F.sum(dup_c * F.length("piece")).alias("dc"),
    )
    is_l = F.col("kind") == "L"
    wide = stats.groupBy("doc_id").agg(
        F.max(F.when(is_l, F.col("dp").cast("double") / F.col("np"))).alias("lf"),
        F.max(F.when(~is_l, F.col("dp").cast("double") / F.col("np"))).alias("pf"),
        F.max(F.when(is_l, F.col("dc").cast("double") / F.col("dl"))).alias("lcf"),
        F.max(F.when(~is_l, F.col("dc").cast("double") / F.col("dl"))).alias("pcf"),
    )
    z = {
        "dup_line_frac": F.coalesce(F.col("lf"), F.lit(0.0)),
        "dup_para_frac": F.coalesce(F.col("pf"), F.lit(0.0)),
        "dup_line_char_frac": F.coalesce(F.col("lcf"), F.lit(0.0)),
        "dup_para_char_frac": F.coalesce(F.col("pcf"), F.lit(0.0)),
    }
    keep = (
        (z["dup_line_frac"] <= GOPHER_MAX_DUP_LINE_FRAC)
        & (z["dup_para_frac"] <= GOPHER_MAX_DUP_PARA_FRAC)
        & (z["dup_line_char_frac"] <= GOPHER_MAX_DUP_LINE_CHAR_FRAC)
        & (z["dup_para_char_frac"] <= GOPHER_MAX_DUP_PARA_CHAR_FRAC)
    )
    return (
        base.select("doc_id")
        .join(wide, "doc_id", "left")
        .select(
            "doc_id", *[c.alias(n) for n, c in z.items()], keep.alias("keep")
        )
    )


def gopher_line_flags_df(docs: DataFrame) -> DataFrame:
    """The line rules over REAL newline-structured text: lines split on
    '\\n', paragraphs on '\\n\\n', blank/whitespace pieces dropped,
    character fractions over the raw text length."""

    def clean(col):
        return F.filter(
            F.transform(col, lambda x: F.trim(x)), lambda x: F.length(x) > 0
        )

    base = docs.select(
        "doc_id",
        F.length("text").alias("dl"),
        clean(F.split(F.col("text"), r"\n")).alias("lines"),
        clean(F.split(F.col("text"), r"\n\n")).alias("paras"),
    )
    return _dup_piece_flags(base)


def _chunks(toks, size: int):
    """Fixed ``size``-token chunks of the token array as joined strings."""
    n_chunks = F.ceil(F.size(toks) / F.lit(size)).cast("int")
    return F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(toks, i * size + 1, size), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _sql_chunks(toks: str, size: int) -> str:
    return (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"list_transform(range(1, CAST(ceil(len({toks}) / {size}.0) AS INT) + 1), "
        f"i -> array_to_string(list_slice({toks}, (i - 1) * {size} + 1, i * {size}), ' ')) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


_SQL_LINE_DL = (
    f"list_sum(list_transform({_sql_toks()}, x -> length(x))) + len({_sql_toks()}) - 1"
)


@register(
    "text_gopher_line_flags",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         {_SQL_LINE_DL} AS dl,
         {_sql_chunks(_sql_toks(), _LINE_TOKS)} AS lines,
         {_sql_chunks(_sql_toks(), _PARA_TOKS)} AS paras
  FROM documents),
lp AS (
  SELECT doc_id, dl, 'L' AS kind, unnest(lines) AS piece FROM base
  UNION ALL
  SELECT doc_id, dl, 'P' AS kind, unnest(paras) AS piece FROM base),
c AS (SELECT doc_id, dl, kind, piece, COUNT(*) AS c
      FROM lp GROUP BY doc_id, dl, kind, piece),
s AS (SELECT doc_id, dl, kind, SUM(c) AS np,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dp,
             SUM(CASE WHEN c > 1 THEN c * length(piece) ELSE 0 END) AS dc
      FROM c GROUP BY doc_id, dl, kind),
w AS (SELECT doc_id,
             MAX(CASE WHEN kind = 'L' THEN CAST(dp AS DOUBLE) / np END) AS lf,
             MAX(CASE WHEN kind = 'P' THEN CAST(dp AS DOUBLE) / np END) AS pf,
             MAX(CASE WHEN kind = 'L' THEN CAST(dc AS DOUBLE) / dl END) AS lcf,
             MAX(CASE WHEN kind = 'P' THEN CAST(dc AS DOUBLE) / dl END) AS pcf
      FROM s GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(lf, 0.0) AS dup_line_frac,
       COALESCE(pf, 0.0) AS dup_para_frac,
       COALESCE(lcf, 0.0) AS dup_line_char_frac,
       COALESCE(pcf, 0.0) AS dup_para_char_frac,
       (COALESCE(lf, 0.0) <= {GOPHER_MAX_DUP_LINE_FRAC}
        AND COALESCE(pf, 0.0) <= {GOPHER_MAX_DUP_PARA_FRAC}
        AND COALESCE(lcf, 0.0) <= {GOPHER_MAX_DUP_LINE_CHAR_FRAC}
        AND COALESCE(pcf, 0.0) <= {GOPHER_MAX_DUP_PARA_CHAR_FRAC}) AS keep
FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
""",
    doc="Gopher duplicate-LINE / duplicate-PARAGRAPH rules (Rae et al. "
    "table A1) — the last two repetition sub-families, closing the "
    "published rule set (with text_gopher_repetition_signals and "
    "text_gopher_quality_flags): fraction of duplicate lines/paragraphs "
    "<= 0.30 and of characters inside them <= 0.20. The synthetic corpus "
    "is flat, so the registered entry derives deterministic 8-token lines "
    "and 32-token paragraphs in BOTH engines for a meaningful value "
    "oracle; real newline text goes through gopher_line_flags_df (split "
    "on \\n / \\n\\n, crafted-document pytests). Registered entry runs as "
    "one Arrow mapInPandas (per-document bounded state, zero shuffles); "
    "the newline variant keeps the exchange-based DataFrame shape for "
    "composition.",
)
def text_gopher_line_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow kernel (same rationale + tokenizer twin as
    # text_gopher_repetition_signals; the prior JVM form — interpreted
    # aggregate/transform HOFs + two keyed shuffles — measured 1.9 s at
    # sf0.1, this ~0.4 s): every fraction is a function of ONE document's
    # token chunks.
    line_toks, para_toks = _LINE_TOKS, _PARA_TOKS
    thr = (
        GOPHER_MAX_DUP_LINE_FRAC,
        GOPHER_MAX_DUP_PARA_FRAC,
        GOPHER_MAX_DUP_LINE_CHAR_FRAC,
        GOPHER_MAX_DUP_PARA_CHAR_FRAC,
    )
    schema = (
        "doc_id bigint, dup_line_frac double, dup_para_frac double, "
        "dup_line_char_frac double, dup_para_char_frac double, keep boolean"
    )

    def compute(batches):
        import re
        from collections import Counter

        import pandas as pd

        ws = re.compile(r"\s+", re.ASCII)

        def dup_fracs(pieces, dl):
            cnt = Counter(pieces)
            np_ = len(pieces)
            dp = sum(c for c in cnt.values() if c > 1)
            dc = sum(c * len(p) for p, c in cnt.items() if c > 1)
            # dl == 0 (empty doc: one '' token, dc necessarily 0): DuckDB's
            # 0/0 is NULL, which the oracle COALESCEs to 0.0 / keep=true —
            # mirror that here (the previous NaN silently diverged from the
            # oracle on empty/whitespace-only docs; caught by the r10
            # \x0B-corpus parity sweep, tests/test_vt_corpus_parity.py)
            return dp / np_, (dc / dl) if dl else 0.0

        for pdf in batches:
            recs = []
            for doc_id, text in zip(pdf["doc_id"].to_numpy(), pdf["text"]):
                if text is None:
                    # NULL toks -> empty chunk arrays -> no pieces: the
                    # oracle's LEFT JOIN + COALESCE path (0.0 / keep)
                    recs.append((int(doc_id), 0.0, 0.0, 0.0, 0.0, True))
                    continue
                folded = fold_py(text)
                certify_py(folded)  # md5-comparing kernel: shingle contract
                toks = ws.split(folded.strip(" ").lower())
                dl = sum(len(t) for t in toks) + len(toks) - 1
                lines = [
                    " ".join(toks[i : i + line_toks])
                    for i in range(0, len(toks), line_toks)
                ]
                paras = [
                    " ".join(toks[i : i + para_toks])
                    for i in range(0, len(toks), para_toks)
                ]
                lf, lcf = dup_fracs(lines, dl)
                pf, pcf = dup_fracs(paras, dl)
                keep = lf <= thr[0] and pf <= thr[1] and lcf <= thr[2] and pcf <= thr[3]
                recs.append((int(doc_id), lf, pf, lcf, pcf, keep))
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id",
                    "dup_line_frac",
                    "dup_para_frac",
                    "dup_line_char_frac",
                    "dup_para_char_frac",
                    "keep",
                ],
            )

    return _docs(spark, sf_dir).select("doc_id", "text").mapInPandas(compute, schema)


# --- C4 bad-words blocklist (round 6, VERDICT r5 #5; real list r9) ----------
# Raffel et al. §2.2 drop any page containing a word from a public blocklist:
# the "List of Dirty, Naughty, Obscene, and Otherwise Bad Words" (LDNOOBW,
# originally Shutterstock's; public repo
# github.com/LDNOOBW/List-of-Dirty-Naughty-Obscene-and-Otherwise-Bad-Words,
# CC BY 4.0 — the exact list the C4 paper cites).  C4_BADWORDS_EN below is
# a curated ~50-entry subset of that English list, reproduced from the
# published list itself: unambiguous profanity/obscenity entries in both
# match shapes the full list contains (single tokens match token-wise,
# multi-word phrases substring-match the whitespace-normalized text).
# CURATION RATIONALE: the generic terms the full list is criticized for
# over-blocking (e.g. bare "sex", clinical anatomy in medical contexts)
# are deliberately excluded from the default; a deployment that wants the
# complete 400-entry list — or a different language — passes it to
# c4_badwords_flags_df verbatim, the operator is list-agnostic.
C4_BADWORDS_EN = (
    # single-token entries (match token-wise against the tokenizer)
    "anal", "anus", "arsehole", "asshole", "bastard", "bestiality",
    "bitch", "blowjob", "bollocks", "bukkake", "bullshit", "clitoris",
    "cock", "cum", "cunnilingus", "cunt", "deepthroat", "dick", "dildo",
    "dominatrix", "ejaculation", "faggot", "fellatio", "fisting", "fuck",
    "genitals", "handjob", "hentai", "incest", "jailbait", "jizz",
    "masturbate", "milf", "motherfucker", "nigger", "orgasm", "orgy",
    "paedophile", "penis", "porn", "pornography", "pussy", "semen",
    "shit", "slut", "tits", "twat", "vagina", "wank", "whore", "xxx",
    # multi-word entries (substring-match the normalized text)
    "donkey punch", "double penetration", "golden shower", "group sex",
    "hand job", "jerk off", "strap on", "wet dream",
)

# The pre-r9 placeholder list, kept ONLY for match-shape tests against the
# profanity-free synthetic corpus (FIXTURES.md): its entries are chosen to
# actually hit synthetic documents, exercising both match shapes end to
# end where the real list (correctly) flags nothing.
C4_BADWORDS_FIXTURE = ("dup", "verboten", "slow query")


def c4_badwords_flags_df(
    docs: DataFrame, badwords=C4_BADWORDS_EN, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-page blocklist columns for an arbitrary word/phrase list.

    Pure narrow map: the list rides the plan as a LITERAL array (the
    broadcast-equivalent for a lookup this size — the published lists are
    a few hundred entries), membership is a codegen'd HOF filter, zero
    shuffles; the 100 TB cost is one scan.  Tokens and the normalized
    text reuse the engine-wide tokenizer so blocklist semantics line up
    with every other text operator."""
    words = [w for w in badwords if " " not in w]
    phrases = [w for w in badwords if " " in w]
    norm = F.regexp_replace(
        F.trim(F.lower(fold_col(F.col("text")))), r"\s+", " "
    )
    n_bad = F.size(F.filter(_toks(), lambda t: t.isin(*words))) if words else F.lit(0)
    n_phr = (
        F.size(F.filter(F.lit(list(phrases)), lambda p: norm.contains(p)))
        if phrases
        else F.lit(0)
    )
    has = (n_bad > 0) | (n_phr > 0)
    # NULL text propagates NULL flags for EVERY list shape (ADVICE r6):
    # with a phrase-only list the lambda filter silently DROPS
    # NULL-predicate elements (n_phr=0) and a words-empty n_bad is
    # lit(0), which together yielded has_badword=false/keep=true for a
    # NULL document — gate all four outputs on text IS NOT NULL instead
    # of relying on operand NULL propagation.
    gate = lambda c: F.when(F.col("text").isNotNull(), c)  # noqa: E731
    return docs.select(
        *keep_cols,
        "doc_id",
        gate(n_bad).alias("n_badword_tokens"),
        gate(n_phr).alias("n_badword_phrases"),
        gate(has).alias("has_badword"),
        gate(~has).alias("keep"),
    )


_SQL_BAD_TOKS = ", ".join(
    f"'{w}'" for w in C4_BADWORDS_EN if " " not in w
)
_SQL_BAD_PHRASES = ", ".join(f"'{w}'" for w in C4_BADWORDS_EN if " " in w)
_SQL_BAD_NORM = (
    f"regexp_replace(trim(lower({fold_sql('text')})), '\\s+', ' ', 'g')"
)
_SQL_BAD_N = f"len(list_filter({_sql_toks()}, t -> t IN ({_SQL_BAD_TOKS})))"
_SQL_BAD_P = (
    f"len(list_filter([{_SQL_BAD_PHRASES}], p -> contains({_SQL_BAD_NORM}, p)))"
)


@register(
    "text_c4_badwords_flags",
    oracle=f"""
SELECT doc_id,
       CASE WHEN text IS NULL THEN NULL ELSE {_SQL_BAD_N} END
         AS n_badword_tokens,
       CASE WHEN text IS NULL THEN NULL ELSE {_SQL_BAD_P} END
         AS n_badword_phrases,
       CASE WHEN text IS NULL THEN NULL
            ELSE ({_SQL_BAD_N} > 0 OR {_SQL_BAD_P} > 0) END AS has_badword,
       CASE WHEN text IS NULL THEN NULL
            ELSE NOT ({_SQL_BAD_N} > 0 OR {_SQL_BAD_P} > 0) END AS keep
FROM documents
""",
    doc="C4 bad-words blocklist rule (Raffel et al. §2.2) — the one rule "
    "the round-5 C4 family deliberately excluded, now shipping a curated "
    "~58-entry subset of the PUBLIC LDNOOBW English list the paper cites "
    "(C4_BADWORDS_EN, provenance above it; deployments pass the full or "
    "a per-language list to c4_badwords_flags_df). Single tokens match "
    "token-wise, phrases "
    "substring-match the normalized text. Spark shape: the list is a "
    "literal array in the plan (broadcast-equivalent at blocklist sizes), "
    "membership is a codegen'd HOF filter — zero shuffles, one scan at "
    "100 TB.",
)
def text_c4_badwords_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return c4_badwords_flags_df(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# C4 quality rules (Raffel et al. 2020, "Exploring the Limits of Transfer
# Learning...", §2.2) — the OTHER canonical published cleaning rule set next
# to Gopher, closing the pre-training quality-filter family:
#   * keep only lines ending in a terminal punctuation mark (. ! ? ");
#   * keep only lines with >= 3 words;
#   * drop lines containing the word "javascript";
#   * drop any page with < 5 sentences;
#   * drop any page containing "lorem ipsum" or a curly bracket.
# (The paper's bad-words list and three-sentence-span dedup are out of
# scope here: the former is a blocklist lookup, the latter lives with the
# dedup operators.)  Like the Gopher line rules, the flat synthetic corpus
# gets deterministic 8-token lines IN BOTH ENGINES for a value oracle;
# real newline text goes through c4_quality_flags_df.
# ---------------------------------------------------------------------------

C4_MIN_WORDS_PER_LINE = 3
C4_MIN_SENTENCES = 5
# terminal punctuation: period / exclamation / question / closing quote
_C4_TERMINAL_RE = '[.!?"]$'
_C4_JS_RE = r"\bjavascript\b"


def _c4_flags(docs: DataFrame, lines_col) -> DataFrame:
    """(doc_id, text, <lines array>) -> per-page C4 columns.  Pure narrow
    map — every rule is a per-row expression over the line array and the
    raw text, zero shuffles, whole-stage codegen end to end; the 100 TB
    cost is exactly one scan."""
    kept = F.filter(
        lines_col,
        lambda l: l.rlike(_C4_TERMINAL_RE)
        & (F.size(F.split(F.trim(l), r"\s+")) >= C4_MIN_WORDS_PER_LINE)
        & ~F.lower(l).rlike(_C4_JS_RE),
    )
    n_lines = F.size(lines_col)
    n_kept = F.size(kept)
    n_sent = F.size(F.regexp_extract_all("text", F.lit(r"[.!?]"), F.lit(0)))
    has_lorem = F.lower(F.col("text")).contains("lorem ipsum")
    has_curly = F.col("text").contains("{")
    keep = (n_sent >= C4_MIN_SENTENCES) & ~has_lorem & ~has_curly
    return docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        F.when(n_lines > 0, n_kept.cast("double") / n_lines)
        .otherwise(F.lit(0.0))
        .alias("kept_line_frac"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_curly.alias("has_curly_brace"),
        keep.alias("keep"),
    )


def c4_quality_flags_df(docs: DataFrame) -> DataFrame:
    """C4 rules over REAL newline-structured text: lines split on '\\n',
    blank/whitespace lines dropped before the per-line rules."""
    lines = F.filter(
        F.transform(F.split(F.col("text"), r"\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    return _c4_flags(docs, lines)


@register(
    "text_c4_quality_flags",
    oracle=f"""
SELECT doc_id,
       len({_sql_chunks(_sql_toks(), _LINE_TOKS)}) AS n_lines,
       len(list_filter({_sql_chunks(_sql_toks(), _LINE_TOKS)},
           l -> regexp_matches(l, '{_C4_TERMINAL_RE}')
                AND len(regexp_split_to_array(trim(l), '\\s+')) >= {C4_MIN_WORDS_PER_LINE}
                AND NOT regexp_matches(lower(l), '\\bjavascript\\b')))
           AS n_kept_lines,
       CASE WHEN len({_sql_chunks(_sql_toks(), _LINE_TOKS)}) > 0 THEN
            CAST(len(list_filter({_sql_chunks(_sql_toks(), _LINE_TOKS)},
                l -> regexp_matches(l, '{_C4_TERMINAL_RE}')
                     AND len(regexp_split_to_array(trim(l), '\\s+')) >= {C4_MIN_WORDS_PER_LINE}
                     AND NOT regexp_matches(lower(l), '\\bjavascript\\b'))) AS DOUBLE)
            / len({_sql_chunks(_sql_toks(), _LINE_TOKS)})
            ELSE 0.0 END AS kept_line_frac,
       length(regexp_extract_all(text, '[.!?]')) AS n_sentences,
       contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
       contains(text, '{{') AS has_curly_brace,
       (length(regexp_extract_all(text, '[.!?]')) >= {C4_MIN_SENTENCES}
        AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{{')) AS keep
FROM documents
""",
    doc="C4 cleaning rules (Raffel et al. §2.2): terminal-punctuation + "
    ">=3-word + no-'javascript' line filters, >=5-sentence / no-'lorem "
    "ipsum' / no-curly-brace page filters. Flat corpus -> deterministic "
    "8-token lines in both engines (same convention as "
    "text_gopher_line_flags); real newline text via c4_quality_flags_df. "
    "Registered entry is one Arrow mapInPandas — still zero shuffle, but "
    "flat-cost where the interpreted filter/transform HOF chain paid "
    "per-line lambda dispatch (3.4 s -> ~0.4 s at sf0.1).",
)
def text_c4_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    line_toks, min_words, min_sent = _LINE_TOKS, C4_MIN_WORDS_PER_LINE, C4_MIN_SENTENCES
    schema = (
        "doc_id bigint, n_lines int, n_kept_lines int, kept_line_frac double, "
        "n_sentences int, has_lorem_ipsum boolean, has_curly_brace boolean, "
        "keep boolean"
    )

    def compute(batches):
        import re

        import pandas as pd

        ws = re.compile(r"\s+", re.ASCII)
        term = re.compile(_C4_TERMINAL_RE)
        js = re.compile(_C4_JS_RE, re.ASCII)
        sent = re.compile(r"[.!?]")
        for pdf in batches:
            recs = []
            for doc_id, text in zip(pdf["doc_id"].to_numpy(), pdf["text"]):
                if text is None:
                    # NULL text: empty chunk array (n_lines 0, frac 0.0)
                    # but NULL-propagating page columns — exactly the
                    # oracle's regexp/contains-over-NULL behavior
                    recs.append((int(doc_id), 0, 0, 0.0, None, None, None, None))
                    continue
                raw = text
                folded = fold_py(raw)
                certify_py(folded)  # md5-comparing kernel: shingle contract
                toks = ws.split(folded.strip(" ").lower())
                lines = [
                    " ".join(toks[i : i + line_toks])
                    for i in range(0, len(toks), line_toks)
                ]
                kept = [
                    l
                    for l in lines
                    if term.search(l)
                    and len(ws.split(l.strip(" "))) >= min_words
                    and not js.search(l)  # lines already lowercase
                ]
                n_lines, n_kept = len(lines), len(kept)
                n_sent = len(sent.findall(raw))
                has_lorem = "lorem ipsum" in raw.lower()
                has_curly = "{" in raw
                keep = n_sent >= min_sent and not has_lorem and not has_curly
                recs.append(
                    (
                        int(doc_id),
                        n_lines,
                        n_kept,
                        (n_kept / n_lines) if n_lines else 0.0,
                        n_sent,
                        has_lorem,
                        has_curly,
                        keep,
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id",
                    "n_lines",
                    "n_kept_lines",
                    "kept_line_frac",
                    "n_sentences",
                    "has_lorem_ipsum",
                    "has_curly_brace",
                    "keep",
                ],
            )

    return _docs(spark, sf_dir).select("doc_id", "text").mapInPandas(compute, schema)


# --- CCNet-style LM rarity / perplexity filter ------------------------------
# Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets from
# Web Crawl Data" (2019, public): score each document under a language
# model trained on reference text and filter (or tercile-split) by
# perplexity.  Re-expressed Spark-first and self-contained: the LM is an
# add-one-smoothed unigram model fit on the corpus itself —
#   fit    = the canonical word count (ONE map-side-combined shuffle on
#            token) + a top-V vocab cut (TakeOrdered, no full sort; ties
#            at the cut break on token ASC so the vocab is deterministic
#            in both engines), then the V (token -> count) entries fold
#            into a ONE-ROW map DataFrame;
#   score  = that one-row map crossJoin-broadcast onto documents (a
#            broadcast nested-loop of exactly one row), per-doc stats via
#            higher-order functions over the token array — ZERO shuffle,
#            no UDF, whole-stage-codegen.
# At 100 TB: the fit is a word count (the textbook scalable aggregation),
# the vocab is V entries regardless of corpus size, and scoring is a
# narrow map — the same shape at any scale.  Reference text other than
# the corpus itself (CCNet uses Wikipedia) is a drop-in: fit on one
# DataFrame, score another.
#
# Exactness split (cross-engine cookbook, DEVNOTES): token counts, OOV
# counts and their single-division ratios are EXACT in both engines and
# form the registered value-oracled query; the ln-based perplexity itself
# is excluded from the oracle (JVM StrictMath vs libm differ by 1 ulp)
# and is pinned by pytest against a pure-Python reference instead
# (tests/test_lm_filter.py).

LM_VOCAB_SIZE = 65_536  # production default: top-V unigram vocab
# The registered query uses a small V so the OOV path is actually
# exercised at driver scale: every sf of the synthetic corpus has exactly
# 31 distinct tokens, so a production-sized V would make n_oov
# identically zero and the oracle would never see the left-join-miss arm.
LM_VOCAB_SIZE_REGISTERED = 16


def _lm_ftoks(col: str = "text"):
    """Non-empty whitespace tokens of the lowercased text; NULL text scores
    as the empty document (coalesce in BOTH twins — see _SQL_LM_FTOKS).

    The \\x0B-to-space fold lives in _toks_of itself since r10 (it was
    pioneered here in r9 and then unified into the canonical tokenizer),
    so this wrapper only adds the NULL coalesce and empty-token filter."""
    return F.filter(
        _toks_of(F.coalesce(F.col(col), F.lit(""))),
        lambda t: t != F.lit(""),
    )


def _toks_of(col):
    """Column-input twin of _toks() — ONE canonical tokenizer expression.

    The textnorm unicode fold runs BEFORE lower/trim/split in BOTH
    engines (here and _sql_toks): \\x0B and every unicode whitespace
    char fold to a space, invisible formatting chars are deleted, and
    the İ/Σ lower() divergence is fixed up pre-lower
    (test_vertical_tab_actually_diverges_in_duckdb pins the raw \\x0B
    divergence; tests/test_unicode_fold_contract.py certifies the
    unicode domain per codepoint).  History: \\x0B fold pioneered by
    the r9 LM/BM25 twins, unified across the registry in r10, widened
    to the unicode contract in r11; the certify-and-raise contract
    (narrowed to genuinely uncertifiable cased scripts) lives in the
    md5-portable shingle kernels only, see dedup._py_shingles."""
    return F.split(F.trim(F.lower(fold_col(col))), r"\s+")


_SQL_COALESCED_TEXT = "coalesce(text, '')"
_SQL_LM_FTOKS = f"list_filter({_sql_toks(_SQL_COALESCED_TEXT)}, t -> t <> '')"


def lm_unigram_vocab(docs: DataFrame, v: int | None) -> DataFrame:
    """(t, c): corpus token counts for the top-``v`` vocabulary.
    One map-side-combined groupBy(token) + TakeOrdered(v) by
    (count DESC, token ASC) — deterministic at the cut.  ``v=None``
    returns the full (unordered) count table — the ONE canonical
    bounded-vocabulary job (bpe.bpe_word_counts delegates here since
    r12 review #3 so the two counts can never drift)."""
    wc = (
        docs.select(F.explode(_lm_ftoks()).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if v is None:
        return wc
    return wc.orderBy(F.col("c").desc(), F.col("t").asc()).limit(v)


# Above this vocabulary size the one-row-map scoring path switches to an
# explode + broadcast HASH join: Spark's map lookup (GetMapValue /
# try_element_at) is a LINEAR SCAN of the map's key array — O(V) string
# compares PER TOKEN — so at the production V=65536 the "zero-shuffle"
# map path costs ~V/2 compares/token and loses by orders of magnitude to
# a hash-probed broadcast join + one map-side-combined re-aggregation
# (measured while building the 100x scale rehearsal: the map path's wall
# tracks the MATERIALIZED vocab size, not the corpus).
LM_SCORE_JOIN_V_CEILING = 256


def lm_rarity_df(
    spark: SparkSession,
    docs: DataFrame,
    v: int = LM_VOCAB_SIZE,
    perplexity: bool = False,
    mode: str | None = None,
) -> DataFrame:
    """Per-document unigram-LM stats: (doc_id, n_tokens, n_oov,
    sum_vocab_cnt, oov_frac, mean_vocab_cnt[, ppl]).

    Exact columns: n_tokens (non-empty tokens), n_oov (tokens outside the
    top-``v`` vocab), sum_vocab_cnt (sum of corpus counts of the in-vocab
    tokens), oov_frac = n_oov/n_tokens and mean_vocab_cnt =
    sum_vocab_cnt/(n_tokens - n_oov) (each ONE IEEE division of two exact
    integers; NULL on empty/all-OOV docs via try_divide).

    perplexity=True adds ``ppl``: exp of the mean negative ln-probability
    under the add-one-smoothed unigram LM, p(t) = (c(t) + 1) / (N + V + 1)
    with c(t) = 0 outside the vocab, N = total corpus tokens, V = vocab
    size actually materialized.  NULL on empty docs.  ln/exp are engine-
    specific to 1 ulp, so this column stays out of the value oracle
    (pytest-pinned in tests/test_lm_filter.py).

    mode: None -> auto ('map' for v <= LM_SCORE_JOIN_V_CEILING, 'join'
    above).  'map' scores through a one-row broadcast (token -> count)
    map — ZERO shuffle, but each lookup linearly scans the map's key
    array, so it only wins while V is small.  'join' explodes tokens
    into a broadcast HASH join against the vocab and re-aggregates per
    doc — one map-side-combined keyed shuffle, O(1) per token at any V
    (the 100 TB shape for production vocabularies).  Identical results
    (integer columns exactly; ppl to float summation order) — pinned by
    tests/test_lm_filter.py::test_map_and_join_modes_agree.
    """
    if mode is None:
        mode = "map" if v <= LM_SCORE_JOIN_V_CEILING else "join"
    if mode not in ("map", "join"):
        raise ValueError(f"unknown lm_rarity mode: {mode}")
    # PRECONDITION (both modes, and the oracle): doc_id is a KEY of
    # ``docs``.  On duplicate doc_ids the modes legitimately diverge
    # (map scores each row; join's groupBy(doc_id) merges them) — the
    # documents tables are keyed everywhere in this engine, so this is
    # the same contract every other per-doc query already assumes.
    vocab = lm_unigram_vocab(docs, v)
    if mode == "join":
        base = docs.select("doc_id", _lm_ftoks().alias("toks"))
        # explode_OUTER keeps zero-token docs as a single NULL-token row,
        # so the per-doc aggregation below sees EVERY doc and no restore
        # join is needed: the whole path is one broadcast hash join +
        # one map-side-combined keyed shuffle
        ex = base.select("doc_id", F.explode_outer("toks").alias("t"))
        if perplexity:
            # vocab appears on the join side AND in v_size: checkpoint the
            # tiny (<= V rows) fit result so the word-count shuffle +
            # TakeOrdered subtree executes once, not twice
            vocab = vocab.localCheckpoint(eager=True)
        j = ex.join(F.broadcast(vocab), "t", "left")
        if perplexity:
            scal = F.broadcast(
                vocab.agg(F.count(F.lit(1)).alias("v_size")).crossJoin(
                    ex.agg(F.count("t").alias("n_total"))
                )
            )
            j = j.crossJoin(scal)
        real = F.col("t").isNotNull()  # the NULL-token row of an empty doc
        aggs = [
            F.count("t").alias("n_tokens"),  # count(col) skips NULLs
            F.sum((real & F.col("c").isNull()).cast("long")).alias("n_oov"),
            F.sum(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias(
                "sum_vocab_cnt"
            ),
        ]
        if perplexity:
            aggs.append(
                F.sum(
                    F.when(
                        real,
                        -F.log(
                            (
                                F.coalesce(F.col("c"), F.lit(0).cast("long"))
                                + F.lit(1)
                            ).cast("double")
                            / (F.col("n_total") + F.col("v_size") + F.lit(1)).cast(
                                "double"
                            )
                        ),
                    )
                ).alias("nll_sum")  # empty docs: sum of no rows -> NULL -> ppl NULL
            )
        scored = j.groupBy("doc_id").agg(*aggs)
        return _lm_rarity_tail(scored, perplexity)
    # --- mode == 'map' -------------------------------------------------
    # V entries -> ONE row holding the (token -> count) map + actual V;
    # crossJoin(broadcast(...)) of a single row is a broadcast nested
    # loop, i.e. a free per-partition closure — scoring stays narrow
    vmap = vocab.agg(
        F.map_from_entries(F.collect_list(F.struct("t", "c"))).alias("m"),
        F.count(F.lit(1)).alias("v_size"),
    )
    scored = docs.crossJoin(F.broadcast(vmap))
    if perplexity:
        # total corpus tokens N (OOV mass counts toward N, so this is a
        # separate scalar aggregate over the full token explode — Catalyst
        # cannot prove agg-without-grouping is one row, so the crossJoin
        # would survive even unused: only build it when ppl needs N)
        totals = (
            docs.select(F.explode(_lm_ftoks()).alias("t"))
            .agg(F.count(F.lit(1)).alias("n_total"))
        )
        scored = scored.crossJoin(F.broadcast(totals))
    ftoks = _lm_ftoks()
    # try_element_at, not element_at: under ANSI (Spark 4 default) a map
    # miss THROWS MAP_KEY_DOES_NOT_EXIST; try_ yields NULL = OOV
    hit = lambda t: F.try_element_at(F.col("m"), t)  # noqa: E731
    scored = (
        scored
        .select(
            "doc_id",
            F.size(ftoks).alias("n_tokens"),
            F.size(F.filter(ftoks, lambda t: hit(t).isNull())).alias("n_oov"),
            F.aggregate(
                ftoks,
                F.lit(0).cast("long"),
                lambda acc, t: acc + F.coalesce(hit(t), F.lit(0).cast("long")),
            ).alias("sum_vocab_cnt"),
            *(
                [
                    F.aggregate(
                        ftoks,
                        F.lit(0.0),
                        lambda acc, t: acc
                        - F.log(
                            (F.coalesce(hit(t), F.lit(0).cast("long")) + F.lit(1)).cast(
                                "double"
                            )
                            / (F.col("n_total") + F.col("v_size") + F.lit(1)).cast(
                                "double"
                            )
                        ),
                    ).alias("nll_sum")
                ]
                if perplexity
                else []
            ),
        )
    )
    return _lm_rarity_tail(scored, perplexity)


def _lm_rarity_tail(scored: DataFrame, perplexity: bool) -> DataFrame:
    """Shared ratio/ppl projection over (doc_id, n_tokens, n_oov,
    sum_vocab_cnt[, nll_sum]) — both scoring modes end here."""
    out = scored.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_oov").cast("long").alias("n_oov"),
        "sum_vocab_cnt",
        F.try_divide(F.col("n_oov").cast("double"), F.col("n_tokens")).alias("oov_frac"),
        F.try_divide(
            F.col("sum_vocab_cnt").cast("double"),
            (F.col("n_tokens") - F.col("n_oov")),
        ).alias("mean_vocab_cnt"),
        *(
            [F.exp(F.try_divide(F.col("nll_sum"), F.col("n_tokens"))).alias("ppl")]
            if perplexity
            else []
        ),
    )
    return out


@register(
    "text_lm_rarity_stats",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_LM_FTOKS}) AS t FROM documents),
lm AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
vocab AS (SELECT t, c FROM lm ORDER BY c DESC, t ASC LIMIT {LM_VOCAB_SIZE_REGISTERED}),
per_doc AS (
  SELECT tok.doc_id AS doc_id,
         count(*) AS n_tokens,
         CAST(sum(CASE WHEN v.c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         CAST(sum(coalesce(v.c, 0)) AS BIGINT) AS sum_vocab_cnt
  FROM tok LEFT JOIN vocab v ON tok.t = v.t
  GROUP BY tok.doc_id)
SELECT d.doc_id AS doc_id,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
       CAST(coalesce(p.sum_vocab_cnt, 0) AS BIGINT) AS sum_vocab_cnt,
       CAST(coalesce(p.n_oov, 0) AS DOUBLE) / nullif(coalesce(p.n_tokens, 0), 0)
           AS oov_frac,
       CAST(coalesce(p.sum_vocab_cnt, 0) AS DOUBLE)
           / nullif(coalesce(p.n_tokens, 0) - coalesce(p.n_oov, 0), 0)
           AS mean_vocab_cnt
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
""",
    doc="CCNet-style LM filter, exact half: per-doc token/OOV counts and "
    "rarity ratios under a corpus-fit top-V unigram LM (V=16 registered so "
    "the OOV arm is exercised at driver scale; production default 65536). "
    "Fit = one word-count shuffle + TakeOrdered(V); score = one-row vocab "
    "map broadcast, zero shuffle, no UDF.  The ln-based perplexity column "
    "(lm_rarity_df(perplexity=True)) is pytest-pinned, not value-oracled.",
)
def text_lm_rarity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lm_rarity_df(
        spark, _docs(spark, sf_dir), v=LM_VOCAB_SIZE_REGISTERED, perplexity=False
    )


# --- count-min sketch heavy hitters (sketch family) -------------------------

# Sketch geometry: CM_ROWS independent md5-derived hash rows over CM_COLS
# columns.  The whole sketch is CM_ROWS*CM_COLS = 1024 integer cells —
# FIXED SIZE regardless of corpus size, which is the entire point: at
# 100 TB the per-task partial sketches are what Catalyst's map-side
# combine over the 1024 (j, c) keys already computes, so the shuffle is
# <= 1024 rows per task no matter how many tokens flow through it.
CM_ROWS = 4
CM_COLS = 256
CM_TOPK = 10

_SQL_CM_HASH = (
    "CAST('0x' || substr(md5('cm' || CAST(j AS VARCHAR) || ':' || {t}), 1, 8)"
    f" AS BIGINT) % {CM_COLS}"
)


def _cm_hash(j, t):
    """Column twin of _SQL_CM_HASH: row-j count-min column for token t
    (the shared hashkit.md5_u32 kernel since r12)."""
    from thesis_iceberg_spark.queries.hashkit import md5_u32

    return md5_u32(F.concat(F.lit("cm"), j.cast("string"), F.lit(":"), t)) % CM_COLS


@register(
    "text_countmin_topk",
    oracle=f"""
WITH toks AS (SELECT unnest({_SQL_LM_FTOKS}) AS t FROM documents),
counts AS (SELECT t, COUNT(*) AS exact_n FROM toks GROUP BY t),
top AS (SELECT t, exact_n FROM counts ORDER BY exact_n DESC, t LIMIT {CM_TOPK}),
rows_j AS (SELECT unnest([{", ".join(str(j) for j in range(CM_ROWS))}]) AS j),
cells AS (
  SELECT j, {_SQL_CM_HASH.format(t="t")} AS c, COUNT(*) AS cell_n
  FROM toks, rows_j GROUP BY j, c),
probes AS (
  SELECT top.t, top.exact_n, j, {_SQL_CM_HASH.format(t="top.t")} AS c
  FROM top, rows_j)
SELECT p.t AS token, CAST(p.exact_n AS BIGINT) AS exact_n,
       CAST(MIN(c2.cell_n) AS BIGINT) AS est_n
FROM probes p JOIN cells c2 ON c2.j = p.j AND c2.c = p.c
GROUP BY p.t, p.exact_n
""",
    doc=f"Count-min sketch frequency estimation: a {CM_ROWS}x{CM_COLS} "
    "sketch built in ONE aggregation whose map-side combine over the 1024 "
    "(row, col) keys IS the classic per-partition-partial-sketch merge — "
    "each task ships <= 1024 cells regardless of corpus size, vs the "
    "per-token state an exact count needs. The query returns the true "
    f"top-{CM_TOPK} tokens with exact and sketch-estimated counts side by "
    "side (est_n >= exact_n always; the gap is the hash-collision mass), "
    "so the oracle value-checks the SKETCH CELLS themselves, not just "
    "row counts. The exact side is the verification harness — at 100 TB "
    "the sketch is the product and heavy-hitter candidates come from a "
    "per-partition top-k pre-pass, not a corpus-wide token groupBy.",
)
def text_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return countmin_topk_df(_docs(spark, sf_dir))


def countmin_sketch_df(docs: DataFrame) -> DataFrame:
    """The CM_ROWS x CM_COLS sketch as (j, c, cell_n) rows — <= 1024 of
    them at ANY corpus size.  Catalyst's map-side combine over the 1024
    keys is exactly the per-partition-partial-sketch merge a hand-rolled
    implementation would do."""
    toks = docs.select(F.explode(_lm_ftoks()).alias("t"))
    js = F.array([F.lit(j) for j in range(CM_ROWS)])
    return (
        toks.select("t", F.explode(js).alias("j"))
        .select("j", _cm_hash(F.col("j"), F.col("t")).alias("c"))
        .groupBy("j", "c")
        .agg(F.count("*").alias("cell_n"))
    )


def countmin_topk_df(docs: DataFrame) -> DataFrame:
    """True top-CM_TOPK tokens with exact and sketch-estimated counts
    side by side (the exact arm is the verification harness; the sketch
    is the product at scale).

    r15 (optimization round, guide §2.3 "aggregate before you shuffle" /
    §1.2 "don't compute things twice"): this VERIFICATION query needs the
    exact per-token counts anyway, so the sketch cells are derived from
    that aggregate — cell_n == SUM(exact token counts hashing to the
    cell), identical by construction — instead of re-tokenizing the
    corpus and exploding every token OCCURRENCE x CM_ROWS through
    countmin_sketch_df.  One corpus tokenize pass instead of two, and
    the CM_ROWS explode runs over DISTINCT tokens post-aggregation
    instead of the raw token stream.  The counts frame feeds both arms
    via an eager localCheckpoint (distinct-token-sized — the same
    staging-table call as bm25's per-doc frame).  countmin_sketch_df
    itself is unchanged: standalone sketch builds (no exact arm) keep
    the one-pass map-side-combine shape, which at 100 TB never pays the
    distinct-token shuffle this query's exact arm requires regardless.
    Measured (tests/exp_r15_countmin_ab.py, interleaved same-JVM A/B at
    sf0.1, quiet canary 0.148): 0.71x the two-pass form (0.63 vs 0.88 s
    median of 7), rows verified identical in the same run."""
    toks = docs.select(F.explode(_lm_ftoks()).alias("t"))
    js = F.array([F.lit(j) for j in range(CM_ROWS)])
    tok_counts = (
        toks.groupBy("t")
        .agg(F.count("*").alias("exact_n"))
        .localCheckpoint(eager=True)
    )
    cells = (
        tok_counts.select("t", "exact_n", F.explode(js).alias("j"))
        .select("j", _cm_hash(F.col("j"), F.col("t")).alias("c"), "exact_n")
        .groupBy("j", "c")
        .agg(F.sum("exact_n").alias("cell_n"))
    )
    top = tok_counts.orderBy(F.col("exact_n").desc(), F.col("t")).limit(CM_TOPK)
    probes = top.select(
        "t", "exact_n", F.explode(js).alias("j")
    ).withColumn("c", _cm_hash(F.col("j"), F.col("t")))
    return (
        cells.join(F.broadcast(probes), ["j", "c"])
        .groupBy("t", "exact_n")
        .agg(F.min("cell_n").alias("est_n"))
        .select(
            F.col("t").alias("token"),
            F.col("exact_n").cast("bigint").alias("exact_n"),
            F.col("est_n").cast("bigint").alias("est_n"),
        )
    )


# --- garbage / mojibake detection (r11) -------------------------------------
#
# Real web corpora carry decode damage the other gates never look at:
# U+FFFD replacement characters (the universal mojibake marker a lossy
# decode leaves behind) and C0 control characters that are neither
# whitespace nor in the textnorm fold's contract.  Detection reads the
# RAW text deliberately — the fold DELETES/normalizes exactly the bytes a
# garbage detector exists to count, so it must run upstream of it.  The
# control class [\x00-\x08\x0E-\x1B\x7F] excludes every character some
# other operator treats as whitespace (\t \n \x0B \x0C \r via \s, and
# the \x1C-\x1F information separators the fold turns into spaces).
# Explicit \xNN classes parse identically in Java regex and RE2.

GARBAGE_MAX_CONTROL_RATIO = 0.005  # >0.5% control chars => not prose
_CTRL_RE = r"[\x00-\x08\x0E-\x1B\x7F]"


def garbage_flags_df(
    docs: DataFrame, text_col: str = "text", keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, n_replacement, n_control, garbage_ratio, keep) over any
    documents frame — a pure narrow map (whole-stage codegen, zero
    shuffle; at 100 TB this fuses into the ingest scan next to the other
    quality gates).  keep = no replacement chars at all AND the control
    ratio under GARBAGE_MAX_CONTROL_RATIO; NULL text propagates NULL
    flags (the gate convention c4_badwords_flags_df established).
    ``keep_cols`` threads extra columns through, so the flags can ride
    the pretrain composition's fused pass-A projection (r12)."""
    t = F.col(text_col)
    n_repl = F.regexp_count(t, F.lit("�"))
    n_ctl = F.regexp_count(t, F.lit(_CTRL_RE))
    ratio = F.try_divide((n_repl + n_ctl).cast("double"), F.length(t))
    keep = (n_repl == 0) & (F.coalesce(ratio, F.lit(0.0)) <= GARBAGE_MAX_CONTROL_RATIO)
    gate = lambda c: F.when(t.isNotNull(), c)  # noqa: E731
    return docs.select(
        "doc_id",
        *keep_cols,
        gate(n_repl.cast("int")).alias("n_replacement"),
        gate(n_ctl.cast("int")).alias("n_control"),
        gate(ratio).alias("garbage_ratio"),
        gate(keep).alias("keep"),
    )


def sql_garbage_flags(text_expr: str = "text") -> str:
    """DuckDB twin of garbage_flags_df over an arbitrary text expression —
    ONE fragment shared by the registered query (which feeds it the
    synthetic damage-tail expression, the clean corpus needing every gate
    arm exercised) and the pretrain composition (which feeds it the
    scrubbed text unchanged: a real pipeline filters the damage it FINDS,
    it does not inject any).  Sharing the SQL text keeps the two
    consumers drift-impossible, same as the shadow-CTE trick."""
    nr = f"length(regexp_extract_all({text_expr}, chr(65533)))"
    nc = f"length(regexp_extract_all({text_expr}, '{_CTRL_RE}'))"
    ratio = f"CAST({nr} + {nc} AS DOUBLE) / length({text_expr})"
    return f"""SELECT doc_id,
       CAST({nr} AS INT) AS n_replacement,
       CAST({nc} AS INT) AS n_control,
       {ratio} AS garbage_ratio,
       ({nr} = 0 AND COALESCE({ratio}, 0.0) <= {GARBAGE_MAX_CONTROL_RATIO}) AS keep"""


@register(
    "text_garbage_flags",
    oracle=f"""
WITH damaged AS (
  SELECT doc_id,
         text || repeat(chr(65533), CAST(doc_id % 3 AS INT))
              || repeat(chr(7), CAST(doc_id % 5 AS INT)) AS t
  FROM documents)
{sql_garbage_flags("t")}
FROM damaged
""",
    doc="Garbage/mojibake detection: U+FFFD replacement-char and C0 "
    "control-char counts with a keep gate — the decode-damage filter the "
    "other quality gates never look at, run on RAW text upstream of the "
    "unicode fold (which would normalize away exactly what this counts). "
    "The synthetic corpus is clean, so the registered entry appends a "
    "deterministic doc_id-derived damage tail in BOTH engines (the "
    "pipeline_pii_scrub convention) so every arm of the gate — clean, "
    "replacement-hit, control-ratio-hit — is value-checked exactly; real "
    "corpora go through garbage_flags_df. Pure narrow map, zero shuffle.",
)
def text_garbage_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    damaged = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.repeat(F.lit("�"), (F.col("doc_id") % 3).cast("int")),
            F.repeat(F.lit("\x07"), (F.col("doc_id") % 5).cast("int")),
        ).alias("t"),
    )
    return garbage_flags_df(damaged, text_col="t")
