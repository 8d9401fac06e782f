"""BPE tokenizer induction over the documents corpus.

Training a byte-pair-encoding vocabulary is a core training-data-
pipeline step (Sennrich et al. 2016; GPT-2's byte-level variant).  The
scalable decomposition — and the reason this belongs in a Spark engine —
is that BPE never needs the corpus per merge round: it needs the
WORD-FREQUENCY TABLE.  So:

  * the ONE corpus-scale job is a word count (lm_unigram_vocab — the
    same bounded-output shape the LM-rarity filter fits with, shared so
    the two counts can never drift), optionally truncated to the top
    ``max_words`` types by (count DESC, word ASC) — the standard trainer
    cutoff, loud in the signature, and the reason the driver-side table
    is bounded at ANY corpus size (word types grow ~Heaps' law, but the
    cutoff caps what training sees; counts stay exact for every kept
    type);
  * the merge loop (pick the most frequent adjacent symbol pair, fuse
    it everywhere, repeat) runs over that bounded table in plain
    Python — deterministic by (count DESC, pair lexicographic ASC)
    tie-break, so two engines/runs produce identical merge lists;
  * encoding documents with the learned merges is embarrassingly
    parallel: an Arrow mapInPandas kernel with per-token bounded state
    and a per-task word->subwords memo (Zipf: a few hundred types cover
    most tokens), pinned against the reference encoder.

Word-boundary convention: GPT-2/SentencePiece-style LEADING marker — a
SPACE symbol prepended to every word ("low" -> [' ', 'l', 'o', 'w']).
The space is genuinely outside the symbol alphabet BY CONSTRUCTION
(tokens are whitespace-split, so no character of any word is ' '),
which makes boundary-touching merges unforgeable from literal text.
The classic trailing '</w>' sentinel does NOT have that property: an
HTML-heavy corpus containing literal "</w>" substrings could learn
'<'+'/', '</'+'w', '</w'+'>' and alias the sentinel, letting word-final
merges fire word-internally (r12 review #3).

Registered r13 (`text_bpe_encode`, VERDICT r12 #1): the merge list is a
FROZEN LITERAL — trained once on the sf0.001 reference corpus and
applied to whatever corpus the driver hands the query, which is exactly
how production tokenizers deploy (train once on a sample, encode
everything) — so the encode output is fully SQL-expressible and gets a
value oracle.  The DuckDB twin encodes each word by iterated string
replace over a separator-delimited symbol string (see _enc_sql); the
rest of the surface stays pinned by tests/test_bpe.py including a
pure-Python reference implementation of the textbook algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.queries.text import _SQL_LM_FTOKS, lm_unigram_vocab

# leading word-boundary marker (see module doc): unforgeable because
# whitespace-split tokens can never contain a space
BOW = " "


def bpe_word_counts(docs: DataFrame, max_words: int | None = None) -> DataFrame:
    """(word, c): exact corpus word counts via the certified tokenizer —
    the one corpus-scale job of BPE training, delegated to
    lm_unigram_vocab (one canonical implementation).  ``max_words``
    truncates to the most frequent types (count DESC, word ASC at the
    cut), the standard trainer cutoff that bounds the driver-side
    table."""
    return lm_unigram_vocab(docs, max_words).select(
        F.col("t").alias("word"), "c"
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, c in vocab.items():
        for a, b in zip(syms, syms[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + c
    return counts


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    fused = a + b
    out: dict[tuple[str, ...], int] = {}
    for syms, c in vocab.items():
        merged = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(fused)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + c
    return out


def bpe_train(
    word_counts: list[tuple[str, int]], n_merges: int, min_freq: int = 2
) -> list[tuple[str, str]]:
    """Textbook BPE merge learning over a (word, count) table: each
    round fuses the most frequent adjacent symbol pair (ties broken
    count DESC then pair lexicographic ASC — fully deterministic) and
    stops early when the best pair's frequency falls under ``min_freq``.
    The table is bounded (bpe_word_counts' cutoff), so this driver-side
    loop is O(n_merges * vocab) regardless of corpus size."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        syms = tuple([BOW] + list(w))
        vocab[syms] = vocab.get(syms, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        merges.append(best[0])
        vocab = _merge_vocab(vocab, best[0])
    return merges


def bpe_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges to one word, in learned order (the reference
    encoder the Arrow kernel is pinned against)."""
    syms = [BOW] + list(word)
    for a, b in merges:
        i = 0
        out: list[str] = []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_df(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, *keep_cols, n_words, n_subwords, subwords): encode every
    document with the learned merges — an Arrow mapInPandas kernel
    (per-token bounded state, zero shuffle; the merges list rides the
    closure, which is the broadcast-small-model pattern every tokenizer
    deployment uses).  A per-task word->subwords memo turns the
    per-OCCURRENCE merge loop into a per-TYPE one (Zipf: a few hundred
    types cover most tokens — r12 review #3).  Tokenization mirrors
    _lm_ftoks via fold_py + certify_py so the Python twin tokenizes
    exactly like the JVM word-count side.  ``keep_cols`` pass through
    untouched with their input types (the quality_frame idiom) so a
    composition can encode a staged projection without a doc_id
    re-join re-executing the upstream lineage (r14)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from thesis_iceberg_spark.queries.textnorm import certify_py, fold_py

    merges_local = list(merges)
    keep = tuple(keep_cols)
    in_fields = {f.name: f for f in docs.schema.fields}
    out_schema = StructType(
        [in_fields["doc_id"]]
        + [in_fields[c] for c in keep]
        + [
            StructField("n_words", IntegerType()),
            StructField("n_subwords", IntegerType()),
            StructField("subwords", ArrayType(StringType())),
        ]
    )

    def encode(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            hit = memo.get(w)
            if hit is None:
                hit = memo[w] = bpe_encode_word(w, merges_local)
            return hit

        for pdf in batches:
            rows = []
            for doc_id, *keeps, text in zip(
                pdf["doc_id"], *(pdf[c] for c in keep), pdf["text"]
            ):
                t = fold_py(text if isinstance(text, str) else "")
                certify_py(t)
                words = [w for w in t.strip(" ").lower().split() if w]
                subs: list[str] = []
                for w in words:
                    subs.extend(enc(w))
                rows.append((doc_id, *keeps, len(words), len(subs), subs))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", *keep, "n_words", "n_subwords", "subwords"],
            )

    return docs.select("doc_id", *keep, "text").mapInPandas(
        encode, out_schema
    )


# --- the registered query: encode with a FROZEN literal merge list (r13) ----

# Trained by bpe_train(n_merges=16) on the sf0.001 reference corpus's
# word counts and frozen here — the production deployment shape (a
# tokenizer is trained once on a sample, then applied to any corpus),
# and the move that makes the encode output SQL-expressible (VERDICT
# r12: "SQL-comparable once the merge list is a literal").
# tests/test_bpe.py re-derives this list from the corpus so it cannot
# drift silently.
BPE_MERGES: tuple[tuple[str, str], ...] = (
    (" ", "s"), ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("l", "u"),
    (" ", "a"), (" ", "v"), ("a", "r"), ("p", "ar"), (" ", "c"), ("a", "s"),
    (" ", "f"), ("m", "er"), (" ", "t"), ("a", "t"),
)

# The SQL twin applies each merge as a string replace over a
# separator-delimited symbol string.  A left-to-right non-overlapping
# replace of '<sep>a<sep>b<sep>' SKIPS an occurrence whose leading
# separator was consumed by the previous match, so each merge runs TWO
# replace passes: pass 1 fuses every other occurrence of an adjacent
# run, which isolates the leftovers between fused symbols, and pass 2
# fuses those.  That equals the symbol-space greedy fuse EXCEPT for
# self-pair merges (a, a) over odd runs >= 5 of the same symbol (greedy
# pairs strictly left-to-right; the two-pass replace fuses 1st/3rd
# before 2nd, yielding a different subword ORDER) — so self-pairs are
# excluded from the frozen list by the assert below, and the pytest
# property check compares the SQL twin against bpe_encode_word on
# adversarial repeat words.
# These two invariants are the SQL twin's correctness PRECONDITION, so
# they raise ValueError, not assert: asserts are stripped under
# `python -O`, and a future retrained BPE_MERGES containing a self-pair
# would then silently ship a WRONG oracle instead of failing at import
# (ADVICE r13 — the pytest pin covers CI; this is the last line of
# defense in production runs).
if any(a == b for a, b in BPE_MERGES):
    raise ValueError(
        "self-pair merges are excluded: the SQL twin's two-pass replace "
        "diverges from greedy BPE on odd same-symbol runs (see comment)"
    )
# a retrained list on an apostrophe-bearing corpus can legitimately learn
# a symbol containing a quote; _enc_sql escapes them, but \x1f inside a
# symbol would alias the separator and MUST stay impossible (it is, by
# the fold contract — raise so a tokenizer change cannot silently
# break it; review r13)
if any("\x1f" in a + b for a, b in BPE_MERGES):
    raise ValueError(
        "\\x1f inside a merge symbol would alias the SQL twin's symbol "
        "separator — the fold contract forbids it; retrain or re-fold"
    )

# symbol separator for the SQL twin: \x1f can never appear inside a
# symbol — the textnorm fold maps \x1c-\x1f to a space BEFORE
# tokenization, so no token (and no fused symbol) contains it; the BOW
# marker ' ' is likewise token-impossible (whitespace-split)
BPE_SEP = "\x1f"


def _enc_sql(var: str) -> str:
    """DuckDB expression encoding one word (lambda var ``var``) into its
    BPE_SEP-joined subwords under the frozen BPE_MERGES.  Merge symbols
    are embedded as SQL string literals, so single quotes are doubled
    (review r13: a retrained list on an apostrophe corpus can learn a
    symbol containing ' — e.g. (\"don\", \"'t\") — and an unescaped
    literal would be a parse error or, worse, a wrong pattern)."""

    def q(text: str) -> str:
        return "'" + text.replace("'", "''") + "'"

    s = (
        f"{q(BPE_SEP)} || ' ' || {q(BPE_SEP)} || "
        f"array_to_string(string_split_regex({var}, ''), {q(BPE_SEP)}) || "
        f"{q(BPE_SEP)}"
    )
    for a, b in BPE_MERGES:
        pat = q(f"{BPE_SEP}{a}{BPE_SEP}{b}{BPE_SEP}")
        rep = q(f"{BPE_SEP}{a}{b}{BPE_SEP}")
        s = f"replace(replace({s}, {pat}, {rep}), {pat}, {rep})"
    return f"trim({s}, {q(BPE_SEP)})"


def _bpe_oracle() -> str:
    return f"""
WITH toks AS (SELECT doc_id, {_SQL_LM_FTOKS} AS ws FROM documents),
enc AS (SELECT doc_id, ws, list_transform(ws, w -> {_enc_sql("w")}) AS es
        FROM toks)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(COALESCE(list_sum(list_transform(
                es, e -> len(string_split(e, '{BPE_SEP}')))), 0) AS BIGINT)
           AS n_subwords,
       COALESCE(array_to_string(es, '{BPE_SEP}'), '') AS subwords_s
FROM enc
"""
# ^ the COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
# array_join([]) is '' — an empty/whitespace-only/NULL-text document
# must encode as the empty string in both engines (unicode-corpus
# degenerate rows 18-21, caught by tests/test_unicode_corpus_parity.py)


@register(
    "text_bpe_encode",
    oracle=_bpe_oracle(),
    doc="BPE subword encoding of every document under a FROZEN literal "
    "merge list (trained once by bpe_train on the sf0.001 reference "
    "corpus — the deploy-a-trained-tokenizer shape): (doc_id, n_words, "
    "n_subwords, subwords_s) with the subword sequence joined on \\x1f "
    "(token-impossible post-fold). Spark side is the zero-Exchange "
    "Arrow mapInPandas encoder with a per-task word->subwords memo; the "
    "DuckDB twin encodes via two-pass delimited string replace per "
    "merge (equivalence argument at _enc_sql, property-pinned in "
    "tests/test_bpe.py). FULL value oracle over the exact subword "
    "sequence.",
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thesis_iceberg_spark.sources.registry import load_table

    enc = bpe_encode_df(
        load_table(spark, sf_dir, "documents"), list(BPE_MERGES)
    )
    return enc.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_subwords").cast("bigint").alias("n_subwords"),
        F.array_join("subwords", BPE_SEP).alias("subwords_s"),
    )


def bpe_fertility_by_lang_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, n_words, n_subwords, fertility): per-language
    tokenizer FERTILITY (subwords per word) under the frozen merge list
    — the table every multilingual vocab decision reads (a tokenizer
    trained on one language mix over-segments the others; fertility per
    language is the standard measure, e.g. the XLM-R/NLLB tokenizer
    analyses).  Exactness: both sums are order-free bigints and
    fertility is ONE IEEE division of exact-integer-valued doubles —
    full value oracle, composed from the registered text_bpe_encode
    fragment (sql_bpe_fertility_by_lang).  Scale shape: the zero-shuffle
    Arrow encode + ONE map-side-combined groupBy over the bounded lang
    key set; at 100 TB the encode output is the write-time tokenization
    column, making this a pure metadata aggregate.  r14 df-level;
    r15/r16 registration candidate."""
    from thesis_iceberg_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    enc = bpe_encode_df(docs, list(BPE_MERGES), keep_cols=("lang",))
    return (
        enc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_words").cast("bigint")).alias("n_words"),
            F.sum(F.col("n_subwords").cast("bigint")).alias("n_subwords"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_subwords",
            F.when(
                F.col("n_words") > 0,
                F.col("n_subwords").cast("double")
                / F.col("n_words").cast("double"),
            ).alias("fertility"),
        )
    )


def sql_bpe_fertility_by_lang() -> str:
    """DuckDB twin of bpe_fertility_by_lang_df, composed from the
    registered text_bpe_encode fragment (one encode definition, the
    composed-oracle discipline)."""
    return f"""
WITH b AS ({_bpe_oracle()})
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(b.n_words) AS BIGINT) AS n_words,
       CAST(SUM(b.n_subwords) AS BIGINT) AS n_subwords,
       CASE WHEN SUM(b.n_words) > 0
            THEN CAST(SUM(b.n_subwords) AS DOUBLE)
                 / CAST(SUM(b.n_words) AS DOUBLE)
            END AS fertility
FROM documents d JOIN b ON b.doc_id = d.doc_id
GROUP BY d.lang
"""
