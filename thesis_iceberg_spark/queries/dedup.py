"""Deduplication operators over `documents` / `embeddings` (north-star §2B).

Five dedup families a training-data pipeline needs, each Spark-first:

  * exact        — hash-groupBy on a normalized fingerprint (one shuffle).
  * n-gram Jaccard — shingle -> explode -> self-join on shingle -> count
                   ratio; the exact-verification primitive.
  * MinHash+LSH  — keyed-md5 minhash signatures, banded into buckets; only
                   bucket-colliding pairs are verified. THE scale path: at
                   100 TB the shingle self-join above is infeasible, LSH
                   bounds candidate pairs to near-dups.
  * SimHash      — 16-bit sign-of-weighted-sum sketch; equal-sketch bucketing.
  * embedding cosine — near-dup by semantic similarity over the embedding
                   column (exact doubles; see similarity.py for the ANN path).
                   Registered as the IVF/LSH-bucketed pair generator
                   (equi-join on centroid bucket); the brute-force O(n^2)
                   variant is a pytest-only recall baseline.

Portability trick for the DuckDB oracles: all hashing is md5-based.  A
"permutation" h_i(s) = md5(i || ':' || s) compared lexicographically is a
random permutation of shingle space both engines compute identically (no
engine-specific hash functions anywhere).
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import REGISTRY, register
from thesis_iceberg_spark.queries.textnorm import certify_py, fold_col, fold_py, fold_sql
from thesis_iceberg_spark.sources.registry import load_table

N_MINHASH = 12  # minhash permutations
N_BANDS = 4  # LSH bands (3 rows per band)
ROWS_PER_BAND = N_MINHASH // N_BANDS
JACCARD_THRESHOLD = 0.5  # verification threshold for near-dup pairs


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _norm_sql(col: str = "text") -> str:
    # the unicode fold (textnorm.fold_sql: whitespace/invisible fold +
    # İ/Σ case fixups) runs BEFORE trim/lower/collapse, exactly like
    # _norm(); r11 widened the r10 \x0B-only fold to the full certified
    # contract (see textnorm.py module doc)
    return f"regexp_replace(trim(lower({fold_sql(col)})), '\\s+', ' ', 'g')"


def _norm(col: str = "text"):
    return F.regexp_replace(F.trim(F.lower(fold_col(F.col(col)))), r"\s+", " ")


# --- shingling (3-token shingles over whitespace tokens) -------------------


def _shingles():
    """Distinct 3-token shingles as an array column (Spark side).

    Built with slice + zip_with rather than indexed transform: ``t[i]``
    inside a lambda re-evaluates the token-array expression PER ELEMENT
    (O(tokens^2) splits per document); three shifted slices evaluate it
    three times per row total.
    """
    t = F.split(_norm(), " ")
    n = F.greatest(F.size(t) - 2, F.lit(0))
    a1 = F.slice(t, 1, n)
    a2 = F.slice(t, 2, n)
    a3 = F.slice(t, 3, n)
    return F.array_distinct(
        F.zip_with(
            F.zip_with(a1, a2, lambda x, y: F.concat_ws(" ", x, y)),
            a3,
            lambda xy, z: F.concat_ws(" ", xy, z),
        )
    )


_SQL_TOKS = f"regexp_split_to_array({_norm_sql()}, ' ')"
_SQL_SHINGLES = (
    f"list_distinct(list_transform(range(1, len({_SQL_TOKS}) - 1), "
    f"i -> {_SQL_TOKS}[i] || ' ' || {_SQL_TOKS}[i+1] || ' ' || {_SQL_TOKS}[i+2]))"
)

# --- heavy-shingle document-frequency cap ----------------------------------
# A shingle shared by a large fraction of the corpus ("of the and", a
# boilerplate header) is a HOT KEY in any shingle equi-join: at 100 TB one
# shingle in 1% of docs alone produces 1e-4 * n^2 join rows, and it carries
# no containment signal precisely because it is everywhere.  Standard fix
# (used by both inverted-index joins below): drop shingles whose document
# frequency exceeds max(DF_CAP_FLOOR, DF_CAP_FRAC * corpus size) BEFORE the
# join; per-doc shingle counts are taken over the capped set so Jaccard /
# containment stay internally consistent.
DF_CAP_FLOOR = 1000
DF_CAP_FRAC = 0.001  # 0.1% of documents


def _df_cap(n_docs: int) -> float:
    return max(DF_CAP_FLOOR, DF_CAP_FRAC * n_docs)


_WS_ASCII = re.compile(r"\s+", re.ASCII)

# The three tokenizer implementations (this Python twin, Spark's Java-regex
# `\s+`, DuckDB's RE2 `\s+`) agree EXACTLY on the CERTIFIED text domain
# (r7 ask #6 / r9-r10 unification / r11 unicode fold, pinned by the
# property test in tests/test_tokenizer_contract.py and the per-codepoint
# three-engine sweep in tests/test_unicode_fold_contract.py):
#   * whitespace: RE2 `\s` is [\t\n\f\r ] (EXCLUDES \x0B, which Java and
#     Python ASCII `\s` include); unicode whitespace is outside all three
#     regex `\s` classes but inside Python's no-arg split().  The
#     textnorm fold turns \x0B + every unicode whitespace char into a
#     plain space BEFORE trimming, so all of it is IN contract;
#   * lower(): full-unicode in all three engines but with divergent
#     tailoring on exactly İ and Σ — both folded away pre-lower by
#     textnorm; remaining cased chars are certified per codepoint
#     (stable Latin/Greek/Cyrillic/Armenian/fullwidth blocks), everything
#     else raises via textnorm.certify_py — loud failure beats a silent
#     Spark/DuckDB divergence.


def _py_shingles(text: str | None):
    """Python twin of _shingles()/_SQL_SHINGLES for Arrow kernels: distinct
    3-token shingles of the normalized text, or an empty set below 3
    tokens.  Tokenizer rules shared with the oracle: the textnorm unicode
    fold first (before strip — the fold sits inside trim() on the SQL
    side), then ASCII \\s+ over strip(' ').lower() (both engines' trim()
    is space-only).  Raises ValueError on uncertifiable characters
    (textnorm.certify_py — cased scripts outside the stable blocks,
    unassigned codepoints)."""
    t = fold_py(text or "")
    certify_py(t)
    toks = _WS_ASCII.sub(" ", t.strip(" ").lower()).split(" ")
    if len(toks) < 3:
        return set()
    return {f"{toks[i]} {toks[i + 1]} {toks[i + 2]}" for i in range(len(toks) - 2)}


def _shingle_hasher():
    """Memoized shingle -> (28-hex md5 prefix, h1, h2) for the minhash
    kernel (VERDICT r5 #4): shingles repeat across documents, so each
    distinct shingle is hashed once per task.  digest()[:14].hex() ==
    hexdigest()[:28], int.from_bytes(d[:7]) == int(hex[:14], 16), and
    int.from_bytes(d[7:14]) == int(hex[14:28], 16) — bit-identical to the
    previous per-occurrence form, so the DuckDB oracle is unchanged.  The
    cache clears at the shared cap to bound task memory."""
    from hashlib import md5

    from thesis_iceberg_spark.queries.text import _TOK_CACHE_CAP

    cache: dict[str, tuple[str, int, int]] = {}
    get = cache.get

    def h(s: str) -> tuple[str, int, int]:
        v = get(s)
        if v is None:
            if len(cache) >= _TOK_CACHE_CAP:
                cache.clear()
            d = md5(s.encode()).digest()[:14]
            v = cache[s] = (
                d.hex(),
                int.from_bytes(d[:7], "big"),
                int.from_bytes(d[7:], "big"),
            )
        return v

    return h


def _capped_shingles(
    docs: DataFrame, n_docs: int, hash_keys: bool = False
) -> DataFrame:
    """(doc_id, s) exploded distinct shingles, heavy-hitters removed.

    ``hash_keys=True`` (r12, VERDICT r11 #6) replaces the shingle STRING
    with its 16-byte md5 (``unhex(md5(s))``) in the STAGED frame — every
    downstream consumer (Jaccard self-join, containment join, per-doc
    counts) needs only key EQUALITY, and the oracle compares final
    doc-id pairs, never intermediate keys, so a 16-byte key is
    value-identical modulo md5 collision (~2^-64 at any corpus size that
    fits a planet).  The hot-list cap still runs on the raw strings
    (before the hash) so its broadcast stays tiny either way.  Measured
    staging delta (tests/exp_shingle_stage_bytes.py, sf0.1): -2.3% only —
    3-token shingles are already ~16 bytes, so this pays on longer keys
    (wider shingles, URLs), and the composition keeps it mostly for the
    fixed-width join key.

    Shingles are per-doc distinct, so the per-shingle row count IS document
    frequency.  The hot list is tiny by construction (only shingles in
    >0.1% of the corpus), so it broadcasts; the anti-join is a map-side
    filter, not a shuffle.

    Shingling runs as an Arrow mapInPandas (per-document bounded state,
    like the minhash/repetition kernels): identical rows to the JVM
    slice+zip_with explode, but flat-cost — the JVM form pays 3+ s of
    codegen JIT on its regex/HOF chain cold (4.1 vs 2.4 s cold at sf0.1;
    both ~0.8 s warm).
    """

    def shingle_udf(batches):
        import pandas as pd

        for pdf in batches:
            ids, ss = [], []
            for doc_id, text in zip(pdf["doc_id"].to_numpy(), pdf["text"]):
                sh = _py_shingles(text)
                ids.extend([int(doc_id)] * len(sh))
                ss.extend(sh)
            yield pd.DataFrame({"doc_id": ids, "s": ss})

    # r16 optimization round (guide §1.2/§4): the raw explode is staged
    # ONCE before the hot-list build — the r15 form computed `hot` and
    # the kept side each from the un-staged mapInPandas, so the Python
    # shingle kernel (fold + certify + set build per doc) ran TWICE per
    # staging (once under the hot broadcast, once for the main side).
    # One extra checkpoint of the raw explode (the hot rows it adds are
    # <= the df-cap's own definition of rare) buys back a whole kernel
    # pass: measured 0.87x on the staging with identical rows; at scale
    # it is one corpus pass through the Python boundary instead of two.
    # EAGER, not lazy — see the connected_components round checkpoint
    # for the measured r16 dead end (lazy fusion reintroduces the r3
    # accumulator error).
    sh = (
        docs.select("doc_id", "text")
        .mapInPandas(shingle_udf, "doc_id bigint, s string")
        .localCheckpoint(eager=True)
    )
    hot = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > _df_cap(n_docs))
        .select("s")
    )
    # both consumers (ngram-jaccard: counts + two join sides; decontaminate:
    # train/eval/eval-counts) read this THREE times — materialize the
    # explode + df-cap pass once, same rationale and same measured win as
    # the minhash checkpoint above (eager: a lazy checkpoint can be
    # recomputed after stage cleanup)
    kept = sh.join(F.broadcast(hot), "s", "left_anti")
    if hash_keys:
        kept = kept.select("doc_id", F.unhex(F.md5("s")).alias("s"))
    # NOT staged partitioned-by-s (r16 optimization round, measured dead
    # end — tests/exp_r16_shingle_part_ab.py): a repartition("s") before
    # this checkpoint would let the downstream s-keyed joins (Jaccard
    # self-join, containment join) reuse the staged partitioning via the
    # LogicalRDD's outputPartitioning, but at the measured sizes every
    # one of those joins plans as a BroadcastHashJoin (the checkpoint's
    # stats are visible), so there is NO s-keyed exchange to remove —
    # the staging exchange is pure added cost (A/B 1.145x, rows
    # identical, 0 s-exchanges in both forms' final plans).  At corpus
    # sizes where both join sides exceed the broadcast threshold the
    # repartition-before-checkpoint posture becomes the right one; that
    # is a persist(DISK)/staging-table layout decision at 100 TB, not a
    # local-plan one.
    return kept.localCheckpoint(eager=True)


# DuckDB twin of _capped_shingles: sh0 -> hot -> anti join.
_SQL_CAPPED_SH = f"""sh0 AS (
  SELECT doc_id, unnest({_SQL_SHINGLES}) AS s
  FROM documents WHERE len({_SQL_TOKS}) >= 3),
hot AS (
  SELECT s FROM sh0 GROUP BY s
  HAVING COUNT(*) > (SELECT GREATEST({DF_CAP_FLOOR}, {DF_CAP_FRAC} * COUNT(*))
                     FROM documents)),
sh AS (SELECT sh0.* FROM sh0 ANTI JOIN hot USING (s))"""


@register(
    "dedup_exact_hash",
    oracle=f"""
SELECT md5({_norm_sql()}) AS fingerprint,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1
""",
    doc="Exact dedup: group documents by normalized-text md5, keep the "
    "lowest doc_id as canonical. One hash shuffle on the fingerprint; "
    "at 100 TB this is a single groupBy with map-side combine.",
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.md5(_norm().cast("binary")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count("*").alias("n_docs"))
    )


# --- incremental (cross-batch) dedup via a Bloom membership filter (r12) ----
#
# Every dedup operator above is INTRA-corpus; the pattern a production
# crawl pipeline runs daily is INCREMENTAL — "which of today's documents
# already exist in the 100 TB corpus we keep?".  The scalable shape is a
# Bloom membership filter over the existing fingerprints (built once,
# reused across many incremental batches) probed as a NARROW map on the
# new batch, so the overwhelmingly-non-duplicate majority never enters a
# join shuffle; the few candidates that survive are confirmed with an
# exact equi-join, which makes the OUTPUT exact regardless of the
# filter's false-positive rate — the Bloom layer is pure pruning, which
# is what makes the operator fully value-oracle-able.
#
# At driver scale the per-partition bit arrays are OR-merged on the
# driver and rebroadcast (a few KB); at 100 TB the same two-step is a
# treeReduce of fixed-size arrays, and past the point where one array
# fits an executor (~1e11 keys at 1% fpp ~ 120 GB) the filter shards by
# fingerprint prefix with the probe side routed by the same prefix —
# documented, not needed here.

BLOOM_FPP = 0.01
RECRAWL_ID_OFFSET = 1_000_000

# Hard ceiling on one Bloom filter's bit-array BYTES (r13, VERDICT r12
# #3): the filter must broadcast to every executor and ride the
# treeAggregate merge as a single payload, so a corpus-scaled `n_items`
# must never silently size a multi-GB array — at fpp 0.01, 1e10 keys
# would ask for ~12 GB.  256 MB ~ 2.2e8 keys at 1% fpp; past that the
# REMEDIATION is prefix sharding: split the key space by fingerprint
# prefix into ceil(m/budget) independent filters, route the probe side
# by the same prefix, and probe each batch row against its shard only —
# same exactness story (the confirm join never changes).
BLOOM_MAX_FILTER_BYTES = 256 * 1024 * 1024


def _bloom_params(n_items: int) -> tuple[int, int]:
    """(m bits, k hashes) for BLOOM_FPP at ``n_items`` keys; m rounded up
    to whole uint64 words."""
    n = max(n_items, 1)
    m = max(64, math.ceil(-n * math.log(BLOOM_FPP) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _bloom_positions(fp_hex: str, m: int, k: int):
    """k bit positions from an md5 hex fingerprint via Kirsch-Mitzenmacher
    double hashing g_i = (h1 + i*h2) mod m.  Any deterministic arithmetic
    works for a Bloom filter as long as build and probe share it — and
    output exactness never depends on it (the confirm join is exact)."""
    h1 = int(fp_hex[:16], 16)
    h2 = int(fp_hex[16:32], 16)
    return [(h1 + i * h2) % m for i in range(k)]


def bloom_build(fps: DataFrame, m: int, k: int) -> bytes:
    """Bit array (as bytes) over ``fps.fingerprint`` (md5 hex strings):
    one fixed-size numpy array per PARTITION (mapInPandas drains the
    whole partition before yielding), OR-merged pairwise by an RDD
    ``treeAggregate`` (depth 2): the executor-side combine round reduces
    P per-partition arrays to ~sqrt(P) partial aggregates, and the
    driver merges THOSE — so driver transfer shrinks from P x
    filter-bytes to ~sqrt(P) x filter-bytes (the scale contract VERDICT
    r12 #3 asked for; r12 collected all P arrays onto the driver.  At
    sqrt(P) x budget-sized arrays the driver is still comfortably
    bounded: 32 partial 256 MB arrays for P = 1024).  A filter whose
    single-array bytes exceed BLOOM_MAX_FILTER_BYTES raises loudly
    BEFORE any job runs, with the prefix-sharding remediation in the
    message."""
    filter_bytes = m // 8
    if filter_bytes > BLOOM_MAX_FILTER_BYTES:
        raise ValueError(
            f"Bloom filter would be {filter_bytes / 1e6:.0f} MB "
            f"(m={m} bits), over the {BLOOM_MAX_FILTER_BYTES / 1e6:.0f} MB "
            "single-array budget it must fit to broadcast and tree-merge "
            "— shard the key space by fingerprint prefix into that many "
            "independent filters and route the probe by the same prefix "
            "(see the BLOOM_MAX_FILTER_BYTES comment); output exactness "
            "is unaffected either way (the confirm join is exact)"
        )

    def setbits(batches):
        import numpy as np
        import pandas as pd

        bits = np.zeros(m // 64, dtype=np.uint64)
        for pdf in batches:
            for fp in pdf["fingerprint"]:
                if not isinstance(fp, str):
                    # NULL text -> NULL fingerprint: never joinable as a
                    # member (SQL equi-join semantics), so it carries no
                    # bits — mirrored by the probe below and pinned in
                    # tests/test_bloom_incremental.py
                    continue
                for pos in _bloom_positions(fp, m, k):
                    bits[pos >> 6] |= np.uint64(1) << np.uint64(pos & 63)
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    import numpy as np

    def _or(acc, row):
        return acc | np.frombuffer(row["bits"], dtype=np.uint64)

    def _or_merge(a, b):
        return a | b

    zero = np.zeros(m // 64, dtype=np.uint64)
    merged = (
        fps.select("fingerprint")
        .mapInPandas(setbits, "bits binary")
        .rdd.treeAggregate(zero, _or, _or_merge, depth=2)
    )
    return merged.tobytes()


def bloom_probe(df: DataFrame, bloom_bc, m: int, k: int) -> DataFrame:
    """Rows of ``df`` whose ``fingerprint`` MIGHT be in the filter — a
    narrow Arrow map with zero shuffle; false positives possible (the
    caller confirms exactly), false negatives impossible."""

    def probe(batches):
        import numpy as np

        bits = np.frombuffer(bloom_bc.value, dtype=np.uint64)
        one = np.uint64(1)
        for pdf in batches:
            keep = [
                isinstance(fp, str)  # NULL fingerprint: not a member
                and all(
                    (bits[pos >> 6] >> np.uint64(pos & 63)) & one
                    for pos in _bloom_positions(fp, m, k)
                )
                for fp in pdf["fingerprint"]
            ]
            yield pdf[np.array(keep, dtype=bool)] if len(pdf) else pdf

    return df.mapInPandas(probe, df.schema)


@register(
    "dedup_incremental_bloom",
    oracle=f"""
WITH fp AS (SELECT doc_id, md5({_norm_sql()}) AS fingerprint FROM documents),
ex AS (SELECT fingerprint, MIN(doc_id) AS canonical_doc_id
       FROM fp WHERE doc_id % 2 = 0 GROUP BY 1),
batch AS (SELECT doc_id + {RECRAWL_ID_OFFSET} AS doc_id, fingerprint FROM fp)
SELECT b.doc_id, ex.canonical_doc_id, b.fingerprint
FROM batch b JOIN ex USING (fingerprint)
""",
    doc="Incremental (cross-batch) exact dedup: which documents of a new "
    "crawl batch already exist in the kept corpus. The kept corpus is "
    "the even-doc_id half; the new batch is a simulated re-crawl of ALL "
    "documents (ids offset by 1e6), so both arms carry real rows — even "
    "docs' re-crawls ARE members, odd docs' re-crawls are not and are "
    "pruned by the Bloom filter before any shuffle. Scale shape: the "
    "filter is built once over the existing fingerprints (per-partition "
    "bit arrays, OR-merge) and broadcast; the probe is a zero-shuffle "
    "Arrow map over the batch; only surviving candidates enter the "
    "exact confirm join, whose output is exact regardless of the "
    "filter's false-positive rate — the oracle is the plain semi-join.",
)
def dedup_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # the fingerprint lineage (text scan + fold + certify + md5) feeds
    # FOUR consumers (the params count, the filter build, the probe, and
    # the confirm groupBy) — stage the NARROW (doc_id, 32-char) frame
    # once so the expensive text pass runs once, not four times (review
    # r12; same discipline as bm25's per_doc checkpoint, search.py:100)
    fp = docs.select(
        "doc_id", F.md5(_norm().cast("binary")).alias("fingerprint")
    ).localCheckpoint(eager=True)
    existing = fp.filter(F.col("doc_id") % 2 == 0)
    batch = fp.select(
        (F.col("doc_id") + RECRAWL_ID_OFFSET).alias("doc_id"), "fingerprint"
    )
    m, k = _bloom_params(existing.count())
    bloom_bc = spark.sparkContext.broadcast(bloom_build(existing, m, k))
    candidates = bloom_probe(batch, bloom_bc, m, k)
    canon = existing.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_doc_id")
    )
    return candidates.join(canon, "fingerprint").select(
        "doc_id", "canonical_doc_id", "fingerprint"
    )


@register(
    "dedup_ngram_jaccard_pairs",
    oracle=f"""
WITH {_SQL_CAPPED_SH},
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       CAST(c AS DOUBLE) / (ca.n + cb.n - c) AS jaccard
FROM common
JOIN cnt ca ON ca.doc_id = doc_a
JOIN cnt cb ON cb.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= {JACCARD_THRESHOLD}
""",
    doc="N-gram Jaccard near-dup pairs: 3-token shingles, exploded, heavy-"
    "hitter shingles (document frequency > max(1000, 0.1% of corpus)) "
    "dropped via a broadcast anti-join, then self-joined on shingle "
    "(inverted-index join — only docs SHARING a kept shingle ever meet, "
    "never a cartesian), Jaccard from integer counts over the capped "
    "shingle space. The cap bounds the hottest join key: without it one "
    "boilerplate shingle in 1% of docs yields 1e-4*n^2 join rows at scale "
    "while carrying no near-dup signal. The LSH variant below is still "
    "the 100 TB candidate-generation path.",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return ngram_jaccard_pairs_from_shingles(_capped_shingles(docs, docs.count()))


def ngram_jaccard_pairs_from_shingles(sh: DataFrame) -> DataFrame:
    """Jaccard pairs from an already-built capped shingle frame (doc_id,
    s) — extracted in r11 so pipeline_pretrain_corpus can share ONE
    shingle explode between fuzzy dedup and decontamination instead of
    scanning the text corpus twice."""
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("c"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    # per-doc count tables scale with the corpus — shuffle join, not broadcast
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# MinHash+LSH pair generation as reusable CTE text: the pair query uses it
# directly; the connected-components clustering query builds on top of it.
_SQL_MINHASH_CTES = f"""sh0 AS (
  SELECT doc_id, unnest({_SQL_SHINGLES}) AS s
  FROM documents WHERE len({_SQL_TOKS}) >= 3),
hashed AS (
  -- ONE md5 per shingle; the i-th permutation is h1 + i*h2 (double
  -- hashing); 14 hex digits (56 bits) per half so i*h2 never overflows
  SELECT doc_id,
         CAST('0x' || substr(md5(s), 1, 14) AS BIGINT) AS h1,
         CAST('0x' || substr(md5(s), 15, 14) AS BIGINT) AS h2
  FROM sh0),
sig AS (
  SELECT doc_id,
         {", ".join(f"MIN(h1 + {i} * h2) AS mh{i}" for i in range(N_MINHASH))}
  FROM hashed GROUP BY doc_id),
bands AS (
  SELECT doc_id, band_id,
         CASE band_id
           {" ".join(
               f"WHEN {b} THEN md5(" + " || '|' || ".join(
                   f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)"
                   for r in range(ROWS_PER_BAND)
               ) + ")"
               for b in range(N_BANDS)
           )}
         END AS band_key
  FROM sig, (SELECT unnest(range(0, {N_BANDS})) AS band_id)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
sh AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s
       FROM documents WHERE len({_SQL_TOKS}) >= 3),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT cand.doc_a, cand.doc_b, COUNT(*) AS c
  FROM cand
  JOIN sh a ON a.doc_id = cand.doc_a
  JOIN sh b ON b.doc_id = cand.doc_b AND a.s = b.s
  GROUP BY 1, 2)"""

_SQL_MINHASH_SELECT = f"""
SELECT doc_a, doc_b, CAST(c AS DOUBLE) / (ca.n + cb.n - c) AS jaccard
FROM common JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= {JACCARD_THRESHOLD}
"""


@register(
    "dedup_minhash_lsh_pairs",
    oracle=f"WITH {_SQL_MINHASH_CTES} {_SQL_MINHASH_SELECT}",
    doc=f"MinHash+LSH near-dup pairs: {N_MINHASH} double-hashed minhash "
    f"permutations (one md5 per shingle), {N_BANDS} bands x {ROWS_PER_BAND} "
    "rows; docs colliding in any band become candidates, verified with "
    "exact Jaccard. This is the 100 TB dedup path. Spark shape: shingling "
    "+ hashing + signatures + band keys are ALL per-document bounded "
    "state, so they run as ONE shuffle-free Arrow mapInPandas emitting a "
    "per-doc signature row (shingle-hash set, count, band keys); the only "
    "shuffles are the band-bucket equi-join (4 narrow rows per doc — "
    "proportional to corpus size, not pairs) and the candidate "
    "verification joins, which carry shingle-hash ARRAYS for candidate "
    "docs only and intersect them JVM-side (array_intersect).",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Implementation history (oracle-exact, warm sf0.1): per-permutation
    # keyed md5 inside nested array exprs ~9 s; explode+md5 once, 12 int
    # min-aggregates, eager checkpoint, exploded-row verification joins
    # 1.5-1.9 s; THIS form 1.1-1.3 s — the signature stage loses its
    # groupBy shuffle (~50 rows/doc) entirely and verification joins move
    # 2 array rows per candidate side instead of ~50 exploded rows.
    # Tokenizer twin of _norm()/the oracle (same rules as
    # text_gopher_repetition_signals): \x0B folded to a space first, then
    # ASCII \s+, space-only strip.
    # Shingle identity crossing engines is the 28-hex md5 prefix (112
    # bits, collisions 2^-112 and symmetric anyway).
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    n_minhash, n_bands, rows_per_band = N_MINHASH, N_BANDS, ROWS_PER_BAND
    bk_cols = [f"bk{b}" for b in range(n_bands)]
    schema = (
        "doc_id bigint, n int, hset array<string>, "
        + ", ".join(f"{c} string" for c in bk_cols)
    )

    def sigs(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        shash = _shingle_hasher()  # per-task memoized md5 (oracle-identical)
        for pdf in batches:
            recs = []
            for doc_id, text in zip(pdf["doc_id"].to_numpy(), pdf["text"]):
                shingles = _py_shingles(text)
                if not shingles:
                    continue  # no 3-shingles: absent from pairs, like the oracle
                triples = [shash(s) for s in shingles]
                hx = [t[0] for t in triples]
                h1 = np.fromiter(
                    (t[1] for t in triples), dtype=np.int64, count=len(triples)
                )
                h2 = np.fromiter(
                    (t[2] for t in triples), dtype=np.int64, count=len(triples)
                )
                # i*h2 stays < 2^60: no int64 overflow, same as the oracle
                mh = [int((h1 + i * h2).min()) for i in range(n_minhash)]
                bks = [
                    hashlib.md5(
                        "|".join(
                            str(mh[b * rows_per_band + r])
                            for r in range(rows_per_band)
                        ).encode()
                    ).hexdigest()
                    for b in range(n_bands)
                ]
                recs.append((int(doc_id), len(hx), hx, *bks))
            yield pd.DataFrame(recs, columns=["doc_id", "n", "hset", *bk_cols])

    # localCheckpoint (EAGER): the signature table is consumed THREE times
    # (band rows + both verification sides) — materialize the Python pass
    # once.  Eager, not lazy: a lazily checkpointed RDD can be recomputed
    # after its originating stage's accumulators are cleaned up
    # ("attempted to access non-existent accumulator", BENCH_r03 tail);
    # see tests/exp_minhash_ckpt.py.
    sig = docs.mapInPandas(sigs, schema).localCheckpoint(eager=True)

    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.col(f"bk{b}").alias("band_key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bd"),
    ).select("doc_id", "bd.band_id", "bd.band_key")

    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # exact-Jaccard verification of candidates only: join each side's
    # signature row (shingle-hash set as an array) and intersect JVM-side
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), F.col("hset").alias("ha")
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), F.col("hset").alias("hb")
    )
    c = F.size(F.array_intersect("ha", "hb"))
    jac = c.cast("double") / (F.col("na") + F.col("nb") - c)
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# --- SimHash ---------------------------------------------------------------

N_SIMHASH_BITS = 16


@register(
    "dedup_simhash",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_distinct({_SQL_TOKS}) AS t FROM documents),
bits AS (
  SELECT doc_id,
         list_transform(range(1, {N_SIMHASH_BITS} + 1),
           j -> CASE WHEN list_sum(list_transform(t,
                  w -> CASE WHEN substr(md5(w), j, 1) IN
                       ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)) >= 0
                THEN '1' ELSE '0' END) AS bl
  FROM toks)
SELECT doc_id, list_aggregate(bl, 'string_agg', '') AS simhash
FROM bits
""",
    doc=f"SimHash sketch: {N_SIMHASH_BITS}-bit sign-of-sum over per-token "
    "md5 bit contributions (+1/-1 per token per bit). Equal or near-equal "
    "sketches bucket near-dups; narrow per-row computation, no shuffle.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.array_distinct(F.split(_norm(), " "))
    hexd = F.array(*[F.lit(c) for c in "89abcdef"])
    bit_j = lambda j: F.when(  # noqa: E731
        F.aggregate(
            t,
            F.lit(0),
            lambda acc, w: acc
            + F.when(
                F.array_contains(hexd, F.substring(F.md5(w.cast("binary")), j, 1)), F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        >= 0,
        F.lit("1"),
    ).otherwise(F.lit("0"))
    simhash = F.concat(*[bit_j(j) for j in range(1, N_SIMHASH_BITS + 1)])
    return _docs(spark, sf_dir).select("doc_id", simhash.alias("simhash"))


def _dot(u, w):
    """Exact double dot product as a sequential HOF fold — DuckDB's
    list_dot_product over DOUBLE[] reproduces it bit-for-bit (measured
    faster than an unrolled codegen expression, see PERFORMANCE.md)."""
    return F.aggregate(
        F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda acc, p: acc + p
    )


def _np_brute_pairs(tbl, threshold: float = 0.45) -> list[tuple[int, int]]:
    """(vec_a, vec_b) with vec_a < vec_b and cosine >= ``threshold`` over
    a BOUNDED Arrow table of (vec_id, v: list<double>) — the driver-side
    numpy twin of _brute_cosine_pairs for the kmeans self-check's recall
    DENOMINATOR (r15 optimization round, guide §4.2: the check is <=
    BRUTE_CHECK_CEILING=1000 vectors BY DESIGN, so its ~500k dot products
    are one dense GEMM on the driver, not 500k interpreted HOF folds in a
    nested-loop join — measured ~1 s -> ~ms at sf0.1).  Bounded-collect
    contract: callers must cap the input (the self-check samples to the
    ceiling first), the same justification as the fit-sample toArrow and
    the quantile refinement's <= 4096-row pick.

    Pair-exclusion semantics mirror the DataFrame form exactly: NULL
    vectors emit nothing (transform(NULL) -> NULL -> NULL dot), pairs of
    DIFFERENT widths are excluded (zip_with pads with NULL -> NULL dot),
    zero-norm members are excluded (try_divide -> NULL < threshold).
    Cosine VALUES may differ from the sequential fold in the last ulp
    (GEMM summation order) — only the >= threshold COUNTS feed the
    self-check's gate booleans, which hold with >= 0.09 margin."""
    import numpy as np

    ids_all = tbl.column("vec_id").to_pylist()
    vecs = tbl.column("v").to_pylist()
    by_width: dict[int, tuple[list[int], list[list[float]]]] = {}
    for vid, v in zip(ids_all, vecs):
        if v is None:
            continue
        ids, rows = by_width.setdefault(len(v), ([], []))
        ids.append(int(vid))
        rows.append(v)
    out: list[tuple[int, int]] = []
    for _w, (ids, rows) in by_width.items():
        if len(ids) < 2:
            continue
        X = np.asarray(rows, dtype=np.float64)
        nrm = np.linalg.norm(X, axis=1)
        nz = nrm > 0  # zero-norm: excluded like the NULL try_divide
        S = X @ X.T
        denom = np.outer(nrm, nrm)
        with np.errstate(divide="ignore", invalid="ignore"):
            C = np.where(np.outer(nz, nz), S / denom, -np.inf)
        iu = np.triu_indices(len(ids), k=1)
        hits = C[iu] >= threshold
        a_idx, b_idx = iu[0][hits], iu[1][hits]
        arr = np.asarray(ids, dtype=np.int64)
        out.extend(
            (int(min(a, b)), int(max(a, b)))
            for a, b in zip(arr[a_idx], arr[b_idx])
        )
    return sorted(out)


def dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force O(n^2) embedding-cosine near-dup pairs (threshold 0.45).

    NOT registered with the driver: quadratic pair enumeration is a
    correctness baseline only — it is the pytest oracle-of-the-oracle for
    ``dedup_embedding_lsh_pairs`` (recall check in tests/test_dedup_scale.py),
    which is the registered, 100 TB-shaped variant.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return _brute_cosine_pairs(spark, e)


def _brute_cosine_pairs(spark: SparkSession, e: DataFrame) -> DataFrame:
    """All-pairs cosine >= 0.45 over ``e`` = (vec_id, v: array<double>).

    O(n^2) by definition — callers must bound n (the registered kmeans
    self-check samples its input down to BRUTE_CHECK_CEILING vectors
    first; the full-corpus form above is pytest-only)."""
    n = e.select("vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nm"))
    # the corpus arrives as one file split; spread the O(n^2) pair work
    # across all cores (stream side of the nested-loop join)
    a = n.repartition(int(spark.conf.get("spark.sql.shuffle.partitions"))).select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nm").alias("na")
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nm").alias("nb")
    )
    # try_divide: under ANSI (Spark 4 default) a zero-norm vector would
    # throw DIVIDE_BY_ZERO in a plain divide; NULL cosine fails >= 0.45
    # in both engines (DuckDB division by zero is NULL too — bit-parity
    # preserved for every non-degenerate pair)
    cos = F.try_divide(
        _dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.45)
    )


# Tiered compound cross-polytope LSH: the bucket ARITY (how many signature
# dims a candidate pair must share) grows with corpus size.  A pair
# collides iff their top-16 signatures share >= arity signed dims (the
# buckets enumerate ALL arity-subsets of the signature), so the per-pair
# random-collision probability is the OVERLAP TAIL — an n-INVARIANT
# constant per rung, NOT the uniform-bucket floor n^2/B the pre-r7 ladder
# assumed.  Candidates therefore grow as T(arity) * n^2 with a constant
# that decays ~4-8x per arity step.  MEASURED (round 7, executed rungs on
# real data — n=21,500 with 1,500 planted near-dup pairs at exact cosines
# 0.7/0.8/0.9, tests/exp_lsh_generative_rung.py; T verified n-invariant
# at n=5.3k vs 21.5k, 0.0857 vs 0.0856 at a4):
#
#   rung           T = cand/n^2   recall@0.7  @0.8   @0.9
#   a4 top16+anc13   0.0856          1.000    1.000  1.000   <- DOMINATED
#   a5 top16+anc13   0.0225          0.998    1.000  1.000
#   a6 top16+anc13   0.00415         0.976    0.992  1.000
#   a7 top16+anc13   0.000549        0.862    0.978  1.000
#   a8 top16+anc13   0.0000551       0.626    0.910  0.994
#   (mid tier a3 top12+anc6: 0.049 / 0.861 measured at n=2000, round 5)
#
# Arity 4 is strictly dominated by 5 (4x the candidates, same recall) and
# is no longer a rung.  The pre-r7 admission bounds C(128,a)//10 assumed
# n^2/B collisions and admitted up to 1.4e11 vectors; the measured
# n-invariant T falsifies that model (r5/r6 VERDICT ask: execute a rung,
# not just the closed form).  HONEST bounds: each rung admits a corpus
# only while its measured candidate WORK stays linear —
# T(a) * n <= _CAND_PER_DOC_BUDGET (10k verification dots per doc,
# ~1 ms/doc vectorized) — so the ladder now tops out at ~1.8e8 vectors
# (a8).  Past that, subset-enumeration LSH cannot hold both recall and
# sub-budget candidates at a 0.45 threshold; the scale path for 1e8+
# corpora is the SemDeDup-style KMEANS-BOUNDED candidate generator
# (dedup_embedding_kmeans_candidates below): candidates ~ p^2*n^2/(2k)
# with k ~ n/bucket_target, i.e. O(n) by construction, recall measured on
# the planted corpus (PERFORMANCE.md).
#
# The anchor-pair component ((arity-1)-tuples drawn only from the top-13
# strongest dims) buys back the recall the arity bump costs: the
# strongest dims carry most of the cosine mass.  sig_dims stays 16, so
# per-vector bucket rows C(16, arity) are BOUNDED (<= 12870 at arity 8) —
# signature cost per vector does not grow with corpus size.  Recall gates
# are pytest-pinned on planted fixtures (tests/test_lsh_ladder.py) and an
# executed-rung test gates T and recall on a fresh 8k corpus every run.
_SIGNED_DIMS = 128  # 2 * embedding dim (64): each dim, signed
_BIG_L = 16  # signature width at every generative rung
_MAX_ARITY = 8  # base-128 long bucket keys stay < 128^8 ~ 7.2e16
_ANCHOR_RANK = 13  # anchor (a-1)-tuples drawn from the top-13 dims (r5
# sweep: the recall/candidate knee; per-vector anchor rows <= C(13,7)=1716)

# Measured per-pair random-collision ratio T(a) = candidates / n^2 for
# each rung config (n-invariant; round-7 executed sweep above).  These are
# EMPIRICAL constants: re-run tests/exp_lsh_generative_rung.py after any
# signature change.
MEASURED_COLLISION_RATIO = {
    3: 0.049,  # mid tier (top-12 + anchor-6), round-5 measurement
    4: 0.0856,
    5: 0.0225,
    6: 0.00415,
    7: 0.000549,
    8: 0.0000551,
}
# Admission budget: projected verification candidates per document at the
# rung's largest admitted corpus.  10k dots/doc ~ 1 ms/doc vectorized —
# linear total work by admission.
_CAND_PER_DOC_BUDGET = 10_000


def _big_rungs() -> tuple[tuple[int, int, int, int], ...]:
    # arity 4 is dominated by 5 (see table): generative rungs are 5..8
    return tuple(
        (
            int(_CAND_PER_DOC_BUDGET / MEASURED_COLLISION_RATIO[a]),
            a,
            _BIG_L,
            _ANCHOR_RANK,
        )
        for a in range(5, _MAX_ARITY + 1)
    )


SIG_TIERS = (
    # (corpus-count upper bound, arity, sig_dims L, anchor-pair rank m)
    (1024, 2, 16, 0),  # tiny: pairs over top-16 — recall 1.0 at sf<=0.01
    # mid: triples over top-12 + anchor pairs top-6; bound from measured T
    (int(_CAND_PER_DOC_BUDGET / MEASURED_COLLISION_RATIO[3]), 3, 12, 6),
    # generative rungs 5..8 over top-16 + anchor (a-1)-tuples over top-13;
    # measured-T bounds: 444k / 2.4M / 18.2M / 181M
    *_big_rungs(),
)
# Bucket-id namespace for the anchor component: must clear the MAIN
# component's range at every rung.  Keys are base-128 digits (a dim id is
# < 128), so an arity-8 key is < 128^8 ~ 7.2e16 and 1e17 keeps the
# namespaces disjoint.  (Base 1000 — the pre-r5 scheme — would overflow a
# long at arity 7.)
_ANCHOR_OFFSET = 100_000_000_000_000_000
# A bucket with s members emits s*(s-1)/2 candidate pairs; one 8192-member
# bucket is ~33M pairs from a single key — beyond any plausible non-
# pathological skew at the admitted corpus sizes.  The guard raises INSIDE
# the executor (F.raise_error, no extra job) instead of silently going
# quadratic on adversarial inputs.
BUCKET_CAP = 8192


def _lsh_tier(count: int) -> tuple[int, int, int]:
    """(arity, sig_dims, anchor_rank) for a corpus of ``count`` vectors."""
    for bound, arity, dims, anchor in SIG_TIERS:
        if bound is None or count < bound:
            return arity, dims, anchor
    raise NotImplementedError(
        f"corpus of {count} vectors exceeds the LSH ladder's top rung "
        f"(bound {SIG_TIERS[-1][0]}): past ~1.8e8 vectors the measured "
        "collision ratio T(8)*n blows the per-doc candidate budget — use "
        "the kmeans-bounded candidate path "
        "(dedup_embedding_kmeans_candidates), which is O(n) by "
        "construction, rather than letting candidates go quadratic"
    )


def _duck_bucket_join(arity: int, ti: int, extra: str = "") -> str:
    """DuckDB: self-join sig ``arity`` times into a sorted dim tuple.

    p0's source is tier-filtered so the 11 inactive rungs of the ladder
    join over an EMPTY left side and cost nothing (the generative rungs go
    up to arity 8 — unfiltered, their dead 8-way self-joins would
    materialize ~C(16,8) rows per vector per rung at oracle scale).
    """
    joins = f"(SELECT * FROM sig WHERE (SELECT t FROM tier) = {ti}) p0" + "".join(
        f" JOIN sig p{i} ON p{i - 1}.vec_id = p{i}.vec_id AND p{i - 1}.d < p{i}.d"
        for i in range(1, arity)
    )
    key = "p0.d"
    for i in range(1, arity):
        key = f"({key}) * 128 + p{i}.d"
    return f"SELECT p0.vec_id, CAST({key} AS BIGINT) AS bucket FROM {joins}{extra}"


def _duck_tier_buckets() -> str:
    """DuckDB bucket generation mirroring SIG_TIERS (only one tier active)."""
    parts = []
    for ti, (_, arity, _, anchor) in enumerate(SIG_TIERS):
        parts.append(_duck_bucket_join(arity, ti))
        if anchor:
            cond = " AND ".join(f"p{i}.rn <= {anchor}" for i in range(arity - 1))
            parts.append(
                _duck_bucket_join(arity - 1, ti, f" WHERE {cond}").replace(
                    "AS bucket", f"+ {_ANCHOR_OFFSET} AS bucket"
                )
            )
    return " UNION ALL ".join(parts)


_DUCK_TIER_CASE = " ".join(
    f"WHEN COUNT(*) < {bound} THEN {ti}"
    for ti, (bound, _, _, _) in enumerate(SIG_TIERS)
    if bound is not None
)
_DUCK_DIMS_CASE = " ".join(
    f"WHEN {ti} THEN {dims}" for ti, (_, _, dims, _) in enumerate(SIG_TIERS)
)


# Embedding-LSH oracle, split into CTEs + final SELECT so the cluster
# query below can wrap the same pair list in a recursive CTE.
_SQL_EMB_CTES = f"""tier AS (SELECT CASE {_DUCK_TIER_CASE}
                     ELSE {len(SIG_TIERS) - 1} END AS t FROM embeddings),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nm FROM e),
ex AS (SELECT vec_id, unnest(v) AS val,
              generate_subscripts(v, 1) - 1 AS pos FROM e),
ranked AS (
  SELECT vec_id,
         pos * 2 + CASE WHEN val >= 0 THEN 0 ELSE 1 END AS d,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY abs(val) DESC, pos) AS rn
  FROM ex),
sig AS (SELECT vec_id, d, rn FROM ranked
        WHERE rn <= CASE (SELECT t FROM tier) {_DUCK_DIMS_CASE} END),
buckets AS ({_duck_tier_buckets()}),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM buckets x JOIN buckets y
    ON x.bucket = y.bucket AND x.vec_id < y.vec_id)"""

# The CASE width guard is the oracle twin of Spark's zip_with semantics on
# a MIXED-WIDTH candidate pair: zip_with pads the shorter vector with NULL
# -> NULL cosine -> filtered, while DuckDB's list_dot_product ERRORS on
# unequal lengths ("list dimensions must be equal") — and a WHERE-clause
# len() predicate does not guarantee short-circuit, only CASE does.
# Identical values on uniform-width corpora (round 8, with the mixed-width
# keeper fix).
_SQL_EMB_SELECT = """
SELECT vec_a, vec_b, cosine FROM (
  SELECT c.vec_a, c.vec_b,
         CASE WHEN len(a.v) = len(b.v)
              THEN list_dot_product(a.v, b.v) / (a.nm * b.nm) END AS cosine
  FROM cand c JOIN n a ON c.vec_a = a.vec_id JOIN n b ON c.vec_b = b.vec_id) s
WHERE cosine >= 0.45
"""


@register(
    "dedup_embedding_lsh_pairs",
    oracle=f"WITH {_SQL_EMB_CTES} {_SQL_EMB_SELECT}",
    doc="Embedding near-dup pairs via TIERED compound cross-polytope LSH — "
    "the scale path that replaces the O(n^2) brute-force variant. Each "
    "vector's signature is its top-L signed dimensions by |coordinate| "
    "(deterministic, data-independent — no trained centroids); a bucket is "
    "a sorted ARITY-tuple of signature dims, and the arity GROWS with the "
    "corpus (SIG_TIERS): pairs below 1024 vectors, triples-over-top-12 "
    "plus anchor-pairs-over-top-6 to ~200k, then a GENERATIVE ladder — "
    "arity a = 5..8 over top-16 plus anchor (a-1)-tuples.  Rung bounds "
    "are EMPIRICAL (round 7, executed sweep at n=21.5k with planted "
    "near-dups): a pair collides iff signatures share >= arity dims, so "
    "the collision ratio T(arity) is an n-INVARIANT measured constant "
    "(0.0225 at a5 down to 5.5e-5 at a8) and each rung admits a corpus "
    "only while T*n <= 10k verification candidates per doc — linear "
    "total work by admission, ladder top at ~1.8e8 vectors (beyond it "
    "_lsh_tier raises and points at the kmeans-bounded path, which is "
    "O(n) by construction). "
    "Per-vector bucket rows stay bounded (C(16, arity) <= 12870), and a "
    "per-bucket overflow guard raise_errors on > 8192 members — skew "
    "cannot silently square. Measured recall on planted pairs: a5 "
    "0.998/1.0/1.0 at cosine 0.7/0.8/0.9, a8 0.63/0.91/0.99 — the high "
    "rungs serve the SemDeDup operating regime (cosine >= 0.8). "
    "Candidate pairs come from an EQUI-join on "
    "bucket over (vec_id, bucket) IDS ONLY (never cartesian, plan-gated), "
    "duplicates collapse BEFORE verification, then vectors join back "
    "(broadcast here; co-partitioned at cluster scale) for one exact-"
    "cosine check per candidate. At 100 TB: signature + bucket generation "
    "is per-vector bounded state and runs as ONE shuffle-free Arrow "
    "mapInPandas (a narrow map, computable at write time); the only "
    "shuffles are the bucket join and verification. Recall >= 0.85 AND "
    "candidates <= 0.05*n^2 are pytest-gated (tests/test_dedup_scale.py).",
)
def dedup_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "embeddings")
    n = _emb_norms(raw)
    cand = _embedding_lsh_candidates(spark, raw, n)
    va = n.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nm").alias("na"))
    vb = n.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nm").alias("nb"))
    return (
        cand.join(F.broadcast(va), "vec_a")
        .join(F.broadcast(vb), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            # try_divide: zero-norm members drop out as NULL >= 0.45 ->
            # false instead of throwing under ANSI (matches DuckDB's
            # NULL-on-zero-division; values identical otherwise)
            F.try_divide(
                _dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.45)
    )


def _emb_norms(raw: DataFrame) -> DataFrame:
    """(vec_id, v double[], nm) — norm once per vector, cosines are one dot."""
    e = raw.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return e.select("vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nm"))


def _bucket_candidates(buckets: DataFrame, overflow_hint: str) -> DataFrame:
    """Distinct (vec_a, vec_b) pairs from a (vec_id, bucket) table, with
    the per-bucket overflow guard (VERDICT r4 #1): a pathologically skewed
    bucket would square into a quadratic candidate set — raise INSIDE the
    executor instead.

    Shape (r16 optimization round, guide §2.3 "aggregate before you
    shuffle"): ONE groupBy(bucket) collects each bucket's sorted member
    list — (vec_id, bucket) rows are unique by construction (a vector
    emits each key at most once), so the list is a distinct-id set — and
    the i<j pairs are generated NARROWLY from the array (posexplode +
    slice), never a join.  The r15 form paid a count-window (sort by
    bucket) plus a merge self-join (two more sorts) over the same
    exchange; this is the same single bucket-keyed exchange with the
    window and join machinery deleted — measured 0.96x on the candidate
    step locally (the win is the deleted sorts/join at scale, plus it
    retires the broadcast-misplanning hazard the old merge hints worked
    around), identical pair sets (tests/exp_r16_bucketcand_ab.py).
    Per-task memory stays bounded: a member list is <= BUCKET_CAP ids
    (the guard raises before pair generation, same semantics as r15),
    and each exploded member row yields <= BUCKET_CAP struct rows —
    nothing materializes the full C(m,2) pair set at once.  Shared by
    the LSH and kmeans candidate paths (identical skew/blow-up
    semantics by construction)."""
    grouped = buckets.groupBy("bucket").agg(
        F.array_sort(F.collect_list("vec_id")).alias("members")
    )
    guarded = grouped.filter(
        F.when(F.size("members") <= BUCKET_CAP, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("bucket overflow (> "),
                    F.lit(str(BUCKET_CAP)),
                    F.lit(" members) in bucket "),
                    F.col("bucket").cast("string"),
                    F.lit(" — " + overflow_hint),
                )
            )
        )
    ).filter(F.size("members") >= 2)
    return (
        guarded.select(
            "members", F.posexplode("members").alias("i", "vec_a")
        )
        .select(
            "vec_a",
            # members is ASC-sorted: the (strictly) later elements are
            # exactly the vec_b > vec_a partners; slice is 1-based, so a
            # 0-based member i's successors start at i + 2
            F.explode(
                F.slice(
                    "members", F.col("i") + F.lit(2), F.size("members")
                )
            ).alias("vec_b"),
        )
        .distinct()  # a pair may collide in several shared buckets
    )


def _embedding_lsh_candidates(
    spark: SparkSession, raw: DataFrame, n: DataFrame
) -> DataFrame:
    """Distinct (vec_a, vec_b) candidate pairs from the tiered bucket join.

    Factored out so tests/test_dedup_scale.py can gate the candidate COUNT
    (<= 0.05*n^2 at sf0.1) independently of the verified result.
    """
    # cheap corpus count (parquet-footer statistics) selects the tier
    arity, sig_dims, anchor = _lsh_tier(raw.count())
    offset = _ANCHOR_OFFSET

    # Signature + bucket generation is PER-VECTOR bounded state (top
    # sig_dims signed dims by |coordinate|, then all sorted k-tuples), so
    # it runs as ONE shuffle-free Arrow pass — the earlier all-JVM form
    # (posexplode + row_number window + (arity-1) self-joins on vec_id +
    # union) paid several exchanges for what is a per-row loop, and
    # measured 1.7-2.3 s vs 0.9-1.0 s for this pass at sf0.1 (identical
    # candidate sets).  The DuckDB oracle keeps the join formulation;
    # both rank by (|val| DESC, pos) — deterministic, engine-independent
    # — and both fold bucket keys in base-128 longs (a signed-dim id is
    # < 128, so an arity-8 key stays < 128^8 ~ 7.2e16 and the 1e17
    # anchor offset clears it; base 1000 would overflow a long at
    # arity 7).
    def buckets_udf(batches):
        from itertools import combinations

        import numpy as np
        import pandas as pd

        # combination index patterns once per task, folded vectorized
        main_idx = np.array(
            list(combinations(range(sig_dims), arity)), dtype=np.int64
        )
        anch_idx = (
            np.array(list(combinations(range(anchor), arity - 1)), dtype=np.int64)
            if anchor
            else None
        )

        def fold(sel: "np.ndarray") -> "np.ndarray":
            # (..., k) int64 tuples -> (...,) base-128 folded keys; works
            # on the per-row (C, k) and the batched (m, C, k) shapes alike
            keys = sel[..., 0].copy()
            for j in range(1, sel.shape[-1]):
                keys = keys * 128 + sel[..., j]
            return keys

        def tuples_of(
            d: "np.ndarray", k: int, width: int, idx: "np.ndarray"
        ) -> "np.ndarray":
            ds = np.sort(d)
            if len(ds) == width:
                return fold(ds[idx])  # full-width: precomputed patterns
            if len(ds) < k:
                return np.array([], dtype=np.int64)
            # short vector (< width coords): enumerate what exists —
            # mirrors the replaced rn<=sig_dims filter and the oracle's
            # self-joins, which emit the fewer valid tuples
            sel = np.array(list(combinations(ds.tolist(), k)), dtype=np.int64)
            return fold(sel)

        # r16 optimization round (guide §4.2 "hand whole batches to
        # vectorized native libraries"): the per-VECTOR Python loop
        # (lexsort + fancy-index + fold per row) was the measured ~0.9 s
        # single largest component of this pass at sf0.1 — dominated by
        # per-row interpreter overhead, not arithmetic.  Rows sharing a
        # width >= sig_dims (the corpus norm: clean_embeddings guarantees
        # a modal width) now go through ONE batched numpy pipeline per
        # width group: a stable argsort on -|A| reproduces
        # lexsort((arange, -abs)) exactly (stable sort keeps position
        # order on |val| ties), and the key fold runs over the whole
        # (rows x C(width, arity) x arity) selection at once.  Row-chunked
        # so the key matrix stays bounded at high-arity rungs.  Short
        # (< sig_dims) vectors keep the exact per-row fallback; NULLs
        # still emit nothing.  Identical (vec_id, bucket) rows by
        # construction (asserted in tests/exp_r16_lsh_sig_ab.py).
        n_keys_per_row = len(main_idx) + (len(anch_idx) if anchor else 0)
        chunk_rows = max(1, (4 << 20) // max(n_keys_per_row, 1))

        for pdf in batches:
            vecs = pdf["v"].to_numpy()
            vids = pdf["vec_id"].to_numpy()
            ids, bks = [], []
            by_len: dict[int, list[int]] = {}
            for i, v in enumerate(vecs):
                if v is None:
                    continue  # NULL embedding: no signature rows, like
                    # the replaced posexplode(NULL) form and the oracle
                by_len.setdefault(len(v), []).append(i)
            for L, idxs in sorted(by_len.items()):
                if L < sig_dims:
                    # short vectors: the exact per-row enumeration path
                    for i in idxs:
                        a = np.asarray(vecs[i], dtype=np.float64)
                        order = np.lexsort((np.arange(len(a)), -np.abs(a)))[
                            :sig_dims
                        ]
                        d = order * 2 + (a[order] < 0)
                        keys = tuples_of(d, arity, sig_dims, main_idx)
                        if anchor:
                            keys = np.concatenate(
                                [
                                    keys,
                                    tuples_of(d[:anchor], arity - 1, anchor, anch_idx)
                                    + offset,
                                ]
                            )
                        if not len(keys):
                            continue
                        ids.append(np.full(len(keys), int(vids[i]), dtype=np.int64))
                        bks.append(keys)
                    continue
                rows = np.asarray(idxs, dtype=np.int64)
                for lo in range(0, len(rows), chunk_rows):
                    sub = rows[lo : lo + chunk_rows]
                    A = np.stack(
                        [np.asarray(vecs[i], dtype=np.float64) for i in sub]
                    )
                    # rank by |val| desc, position asc: stable argsort on
                    # -|val| == lexsort((arange, -abs)) per row
                    order = np.argsort(-np.abs(A), axis=1, kind="stable")[
                        :, :sig_dims
                    ]
                    signs = np.take_along_axis(A, order, axis=1) < 0
                    d2 = order * 2 + signs  # signed-dim ids, rank order
                    keys = fold(np.sort(d2, axis=1)[:, main_idx])  # (m, C1)
                    if anchor:
                        akeys = (
                            fold(np.sort(d2[:, :anchor], axis=1)[:, anch_idx])
                            + offset
                        )
                        keys = np.concatenate([keys, akeys], axis=1)
                    m, nk = keys.shape
                    ids.append(
                        np.repeat(vids[sub].astype(np.int64), nk)
                    )
                    bks.append(keys.reshape(-1))
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(ids) if ids else np.array([], dtype=np.int64),
                    "bucket": np.concatenate(bks) if bks else np.array([], dtype=np.int64),
                }
            )

    buckets = n.select("vec_id", "v").mapInPandas(
        buckets_udf, "vec_id bigint, bucket bigint"
    )
    # candidate generation over ids only: narrow shuffle, dedup pre-verify
    return _bucket_candidates(
        buckets, "skewed signatures; raise the tier or cap"
    )


# --- KMeans-bounded near-dup candidates (the 1e8+ scale path) ---------------
# Above the LSH ladder's measured top (~1.8e8 vectors) subset-enumeration
# LSH cannot hold both recall and a bounded candidate budget; this is the
# SemDeDup-style alternative (Abbas et al. 2023 cluster their corpus with
# k-means and only compare WITHIN clusters): candidates = sum_b C(m_b, 2)
# ~ p^2 * n^2 / (2k), so choosing k ~ n / KMEANS_BUCKET_TARGET makes the
# candidate count O(n) BY CONSTRUCTION — no collision-tail luck involved.
# Recall is the measured quantity instead (planted-pair run in
# PERFORMANCE.md + the registered self-check below).
KMEANS_BUCKET_TARGET = 64  # target mean bucket size n/k
# Floor on k.  256 (r11, was 128): the r11 margin sweep on the driver
# corpora (tests/exp_kmeans_margin_sweep.py, 5 MLlib seeds each) measured
# the old k=128/p=3 floor at sf0.1 recall 0.62-0.71 — UNDER the 0.7
# self-check gate on 4 of 5 seeds (only the shipped seed 42 scraped by at
# 0.708, the knife edge VERDICT r10 flagged).  k=256/p=5 measures
# 0.79-0.90 (min margin +0.09 over the gate) at candidate ratio
# 0.046 <= 0.05, and 1.0 recall / ratio 0.044 at sf0.01.  The floor keeps
# ratio p^2/(2k) = 25/512 = 0.049 <= 0.05 on tiny corpora.
KMEANS_MIN_K = 256
# Below this corpus size the subquadratic self-check reports TRUE without
# measuring: k clamps toward n, buckets hold ~1 member, and even an
# all-pairs list is trivially cheap — the ratio is definitionally
# quadratic-looking on toy corpora.  Kept at the pre-r11 value (2x the
# old MIN_K) so the driver's sf0.01 corpus (n=500) still runs the REAL
# measured check rather than the escape.
KMEANS_SUBQ_TRIVIAL_N = 256


# Boundary of the wide probe tier (below: p=5, at/above: p=8 — the only
# tier edge since r11 merged the old p=3 bottom tier into p=5).  The 1e6
# rehearsal (PERFORMANCE.md, r9) measured k=15,781/p=5 losing the 0.7
# recall grade (0.530) where p=8 holds it (0.719 at ratio 0.0020 — 25x
# under the 0.05 gate), while k=804/p=5 holds 0.952@0.8 on the planted
# 51.5k corpus; the boundary sits between those measured points (geometric
# mean ~3.6k, rounded to the local-fit threshold so both "large-k" paths
# engage together).  Ratio stays bounded at the boundary: p^2/(2k) =
# 64/8192 = 0.0078 at k=4096.
KMEANS_NPROBE_WIDE_K = 4096


def _kmeans_nprobe(k: int) -> int:
    """Adaptive probe count: finer partitions (big k) split near-dup
    pairs across more Voronoi cells, so recall needs more probes — and
    big k also AFFORDS them, since ratio = p^2/(2k).  Measured tiers:
      * k < 4096 — p=5 (r11; was a p=3 tier below k=512): the r11 margin
        sweep (tests/exp_kmeans_margin_sweep.py) showed k=128/p=3 UNDER
        the 0.7 recall gate on 4 of 5 seeds at sf0.1 (0.62-0.71); the
        KMEANS_MIN_K=256 floor makes p=5 affordable at every rule-sized
        k (25/512 = 0.049 <= the 0.05 gate) and measures 0.79-0.90
        there.  k=804/p=5 holds 0.952@0.8 at ratio 0.0152 (planted 51.5k
        corpus, tests/exp_lsh_generative_rung.py --kmeans; p=3 lost that
        grade to 0.840).  Callers passing an explicit k < 256 must size
        nprobe themselves — p=5 below k=250 exceeds the ratio gate.
      * k >= 4096 — p=8: the 1e6/k=15.8k execution measured recall@0.7
        0.530 at p=5 vs 0.719 at p=8 (0.915@0.8, 2.6x the candidates,
        ratio 0.0020 — 25x under the gate).  r10 default; was p=5.
    Candidate-budget interaction: the budget-regime k formula in
    _kmeans_k sizes k with the SAME p this function returns for that
    regime (budget k >= 65536 >= KMEANS_NPROBE_WIDE_K, so p=8 there) —
    the two must stay consistent or per-doc candidates overshoot the
    10k budget by (8/5)^2."""
    if k < KMEANS_NPROBE_WIDE_K:
        return 5
    return 8


# The fit cost is the one step that is not trivially O(n): Lloyd
# iterations cost fit_rows * k distance evaluations.  Two-regime k rule
# (pure arithmetic, unit-tested in tests/test_lsh_ladder.py):
#   * fine regime, k = n/64 while k <= 65536 — bucket size stays ~64 and
#     per-doc candidates p^2*n/(2k) ~ 800 are far under budget;
#   * budget regime past n ~ 4.2M: k = max(65536, n * p^2 / (2*budget))
#     — k grows only as fast as the 10k-candidates-per-doc budget
#     requires (n/800 at p=5), keeping assignment (k dots/vector, the
#     dominant linear cost) and fit tractable at 1e8+ vectors.
# The fit itself runs on a deterministic sample of min(n, 20*k) rows —
# centroid QUALITY needs ~tens of points per cluster, not the corpus —
# so fit cost is bounded by 20*k^2 distance evals per iteration.
KMEANS_K_FINE_CAP = 65536
KMEANS_FIT_ROWS_PER_CENTROID = 20
# Past this k the fit uses the local BLAS-3 spherical Lloyd on the
# (already driver-sized) fit sample instead of pyspark.ml KMeans: MLlib's
# k-means|| init collects ~2*k*initSteps weighted candidates and runs
# LocalKMeans on them SINGLE-THREADED on the driver — O(k^2 * d * iters)
# work that dominates everything else by k ~ 10^4 (measured: the 1e6-row
# rehearsal's k=15.8k fit never finished under it).  The local fit is the
# faiss-style production shape anyway: train the quantizer on a bounded
# sample near the driver, assign distributed.
#
# 0 since r15 (the optimization round): the small-k regime now rides the
# local fit too.  History: the threshold sat at 4096 because under the
# r9/r10 sizing rule (k=128, p=3 at the driver corpora) every local init
# measured BELOW the 0.7 candidate-recall gate (0.646-0.681) while
# MLlib's k-means|| scraped by at 0.708 — PERFORMANCE.md round-10
# "measured dead end".  The r11 re-sizing (KMEANS_MIN_K 128 -> 256,
# p 3 -> 5) moved the operating point off that knife edge: re-running
# the committed harness (tests/exp_local_fit_init.py) plus the shipped
# random-init spherical Lloyd at k=256/p=5 over 5 seeds measures recall
# min 0.799 at sf0.1 (0.799/0.806/0.840/0.861/0.847) and >= 0.929 at
# sf0.001/sf0.01 — the same +0.09 floor margin as MLlib's 0.79-0.90
# (exp_kmeans_margin_sweep).  What the swap buys, measured at sf0.1
# (k=256, n=2000, same JVM, interleaved): pyspark.ml fit ~2.5 s of
# distributed kmeans|| init + 20 Lloyd jobs vs ~0.15 s local BLAS — the
# single biggest fixed cost in dedup_embedding_kmeans_pairs, and at
# cluster scale ~25 fewer scheduler round-trips per fit.  The registered
# query's OUTPUT (n_docs, subquadratic_ok, recall_ok) is unchanged: both
# gates hold with margin (re-verified at all three SFs + the planted-
# corpus pytest gates).
KMEANS_LOCAL_FIT_K_THRESHOLD = 0
# If the fit SAMPLE has fewer than k non-degenerate (non-zero-norm) rows
# the spherical fit raises; up to this k the old pyspark.ml Euclidean fit
# (which tolerates zero-norm rows) is an affordable fallback — past it,
# fail loudly (MLlib's driver-bound init is the measured non-starter).
KMEANS_MLLIB_FALLBACK_MAX_K = 4096
KMEANS_LOCAL_FIT_ITERS = 10
# Ceiling on the brute-force recall DENOMINATOR inside the registered
# kmeans self-check (dedup_embedding_kmeans_pairs): above this many
# vectors the ground-truth pair list is computed on a deterministic
# md5-keyed subsample of exactly this size, bounding the self-check's
# own cost at ~CEILING^2/2 dot products regardless of corpus size.
# 1000 keeps the driver's sf0.01 corpus (500 vectors) EXACT and leaves
# ~O(100) sampled true pairs at sf0.1 — ample power for the 0.7 recall
# boolean given the path's ~1.0 measured recall (PERFORMANCE.md).
BRUTE_CHECK_CEILING = 1000


def _kmeans_k(n: int) -> int:
    fine = max(KMEANS_MIN_K, n // KMEANS_BUCKET_TARGET)
    if fine <= KMEANS_K_FINE_CAP:
        return fine
    # budget regime k is always >= KMEANS_K_FINE_CAP >= the p=8 tier, so
    # size k with the SAME probe count the assign kernel will default to
    # (keeps per-doc candidates p^2*n/(2k) exactly at the budget; p=8
    # grows k 2.56x faster than the old p=5 sizing — fit stays bounded
    # at 20*k rows, assignment stays k dots/vector)
    p = _kmeans_nprobe(KMEANS_K_FINE_CAP)
    return max(KMEANS_K_FINE_CAP, n * p * p // (2 * _CAND_PER_DOC_BUDGET))


def _fit_centroids_spherical(X, k: int, seed: int, iters: int = KMEANS_LOCAL_FIT_ITERS):
    """Local spherical k-means (cosine Lloyd) for the large-k fit regime.

    ``X`` is the (m x d) fit sample; rows are L2-normalized so Euclidean
    Lloyd == cosine Lloyd — matching the cosine the assign kernel and the
    verify filter use (the pyspark.ml small-k path fits unnormalized
    Euclidean, which agrees in ordering only approximately; for bucketing
    both work, but the large-k path might as well be exactly spherical).
    Assignment is chunked (rows x d) @ (d x k) BLAS-3 in float32 — the
    whole point vs MLlib's per-pair distance loop and single-threaded
    k-means|| LocalKMeans init.  Deterministic: seeded init (k distinct
    sample rows), fixed iteration count, argmax ties -> lowest centroid
    id (numpy argmax contract); empty clusters reseed from a seeded
    permutation.  Returns a (k x d) float64 list-of-lists for the assign
    kernel's closure."""
    import numpy as np

    X = np.ascontiguousarray(X, dtype=np.float32)
    norms = np.linalg.norm(X, axis=1)
    # zero-norm rows have no direction: they would argmax to centroid 0
    # every iteration (all-zero scores -> first index) and a seeded init
    # or reseed could pick one as a permanently-dead centroid — drop them
    # from the fit sample, matching the assign kernel and build_ivf_index
    nz_rows = norms > 0
    X = X[nz_rows] / norms[nz_rows][:, None]
    m, d = X.shape
    if m < k:
        raise ValueError(
            f"spherical fit needs >= k non-degenerate sample rows (k={k}, "
            f"sample={m} after dropping zero-norm rows); "
            "KMEANS_FIT_ROWS_PER_CENTROID guarantees 20x — a smaller "
            "sample means the caller sized k off the wrong count"
        )
    rng = np.random.default_rng(seed)
    C = X[rng.choice(m, size=k, replace=False)].copy()
    chunk = max(1, (64 << 20) // (4 * k))  # ~64 MB of f32 scores per block
    assign = np.empty(m, dtype=np.int64)
    for _ in range(iters):
        for lo in range(0, m, chunk):
            hi = min(lo + chunk, m)
            assign[lo:hi] = np.argmax(X[lo:hi] @ C.T, axis=1)
        counts = np.bincount(assign, minlength=k)
        C_new = np.zeros((k, d), dtype=np.float64)
        for j in range(d):
            C_new[:, j] = np.bincount(assign, weights=X[:, j], minlength=k)
        nz = counts > 0
        C_new[nz] /= counts[nz, None]
        cn = np.linalg.norm(C_new, axis=1)
        ok = nz & (cn > 0)
        C_new[ok] /= cn[ok, None]
        if not ok.all():
            # reseed dead centroids from a seeded permutation of the sample
            C_new[~ok] = X[rng.permutation(m)[: int((~ok).sum())]]
        C = C_new.astype(np.float32)
    return [[float(x) for x in row] for row in C]


# Hard ceiling on the kmeans fit-sample COLLECT's bytes (r16, VERDICT
# r15 #2 "what's wrong"): the local-fit sample is driver-sized by
# construction (20*k rows x d floats), but "by construction" is an
# argument, not a guard — a mis-sized k (or a composer feeding an
# unexpectedly wide embedding column) must fail FAST with the sizing in
# the message, not OOM the driver mid-collect.  2 GiB covers the
# budget-regime ~1.3 GB sample the r15 notes sized, with headroom.
# Same fail-loud pattern as BRUTE_CHECK_CEILING / BLOOM_MAX_FILTER_BYTES.
KMEANS_FIT_SAMPLE_MAX_BYTES = 2 * 1024**3


def _kmeans_fit_centers(
    spark: SparkSession,
    clean: DataFrame,
    k: int,
    n: int,
    seed: int,
    dim: int = 0,
) -> list:
    """Fit centroids for the kmeans-bounded candidate path on a
    deterministic bounded sample (KMEANS_FIT_ROWS_PER_CENTROID rows per
    centroid — centroid QUALITY needs ~tens of points per cluster, not
    the corpus, so fit cost is independent of corpus size).  Every k
    regime now uses the local BLAS-3 spherical Lloyd above (r15 opt
    round, guide §1.2 step 1): the sample is collected (driver-sized by
    construction: 20*k rows * d floats, ~160 MB at the 1e6-corpus
    k=15.8k, ~1.3 GB at the budget-regime 1e8 corpus) and fit locally —
    the faiss shape: train the quantizer locally, assign distributed.
    Fallback: a sample with fewer than k non-degenerate (non-zero-norm)
    rows — only reachable on zero-norm-heavy corpora — retains the old
    pyspark.ml Euclidean fit, which tolerates them, for k small enough
    that MLlib's single-threaded O(k^2 d) k-means|| reduction is sane."""
    fit_rows = KMEANS_FIT_ROWS_PER_CENTROID * k
    # explicit driver-memory guard BEFORE any job runs (dim: the modal
    # embedding width the caller already computed via clean_embeddings;
    # 4 bytes/coord — the sample is collected as float32 — and the 1.05
    # sampling margin): loud error with the sizing, never a driver OOM
    est_bytes = int(min(fit_rows, n) * max(dim, 0) * 4 * 1.05)
    if est_bytes > KMEANS_FIT_SAMPLE_MAX_BYTES:
        raise ValueError(
            f"kmeans fit sample would collect ~{est_bytes / 1e9:.1f} GB "
            f"({min(fit_rows, n)} rows x {dim} dims) on the driver, over "
            f"the {KMEANS_FIT_SAMPLE_MAX_BYTES / 1e9:.1f} GB "
            "KMEANS_FIT_SAMPLE_MAX_BYTES budget — k is mis-sized for "
            "this corpus (or the embedding width is unexpected); lower "
            "k / KMEANS_FIT_ROWS_PER_CENTROID, or raise the ceiling if "
            "the driver genuinely has the memory"
        )
    fit_df = clean
    if n > fit_rows:
        fit_df = clean.sample(fraction=min(1.0, 1.05 * fit_rows / n), seed=seed)
    if k <= KMEANS_LOCAL_FIT_K_THRESHOLD:
        from thesis_iceberg_spark.operators.ann import build_ivf_index

        _, model = build_ivf_index(spark, fit_df, k=k, seed=seed)
        return [[float(x) for x in c] for c in model.clusterCenters()]
    import numpy as np

    # Collect the sample as ONE Arrow table and view the list column's
    # flat values buffer directly: toPandas() materialized a Python list
    # object per row (+ np.stack's second copy), several times the raw
    # sample bytes at budget-regime k — peak driver memory now tracks the
    # ~20*k*d*4 B sample itself (ADVICE r9)
    tbl = fit_df.select(
        F.transform("embedding", lambda x: x.cast("float")).alias("v")
    ).toArrow()
    col = tbl.column("v").combine_chunks()
    widths = np.diff(col.offsets.to_numpy(zero_copy_only=False))
    d = int(widths[0]) if len(widths) else 0
    if len(widths) and not (widths == d).all():
        # clean_embeddings guarantees modal-width rows; a ragged sample
        # means the caller bypassed it
        raise ValueError("fit sample has ragged vector widths")
    X = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32, copy=False)
    X = X.reshape(-1, d) if d else X.reshape(0, 0)
    try:
        return _fit_centroids_spherical(X, k=k, seed=seed)
    except ValueError:
        if k > KMEANS_MLLIB_FALLBACK_MAX_K:
            # past this k MLlib's init is the measured non-starter (the
            # 1e6 rehearsal's k=15.8k fit never finished under it) — the
            # loud spherical-fit error is the right outcome
            raise
        # fewer than k non-degenerate sample rows (zero-norm-heavy
        # corpus): the Euclidean pyspark.ml fit tolerates zero-norm rows
        # and is affordable at this k — preserve the old behavior there
        from thesis_iceberg_spark.operators.ann import build_ivf_index

        _, model = build_ivf_index(spark, fit_df, k=k, seed=seed)
        return [[float(x) for x in c] for c in model.clusterCenters()]


def dedup_embedding_kmeans_candidates(
    spark: SparkSession,
    raw: DataFrame,
    k: int | None = None,
    nprobe: int | None = None,
    seed: int = 42,
    n: int | None = None,
) -> DataFrame:
    """Distinct (vec_a, vec_b) near-dup candidates from seeded-KMeans
    buckets with multi-probe assignment.

    Shape: one seeded KMeans fit on a bounded sample (pyspark.ml below
    KMEANS_LOCAL_FIT_K_THRESHOLD, BLAS-3 local spherical Lloyd above it —
    at 100 TB: fit on a sample, assign at write time), then assignment
    as ONE shuffle-free Arrow
    mapInPandas — the centroid matrix rides the closure (k x d doubles;
    ~0.5 MB at k=1000, d=64 — broadcast territory well past 1e5
    centroids) and each batch is a single vectorized matmul emitting
    nprobe (vec_id, cid) rows per vector.  Candidates come from the same
    merge-hinted bucket equi-join + overflow guard as the LSH path.
    Deterministic: seeded fit + ties broken by centroid id."""
    from thesis_iceberg_spark.operators.ann import clean_embeddings

    # fit and size k off the CLEAN corpus (non-null, modal-width rows):
    # raw counts inflated by degenerate rows would oversize k past the
    # fit input, and a ragged row surfacing first in a sample must not
    # redefine the corpus width (review findings, round 7)
    clean, _dim, n_clean = clean_embeddings(raw)
    if n is None:
        n = n_clean
    n = min(n, n_clean) if n_clean else 0
    if n < 2:
        # no pairs possible; KMeans.fit on 0-1 rows would throw — return
        # the typed empty candidate frame instead
        return spark.createDataFrame([], "vec_a BIGINT, vec_b BIGINT")
    if k is None:
        k = _kmeans_k(n)
    k = min(k, n)  # KMeans needs k <= clean points
    if nprobe is None:
        nprobe = _kmeans_nprobe(k)
    centers = _kmeans_fit_centers(spark, clean, k=k, n=n, seed=seed, dim=_dim)

    assign_udf = _kmeans_assign_kernel(centers, nprobe)

    e = _emb_norms(raw)
    assigned = e.select("vec_id", "v").mapInPandas(
        assign_udf, "vec_id bigint, bucket bigint"
    )
    # same skew insurance + merge-hinted equi-join as the LSH path
    # (kmeans CAN collapse clusters on degenerate data)
    return _bucket_candidates(
        assigned, "raise k or lower KMEANS_BUCKET_TARGET"
    )


def _kmeans_assign_kernel(centers, nprobe: int):
    """mapInPandas kernel: nearest-``nprobe`` centroid assignment by cosine.

    Module-level factory (not a closure) so the pytest equivalence suite
    (tests/test_kmeans_assign.py) can drive it directly on crafted pandas
    batches — ragged/NULL/zero-norm rows, exact cosine ties — against a
    per-vector reference loop.  Deterministic contract: top-nprobe by
    (-cosine, centroid_id); NULL / wrong-width / zero-norm vectors emit no
    rows (build_ivf_index excluded them from the fit too)."""

    def assign_udf(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(centers, dtype=np.float64)  # k x d
        k_, d_ = C.shape
        cn = np.linalg.norm(C, axis=1)
        cn[cn == 0] = 1.0
        # Pre-normalize ONCE and score in float32 (the faiss convention):
        # cosine becomes a single SGEMM over unit rows instead of three
        # rows-x-k passes (f64 matmul write + materialized norm outer
        # product + divide).  The 1e6 rehearsal measured assignment as
        # memory-bandwidth-bound at k*8 B/row of scores (PERFORMANCE.md);
        # this is the standard fix: half the bytes, one pass.  Ordering
        # agrees with the f64 reference loop except on ~1e-7 relative
        # near-ties, which bucketing tolerates by construction (recall is
        # gated at cosine 0.45+, and EXACT ties — collapsed duplicate
        # centroids — are exactly representable in f32, so the
        # deterministic (-cos, cid) tie-break is unaffected).
        Cn64 = C / cn[:, None]  # unit centroids, f64 — boundary re-score
        CnT = np.ascontiguousarray(Cn64.T, dtype=np.float32)
        p = min(nprobe, k_)
        # Rows whose f32 top-p BOUNDARY gap (p-th selected score minus the
        # best unselected score) is below this get ONE f64 re-score, so
        # bucket choice is host-independent: a sub-resolution f32 near-tie
        # would otherwise resolve by BLAS-build-dependent rounding (ADVICE
        # r9).  The threshold must dominate f32 SGEMM ACCUMULATION error,
        # not just input rounding — a d-term dot product's worst-case
        # error is ~d*eps32 of the |summand| scale (review r10; unit rows
        # keep summands <= 1/sqrt(d) each but the conservative linear
        # bound is cheap) — so it scales with d: 7.6e-6 at d=64, 1.2e-4
        # at d=1024; re-scored rows stay a vanishing fraction.  Exact f64
        # ties remain and break deterministically by lowest centroid id
        # (argmax contract).
        BOUNDARY_GAP = max(1e-6, d_ * float(np.finfo(np.float32).eps))
        for pdf in batches:
            vecs = pdf["v"].to_numpy()
            # NULL or wrong-width vectors get no bucket (build_ivf_index
            # excluded them from the fit too)
            valid = np.fromiter(
                (v is not None and len(v) == d_ for v in vecs),
                dtype=bool,
                count=len(vecs),
            )
            if not valid.any():
                yield pd.DataFrame(
                    {
                        "vec_id": np.array([], dtype=np.int64),
                        "bucket": np.array([], dtype=np.int64),
                    }
                )
                continue
            A = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[valid]])
            ids = pdf["vec_id"].to_numpy()[valid].astype(np.int64)
            na = np.linalg.norm(A, axis=1)
            nz = na > 0  # zero vector: cosine undefined, never a dup
            A, ids, na = A[nz], ids[nz], na[nz]
            if not ids.size:
                yield pd.DataFrame(
                    {
                        "vec_id": np.array([], dtype=np.int64),
                        "bucket": np.array([], dtype=np.int64),
                    }
                )
                continue
            # ONE (rows x d) @ (d x k) product for the whole batch — the
            # per-vector Python matvec loop this replaced dominated
            # assignment wall at budget-regime k (VERDICT r8 #2); norms
            # stay f64 so the zero-norm mask is bit-identical to the
            # reference loop, then the unit rows drop to f32 for the GEMM
            cos = (A / na[:, None]).astype(np.float32) @ CnT
            rows = cos.shape[0]
            # top-p by (-cos, cid) as p successive argmax+mask passes:
            # argmax returns the FIRST maximal index, which IS the
            # lowest-centroid-id tie-break, so ordering and boundary ties
            # are deterministic by construction — no argpartition (whose
            # per-row introselect measured 5x the SGEMM at k=15.8k) and
            # no tie-fallback path.  p SIMD reduction passes over the
            # scores; cos is masked in place (it is not read afterwards).
            top = np.empty((rows, p), dtype=np.int64)
            ridx = np.arange(rows)
            val_p = None
            for j in range(p):
                idx = np.argmax(cos, axis=1)
                top[:, j] = idx
                val_p = cos[ridx, idx]
                cos[ridx, idx] = -np.inf
            if p < k_:
                # f64 re-score of boundary rows (see BOUNDARY_GAP above):
                # the best UNselected score is now cos.max (selected are
                # -inf); a sub-gap row's p-th pick is f32-rounding-dependent
                runner = cos.max(axis=1)
                near = np.flatnonzero(val_p - runner < BOUNDARY_GAP)
                if near.size:
                    cos64 = (A[near] / na[near][:, None]) @ Cn64.T
                    nridx = np.arange(len(near))
                    for j in range(p):
                        idx = np.argmax(cos64, axis=1)
                        top[near, j] = idx
                        cos64[nridx, idx] = -np.inf
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, p),
                    "bucket": top.reshape(-1).astype(np.int64),
                }
            )

    return assign_udf


@register(
    "dedup_embedding_kmeans_pairs",
    oracle="""
SELECT count(*) AS n_docs, TRUE AS subquadratic_ok, TRUE AS recall_ok
FROM embeddings
""",
    doc="SELF-CHECK for the KMeans-bounded near-dup path (the 1e8+ scale "
    "path; SemDeDup's own clustering strategy, Abbas et al. 2023): the "
    "candidate list is model-driven (learned centroids), so like "
    "ann_ivf_kmeans_topk the oracle-able form computes its own quality "
    "gates IN SPARK against the exact brute-force pair list and returns "
    "(n_docs, subquadratic_ok = candidates <= 0.05*n^2, recall_ok = "
    "verified-pair recall >= 0.7 vs brute force at cosine >= 0.45; past "
    "BRUTE_CHECK_CEILING vectors the brute denominator runs on a "
    "deterministic md5-keyed subsample so the CHECK itself stays O(n), "
    "r9).  "
    "Seeded KMeans + deterministic tie-breaks make the booleans stable; "
    "the raw pair list is exercised with measured ratio/recall on a "
    "planted 50k corpus in PERFORMANCE.md and gated in "
    "tests/test_lsh_ladder.py.  Candidates ~ p^2*n^2/(2k) with the "
    "two-regime k rule (_kmeans_k): O(n) by construction.",
)
def dedup_embedding_kmeans_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "embeddings")
    n = raw.count()
    nrm = _emb_norms(raw)
    # the candidate lineage (assignment matmul + bucket window + self-join
    # + distinct) feeds BOTH counts below — checkpoint it once instead of
    # recomputing per action; n only CLAMPS the helper's sizing (it still
    # computes its own clean count for the fit input)
    cand = dedup_embedding_kmeans_candidates(spark, raw, n=n).localCheckpoint(
        eager=True
    )
    va = nrm.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nm").alias("na")
    )
    vb = nrm.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nm").alias("nb")
    )
    verified = (
        cand.join(F.broadcast(va), "vec_a")
        .join(F.broadcast(vb), "vec_b")
        # try_divide: a zero-norm vector must drop out as NULL >= 0.45 ->
        # filtered, not throw DIVIDE_BY_ZERO under ANSI (Spark 4 default)
        .filter(
            F.try_divide(
                _dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
            )
            >= 0.45
        )
        .select("vec_a", "vec_b")
    )
    # The recall denominator is brute-force BY DESIGN (it is the ground
    # truth) but must never be the query's own O(n^2) bottleneck (VERDICT
    # r6-r8): past BRUTE_CHECK_CEILING vectors it runs on a DETERMINISTIC
    # md5-keyed subsample — recall over pairs-within-the-sample is an
    # unbiased estimate of pair recall (each true pair survives with the
    # same probability), and the kmeans path's measured recall (~1.0 on
    # planted pairs, PERFORMANCE.md) clears the 0.7 gate with margin at
    # any sample this size.  TakeOrdered top-k by md5: O(n) scan, no full
    # sort, stable across engines/runs.  Below the ceiling (e.g. the
    # driver's sf0.01, 500 vectors) the check is EXACT and bit-identical
    # to the pre-r9 form.  brute feeds TWO counts (denominator + recall
    # join): checkpoint the nested-loop join once, mirroring cand above.
    e = raw.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    if n > BRUTE_CHECK_CEILING:
        sample_ids = (
            e.select("vec_id")
            .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(BRUTE_CHECK_CEILING)
        )
        e = e.join(F.broadcast(sample_ids), "vec_id")
    # r15 (optimization round): the bounded (<= BRUTE_CHECK_CEILING rows)
    # ground-truth pair list is ONE Arrow collect + a dense driver-side
    # GEMM (_np_brute_pairs) instead of a 500k-fold nested-loop join +
    # checkpoint + two more jobs — same exclusion semantics, counts-only
    # consumer, ~1 s -> ~ms at sf0.1 (interleaved A/B in
    # tests/exp_r15_kmeans_fit_ab.py covers the whole query).
    brute_pairs = _np_brute_pairs(e.select("vec_id", "v").toArrow())
    n_cand = cand.count()
    n_brute = len(brute_pairs)
    if brute_pairs:
        bdf = spark.createDataFrame(brute_pairs, "vec_a BIGINT, vec_b BIGINT")
        n_hit = verified.join(F.broadcast(bdf), ["vec_a", "vec_b"]).count()
    else:
        n_hit = 0
    recall_ok = (n_brute == 0) or (n_hit / n_brute >= 0.7)
    # the ratio gate exists for SCALE: below KMEANS_SUBQ_TRIVIAL_N docs even an
    # all-pairs list is trivially cheap and k clamps to n, so the ratio
    # is definitionally quadratic-looking — report TRUE (matching the
    # static oracle) instead of a spurious red on toy corpora
    subq_ok = n <= KMEANS_SUBQ_TRIVIAL_N or n_cand <= 0.05 * n * n
    return spark.createDataFrame(
        [(n, bool(subq_ok), bool(recall_ok))],
        "n_docs BIGINT, subquadratic_ok BOOLEAN, recall_ok BOOLEAN",
    )


@register(
    "dedup_cluster_canonical",
    oracle=f"""
WITH RECURSIVE {_SQL_MINHASH_CTES},
pairs AS MATERIALIZED ({_SQL_MINHASH_SELECT}),
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS node FROM edges),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, w.label FROM walk w JOIN edges e ON w.node = e.a)
SELECT node AS doc_id, MIN(label) AS canonical_doc_id
FROM walk GROUP BY node
""",
    doc="Near-dup CLUSTER resolution: the MinHash-LSH pair list is only "
    "half of dedup — keeping one doc per duplicate GROUP needs the "
    "transitive closure. Connected components via ALTERNATING large-star/"
    "small-star rounds (Kiveris et al., 'Connected Components in "
    "MapReduce and Beyond' — public paper), all as DataFrame groupBy/"
    "joins: each round is two keyed O(edges) shuffles, and the edge set "
    "contracts toward a star per component in O(log n) rounds even on "
    "CHAIN-shaped components, where plain min-label propagation needs "
    "diameter rounds (pytest-proven on a 64-node chain under a 12-round "
    "budget, tests/test_connected_components.py). Raises loudly on "
    "non-convergence. Output: every clustered doc with its canonical "
    "(minimum) doc_id. Oracle: DuckDB recursive CTE over the same pair "
    "list — algorithm-agnostic.",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return connected_components(pairs.toDF("a", "b")).select(
        F.col("node").alias("doc_id"), F.col("label").alias("canonical_doc_id")
    )


@register(
    "dedup_embedding_cluster_canonical",
    oracle=f"""
WITH RECURSIVE {_SQL_EMB_CTES.replace("cand AS (", "cand AS MATERIALIZED (")},
pairs AS MATERIALIZED ({_SQL_EMB_SELECT}),
edges AS MATERIALIZED (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION ALL
  SELECT vec_b, vec_a FROM pairs),
nodes AS (SELECT DISTINCT a AS node FROM edges),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.b, w.label FROM walk w JOIN edges e ON w.node = e.a)
SELECT node AS vec_id, MIN(label) AS canonical_vec_id
FROM walk GROUP BY node
""",
    doc="SemDeDup-style SEMANTIC cluster resolution (Abbas et al. 2023, "
    "'SemDeDup: Data-efficient learning at web-scale through semantic "
    "deduplication' — public paper): group embedding-space near-dups "
    "(cosine >= 0.45 via the tiered LSH pair list) into clusters by "
    "connected components and keep the minimum vec_id as each cluster's "
    "canonical — the embedding twin of dedup_cluster_canonical's "
    "MinHash/Jaccard clusters, catching paraphrases and translations "
    "that share no shingles. KEEPER DEVIATION from the paper: Abbas et "
    "al. keep the member with LOWEST cosine to the cluster CENTROID "
    "(diversity-preserving); this registered entry keeps min vec_id — a "
    "deterministic integer rule two engines hash-agree on, where the "
    "paper's float argmin can flip across engines on near-ties. The "
    "paper's rule is implemented as semdedup_keepers(keeper="
    "'centroid_far') below, pytest-pinned on crafted clusters. Same "
    "large-star/small-star contraction (O(log n) rounds), same "
    "recursive-CTE oracle shape; at 100 TB the pair list is the LSH "
    "output (sub-quadratic, CI-gated) and each CC round is two keyed "
    "O(edges) shuffles.",
)
def dedup_embedding_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_embedding_lsh_pairs(spark, sf_dir).select("vec_a", "vec_b")
    return connected_components(pairs.toDF("a", "b")).select(
        F.col("node").alias("vec_id"), F.col("label").alias("canonical_vec_id")
    )


# Above this dimensionality the wide centroid aggregate (D avg() columns
# in one groupBy) switches to the exploded form: per-row aggregate state
# is O(D) in the wide plan, and expression-tree size grows with D too.
CENTROID_WIDE_DIM_CEILING = 2048


def _cluster_centroids(members: DataFrame, dim: int, mode: str | None = None) -> DataFrame:
    """(label, c: array<double>) per-cluster centroid, always dim-length.

    mode='wide' (default through D=CENTROID_WIDE_DIM_CEILING): D
    per-dimension avg() aggregates in ONE groupBy(label) — map-side
    combinable, a single keyed shuffle regardless of D, verified by plan
    test at D=1024 (tests/test_semdedup_keeper.py counts exactly one
    Exchange and a partial/final HashAggregate pair).

    mode='explode' (auto past the ceiling): posexplode to (label, pos,
    val) rows, avg per (label, pos), re-assemble by SORTED collect — a
    Dx row blow-up (still map-side-combined, keyed on (label, pos)) for
    bounded per-row aggregate width.  Assembly is O(D log D) per cluster
    (r10; the previous pos->map lookup over sequence(0, dim-1) was
    O(D^2) — Spark map access is a linear scan, the lm_rarity V-ceiling
    lesson): a label's observed positions are always a dense prefix
    0..L-1 (posexplode emits every pos < len(v), and a union of prefixes
    is a prefix), so sort_array over (pos, avg) structs + a NULL pad to
    dim reproduces the wide contract exactly — dim elements, NULL at any
    position no member carries.  Same values up to float summation order
    (equivalence pytest at 1e-12)."""
    if mode is None:
        mode = "wide" if dim <= CENTROID_WIDE_DIM_CEILING else "explode"
    if mode == "wide":
        # F.get, not v[i]: under ANSI (Spark 4 default) ordinal indexing
        # THROWS INVALID_ARRAY_INDEX on a member shorter than dim; get()
        # yields NULL, which avg() ignores — the ragged contract both
        # modes share (pytest-pinned)
        return members.groupBy("label").agg(
            F.array(*[F.avg(F.get(F.col("v"), i)) for i in range(dim)]).alias("c")
        )
    if mode != "explode":
        raise ValueError(f"unknown centroid mode: {mode}")
    ex = members.select("label", F.posexplode("v").alias("pos", "val")).filter(
        F.col("pos") < dim  # wide mode never reads past dim - 1 either
    )
    per_dim = ex.groupBy("label", "pos").agg(F.avg("val").alias("cval"))
    return (
        per_dim.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("s"))
        .select(
            "label",
            # positions are a dense prefix 0..size(s)-1 (see docstring), so
            # the sorted cvals + a NULL tail pad IS the wide contract
            F.concat(
                F.transform("s", lambda e: e["cval"]),
                F.array_repeat(
                    F.lit(None).cast("double"), F.lit(dim) - F.size("s")
                ),
            ).alias("c"),
        )
    )


def semdedup_keepers(
    spark: SparkSession, sf_dir: str, keeper: str = "min_id"
) -> DataFrame:
    """(vec_id, canonical_vec_id) with a selectable per-cluster keeper.

    keeper='min_id' (the registered query's rule): canonical = minimum
    vec_id — deterministic integers, engine-portable.
    keeper='centroid_far' (Abbas et al.'s published rule): canonical = the
    member with the LOWEST cosine similarity to the cluster centroid —
    SemDeDup keeps the least-typical member to preserve diversity.  Ties
    break on vec_id so the result stays deterministic.

    Spark shape for centroid_far: cluster labels come from the same CC
    contraction; centroids are one groupBy(label) with D per-dimension
    avg() aggregates (map-side combinable — ONE shuffle, no posexplode
    row blow-up); each member joins its centroid back on label (clusters
    ≪ corpus, broadcastable at any realistic duplicate rate) and the
    keeper is a struct-min aggregate, again one keyed shuffle.

    ORACLE PARITY (since r7): centroid_far is registered as
    dedup_semdedup_centroid_far with a DuckDB value oracle below — the
    Spark tie-break (struct-min on (cos_c, vec_id)), the +inf sentinel
    for NULL cosines (DuckDB mirrors it as 1e308), and the centroid
    arithmetic must stay in sync with that oracle; the measured keeper
    margin (~1.6e-9 >> ~1e-14 engine noise, floor-asserted in
    tests/test_semdedup_keeper.py) is what makes the float argmin safe
    to value-oracle."""
    if keeper not in ("min_id", "centroid_far"):
        raise ValueError(f"unknown semdedup keeper: {keeper}")
    pairs = dedup_embedding_lsh_pairs(spark, sf_dir).select("vec_a", "vec_b")
    labels = connected_components(pairs.toDF("a", "b")).select(
        F.col("node").alias("vec_id"), F.col("label")
    )
    if keeper == "min_id":
        return labels.select("vec_id", F.col("label").alias("canonical_vec_id"))
    emb = _emb_norms(load_table(spark, sf_dir, "embeddings"))
    # (vec_id, label, v, nm), staged ONCE (r15 optimization round, guide
    # §2.4/§1.2): members feeds FOUR consumers (the width probe below,
    # the per-cluster width aggregate, the centroid aggregate, and the
    # member-cosine join) — uncheckpointed, the final plan re-ran the
    # corpus scan + label join once PER BRANCH (three embeddings scans
    # in plans/r15/dedup_semdedup_centroid_far_before.txt, plus the
    # probe action's).  Clustered members are << corpus at any
    # realistic duplicate rate, so the staged frame is small; after the
    # checkpoint the corpus is scanned exactly once
    # (..._after.txt: zero parquet scans in the final plan).
    members = labels.join(emb, "vec_id").localCheckpoint(eager=True)
    # Centroid width is PER CLUSTER, not a corpus-global constant (ADVICE
    # r7, medium): two vectors of the same NON-modal width have a
    # perfectly well-defined cosine (zip_with pads nothing when lengths
    # match), can pass the 0.45 pair filter, and form a cluster of their
    # own.  A corpus-modal dim would give that cluster a centroid with
    # NULLs at every position past the members' width, turning _dot(c,c)
    # and all cos_c NULL -> +inf and silently degrading the paper's
    # keeper to min-id — while the DuckDB oracle (per-position unnest
    # over the members' ACTUAL widths) picks the true centroid-far
    # member.  Mixed widths WITHIN one cluster remain impossible (a
    # length-mismatched cosine is NULL in both engines, failing the pair
    # filter), so slicing the centroid to each cluster's max member width
    # reproduces the oracle exactly.  The static wide expression is built
    # at the max width over MEMBERS — vectors that actually reached a
    # cluster — not the whole corpus (ADVICE r8: a single unclustered
    # ragged outlier would otherwise inflate the wide expression with
    # all-NULL columns, or needlessly flip the corpus past
    # CENTROID_WIDE_DIM_CEILING into explode mode); cheap single-row
    # aggregate, no pair recompute, sliced per label afterwards.
    mx = (
        members.filter(F.col("v").isNotNull())
        .agg(F.max(F.size("v")).alias("d"))
        .first()
    )
    if mx is None or mx["d"] is None:
        # empty embeddings table: no pairs, no clusters — return the
        # (vec_id, canonical_vec_id) shape empty instead of TypeError
        return labels.select(
            "vec_id", F.col("label").alias("canonical_vec_id")
        )
    dim = int(mx["d"])
    centroids = _cluster_centroids(members, dim)
    # per-cluster width: one map-side-combined aggregate on the same key
    # the centroid shuffle already uses; clusters << corpus -> broadcast
    wl = members.groupBy("label").agg(F.max(F.size("v")).alias("w"))
    cn = (
        centroids.join(F.broadcast(wl), "label")
        .select("label", F.slice(F.col("c"), F.lit(1), F.col("w")).alias("c"))
        .select("label", "c", F.sqrt(_dot(F.col("c"), F.col("c"))).alias("cn"))
    )
    cos = (
        members.join(F.broadcast(cn), "label")
        .select(
            "label",
            "vec_id",
            # zero-norm member or zero centroid: under ANSI (Spark 4
            # default) the plain divide THROWS DIVIDE_BY_ZERO; try_divide
            # yields NULL instead, which would then sort FIRST in the
            # struct-min and silently win the keeper slot — coalesce to
            # +inf so degenerate members lose (all-NULL clusters fall back
            # to min vec_id — still deterministic)
            F.coalesce(
                F.try_divide(
                    _dot(F.col("v"), F.col("c")), F.col("nm") * F.col("cn")
                ),
                F.lit(float("inf")),
            ).alias("cos_c"),
        )
    )
    keep = cos.groupBy("label").agg(
        F.min(F.struct("cos_c", "vec_id")).alias("k")
    ).select("label", F.col("k.vec_id").alias("canonical_vec_id"))
    return labels.join(keep, "label").select("vec_id", "canonical_vec_id")


@register(
    "dedup_semdedup_centroid_far",
    oracle=f"""
WITH RECURSIVE {_SQL_EMB_CTES.replace("cand AS (", "cand AS MATERIALIZED (")},
pairs AS MATERIALIZED ({_SQL_EMB_SELECT}),
edges AS MATERIALIZED (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION ALL
  SELECT vec_b, vec_a FROM pairs),
cc_nodes AS (SELECT DISTINCT a AS node FROM edges),
walk(node, label) AS (
  SELECT node, node FROM cc_nodes
  UNION
  SELECT e.b, w.label FROM walk w JOIN edges e ON w.node = e.a),
labels AS (SELECT node AS vec_id, MIN(label) AS label FROM walk GROUP BY node),
mem AS (SELECT l.vec_id, l.label, n.v, n.nm
        FROM labels l JOIN n ON n.vec_id = l.vec_id),
memx AS (SELECT label, unnest(v) AS val,
                generate_subscripts(v, 1) AS pos FROM mem),
cent AS (SELECT label, pos, avg(val) AS cval FROM memx GROUP BY label, pos),
centv AS (SELECT label, list(cval ORDER BY pos) AS c FROM cent GROUP BY label),
cnn AS (SELECT label, c, sqrt(list_dot_product(c, c)) AS cnorm FROM centv),
cosv AS (SELECT m.label, m.vec_id,
                coalesce(CASE WHEN len(m.v) = len(cnn.c)
                              THEN list_dot_product(m.v, cnn.c)
                                   / (m.nm * cnn.cnorm) END,
                         1e308) AS cos_c
         FROM mem m JOIN cnn ON m.label = cnn.label),
keep AS (SELECT label, vec_id AS canonical_vec_id FROM (
           SELECT label, vec_id,
                  row_number() OVER (PARTITION BY label
                                     ORDER BY cos_c, vec_id) AS rn
           FROM cosv) t WHERE rn = 1)
SELECT l.vec_id, k.canonical_vec_id
FROM labels l JOIN keep k ON l.label = k.label
""",
    doc="SemDeDup with the PAPER'S keeper rule (Abbas et al. 2023 §3: keep "
    "the cluster member with the LOWEST cosine to the cluster centroid — "
    "diversity-preserving), registered alongside the min-id variant so the "
    "paper-parity path has driver CORRECTNESS evidence (VERDICT r6 ask "
    "#5).  Value-oracled, not rows-only: on the synthetic embeddings the "
    "keeper's cosine margin over the runner-up is >= ~1.6e-9 (measured "
    "at sf0.001/sf0.01, asserted > 1e-10 in tests/test_semdedup_keeper."
    "py) while cross-engine double-summation disagreement is ~1e-14, so "
    "the float argmin cannot flip between engines.  Shape: CC labels -> ONE "
    "map-side-combined groupBy(label) centroid shuffle (D avg() "
    "aggregates) -> broadcast centroid join -> struct-min keeper; every "
    "step keyed on cluster label, clusters are << corpus at any "
    "realistic duplicate rate.",
)
def dedup_semdedup_centroid_far(spark: SparkSession, sf_dir: str) -> DataFrame:
    return semdedup_keepers(spark, sf_dir, keeper="centroid_far")


def connected_components(pairs: DataFrame, max_rounds: int = 25) -> DataFrame:
    """(node, label) component labels for an undirected edge list (a, b).

    Alternating large-star / small-star contraction:

      * large-star: every node points its LARGER neighbors at its minimum
        neighborhood member — long paths fold toward local minima;
      * small-star: every node bundles its smaller neighbors (and itself)
        onto the minimum — components contract into stars.

    Both steps preserve connectivity and only ever lower the reachable
    minimum, so the edge multiset reaches a fixpoint: one star per
    component rooted at its minimum node.  Rounds are O(log n) (the paper
    proves O(log^2 n) worst-case; measured ~log on chains) versus
    DIAMETER rounds for plain min-label propagation.  Per round: two
    groupBy + two join shuffles, all keyed on node ids, checkpointed
    eagerly to cut the iterative lineage.  Isolated nodes never appear in
    ``pairs`` and so are absent from the output (near-dup semantics:
    unpaired docs are their own canonical).
    """
    edges = (
        pairs.filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # all_nodes is consumed exactly ONCE (the roots anti-join after
    # convergence) and derives from the already-checkpointed initial
    # edges, so checkpointing it bought nothing — the r15 eager
    # checkpoint here was one full wasted job per invocation (r16
    # optimization round, guide §1.2/§5 fewer driver actions).
    all_nodes = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .distinct()
    )
    prev_sig = None
    converged = False
    for _ in range(max_rounds):
        # --- large-star ---------------------------------------------------
        und = edges.unionAll(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = (
            und.groupBy("a")
            .agg(F.min("b").alias("mb"))
            .select("a", F.least(F.col("mb"), F.col("a")).alias("mn"))
        )
        edges = (
            und.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("mn").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # --- small-star ---------------------------------------------------
        sm = edges.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        )
        smins = sm.groupBy("u").agg(F.min("v").alias("mn"))
        edges = (
            sm.join(smins, "u")
            .filter(F.col("v") != F.col("mn"))
            .select(F.col("v").alias("a"), F.col("mn").alias("b"))
            .unionAll(smins.select(F.col("u").alias("a"), F.col("mn").alias("b")))
            .distinct()
            # EAGER — the lazy-fusion dead end, measured twice now
            # (r16): making this lazy and letting the signature
            # aggregate below materialize it saves one Spark job per
            # round (29 -> 25 jobs, 0.91x, labels identical —
            # tests/exp_r16_cc_ab.py), but a full-bench run under the
            # fleet-wide lazy variant reproduced the ROUND-3 accumulator
            # failure ("Failed to update accumulator ... non-existent
            # accumulator"): a lazily checkpointed RDD's originating
            # plan — and its weakly-referenced SQL-metric accumulators —
            # can be GC'd on the driver before the delayed
            # materialization runs, so its tasks report into cleared
            # accumulators.  Benign for results, loud in the bench
            # stderr, and nondeterministic — exactly the bench-trust
            # failure r3 fixed by going eager.  Eager materializes while
            # the originating plan is still strongly referenced, closing
            # the window.
            .localCheckpoint(eager=True)
        )
        # bit_xor, not sum: a sum of 64-bit hashes overflows under ANSI
        sig = edges.agg(
            F.count("*").alias("c"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).first()
        sig = (sig["c"], sig["h"])
        if sig == prev_sig:  # edge multiset stable: stars everywhere
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components: star contraction did not converge "
            f"within {max_rounds} rounds; raise max_rounds for this graph"
        )
    # final state: (non-root, root) star edges; roots label themselves
    labels = edges.select(F.col("a").alias("node"), F.col("b").alias("label"))
    roots = all_nodes.join(labels, "node", "left_anti").select(
        "node", F.col("node").alias("label")
    )
    return labels.unionByName(roots)


# --- ExactSubstr duplicate spans (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — public paper) -------------------------
# The paragraph-granularity variant lives in pipeline_q; this is the
# sliding-window form: a token SPAN is duplicated when its K-token window
# hash occurs more than once ANYWHERE in the corpus (cross-doc or same-doc),
# and overlapping/adjacent duplicated windows merge into one maximal span —
# the region ExactSubstr would cut before training.  K is 50 tokens in the
# paper; 16 here, scaled to the synthetic corpus' ~54-token documents
# (documented deviation — the algorithm is K-agnostic).
from thesis_iceberg_spark.queries.text import (  # noqa: E402  (same package,
    _HASH_BASE,  # no import cycle: text.py imports nothing from dedup)
    _HASH_MOD,
    _tok40_hasher,
)

EXACT_SUBSTR_K = 16

_SQL_SPAN_FOLD = "th[i]"
for _j in range(1, EXACT_SUBSTR_K):
    _SQL_SPAN_FOLD = f"(({_SQL_SPAN_FOLD}) * {_HASH_BASE} + th[i+{_j}]) % {_HASH_MOD}"

# Shared by the spans oracle AND the apply-step oracle below (one
# definition — the two must never drift, or the apply step would cut
# spans that differ from what the spans query reports).
_SQL_SPAN_CTES = f"""tt AS (
  SELECT doc_id,
         list_transform(
             regexp_split_to_array(trim(lower({fold_sql('text')})), '\\s+'),
             x -> CAST('0x' || substr(md5(x), 1, 10) AS BIGINT)) AS th
  FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(th) - {EXACT_SUBSTR_K - 1} + 1),
                               i -> i - 1)) AS pos,
         unnest(list_transform(range(1, len(th) - {EXACT_SUBSTR_K - 1} + 1),
                               i -> {_SQL_SPAN_FOLD})) AS h
  FROM tt),
d AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY h) AS c FROM g)
  WHERE c > 1),
b AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {EXACT_SUBSTR_K} THEN 0 ELSE 1 END AS brk
  FROM d),
si AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM b),
spans AS (
  SELECT doc_id,
         MIN(pos) AS span_start,
         MAX(pos) + {EXACT_SUBSTR_K} AS span_end,
         MAX(pos) + {EXACT_SUBSTR_K} - MIN(pos) AS span_tokens
  FROM si GROUP BY doc_id, isl)"""


@register(
    "dedup_exact_substr_spans",
    oracle=f"""
WITH {_SQL_SPAN_CTES}
SELECT doc_id, span_start, span_end, span_tokens FROM spans
""",
    doc=f"ExactSubstr duplicate SPANS (Lee et al. 2022): every maximal "
    f"token interval covered by {EXACT_SUBSTR_K}-token windows whose "
    "rolling hash occurs more than once anywhere in the corpus — the "
    "regions the paper cuts before training, finer than whole-doc or "
    "paragraph dedup (it catches a copied passage inside an otherwise "
    "unique document). Spark shape: window hashes are per-document "
    "bounded state (one Arrow pass, 40-bit-md5 rolling fold shared with "
    "the repetition kernel); corpus-wide duplication is a map-side-"
    "combinable groupBy(h) + LEFT SEMI join back — NOT a count-window, "
    "which would materialize every occurrence of a hot boilerplate "
    "window (license header, template) in one task; span merging is a "
    "lag + running-sum gaps-and-islands on (doc_id, pos). Overlapping "
    "or touching windows (gap <= K) merge into one span.",
)
def dedup_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    k = EXACT_SUBSTR_K
    base, mod = _HASH_BASE, _HASH_MOD
    docs = _docs(spark, sf_dir).select("doc_id", "text")

    def grams(batches):
        import numpy as np
        import pandas as pd

        h40 = _tok40_hasher()  # per-task memoized md5 (oracle-identical)
        for pdf in batches:
            ids, poss, hh = [], [], []
            for doc_id, text in zip(pdf["doc_id"].to_numpy(), pdf["text"]):
                folded = fold_py(text or "")
                certify_py(folded)  # same contract as the shingle kernels
                toks = _WS_ASCII.split(folded.strip(" ").lower())
                t = len(toks)
                if t < k:
                    continue
                hs = np.fromiter((h40(x) for x in toks), dtype=np.int64, count=t)
                g = hs
                for j in range(1, k):
                    g = (g[:-1] * base + hs[j:]) % mod
                ids.append(np.full(len(g), int(doc_id), dtype=np.int64))
                poss.append(np.arange(len(g), dtype=np.int64))
                hh.append(g)
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids) if ids else np.array([], dtype=np.int64),
                    "pos": np.concatenate(poss) if poss else np.array([], dtype=np.int64),
                    "h": np.concatenate(hh) if hh else np.array([], dtype=np.int64),
                }
            )

    # checkpoint: the gram rows feed BOTH the duplicate-hash aggregate
    # and the semi-join probe side — materialize the Arrow pass once
    g = docs.mapInPandas(
        grams, "doc_id bigint, pos bigint, h bigint"
    ).localCheckpoint(eager=True)
    # duplicate hashes via partial-aggregated groupBy + semi join, never a
    # count-window: a window over h materializes every occurrence of a
    # hot boilerplate 16-gram in ONE task (spill/straggler at 100 TB);
    # the aggregate combines map-side and the join shuffles ids only
    dup_h = (
        g.groupBy("h").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1)
    )
    dup = g.join(dup_h.select("h"), "h", "left_semi").select("doc_id", "pos")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    b = dup.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(wd) <= k, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    s = b.withColumn("isl", F.sum("brk").over(wd))
    return s.groupBy("doc_id", "isl").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + k).alias("span_end"),
        (F.max("pos") + k - F.min("pos")).alias("span_tokens"),
    ).drop("isl")


@register(
    "pipeline_remove_dup_spans",
    oracle=f"""
WITH {_SQL_SPAN_CTES},
tok AS (
  SELECT doc_id, unnest(toks) AS tk, generate_subscripts(toks, 1) - 1 AS pos
  FROM (SELECT doc_id,
               regexp_split_to_array(trim(lower({fold_sql('text')})),
                                     '\\s+') AS toks
        FROM documents)),
kept AS (
  SELECT t.* FROM tok t ANTI JOIN spans s
    ON t.doc_id = s.doc_id
   AND t.pos >= s.span_start AND t.pos < s.span_end),
ka AS (
  SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS kept_text,
         COUNT(*) AS nk
  FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tok GROUP BY doc_id)
SELECT t.doc_id,
       COALESCE(kept_text, '') AS kept_text,
       n_tokens,
       n_tokens - COALESCE(nk, 0) AS n_removed_tokens
FROM tot t LEFT JOIN ka USING (doc_id)
""",
    doc="APPLY step for ExactSubstr: rebuild each document with every "
    "duplicated span (dedup_exact_substr_spans, all-occurrence "
    "convention — Lee et al.'s 'remove all copies' variant) cut out, "
    "emitting the cleaned normalized text plus token counts. Spark "
    "shape: the span stages as above, then a sort-merge LEFT ANTI join "
    "of token rows against spans (equi on doc_id + pos-range residual — "
    "never a nested loop across documents) and a per-doc ordered "
    "re-concatenation. Output text is the NORMALIZED (lowercased, "
    "single-space) form — the form every dedup operator in this engine "
    "is defined over.",
)
def pipeline_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = dedup_exact_substr_spans(spark, sf_dir).select(
        "doc_id", "span_start", "span_end"
    )
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(_norm(), " ")).alias("pos", "tk"),
    )
    kept = tok.alias("t").join(
        spans.alias("s"),
        (F.col("t.doc_id") == F.col("s.doc_id"))
        & (F.col("t.pos") >= F.col("s.span_start"))
        & (F.col("t.pos") < F.col("s.span_end")),
        "left_anti",
    )
    ka = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tk"))),
                lambda x: x["tk"],
            ),
        ).alias("kept_text"),
        F.count("*").alias("nk"),
    )
    tot = tok.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    return tot.join(ka, "doc_id", "left").select(
        "doc_id",
        F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("nk", F.lit(0))).alias("n_removed_tokens"),
    )


# --- edit-distance verification of near-dup candidates (r11) ----------------
#
# The standard near-dup pipeline ends with a verification pass the set
# metrics cannot give: shingle Jaccard is ORDER-BLIND (a document and its
# sentence-shuffled copy share every shingle), so production dedup
# confirms candidate pairs with a sequence-aware distance before dropping
# documents.  Cross-engine exactness note (measured, r11): DuckDB's
# levenshtein() is BYTE-based over the UTF-8 encoding (an accented-char
# substitution costs 2), Spark's F.levenshtein is codepoint-based — the
# two builtins disagree on any non-ASCII text, so the certified contract
# here is BYTE-level Levenshtein over the normalized text: the Spark
# side computes it in an Arrow kernel (vectorized numpy DP, exact twin
# of DuckDB's builtin), and similarity normalizes by byte length
# (DuckDB strlen()).  Cost is per-PAIR, not per-doc: the kernel only
# ever sees the candidate list the subquadratic generators emit.


def _byte_lev(a: bytes, b: bytes, cap: int | None = None) -> int:
    """Byte-level Levenshtein, exact twin of DuckDB's levenshtein().
    Vectorized DP: per row, the insertion recurrence cur[j] =
    min(t[j], cur[j-1]+1) folds into a running min of (t[k] - k).

    ``cap`` (review r11 ADVICE): threshold-cutoff mode — returns the
    EXACT distance when it is <= cap, else ``cap + 1`` (a certified
    lower-bound marker).  Implementation is the classic Ukkonen band:
    any alignment path leaving the |i - j| <= cap diagonal band costs
    > cap, so the DP only materializes a (2*cap + 1)-wide band per row
    — O(cap * min_len) cells instead of O(len_a * len_b) — plus a
    length-difference shortcut and a monotone row-min early exit
    (row minima are non-decreasing: every cell derives from a
    min-plus-nonnegative of the previous row/cell).  A decision
    "distance <= t" taken with cap >= t is therefore IDENTICAL to the
    exact kernel's — what the composition's verification stage needs —
    while the full exact distance stays available with cap=None (the
    registered value-oracled query)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if not a:
        return lb if cap is None else min(lb, cap + 1)
    if not b:
        return la if cap is None else min(la, cap + 1)
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    import numpy as np

    if cap is None or 2 * cap + 1 >= lb:
        # full-width rows (banding would span the whole row anyway)
        bb = np.frombuffer(b, dtype=np.uint8).astype(np.int32)
        prev = np.arange(lb + 1, dtype=np.int32)
        idx = np.arange(lb + 1, dtype=np.int32)
        for i, ca in enumerate(a, 1):
            t = np.empty(lb + 1, dtype=np.int32)
            t[0] = i
            np.minimum(prev[1:] + 1, prev[:-1] + (bb != ca), out=t[1:])
            prev = np.minimum.accumulate(t - idx) + idx
            if cap is not None and int(prev.min()) > cap:
                return cap + 1
        d = int(prev[-1])
        return d if cap is None or d <= cap else cap + 1
    # banded: band position d <-> column j = i - cap + d, d in [0, 2*cap]
    k = cap
    w = 2 * k + 1
    big = np.int32(k + 2)  # any value > cap is equivalent; clip prevents growth
    bb = np.frombuffer(b, dtype=np.uint8).astype(np.int32)
    bpad = np.full(lb + 2 * w, -1, dtype=np.int32)  # -1 never equals a byte
    bpad[w : w + lb] = bb
    idx = np.arange(w, dtype=np.int32)
    # row 0: cur[j] = j for j = d - k in [0, lb]
    prev = np.minimum(idx - k, big)
    prev[idx < k] = big  # j < 0: outside the matrix
    for i in range(1, la + 1):
        ca = a[i - 1]
        jlo = i - k  # column at d = 0
        # deletion prev[j] sits at band d+1 of the previous row;
        # substitution prev[j-1] sits at band d of the previous row
        del_ = np.empty(w, dtype=np.int32)
        del_[:-1] = prev[1:] + 1
        del_[-1] = big
        chars = bpad[w + jlo - 1 : w + jlo - 1 + w]
        t = np.minimum(del_, prev + (chars != ca))
        j = jlo + idx
        t[j > lb] = big
        if jlo <= 0:
            t[-jlo] = i  # j == 0 boundary column: distance = i deletions
        cur = np.minimum.accumulate(t - idx) + idx
        np.minimum(cur, big, out=cur)
        cur[j < 0] = big
        if int(cur.min()) > k:
            return cap + 1
        prev = cur
    d = int(prev[lb - la + k])
    return d if d <= cap else cap + 1


# plain-literal template + .format: only the two placeholders are parsed;
# the substituted fragments' regex braces are inserted verbatim (an
# f-string template would have pre-baked them into the format text)
_EDIT_VERIFY_ORACLE = """
WITH pairs AS ({jaccard}),
nt AS (SELECT doc_id, {norm} AS t FROM documents)
SELECT p.doc_a, p.doc_b,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist,
       1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)
             / greatest(strlen(a.t), strlen(b.t), 1) AS edit_sim
FROM pairs p
JOIN nt a ON a.doc_id = p.doc_a
JOIN nt b ON b.doc_id = p.doc_b
"""


@register(
    "dedup_edit_verified_pairs",
    oracle=_EDIT_VERIFY_ORACLE.format(
        jaccard=REGISTRY["dedup_ngram_jaccard_pairs"].oracle, norm=_norm_sql()
    ),
    doc="Edit-distance VERIFICATION of the n-gram-Jaccard candidate pairs "
    "(the sequence-aware pass set metrics cannot give — Jaccard is "
    "order-blind): per pair, byte-level Levenshtein over the normalized "
    "text and a byte-length-normalized similarity. The metric is "
    "certified cross-engine as BYTE Levenshtein (DuckDB's builtin is "
    "byte-based where Spark's is codepoint-based — measured, see the "
    "module comment), computed Spark-side in an Arrow kernel whose cost "
    "is per-candidate-PAIR, never per-document; at 100 TB the pair list "
    "is the subquadratic generators' output and the text join is two "
    "id equi-joins. Integer distances and one exact division make this "
    "a FULL value oracle.",
)
def dedup_edit_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs_from_shingles(
        _capped_shingles(docs, docs.count())
    ).select("doc_a", "doc_b")
    nt = docs.select("doc_id", _norm().alias("t"))
    return edit_verify_pairs(pairs, nt)


def edit_verify_pairs(
    pairs: DataFrame, norm_texts: DataFrame, min_sim: float | None = None
) -> DataFrame:
    """(doc_a, doc_b, edit_dist, edit_sim) for candidate ``pairs`` joined
    to ``norm_texts`` (doc_id, t) — the sequence-aware verification pass.

    ``min_sim=None``: the exact kernel, full value oracle (the registered
    query).  ``min_sim=s``: BANDED verification (review r11 ADVICE +
    VERDICT r11 #3) — the kernel runs _byte_lev with
    ``cap = floor((1-s)*max_byte_len) + 2`` per pair, so the DP touches
    O(cap * len) cells instead of O(len^2), and only pairs with
    ``edit_sim >= s`` survive.  The decision is EXACT: a survivor has
    d <= (1-s)*m <= cap-2, inside the band, so its distance and
    similarity are the exact values (same IEEE double ops as the DuckDB
    oracle: 1.0 - d/m with byte lengths); a capped pair's marker
    similarity 1-(cap+1)/m < s - 2/m sits strictly below every float
    rounding of the threshold, so it is dropped exactly like its true
    (larger) distance would drop it."""
    joined = (
        pairs.join(
            norm_texts.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta")),
            "doc_a",
        )
        .join(
            norm_texts.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb")),
            "doc_b",
        )
        .select("doc_a", "doc_b", "ta", "tb")
    )

    def verify(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for doc_a, doc_b, ta, tb in zip(
                pdf["doc_a"].to_numpy(), pdf["doc_b"].to_numpy(), pdf["ta"], pdf["tb"]
            ):
                ba = (ta or "").encode()
                bb = (tb or "").encode()
                m = max(len(ba), len(bb), 1)
                cap = None if min_sim is None else int((1.0 - min_sim) * m) + 2
                d = _byte_lev(ba, bb, cap=cap)
                sim = 1.0 - d / m
                recs.append((int(doc_a), int(doc_b), d, sim))
            yield pd.DataFrame(
                recs, columns=["doc_a", "doc_b", "edit_dist", "edit_sim"]
            )

    out = joined.mapInPandas(
        verify, "doc_a bigint, doc_b bigint, edit_dist bigint, edit_sim double"
    )
    return out if min_sim is None else out.filter(F.col("edit_sim") >= min_sim)
