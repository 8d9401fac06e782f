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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.sources.registry import load_table

N_MINHASH = 12  # minhash permutations
N_BANDS = 4  # LSH bands (3 rows per band)
ROWS_PER_BAND = N_MINHASH // N_BANDS
JACCARD_THRESHOLD = 0.5  # verification threshold for near-dup pairs


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _norm_sql(col: str = "text") -> str:
    return f"regexp_replace(trim(lower({col})), '\\s+', ' ', 'g')"


def _norm(col: str = "text"):
    return F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")


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


@register(
    "dedup_ngram_jaccard_pairs",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest({_SQL_SHINGLES}) AS s
  FROM documents WHERE len({_SQL_TOKS}) >= 3),
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
    doc="N-gram Jaccard near-dup pairs: 3-token shingles, exploded and "
    "self-joined on shingle (inverted-index join — only docs SHARING a "
    "shingle ever meet, never a cartesian), Jaccard from integer counts. "
    "Scale: the shingle join explodes on very common shingles; the LSH "
    "variant below is the 100 TB path.",
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", _shingles().alias("sh")).filter(
        F.size("sh") >= 1
    )
    sh = docs.select("doc_id", F.explode("sh").alias("s"))
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
    "exact Jaccard. This is the 100 TB dedup path: candidate generation is "
    "a groupBy on band_key (shuffle proportional to corpus size, not "
    "pairs); verification touches only near-dup candidates.",
)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter(F.size(F.split(_norm(), " ")) >= 3)

    # Explode shingles ONCE and hash each shingle ONCE: the i-th minhash
    # permutation is min(h1 + i*h2) (double hashing over the two md5
    # halves), computed as N_MINHASH cheap integer min-aggregates in a
    # single pass — one shuffle, one md5 per shingle. (The naive form —
    # one keyed md5 per permutation inside nested array expressions —
    # re-evaluates split/transform per permutation and per band.)
    sh0 = docs.select("doc_id", F.explode(_shingles()).alias("s"))
    md5h = F.md5(F.col("s").cast("binary"))
    # localCheckpoint (EAGER): the exploded+hashed shingle set is consumed
    # THREE times (signatures, per-doc counts, candidate verification) —
    # checkpointing materializes the regex-split/explode/md5 pass once
    # instead of recomputing it per consumer.  Eager, not lazy: a lazily
    # checkpointed RDD can be recomputed after its originating stage's
    # accumulators are cleaned up ("attempted to access non-existent
    # accumulator", BENCH_r03 tail), and measured 12 runs at sf0.1 show
    # lazy is also far noisier (2.9-12.6 s vs eager's 3.3-3.6 s; recompute-
    # per-consumer is a steady 4-5 s).  See tests/exp_minhash_ckpt.py.
    hashed = sh0.select(
        "doc_id",
        F.conv(F.substring(md5h, 1, 14), 16, 10).cast("bigint").alias("h1"),
        F.conv(F.substring(md5h, 15, 14), 16, 10).cast("bigint").alias("h2"),
    ).localCheckpoint(eager=True)
    sig = hashed.groupBy("doc_id").agg(
        *[
            F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
    )

    # band rows: (doc_id, band_id, band_key = md5 of the band's minhashes),
    # one explode over a literal array of structs — signature computed once.
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).cast("binary")
            ).alias("band_key"),
        )
        for b in range(N_BANDS)
    ]
    band_rows = sig.select("doc_id", F.explode(F.array(*band_structs)).alias("bd")).select(
        "doc_id", F.col("bd.band_id").alias("band_id"), F.col("bd.band_key").alias("band_key")
    )

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

    # exact-Jaccard verification of candidates only — REUSES the
    # checkpointed (doc_id, h1, h2) rows instead of re-exploding the
    # corpus: shingles are per-doc distinct, so equality on the two 56-bit
    # md5 halves is equality on the shingle (no collisions at 2^-112), and
    # the join carries two bigints instead of a shingle string.
    cnt = hashed.groupBy("doc_id").agg(F.count("*").alias("n"))
    sha = hashed.select(F.col("doc_id").alias("doc_a"), "h1", "h2")
    shb = hashed.select(
        F.col("doc_id").alias("_doc_b"),
        F.col("h1").alias("_h1"),
        F.col("h2").alias("_h2"),
    )
    common = (
        cand.join(sha, "doc_a")
        .join(
            shb,
            (F.col("doc_b") == F.col("_doc_b"))
            & (F.col("h1") == F.col("_h1"))
            & (F.col("h2") == F.col("_h2")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
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
    dot = lambda u, w: F.aggregate(  # noqa: E731
        F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda acc, p: acc + p
    )
    n = e.select("vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nm"))
    # the corpus arrives as one file split; spread the O(n^2) pair work
    # across all cores (stream side of the nested-loop join)
    a = n.repartition(int(spark.conf.get("spark.sql.shuffle.partitions"))).select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nm").alias("na")
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nm").alias("nb")
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.45)
    )


N_SIG_DIMS = 10  # signature = the 10 largest-|coordinate| signed dimensions
N_SIG_DIMS_SMALL = 16  # wider signature below the small-corpus cutoff
N_SMALL_CORPUS = 1024  # below this, candidate volume is cheap — buy recall


@register(
    "dedup_embedding_lsh_pairs",
    oracle=f"""
WITH ll AS (SELECT CASE WHEN COUNT(*) < {N_SMALL_CORPUS}
                        THEN {N_SIG_DIMS_SMALL} ELSE {N_SIG_DIMS} END AS l
            FROM embeddings),
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
sig AS (SELECT vec_id, d FROM ranked WHERE rn <= (SELECT l FROM ll)),
buckets AS (
  SELECT p.vec_id, p.d * 1000 + q.d AS bucket
  FROM sig p JOIN sig q ON p.vec_id = q.vec_id AND p.d < q.d),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM buckets x JOIN buckets y
    ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
SELECT c.vec_a, c.vec_b,
       list_dot_product(a.v, b.v) / (a.nm * b.nm) AS cosine
FROM cand c JOIN n a ON c.vec_a = a.vec_id JOIN n b ON c.vec_b = b.vec_id
WHERE list_dot_product(a.v, b.v) / (a.nm * b.nm) >= 0.45
""",
    doc=f"Embedding near-dup pairs via compound cross-polytope LSH — the "
    "scale path that replaces the O(n^2) brute-force variant. Each vector's "
    f"signature is its top-{N_SIG_DIMS} signed dimensions by |coordinate| "
    "(deterministic, data-independent — no trained centroids); a bucket is "
    "an unordered PAIR of signature dims, so the bucket space is "
    "C(2*dim, 2) = 8128 for dim=64 and a candidate must share TWO signature "
    "dims, not one. Measured at sf0.1 against the brute-force baseline: "
    "recall 0.89, candidates 0.18*n^2 — 3x fewer than the round-2 16-"
    "centroid IVF at higher recall (0.89 vs 0.82); a k~sqrt(n) IVF was "
    "measured too and rejected (recall 0.61 at k=45, this corpus's near-"
    "dups sit just above the 0.45 threshold, the hardest LSH regime). "
    "Candidate pairs come from an EQUI-join on bucket over (vec_id, bucket) "
    "IDS ONLY (never cartesian, plan-gated; the shuffle carries two longs "
    "per row, not vectors), duplicates collapse BEFORE verification, and "
    "only then are vectors joined back (broadcast here; a co-partitioned "
    "join at cluster scale) for the single exact-cosine check per "
    "candidate. At 100 TB: signatures are computed at write time (narrow "
    "map), the bucket join shuffles 45 small rows per vector, and recall/"
    "cost trades off through N_SIG_DIMS alone. Recall is pytest-checked "
    "(tests/test_dedup_scale.py).",
)
def dedup_embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    dot = lambda u, w: F.aggregate(  # noqa: E731
        F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda acc, p: acc + p
    )
    raw = load_table(spark, sf_dir, "embeddings")
    # cheap corpus count (parquet-footer statistics): tiny corpora take a
    # wider signature — candidates are cheap there, recall is not
    sig_dims = N_SIG_DIMS_SMALL if raw.count() < N_SMALL_CORPUS else N_SIG_DIMS
    e = raw.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    # norm once per vector — every downstream cosine is a single dot product
    n = e.select("vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nm"))
    # signature: top-sig_dims signed dimensions by |coordinate| (ties
    # broken by position — deterministic and engine-independent)
    ex = n.select("vec_id", F.posexplode("v").alias("pos", "val"))
    w = Window.partitionBy("vec_id").orderBy(F.abs(F.col("val")).desc(), F.col("pos"))
    sig = (
        ex.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= sig_dims)
        .select(
            "vec_id",
            (F.col("pos") * 2 + F.when(F.col("val") >= 0, 0).otherwise(1)).alias("d"),
        )
    )
    # compound buckets: every unordered pair of signature dims
    buckets = (
        sig.alias("p")
        .join(sig.alias("q"), "vec_id")
        .filter(F.col("p.d") < F.col("q.d"))
        .select("vec_id", (F.col("p.d") * 1000 + F.col("q.d")).alias("bucket"))
    )
    # candidate generation over ids only: narrow shuffle, dedup pre-verify
    cand = (
        buckets.alias("x")
        .join(buckets.alias("y"), "bucket")  # equi-join — never cartesian
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()  # a pair may collide in several shared buckets
    )
    va = n.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nm").alias("na"))
    vb = n.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nm").alias("nb"))
    return (
        cand.join(F.broadcast(va), "vec_a")
        .join(F.broadcast(vb), "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.45)
    )


@register(
    "dedup_cluster_canonical",
    oracle=f"""
WITH RECURSIVE {_SQL_MINHASH_CTES},
pairs AS ({_SQL_MINHASH_SELECT}),
edges AS (
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
    "transitive closure. Connected components via iterative min-label "
    "propagation (labels only decrease; a monotone checksum detects the "
    "fixpoint), all as DataFrame joins — the shuffle per round is "
    "O(edges), rounds = component diameter (tiny for near-dup cliques). "
    "At 100 TB the large-star/small-star variant halves rounds; the "
    "per-round plan is identical. Output: every clustered doc with its "
    "canonical (minimum) doc_id. Oracle: DuckDB recursive CTE over the "
    "same pair list.",
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.unionAll(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).toDF("a", "b")
    # edges are reused every round: materialize once
    edges = edges.localCheckpoint(eager=True)
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    prev_sum = None
    converged = False
    max_rounds = 20  # >> any real near-dup component diameter
    for _ in range(max_rounds):
        prop = edges.join(labels, edges.a == labels.node).select(
            F.col("b").alias("node"), "label"
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)  # cut the iterative lineage
        )
        s = labels.agg(F.sum("label")).first()[0]
        if s == prev_sum:  # labels are monotone non-increasing: fixpoint
            converged = True
            break
        prev_sum = s
    if not converged:
        # a chain-shaped component with diameter > max_rounds would exit
        # here with NON-canonical labels; that is a wrong answer, so fail
        # loudly instead of returning it (min-label propagation halves
        # effective diameter per round only along already-labeled paths)
        raise RuntimeError(
            f"dedup_cluster_canonical: label propagation did not converge "
            f"within {max_rounds} rounds — a near-dup component has "
            f"diameter > {max_rounds}; raise max_rounds for this corpus"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("canonical_doc_id")
    )
