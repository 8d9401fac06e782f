"""Hashed-feature linear quality/domain classifier (fastText-style).

Every production pre-training pipeline runs a cheap linear classifier
over hashed bag-of-words features — CCNet/GPT-3-style "quality" or
domain filters (Wenzek et al. 2019; Brown et al. 2020 App. A; Joulin et
al. 2016 fastText) — to score billions of documents against a labeled
seed corpus.  The reference engine has no model surface (its api.py is
relational-only); this extends §2B's text family with the SERVING SHAPE
that matters at 100 TB plus a one-pass count-based FIT:

  * FEATURES: token -> md5 hash -> one of HC_BUCKETS buckets (the
    fastText hashing trick; md5 is the registry's portable hash family,
    same idiom as text._cm_hash).  No vocabulary object ships anywhere.
  * FIT (one pass): per-bucket token counts in the positive class
    (lang = 'en') vs the rest, converted to parts-per-million class
    rates with INTEGER division; weight_b = rate_pos_b - rate_neg_b.
    That is a naive-Bayes-flavored discriminative weight whose sign
    says which class the bucket's tokens favor — crude as a model, but
    every arithmetic step is exact integer math, so the ENTIRE fit and
    score are value-oracled cross-engine (the usual log-odds form would
    die on the 1-ulp ln rule; rates-in-ppm is the exactness-preserving
    formulation).  Fit cost: one explode + groupBy over HC_BUCKETS keys
    — map-side combined, <= HC_BUCKETS rows per task shuffled at ANY
    corpus size (the count-min sketch argument, text.py:1572).
  * SCORE (the hot path): the 64-long weight vector is assembled into a
    DENSE array (sort_array over the bucket spine — never a map lookup,
    Spark's GetMapValue is an O(|map|) linear scan, DEVNOTES r10) and
    broadcast as a one-row crossJoin closure; each doc's score is a
    higher-order aggregate over its token array — element_at by bucket
    index is O(1) — i.e. a NARROW zero-shuffle map over the corpus,
    whole-stage-codegen'd, no Python anywhere.

At 100 TB: fit shuffles <= 64 rows/task; scoring is embarrassingly
parallel.  Production fits run on a bounded labeled sample anyway
(CCNet fits on Wikipedia), which also keeps the ppm numerators inside
bigint — the full-corpus fit here is exact while per-class token mass
stays under ~9.2e12 (9.2e18 / 1e6); past that, fit on a sample or widen
to decimal(38,0).

ref: api.py has no classifier endpoint — this is a §2B LLM-pipeline
extension alongside text.py's Gopher/C4/LM-rarity gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.queries.hashkit import md5_u32
from thesis_iceberg_spark.queries.text import _SQL_LM_FTOKS, _docs, _lm_ftoks

# 64 buckets: tiny on purpose so driver-scale corpora (31 distinct
# tokens at sf0.01) populate a meaningful fraction of the table and
# hash collisions — the defining property of the hashing trick — are
# actually exercised.  Production: 2**20+ buckets, same plan shapes.
HC_BUCKETS = 64
# class rates in parts-per-million: integer division keeps every engine
# bit-identical where a float rate (or ln-odds) would not be
HC_RATE_SCALE = 1_000_000
HC_POS_LANG = "en"


def _hc_bucket(t: Column) -> Column:
    """Token -> bucket id in [0, HC_BUCKETS): the shared md5_u32 kernel
    over 'hc:'||token, mod HC_BUCKETS (column twin of _SQL_HC_BUCKET)."""
    return md5_u32(F.concat(F.lit("hc:"), t)) % HC_BUCKETS


_SQL_HC_BUCKET = (
    "CAST('0x' || substr(md5('hc:' || {t}), 1, 8) AS BIGINT)"
    f" % {HC_BUCKETS}"
)


def hashed_classifier_weights(
    docs: DataFrame, toks_col: Column | None = None
) -> DataFrame:
    """ONE-ROW frame holding the dense weight array ``w`` (length
    HC_BUCKETS, bigint ppm-rate differences) fit from ``docs``
    (doc_id, text, lang).  Shapes: explode -> 64-key map-side-combined
    groupBy -> two tiny single-row/64-row aggregates; nothing here
    scales with corpus size except the one bounded shuffle.

    ``toks_col`` overrides the token source (default: the certified
    _lm_ftoks over ``text``) — the composition fits from the pass-A
    staged norm_text instead of re-scanning raw text (r13, VERDICT r12
    #2); splitting the collapsed norm_text on single spaces yields
    exactly _lm_ftoks' tokens, so the registered classifier's oracle
    fragment still covers the composed fit."""
    spark = docs.sparkSession
    base = docs.select(
        F.explode(_lm_ftoks() if toks_col is None else toks_col).alias("t"),
        F.when(F.col("lang") == HC_POS_LANG, F.lit(1))
        .otherwise(F.lit(0))
        .alias("pos"),
    )
    counts = (
        base.select(_hc_bucket(F.col("t")).alias("b"), "pos")
        .groupBy("b")
        .agg(
            F.sum("pos").alias("n_pos"),
            F.sum(F.lit(1) - F.col("pos")).alias("n_neg"),
        )
    )
    # class totals derive from the 64-row bucket frame, not a second
    # corpus pass
    totals = counts.agg(
        F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn")
    )
    spine = spark.range(HC_BUCKETS).select(F.col("id").alias("b"))
    weights = (
        spine.join(counts, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.expr(
                f"CASE WHEN tp = 0 THEN 0L ELSE (coalesce(n_pos, 0L) * "
                f"{HC_RATE_SCALE}L) div tp END - "
                f"CASE WHEN tn = 0 THEN 0L ELSE (coalesce(n_neg, 0L) * "
                f"{HC_RATE_SCALE}L) div tn END"
            ).alias("w"),
        )
    )
    # dense array assembly: sort_array over (b, w) structs — positional
    # element_at at score time is O(1) per token (never GetMapValue)
    return weights.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("b", "w"))), lambda s: s.w
        ).alias("w")
    )


def hashed_classifier_score_expr(toks_col: Column) -> Column:
    """bigint classifier score of one document's token array against the
    in-scope dense weight array column ``w`` — the zero-shuffle HOF the
    score path and the composition's gate arm share (one canonical
    expression, same discipline as _int8_quantize).  Callers must
    reference the result ONCE per projection/filter: the lambdas are
    excluded from codegen subexpression elimination (SPARK-35410)."""
    return F.aggregate(
        F.transform(
            toks_col,
            lambda t: F.element_at(F.col("w"), (_hc_bucket(t) + 1).cast("int")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def hashed_classifier_score(docs: DataFrame, weights_row: DataFrame) -> DataFrame:
    """Score every doc with the broadcast dense weight array: one narrow
    zero-shuffle projection (the 100 TB hot path).  Returns
    (doc_id, n_toks, score, pred, is_pos_label)."""
    toks = _lm_ftoks()
    score = hashed_classifier_score_expr(F.col("toks"))
    # score is projected ONCE, pred derived from the projected column in
    # a follow-up select: the HOF aggregate contains lambdas, which
    # Spark's codegen subexpression elimination skips (SPARK-35410), so
    # referencing `score` twice in one projection would run the
    # per-token md5 chain twice per document (review r12 — the same
    # multiply-referenced-non-cheap hazard bm25 staged around,
    # search.py:85-89; CollapseProject keeps the split because the
    # aggregate is non-cheap and multiply referenced downstream)
    return (
        docs.crossJoin(F.broadcast(weights_row))
        .select("doc_id", "lang", "w", toks.alias("toks"))
        .select(
            "doc_id",
            "lang",
            F.size("toks").alias("n_toks"),
            score.alias("score"),
        )
        .select(
            "doc_id",
            "n_toks",
            "score",
            (F.col("score") > 0).alias("pred"),
            (F.col("lang") == HC_POS_LANG).alias("is_pos_label"),
        )
    )


_SQL_HC_TOKS = _SQL_LM_FTOKS


@register(
    "text_hashed_classifier",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN lang = '{HC_POS_LANG}' THEN 1 ELSE 0 END AS pos,
         unnest({_SQL_HC_TOKS}) AS t
  FROM documents),
bucketed AS (
  SELECT pos, {_SQL_HC_BUCKET.format(t="t")} AS b FROM toks),
counts AS (
  SELECT b, SUM(pos) AS n_pos, SUM(1 - pos) AS n_neg
  FROM bucketed GROUP BY b),
tot AS (SELECT SUM(n_pos) AS tp, SUM(n_neg) AS tn FROM counts),
weights AS (
  SELECT r.b,
         CAST(CASE WHEN tp = 0 THEN 0
                   ELSE (COALESCE(n_pos, 0) * {HC_RATE_SCALE}) // tp END
            - CASE WHEN tn = 0 THEN 0
                   ELSE (COALESCE(n_neg, 0) * {HC_RATE_SCALE}) // tn END
              AS BIGINT) AS w
  FROM range({HC_BUCKETS}) r(b) LEFT JOIN counts USING (b), tot),
doc_tok AS (
  SELECT doc_id, {_SQL_HC_BUCKET.format(t="t")} AS b
  FROM (SELECT doc_id, unnest({_SQL_HC_TOKS}) AS t FROM documents)),
doc_score AS (
  SELECT doc_id, CAST(SUM(w) AS BIGINT) AS s
  FROM doc_tok JOIN weights USING (b) GROUP BY doc_id)
SELECT d.doc_id,
       len({_SQL_HC_TOKS}) AS n_toks,
       COALESCE(s.s, 0) AS score,
       COALESCE(s.s, 0) > 0 AS pred,
       d.lang = '{HC_POS_LANG}' AS is_pos_label
FROM documents d LEFT JOIN doc_score s USING (doc_id)
""",
    doc="fastText-style hashed bag-of-words linear classifier: fit "
    "integer ppm-rate weights per md5 hash bucket from the lang='en' "
    "class vs the rest (one bounded-key shuffle), then score every doc "
    "with a broadcast dense weight array via a zero-shuffle higher-order "
    "aggregate. All arithmetic is exact integers -> FULL value oracle "
    "(the ln-odds form the literature writes would be 1-ulp-excluded; "
    "ppm rates are the exactness-preserving formulation).",
)
def text_hashed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return hashed_classifier_score(docs, hashed_classifier_weights(docs))
