"""End-to-end training-data cleaning pipeline (the north-star composition):

    documents -> quality scoring -> language ID -> near-dup removal
              -> cleaned corpus

Each stage is an already-verified operator (text.py / dedup.py); this query
chains them the way a production pre-training pipeline does, and the DuckDB
oracle is composed from the SAME oracle fragments, so the whole pipeline is
value-checked end to end.

Scale shape: quality + lang are narrow per-row stages fused into one pass
by Catalyst; dedup contributes its band-key shuffle; the final anti-join
removes non-canonical near-dups (keep the lowest doc_id of every dup pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# importing these modules registers their queries AND lets us reuse their
# oracle SQL as CTE bodies so the pipeline oracle can never drift
from thesis_iceberg_spark.queries import REGISTRY, dedup, register, text  # noqa: F401

QUALITY_MIN = 0.5

_PIPELINE_ORACLE = f"""
WITH quality AS ({REGISTRY["text_quality_scores"].oracle}),
langd AS ({REGISTRY["text_lang_id"].oracle}),
dups AS ({REGISTRY["dedup_ngram_jaccard_pairs"].oracle})
SELECT d.doc_id, q.quality_score, l.detected_lang,
       len(regexp_split_to_array(trim(d.text), '\\s+')) AS n_tokens
FROM documents d
JOIN quality q ON q.doc_id = d.doc_id
JOIN langd l ON l.doc_id = d.doc_id
WHERE q.quality_score >= {QUALITY_MIN}
  AND l.detected_lang = 'en'
  AND d.doc_id NOT IN (SELECT doc_b FROM dups)
"""


@register(
    "pipeline_train_eval_split",
    oracle="""
SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT doc_id, n_chars,
         CASE WHEN CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 100 < 90
              THEN 'train' ELSE 'eval' END AS split
  FROM documents)
GROUP BY split
""",
    doc="Deterministic hash-based train/eval split (90/10): the split of a "
    "document depends only on its id (keyed md5 bucket), so it is stable "
    "across runs, machines and engine versions — the property a training "
    "pipeline needs so re-runs never leak eval docs into train. Verified "
    "bucket-exact against DuckDB.",
)
def pipeline_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thesis_iceberg_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = F.when(bucket < 90, "train").otherwise("eval")
    return (
        docs.select("doc_id", "n_chars", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "pipeline_clean_corpus",
    oracle=_PIPELINE_ORACLE,
    doc="Training-data cleaning pipeline: quality >= 0.5, detected language "
    "'en', near-dups removed keeping the lowest doc_id of each pair — all "
    "three stages are verified operators composed into one plan, and the "
    "oracle is composed from their oracle fragments.",
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thesis_iceberg_spark.queries.dedup import dedup_ngram_jaccard_pairs
    from thesis_iceberg_spark.queries.text import text_lang_id, text_quality_scores
    from thesis_iceberg_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    quality = text_quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    lang = text_lang_id(spark, sf_dir)
    dup_victims = dedup_ngram_jaccard_pairs(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    )
    return (
        docs.join(quality, "doc_id")
        .join(lang, "doc_id")
        .filter(
            (F.col("quality_score") >= QUALITY_MIN)
            & (F.col("detected_lang") == "en")
        )
        .join(dup_victims, "doc_id", "left_anti")
        .select(
            "doc_id",
            "quality_score",
            "detected_lang",
            F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("n_tokens"),
        )
    )
