"""Corpus datacard: the one-pass profile every dataset release ships.

Data cards / datasheets (Gebru et al. 2021; Pile/ROOTS release docs)
report per-slice composition: document counts, token mass, quality, and
duplication by (language x source) plus rollup totals.  This operator
produces that table in ONE documents scan — the per-doc features
(token count, quality score, exact-dup fingerprint) ride a single fused
projection (the pass-A discipline from pipeline_pretrain_corpus), then
one GROUPING SETS aggregation computes every slice and the rollups in
the same map-side-combined shuffle (grouping-sets expansion is
Catalyst's Expand: rows x sets, all partial-aggregated before the
exchange — the slice count, not the corpus, bounds what crosses the
wire).

Determinism: counts are bigint; token mass is a bigint sum; the quality
mean goes through the house decimal trick (SUM of quality cast to
DECIMAL(28,10) is exact and order-free, the final /n is one IEEE
division); dup_frac = 1 - distinct_fingerprints/docs is two exact IEEE
ops on exact integers.  All columns therefore carry a FULL value
oracle.

ref: the reference engine has no profiling surface; §2B extension —
the reporting face of the text/dedup families.  df-level in r13 (the
+4 registration cap is met); r14 registration candidate —
sql_corpus_datacard() is the ready oracle builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register

QDEC = "decimal(28,10)"


def corpus_datacard_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(gid, lang, source, n_docs, n_tokens_total, avg_quality,
    n_distinct_fp, dup_frac) over GROUPING SETS ((lang, source), (lang),
    ()) — gid disambiguates rollup rows from genuine NULL slice keys."""
    from thesis_iceberg_spark.queries.text import (
        fingerprint_expr,
        quality_frame,
    )
    from thesis_iceberg_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    per_doc = quality_frame(docs, keep_cols=("lang", "source", "text")).select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        "quality_score",
        fingerprint_expr().alias("fp"),
    )
    g = per_doc.groupingSets(
        [["lang", "source"], ["lang"], []], "lang", "source"
    ).agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("bigint")).alias("n_tokens_total"),
        (
            F.sum(F.col("quality_score").cast(QDEC))
            .cast("string")
            .cast("double")
            / F.count("*")
        ).alias("avg_quality"),
        F.countDistinct("fp").alias("n_distinct_fp"),
    )
    return g.select(
        "gid",
        "lang",
        "source",
        "n_docs",
        "n_tokens_total",
        "avg_quality",
        "n_distinct_fp",
        (
            F.lit(1.0)
            - F.col("n_distinct_fp").cast("double") / F.col("n_docs")
        ).alias("dup_frac"),
    )


def sql_corpus_datacard() -> str:
    """DuckDB twin builder: the same per-doc fragment joins (registered
    quality + token + fingerprint oracles) under the same GROUPING SETS
    — one fragment source, the composed-oracle discipline."""
    from thesis_iceberg_spark.queries import REGISTRY
    from thesis_iceberg_spark.queries.text import _sql_toks

    q = REGISTRY["text_quality_scores"].oracle
    fp = REGISTRY["text_fingerprint"].oracle
    return f"""
WITH q AS ({q}),
fp AS ({fp}),
t AS (SELECT doc_id, len({_sql_toks()}) AS n_tokens FROM documents),
per_doc AS (
  SELECT d.doc_id, d.lang, d.source, t.n_tokens, q.quality_score,
         fp.fingerprint AS fp
  FROM documents d JOIN q USING (doc_id) JOIN fp USING (doc_id)
       JOIN t USING (doc_id))
SELECT CAST(GROUPING(lang) * 2 + GROUPING(source) AS BIGINT) AS gid,
       lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS n_tokens_total,
       CAST(CAST(SUM(CAST(quality_score AS DECIMAL(28,10))) AS VARCHAR)
            AS DOUBLE) / COUNT(*) AS avg_quality,
       COUNT(DISTINCT fp) AS n_distinct_fp,
       1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*) AS dup_frac
FROM per_doc
GROUP BY GROUPING SETS ((lang, source), (lang), ())
"""


@register(
    "corpus_datacard",
    oracle=sql_corpus_datacard(),
    doc="Corpus datacard (registered r14, VERDICT r13 #1): the release-"
    "profile table every dataset ships (Gebru et al. datasheets; Pile/"
    "ROOTS release docs) — document counts, token mass, decimal-exact "
    "mean quality, and exact-dup fraction by (lang x source) plus "
    "GROUPING SETS rollups, with gid disambiguating rollup rows from "
    "genuine NULL slice keys. ONE fused documents scan (the pass-A "
    "discipline) + ONE grouping-sets aggregation: Catalyst's Expand "
    "partial-aggregates before the exchange, so the slice count — not "
    "the corpus — bounds what crosses the wire. The oracle composes the "
    "registered quality/fingerprint fragments under the same GROUPING "
    "SETS (one fragment source, drift-impossible); all columns carry "
    "the FULL value oracle via the house decimal-sum-to-double trick.",
)
def corpus_datacard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_datacard_df(spark, sf_dir)
