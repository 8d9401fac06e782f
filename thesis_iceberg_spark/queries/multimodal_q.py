"""Registered queries for the multimodal-column operators (north-star §2B).

The media table is derived deterministically from `documents` (payload =
utf-8 text bytes) so the Arrow/mapInPandas plumbing is exercised against
real data; see operators/multimodal.py for the schema convention and the
decode-stub policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from thesis_iceberg_spark.operators.multimodal import (
    decode_media,
    documents_as_image_media,
    documents_as_media,
    media_features,
    media_metadata,
)
from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.sources.registry import load_table


@register(
    "multimodal_metadata",
    oracle="""
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS payload_sha256,
       'unknown' AS sniffed_format
FROM documents
""",
    doc="Binary-payload metadata extraction (mapInPandas over Arrow "
    "batches): byte length, sha256, magic-byte format sniff. The oracle "
    "reproduces it in SQL — the fake payloads are text bytes, so the sniff "
    "is constant 'unknown' (real media bytes hit the magic-byte table).",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return media_metadata(media)


@register(
    "multimodal_features",
    # The fake features are byte statistics over utf-8 text bytes; the corpus
    # is pure ASCII (verified for all SFs), so per-character code points ARE
    # the bytes and DuckDB reproduces the exact values:
    #   byte_mean = CAST(SUM(code) AS DOUBLE)/COUNT — the same IEEE division
    #   numpy does (integer sums are exact in both engines).
    oracle="""
WITH codes AS (
    SELECT doc_id,
           unnest(list_transform(split(text, ''), c -> ascii(c))) AS code
    FROM documents
),
stats AS (
    SELECT doc_id,
           COUNT(*) AS n_bytes,
           CAST(SUM(code) AS DOUBLE) / COUNT(*) AS byte_mean,
           CAST(MIN(code) AS INT) AS byte_min,
           CAST(MAX(code) AS INT) AS byte_max
    FROM codes GROUP BY doc_id
)
SELECT d.doc_id AS media_id,
       CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       s.n_bytes,
       s.byte_mean,
       s.byte_min,
       s.byte_max,
       CAST((d.doc_id % 16) * 64 AS INT) AS width,
       CAST((d.doc_id % 9) * 64 AS INT) AS height
FROM documents d JOIN stats s USING (doc_id)
""",
    doc="DETERMINISTIC-FAKE feature extraction standing in for decode->"
    "featurize (no image/audio libs in this container): per-payload byte "
    "statistics + meta passthrough, via Arrow-batched mapInPandas. "
    "Value-oracled: the fake features are pure byte math DuckDB reproduces.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    return media_features(media)


@register(
    "multimodal_decode_image",
    # The crafted corpus is solid-color uncompressed images whose dims and
    # color are pure doc_id arithmetic (documents_as_image_media), so the
    # decoded output is exactly predictable in SQL.  px_mean: a solid-color
    # image's channel-byte mean is (r+g+b)/3 — the decoder computes
    # int-sum/int-count and IEEE division is correctly rounded, so dividing
    # w*h*(r+g+b) by 3*w*h and (r+g+b) by 3 yield the identical double.
    oracle="""
SELECT doc_id AS media_id,
       CAST(doc_id % 4 + 1 AS INT) AS width,
       CAST(doc_id % 3 + 1 AS INT) AS height,
       'RGB' AS mode,
       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS decoder,
       CAST(doc_id % 256 + (doc_id * 7) % 256 + (doc_id * 13) % 256 AS DOUBLE)
           / 3 AS px_mean
FROM documents
""",
    doc="REAL image decode with no image library: pure-Python uncompressed "
    "BMP (24-bit BI_RGB, bottom-up, row-padded) and binary PPM P6 decoders "
    "run inside Arrow-batched mapInPandas over a crafted corpus of solid-"
    "color images derived from doc_id. Every decoded width/height/mode/"
    "pixel-mean is value-oracled against doc_id arithmetic in DuckDB.",
)
def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_image_media(load_table(spark, sf_dir, "documents"))
    return decode_media(media)
