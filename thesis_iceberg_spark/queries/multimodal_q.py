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


def multimodal_dhash_clusters_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dhash_hex, canonical_id): 64-bit perceptual difference
    hash of every crafted gradient image, with canonical_id = the
    smallest doc_id sharing the hash — image near-dup clustering by
    perceptual key, the image-side sibling of dedup_exact_hash's
    fingerprint canonicalization (r14, df-level; REGISTERED r15
    as multimodal_dhash_clusters with the closed-form gradient twin).

    The oracle derives every hash from the gradient's CLOSED FORM while
    this side derives it from the actual encoded bytes (encode_ppm ->
    parse_ppm -> integer-luma/nearest-neighbor resample -> bit build),
    so a driver match proves the full image pipeline end to end.  Scale
    shape: one narrow Arrow map per payload (bytes never leave the
    executor) + one hash-keyed window min — the exact-dedup canonical
    pattern; at 100 TB the dHash column is write-time (hash at ingest),
    and Hamming-near grouping adds band-bucketing exactly like SimHash.
    """
    from pyspark.sql import functions as F

    from thesis_iceberg_spark.operators.multimodal import (
        documents_as_gradient_media,
        image_dhash,
    )

    media = documents_as_gradient_media(load_table(spark, sf_dir, "documents"))
    hashed = image_dhash(media).select(
        F.col("media_id").alias("doc_id"), "dhash_hex"
    )
    return dhash_clusters(hashed)


def dhash_clusters(hashed: DataFrame) -> DataFrame:
    """Canonicalize any (doc_id, dhash_hex) frame: canonical_id = the
    smallest doc_id sharing the hash.  A NULL hash is a decode FAILURE,
    which is nobody's duplicate — without the guard the window groups
    every corrupt payload into one "dup cluster" and a downstream dedup
    would drop all but one corrupt doc (r14 review #2; unreachable on
    the always-decodable gradient corpus, load-bearing for any real
    media table — rule pinned in tests/test_image_dhash.py)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    canon = F.when(
        F.col("dhash_hex").isNotNull(),
        F.min("doc_id").over(Window.partitionBy("dhash_hex")),
    )
    return hashed.select(
        "doc_id", "dhash_hex", canon.cast("bigint").alias("canonical_id")
    )


def sql_multimodal_dhash() -> str:
    """DuckDB twin of multimodal_dhash_clusters_df: the dHash of each
    crafted gradient image computed from the pixel formula alone —
    sample grid floor(i*h/8) x floor(j*w/9), bit = left > right, value
    assembled MSB-first into an unsigned 64-bit hex string (hex() via
    UBIGINT: printf('%x') rejects unsigned and BIGINT cannot hold the
    i=0,j=0 bit)."""
    return """
WITH g AS (
  SELECT doc_id, CAST(doc_id % 24 AS BIGINT) AS key,
         9 + (doc_id % 24) % 5 AS w, 8 + (doc_id % 24) % 3 AS h
  FROM documents),
bits AS (
  SELECT g.doc_id, i.i, j.j,
         (key*31 + ((j.j * w) // 9) * 53 + ((i.i * h) // 8) * 97) % 256 AS gl,
         (key*31 + (((j.j+1) * w) // 9) * 53 + ((i.i * h) // 8) * 97) % 256 AS gr
  FROM g, range(8) i(i), range(8) j(j)),
v AS (
  SELECT doc_id,
         SUM(CASE WHEN gl > gr
             THEN CAST(CAST(1 AS UBIGINT) << CAST(63 - (i*8 + j) AS INT) AS HUGEINT)
             ELSE 0 END) AS hv
  FROM bits GROUP BY doc_id),
hx AS (
  SELECT doc_id,
         lpad(lower(hex(CAST(hv AS UBIGINT))), 16, '0') AS dhash_hex
  FROM v)
SELECT doc_id, dhash_hex,
       CASE WHEN dhash_hex IS NULL THEN NULL
            ELSE CAST(MIN(doc_id) OVER (PARTITION BY dhash_hex) AS BIGINT)
            END AS canonical_id
FROM hx
"""


@register(
    "multimodal_dhash_clusters",
    oracle=sql_multimodal_dhash(),
    doc="64-bit perceptual dHash image near-dup clustering (registered "
    "r15 from the r14 queue, VERDICT r14 #1): every step INTEGER "
    "arithmetic (ITU-R 601 luma (77R+150G+29B)>>8, floor-division "
    "sample grid, left>right bits MSB-first into a 16-hex string), so "
    "the crafted-gradient corpus gives a FULL value oracle — the twin "
    "derives each hash from the pixel CLOSED FORM while Spark derives "
    "it from actual encoded bytes, so a driver match proves "
    "encode -> decode -> resample -> hash end to end. NULL hash = "
    "decode failure = nobody's duplicate. Scale shape: one narrow "
    "Arrow map per payload (bytes never leave the executor) + one "
    "hash-keyed window min, the exact-dedup canonical pattern; "
    "Hamming-near grouping band-buckets like SimHash.",
)
def multimodal_dhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal_dhash_clusters_df(spark, sf_dir)


def multimodal_audio_meta_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sample_rate, channels, bits, n_samples, duration_ms,
    decoder) for a crafted mixed WAV/FLAC corpus (r15, df-level;
    registration candidate for a future round — NEW capability family
    "container metadata" under the post-queue policy in
    queries/__init__.py).

    The dHash pattern applied to audio containers: every field of every
    crafted payload is pure arithmetic on doc_id, so the oracle derives
    the metadata from the CLOSED FORM while this side derives it from
    the actual encoded bytes (encode_wav/build_flac_streaminfo ->
    parse_wav(with_samples=False)/parse_flac_streaminfo) — a driver
    match proves both container parsers end to end.  Scale shape: one
    narrow Arrow map, header-only parsing (no PCM conversion), payload
    bytes never leave the executor."""
    from pyspark.sql import functions as F

    from thesis_iceberg_spark.operators.multimodal import (
        audio_metadata,
        documents_as_audio_media,
    )

    media = documents_as_audio_media(load_table(spark, sf_dir, "documents"))
    return audio_metadata(media).select(
        F.col("media_id").alias("doc_id"),
        "sample_rate",
        "channels",
        "bits",
        "n_samples",
        "duration_ms",
        "decoder",
    )


def sql_multimodal_audio_meta() -> str:
    """DuckDB twin of multimodal_audio_meta_df: the crafted corpus's
    closed forms re-derived in SQL (documents_as_audio_media's doc_id
    arithmetic)."""
    return """
SELECT doc_id,
       CAST(8000 * (doc_id % 3 + 1) AS INTEGER) AS sample_rate,
       CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
       CAST(CASE doc_id % 4 WHEN 0 THEN 8 WHEN 1 THEN 16
                            WHEN 2 THEN 24 ELSE 32 END AS INTEGER) AS bits,
       CAST(16 + doc_id % 7 AS BIGINT) AS n_samples,
       CAST((16 + doc_id % 7) * 1000 // (8000 * (doc_id % 3 + 1)) AS BIGINT)
           AS duration_ms,
       CASE WHEN doc_id % 5 = 0 THEN 'flac' ELSE 'wav' END AS decoder
FROM documents
"""


def multimodal_video_meta_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, major_brand, duration_ms, n_tracks, video_codec, width,
    height, audio_codec, decoder) for a crafted mixed ISO-BMFF/WebM
    corpus (r15, df-level; registration candidate — the video sibling of
    multimodal_audio_meta in the container-metadata family).

    Every field of every crafted container is pure arithmetic on
    doc_id: the oracle derives the metadata from the CLOSED FORM while
    this side parses the actual encoded boxes/EBML (build_mp4/build_mkv
    -> parse_mp4_metadata/parse_mkv_metadata) — a driver match proves
    both container parsers end to end.  Scale shape: one narrow Arrow
    map, header-only parsing, payload bytes never leave the executor."""
    from pyspark.sql import functions as F

    from thesis_iceberg_spark.operators.multimodal import (
        documents_as_video_media,
        video_metadata,
    )

    media = documents_as_video_media(load_table(spark, sf_dir, "documents"))
    return video_metadata(media).select(
        F.col("media_id").alias("doc_id"),
        "major_brand",
        "duration_ms",
        "n_tracks",
        "video_codec",
        "width",
        "height",
        "audio_codec",
        "decoder",
    )


def sql_multimodal_video_meta() -> str:
    """DuckDB twin of multimodal_video_meta_df: the crafted corpus's
    closed forms (documents_as_video_media's doc_id arithmetic)."""
    return """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'webm' END AS major_brand,
       CAST(1000 * (doc_id % 30 + 1) AS BIGINT) AS duration_ms,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 2
                 WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS INTEGER) AS n_tracks,
       CASE WHEN doc_id % 2 = 0
            THEN CASE doc_id % 3 WHEN 0 THEN 'avc1' WHEN 1 THEN 'hvc1'
                                 ELSE 'av01' END
            ELSE CASE doc_id % 3 WHEN 0 THEN 'V_VP8' WHEN 1 THEN 'V_VP9'
                                 ELSE 'V_AV1' END
       END AS video_codec,
       CAST(320 * (doc_id % 4 + 1) AS INTEGER) AS width,
       CAST(240 * (doc_id % 4 + 1) AS INTEGER) AS height,
       CASE WHEN doc_id % 2 = 0 THEN 'mp4a'
            WHEN doc_id % 5 = 0 THEN 'A_OPUS' END AS audio_codec,
       CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'mkv' END AS decoder
FROM documents
"""
