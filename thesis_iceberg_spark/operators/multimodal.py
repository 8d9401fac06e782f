"""Multimodal columns: binary payloads + typed metadata (north-star §2B).

Convention: media rows are ``(media_id BIGINT, kind STRING, payload BINARY,
meta STRUCT<width INT, height INT, sample_rate INT, duration_ms INT,
declared_format STRING>)``.  Image/audio/video bytes are opaque ``BINARY``;
everything the engine does with them runs through Arrow-batched
``mapInPandas`` so Python-side decoding libraries slot in per-batch without
per-row overhead.

This container has no image/audio libraries, so the DECODE step is stubbed:
``decode_media`` raises ``NotImplementedError`` unless PIL is importable,
and ``media_features`` computes a DETERMINISTIC FAKE feature vector (byte
statistics) clearly marked as such.  The Spark-side plumbing — schemas,
partitioning, UDF signatures, Arrow batch shapes — is real and tested.

Scale notes: mapInPandas streams Arrow batches (bounded memory per task);
payloads never hit the driver; feature extraction is a narrow map so the
operator inherits the input partitioning (at 100 TB: one pass, no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("declared_format", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", META_SCHEMA),
    ]
)

KINDS = ("image", "audio", "video")

# Real magic-byte sniffing — works on genuine media bytes; returns 'unknown'
# for anything else (including the text-derived fake payloads in tests).
_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"RIFF", "riff"),  # wav/avi container
    (b"OggS", "ogg"),
    (b"fLaC", "flac"),
    (b"\x1a\x45\xdf\xa3", "matroska"),
)


def sniff_format(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    for magic, name in _MAGIC:
        if payload[: len(magic)] == magic:
            return name
    if len(payload) > 11 and payload[4:8] == b"ftyp":
        return "mp4"
    return "unknown"


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from `documents` (for tests:
    payload = utf-8 text bytes, kind cycles image/audio/video by doc_id)."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    meta = F.struct(
        ((F.col("doc_id") % 16).cast("int") * 64).alias("width"),
        ((F.col("doc_id") % 9).cast("int") * 64).alias("height"),
        F.lit(16000).alias("sample_rate"),
        ((F.col("doc_id") % 30).cast("int") * 1000).alias("duration_ms"),
        F.lit("synthetic").alias("declared_format"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        meta.alias("meta"),
    )


METADATA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha256", StringType()),
        StructField("sniffed_format", StringType()),
    ]
)


def media_metadata(media: DataFrame) -> DataFrame:
    """Per-payload metadata extraction via Arrow-batched mapInPandas:
    byte length, sha256, magic-byte format sniffing."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "payload_sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "sniffed_format": payloads.map(sniff_format),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(extract, METADATA_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_min", IntegerType()),
        StructField("byte_max", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def media_features(media: DataFrame) -> DataFrame:
    """DETERMINISTIC FAKE feature extraction (byte statistics standing in for
    a real decode->featurize step). Real plumbing: Arrow batches in, typed
    rows out, meta struct fields carried through."""
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                b = np.frombuffer(row["payload"] or b"\x00", dtype=np.uint8)
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": int(b.size),
                        "byte_mean": float(b.sum()) / b.size,  # exact: int sum / int
                        "byte_min": int(b.min()),
                        "byte_max": int(b.max()),
                        "width": row["meta"]["width"],
                        "height": row["meta"]["height"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload", "meta").mapInPandas(
        featurize, FEATURES_SCHEMA
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha256", StringType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame sampling for video payloads — the 1-row-in, N-rows-out shape a
    real decoder needs (mapInPandas yields MORE rows than it consumes; no
    UDTF, no explode of a driver-built array).

    DECODE IS STUBBED (no video libs in this container): a "frame" is a
    deterministic fixed-width byte slice of the payload, frame count =
    duration_ms / 33 (30fps). The partitioning, Arrow batch shape and
    output contract are exactly what a PyAV/ffmpeg decoder drops into.

    Scale: narrow map, inherits input partitioning; emitted rows stay on
    the executor that decoded them — one pass, no shuffle."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                n_frames = max((row["meta"]["duration_ms"] or 0) // 33, 1)
                width = max(len(payload) // n_frames, 1)
                for idx in range(0, int(n_frames), every_nth):
                    chunk = payload[idx * width : (idx + 1) * width]
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": idx,
                            "frame_sha256": hashlib.sha256(chunk).hexdigest(),
                            "frame_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload", "meta")
        .mapInPandas(frames, FRAMES_SCHEMA)
    )


AUDIO_WINDOWS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("window_idx", IntegerType()),
        StructField("win_mean", DoubleType()),
        StructField("win_rms", DoubleType()),
    ]
)


def audio_window_features(media: DataFrame, window_bytes: int = 256) -> DataFrame:
    """Windowed audio featurization (fake spectrogram frames): fixed-size
    byte windows -> per-window mean and RMS, vectorized with numpy inside
    Arrow batches. Stands in for an STFT over PCM samples — the windowing,
    1-to-N row fan-out and numeric output shape are the real contract."""
    import numpy as np

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                b = np.frombuffer(row["payload"] or b"\x00", dtype=np.uint8)
                n_win = max(b.size // window_bytes, 1)
                for idx in range(n_win):
                    w = b[idx * window_bytes : (idx + 1) * window_bytes].astype(np.float64)
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "window_idx": idx,
                            "win_mean": float(w.sum()) / w.size,
                            "win_rms": float(np.sqrt((w * w).sum() / w.size)),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_WINDOWS_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(windows, AUDIO_WINDOWS_SCHEMA)
    )


def decode_media(media: DataFrame) -> DataFrame:
    """Decode image payloads to (width, height, mode) using PIL.

    STUB in this environment: the image libraries are not installed, so this
    raises ``NotImplementedError`` at call time unless PIL is importable.
    The mapInPandas signature and output schema are the real contract.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env without PIL
        raise NotImplementedError(
            "decode_media requires PIL, which is not installed in this "
            "container; media_features provides the deterministic fake path"
        ) from exc

    import io

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mode", StringType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        from PIL import Image

        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                img = Image.open(io.BytesIO(row["payload"]))
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "width": img.width,
                        "height": img.height,
                        "mode": img.mode,
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        decode, schema
    )
