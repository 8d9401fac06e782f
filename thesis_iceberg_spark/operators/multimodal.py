"""Multimodal columns: binary payloads + typed metadata (north-star §2B).

Convention: media rows are ``(media_id BIGINT, kind STRING, payload BINARY,
meta STRUCT<width INT, height INT, sample_rate INT, duration_ms INT,
declared_format STRING>)``.  Image/audio/video bytes are opaque ``BINARY``;
everything the engine does with them runs through Arrow-batched
``mapInPandas`` so Python-side decoding libraries slot in per-batch without
per-row overhead.

This container has no image/audio libraries; ``decode_media`` decodes
uncompressed BMP (24/32-bit BI_RGB), PPM/PGM (P6/P5), and baseline
sequential JPEG (SOF0/SOF1 — operators/jpeg.py, from the public ITU-T
T.81 spec) with pure Python+numpy parsers, falls back to PIL when
importable for everything else, and tags undecodable payloads
``decoder='unsupported'``.  ``decode_audio`` does the same for
uncompressed RIFF/WAV PCM (operators/wav.py).
``media_features`` computes a DETERMINISTIC FAKE feature vector (byte
statistics) clearly marked as such.  The Spark-side plumbing — schemas,
partitioning, UDF signatures, Arrow batch shapes — is real and tested.

Scale notes: mapInPandas streams Arrow batches (bounded memory per task);
payloads never hit the driver; feature extraction is a narrow map so the
operator inherits the input partitioning (at 100 TB: one pass, no shuffle).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
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

# the meta-less media shape both crafted-corpus producers emit (r14
# review #5: the literal existed verbatim in documents_as_image_media
# AND documents_as_gradient_media — one constant, no silent divergence)
RAW_MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)

# Real magic-byte sniffing — works on genuine media bytes; returns 'unknown'
# for anything else (including the text-derived fake payloads in tests).
_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
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


AUDIO_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms", DoubleType()),
        StructField("decoder", StringType()),
    ]
)


def decode_audio(media: DataFrame) -> DataFrame:
    """Decode audio payloads to (sample_rate, channels, bits, n_samples,
    duration_ms, rms) — the audio twin of decode_media.

    Executable WITHOUT audio libraries: uncompressed RIFF/WAV PCM
    (integer 8/16/24/32-bit and IEEE float, incl. WAVE_FORMAT_EXTENSIBLE)
    decodes in pure Python + numpy (operators/wav.py); payloads no decoder
    accepts come back with NULL fields and decoder='unsupported' instead
    of failing the batch.  ``rms`` is over the [-1, 1]-normalized samples.
    Narrow Arrow map — payload bytes never leave the executor."""
    from .wav import parse_wav

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    d = parse_wav(payload) if payload else None
                except ValueError:
                    d = None
                if d is None:
                    rows.append(
                        {
                            "media_id": media_id,
                            "sample_rate": None,
                            "channels": None,
                            "bits": None,
                            "n_samples": None,
                            "duration_ms": None,
                            "rms": None,
                            "decoder": "unsupported",
                        }
                    )
                else:
                    s = d["samples"]
                    rows.append(
                        {
                            "media_id": media_id,
                            "sample_rate": d["sample_rate"],
                            "channels": d["channels"],
                            "bits": d["bits"],
                            "n_samples": d["n_samples"],
                            "duration_ms": d["duration_ms"],
                            "rms": float(np.sqrt((s * s).mean())) if s.size else 0.0,
                            "decoder": "wav",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_DECODE_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(decode, AUDIO_DECODE_SCHEMA)
    )


def documents_as_audio_media(docs: DataFrame) -> DataFrame:
    """Crafted audio-container table for the metadata path: each document
    becomes a tiny WAV (or, every fifth doc, a FLAC STREAMINFO header)
    whose fields are pure arithmetic on doc_id, so a SQL oracle can
    predict audio_metadata's output exactly:
    rate = 8000 * (doc_id%3 + 1), channels = doc_id%2 + 1,
    bits = (8,16,24,32)[doc_id%4], n_samples = 16 + doc_id%7,
    container = flac when doc_id%5 = 0 else wav."""
    from .flac import build_flac_streaminfo
    from .wav import encode_wav

    import numpy as np

    def craft(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                rate = 8000 * (i % 3 + 1)
                channels = i % 2 + 1
                bits = (8, 16, 24, 32)[i % 4]
                n = 16 + i % 7
                if i % 5 == 0:
                    payloads.append(
                        build_flac_streaminfo(rate, channels, bits, n)
                    )
                else:
                    payloads.append(
                        encode_wav(rate, np.zeros((n, channels)), bits=bits)
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "audio",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(craft, RAW_MEDIA_SCHEMA)


def documents_as_video_media(docs: DataFrame) -> DataFrame:
    """Crafted video-container table for the metadata path: each document
    becomes a tiny ISO-BMFF (even doc_id) or WebM/EBML (odd) container
    whose fields are pure arithmetic on doc_id, so a SQL oracle can
    predict video_metadata's output exactly:
    duration_ms = 1000 * (doc_id % 30 + 1), width = 320 * (doc_id % 4 + 1),
    height = 240 * (doc_id % 4 + 1), video codec cycles avc1/hvc1/av01
    (mp4) or V_VP8/V_VP9/V_AV1 (webm) by doc_id % 3, audio track
    present when doc_id % 2 == 0 (mp4a) / doc_id % 5 == 0 (A_OPUS)."""
    from .mkv import build_mkv
    from .mp4 import build_mp4

    def craft(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                dur = 1000 * (i % 30 + 1)
                w, h = 320 * (i % 4 + 1), 240 * (i % 4 + 1)
                if i % 2 == 0:
                    codec = ("avc1", "hvc1", "av01")[i % 3]
                    tracks = [
                        {
                            "handler": "vide",
                            "codec": codec,
                            "width": w,
                            "height": h,
                            "duration_ms": dur,
                        },
                        {
                            "handler": "soun",
                            "codec": "mp4a",
                            "width": 0,
                            "height": 0,
                            "duration_ms": dur,
                        },
                    ]
                    payloads.append(build_mp4(dur, tracks))
                else:
                    codec = ("V_VP8", "V_VP9", "V_AV1")[i % 3]
                    tracks = [
                        {"type": "video", "codec": codec, "width": w, "height": h}
                    ]
                    if i % 5 == 0:
                        tracks.append(
                            {
                                "type": "audio",
                                "codec": "A_OPUS",
                                "sample_rate": 48000,
                                "channels": 2,
                            }
                        )
                    payloads.append(build_mkv(dur, tracks))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "video",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(craft, RAW_MEDIA_SCHEMA)


AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("decoder", StringType()),
    ]
)


def audio_metadata(media: DataFrame) -> DataFrame:
    """Container-level audio metadata WITHOUT decoding samples: WAV headers
    (parse_wav with_samples=False — validates the stream, skips the PCM
    conversion), FLAC STREAMINFO (operators/flac.py — rate/channels/
    bits/total straight from the mandatory first block), and Ogg
    Opus/Vorbis (operators/ogg.py — id-header fields + page-walk
    duration, CRC-verified, packet payloads never materialized).  The
    audio twin of video_metadata for corpus curation; unparseable
    payloads degrade to decoder='unsupported'."""
    from .flac import parse_flac_streaminfo
    from .ogg import parse_ogg_metadata
    from .wav import parse_wav

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                d = None
                tag = "unsupported"
                try:
                    if payload and payload[:4] == b"fLaC":
                        d = parse_flac_streaminfo(bytes(payload))
                        tag = "flac"
                    elif payload and payload[:4] == b"OggS":
                        o = parse_ogg_metadata(bytes(payload))
                        d = {
                            "sample_rate": o["sample_rate"],
                            "channels": o["channels"],
                            "bits": None,  # lossy codecs have no PCM depth
                            "n_samples": None,
                            "duration_ms": o["duration_ms"],
                        }
                        tag = "ogg_" + o["codec"]
                    elif payload:
                        d = parse_wav(bytes(payload), with_samples=False)
                        tag = "wav"
                except ValueError:
                    d, tag = None, "unsupported"
                rows.append(
                    {
                        "media_id": media_id,
                        "sample_rate": d["sample_rate"] if d else None,
                        "channels": d["channels"] if d else None,
                        "bits": d["bits"] if d else None,
                        "n_samples": d["n_samples"] if d else None,
                        "duration_ms": d["duration_ms"] if d else None,
                        "decoder": tag,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(extract, AUDIO_META_SCHEMA)
    )


VIDEO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("major_brand", StringType()),
        StructField("duration_ms", LongType()),
        StructField("n_tracks", IntegerType()),
        StructField("video_codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("audio_codec", StringType()),
        StructField("decoder", StringType()),
    ]
)


def video_metadata(media: DataFrame) -> DataFrame:
    """Container-level video metadata WITHOUT decoding a frame: ISO-BMFF
    (operators/mp4.py) and Matroska/WebM (operators/mkv.py) — duration,
    track count, first video/audio codecs and video dimensions, the
    fields corpus curation filters on.  ``major_brand`` carries the mp4
    brand or the EBML DocType.  Unparseable payloads degrade to
    decoder='unsupported' (the decode_media corrupt-row convention).
    Narrow Arrow map — payload bytes never leave the executor."""
    from .mkv import MAGIC as _EBML_MAGIC
    from .mkv import parse_mkv_metadata
    from .mp4 import parse_mp4_metadata

    def normalized(payload: bytes) -> tuple[str, str, dict, dict | None, dict | None]:
        """(decoder, brand, parsed, first-video-track, first-audio-track)
        with both parsers' track lists reduced to a common shape, so the
        row dict below is built exactly once (review r15 mkv #6)."""
        if payload[:4] == _EBML_MAGIC:
            d = parse_mkv_metadata(payload)
            vid = next((t for t in d["tracks"] if t["type"] == "video"), None)
            aud = next((t for t in d["tracks"] if t["type"] == "audio"), None)
            return "mkv", d["doc_type"], d, vid, aud
        d = parse_mp4_metadata(payload)
        vid = next((t for t in d["tracks"] if t["handler"] == "vide"), None)
        aud = next((t for t in d["tracks"] if t["handler"] == "soun"), None)
        return "mp4", d["major_brand"], d, vid, aud

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if not payload:
                        raise ValueError("empty payload")
                    decoder, brand, d, vid, aud = normalized(bytes(payload))
                    row = {
                        "major_brand": brand,
                        "duration_ms": d["duration_ms"],
                        "n_tracks": d["n_tracks"],
                        "video_codec": vid["codec"] if vid else None,
                        "width": vid["width"] if vid else None,
                        "height": vid["height"] if vid else None,
                        "audio_codec": aud["codec"] if aud else None,
                        "decoder": decoder,
                    }
                except ValueError:
                    row = dict.fromkeys(
                        (f.name for f in VIDEO_META_SCHEMA.fields[1:-1]), None
                    )
                    row["decoder"] = "unsupported"
                rows.append({"media_id": media_id, **row})
            yield pd.DataFrame(
                rows, columns=[f.name for f in VIDEO_META_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(extract, VIDEO_META_SCHEMA)
    )


SPECTROGRAM_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("band_energies", ArrayType(DoubleType())),
    ]
)


def audio_spectrogram(
    media: DataFrame, n_fft: int = 256, hop: int = 128, n_bands: int = 16
) -> DataFrame:
    """REAL spectrogram over decoded WAV PCM: Hann-windowed frames ->
    |rFFT|^2 -> log-spaced band energies (log10, floored at 1e-12) — the
    training-pipeline audio featurization the fake byte-window op
    (audio_window_features) stands in for when payloads aren't decodable.

    Channels are mono-mixed (mean); frames hop by ``hop`` samples; bins
    fold into ``n_bands`` log-spaced bands so the output row is a bounded
    array instead of n_fft/2 columns.  Undecodable payloads emit NOTHING
    (the per-row corrupt convention belongs to decode_audio; a featurizer
    emitting NULL arrays would poison downstream aggregates).  Narrow
    Arrow map, 1-row-in N-rows-out — payloads never leave the executor."""
    from .wav import parse_wav

    import numpy as np

    if n_fft < 2 * n_bands or hop <= 0:
        raise ValueError("need n_fft >= 2*n_bands and hop > 0")
    window = np.hanning(n_fft)
    # log-spaced band edges over rfft bins 1..n_fft/2 (skip DC), monotone
    # and non-empty by construction
    edges = np.unique(
        np.round(np.geomspace(1, n_fft // 2, n_bands + 1)).astype(int)
    )

    chunk_frames = 4096  # bound transient FFT memory: a max-length WAV at
    # the _MAX_SAMPLES cap yields ~524k frames — materializing them all at
    # once costs GBs (review r15 #4); per-chunk it is ~8 MB

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    d = parse_wav(payload) if payload else None
                except ValueError:
                    d = None
                if d is None or d["n_samples"] < n_fft:
                    continue
                mono = d["samples"].mean(axis=1)
                n_frames = 1 + (mono.size - n_fft) // hop
                pad = n_bands - (len(edges) - 1)  # unique() may collapse edges
                for start in range(0, n_frames, chunk_frames):
                    count = min(chunk_frames, n_frames - start)
                    idx = (
                        np.arange(n_fft)[None, :]
                        + hop * (start + np.arange(count))[:, None]
                    )
                    spec = np.abs(np.fft.rfft(mono[idx] * window, axis=1)) ** 2
                    # fold bins into [lo, hi) bands in one vectorized pass
                    folded = np.add.reduceat(spec[:, : edges[-1]], edges[:-1], axis=1)
                    folded = np.log10(np.maximum(folded, 1e-12))
                    floor = float(np.log10(1e-12))
                    for f in range(count):
                        bands = folded[f].tolist() + [floor] * pad
                        rows.append(
                            {
                                "media_id": media_id,
                                "frame_idx": start + f,
                                "band_energies": bands,
                            }
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SPECTROGRAM_SCHEMA.fields]
            )

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(frames, SPECTROGRAM_SCHEMA)
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


# ---------------------------------------------------------------------------
# Pure-Python image decode: uncompressed BMP (24/32-bit BI_RGB) and binary
# PPM/PGM (P6/P5).  These make decode_media executable end-to-end without any
# image library; PIL, when importable, extends coverage to compressed formats
# (png/jpeg/...).  Format specs are public: BITMAPFILEHEADER/BITMAPINFOHEADER
# (Windows BMP) and the Netpbm P5/P6 headers.
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, pixels) -> bytes:
    """Build a 24-bit uncompressed (BI_RGB) bottom-up BMP.

    ``pixels`` is ``height`` rows top-to-bottom, each ``width`` ``(r, g, b)``
    tuples.  Rows are stored bottom-up as BGR with 4-byte row padding, per the
    BMP spec — exactly the layout parse_bmp must undo."""
    if len(pixels) != height or any(len(row) != width for row in pixels):
        raise ValueError("pixels must be height rows of width (r,g,b) tuples")
    pad = (4 - (width * 3) % 4) % 4
    body = bytearray()
    for row in reversed(pixels):
        for r, g, b in row:
            body += bytes((b, g, r))
        body += b"\x00" * pad
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + bytes(body)


def encode_ppm(width: int, height: int, pixels, *, gray: bool = False) -> bytes:
    """Build a binary Netpbm image: P6 (RGB) or, with ``gray=True``, P5
    (single-channel; the red value of each pixel tuple is used)."""
    if len(pixels) != height or any(len(row) != width for row in pixels):
        raise ValueError("pixels must be height rows of width (r,g,b) tuples")
    magic = b"P5" if gray else b"P6"
    body = bytearray()
    for row in pixels:
        for px in row:
            body += bytes((px[0],)) if gray else bytes(px[:3])
    return magic + b"\n%d %d\n255\n" % (width, height) + bytes(body)


def parse_bmp(payload: bytes) -> dict:
    """Parse an uncompressed 24/32-bit BI_RGB BMP without any image library.

    Returns ``{width, height, mode, px_mean, pixels}`` where ``pixels`` is a
    top-down ``(height, width, channels)`` uint8 RGB(A) array and ``px_mean``
    is the exact mean over every stored channel byte (int sum / int count in
    IEEE double).  Handles bottom-up (positive height) and top-down (negative
    height) storage, 4-byte row padding, and any BITMAPINFOHEADER-or-later
    header via the pixel-array offset.  Raises ValueError on anything else
    (compressed, paletted, truncated)."""
    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:  # BITMAPCOREHEADER etc. — not supported
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, raw_height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = raw_height < 0
    height = -raw_height if top_down else raw_height
    if width <= 0 or height <= 0:
        raise ValueError(f"bad BMP dimensions {width}x{raw_height}")
    channels = bpp // 8
    stride = ((width * channels + 3) // 4) * 4
    # the declared pixel-array offset must lie PAST both headers (a
    # malformed offset of 0, or one pointing into the header, would
    # otherwise silently decode header bytes as pixels) — reject so the
    # payload falls through to PIL/unsupported (ADVICE r9)
    if offset < 14 + hdr_size or offset > len(payload):
        raise ValueError(
            f"bad BMP pixel-array offset {offset} (headers end at {14 + hdr_size})"
        )
    need = offset + stride * height
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} bytes, need {need}")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=offset)
    rows = rows.reshape(height, stride)[:, : width * channels]
    px = rows.reshape(height, width, channels)
    if not top_down:
        px = px[::-1]
    # stored order is BGR(A) -> return RGB(A)
    px = px[:, :, [2, 1, 0, 3] if channels == 4 else [2, 1, 0]]
    return {
        "width": width,
        "height": height,
        "mode": "RGBA" if channels == 4 else "RGB",
        "px_mean": float(int(px.sum())) / px.size,
        "pixels": np.ascontiguousarray(px),
    }


def parse_ppm(payload: bytes) -> dict:
    """Parse a binary Netpbm image (P6 RGB / P5 grayscale, maxval <= 255)
    without any image library.  Honors '#' comments in the header and the
    single whitespace byte that terminates it.  Returns the same dict shape
    as parse_bmp (mode 'RGB' or 'L'); raises ValueError otherwise."""
    import numpy as np

    magic = payload[:2]
    if magic not in (b"P6", b"P5") or len(payload) < 7:
        raise ValueError("not a binary PPM/PGM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PPM comment")
            pos = nl + 1
        elif c.isdigit():
            start = pos
            while pos < len(payload) and payload[pos : pos + 1].isdigit():
                pos += 1
            tokens.append(int(payload[start:pos]))
        else:
            raise ValueError(f"bad PPM header byte {c!r}")
    if pos >= len(payload) or payload[pos : pos + 1] not in b" \t\r\n":
        raise ValueError("PPM header must end with one whitespace byte")
    pos += 1
    width, height, maxval = tokens
    if width <= 0 or height <= 0 or not 0 < maxval <= 255:
        raise ValueError(f"bad PPM geometry {width}x{height} maxval={maxval}")
    channels = 3 if magic == b"P6" else 1
    need = width * height * channels
    if len(payload) - pos < need:
        raise ValueError(f"truncated PPM: {len(payload) - pos} bytes, need {need}")
    px = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    px = px.reshape(height, width, channels)
    return {
        "width": width,
        "height": height,
        "mode": "RGB" if channels == 3 else "L",
        "px_mean": float(int(px.sum())) / px.size,
        "pixels": px,
    }


_PIL_OK: bool | None = None


def _pil_available() -> bool:
    """Probe PIL ONCE per process: a FAILED import is not cached by Python,
    so probing per payload would rescan sys.path for every corrupt row."""
    global _PIL_OK
    if _PIL_OK is None:
        try:  # pragma: no cover - PIL not installed in this container
            import PIL  # noqa: F401

            _PIL_OK = True
        except ImportError:
            _PIL_OK = False
    return _PIL_OK


def decode_image_payload(payload: bytes | None) -> dict | None:
    """Dispatch one payload to a decoder: pure-Python BMP/PPM first, PIL (if
    importable) for everything else.  Returns the parse dict plus a
    ``decoder`` tag, or None when nothing can decode it."""
    if not payload:
        return None
    try:
        if payload[:2] == b"BM":
            return {**parse_bmp(payload), "decoder": "bmp"}
        if payload[:2] in (b"P6", b"P5"):
            return {**parse_ppm(payload), "decoder": "ppm"}
        if payload[:3] == b"\xff\xd8\xff":
            from .jpeg import parse_jpeg

            return {**parse_jpeg(payload), "decoder": "jpeg"}
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            from .png import parse_png

            return {**parse_png(payload), "decoder": "png"}
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from .gif import parse_gif

            return {**parse_gif(payload), "decoder": "gif"}
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            from .tiff import parse_tiff

            return {**parse_tiff(payload), "decoder": "tiff"}
    except ValueError:
        # a payload the pure-Python parsers reject (compressed/paletted/
        # 16-bit BMP, maxval > 255 PPM, progressive/arithmetic/12-bit/CMYK
        # JPEG, truncated...) falls THROUGH to PIL, which decodes several
        # of those variants — only if PIL also fails is the payload
        # unsupported
        pass
    if not _pil_available():
        return None
    try:  # pragma: no cover - PIL not installed in this container
        import io

        from PIL import Image
        import numpy as np

        img = Image.open(io.BytesIO(payload))
        arr = np.asarray(img)
        return {
            "width": img.width,
            "height": img.height,
            "mode": img.mode,
            "px_mean": float(int(arr.sum())) / arr.size if arr.size else None,
            "pixels": arr,
            "decoder": "pil",
        }
    except Exception:
        return None


DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("decoder", StringType()),
        StructField("px_mean", DoubleType()),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode image payloads to (width, height, mode, px_mean).

    Executable WITHOUT image libraries: uncompressed BMP (24/32-bit BI_RGB)
    and binary PPM/PGM decode in pure Python + numpy inside Arrow batches;
    PIL, when importable, extends coverage to compressed formats.  Payloads
    no decoder accepts come back with NULL dims and decoder='unsupported'
    instead of failing the batch (at 100 TB a corrupt file must not kill the
    job).  Narrow map — inherits input partitioning, payload bytes never
    leave the executor."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_image_payload(payload)
                if d is None:
                    rows.append(
                        {
                            "media_id": media_id,
                            "width": None,
                            "height": None,
                            "mode": None,
                            "decoder": "unsupported",
                            "px_mean": None,
                        }
                    )
                else:
                    rows.append(
                        {
                            "media_id": media_id,
                            "width": d["width"],
                            "height": d["height"],
                            "mode": d["mode"],
                            "decoder": d["decoder"],
                            "px_mean": d["px_mean"],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_SCHEMA.fields])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(decode, DECODE_SCHEMA)
    )


def documents_as_image_media(docs: DataFrame) -> DataFrame:
    """Crafted-image media table for the decode path: each document becomes a
    tiny solid-color uncompressed image whose dims and color are pure
    arithmetic on doc_id (even doc_id -> 24-bit BMP, odd -> binary PPM P6),
    so a SQL oracle can predict the decoded output exactly:
    width = doc_id%4+1, height = doc_id%3+1,
    color = (doc_id%256, doc_id*7%256, doc_id*13%256)."""

    def craft(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                i = int(i)
                w, h = i % 4 + 1, i % 3 + 1
                rgb = (i % 256, i * 7 % 256, i * 13 % 256)
                px = [[rgb] * w] * h
                payloads.append(
                    encode_bmp(w, h, px) if i % 2 == 0 else encode_ppm(w, h, px)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(craft, RAW_MEDIA_SCHEMA)


# --- perceptual hash (dHash) image near-dup (r14, df-level) ------------------
#
# The image-side sibling of the text dedup family: a 64-bit DIFFERENCE
# hash (Krawetz dHash) — grayscale, resample to a 9x8 grid, bit =
# left-pixel > right-pixel — groups perceptually identical images under
# one key, exactly how web-scale image dedup buckets before pairwise
# verification.  Every step is INTEGER arithmetic chosen for
# determinism: luma = (77R + 150G + 29B) >> 8 (the integer ITU-R 601
# weights — no float rounding to diverge between engines), resample =
# nearest-neighbor at index floor(i*h/H) (exact integer division, no
# interpolation), hash emitted as a 16-hex-char string (unsigned 64-bit
# safe in every engine).  The whole encode -> decode -> resample ->
# hash pipeline is value-oracle-able over crafted GRADIENT images whose
# pixels are closed-form arithmetic on doc_id — the oracle derives the
# hash from the formula while Spark derives it from the actual bytes,
# so a driver match proves the full image path end to end.

DHASH_GRID_W, DHASH_GRID_H = 9, 8  # 9 columns -> 8 diffs x 8 rows = 64 bits


def dhash_from_pixels(px) -> str:
    """16-hex-char 64-bit dHash of a (h, w[, channels]) uint8 array.
    Integer-only: ITU-R 601 luma via (77R+150G+29B)>>8, nearest-neighbor
    grid at floor(i*h/H) / floor(j*w/W), row-major bits MSB-first."""
    import numpy as np

    a = np.asarray(px)
    if a.ndim == 3:
        if a.shape[2] >= 3:
            gray = (
                77 * a[:, :, 0].astype(np.int64)
                + 150 * a[:, :, 1].astype(np.int64)
                + 29 * a[:, :, 2].astype(np.int64)
            ) >> 8
        else:
            gray = a[:, :, 0].astype(np.int64)
    else:
        gray = a.astype(np.int64)
    h, w = gray.shape
    ys = [(i * h) // DHASH_GRID_H for i in range(DHASH_GRID_H)]
    xs = [(j * w) // DHASH_GRID_W for j in range(DHASH_GRID_W)]
    g = gray[np.ix_(ys, xs)]
    bits = (g[:, :-1] > g[:, 1:]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return f"{v:016x}"


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash_hex", StringType()),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """(media_id, dhash_hex) for every image payload; undecodable payloads
    hash to NULL (the decode_media corrupt-row convention).  Narrow Arrow
    map — payload bytes never leave the executor."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_image_payload(payload)
                rows.append(
                    (
                        media_id,
                        dhash_from_pixels(d["pixels"])
                        if d is not None and d.get("pixels") is not None
                        else None,
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "dhash_hex"])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(hash_batch, DHASH_SCHEMA)
    )


def documents_as_gradient_media(docs: DataFrame) -> DataFrame:
    """Crafted GRADIENT image corpus for the perceptual-hash path: each
    document becomes a binary PGM (P5 grayscale) whose pixel (y, x) is
    the closed form (key*31 + x*53 + y*97) % 256 with key = doc_id % 24,
    w = 9 + key % 5, h = 8 + key % 3 — so (a) the dHash is predictable
    by pure arithmetic (the SQL oracle derives it from the formula, no
    image decoding), (b) non-divisible dims exercise the resample, (c)
    documents sharing a key are pixel-identical -> genuine
    perceptual-dup clusters for the grouping stage, and (d) the
    multipliers (53, 97) make the 24 key-images pairwise dHash-DISTINCT
    (measured; gentler gradients like (7, 13) collapse 10 keys into the
    all-zero hash — dHash is honestly lossy on monotone gradients)."""

    def craft(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                key = int(i) % 24
                w, h = 9 + key % 5, 8 + key % 3
                y, x = np.mgrid[0:h, 0:w]
                px = ((key * 31 + x * 53 + y * 97) % 256).astype(np.uint8)
                payloads.append(encode_ppm(w, h, px[:, :, None], gray=True))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(craft, RAW_MEDIA_SCHEMA)
