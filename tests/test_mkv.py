"""Matroska/WebM EBML metadata parser (operators/mkv.py): varint and
element round-trips, unknown-size segments, custom timestamp scale, loud
rejection, and the extended video_metadata dispatch (mp4 + mkv)."""

import pytest

from thesis_iceberg_spark.operators.mkv import (
    build_mkv,
    parse_mkv_metadata,
)
from thesis_iceberg_spark.operators.mp4 import build_mp4
from thesis_iceberg_spark.operators.multimodal import video_metadata

WEBM_TRACKS = [
    {"type": "video", "codec": "V_VP9", "width": 1280, "height": 720},
    {"type": "audio", "codec": "A_OPUS", "sample_rate": 48000, "channels": 2},
]


def test_webm_two_track_roundtrip():
    d = parse_mkv_metadata(build_mkv(72000, WEBM_TRACKS))
    assert d["doc_type"] == "webm" and d["duration_ms"] == 72000
    assert d["n_tracks"] == 2
    v, a = d["tracks"]
    assert (v["type"], v["codec"], v["width"], v["height"]) == (
        "video",
        "V_VP9",
        1280,
        720,
    )
    assert (a["type"], a["codec"], a["sample_rate"], a["channels"]) == (
        "audio",
        "A_OPUS",
        48000,
        2,
    )


def test_unknown_segment_size_and_custom_scale():
    # live-streamed Matroska: Segment length all-ones, non-default scale
    p = build_mkv(
        5000,
        [{"type": "audio", "codec": "A_VORBIS", "sample_rate": 44100, "channels": 1}],
        doc_type="matroska",
        timestamp_scale=500_000,
        unknown_segment_size=True,
    )
    d = parse_mkv_metadata(p)
    assert d["doc_type"] == "matroska" and d["duration_ms"] == 5000


def test_no_duration_is_none():
    assert parse_mkv_metadata(build_mkv(None, []))["duration_ms"] is None


def test_rejections():
    good = build_mkv(1000, WEBM_TRACKS)
    with pytest.raises(ValueError, match="not an EBML"):
        parse_mkv_metadata(b"\x00" * 32)
    with pytest.raises(ValueError, match="truncated|bad EBML|overruns"):
        parse_mkv_metadata(good[: len(good) - 10])
    # header only (EBML element: 4-byte ID + 1 size + 7-byte DocType body),
    # no Segment Info
    with pytest.raises(ValueError, match="missing Segment Info"):
        parse_mkv_metadata(good[:12])
    # zero timestamp scale
    bad = bytearray(good)
    i = bad.index(b"\x2a\xd7\xb1")  # TimestampScale ID
    # size byte follows the 3-byte ID; body follows the size byte
    size = bad[i + 3] & 0x7F
    for j in range(size):
        bad[i + 4 + j] = 0
    with pytest.raises(ValueError, match="zero Matroska timestamp scale"):
        parse_mkv_metadata(bytes(bad))


def test_video_metadata_dispatches_both_containers(spark):
    mp4 = build_mp4(
        5000,
        [{"handler": "vide", "codec": "avc1", "width": 640, "height": 360, "duration_ms": 5000}],
    )
    webm = build_mkv(72000, WEBM_TRACKS)
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(mp4)),
            (2, "video", bytearray(webm)),
            (3, "video", bytearray(b"static, not a container")),
        ],
        "media_id LONG, kind STRING, payload BINARY",
    )
    rows = {r.media_id: r for r in video_metadata(media).collect()}
    assert (rows[1].decoder, rows[1].video_codec, rows[1].width) == (
        "mp4",
        "avc1",
        640,
    )
    assert (rows[2].decoder, rows[2].major_brand, rows[2].video_codec) == (
        "mkv",
        "webm",
        "V_VP9",
    )
    assert (rows[2].duration_ms, rows[2].audio_codec) == (72000, "A_OPUS")
    assert rows[3].decoder == "unsupported"
