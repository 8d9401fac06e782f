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


def test_infinite_duration_rejected():
    # review r15 mkv #1: an IEEE +inf Duration must degrade via
    # ValueError, not OverflowError at int()
    import struct as _s

    p = bytearray(build_mkv(1000, []))
    i = p.index(b"\x44\x89")  # Duration ID; 1-byte size follows
    size = p[i + 2] & 0x7F
    assert size == 8
    p[i + 3 : i + 11] = _s.pack(">d", float("inf"))
    with pytest.raises(ValueError, match="non-finite EBML float"):
        parse_mkv_metadata(bytes(p))


def test_huge_pixel_width_rejected():
    # review r15 mkv #2: a >int32 PixelWidth must degrade, not blow up
    # the Arrow int32 cast downstream
    p = bytearray(build_mkv(1000, WEBM_TRACKS))
    i = p.index(b"\xb0")  # PixelWidth ID (1 byte) inside Video
    size = p[i + 1] & 0x7F
    p[i + 1] = 0x80 | 5  # declare 5-byte body...
    p[i + 2 : i + 2 + size] = b"\x04\x00\x00\x00\x00"  # 2^34
    with pytest.raises(ValueError, match="implausible Matroska pixel width"):
        parse_mkv_metadata(bytes(p))


def test_live_file_with_unknown_size_cluster_parses():
    # review r15 mkv #5: real live WebM has unknown-size Clusters after
    # Tracks — metadata must survive, not reject
    base = build_mkv(
        9000, WEBM_TRACKS, unknown_segment_size=True, doc_type="webm"
    )
    cluster = b"\x1f\x43\xb6\x75" + b"\xff" + b"\x00" * 64  # unknown size
    d = parse_mkv_metadata(base + cluster)
    assert d["duration_ms"] == 9000 and d["n_tracks"] == 2
    assert d["tracks"][0]["codec"] == "V_VP9"


def test_multimodal_video_meta_matches_closed_form(spark, sf_dir):
    # the video sibling of the banked audio-meta candidate: Spark parses
    # actual encoded containers, the expectation is pure doc_id
    # arithmetic (mirrors the compare_query pre-certification)
    from thesis_iceberg_spark.queries.multimodal_q import (
        multimodal_video_meta_df,
    )

    rows = multimodal_video_meta_df(spark, sf_dir).limit(200).collect()
    assert rows
    for r in rows:
        i = r.doc_id
        mp4 = i % 2 == 0
        assert r.major_brand == ("isom" if mp4 else "webm")
        assert r.duration_ms == 1000 * (i % 30 + 1)
        assert r.n_tracks == (2 if mp4 or i % 5 == 0 else 1)
        codecs = ("avc1", "hvc1", "av01") if mp4 else ("V_VP8", "V_VP9", "V_AV1")
        assert r.video_codec == codecs[i % 3]
        assert (r.width, r.height) == (320 * (i % 4 + 1), 240 * (i % 4 + 1))
        assert r.audio_codec == (
            "mp4a" if mp4 else ("A_OPUS" if i % 5 == 0 else None)
        )
        assert r.decoder == ("mp4" if mp4 else "mkv")
