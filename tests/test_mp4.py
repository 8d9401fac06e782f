"""ISO-BMFF metadata parser (operators/mp4.py): round-trip through the
builder (both mvhd versions, multi-track, largesize), loud rejection of
malformed boxes, and the video_metadata Spark operator."""

import struct

import pytest

from thesis_iceberg_spark.operators.mp4 import (
    build_mp4,
    parse_mp4_metadata,
)
from thesis_iceberg_spark.operators.multimodal import video_metadata

VID = {"handler": "vide", "codec": "avc1", "width": 640, "height": 360, "duration_ms": 5000}
AUD = {"handler": "soun", "codec": "mp4a", "width": 0, "height": 0, "duration_ms": 4900}


def test_two_track_roundtrip():
    d = parse_mp4_metadata(build_mp4(5000, [VID, AUD]))
    assert d["major_brand"] == "isom" and d["duration_ms"] == 5000
    assert d["n_tracks"] == 2
    v, a = d["tracks"]
    assert (v["handler"], v["codec"], v["width"], v["height"]) == (
        "vide",
        "avc1",
        640,
        360,
    )
    assert v["duration_ms"] == 5000
    assert (a["handler"], a["codec"], a["duration_ms"]) == ("soun", "mp4a", 4900)


def test_mvhd_version1_64bit_times():
    d = parse_mp4_metadata(
        build_mp4(3_600_000, [dict(VID, codec="hvc1")], mvhd_v1=True)
    )
    assert d["duration_ms"] == 3_600_000
    assert d["tracks"][0]["codec"] == "hvc1"


def test_largesize_box_followed():
    payload = bytearray(build_mp4(1000, [VID]))
    # rewrite the trailing 8-byte mdat as a 16-byte largesize mdat
    assert payload[-4:] == b"mdat"
    payload = payload[:-8] + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16)
    d = parse_mp4_metadata(bytes(payload))
    assert d["duration_ms"] == 1000  # moov still parsed, largesize skipped


def test_rejections():
    good = build_mp4(1000, [VID])
    with pytest.raises(ValueError, match="not an ISO-BMFF"):
        parse_mp4_metadata(b"\x00" * 32)
    with pytest.raises(ValueError, match="truncated|bad MP4 box"):
        parse_mp4_metadata(good[: len(good) - 30])
    # box size larger than its scope
    bad = bytearray(good)
    i = bad.index(b"moov") - 4
    struct.pack_into(">I", bad, i, len(good) + 100)
    with pytest.raises(ValueError, match="bad MP4 box size"):
        parse_mp4_metadata(bytes(bad))
    # ftyp-only payload: no moov/mvhd
    with pytest.raises(ValueError, match="missing moov"):
        parse_mp4_metadata(good[: good.index(b"moov") - 4])
    # zero movie timescale
    bad = bytearray(good)
    j = bad.index(b"mvhd") + 4 + 4 + 8  # fullbox header + created/modified
    struct.pack_into(">I", bad, j, 0)
    with pytest.raises(ValueError, match="zero mvhd timescale"):
        parse_mp4_metadata(bytes(bad))


def test_video_metadata_end_to_end(spark):
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(build_mp4(5000, [VID, AUD]))),
            (2, "video", bytearray(b"definitely not a container")),
            (3, "video", None),
            (4, "image", bytearray(b"skipped: not video")),
        ],
        "media_id LONG, kind STRING, payload BINARY",
    )
    rows = {r.media_id: r for r in video_metadata(media).collect()}
    assert set(rows) == {1, 2, 3}  # kind filter drops the image row
    r = rows[1]
    assert (r.major_brand, r.duration_ms, r.n_tracks) == ("isom", 5000, 2)
    assert (r.video_codec, r.width, r.height) == ("avc1", 640, 360)
    assert r.audio_codec == "mp4a" and r.decoder == "mp4"
    assert rows[2].decoder == "unsupported" and rows[2].duration_ms is None
    assert rows[3].decoder == "unsupported"


def test_spec_conformant_builder_box_sizes():
    # review r15 mp4 #2: the builder must emit SPEC layouts (v0 mvhd 108
    # bytes, tkhd 92) so the round-trip oracle exercises real offsets
    p = build_mp4(1000, [VID])
    i = p.index(b"mvhd") - 4
    assert struct.unpack_from(">I", p, i)[0] == 108
    j = p.index(b"tkhd") - 4
    assert struct.unpack_from(">I", p, j)[0] == 92


def test_empty_fullbox_degrades_with_valueerror():
    # review r15 mp4 #1: a zero-body mvhd at end of payload raised
    # IndexError past the corrupt-row contract
    p = build_mp4(1000, [VID])
    bad = p[: p.index(b"moov") - 4] + struct.pack(">I", 8) + b"mvhd"
    with pytest.raises(ValueError, match="truncated MP4 full box"):
        parse_mp4_metadata(bad)


def test_unknown_duration_sentinel_is_none():
    # review r15 mp4 #3: all-ones duration (fragmented/DASH) means
    # 'cannot be determined' — None, not 49.7 days
    p = bytearray(build_mp4(1000, [VID]))
    k = p.index(b"mvhd") + 4 + 4 + 12  # verflags + created/modified + ts
    struct.pack_into(">I", p, k, 0xFFFFFFFF)
    assert parse_mp4_metadata(bytes(p))["duration_ms"] is None
