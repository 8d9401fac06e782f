"""Ogg Opus/Vorbis metadata parser (operators/ogg.py): round-trips for
both codecs, page-CRC enforcement, pre-skip handling, loud rejection,
and the audio_metadata dispatch."""

import struct

import pytest

from thesis_iceberg_spark.operators.multimodal import audio_metadata
from thesis_iceberg_spark.operators.ogg import (
    _ogg_crc,
    build_ogg,
    parse_ogg_metadata,
)


def test_opus_roundtrip_with_preskip():
    d = parse_ogg_metadata(build_ogg("opus", 16000, 2, 30000, preskip=312))
    assert d == {
        "codec": "opus",
        "sample_rate": 16000,
        "channels": 2,
        "duration_ms": 30000,
    }


def test_vorbis_roundtrip():
    d = parse_ogg_metadata(build_ogg("vorbis", 44100, 1, 2500))
    assert d == {
        "codec": "vorbis",
        "sample_rate": 44100,
        "channels": 1,
        "duration_ms": 2500,
    }


def test_crc_matches_independent_bitwise_implementation():
    # cross-check the table-driven CRC against a from-the-definition
    # bitwise implementation (poly 0x04C11DB7, zero init, unreflected)
    def bitwise(data):
        crc = 0
        for byte in data:
            for k in range(7, -1, -1):
                bit = (byte >> k) & 1
                top = (crc >> 31) & 1
                crc = ((crc << 1) & 0xFFFFFFFF) | bit
                if top:
                    crc ^= 0x04C11DB7
        # flush 32 zero bits (the definition appends the register width)
        for _ in range(32):
            top = (crc >> 31) & 1
            crc = (crc << 1) & 0xFFFFFFFF
            if top:
                crc ^= 0x04C11DB7
        return crc

    for vec in (b"", b"\x00", b"OggS", bytes(range(64)), b"\xff" * 9):
        assert _ogg_crc(vec) == bitwise(vec), vec


def test_corrupt_page_rejected():
    b = bytearray(build_ogg("opus", 16000, 2, 30000))
    b[40] ^= 0xFF  # flip a body byte: CRC must catch it
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_ogg_metadata(bytes(b))


def test_rejections():
    good = build_ogg("opus", 16000, 2, 1000)
    with pytest.raises(ValueError, match="not an Ogg"):
        parse_ogg_metadata(b"RIFF" + b"\x00" * 40)
    with pytest.raises(ValueError, match="truncated Ogg"):
        parse_ogg_metadata(good[:30])
    # non-BOS first page
    b = bytearray(good)
    b[5] = 0x00
    struct.pack_into("<I", b, 22, 0)
    page = bytes(b[: len(good) - len(build_ogg("opus", 16000, 2, 1000)) or None])
    # recompute CRC for the mutated first page so the BOS check is what fails
    first_end = 27 + b[26] + sum(b[27 : 27 + b[26]])
    crc = _ogg_crc(bytes(b[:first_end]))
    struct.pack_into("<I", b, 22, crc)
    with pytest.raises(ValueError, match="not beginning-of-stream"):
        parse_ogg_metadata(bytes(b))
    # unknown first packet
    d = bytearray(good)
    i = d.index(b"OpusHead")
    d[i : i + 8] = b"Speeeeex"
    first_end = 27 + d[26] + sum(d[27 : 27 + d[26]])
    page = bytearray(d[:first_end])
    page[22:26] = b"\x00\x00\x00\x00"
    struct.pack_into("<I", d, 22, _ogg_crc(bytes(page)))
    with pytest.raises(ValueError, match="neither OpusHead nor Vorbis"):
        parse_ogg_metadata(bytes(d))


def test_audio_metadata_dispatches_ogg(spark):
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(build_ogg("opus", 48000, 2, 60000))),
            # 2000 ms is tick-exact at 22050 Hz (44100 granule ticks);
            # non-divisible durations floor twice (builder + parser) and
            # round-trip 1 ms low — inherent to granule arithmetic
            (2, "audio", bytearray(build_ogg("vorbis", 22050, 2, 2000))),
        ],
        "media_id LONG, kind STRING, payload BINARY",
    )
    rows = {r.media_id: r for r in audio_metadata(media).collect()}
    assert (rows[1].decoder, rows[1].sample_rate, rows[1].duration_ms) == (
        "ogg_opus",
        48000,
        60000,
    )
    assert rows[1].bits is None and rows[1].n_samples is None
    assert (rows[2].decoder, rows[2].sample_rate, rows[2].duration_ms) == (
        "ogg_vorbis",
        22050,
        2000,
    )
