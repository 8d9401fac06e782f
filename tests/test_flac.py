"""FLAC STREAMINFO parser (operators/flac.py) and the audio_metadata
operator: bit-packed field round-trip, unknown-total sentinel, loud
rejection, and WAV/FLAC dispatch without sample decode."""

import pytest

from thesis_iceberg_spark.operators.flac import (
    build_flac_streaminfo,
    parse_flac_streaminfo,
)
from thesis_iceberg_spark.operators.multimodal import audio_metadata
from thesis_iceberg_spark.operators.wav import encode_wav, parse_wav

import numpy as np


def test_streaminfo_roundtrip():
    d = parse_flac_streaminfo(build_flac_streaminfo(44100, 2, 16, 44100 * 3))
    assert d == {
        "sample_rate": 44100,
        "channels": 2,
        "bits": 16,
        "n_samples": 132300,
        "duration_ms": 3000,
    }


def test_streaminfo_field_extremes():
    # 20-bit rate, 8 channels, 32-bit depth — every field at its edge
    d = parse_flac_streaminfo(build_flac_streaminfo((1 << 20) - 1, 8, 32, 7))
    assert (d["sample_rate"], d["channels"], d["bits"]) == ((1 << 20) - 1, 8, 32)


def test_zero_total_samples_means_unknown():
    d = parse_flac_streaminfo(build_flac_streaminfo(48000, 1, 24, 0))
    assert d["n_samples"] is None and d["duration_ms"] is None


def test_rejections():
    with pytest.raises(ValueError, match="not a FLAC"):
        parse_flac_streaminfo(b"OggS" + b"\x00" * 40)
    good = build_flac_streaminfo(48000, 2, 16, 1000)
    with pytest.raises(ValueError, match="truncated STREAMINFO"):
        parse_flac_streaminfo(good[:20])
    # first block not STREAMINFO (type 4 = VORBIS_COMMENT)
    bad = bytearray(good)
    bad[4] = 0x04
    with pytest.raises(ValueError, match="not STREAMINFO"):
        parse_flac_streaminfo(bytes(bad))


def test_parse_wav_metadata_only_skips_samples():
    payload = encode_wav(16000, np.zeros((64, 2)), bits=16)
    d = parse_wav(payload, with_samples=False)
    assert d["samples"] is None
    assert (d["sample_rate"], d["channels"], d["n_samples"]) == (16000, 2, 64)


def test_audio_metadata_end_to_end(spark):
    wav = encode_wav(16000, np.zeros((160, 2)), bits=16)
    flac = build_flac_streaminfo(44100, 2, 16, 44100)
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(wav)),
            (2, "audio", bytearray(flac)),
            (3, "audio", bytearray(b"static noise, not a container")),
            (4, "video", bytearray(b"skipped")),
        ],
        "media_id LONG, kind STRING, payload BINARY",
    )
    rows = {r.media_id: r for r in audio_metadata(media).collect()}
    assert set(rows) == {1, 2, 3}
    assert (rows[1].decoder, rows[1].sample_rate, rows[1].duration_ms) == (
        "wav",
        16000,
        10,
    )
    assert (rows[2].decoder, rows[2].sample_rate, rows[2].duration_ms) == (
        "flac",
        44100,
        1000,
    )
    assert rows[3].decoder == "unsupported" and rows[3].sample_rate is None


def test_multimodal_audio_meta_matches_closed_form(spark, sf_dir):
    # the banked registration candidate: Spark parses actual encoded
    # bytes, the expectation is pure doc_id arithmetic (the oracle's
    # closed form) — parity here mirrors the compare_query
    # pre-certification at sf0.001/sf0.01
    from thesis_iceberg_spark.queries.multimodal_q import (
        multimodal_audio_meta_df,
    )

    rows = multimodal_audio_meta_df(spark, sf_dir).limit(200).collect()
    assert rows
    for r in rows:
        i = r.doc_id
        assert r.sample_rate == 8000 * (i % 3 + 1)
        assert r.channels == i % 2 + 1
        assert r.bits == (8, 16, 24, 32)[i % 4]
        assert r.n_samples == 16 + i % 7
        assert r.duration_ms == (16 + i % 7) * 1000 // (8000 * (i % 3 + 1))
        assert r.decoder == ("flac" if i % 5 == 0 else "wav")
