"""RIFF/WAV PCM codec (operators/wav.py): round-trip through every sample
format, RIFF alignment/extensible-format handling, loud rejection of
out-of-scope payloads, and the decode_audio Spark operator."""

import struct

import numpy as np
import pytest

from thesis_iceberg_spark.operators.multimodal import decode_audio
from thesis_iceberg_spark.operators.wav import encode_wav, parse_wav


def _tone(n=480, channels=2, rate=16000):
    t = np.arange(n) / rate
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    right = 0.25 * np.sin(2 * np.pi * 880 * t)
    return np.stack([left, right][:channels], axis=1)


@pytest.mark.parametrize(
    "bits,float_pcm,tol",
    [(8, False, 1 / 128), (16, False, 1 / 32768), (24, False, 1e-6), (32, False, 1e-9), (32, True, 1e-7), (64, True, 0.0)],
)
def test_roundtrip_every_format(bits, float_pcm, tol):
    s = _tone()
    d = parse_wav(encode_wav(16000, s, bits=bits, float_pcm=float_pcm))
    assert (d["sample_rate"], d["channels"], d["bits"]) == (16000, 2, bits)
    assert d["n_samples"] == 480 and d["duration_ms"] == 30
    assert np.abs(d["samples"] - s).max() <= tol


def test_mono_1d_input_and_odd_data_padding():
    # 8-bit mono with an odd byte count exercises the RIFF word-align pad
    s = _tone(n=333, channels=1)
    payload = encode_wav(8000, s[:, 0], bits=8)
    assert len(payload) % 2 == 0  # padded
    d = parse_wav(payload)
    assert d["channels"] == 1 and d["n_samples"] == 333


def test_extensible_format_resolves_subformat():
    base = encode_wav(16000, _tone(), bits=16)
    i = base.index(b"fmt ")
    (old_size,) = struct.unpack_from("<I", base, i + 4)
    fmt = bytearray(base[i + 8 : i + 8 + old_size])
    # rebuild as WAVE_FORMAT_EXTENSIBLE: tag 0xFFFE + cbSize 22 + ext block
    struct.pack_into("<H", fmt, 0, 0xFFFE)
    # cbSize=22, wValidBits=16, dwChannelMask=3, then the 16-byte SubFormat
    # GUID: Data1 = format tag (4 bytes LE), then the fixed 12-byte suffix
    ext = struct.pack("<HHI", 22, 16, 0x3) + struct.pack("<I", 1) + (
        b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    )
    new_fmt = bytes(fmt) + ext
    payload = (
        base[:i]
        + b"fmt "
        + struct.pack("<I", len(new_fmt))
        + new_fmt
        + base[i + 8 + old_size :]
    )
    # RIFF size field is stale but parse_wav reads chunk-by-chunk
    d = parse_wav(payload)
    assert d["bits"] == 16 and d["channels"] == 2


def test_rejections():
    with pytest.raises(ValueError, match="not a RIFF"):
        parse_wav(b"RIFX" + b"\x00" * 40)
    good = encode_wav(16000, _tone(), bits=16)
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        parse_wav(good[:-7])
    # compressed format tag (e.g. 2 = ADPCM) rejected, never mis-decoded
    bad = bytearray(good)
    i = bad.index(b"fmt ")
    struct.pack_into("<H", bad, i + 8, 2)
    with pytest.raises(ValueError, match="format tag"):
        parse_wav(bytes(bad))
    # partial trailing frame
    bad = bytearray(good)
    i = bad.index(b"data")
    (sz,) = struct.unpack_from("<I", bad, i + 4)
    struct.pack_into("<I", bad, i + 4, sz - 1)
    with pytest.raises(ValueError, match="whole number of frames"):
        parse_wav(bytes(bad[:-1]))


def test_decode_audio_end_to_end(spark):
    s = _tone()
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(encode_wav(16000, s, bits=16))),
            (2, "audio", bytearray(b"not audio at all")),
            (3, "audio", None),
            (4, "image", bytearray(b"skipped: not audio")),
        ],
        "media_id LONG, kind STRING, payload BINARY",
    )
    rows = {r.media_id: r for r in decode_audio(media).collect()}
    assert set(rows) == {1, 2, 3}  # kind filter drops the image row
    r = rows[1]
    assert (r.sample_rate, r.channels, r.bits, r.n_samples) == (16000, 2, 16, 480)
    assert r.duration_ms == 30 and r.decoder == "wav"
    expected_rms = float(np.sqrt((s * s).mean()))
    assert r.rms == pytest.approx(expected_rms, abs=1e-4)
    assert rows[2].decoder == "unsupported" and rows[2].sample_rate is None
    assert rows[3].decoder == "unsupported"


def test_implausible_sample_rate_rejected():
    # review r15 #2: a uint32 rate past int32 must degrade loudly, not
    # wrap or kill the Arrow batch downstream
    good = encode_wav(16000, _tone(), bits=16)
    bad = bytearray(good)
    i = bad.index(b"fmt ")
    struct.pack_into("<I", bad, i + 12, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="implausible WAV sample rate"):
        parse_wav(bytes(bad))
