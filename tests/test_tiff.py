"""Baseline TIFF codec (operators/tiff.py): byte-exact round-trip across
byte orders, PackBits, multi-strip assembly and photometric variants;
loud rejection of out-of-scope payloads; dispatch integration."""

import struct

import numpy as np
import pytest

from media_util import px_rows as _px
from thesis_iceberg_spark.operators.multimodal import (
    decode_image_payload,
    sniff_format,
)
from thesis_iceberg_spark.operators.tiff import (
    _pack_packbits,
    _unpack_packbits,
    encode_tiff,
    parse_tiff,
)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"big_endian": True},
        {"packbits": True},
        {"rows_per_strip": 4},
        {"packbits": True, "rows_per_strip": 5, "big_endian": True},
    ],
)
def test_rgb_roundtrip_variants(kw):
    arr = np.random.default_rng(7).integers(0, 256, (13, 21, 3))
    d = parse_tiff(encode_tiff(21, 13, _px(arr), **kw))
    assert (d["width"], d["height"], d["mode"]) == (21, 13, "RGB")
    assert (d["pixels"] == arr).all()  # TIFF is lossless — byte-exact
    assert d["px_mean"] == float(int(arr.sum())) / arr.size


def test_gray_roundtrip_and_packbits_runs():
    arr = np.random.default_rng(11).integers(0, 256, (9, 8, 3))
    d = parse_tiff(encode_tiff(8, 9, _px(arr), gray=True, packbits=True))
    assert d["mode"] == "L" and (d["pixels"][:, :, 0] == arr[:, :, 0]).all()
    solid = [[(5, 5, 5)] * 40] * 40  # long replicate runs
    d = parse_tiff(encode_tiff(40, 40, solid, packbits=True))
    assert (d["pixels"] == [5, 5, 5]).all()


def test_packbits_primitives():
    # mixed literal/replicate data survives the spec's own scheme
    row = bytes([1, 2, 3, 7, 7, 7, 7, 9]) * 20
    assert _unpack_packbits(_pack_packbits(row), len(row)) == row
    with pytest.raises(ValueError, match="truncated PackBits"):
        _unpack_packbits(b"\x05\x01", 6)  # literal run cut short


def test_white_is_zero_inverted():
    # hand-flip photometric 1 -> 0 on a gray image: pixels must invert
    arr = np.random.default_rng(13).integers(0, 256, (6, 6, 3))
    payload = bytearray(encode_tiff(6, 6, _px(arr), gray=True))
    # photometric entry: tag 262, SHORT value at entry offset +8
    i = payload.index(struct.pack("<HHI", 262, 3, 1))
    assert payload[i + 8] == 1
    payload[i + 8] = 0
    d = parse_tiff(bytes(payload))
    assert (d["pixels"][:, :, 0] == 255 - arr[:, :, 0].astype(np.uint8)).all()


def test_rejections():
    good = encode_tiff(8, 8, [[(1, 2, 3)] * 8] * 8)
    with pytest.raises(ValueError, match="not a TIFF"):
        parse_tiff(b"II+\x00" + good[4:])
    with pytest.raises(ValueError, match="truncated|out of bounds|strip out"):
        parse_tiff(good[: len(good) // 2])
    # LZW compression (5) is out of scope and must be rejected loudly
    bad = bytearray(good)
    i = bad.index(struct.pack("<HHI", 259, 3, 1))
    struct.pack_into("<H", bad, i + 8, 5)
    with pytest.raises(ValueError, match="unsupported TIFF compression"):
        parse_tiff(bytes(bad))
    # 16-bit samples rejected
    bad = bytearray(good)
    i = bad.index(struct.pack("<HHI", 258, 3, 1))
    struct.pack_into("<H", bad, i + 8, 16)
    with pytest.raises(ValueError, match="bit depth"):
        parse_tiff(bytes(bad))


def test_dispatch_and_sniff():
    arr = np.random.default_rng(3).integers(0, 256, (6, 6, 3))
    payload = encode_tiff(6, 6, _px(arr))
    assert sniff_format(payload) == "tiff"
    assert sniff_format(encode_tiff(6, 6, _px(arr), big_endian=True)) == "tiff"
    d = decode_image_payload(payload)
    assert d is not None and d["decoder"] == "tiff"
    assert (d["pixels"] == arr).all()
    # garbled TIFF falls through to unsupported
    assert decode_image_payload(b"II*\x00" + b"\xff" * 8) is None


def test_zero_count_ifd_entry_degrades_with_valueerror():
    # review r15 tiff #3: a zero-count ImageWidth entry stored [] and
    # IndexError'd past the corrupt-row contract
    payload = bytearray(encode_tiff(8, 8, [[(1, 2, 3)] * 8] * 8))
    i = payload.index(struct.pack("<HHI", 256, 3, 1))
    struct.pack_into("<I", payload, i + 4, 0)  # count := 0
    with pytest.raises(ValueError, match="missing required tag 256"):
        parse_tiff(bytes(payload))


def test_packbits_literal_cap_straddle():
    # review r15 tiff #4: 127 run-free bytes then a 2-byte run used to
    # emit a 129-byte literal with header 0x80 (a spec no-op)
    row = bytes(range(127)) + b"\x07\x07" + bytes(range(50, 90))
    packed = _pack_packbits(row)
    assert 0x80 not in packed[:1]  # first header is a valid literal
    assert _unpack_packbits(packed, len(row)) == row
