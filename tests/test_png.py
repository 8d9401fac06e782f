"""PNG codec (operators/png.py): lossless round-trip through every filter
type, hand-built palette/tRNS decoding, CRC enforcement, loud rejection of
out-of-scope variants, and the decode_image_payload dispatch."""

import struct
import zlib

import numpy as np
import pytest

from thesis_iceberg_spark.operators.multimodal import decode_image_payload
from thesis_iceberg_spark.operators.png import (
    _MAGIC,
    _chunk,
    encode_png,
    parse_png,
)


from media_util import px_rows as _px  # noqa: E402


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_rgb_roundtrip_every_filter(filter_type):
    arr = np.random.default_rng(5 + filter_type).integers(0, 256, (13, 21, 3))
    d = parse_png(encode_png(21, 13, _px(arr), filter_type=filter_type))
    assert (d["width"], d["height"], d["mode"]) == (21, 13, "RGB")
    assert (d["pixels"] == arr).all()  # PNG is lossless — byte-exact
    assert d["px_mean"] == float(int(arr.sum())) / arr.size


def test_gray_roundtrip():
    arr = np.random.default_rng(11).integers(0, 256, (8, 9, 3))
    d = parse_png(encode_png(9, 8, _px(arr), gray=True, filter_type=4))
    assert d["mode"] == "L" and d["pixels"].shape == (8, 9, 1)
    assert (d["pixels"][:, :, 0] == arr[:, :, 0]).all()


def _palette_png(indices, palette, trns=None):
    h, w = indices.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    body = bytearray()
    for row in indices:
        body.append(0)
        body += bytes(int(v) for v in row)
    out = _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", bytes(palette))
    if trns is not None:
        out += _chunk(b"tRNS", bytes(trns))
    return out + _chunk(b"IDAT", zlib.compress(bytes(body))) + _chunk(b"IEND", b"")


def test_palette_expansion():
    pal = [10, 20, 30, 200, 100, 50, 0, 0, 255]  # 3 entries
    idx = np.array([[0, 1, 2], [2, 1, 0]])
    d = parse_png(_palette_png(idx, pal))
    assert d["mode"] == "RGB"
    assert tuple(d["pixels"][0, 1]) == (200, 100, 50)
    assert tuple(d["pixels"][1, 0]) == (0, 0, 255)


def test_palette_with_trns_alpha():
    pal = [10, 20, 30, 200, 100, 50]
    idx = np.array([[0, 1], [1, 0]])
    d = parse_png(_palette_png(idx, pal, trns=[128]))  # entry 0 half-alpha
    assert d["mode"] == "RGBA"
    assert tuple(d["pixels"][0, 0]) == (10, 20, 30, 128)
    assert tuple(d["pixels"][0, 1]) == (200, 100, 50, 255)  # default opaque


def test_palette_index_out_of_range_rejected():
    pal = [10, 20, 30]  # 1 entry
    idx = np.array([[0, 1]])
    with pytest.raises(ValueError, match="palette index"):
        parse_png(_palette_png(idx, pal))


def test_crc_corruption_rejected():
    payload = bytearray(encode_png(4, 4, [[(1, 2, 3)] * 4] * 4))
    i = payload.index(b"IDAT") + 6
    payload[i] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_png(bytes(payload))


def test_interlaced_rejected():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)  # Adam7
    payload = _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        parse_png(payload)


def test_16bit_depth_rejected():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    payload = _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        parse_png(payload)


def test_truncated_and_bad_length_rejected():
    good = encode_png(4, 4, [[(1, 2, 3)] * 4] * 4)
    with pytest.raises(ValueError):
        parse_png(good[:20])
    # valid chunks but pixel data for the wrong geometry
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    short = zlib.compress(b"\x00" + b"\x00" * 5)
    payload = (
        _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", short) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="pixel data length"):
        parse_png(payload)


def test_dispatch_tags_png():
    arr = np.random.default_rng(3).integers(0, 256, (6, 6, 3))
    d = decode_image_payload(encode_png(6, 6, _px(arr)))
    assert d is not None and d["decoder"] == "png"
    assert (d["pixels"] == arr).all()


def test_dispatch_garbled_png_falls_through():
    assert decode_image_payload(_MAGIC + b"\x00" * 16) is None


def test_idat_zip_bomb_bounded():
    # header promises 2x2 RGB (14 expected bytes) but IDAT inflates to
    # 10 MB: the bounded decompress must reject without materializing it
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * 10_000_000)
    payload = (
        _MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", bomb) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="pixel data length"):
        parse_png(payload)
