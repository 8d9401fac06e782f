"""GIF codec (operators/gif.py): lossless round-trip through real LZW
(dictionary growth, width growth, KwKwK), interlacing, transparency,
frame-offset compositing, and loud rejection of corrupt streams."""

import struct

import numpy as np
import pytest

from thesis_iceberg_spark.operators.gif import encode_gif, parse_gif
from thesis_iceberg_spark.operators.multimodal import decode_image_payload


from media_util import px_rows as _px  # noqa: E402


def _indexed(seed, h, w, ncolors):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncolors, 3))
    pick = rng.integers(0, ncolors, (h, w))
    return pal[pick]


def test_roundtrip_small_palette():
    arr = _indexed(3, 17, 23, 40)
    d = parse_gif(encode_gif(23, 17, _px(arr)))
    assert (d["width"], d["height"], d["mode"]) == (23, 17, "RGB")
    assert (d["pixels"] == arr).all()  # GIF is lossless — byte-exact
    assert d["px_mean"] == float(int(arr.sum())) / arr.size


def test_roundtrip_256_colors_width_growth():
    # 256-color palette: min code size 8, codes immediately grow past 9
    # bits as the dictionary fills — exercises width growth both ways
    pal = np.array([[i, (i * 3) % 256, (i * 7) % 256] for i in range(256)])
    pick = np.random.default_rng(5).integers(0, 256, (64, 64))
    arr = pal[pick]
    d = parse_gif(encode_gif(64, 64, _px(arr)))
    assert (d["pixels"] == arr).all()


def test_roundtrip_solid_kwkwk():
    # a long solid run makes the encoder emit codes the decoder has not
    # finished defining (the KwKwK case) almost immediately
    arr = np.full((64, 64, 3), (7, 8, 9), np.int64)
    d = parse_gif(encode_gif(64, 64, _px(arr)))
    assert (d["pixels"] == arr).all()


def test_roundtrip_interlaced():
    arr = _indexed(7, 19, 11, 13)  # odd height: uneven 4-pass rows
    d = parse_gif(encode_gif(11, 19, _px(arr), interlace=True))
    assert (d["pixels"] == arr).all()


def test_transparency_upgrades_to_rgba():
    arr = _indexed(9, 17, 23, 40)
    pix = _px(arr)
    d = parse_gif(encode_gif(23, 17, pix, transparent=5))
    assert d["mode"] == "RGBA"
    # encoder assigns palette indices in first-appearance order
    seen: list[tuple] = []
    for row in pix:
        for c in row:
            if c not in seen:
                seen.append(c)
    expected = sum(1 for row in pix for c in row if c == seen[5])
    assert int((d["pixels"][:, :, 3] == 0).sum()) == expected


def test_frame_offset_composites_on_background():
    # hand-build a GIF whose 1x1 frame sits at (1, 1) in a 3x3 screen:
    # everything else must be the background color (palette entry 0)
    base = encode_gif(1, 1, [[(200, 100, 50)]])
    i = base.index(b"\x2c")
    # grow the logical screen to 3x3 and move the frame to (1, 1)
    payload = bytearray(base)
    struct.pack_into("<HH", payload, 6, 3, 3)
    struct.pack_into("<HH", payload, i + 1, 1, 1)
    d = parse_gif(bytes(payload))
    assert (d["width"], d["height"]) == (3, 3)
    assert tuple(d["pixels"][1, 1]) == (200, 100, 50)
    bg = tuple(d["pixels"][0, 0])
    assert tuple(d["pixels"][2, 2]) == bg


def test_rejections():
    good = encode_gif(8, 8, [[(1, 2, 3)] * 8] * 8)
    with pytest.raises(ValueError, match="not a GIF"):
        parse_gif(b"GIF99a" + good[6:])
    with pytest.raises(ValueError, match="truncated"):
        parse_gif(good[: len(good) // 2])
    # trailer immediately after header: no image data
    hdr = good[:13] + good[13 : 13 + 3 * 2]  # header + 2-entry palette
    with pytest.raises(ValueError, match="trailer before image"):
        parse_gif(hdr + b"\x3b")
    # out-of-range LZW code: corrupt a byte mid-stream
    bad = bytearray(good)
    j = bad.index(b"\x2c") + 10 + 2  # into the first data sub-block
    bad[j + 3] ^= 0xFF
    with pytest.raises(ValueError):
        parse_gif(bytes(bad))


def test_dispatch_tags_gif():
    arr = _indexed(11, 6, 6, 5)
    d = decode_image_payload(encode_gif(6, 6, _px(arr)))
    assert d is not None and d["decoder"] == "gif"
    assert (d["pixels"] == arr).all()


def test_dispatch_garbled_gif_falls_through():
    assert decode_image_payload(b"GIF89a" + b"\x00" * 6) is None
