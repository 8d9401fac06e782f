"""Baseline JPEG codec (operators/jpeg.py): round-trip correctness over
every decoder path (4:4:4 / 4:2:0 / grayscale / restart markers / odd
dimensions), loud rejection of everything out of scope, and the
decode_media + dHash integration (compressed payloads now decode without
PIL — the carried VERDICT r11-r14 gap)."""

import struct

import numpy as np
import pytest

from thesis_iceberg_spark.operators.jpeg import encode_jpeg, parse_jpeg
from thesis_iceberg_spark.operators.multimodal import (
    decode_image_payload,
    dhash_from_pixels,
    encode_bmp,
)


from media_util import px_rows as _px  # noqa: E402


def _rng(seed=7):
    return np.random.default_rng(seed)


# --- round trips (qval=1: only FDCT/IDCT float rounding may move a byte) ---


def test_solid_color_exact():
    pix = [[(90, 140, 200)] * 16] * 16
    d = parse_jpeg(encode_jpeg(16, 16, pix))
    assert (d["width"], d["height"], d["mode"]) == (16, 16, "RGB")
    assert d["pixels"].shape == (16, 16, 3)
    # DC-only blocks: constant input survives quantization at qval=1
    # except +-1 color-transform rounding
    assert np.abs(d["pixels"].astype(int) - [90, 140, 200]).max() <= 1
    assert d["px_mean"] == pytest.approx(d["pixels"].mean(), abs=1e-9)


def test_random_444_roundtrip():
    arr = _rng().integers(0, 256, (16, 24, 3))
    d = parse_jpeg(encode_jpeg(24, 16, _px(arr)))
    assert (d["width"], d["height"]) == (24, 16)
    assert np.abs(d["pixels"].astype(int) - arr).max() <= 2


def test_grayscale_roundtrip():
    arr = _rng(11).integers(0, 256, (16, 24, 3))
    d = parse_jpeg(encode_jpeg(24, 16, _px(arr), gray=True))
    assert d["mode"] == "L" and d["pixels"].shape == (16, 24, 1)
    # gray uses the red channel (the encode_ppm P5 convention)
    assert np.abs(d["pixels"][:, :, 0].astype(int) - arr[:, :, 0]).max() <= 1


def test_420_subsampled_roundtrip():
    # constant 2x2 color cells: box-averaged chroma reconstructs exactly,
    # so 4:2:0 round-trips within the same rounding budget as 4:4:4
    base = _rng(13).integers(0, 256, (10, 10, 3))
    arr = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    d = parse_jpeg(encode_jpeg(20, 20, _px(arr), subsample=True))
    assert (d["width"], d["height"]) == (20, 20)
    assert np.abs(d["pixels"].astype(int) - arr).max() <= 2


def test_restart_markers_and_odd_dims():
    arr = _rng(17).integers(0, 256, (13, 37, 3))
    payload = encode_jpeg(37, 13, _px(arr), restart_interval=2)
    assert b"\xff\xdd" in payload and b"\xff\xd0" in payload  # DRI + RST0
    d = parse_jpeg(payload)
    assert (d["width"], d["height"]) == (37, 13)  # MCU padding cropped
    assert np.abs(d["pixels"].astype(int) - arr).max() <= 2


def test_lossy_quantization_still_close():
    arr = _rng(19).integers(0, 256, (16, 16, 3))
    d = parse_jpeg(encode_jpeg(16, 16, _px(arr), qval=16))
    # heavily quantized: not exact, but the image survives recognizably
    assert np.abs(d["pixels"].astype(float) - arr).mean() < 16


# --- loud rejection: out-of-scope payloads raise (fall through to PIL) ---


def test_rejects_non_jpeg():
    with pytest.raises(ValueError, match="not a JPEG"):
        parse_jpeg(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_rejects_progressive_sof2():
    payload = bytearray(encode_jpeg(8, 8, [[(1, 2, 3)] * 8] * 8))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # flip baseline SOF0 -> progressive SOF2
    with pytest.raises(ValueError, match="unsupported JPEG coding process"):
        parse_jpeg(bytes(payload))


def test_rejects_12bit_precision():
    payload = bytearray(encode_jpeg(8, 8, [[(1, 2, 3)] * 8] * 8))
    i = payload.index(b"\xff\xc0")
    payload[i + 4] = 12  # precision byte right after the SOF length
    with pytest.raises(ValueError, match="sample precision"):
        parse_jpeg(bytes(payload))


def test_rejects_truncated_entropy():
    payload = encode_jpeg(16, 16, _px(_rng(23).integers(0, 256, (16, 16, 3))))
    with pytest.raises(ValueError, match="truncated|marker"):
        parse_jpeg(payload[: len(payload) // 2])


def test_rejects_garbage_after_magic():
    with pytest.raises(ValueError):
        parse_jpeg(b"\xff\xd8\xff" + bytes(range(64)))


def test_rejects_oversized_dimensions():
    payload = bytearray(encode_jpeg(8, 8, [[(1, 2, 3)] * 8] * 8))
    i = payload.index(b"\xff\xc0")
    struct.pack_into(">HH", payload, i + 5, 8192, 8192)  # 64M px > cap
    with pytest.raises(ValueError, match="too large"):
        parse_jpeg(bytes(payload))


def test_rejects_zero_quant_entry():
    payload = bytearray(encode_jpeg(8, 8, [[(1, 2, 3)] * 8] * 8))
    i = payload.index(b"\xff\xdb")
    payload[i + 5] = 0  # first table entry
    with pytest.raises(ValueError, match="zero entry"):
        parse_jpeg(bytes(payload))


# --- dispatch + downstream integration ---


def test_dispatch_tags_jpeg():
    arr = _rng(29).integers(0, 256, (8, 8, 3))
    d = decode_image_payload(encode_jpeg(8, 8, _px(arr)))
    assert d is not None and d["decoder"] == "jpeg"
    assert (d["width"], d["height"], d["mode"]) == (8, 8, "RGB")


def test_dispatch_garbled_jpeg_falls_through():
    # JPEG magic + garbage: parse_jpeg raises, PIL absent -> unsupported
    assert decode_image_payload(b"\xff\xd8\xff\xee" + b"\x00" * 16) is None


def test_dhash_agrees_across_codecs():
    # The dHash corpus contract: same pixels -> same hash regardless of
    # container.  A row-gradient with a 16-luma step per grid cell keeps
    # every adjacent-cell comparison far outside the <=2-byte JPEG
    # round-trip noise, so BMP (lossless) and JPEG (qval=1) must hash
    # identically — proving encode -> decode -> resample -> hash across
    # the compressed path too.
    w, h = 18, 16
    arr = np.zeros((h, w, 3), int)
    for x in range(w):
        arr[:, x, :] = (x * 255) // (w - 1) if (x // 2) % 2 == 0 else 0
    pix = _px(arr)
    bmp = decode_image_payload(encode_bmp(w, h, pix))
    jpg = decode_image_payload(encode_jpeg(w, h, pix))
    assert bmp["decoder"] == "bmp" and jpg["decoder"] == "jpeg"
    assert dhash_from_pixels(bmp["pixels"]) == dhash_from_pixels(jpg["pixels"])


def test_sos_component_order_honored():
    # T.81 B.2.3: MCU interleaving follows the SOS component list, which
    # may differ from SOF order.  Reverse the SOS entries of a solid-color
    # 4:4:4 image WITHOUT touching entropy data: the first coded block
    # (the Y constant) must now land on component 3, i.e. the decoder
    # sees (Y', Cb', Cr') = (Cr, Cb, Y).  Compute the expected RGB from
    # that permutation and require an exact match (+-1 rounding).
    rgb = (90, 140, 200)
    payload = bytearray(encode_jpeg(8, 8, [[rgb] * 8] * 8))
    i = payload.index(b"\xff\xda")
    ns = payload[i + 4]
    assert ns == 3
    # each SOS component entry is 2 bytes starting at i+5
    entries = [bytes(payload[i + 5 + 2 * c : i + 7 + 2 * c]) for c in range(3)]
    payload[i + 5 : i + 11] = b"".join(reversed(entries))
    d = parse_jpeg(bytes(payload))
    r, g, b = (float(c) for c in rgb)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    # swapped: Y'=cr, Cb'=cb, Cr'=y
    yy, cbb, crr = cr, cb, y
    exp = (
        yy + 1.402 * (crr - 128.0),
        yy - 0.344136 * (cbb - 128.0) - 0.714136 * (crr - 128.0),
        yy + 1.772 * (cbb - 128.0),
    )
    exp = tuple(min(255, max(0, round(v))) for v in exp)
    got = tuple(int(v) for v in d["pixels"][4, 4])
    assert all(abs(a - b) <= 1 for a, b in zip(got, exp)), (got, exp)


def test_sos_unknown_component_rejected():
    payload = bytearray(encode_jpeg(8, 8, [[(1, 2, 3)] * 8] * 8))
    i = payload.index(b"\xff\xda")
    payload[i + 5] = 9  # component id not in SOF
    with pytest.raises(ValueError, match="SOS components|scan omits"):
        parse_jpeg(bytes(payload))


def test_single_component_scan_is_non_interleaved():
    # T.81 A.2.3 (review r15 #1): a one-component scan stores data units in
    # RASTER order regardless of SOF sampling factors.  jpegtran -grayscale
    # keeps the source's 2x2 factors: patch hv 0x11 -> 0x22 on a grayscale
    # image with distinct per-block content — pixels must be unchanged, not
    # scrambled into 2x2 MCU tiles.
    arr = np.zeros((16, 32, 3), int)
    for by in range(2):
        for bx in range(4):
            arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, :] = 30 + 60 * (by * 4 + bx) % 226
    payload = bytearray(encode_jpeg(32, 16, _px(arr), gray=True))
    i = payload.index(b"\xff\xc0")
    # SOF0 component spec: id at i+10... layout: marker(2) len(2) prec(1)
    # H(2) W(2) ncomp(1) then [id, hv, tq]
    assert payload[i + 11] == 0x11
    payload[i + 11] = 0x22
    d = parse_jpeg(bytes(payload))
    assert np.abs(d["pixels"][:, :, 0].astype(int) - arr[:, :, 0]).max() <= 1


def test_adobe_app14_rgb_rejected():
    base = encode_jpeg(8, 8, [[(1, 2, 3)] * 8] * 8)
    adobe = b"Adobe" + bytes((0, 100, 0, 0, 0, 0, 0))  # transform byte = 0
    app14 = b"\xff\xee" + struct.pack(">H", 2 + len(adobe)) + adobe
    payload = base[:2] + app14 + base[2:]
    with pytest.raises(ValueError, match="RGB-coded"):
        parse_jpeg(payload)
    # transform=1 (YCbCr) is the JFIF default and still decodes
    adobe_ycc = b"Adobe" + bytes((0, 100, 0, 0, 0, 0, 1))
    app14 = b"\xff\xee" + struct.pack(">H", 2 + len(adobe_ycc)) + adobe_ycc
    d = parse_jpeg(base[:2] + app14 + base[2:])
    assert (d["width"], d["height"]) == (8, 8)
