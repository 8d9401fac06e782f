"""PNG decode in pure Python + numpy + stdlib zlib (no image library).

The compressed-format sibling of operators/jpeg.py: with baseline JPEG
covered, PNG (the other format >90% of real corpora carry) decodes from
the public spec alone (RFC 2083 / W3C PNG second edition).  DEFLATE is
stdlib ``zlib`` — baked into this container — so the from-scratch work
is chunk framing, CRC validation, scanline unfiltering, and palette
expansion.

Scope (everything else raises ``ValueError`` so the dispatch in
``multimodal.decode_image_payload`` falls through to PIL-if-present /
'unsupported'):

* 8-bit samples, color types 0 (gray), 2 (RGB), 3 (palette -> RGB, or
  RGBA when a tRNS chunk supplies alpha), 4 (gray+alpha), 6 (RGBA);
* all five scanline filters (None/Sub/Up/Average/Paeth);
* non-interlaced only (Adam7 rejected, never mis-decoded); 1/2/4/16-bit
  depths rejected; tRNS on color types 0/2 (color-key transparency)
  rejected rather than silently dropped.

Every chunk CRC is verified (zlib.crc32): at corpus scale a silently
bit-rotten image should surface as 'unsupported', not as wrong pixels.

Return contract matches parse_bmp/parse_ppm/parse_jpeg:
``{width, height, mode, px_mean, pixels}``; pixels is top-down
(height, width, channels) uint8; px_mean is the exact mean over every
stored channel byte.

The test-support ``encode_png`` writes valid PNGs with a chosen filter
type per row (forward Sub/Up/Average/Paeth implemented), so the decoder's
unfilter paths are exercised by round-trip, not fixtures.

Like jpeg.py, the sequential unfilter recurrences (Average/Paeth) run
per-PIXEL in Python (None/Up/Sub are fully vectorized) — functional
coverage, not a hot path: production swaps a library decoder into the
same Arrow ``mapInPandas`` plumbing; the plan shape is what this repo
certifies.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .media_limits import MAX_PIXELS as _MAX_PIXELS  # shared guard

_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> channels in the coded stream
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_MODES = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunks(payload: bytes):
    pos = len(_MAGIC)
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def parse_png(payload: bytes) -> dict:
    """Decode an 8-bit non-interlaced PNG without any image library.
    Raises ValueError on anything outside the documented scope."""
    if payload[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            if ihdr is not None:
                raise ValueError("duplicate IHDR")
            if len(data) != 13:
                raise ValueError("bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if len(data) % 3 or not data:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat += data
        # ancillary chunks (tEXt, gAMA, ...) skipped; CRC still verified
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype_n, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if ctype_n not in _CHANNELS:
        raise ValueError(f"bad PNG color type {ctype_n}")
    if width == 0 or height == 0:
        raise ValueError("zero PNG dimension")
    if width * height > _MAX_PIXELS:
        raise ValueError(f"image too large ({width}x{height})")
    if trns is not None and ctype_n != 3:
        raise ValueError("tRNS color-key transparency not supported")
    if ctype_n == 3 and plte is None:
        raise ValueError("palette image missing PLTE")
    if not idat:
        raise ValueError("PNG missing IDAT")
    nch = _CHANNELS[ctype_n]
    stride = width * nch
    expected = (stride + 1) * height
    try:
        # bound the inflate to the geometry the header promised: a crafted
        # IDAT must not decompress past the expected plane size (zip bomb)
        dobj = zlib.decompressobj()
        raw = dobj.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT inflate failed: {exc}") from None
    if len(raw) != expected or dobj.unconsumed_tail:
        raise ValueError(
            f"PNG pixel data length {len(raw)}{'+' if dobj.unconsumed_tail else ''}"
            f" != expected {expected}"
        )
    bpp = nch  # bytes per pixel (8-bit depth)
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.intp)
    zero_px = np.zeros(bpp, np.intp)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.intp)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub: a per-lane cumulative sum mod 256 — vectorized
            cur = np.cumsum(
                line.astype(np.uint8).reshape(width, bpp), axis=0, dtype=np.uint8
            ).reshape(stride).astype(np.intp)
        elif f in (3, 4):
            # Average/Paeth depend on the just-reconstructed LEFT pixel, so
            # recurrence is inherent; loop per PIXEL with lane-wide numpy
            # ops (bpp x fewer interpreter iterations than per-byte)
            cur = np.empty(stride, np.intp)
            lanes_line = line.reshape(width, bpp)
            lanes_prev = prev.reshape(width, bpp)
            lanes_cur = cur.reshape(width, bpp)
            left = zero_px
            if f == 3:  # Average
                for x in range(width):
                    left = (lanes_line[x] + ((left + lanes_prev[x]) >> 1)) & 0xFF
                    lanes_cur[x] = left
            else:  # Paeth
                ul = zero_px
                for x in range(width):
                    up = lanes_prev[x]
                    p = left + up - ul
                    pa = np.abs(p - left)
                    pb = np.abs(p - up)
                    pc = np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                    )
                    left = (lanes_line[x] + pred) & 0xFF
                    lanes_cur[x] = left
                    ul = up
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = cur
        prev = cur

    px = out.reshape(height, width, nch)
    if ctype_n == 3:
        idx = px[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            px = np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
            mode = "RGBA"
        else:
            px = rgb
            mode = "RGB"
    else:
        mode = _MODES[ctype_n]
    px = np.ascontiguousarray(px)
    return {
        "width": width,
        "height": height,
        "mode": mode,
        "px_mean": float(int(px.sum(dtype=np.int64))) / px.size,
        "pixels": px,
    }


# ---------------------------------------------------------------------------
# encoder (test-support)
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels,
    *,
    gray: bool = False,
    filter_type: int = 0,
) -> bytes:
    """Build an 8-bit non-interlaced PNG from ``height`` rows of ``width``
    ``(r, g, b)`` tuples (the encode_bmp/encode_ppm convention; ``gray``
    uses each pixel's red value, the encode_ppm P5 convention).

    ``filter_type`` (0..4) applies that forward filter to EVERY row, so a
    round-trip exercises the decoder's matching unfilter path."""
    if len(pixels) != height or any(len(row) != width for row in pixels):
        raise ValueError("pixels must be height rows of width (r,g,b) tuples")
    if filter_type not in range(5):
        raise ValueError("filter_type must be 0..4")
    if gray:
        arr = np.array(
            [[px[0] for px in row] for row in pixels], np.intp
        ).reshape(height, width, 1)
        ctype_n, nch = 0, 1
    else:
        arr = np.array(
            [[px[:3] for px in row] for row in pixels], np.intp
        ).reshape(height, width, 3)
        ctype_n, nch = 2, 3
    stride = width * nch
    flat = arr.reshape(height, stride)
    body = bytearray()
    prev = np.zeros(stride, np.intp)
    for y in range(height):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(nch, np.intp), cur[:-nch]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:  # Average
            left = np.concatenate([np.zeros(nch, np.intp), cur[:-nch]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            enc = np.empty(stride, np.intp)
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                ul = int(prev[x - nch]) if x >= nch else 0
                enc[x] = (int(cur[x]) - _paeth(left, int(prev[x]), ul)) & 0xFF
        body.append(filter_type)
        body += bytes(int(v) for v in enc)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype_n, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + _chunk(b"IEND", b"")
    )
