"""GIF decode in pure Python + numpy (no image library).

Completes the compressed-image trio next to operators/jpeg.py and
png.py: GIF87a/GIF89a from the public specification (CompuServe GIF89a
spec) — logical screen descriptor, global/local color tables, variable-
width LSB-first LZW with CLEAR/END codes and 4096-entry dictionary,
Adam-style 4-pass interlacing, and GIF89a graphic-control transparency.

Decodes the FIRST frame, composited at its offset onto a background-
color canvas of the logical screen (animated GIFs: later frames are
ignored — corpus dedup/featurization keys on the poster frame).  A
transparent index upgrades the output to RGBA.  Everything else —
truncated streams, bad LZW codes, missing color tables — raises
``ValueError`` so ``multimodal.decode_image_payload`` degrades to
PIL-if-present / 'unsupported'.

Return contract matches the other parsers: ``{width, height, mode,
px_mean, pixels}``.  The test-support ``encode_gif`` writes a real LZW
stream (dictionary growth, width growth, CLEAR at 4096), so the
decoder's dictionary paths — including the KwKwK just-defined-code case
solid runs hit — are covered by round-trip, not fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

from .media_limits import MAX_PIXELS as _MAX_PIXELS  # shared guard


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at pos; returns (data, pos
    past the 0x00 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(payload):
            raise ValueError("truncated GIF sub-block")
        out += payload[pos : pos + n]
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF variable-width LZW (LSB-first bit packing).  Stops after
    ``expected`` pixels; raises on bad codes or early exhaustion."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while len(out) < expected:
        code = read_code(width)
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK: the just-about-to-be-defined code
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError(
            f"GIF LZW ended early: {len(out)} of {expected} pixels"
        )
    return bytes(out[:expected])


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def parse_gif(payload: bytes) -> dict:
    """Decode the first frame of a GIF87a/GIF89a payload without any image
    library.  Raises ValueError on anything outside the documented scope."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    width, height, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if width == 0 or height == 0:
        raise ValueError("zero GIF dimension")
    if width * height > _MAX_PIXELS:
        raise ValueError(f"image too large ({width}x{height})")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF: no image block before EOF")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF trailer before image data")
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                if data[0] & 0x01:
                    transparent = data[3]
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        break
    if pos + 9 > len(payload):
        raise ValueError("truncated GIF image descriptor")
    left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
    pos += 9
    if fw == 0 or fh == 0 or left + fw > width or top + fh > height:
        raise ValueError("GIF frame exceeds logical screen")
    ct = gct
    if fpacked & 0x80:  # local color table
        n = 2 << (fpacked & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF local color table")
        ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    if ct is None:
        raise ValueError("GIF image has no color table")
    if pos >= len(payload):
        raise ValueError("truncated GIF before LZW data")
    min_code_size = payload[pos]
    pos += 1
    data, pos = _sub_blocks(payload, pos)
    idx = np.frombuffer(
        _lzw_decode(data, min_code_size, fw * fh), np.uint8
    ).reshape(fh, fw)
    if fpacked & 0x40:
        idx = _deinterlace(idx)
    if int(idx.max()) >= len(ct):
        raise ValueError("GIF pixel index out of color-table range")

    # composite the frame onto a background-color canvas at its offset
    if gct is not None and bg_idx < len(gct):
        bg = gct[bg_idx]
    else:
        bg = np.zeros(3, np.uint8)
    canvas = np.empty((height, width, 3), np.uint8)
    canvas[:, :] = bg
    canvas[top : top + fh, left : left + fw] = ct[idx]
    if transparent is not None:
        # opaque everywhere (the background canvas), transparent only where
        # the frame's pixels carry the transparent index
        alpha = np.full((height, width, 1), 255, np.uint8)
        alpha[top : top + fh, left : left + fw, 0] = np.where(
            idx == transparent, 0, 255
        ).astype(np.uint8)
        px = np.concatenate([canvas, alpha], axis=2)
        mode = "RGBA"
    else:
        px = canvas
        mode = "RGB"
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


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW (not the uncompressed-literal trick), so decoding
    exercises dictionary growth, width growth, and the KwKwK path."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for byte in indices:
        k = w + bytes([byte])
        if k in table:
            w = k
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[k] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    pixels,
    *,
    interlace: bool = False,
    transparent: int | None = None,
) -> bytes:
    """Build a single-frame GIF89a from ``height`` rows of ``width``
    ``(r, g, b)`` tuples (the sibling encoders' convention).  The palette
    is built from the distinct colors (<= 256 required).  ``transparent``
    marks that palette index transparent via a graphic-control extension;
    ``interlace`` stores rows in 4-pass order."""
    if len(pixels) != height or any(len(row) != width for row in pixels):
        raise ValueError("pixels must be height rows of width (r,g,b) tuples")
    colors: dict[tuple[int, int, int], int] = {}
    idx = np.empty((height, width), np.uint8)
    for y, row in enumerate(pixels):
        for x, px in enumerate(row):
            c = tuple(int(v) for v in px[:3])
            if c not in colors:
                if len(colors) == 256:
                    raise ValueError("more than 256 distinct colors")
                colors[c] = len(colors)
            idx[y, x] = colors[c]
    # palette size: power of two >= max(2, len(colors))
    depth = max(1, (len(colors) - 1).bit_length())
    n = 1 << depth
    palette = np.zeros((n, 3), np.uint8)
    for c, i in colors.items():
        palette[i] = c
    min_code_size = max(2, depth)

    rows = idx
    if interlace:
        order = [
            y for start, step in _INTERLACE_PASSES for y in range(start, height, step)
        ]
        rows = idx[order]
    lzw = _lzw_encode(rows.tobytes(), min_code_size)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    if transparent is not None:
        out += b"\x21\xf9\x04" + bytes((0x01, 0, 0, transparent)) + b"\x00"
    fpacked = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, fpacked)
    out += bytes([min_code_size])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
