"""Baseline TIFF decode in pure Python + numpy (no image library).

The scanned-document sibling of operators/jpeg.py / png.py / gif.py:
document-heavy corpora (OCR pipelines, archival scans) stage through
TIFF, and curation needs pixels + geometry without an image library.
Implemented from the public Adobe TIFF 6.0 specification.

Scope (everything else raises ``ValueError`` so the dispatch in
``multimodal.decode_image_payload`` degrades to PIL-if-present /
'unsupported'):

* both byte orders (``II`` little / ``MM`` big endian);
* 8-bit samples, 1 (grayscale) or 3 (RGB) samples per pixel, chunky
  planar configuration, first IFD only (multi-page: the first page, the
  mp4/gif first-frame convention);
* Compression 1 (none) and 32773 (PackBits RLE — the spec's own
  run-length scheme, decoded from its Section 9 description);
* photometric 0 (WhiteIsZero, inverted to the standard scale), 1
  (BlackIsZero), 2 (RGB); strips honored via
  StripOffsets/StripByteCounts/RowsPerStrip.

Return contract matches the sibling parsers: ``{width, height, mode,
px_mean, pixels}``.  ``encode_tiff`` (test-support) writes either byte
order and either compression, so every decode branch is round-trip
covered byte-exactly (TIFF is lossless).
"""

from __future__ import annotations

import struct

import numpy as np

from .media_limits import MAX_PIXELS as _MAX_PIXELS  # shared guard

# tag ids (TIFF 6.0 baseline)
_WIDTH, _LENGTH, _BITS, _COMPRESSION, _PHOTOMETRIC = 256, 257, 258, 259, 262
_STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR, _SAMPLE_FORMAT = 284, 339

_TYPE_SIZES = {1: 1, 3: 2, 4: 4}  # BYTE, SHORT, LONG — all the baseline needs


def _unpack_packbits(data: bytes, expected: int) -> bytes:
    """TIFF 6.0 Section 9 PackBits: n in 0..127 -> copy n+1 literals,
    n in -127..-1 -> repeat next byte 1-n times, -128 -> no-op."""
    out = bytearray()
    pos = 0
    while len(out) < expected:
        if pos >= len(data):
            raise ValueError("truncated PackBits strip")
        n = data[pos]
        pos += 1
        if n < 128:  # literal run
            if pos + n + 1 > len(data):
                raise ValueError("truncated PackBits literal run")
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # replicate run of 257 - n
            if pos >= len(data):
                raise ValueError("truncated PackBits replicate run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) != expected:
        raise ValueError("PackBits run overshoots strip size")
    return bytes(out)


def _read_ifd(payload: bytes, bo: str, offset: int) -> dict[int, list[int]]:
    if offset + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    (count,) = struct.unpack_from(bo + "H", payload, offset)
    end = offset + 2 + 12 * count
    if end + 4 > len(payload):
        raise ValueError("truncated TIFF IFD entries")
    tags: dict[int, list[int]] = {}
    for i in range(count):
        base = offset + 2 + 12 * i
        tag, typ, n = struct.unpack_from(bo + "HHI", payload, base)
        size = _TYPE_SIZES.get(typ)
        if size is None or n == 0:
            # RATIONAL/ASCII etc., or a malformed zero-count entry — a
            # stored empty list would IndexError past the ValueError
            # contract at one() (review r15 tiff #3)
            continue
        total = size * n
        if total <= 4:
            where = base + 8
        else:
            (where,) = struct.unpack_from(bo + "I", payload, base + 8)
            if where + total > len(payload):
                raise ValueError(f"TIFF tag {tag} data out of bounds")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(bo + str(n) + fmt, payload, where))
    return tags


def parse_tiff(payload: bytes) -> dict:
    """Decode the first page of a baseline TIFF without any image library.
    Raises ValueError on anything outside the documented scope."""
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    tags = _read_ifd(payload, bo, ifd_off)

    def one(tag: int, default: int | None = None) -> int:
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    width, height = one(_WIDTH), one(_LENGTH)
    if width == 0 or height == 0:
        raise ValueError("zero TIFF dimension")
    if width * height > _MAX_PIXELS:
        raise ValueError(f"image too large ({width}x{height})")
    spp = one(_SPP, 1)
    if spp not in (1, 3):
        raise ValueError(f"unsupported TIFF samples per pixel {spp}")
    bits = tags.get(_BITS, [8])
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depth {bits}")
    compression = one(_COMPRESSION, 1)
    if compression not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    photometric = one(_PHOTOMETRIC)
    if photometric not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photometric}")
    if (photometric == 2) != (spp == 3):
        raise ValueError("TIFF photometric / samples-per-pixel mismatch")
    if one(_PLANAR, 1) != 1:
        raise ValueError("planar TIFF not supported")
    if any(f != 1 for f in tags.get(_SAMPLE_FORMAT, [1])):
        raise ValueError("non-unsigned TIFF sample format not supported")

    offsets = tags.get(_STRIP_OFFSETS)
    counts = tags.get(_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing or mismatched strip tables")
    rows_per_strip = one(_ROWS_PER_STRIP, height)
    row_bytes = width * spp
    data = bytearray()
    remaining_rows = height
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            raise ValueError("TIFF strip out of bounds")
        strip = payload[off : off + cnt]
        strip_rows = min(rows_per_strip, remaining_rows)
        if compression == 32773:
            strip = _unpack_packbits(strip, strip_rows * row_bytes)
        data += strip
        remaining_rows -= strip_rows
    if len(data) < height * row_bytes:
        raise ValueError(
            f"TIFF pixel data short: {len(data)} < {height * row_bytes}"
        )
    px = np.frombuffer(bytes(data), np.uint8, height * row_bytes).reshape(
        height, width, spp
    )
    if photometric == 0:  # WhiteIsZero: invert to the standard scale
        px = 255 - px
    px = np.ascontiguousarray(px)
    return {
        "width": width,
        "height": height,
        "mode": "RGB" if spp == 3 else "L",
        "px_mean": float(int(px.sum(dtype=np.int64))) / px.size,
        "pixels": px,
    }


# ---------------------------------------------------------------------------
# encoder (test-support)
# ---------------------------------------------------------------------------


def _pack_packbits(row: bytes) -> bytes:
    """Minimal valid PackBits: replicate runs of >=3, literals otherwise."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        while i < n:
            nxt = 1
            while i + nxt < n and row[i + nxt] == row[i] and nxt < 128:
                nxt += 1
            if nxt >= 3:
                break
            if (i - lit_start) + nxt > 128:
                # a 2-byte run straddling the 128 cap would push the
                # literal to 129 bytes -> header 0x80, a spec NO-OP that
                # corrupts the stream (review r15 tiff #4)
                break
            i += nxt
        out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def encode_tiff(
    width: int,
    height: int,
    pixels,
    *,
    gray: bool = False,
    big_endian: bool = False,
    packbits: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Build a baseline TIFF from ``height`` rows of ``width`` ``(r, g, b)``
    tuples (the sibling encoders' convention; ``gray`` uses each pixel's
    red value).  ``packbits`` compresses each strip with the spec's RLE;
    ``rows_per_strip`` < height exercises multi-strip assembly."""
    if len(pixels) != height or any(len(row) != width for row in pixels):
        raise ValueError("pixels must be height rows of width (r,g,b) tuples")
    bo = ">" if big_endian else "<"
    spp = 1 if gray else 3
    if gray:
        arr = np.array([[px[0] for px in row] for row in pixels], np.uint8)
        arr = arr.reshape(height, width, 1)
    else:
        arr = np.array(
            [[px[:3] for px in row] for row in pixels], np.uint8
        ).reshape(height, width, 3)
    rps = rows_per_strip or height
    raw = arr.tobytes()
    row_bytes = width * spp
    strips = []
    for y0 in range(0, height, rps):
        strip = raw[y0 * row_bytes : min(y0 + rps, height) * row_bytes]
        strips.append(_pack_packbits(strip) if packbits else strip)

    n_tags = 9
    header = struct.pack(bo + "2sHI", b"MM" if big_endian else b"II", 42, 8)
    ifd_size = 2 + 12 * n_tags + 4
    # layout: header(8) | IFD | [strip tables if >1 strip] | strip data
    tables_off = 8 + ifd_size
    n_strips = len(strips)
    if n_strips > 1:
        offsets_off = tables_off
        counts_off = tables_off + 4 * n_strips
        data_off = counts_off + 4 * n_strips
    else:
        data_off = tables_off
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    def entry(tag: int, typ: int, count: int, value: int) -> bytes:
        if typ == 3 and count == 1:
            return struct.pack(bo + "HHIHH", tag, typ, count, value, 0)
        return struct.pack(bo + "HHII", tag, typ, count, value)

    entries = [
        entry(_WIDTH, 3, 1, width),
        entry(_LENGTH, 3, 1, height),
        entry(_BITS, 3, 1, 8),
        entry(_COMPRESSION, 3, 1, 32773 if packbits else 1),
        entry(_PHOTOMETRIC, 3, 1, 2 if spp == 3 else 1),
        entry(
            _STRIP_OFFSETS,
            4,
            n_strips,
            strip_offsets[0] if n_strips == 1 else offsets_off,
        ),
        entry(_SPP, 3, 1, spp),
        entry(_ROWS_PER_STRIP, 3, 1, rps),
        entry(
            _STRIP_COUNTS,
            4,
            n_strips,
            len(strips[0]) if n_strips == 1 else counts_off,
        ),
    ]
    out = bytearray(header)
    out += struct.pack(bo + "H", n_tags)
    for e in sorted(entries, key=lambda b: struct.unpack_from(bo + "H", b)[0]):
        out += e
    out += struct.pack(bo + "I", 0)  # no next IFD
    if n_strips > 1:
        for o in strip_offsets:
            out += struct.pack(bo + "I", o)
        for s in strips:
            out += struct.pack(bo + "I", len(s))
    for s in strips:
        out += s
    return bytes(out)
