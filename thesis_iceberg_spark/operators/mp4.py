"""MP4 / ISO-BMFF METADATA extraction in pure Python (no media library).

Completes the modality trio's real-parse story: images decode
(jpeg/png/gif/bmp/ppm), audio decodes (wav) — video gets what corpus
curation actually needs at 100 TB: container metadata (duration,
dimensions, per-track codecs) WITHOUT touching a single coded frame.
Frame decode stays behind the documented sample_frames stub (a codec
from scratch is out of scope; the box layer is not).  The format is the
public ISO/IEC 14496-12 box structure plus the 14496-14 brands.

Scope: top-level box walk (``ftyp`` brands, ``moov`` subtree), nested
containers (``trak``/``mdia``/``minf``/``stbl``), and the leaf boxes
``mvhd`` (movie timescale/duration, versions 0 and 1), ``tkhd``
(track dims, 16.16 fixed point), ``mdhd`` (track timescale/duration),
``hdlr`` (handler type) and ``stsd`` (codec fourcc).  64-bit
``largesize`` boxes are followed; malformed sizes, truncation, missing
``moov``/``mvhd``, or nesting deeper than the spec needs raise
``ValueError`` so callers degrade to 'unsupported'.

``build_mp4`` (test-support) constructs a minimal-but-valid container
with chosen tracks so every parsed field is round-trip covered.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
_MAX_DEPTH = 8  # ftyp/moov/trak/mdia/minf/stbl + leaf margin


def _boxes(payload: bytes, start: int, end: int):
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated MP4 box header")
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize")
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"bad MP4 box size {size} for {btype!r}")
        yield btype, body, pos + size
        pos += size


def _fullbox(payload: bytes, body: int, bend: int) -> tuple[int, int]:
    """(version, first-field offset) of a full box; rejects a body too
    short for the 4-byte version/flags header (an empty full box at end
    of payload would otherwise IndexError past the ValueError contract)."""
    if bend - body < 4:
        raise ValueError("truncated MP4 full box header")
    return payload[body], body + 4


_UNKNOWN_DUR = {0: 0xFFFFFFFF, 1: 0xFFFFFFFFFFFFFFFF}  # per-version all-ones


def _duration_ms(dur: int, ts: int, version: int) -> int | None:
    """ISO 14496-12: an all-ones duration means 'cannot be determined'
    (fragmented/DASH files carry it in mvex/sidx) — surface None, not a
    49.7-day number a curation filter would act on."""
    if dur == _UNKNOWN_DUR[version]:
        return None
    return dur * 1000 // ts


def parse_mp4_metadata(payload: bytes) -> dict:
    """Extract container metadata from an ISO-BMFF (MP4/MOV/3GP...)
    payload: ``{major_brand, duration_ms, n_tracks, tracks}`` where each
    track is ``{handler, codec, width, height, duration_ms}``.  Raises
    ValueError on anything outside the documented scope."""
    if len(payload) < 16 or payload[4:8] not in (b"ftyp", b"moov"):
        raise ValueError("not an ISO-BMFF payload")
    major_brand = None
    movie = None  # (timescale, duration)
    tracks: list[dict] = []

    def walk(start: int, end: int, depth: int, track: dict | None) -> None:
        nonlocal major_brand, movie
        if depth > _MAX_DEPTH:
            raise ValueError("MP4 box nesting too deep")
        for btype, body, bend in _boxes(payload, start, end):
            if btype == b"ftyp":
                if bend - body < 8:
                    raise ValueError("truncated ftyp")
                major_brand = payload[body : body + 4].decode("latin-1")
            elif btype == b"trak":
                t = {
                    "handler": None,
                    "codec": None,
                    "width": None,
                    "height": None,
                    "duration_ms": None,
                }
                tracks.append(t)
                walk(body, bend, depth + 1, t)
            elif btype in _CONTAINERS:
                walk(body, bend, depth + 1, track)
            elif btype == b"mvhd":
                ver, p = _fullbox(payload, body, bend)
                if ver == 1:
                    if bend - p < 28:
                        raise ValueError("truncated mvhd v1")
                    ts, dur = struct.unpack_from(">IQ", payload, p + 16)
                else:
                    if bend - p < 20:
                        raise ValueError("truncated mvhd")
                    ts, dur = struct.unpack_from(">II", payload, p + 8)
                if ts == 0:
                    raise ValueError("zero mvhd timescale")
                movie = (ts, dur, ver)
            elif btype == b"tkhd" and track is not None:
                ver, p = _fullbox(payload, body, bend)
                fixed = bend - 8  # width/height are the LAST 8 bytes
                if fixed < p:
                    raise ValueError("truncated tkhd")
                w, h = struct.unpack_from(">II", payload, fixed)
                track["width"] = w >> 16  # 16.16 fixed point
                track["height"] = h >> 16
            elif btype == b"mdhd" and track is not None:
                ver, p = _fullbox(payload, body, bend)
                if ver == 1:
                    if bend - p < 28:
                        raise ValueError("truncated mdhd v1")
                    ts, dur = struct.unpack_from(">IQ", payload, p + 16)
                else:
                    if bend - p < 20:
                        raise ValueError("truncated mdhd")
                    ts, dur = struct.unpack_from(">II", payload, p + 8)
                if ts == 0:
                    raise ValueError("zero mdhd timescale")
                track["duration_ms"] = _duration_ms(dur, ts, ver)
            elif btype == b"hdlr" and track is not None:
                _, p = _fullbox(payload, body, bend)
                if bend - p < 8:
                    raise ValueError("truncated hdlr")
                track["handler"] = payload[p + 4 : p + 8].decode("latin-1")
            elif btype == b"stsd" and track is not None:
                _, p = _fullbox(payload, body, bend)
                if bend - p < 12:
                    raise ValueError("truncated stsd")
                (n_entries,) = struct.unpack_from(">I", payload, p)
                if n_entries >= 1:
                    # first sample entry: size(4) + format fourcc(4)
                    track["codec"] = payload[p + 8 : p + 12].decode("latin-1")
            # other boxes (mdat, free, udta, ...) skipped

    walk(0, len(payload), 0, None)
    if movie is None:
        raise ValueError("MP4 missing moov/mvhd")
    ts, dur, ver = movie
    return {
        "major_brand": major_brand,
        "duration_ms": _duration_ms(dur, ts, ver),
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


# ---------------------------------------------------------------------------
# builder (test-support)
# ---------------------------------------------------------------------------


def _box(btype: bytes, *payloads: bytes) -> bytes:
    body = b"".join(payloads)
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, *payloads: bytes) -> bytes:
    return _box(btype, bytes((version, 0, 0, 0)), *payloads)


def build_mp4(
    duration_ms: int,
    tracks: list[dict],
    *,
    major_brand: bytes = b"isom",
    timescale: int = 1000,
    mvhd_v1: bool = False,
) -> bytes:
    """Minimal valid ISO-BMFF container: ftyp + moov(mvhd + one trak per
    spec dict ``{handler: 'vide'|'soun', codec: fourcc str, width, height,
    duration_ms}``) + an empty mdat.  Exercises every field
    parse_mp4_metadata reads, including mvhd version 1."""
    dur = duration_ms * timescale // 1000
    if mvhd_v1:
        mvhd = _full(
            b"mvhd", 1, struct.pack(">QQIQ", 0, 0, timescale, dur), bytes(80)
        )
    else:
        # v0 body after version/flags: created/modified/timescale/duration
        # (16) + rate/volume/reserved/matrix/pre_defined/next_track_ID (80)
        mvhd = _full(
            b"mvhd", 0, struct.pack(">IIII", 0, 0, timescale, dur), bytes(80)
        )
    trak_boxes = []
    for t in tracks:
        # v0 body: created/modified/track_ID/reserved/duration (20) +
        # reserved/layer/alternate_group/volume/reserved/matrix (52) + w/h
        tkhd = _full(
            b"tkhd",
            0,
            struct.pack(">IIIII", 0, 0, 1, 0, 0),
            bytes(52),
            struct.pack(">II", (t.get("width") or 0) << 16, (t.get("height") or 0) << 16),
        )
        tdur = (t.get("duration_ms") or 0) * timescale // 1000
        mdhd = _full(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, timescale, tdur, 0, 0))
        hdlr = _full(
            b"hdlr", 0, b"\x00" * 4 + t["handler"].encode() + b"\x00" * 13
        )
        entry = struct.pack(">I", 16) + t["codec"].encode() + bytes(8)
        stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
        stbl = _box(b"stbl", stsd)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd, hdlr, minf)
        trak_boxes.append(_box(b"trak", tkhd, mdia))
    ftyp = _box(b"ftyp", major_brand, struct.pack(">I", 0), b"isomiso2")
    moov = _box(b"moov", mvhd, *trak_boxes)
    return ftyp + moov + _box(b"mdat")
