"""Matroska / WebM METADATA extraction in pure Python (no media library).

The EBML sibling of operators/mp4.py: web-crawled video corpora are
split between ISO-BMFF (mp4) and Matroska (mkv/webm), and curation
needs duration / track types / codec IDs / dimensions from both without
decoding a frame.  Implemented from the public EBML (RFC 8794) and
Matroska specifications.

Scope: EBML header DocType; Segment > Info (TimestampScale, Duration)
and Segment > Tracks > TrackEntry (TrackType, CodecID, Video
PixelWidth/PixelHeight, Audio SamplingFrequency/Channels).  Unknown-size
elements (all-ones length, common for live/streamed Segments) are
followed to the end of their enclosing scope.  Malformed varints,
truncation, or a missing Segment/Info raise ``ValueError`` so callers
degrade to 'unsupported'.  The first Cluster (sized OR unknown-size —
live muxers cannot seek back to patch lengths) terminates the walk:
media data is never read, and Info/Tracks precede clusters in any mux.
Other elements are skipped by size.

``build_mkv`` (test-support) emits valid EBML so every parsed field is
round-trip covered, including the unknown-size Segment path.
"""

from __future__ import annotations

import math
import struct

MAGIC = b"\x1a\x45\xdf\xa3"  # EBML header element ID (shared with dispatch)
_MAGIC = MAGIC

# element IDs (with marker bits, as they appear on the wire)
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_AUDIO = 0xE1
_SAMPLING = 0xB5
_CHANNELS = 0x9F
_DOCTYPE = 0x4282
_CLUSTER = 0x1F43B675

_CONTAINERS = {_SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _AUDIO, 0x1A45DFA3}


def _read_id(payload: bytes, pos: int, end: int) -> tuple[int, int]:
    """EBML element ID: 1-4 bytes, length from leading zero bits, marker
    bit KEPT (IDs are compared with it, per RFC 8794)."""
    if pos >= end:
        raise ValueError("truncated EBML element ID")
    first = payload[pos]
    if first == 0:
        raise ValueError("invalid EBML ID leading byte 0x00")
    n = 8 - first.bit_length() + 1
    if n > 4 or pos + n > end:
        raise ValueError("bad EBML element ID")
    val = 0
    for b in payload[pos : pos + n]:
        val = (val << 8) | b
    return val, pos + n


def _read_size(payload: bytes, pos: int, end: int) -> tuple[int | None, int]:
    """EBML data size: 1-8 bytes, marker bit STRIPPED; all-ones payload
    means 'unknown size' (returned as None)."""
    if pos >= end:
        raise ValueError("truncated EBML size")
    first = payload[pos]
    if first == 0:
        raise ValueError("invalid EBML size leading byte 0x00")
    n = 8 - first.bit_length() + 1
    if n > 8 or pos + n > end:
        raise ValueError("bad EBML size")
    val = first & ((1 << (8 - n)) - 1)
    for b in payload[pos + 1 : pos + n]:
        val = (val << 8) | b
    if val == (1 << (7 * n)) - 1:  # all value bits set: unknown size
        return None, pos + n
    return val, pos + n


def _uint(body: bytes) -> int:
    if not 0 < len(body) <= 8:
        raise ValueError("bad EBML uint length")
    v = 0
    for b in body:
        v = (v << 8) | b
    return v


def _float(body: bytes) -> float:
    if len(body) == 4:
        v = struct.unpack(">f", body)[0]
    elif len(body) == 8:
        v = struct.unpack(">d", body)[0]
    else:
        raise ValueError("bad EBML float length")
    if not math.isfinite(v):
        # inf/nan would raise OverflowError at int() downstream, escaping
        # the ValueError-only corrupt-row handlers (review r15 mkv #1)
        raise ValueError("non-finite EBML float")
    return v


_INT32_MAX = 0x7FFFFFFF


def _bounded_uint(body: bytes, what: str) -> int:
    """EBML uint bounded to int32: these feed IntegerType Arrow columns,
    and a crafted huge value must degrade to 'unsupported', not fail the
    batch (the WAV sample-rate lesson, review r15 #2 / mkv #2)."""
    v = _uint(body)
    if v > _INT32_MAX:
        raise ValueError(f"implausible Matroska {what} {v}")
    return v


def parse_mkv_metadata(payload: bytes) -> dict:
    """Extract ``{doc_type, duration_ms, n_tracks, tracks}`` from a
    Matroska/WebM payload; each track is ``{type, codec, width, height,
    sample_rate, channels}``.  Raises ValueError outside the documented
    scope."""
    if payload[:4] != _MAGIC:
        raise ValueError("not an EBML/Matroska payload")
    doc_type = None
    scale = 1_000_000  # Matroska default: timestamps in nanoseconds/scale
    duration_raw: float | None = None
    tracks: list[dict] = []
    saw_info = False

    def walk(pos: int, end: int, depth: int, track: dict | None) -> None:
        nonlocal doc_type, scale, duration_raw, saw_info
        if depth > 8:
            raise ValueError("EBML nesting too deep")
        while pos < end:
            eid, pos = _read_id(payload, pos, end)
            size, pos = _read_size(payload, pos, end)
            bend = end if size is None else pos + size
            if size is not None and bend > end:
                raise ValueError(f"EBML element 0x{eid:x} overruns scope")
            if eid == _CLUSTER:
                # media data begins; Info/Tracks precede clusters in any
                # seekable-or-live mux, and live Clusters are unknown-size
                # (a live muxer cannot seek back) — stop the walk instead
                # of rejecting the file (review r15 mkv #5)
                return
            if eid in _CONTAINERS:
                t = track
                if eid == _TRACK_ENTRY:
                    t = {
                        "type": None,
                        "codec": None,
                        "width": None,
                        "height": None,
                        "sample_rate": None,
                        "channels": None,
                    }
                    tracks.append(t)
                if eid == _INFO:
                    saw_info = True
                walk(pos, bend, depth + 1, t)
            elif size is None:
                raise ValueError("unknown-size EBML element is not a container")
            else:
                body = payload[pos:bend]
                if eid == _DOCTYPE:
                    doc_type = body.split(b"\x00")[0].decode("latin-1")
                elif eid == _TIMESTAMP_SCALE:
                    scale = _uint(body)
                    if scale == 0:
                        raise ValueError("zero Matroska timestamp scale")
                elif eid == _DURATION:
                    duration_raw = _float(body)
                elif track is not None:
                    if eid == _TRACK_TYPE:
                        track["type"] = {1: "video", 2: "audio"}.get(
                            _uint(body), "other"
                        )
                    elif eid == _CODEC_ID:
                        track["codec"] = body.split(b"\x00")[0].decode("latin-1")
                    elif eid == _PIXEL_W:
                        track["width"] = _bounded_uint(body, "pixel width")
                    elif eid == _PIXEL_H:
                        track["height"] = _bounded_uint(body, "pixel height")
                    elif eid == _SAMPLING:
                        rate = int(_float(body))
                        if not 0 < rate <= _INT32_MAX:
                            raise ValueError(f"implausible sampling rate {rate}")
                        track["sample_rate"] = rate
                    elif eid == _CHANNELS:
                        track["channels"] = _bounded_uint(body, "channel count")
            pos = bend

    walk(0, len(payload), 0, None)
    if not saw_info:
        raise ValueError("Matroska missing Segment Info")
    if duration_raw is None:
        duration_ms = None
    else:
        if duration_raw < 0 or duration_raw * scale / 1_000_000 > 2**62:
            raise ValueError(f"implausible Matroska duration {duration_raw}")
        duration_ms = int(duration_raw * scale / 1_000_000)
    return {
        "doc_type": doc_type,
        "duration_ms": duration_ms,
        "n_tracks": len(tracks),
        "tracks": tracks,
    }


# ---------------------------------------------------------------------------
# builder (test-support)
# ---------------------------------------------------------------------------


def _enc_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _enc_size(size: int | None, width: int = 0) -> bytes:
    if size is None:  # unknown size, 1-byte form
        return b"\xff"
    n = max(width, 1)
    while size >= (1 << (7 * n)) - 1:
        n += 1
    return ((1 << (7 * n)) | size).to_bytes(n, "big")


def _el(eid: int, body: bytes, unknown_size: bool = False) -> bytes:
    return _enc_id(eid) + _enc_size(None if unknown_size else len(body)) + body


def build_mkv(
    duration_ms: int | None,
    tracks: list[dict],
    *,
    doc_type: str = "webm",
    timestamp_scale: int = 1_000_000,
    unknown_segment_size: bool = False,
) -> bytes:
    """Minimal valid Matroska/WebM: EBML header (DocType) + Segment(Info +
    Tracks).  Track spec: ``{type: 'video'|'audio', codec, width, height,
    sample_rate, channels}``.  ``unknown_segment_size`` exercises the
    live-stream all-ones-length path."""
    header = _el(0x1A45DFA3, _el(_DOCTYPE, doc_type.encode()))
    info_parts = [_el(_TIMESTAMP_SCALE, _uint_bytes(timestamp_scale))]
    if duration_ms is not None:
        dur_units = duration_ms * 1_000_000 / timestamp_scale
        info_parts.append(_el(_DURATION, struct.pack(">d", dur_units)))
    info = _el(_INFO, b"".join(info_parts))
    entries = []
    for t in tracks:
        parts = [
            _el(_TRACK_TYPE, bytes([1 if t["type"] == "video" else 2])),
            _el(_CODEC_ID, t["codec"].encode()),
        ]
        if t["type"] == "video":
            parts.append(
                _el(
                    _VIDEO,
                    _el(_PIXEL_W, _uint_bytes(t["width"]))
                    + _el(_PIXEL_H, _uint_bytes(t["height"])),
                )
            )
        else:
            parts.append(
                _el(
                    _AUDIO,
                    _el(_SAMPLING, struct.pack(">d", float(t["sample_rate"])))
                    + _el(_CHANNELS, _uint_bytes(t["channels"])),
                )
            )
        entries.append(_el(_TRACK_ENTRY, b"".join(parts)))
    seg_body = info + _el(_TRACKS, b"".join(entries))
    segment = _el(_SEGMENT, seg_body, unknown_size=unknown_segment_size)
    return header + segment


def _uint_bytes(v: int) -> bytes:
    n = max((int(v).bit_length() + 7) // 8, 1)
    return int(v).to_bytes(n, "big")
