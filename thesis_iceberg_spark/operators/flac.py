"""FLAC STREAMINFO metadata extraction in pure Python (no audio library).

The audio twin of operators/mp4.py's curation story: a FLAC payload's
first metadata block (STREAMINFO, mandatory per the public FLAC format
spec) carries everything corpus curation filters on — sample rate,
channels, bit depth, total samples — without touching a single coded
frame.  Frame decode is out of scope (a FLAC codec from scratch is not
worth it; the metadata layer is).

Raises ``ValueError`` on anything malformed so callers degrade to
'unsupported'.  ``build_flac_streaminfo`` (test-support) emits a valid
header so every parsed field is round-trip covered.
"""

from __future__ import annotations

import struct


def parse_flac_streaminfo(payload: bytes) -> dict:
    """Extract ``{sample_rate, channels, bits, n_samples, duration_ms}``
    from a FLAC payload's mandatory STREAMINFO block.  ``n_samples`` and
    ``duration_ms`` are None when the stream declares 0 total samples
    (unknown, e.g. live captures)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    if len(payload) < 8:
        raise ValueError("truncated FLAC header")
    header = payload[4]
    if header & 0x7F != 0:  # block type 0 = STREAMINFO, mandatory first
        raise ValueError("FLAC first metadata block is not STREAMINFO")
    (length,) = struct.unpack(">I", b"\x00" + payload[5:8])
    if length != 34:
        raise ValueError(f"bad STREAMINFO length {length}")
    if len(payload) < 8 + 34:
        raise ValueError("truncated STREAMINFO")
    body = payload[8 : 8 + 34]
    # bytes 10..17: sample_rate(20) | channels-1(3) | bits-1(5) | total(36)
    packed = int.from_bytes(body[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        raise ValueError("zero FLAC sample rate")
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_samples": total or None,  # 0 = unknown per spec
        "duration_ms": total * 1000 // rate if total else None,
    }


def build_flac_streaminfo(
    sample_rate: int,
    channels: int,
    bits: int,
    n_samples: int,
    *,
    last_block: bool = True,
) -> bytes:
    """Minimal valid FLAC header: magic + one STREAMINFO block (zeroed
    block/frame sizes and md5 — fields the parser does not read)."""
    if not (1 <= channels <= 8 and 4 <= bits <= 32 and 0 < sample_rate < 1 << 20):
        raise ValueError("out-of-range STREAMINFO fields")
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | (n_samples & ((1 << 36) - 1))
    )
    body = bytes(10) + packed.to_bytes(8, "big") + bytes(16)
    header = bytes([(0x80 if last_block else 0) | 0x00]) + len(body).to_bytes(3, "big")
    return b"fLaC" + header + body
