"""Ogg container METADATA extraction in pure Python (no audio library).

Completes the audio-container trio (wav / flac / ogg): web-crawled
audio is heavily Opus-in-Ogg (and legacy Vorbis), and curation needs
channels / sample rate / duration without an audio codec.  Implemented
from the public specs: RFC 3533 (Ogg framing), RFC 7845 (OpusHead),
and the Vorbis I specification (identification header).

The parser walks PAGE HEADERS only (27-byte header + segment table —
packet payloads beyond the first are never materialized), verifies
every page CRC with Ogg's own polynomial (0x04C11DB7, unreflected,
zero init — computed over the page with the CRC field zeroed), reads
the first packet's OpusHead / Vorbis id header, and takes the duration
from the last completed page's granule position (Opus: 48 kHz ticks
minus pre-skip; Vorbis: sample ticks at the declared rate).  Malformed
framing, CRC mismatches, or an unrecognized first packet raise
``ValueError`` so callers degrade to 'unsupported'.

``build_ogg`` (test-support) emits valid CRC'd pages for both codecs so
every parsed field is round-trip covered.
"""

from __future__ import annotations

import struct

MAGIC = b"OggS"

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 else (_r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _page(payload: bytes, pos: int) -> tuple[dict, int]:
    """Parse one page header at pos; returns (page info, next pos).
    Verifies the CRC over the whole page with the CRC field zeroed."""
    if payload[pos : pos + 4] != MAGIC:
        raise ValueError("Ogg page capture pattern missing")
    if pos + 27 > len(payload):
        raise ValueError("truncated Ogg page header")
    version, htype = payload[pos + 4], payload[pos + 5]
    if version != 0:
        raise ValueError(f"unsupported Ogg version {version}")
    (granule,) = struct.unpack_from("<q", payload, pos + 6)
    (crc,) = struct.unpack_from("<I", payload, pos + 22)
    nsegs = payload[pos + 26]
    table_end = pos + 27 + nsegs
    if table_end > len(payload):
        raise ValueError("truncated Ogg segment table")
    body_len = sum(payload[pos + 27 : table_end])
    end = table_end + body_len
    if end > len(payload):
        raise ValueError("truncated Ogg page body")
    page = bytearray(payload[pos:end])
    page[22:26] = b"\x00\x00\x00\x00"
    if _ogg_crc(bytes(page)) != crc:
        raise ValueError("Ogg page CRC mismatch")
    # first packet bytes: segments until a lacing value < 255
    first_packet = bytearray()
    off = table_end
    for lace in payload[pos + 27 : table_end]:
        first_packet += payload[off : off + lace]
        off += lace
        if lace < 255:
            break
    return (
        {
            "type": htype,
            "granule": granule,
            "first_packet": bytes(first_packet),
        },
        end,
    )


def parse_ogg_metadata(payload: bytes) -> dict:
    """Extract ``{codec, sample_rate, channels, duration_ms}`` from an
    Ogg Opus/Vorbis payload.  ``duration_ms`` is None when no page
    carries a valid granule (e.g. a header-only stream).  Raises
    ValueError outside the documented scope."""
    if payload[:4] != MAGIC:
        raise ValueError("not an Ogg payload")
    first, pos = _page(payload, 0)
    if not first["type"] & 0x02:
        raise ValueError("first Ogg page is not beginning-of-stream")
    pkt = first["first_packet"]
    if pkt[:8] == b"OpusHead":
        if len(pkt) < 19:
            raise ValueError("truncated OpusHead")
        channels = pkt[9]
        (preskip,) = struct.unpack_from("<H", pkt, 10)
        (in_rate,) = struct.unpack_from("<I", pkt, 12)
        codec = "opus"
        tick_rate = 48000  # Opus granules are 48 kHz regardless of input
        sample_rate = in_rate if 0 < in_rate <= 0x7FFFFFFF else 48000
    elif pkt[:7] == b"\x01vorbis":
        if len(pkt) < 16:
            raise ValueError("truncated Vorbis id header")
        channels = pkt[11]
        (sample_rate,) = struct.unpack_from("<I", pkt, 12)
        if not 0 < sample_rate <= 0x7FFFFFFF:
            raise ValueError(f"implausible Vorbis rate {sample_rate}")
        codec = "vorbis"
        tick_rate = sample_rate
        preskip = 0
    else:
        raise ValueError("first Ogg packet is neither OpusHead nor Vorbis")
    if channels == 0:
        raise ValueError("zero Ogg channel count")
    # walk remaining page headers for the last valid granule position
    last_granule = None
    while pos < len(payload):
        page, pos = _page(payload, pos)
        if page["granule"] >= 0:  # -1 marks a continuation-only page
            last_granule = page["granule"]
    if last_granule is None:
        duration_ms = None
    else:
        ticks = max(last_granule - preskip, 0)
        duration_ms = ticks * 1000 // tick_rate
    return {
        "codec": codec,
        "sample_rate": int(sample_rate),
        "channels": int(channels),
        "duration_ms": duration_ms,
    }


# ---------------------------------------------------------------------------
# builder (test-support)
# ---------------------------------------------------------------------------


def _make_page(
    packet: bytes, *, htype: int, granule: int, serial: int = 1, seq: int = 0
) -> bytes:
    laces = [255] * (len(packet) // 255) + [len(packet) % 255]
    header = (
        MAGIC
        + bytes((0, htype))
        + struct.pack("<qIIi", granule, serial, seq, 0)
        + bytes([len(laces)])
        + bytes(laces)
    )
    page = bytearray(header + packet)
    crc = _ogg_crc(bytes(page))
    struct.pack_into("<I", page, 22, crc)
    return bytes(page)


def build_ogg(
    codec: str,
    sample_rate: int,
    channels: int,
    duration_ms: int,
    *,
    preskip: int = 312,
) -> bytes:
    """Minimal valid Ogg stream: a BOS page carrying OpusHead or the
    Vorbis id header, plus an EOS page whose granule encodes
    ``duration_ms`` (Opus: 48 kHz ticks + preskip; Vorbis: rate ticks)."""
    if codec == "opus":
        head = (
            b"OpusHead"
            + bytes((1, channels))
            + struct.pack("<HIhB", preskip, sample_rate, 0, 0)
        )
        granule = duration_ms * 48000 // 1000 + preskip
    elif codec == "vorbis":
        head = (
            b"\x01vorbis"
            + struct.pack("<IB I", 0, channels, sample_rate)
            + struct.pack("<IIIB", 0, 0, 0, 1)
        )
        granule = duration_ms * sample_rate // 1000
    else:
        raise ValueError("codec must be opus or vorbis")
    bos = _make_page(head, htype=0x02, granule=0, seq=0)
    eos = _make_page(b"\x00" * 8, htype=0x04, granule=granule, seq=1)
    return bos + eos
