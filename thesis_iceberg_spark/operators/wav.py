"""RIFF/WAV PCM decode in pure Python + numpy (no audio library).

The audio sibling of operators/jpeg.py / png.py: ``decode_audio`` in
multimodal.py previously had only the clearly-marked fake byte-statistics
featurizer; with this module, uncompressed WAV — the interchange format
real audio corpora stage through — decodes from the public spec alone
(Microsoft RIFF/WAVE, IBM/MS Multimedia Programming Interface spec).

Scope (everything else raises ``ValueError`` so callers degrade to
'unsupported', the decode_media corrupt-row convention):

* format tag 1 (integer PCM) at 8/16/24/32-bit, and tag 3 (IEEE float)
  at 32/64-bit; WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolved through its
  SubFormat GUID to the same two;
* any channel count / sample rate; odd-sized chunks honor RIFF word
  alignment; unknown chunks (LIST, fact, cue, ...) are skipped.

Returns ``{sample_rate, channels, bits, n_samples, duration_ms,
samples}`` — ``samples`` a (n_samples, channels) float64 array
normalized to [-1, 1] (integer PCM divided by 2^(bits-1); floats taken
as stored), ``duration_ms`` = n_samples * 1000 // sample_rate.

``encode_wav`` (test-support) writes integer PCM at 8/16/24/32-bit or
float32/float64, so every decode branch is round-trip-covered.
"""

from __future__ import annotations

import struct

import numpy as np

from .media_limits import MAX_AUDIO_SAMPLES as _MAX_SAMPLES  # shared guard

# WAVE_FORMAT_EXTENSIBLE SubFormat GUID suffix (fixed for PCM/float)
_KSDATAFORMAT_SUFFIX = b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def parse_wav(payload: bytes, *, with_samples: bool = True) -> dict:
    """Decode an uncompressed RIFF/WAVE payload without any audio library.
    Raises ValueError on anything outside the documented scope.
    ``with_samples=False`` validates and returns header metadata only
    (``samples`` is None) — the metadata-extraction path must not pay for
    a full PCM conversion of an arbitrarily long clip."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_end = pos + 8 + size
        if body_end > len(payload):
            raise ValueError(f"truncated WAV chunk {ctype!r}")
        if ctype == b"fmt ":
            fmt = payload[pos + 8 : body_end]
        elif ctype == b"data":
            data = payload[pos + 8 : body_end]
        pos = body_end + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if len(fmt) < 16:
        raise ValueError("truncated WAV fmt chunk")
    tag, channels, rate, _brate, _align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag lives in SubFormat
        if len(fmt) < 40:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        sub = fmt[24:40]
        if sub[4:] != _KSDATAFORMAT_SUFFIX:
            raise ValueError("unknown WAVE_FORMAT_EXTENSIBLE SubFormat")
        (tag,) = struct.unpack_from("<H", sub, 0)
    if channels == 0 or rate == 0:
        raise ValueError("zero WAV channel count or sample rate")
    if rate > 0x7FFFFFFF:
        # the uint32 field must survive downstream int32 columns
        # (decode_audio's Arrow schema) — a crafted header must degrade to
        # 'unsupported', not fail or wrap (review r15 #2)
        raise ValueError(f"implausible WAV sample rate {rate}")
    if tag == 1:
        if bits not in (8, 16, 24, 32):
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:
        if bits not in (32, 64):
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format tag {tag} (PCM/float only)")
    frame_bytes = channels * (bits // 8)
    if len(data) % frame_bytes:
        raise ValueError("WAV data length not a whole number of frames")
    n = len(data) // frame_bytes
    if n > _MAX_SAMPLES:
        raise ValueError(f"WAV too long ({n} frames)")
    if not with_samples:
        samples = None
    elif tag == 3:
        samples = np.frombuffer(
            data, np.float32 if bits == 32 else np.float64
        ).astype(np.float64)
    elif bits == 8:
        # 8-bit PCM is UNSIGNED with a 128 midpoint (the one asymmetric case)
        samples = (
            np.frombuffer(data, np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif bits == 24:
        b = np.frombuffer(data, np.uint8).reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v -= (v >> 23) << 24  # sign-extend from bit 23
        samples = v.astype(np.float64) / float(1 << 23)
    else:
        dt = np.int16 if bits == 16 else np.int32
        samples = np.frombuffer(data, dt).astype(np.float64) / float(
            1 << (bits - 1)
        )
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        "samples": None if samples is None else samples.reshape(n, channels),
    }


def encode_wav(sample_rate: int, samples, *, bits: int = 16, float_pcm: bool = False) -> bytes:
    """Build an uncompressed WAV from a (n, channels) array of floats in
    [-1, 1].  Integer PCM at ``bits`` in {8, 16, 24, 32}, or IEEE float at
    {32, 64} with ``float_pcm=True``."""
    a = np.asarray(samples, np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n, channels = a.shape
    if float_pcm:
        if bits not in (32, 64):
            raise ValueError("float WAV must be 32- or 64-bit")
        tag = 3
        body = a.astype(np.float32 if bits == 32 else np.float64).tobytes()
    elif bits == 8:
        tag = 1
        body = (
            np.clip(np.round(a * 128.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
        )
    elif bits in (16, 32):
        tag = 1
        full = float(1 << (bits - 1))
        v = np.clip(np.round(a * full), -full, full - 1)
        body = v.astype(np.int16 if bits == 16 else np.int32).tobytes()
    elif bits == 24:
        tag = 1
        full = float(1 << 23)
        v = np.clip(np.round(a * full), -full, full - 1).astype(np.int64)
        v = np.where(v < 0, v + (1 << 24), v).astype(np.uint32)
        b = np.zeros((v.size, 3), np.uint8)
        flat = v.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        body = b.tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    frame_bytes = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, sample_rate * frame_bytes, frame_bytes, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"  # word alignment pad
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
