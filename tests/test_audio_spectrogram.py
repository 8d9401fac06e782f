"""Real audio spectrogram (multimodal.audio_spectrogram): a pure tone's
energy lands in the band holding its FFT bin, frame fan-out matches the
hop arithmetic, and undecodable payloads emit nothing."""

import numpy as np
import pytest

from thesis_iceberg_spark.operators.multimodal import audio_spectrogram
from thesis_iceberg_spark.operators.wav import encode_wav

N_FFT, HOP, N_BANDS, RATE = 256, 128, 16, 16000


def _expected_band(freq_hz):
    """Replicate the operator's log-spaced band edges and locate the bin."""
    edges = np.unique(np.round(np.geomspace(1, N_FFT // 2, N_BANDS + 1)).astype(int))
    target = round(freq_hz / RATE * N_FFT)
    for i, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
        if lo <= target < hi:
            return i
    raise AssertionError("tone bin outside band range")


def test_tone_energy_lands_in_its_band(spark):
    n = 1024
    t = np.arange(n) / RATE
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(encode_wav(RATE, tone, bits=16))),
            (2, "audio", bytearray(b"garbage, not a wav")),
            (3, "audio", None),
            (4, "image", bytearray(b"skipped")),
        ],
        "media_id LONG, kind STRING, payload BINARY",
    )
    rows = audio_spectrogram(media, n_fft=N_FFT, hop=HOP, n_bands=N_BANDS).collect()
    # only the decodable audio row fans out; corrupt/NULL emit nothing
    assert {r.media_id for r in rows} == {1}
    assert len(rows) == 1 + (n - N_FFT) // HOP
    assert {r.frame_idx for r in rows} == set(range(len(rows)))
    band = _expected_band(440)
    for r in rows:
        assert len(r.band_energies) == N_BANDS
        assert int(np.argmax(r.band_energies)) == band


def test_short_payload_emits_nothing(spark):
    media = spark.createDataFrame(
        [(1, "audio", bytearray(encode_wav(RATE, np.zeros(32), bits=16)))],
        "media_id LONG, kind STRING, payload BINARY",
    )
    assert audio_spectrogram(media, n_fft=N_FFT, hop=HOP).count() == 0


def test_parameter_validation(spark):
    media = spark.createDataFrame(
        [(1, "audio", None)], "media_id LONG, kind STRING, payload BINARY"
    )
    with pytest.raises(ValueError, match="n_fft"):
        audio_spectrogram(media, n_fft=16, n_bands=16)
