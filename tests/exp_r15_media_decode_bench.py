"""Measured decode throughput of the from-spec media codecs through the
REAL Spark surface (decode_media / decode_audio / video_metadata over
Arrow mapInPandas), for PERFORMANCE.md "Round-15 media wave".

Run: python tests/exp_r15_media_decode_bench.py
Protocol: one JVM, 8 partitions, 512 payloads per format at 64x64 (images)
/ 1 s stereo 16 kHz (wav) / 2-track container (mp4); steady = min of 3
timed passes after one warm-up; fixed-work numpy canary per block."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thesis_iceberg_spark import get_spark  # noqa: E402
from thesis_iceberg_spark.operators import multimodal as mm
from thesis_iceberg_spark.operators.gif import encode_gif
from thesis_iceberg_spark.operators.jpeg import encode_jpeg
from thesis_iceberg_spark.operators.mp4 import build_mp4
from thesis_iceberg_spark.operators.png import encode_png
from thesis_iceberg_spark.operators.wav import encode_wav

N, W, H = 512, 64, 64


def canary():
    t0 = time.perf_counter()
    a = np.random.default_rng(0).standard_normal((1000, 1000))
    (a @ a).sum()
    return round(time.perf_counter() - t0, 4)


def timed(fn, passes=3):
    fn()  # warm
    best = None
    for _ in range(passes):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, (H, W, 3))
    # GIF needs <=256 distinct colors; reuse a 64-color quantized variant
    pal = rng.integers(0, 256, (64, 3))
    gif_arr = pal[rng.integers(0, 64, (H, W))]

    def px(arr):
        return [
            [tuple(int(c) for c in arr[y, x]) for x in range(arr.shape[1])]
            for y in range(arr.shape[0])
        ]

    pix, gif_pix = px(base), px(gif_arr)
    from thesis_iceberg_spark.operators.tiff import encode_tiff

    formats = {
        "bmp": mm.encode_bmp(W, H, pix),
        "ppm": mm.encode_ppm(W, H, pix),
        "png_paeth": encode_png(W, H, pix, filter_type=4),
        "gif": encode_gif(W, H, gif_pix),
        "jpeg_q8": encode_jpeg(W, H, pix, qval=8),
        "tiff_packbits": encode_tiff(W, H, pix, packbits=True),
    }
    print(f"payload sizes (bytes): { {k: len(v) for k, v in formats.items()} }")
    for name, payload in formats.items():
        media = spark.createDataFrame(
            [(i, "image", bytearray(payload)) for i in range(N)],
            "media_id LONG, kind STRING, payload BINARY",
        ).repartition(8).cache()
        media.count()
        t = timed(lambda: mm.decode_media(media).filter("decoder <> 'x'").count())
        print(f"{name}: {N} x {W}x{H} decode_media pass = {t} s "
              f"({round(N / t)} img/s), canary_numpy {canary()}")
        media.unpersist()

    wav = encode_wav(16000, np.sin(np.arange(16000 * 2).reshape(-1, 2) / 50.0) * 0.5)
    media = spark.createDataFrame(
        [(i, "audio", bytearray(wav)) for i in range(N)],
        "media_id LONG, kind STRING, payload BINARY",
    ).repartition(8).cache()
    media.count()
    t = timed(lambda: mm.decode_audio(media).count())
    print(f"wav: {N} x 1s-stereo decode_audio pass = {t} s ({round(N / t)} clips/s)")
    t = timed(lambda: mm.audio_spectrogram(media).count())
    print(f"wav: {N} x 1s-stereo audio_spectrogram pass = {t} s "
          f"({round(N / t)} clips/s), canary_numpy {canary()}")
    media.unpersist()

    mp4 = build_mp4(
        5000,
        [
            {"handler": "vide", "codec": "avc1", "width": 640, "height": 360, "duration_ms": 5000},
            {"handler": "soun", "codec": "mp4a", "width": 0, "height": 0, "duration_ms": 5000},
        ],
    )
    media = spark.createDataFrame(
        [(i, "video", bytearray(mp4)) for i in range(N)],
        "media_id LONG, kind STRING, payload BINARY",
    ).repartition(8).cache()
    media.count()
    t = timed(lambda: mm.video_metadata(media).count())
    print(f"mp4: {N} x 2-track video_metadata pass = {t} s ({round(N / t)} files/s)")
    media.unpersist()

    from thesis_iceberg_spark.operators.mkv import build_mkv

    webm = build_mkv(
        72000,
        [
            {"type": "video", "codec": "V_VP9", "width": 1280, "height": 720},
            {"type": "audio", "codec": "A_OPUS", "sample_rate": 48000, "channels": 2},
        ],
    )
    media = spark.createDataFrame(
        [(i, "video", bytearray(webm)) for i in range(N)],
        "media_id LONG, kind STRING, payload BINARY",
    ).repartition(8).cache()
    media.count()
    t = timed(lambda: mm.video_metadata(media).count())
    print(f"webm: {N} x 2-track video_metadata pass = {t} s ({round(N / t)} files/s)")
    media.unpersist()


if __name__ == "__main__":
    main()
