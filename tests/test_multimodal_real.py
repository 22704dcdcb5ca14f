"""Real (codec-free) multimodal decode: PPM images and PCM WAV audio.

The multimodal tier's compressed-format decode stays honestly gated (no
codec in the container), but PPM and WAV need none — these tests prove
the decode is the genuine article: synthesized payloads round-trip
through encode→Spark binary column→mapInPandas decode, and the extracted
statistics match a from-scratch numpy recomputation exactly."""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_rest_server_spark.operators.multimodal import (
    decode_image,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    ppm_image_stats,
    resize_rgb,
    wav_audio_stats,
)


def _make_image(seed: int, w: int = 12, h: int = 9) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _make_audio(seed: int, n: int = 800, rate: int = 8000) -> np.ndarray:
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    wave = 3000 * np.sin(2 * np.pi * (50 + seed % 30) * t / rate)
    noise = rng.randint(-200, 200, size=n)
    return (wave + noise).astype(np.int16).reshape(-1, 1)


def test_ppm_roundtrip_and_comment_header():
    img = _make_image(7)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # header comments are part of the format — the parser must skip them
    with_comment = b"P6\n# synthetic test asset\n12 9\n255\n" + img.tobytes()
    assert (decode_ppm(with_comment) == img).all()
    # decode_image dispatches PPM natively, gates compressed formats
    assert (decode_image(encode_ppm(img)) == img).all()
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_wav_roundtrip():
    audio = _make_audio(3)
    got, rate = decode_wav(encode_wav(audio, 8000))
    assert rate == 8000
    assert (got == audio).all()


def test_resize_rgb_matches_naive_nearest():
    img = _make_image(11, w=10, h=7)
    out = resize_rgb(img, 4, 3)
    for y in range(3):
        for x in range(4):
            sy = ((y * 2 + 1) * 7) // 6
            sx = ((x * 2 + 1) * 10) // 8
            assert (out[y, x] == img[sy, sx]).all()


def test_ppm_image_stats_spark_matches_numpy(spark):
    imgs = {i: _make_image(i, w=8 + i, h=5 + i) for i in range(6)}
    rows = [(i, bytearray(encode_ppm(img))) for i, img in imgs.items()]
    assets = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = ppm_image_stats(assets).toPandas().set_index("doc_id")
    for i, img in imgs.items():
        r = out.loc[i]
        assert (r.width, r.height) == (img.shape[1], img.shape[0])
        means = img.reshape(-1, 3).astype(np.int64).sum(axis=0) / (
            img.shape[0] * img.shape[1]
        )
        assert (r.mean_r, r.mean_g, r.mean_b) == tuple(means)


def test_wav_audio_stats_spark_matches_numpy(spark):
    clips = {i: _make_audio(i) for i in range(5)}
    rows = [(i, bytearray(encode_wav(a, 8000))) for i, a in clips.items()]
    assets = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = wav_audio_stats(assets).toPandas().set_index("doc_id")
    for i, a in clips.items():
        mono = a[:, 0].astype(np.int64)
        r = out.loc[i]
        assert r.n_samples == len(mono)
        assert r.rate == 8000
        assert r.rms == float(np.sqrt(int((mono * mono).sum()) / len(mono)))
        assert r.zero_crossings == int(((mono[:-1] >= 0) != (mono[1:] >= 0)).sum())
