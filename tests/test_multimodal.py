"""Codec round-trips + real-decode kernels (multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest

from comet_spark.multimodal import (
    attach_media_real,
    audio_duration,
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    gray_grid_features,
    image_features,
)


def test_ppm_roundtrip():
    rng = np.random.RandomState(3)
    for h, w in [(1, 1), (3, 5), (17, 9)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_comments_and_whitespace():
    img = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
    data = b"P6 # a comment\n# another\n 2\t1 \n255\n" + img.tobytes()
    np.testing.assert_array_equal(decode_ppm(data), img)


def test_bmp_roundtrip_odd_width():
    # odd widths exercise the 4-byte row padding
    rng = np.random.RandomState(4)
    for h, w in [(2, 3), (5, 7), (4, 4)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


def test_decode_image_sniffs_format():
    img = np.full((2, 2, 3), 9, dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_ppm(img)), img)
    np.testing.assert_array_equal(decode_image(encode_bmp(img)), img)
    with pytest.raises(ValueError, match="unknown image format"):
        decode_image(b"\x89PNG....")


def test_wav_roundtrip():
    rng = np.random.RandomState(5)
    samples = (rng.rand(777) * 2 - 1) * 0.9
    out, rate = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000 and len(out) == 777
    # ±0.5 LSB quantization + the 32767-encode/32768-decode scale skew
    np.testing.assert_allclose(out, samples, atol=2.0 / 32768)


def test_wav_rejects_non_pcm():
    data = bytearray(encode_wav(np.zeros(10), 8000))
    data[20] = 3  # audio format -> IEEE float
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(data))


def test_gray_grid_features_constant_image():
    img = np.full((6, 6, 3), [30, 60, 90], dtype=np.uint8)
    f = gray_grid_features(img, 4)
    expect = (30 + 60 + 90) / 3.0 / 255.0
    np.testing.assert_allclose(f, [expect] * 4, rtol=0, atol=1e-15)


def test_gray_grid_features_pads_small_images():
    img = np.full((1, 1, 3), 255, dtype=np.uint8)
    f = gray_grid_features(img, 4)
    assert len(f) == 4 and np.allclose(f, 1.0)


def test_real_media_pipeline(spark):
    docs = spark.range(0, 60).selectExpr("id AS doc_id")
    media = attach_media_real(docs, id_col="doc_id")
    feats = {
        r["media_id"]: r["features"]
        for r in image_features(media, dim=4, decode_mode="real").collect()
    }
    assert len(feats) == 20
    for mid, f in feats.items():
        expect = ((mid % 256) + (7 * mid) % 256 + (13 * mid) % 256) / 3.0 / 255.0
        np.testing.assert_allclose(f, [expect] * 4, rtol=0, atol=1e-12)
    durs = {
        r["media_id"]: r["duration_s"]
        for r in audio_duration(media, decode_mode="real").collect()
    }
    assert len(durs) == 20
    for mid, d in durs.items():
        assert abs(d - (1000 + mid % 500) / (8000 + (mid % 4) * 2000)) < 1e-6


def test_bmp_rejects_palettized_and_bitfields():
    # build a minimal 8-bit BMP header — must be rejected, not decoded
    import struct

    hdr = struct.pack("<2sIHHI", b"BM", 54 + 4, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 4, 0, 0, 0, 0
    )
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_bmp(hdr + b"\x00\x00\x00\x00")
    hdr32bf = struct.pack("<2sIHHI", b"BM", 54 + 4, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 1, 1, 1, 32, 3, 4, 0, 0, 0, 0
    )
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_bmp(hdr32bf + b"\x00\x00\x00\x00")
