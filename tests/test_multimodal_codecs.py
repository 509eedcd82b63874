"""Golden-byte tests for the pure-numpy media codecs (round 3 — the decode
step is real, not a stub): hand-written byte strings decode to known
arrays, encode→decode round-trips exactly, and the Spark feature pipeline
exposes actual pixel/sample statistics."""

from __future__ import annotations

import numpy as np

from pyofs_spark.operators.multimodal import (
    decode_media,
    decode_ppm,
    decode_wav,
    decode_y4m,
    encode_ppm,
    encode_wav,
    encode_y4m,
)


def test_ppm_golden_bytes():
    payload = b"P6\n2 2\n255\n" + bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]
    )
    px = decode_ppm(payload)
    expect = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(px, expect)


def test_ppm_header_comments_and_whitespace():
    payload = b"P6\n# a comment\n3 1\n# another\n255\n" + bytes(range(9))
    px = decode_ppm(payload)
    assert px.shape == (1, 3, 3)
    np.testing.assert_array_equal(px.ravel(), np.arange(9, dtype=np.uint8))


def test_ppm_roundtrip():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(px)), px)


def test_wav_golden_bytes():
    # hand-built RIFF: mono PCM16 @ 4 Hz, samples [0, 1000, -1000, 32767]
    samples = np.array([0, 1000, -1000, 32767], dtype=np.int16)
    data = samples.tobytes()
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (4).to_bytes(4, "little") + (8).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    payload = b"RIFF" + len(body).to_bytes(4, "little") + body
    out, rate = decode_wav(payload)
    assert rate == 4 and out.shape == (4, 1)
    np.testing.assert_array_equal(out[:, 0], samples)


def test_wav_roundtrip_stereo():
    rng = np.random.default_rng(4)
    samples = rng.integers(-32768, 32767, size=(100, 2)).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(out, samples)


def test_y4m_roundtrip():
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(3, 4, 6, 3), dtype=np.uint8)
    out = decode_y4m(encode_y4m(frames, fps=30))
    np.testing.assert_array_equal(out, frames)


def test_decode_media_real_statistics():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    px[0, 0] = [100, 100, 100]
    f = decode_media(encode_ppm(px), "image")
    assert f[0] == 1.0 and f[1] == 2.0 and f[2] == 2.0 and f[3] == 3.0
    np.testing.assert_allclose(f[4], 25.0)  # mean of 300/12
    np.testing.assert_allclose(f[8], 25.0)  # meanR

    samples = np.array([3, -3, 3, -3], dtype=np.int16)
    f = decode_media(encode_wav(samples, 8000), "audio")
    assert f[0] == 2.0 and f[1] == 4.0 and f[2] == 1.0 and f[3] == 8000.0
    np.testing.assert_allclose(f[4], 0.0)  # mean
    np.testing.assert_allclose(f[6], 3.0)  # rms


def test_feature_pipeline_on_spark(spark):
    from pyofs_spark.operators.multimodal import extract_features, synth_media

    media = synth_media(spark, 60, 4)
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert len(feats) == 60
    # cross-check one image row against a direct local decode
    m = media.filter("media_id = 6").collect()[0]  # 6 % 3 == 0 -> image
    local = decode_media(bytes(m.payload), "image")
    np.testing.assert_allclose(np.array(feats[6].feature), local, rtol=0)
    px = decode_ppm(bytes(m.payload))
    np.testing.assert_allclose(feats[6].feature[4], px.mean(), rtol=1e-6)
    # metadata columns describe the real payload
    assert (m.width, m.height) == (px.shape[1], px.shape[0])
