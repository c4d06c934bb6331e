"""MJPEG-AVI video (functions/video.py): RIFF container + per-frame
baseline JPEG — the video modality with no external codec. Covers the
codec round trip, selective-decode frame sampling, refusal of non-MJPEG
streams, and the mapInPandas kernel integration."""

import numpy as np
import pytest

from approximate_query_engine_spark.functions import multimodal
from approximate_query_engine_spark.functions.video import (
    decode_avi,
    encode_mjpeg_avi,
    make_gradient_frames,
    sample_avi_frames,
)


def test_roundtrip_metadata():
    frames = make_gradient_frames(32, 24, 12, seed=1)
    avi = encode_mjpeg_avi(frames, fps=10)
    w, h, n, dur_ms, mean = decode_avi(avi)
    assert (w, h, n, dur_ms) == (32, 24, 12, 1200)
    assert 0 <= mean <= 255


def test_constant_fill_first_frame_exact():
    frames = [np.full((16, 20), 60 + 2 * t, dtype=np.uint8) for t in range(5)]
    avi = encode_mjpeg_avi(frames, fps=5)
    w, h, n, dur_ms, mean = decode_avi(avi)
    assert (w, h, n, dur_ms) == (20, 16, 5, 1000)
    assert mean == 60.0  # even offset from 128: quantizer-exact


def test_sampling_decodes_only_sampled_frames():
    frames = [np.full((8, 8), 100 + 2 * t, dtype=np.uint8) for t in range(10)]
    avi = encode_mjpeg_avi(frames, fps=10)  # 100 ms/frame
    out = sample_avi_frames(avi, every_ms=300)
    assert [(i, ts) for i, ts, _, _ in out] == [(0, 0), (3, 300), (6, 600), (9, 900)]
    assert [m for _, _, _, m in out] == [100.0, 106.0, 112.0, 118.0]


def test_rgb_frames():
    frames = make_gradient_frames(24, 16, 4, seed=2, channels=3)
    avi = encode_mjpeg_avi(frames, fps=4)
    w, h, n, dur_ms, _ = decode_avi(avi)
    assert (w, h, n, dur_ms) == (24, 16, 4, 1000)


def test_non_mjpeg_stream_refused():
    frames = [np.full((8, 8), 128, dtype=np.uint8)]
    avi = bytearray(encode_mjpeg_avi(frames, fps=1))
    idx = bytes(avi).find(b"MJPG")  # first occurrence: strh handler
    avi[idx : idx + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        decode_avi(bytes(avi))


def test_malformed_avi_raises():
    with pytest.raises(ValueError, match="not an AVI"):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    frames = [np.full((8, 8), 128, dtype=np.uint8)]
    whole = encode_mjpeg_avi(frames, fps=1)
    with pytest.raises(ValueError):
        decode_avi(whole[:40])  # header cut before avih/frames


def test_decode_media_kernel_handles_avi(spark):
    frames = [np.full((12, 20), 90, dtype=np.uint8) for _ in range(3)]
    rows = [
        (0, "video", encode_mjpeg_avi(frames, fps=3), "avi", 20, 12, 1000),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.decode_media(df).collect()[0]
    assert got["decoded_kind"] == 3
    assert (got["decoded_width"], got["decoded_height"]) == (20, 12)
    assert got["payload_mean"] == 90.0


def test_sample_video_frames_kernel(spark):
    frames = [np.full((8, 8), 100 + 2 * t, dtype=np.uint8) for t in range(6)]
    rows = [
        (7, "video", encode_mjpeg_avi(frames, fps=10), "avi", 8, 8, 600),
        (8, "image", multimodal.encode_bmp(8, 8, seed=1), "bmp", 8, 8, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.sample_video_frames(df, every_ms=200).collect()
    assert {r["media_id"] for r in got} == {7}  # image row filtered out
    by_idx = {r["frame_index"]: r for r in got}
    assert sorted(by_idx) == [0, 2, 4]
    assert by_idx[2]["frame_ts_ms"] == 200
    assert by_idx[4]["frame_mean"] == 108.0


def test_extract_features_real_images(spark):
    """REAL pooled-intensity features: the same picture in different
    containers (BMP vs PNG vs JPEG) must land at nearly the same vector,
    and a different picture must not."""
    from approximate_query_engine_spark.functions.multimodal import (
        _pooled_feature,
        encode_bmp_pixels,
        encode_png_pixels,
    )
    from approximate_query_engine_spark.functions.jpeg import (
        encode_jpeg_pixels,
    )

    yy, xx = np.mgrid[0:24, 0:32]
    img = np.clip(80 + 60 * np.sin(xx / 9.0) + 40 * np.cos(yy / 7.0), 0, 255)
    px = np.stack([img, img, img], axis=-1).astype(np.uint8)
    other = 255 - px

    # encode_bmp_pixels takes rows in STORED (bottom-up) order, BGR
    f_bmp = np.array(_pooled_feature(encode_bmp_pixels(px[::-1, :, ::-1]), 8))
    f_png = np.array(_pooled_feature(encode_png_pixels(px), 8))
    f_jpg = np.array(_pooled_feature(encode_jpeg_pixels(px), 8))
    f_other = np.array(_pooled_feature(encode_png_pixels(other), 8))
    assert np.abs(f_bmp - f_png).max() < 0.01
    assert np.abs(f_jpg - f_png).max() < 0.03  # lossy but close
    assert np.abs(f_other - f_png).max() > 0.2  # different image differs


def test_extract_features_kernel_all_modalities(spark):
    from approximate_query_engine_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        encode_wav_pcm16,
        extract_features,
    )

    frames = [np.full((12, 16), 90, dtype=np.uint8) for _ in range(2)]
    rows = [
        (0, "image", multimodal.encode_bmp(16, 12, seed=1), "bmp", 16, 12, None),
        (1, "audio", encode_wav_pcm16(1600, 16000, seed=2), "wav", None, None, 100),
        (2, "video", encode_mjpeg_avi(frames, fps=2), "avi", 16, 12, 1000),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["feature"] for r in extract_features(df, dim=8).collect()}
    assert set(got) == {0, 1, 2}
    for v in got.values():
        assert len(v) == 8
    # constant-fill video: every pooled cell is 90/255 (float32 schema)
    assert all(abs(x - 90.0 / 255.0) < 1e-6 for x in got[2])
    # audio RMS envelope is bounded
    assert all(0.0 <= x <= 1.0 for x in got[1])


def test_audio_spectral_features_separate_pitches():
    """A 440 Hz tone and a 3500 Hz tone at the same loudness must land in
    different FFT bands — the property an RMS envelope cannot see."""
    import numpy as np

    from approximate_query_engine_spark.functions.multimodal import (
        _pooled_feature,
        encode_wav_pcm16_samples,
    )

    rate, n = 16000, 8000
    t = np.arange(n) / rate
    low = encode_wav_pcm16_samples(
        (10000 * np.sin(2 * np.pi * 440 * t)).astype("<i2"), rate
    )
    high = encode_wav_pcm16_samples(
        (10000 * np.sin(2 * np.pi * 3500 * t)).astype("<i2"), rate
    )
    f_low = np.array(_pooled_feature(low, 8))
    f_high = np.array(_pooled_feature(high, 8))
    # band width = nyquist/8 = 1 kHz: 440 Hz → band 0, 3500 Hz → band 3
    assert int(f_low.argmax()) == 0
    assert int(f_high.argmax()) == 3
    # same loudness, different shape: vectors far apart in cosine
    cos = float(f_low @ f_high / (np.linalg.norm(f_low) * np.linalg.norm(f_high)))
    assert cos < 0.5


def test_resize_avi_all_frames():
    from approximate_query_engine_spark.functions.video import resize_avi

    frames = [np.full((16, 24), 60 + 2 * t, dtype=np.uint8) for t in range(4)]
    small = resize_avi(encode_mjpeg_avi(frames, fps=4), 6, 4)
    w, h, n, dur_ms, mean = decode_avi(small)
    assert (w, h, n, dur_ms) == (6, 4, 4, 1000)
    assert mean == 60.0  # constant frames stay quantizer-exact
    samples = sample_avi_frames(small, every_ms=250)
    assert [m for _, _, _, m in samples] == [60.0, 62.0, 64.0, 66.0]


def test_resize_images_kernel_resizes_video(spark):
    frames = [np.full((16, 24), 90, dtype=np.uint8) for _ in range(2)]
    rows = [(0, "video", encode_mjpeg_avi(frames, fps=2), "avi", 24, 16, 1000)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(df, 8, 6).collect()[0]
    w, h, n, _dur, mean = decode_avi(bytes(out["content"]))
    assert (w, h, n, mean) == (8, 6, 2, 90.0)


def test_extract_features_null_content(spark):
    from approximate_query_engine_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    rows = [
        (0, "image", multimodal.encode_bmp(8, 8, seed=1), "bmp", 8, 8, None),
        (1, "image", None, "bmp", None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["feature"] for r in extract_features(df, dim=8).collect()}
    assert got[1] is None and len(got[0]) == 8
