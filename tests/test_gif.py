"""GIF codec (functions/gif.py): real LZW compression/decompression in
pure python. Lossless round trips (including streams that grow the code
width to 12 bits and CLEAR-reset), spec-conformance details, and media
kernel integration."""

import numpy as np
import pytest

from approximate_query_engine_spark.functions import multimodal
from approximate_query_engine_spark.functions.gif import (
    _gif_pixels,
    decode_gif,
    encode_gif_pixels,
    resize_gif,
)


def test_lossless_roundtrip_random():
    rng = np.random.default_rng(1)
    for shape in ((16, 24), (7, 31), (1, 1), (130, 5)):
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        w, h, out = _gif_pixels(encode_gif_pixels(px))
        assert (h, w) == shape
        assert (out == px[:, :, None]).all()


def test_lossless_with_width_growth_and_clear_reset():
    """A large compressible image drives the LZW dictionary through all
    widths 9→12 and past 4096 entries (CLEAR reset) — decode must stay
    bit-perfect through every transition."""
    px = (
        np.add.outer(np.arange(400), np.arange(500)) % 256
    ).astype(np.uint8)
    data = encode_gif_pixels(px)
    assert len(data) < px.size // 2  # genuinely compressed
    _w, _h, out = _gif_pixels(data)
    assert (out == px[:, :, None]).all()


def test_decode_mean_exact_any_value():
    # lossless: no quantizer constraint — odd fills are exact too
    w, h, mean = decode_gif(encode_gif_pixels(np.full((9, 13), 77, np.uint8)))
    assert (w, h, mean) == (13, 9, 77.0)


def test_resize_gif():
    data = encode_gif_pixels(np.full((20, 20), 201, np.uint8))
    assert decode_gif(resize_gif(data, 5, 4)) == (5, 4, 201.0)


def test_malformed_and_unsupported():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE")
    data = bytearray(encode_gif_pixels(np.full((8, 8), 1, np.uint8)))
    # the image descriptor sits right after header(13) + palette(768);
    # set its interlace flag
    idx = 13 + 3 * 256
    assert data[idx] == 0x2C
    data[idx + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(data))
    whole = encode_gif_pixels(np.full((32, 32), 5, np.uint8))
    with pytest.raises(ValueError):
        decode_gif(whole[: len(whole) // 2])


def test_extension_blocks_skipped():
    """A Graphic Control Extension before the image descriptor (what
    GIF89a writers emit) must be skipped, not tripped over."""
    data = encode_gif_pixels(np.full((6, 6), 42, np.uint8))
    head, tail = data[:13], data[13:]
    palette, rest = tail[: 3 * 256], tail[3 * 256 :]
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    assert decode_gif(head + palette + gce + rest) == (6, 6, 42.0)


def test_decode_media_kernel_handles_gif(spark):
    rows = [
        (0, "image", encode_gif_pixels(np.full((10, 14), 33, np.uint8)),
         "gif", 14, 10, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.decode_media(df).collect()[0]
    assert (got["decoded_width"], got["decoded_height"]) == (14, 10)
    assert got["payload_mean"] == 33.0


def test_features_and_resize_kernel_handle_gif(spark):
    from approximate_query_engine_spark.functions.multimodal import (
        _pooled_feature,
        extract_features,
    )

    img = np.full((16, 32), 180, np.uint8)
    img[:, :16] = 20
    blob = encode_gif_pixels(img)
    f = _pooled_feature(blob, 8)
    assert f[0] == pytest.approx(20 / 255.0)
    assert f[3] == pytest.approx(180 / 255.0)
    rows = [(0, "image", blob, "gif", 32, 16, None)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(df, 8, 4).collect()[0]
    w, h, _mean = decode_gif(bytes(out["content"]))
    assert (w, h) == (8, 4)
    feats = extract_features(df, dim=8).collect()[0]["feature"]
    assert len(feats) == 8
