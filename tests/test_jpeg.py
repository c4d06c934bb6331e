"""Baseline JPEG codec (functions/jpeg.py): pure numpy + stdlib, no
external codec. Self-consistency (decode∘encode bounded by quantization
error), structural spec conformance (markers, stuffing, tables read from
the file's own DHT/DQT), and integration with the mapInPandas media
kernels."""

import numpy as np
import pytest

from approximate_query_engine_spark.functions import multimodal
from approximate_query_engine_spark.functions.jpeg import (
    _jpeg_pixels,
    _ZZ,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_pixels,
    resize_jpeg,
)


def test_zigzag_is_the_standard_order():
    # spot-pin the generated scan order against the published T.81 table
    assert list(_ZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(_ZZ[-6:]) == [61, 54, 47, 55, 62, 63]
    assert sorted(_ZZ) == list(range(64))


def test_constant_fill_roundtrip_exact():
    """Constant blocks quantize to a pure DC coefficient; with an even
    offset from 128 the DC survives the /16 quantizer exactly, so the
    decoded mean equals the fill value bit-for-bit."""
    for v in (60, 128, 200):
        px = np.full((24, 17), v, dtype=np.uint8)
        w, h, mean = decode_jpeg(encode_jpeg_pixels(px))
        assert (w, h) == (17, 24)
        assert mean == float(v)


def test_smooth_gradient_roundtrip_bounded():
    data = encode_jpeg(37, 21, seed=3)
    w, h, ch, out = _jpeg_pixels(data)
    assert (w, h, ch) == (37, 21, 3)
    yy, xx = np.mgrid[0:21, 0:37]
    rng = np.random.default_rng(3)
    base = rng.integers(40, 200, size=3)
    ref = np.stack(
        [
            np.clip(base[c] + 40.0 * np.sin(xx / 17.0 + c)
                    + 30.0 * np.cos(yy / 23.0), 0, 255)
            for c in range(3)
        ],
        axis=-1,
    ).astype(np.uint8)
    err = np.abs(out.astype(int) - ref.astype(int))
    assert err.max() <= 12  # standard quant tables on smooth content
    assert err.mean() < 3


def test_grayscale_and_rgb_dims_non_multiple_of_8():
    for shape in ((9, 11), (8, 8), (25, 33, 3), (7, 40, 3)):
        px = np.random.default_rng(1).integers(0, 256, shape, dtype=np.uint8)
        w, h, ch, out = _jpeg_pixels(encode_jpeg_pixels(px))
        exp_ch = 1 if len(shape) == 2 else shape[2]
        assert (h, w) == shape[:2]
        assert ch == exp_ch
        assert out.shape == (shape[0], shape[1], exp_ch)


def test_byte_stuffing_mechanism():
    """0xFF bytes in the entropy stream must be stuffed with 0x00 on
    write and transparently unstuffed on read (T.81 B.1.1.5) — tested
    directly at the bit layer so coverage doesn't depend on whether a
    particular image's Huffman stream happens to emit 0xFF."""
    from approximate_query_engine_spark.functions.jpeg import (
        _BitReader,
        _BitWriter,
    )

    w = _BitWriter()
    for val, length in ((0xFF, 8), (0x3, 2), (0xFF, 8), (0x0, 6)):
        w.write(val, length)
    data = w.flush()
    assert data.count(b"\xff\x00") >= 1  # stuffing happened
    r = _BitReader(data)
    assert r.bits(8) == 0xFF
    assert r.bits(2) == 0x3
    assert r.bits(8) == 0xFF
    assert r.bits(6) == 0x0
    # an unstuffed marker byte inside the scan must be rejected
    bad = _BitReader(b"\xff\xd9")
    with pytest.raises(ValueError, match="marker"):
        bad.bits(8)


def test_resize_jpeg():
    data = encode_jpeg(32, 16, seed=5)
    out = resize_jpeg(data, 10, 6)
    w, h, mean = decode_jpeg(out)
    assert (w, h) == (10, 6)
    # the resample keeps the brightness neighborhood of the source
    _, _, src_mean = decode_jpeg(data)
    assert abs(mean - src_mean) < 25


def test_malformed_inputs_raise_clearly():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01\x02")
    data = bytearray(encode_jpeg(16, 16, seed=0))
    # flip SOF0 marker to SOF2 (progressive): must refuse, not garble
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(data))
    # truncated entropy stream
    whole = encode_jpeg(16, 16, seed=0)
    with pytest.raises(ValueError):
        decode_jpeg(whole[: len(whole) // 2])


def test_decode_media_kernel_handles_jpeg(spark):
    rows = [
        (0, "image", encode_jpeg_pixels(np.full((12, 20), 90, np.uint8)),
         "jpg", 20, 12, None),
        (1, "image", encode_jpeg(24, 16, seed=2), "jpg", 24, 16, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in multimodal.decode_media(df).collect()}
    assert (got[0]["decoded_width"], got[0]["decoded_height"]) == (20, 12)
    assert got[0]["payload_mean"] == 90.0
    assert (got[1]["decoded_width"], got[1]["decoded_height"]) == (24, 16)


def test_resize_images_kernel_handles_jpeg(spark):
    rows = [
        (0, "image", encode_jpeg(32, 24, seed=1), "jpg", 32, 24, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(df, 8, 6).collect()[0]
    assert (out["width"], out["height"]) == (8, 6)
    w, h, _ = decode_jpeg(bytes(out["content"]))
    assert (w, h) == (8, 6)


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes; padded real-world files must still parse."""
    data = encode_jpeg(16, 12, seed=4)
    # inject fill bytes before the SOF0 marker
    idx = data.find(b"\xff\xc0")
    padded = data[:idx] + b"\xff\xff\xff" + data[idx:]
    assert decode_jpeg(padded) == decode_jpeg(data)
