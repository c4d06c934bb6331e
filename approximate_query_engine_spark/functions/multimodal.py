"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus typed metadata, processed by
Arrow-batched Pandas UDFs via ``mapInPandas`` — the Spark-idiomatic shape
for per-blob Python work (one Arrow batch per task, never per-row serde).

Decoding is REAL for every format implementable from spec + stdlib:
24-bpp BMP and PCM16 WAV are header-described raw arrays parsed with
struct+numpy (``decode_bmp``/``decode_wav``); PNG's entropy layer is
plain DEFLATE, which stdlib ``zlib`` inflates — ``decode_png`` walks the
chunks, inflates IDAT, and reverses the five scanline filters (8-bit
gray/RGB/RGBA, non-interlaced); and baseline JPEG is fully decoded in
pure numpy (``functions/jpeg.py``: marker walk, DQT/DHT from the file,
canonical Huffman entropy decode, dequantize, IDCT, YCbCr→RGB — 4:4:4
and grayscale, no progressive/arithmetic/restart). Formats whose codecs
are genuinely absent (MP3/H.264 need librosa/ffmpeg — NOT in this
container) stay stubbed: the kernel raises ``NotImplementedError`` unless ``fake=True``,
in which case a clearly-marked deterministic fake parses our own header
layout. The Spark-side plumbing — schemas, batch iteration,
partition sizing, UDF signatures — is identical across real/fake kernels;
swapping in a full codec changes only the kernel body.

Scale notes: blobs should live in Parquet binary columns (or object-store
pointers for >~1 MB blobs) with metadata columns alongside so Catalyst can
prune/filter WITHOUT touching bytes; ``spark.sql.files.maxPartitionBytes``
bounds the per-task Arrow batch footprint.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema for a media table: opaque bytes + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

_MAGIC = b"FAKEMEDIA"


def encode_fake_media(media_id: int, kind: str, w: int, h: int, payload_len: int = 64) -> bytes:
    """Deterministic fake blob: magic + header + seeded payload bytes.
    Exists so the plumbing is testable without real codecs."""
    rng = np.random.default_rng(media_id)
    payload = rng.integers(0, 256, size=payload_len, dtype=np.uint8).tobytes()
    return _MAGIC + struct.pack("<BII", {"image": 1, "audio": 2, "video": 3}[kind], w, h) + payload


def make_fake_media_df(spark, n: int = 100) -> DataFrame:
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = 64 + (i % 8) * 32, 48 + (i % 5) * 32
        rows.append(
            (i, kind, encode_fake_media(i, kind, w, h), "fake", w, h, 1000 * (i % 30))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def make_real_media_df(spark, n: int = 20) -> DataFrame:
    """Media table of REAL blobs (alternating BMP images and PCM16 WAVs) —
    exercises the non-fake decode path end to end."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
            rows.append((i, "image", encode_bmp(w, h, seed=i), "bmp", w, h, None))
        else:
            n_samp, rate = 1600 + 160 * (i % 5), 16_000
            rows.append(
                (
                    i,
                    "audio",
                    encode_wav_pcm16(n_samp, rate, seed=i),
                    "wav",
                    None,
                    None,
                    int(n_samp * 1000 / rate),
                )
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# real codecs: BMP + WAV need no external libraries — the container has no
# PIL/librosa/ffmpeg, but these two formats are header-described raw arrays,
# so the pure-python/numpy parsers below do REAL decoding. PNG decodes via
# stdlib zlib (below); baseline JPEG via functions/jpeg.py (pure numpy).
# Only codec-dependent formats (MP3/H.264) stay stubbed.


def encode_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal 24-bpp uncompressed (BI_RGB) bottom-up BMP with seeded
    pixels. Layout: BITMAPFILEHEADER (14B) + BITMAPINFOHEADER (40B) + rows
    padded to 4-byte multiples."""
    rng = np.random.default_rng(seed)
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    pixel_bytes = (row_bytes + pad) * height
    pixels = bytearray()
    for _ in range(height):
        pixels += rng.integers(0, 256, size=row_bytes, dtype=np.uint8).tobytes()
        pixels += b"\x00" * pad
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    return file_header + info_header + bytes(pixels)


def _bmp_pixel_rows(data: bytes) -> tuple[int, int, "np.ndarray", bool]:
    """→ (width, n_rows, pixel rows as (n_rows, width*3) uint8, top_down)
    for 24-bpp uncompressed BMP, padding stripped, rows in STORED order
    (bottom-up files store the bottom row first; top-down files — negative
    header height — store the top row first). Shared by decode and resize."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    header_size, width, height = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bpp BI_RGB supported (bpp={bpp})")
    n_rows = abs(height)
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * n_rows, offset=offset
    ).reshape(n_rows, stride)[:, :row_bytes]
    return (width, n_rows, rows, height < 0)


def decode_bmp(data: bytes) -> tuple[int, int, float]:
    """→ (width, height, pixel_mean) for 24-bpp uncompressed BMP. Handles
    bottom-up and top-down (negative height) rows and 4-byte row padding."""
    width, n_rows, rows, _top_down = _bmp_pixel_rows(data)
    return (width, n_rows, float(rows.mean()) if rows.size else float("nan"))


def encode_bmp_pixels(pixels: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 → minimal 24-bpp BI_RGB bottom-up BMP bytes (the
    same layout ``encode_bmp`` writes)."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    pixel_bytes = (row_bytes + pad) * h
    body = bytearray()
    flat = pixels.reshape(h, row_bytes)
    for r in range(h):
        body += flat[r].tobytes()
        body += b"\x00" * pad
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    return file_header + info_header + bytes(body)


def resize_bmp(data: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor resize of a 24-bpp BMP — pure numpy index
    sampling, no codec needed. The output is always encoded bottom-up
    (positive height), so a top-down input (negative header height, rows
    stored top-first) has its resized rows reversed before encoding — the
    rendered image is orientation-identical either way."""
    width, n_rows, rows, top_down = _bmp_pixel_rows(data)
    px = rows.reshape(n_rows, width, 3)
    yi = (np.arange(target_h) * n_rows) // target_h
    xi = (np.arange(target_w) * width) // target_w
    out = px[yi][:, xi]
    if top_down:
        out = out[::-1]
    return encode_bmp_pixels(np.ascontiguousarray(out))


def encode_wav_pcm16(
    n_samples: int, sample_rate: int = 16_000, channels: int = 1, seed: int = 0
) -> bytes:
    """Minimal PCM16 RIFF/WAVE blob with seeded samples."""
    rng = np.random.default_rng(seed)
    samples = rng.integers(
        -(2**15), 2**15, size=n_samples * channels, dtype=np.int16
    ).tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(samples))
        + samples
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, int, float]:
    """→ (channels, sample_rate, duration_ms, mean_abs_amplitude) for PCM16
    RIFF/WAVE. Chunk walking (fmt /data may be separated by other chunks,
    e.g. LIST) lives in :func:`_wav_pcm`, shared with resampling."""
    channels, sample_rate, pcm = _wav_pcm(data)
    frames = pcm.size // channels
    amp = (
        float(np.abs(pcm.astype(np.float64)).mean()) if pcm.size else float("nan")
    )
    return (channels, sample_rate, int(frames * 1000 / sample_rate), amp)


def _wav_pcm(data: bytes) -> tuple[int, int, "np.ndarray"]:
    """→ (channels, sample_rate, interleaved int16 samples) for PCM16
    RIFF/WAVE. Shared by decode and resample."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, channels, sample_rate, bits = 12, None, None, None
    pcm_body = None
    while pos + 8 <= len(data):
        cid, clen = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt_code, channels, sample_rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV supported")
        elif cid == b"data" and pcm_body is None:
            pcm_body = body
        pos += 8 + clen + (clen % 2)
    if channels is None or pcm_body is None:
        raise ValueError("WAV missing fmt /data chunk")
    # A malformed data chunk may end mid-sample or mid-frame (real encoders
    # pad, but the decode contract is clear errors, not opaque numpy
    # ValueErrors): truncate to whole interleaved frames.
    usable = (len(pcm_body) // (2 * channels)) * (2 * channels)
    return (channels, sample_rate, np.frombuffer(pcm_body[:usable], dtype="<i2"))


def encode_wav_pcm16_samples(
    samples: "np.ndarray", sample_rate: int, channels: int = 1
) -> bytes:
    """Interleaved int16 samples → minimal PCM16 RIFF/WAVE bytes (the same
    layout ``encode_wav_pcm16`` writes)."""
    raw = samples.astype("<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def resample_wav(data: bytes, target_rate: int) -> bytes:
    """REAL nearest-index resample of a PCM16 WAV to ``target_rate`` —
    pure numpy index sampling per channel, no codec needed. Duration is
    preserved (frame count scales by target/source rate)."""
    channels, rate, pcm = _wav_pcm(data)
    frames = pcm.size // channels
    out_frames = max(1, (frames * target_rate) // rate) if frames else 0
    if frames == 0:
        return encode_wav_pcm16_samples(pcm, target_rate, channels)
    fi = (np.arange(out_frames) * frames) // out_frames
    deinter = pcm.reshape(frames, channels)
    return encode_wav_pcm16_samples(
        np.ascontiguousarray(deinter[fi]).reshape(-1), target_rate, channels
    )


# ---------------------------------------------------------------------------
# PNG: its entropy layer is plain DEFLATE and stdlib zlib IS available, so
# PNG decoding is REAL here — chunk walk (IHDR/IDAT/IEND), zlib inflate,
# scanline unfiltering per the five standard filters (PNG spec §9: None,
# Sub, Up, Average, Paeth). Supported: 8-bit depth, gray/gray+alpha/RGB/
# RGBA color types, non-interlaced. Palette and interlaced PNGs raise
# NotImplementedError; baseline JPEG decodes via functions/jpeg.py;
# MP3/H.264 stay stubbed.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples per pixel


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png_pixels(pixels: "np.ndarray", filter_type: int = 0) -> bytes:
    """(h, w, channels) uint8 → PNG bytes (8-bit, non-interlaced).
    ``filter_type`` applies one standard scanline filter to every row —
    0 is the simplest valid encoding; 1-4 exist so tests can exercise
    every unfilter path of :func:`decode_png` against a known image."""
    import zlib

    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    px = pixels.astype(np.int32)
    stride = w * ch
    flat = px.reshape(h, stride)
    out = bytearray()
    prior = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        line = flat[r]
        left = np.zeros(stride, dtype=np.int32)
        left[ch:] = line[:-ch]
        up_left = np.zeros(stride, dtype=np.int32)
        up_left[ch:] = prior[:-ch]
        if filter_type == 0:
            filt = line
        elif filter_type == 1:
            filt = line - left
        elif filter_type == 2:
            filt = line - prior
        elif filter_type == 3:
            filt = line - ((left + prior) >> 1)
        elif filter_type == 4:
            pa = np.abs(prior - up_left)
            pb = np.abs(left - up_left)
            pc = np.abs(left + prior - 2 * up_left)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, up_left)
            )
            filt = line - pred
        else:
            raise ValueError(f"bad PNG filter type {filter_type}")
        out.append(filter_type)
        out += (filt & 0xFF).astype(np.uint8).tobytes()
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def encode_png(width: int, height: int, seed: int = 0, channels: int = 3) -> bytes:
    """Seeded-pixel PNG blob (filter 0), the PNG analog of encode_bmp."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)
    return encode_png_pixels(px)


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> "np.ndarray":
    """Reverse the per-scanline filters → (h, stride) uint8 reconstructed
    bytes. Filters 0/2 vectorize; 1/3/4 are inherently sequential within a
    row (each byte depends on the reconstructed byte bpp to its left), so
    they loop — acceptable: this runs per-blob inside an Arrow-batched
    mapInPandas kernel, not per Spark row."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    pos = 0
    for r in range(h):
        ftype = raw[pos]
        pos += 1
        recon = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int32
        )
        pos += stride
        if ftype == 0:
            pass
        elif ftype == 2:
            recon = (recon + prior) & 0xFF
        elif ftype == 1:
            for i in range(bpp, stride):
                recon[i] = (recon[i] + recon[i - bpp]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = recon[i - bpp] if i >= bpp else 0
                recon[i] = (recon[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = int(recon[i - bpp]) if i >= bpp else 0
                b = int(prior[i])
                c = int(prior[i - bpp]) if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[i] = (recon[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[r] = recon.astype(np.uint8)
        prior = recon
    return out


def _png_pixels(data: bytes) -> tuple[int, int, int, "np.ndarray"]:
    """→ (width, height, channels, (h, w, ch) uint8 pixels). Shared by
    decode and resize."""
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    width = height = color = None
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError("only 8-bit PNG supported")
            if color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG color type {color} (palette) not supported"
                )
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + crc
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    px = _png_unfilter(raw, height, stride, ch)
    return (width, height, ch, px.reshape(height, width, ch))


def decode_png(data: bytes) -> tuple[int, int, float]:
    """→ (width, height, pixel_mean) — REAL decode via stdlib zlib."""
    width, height, _ch, px = _png_pixels(data)
    return (width, height, float(px.mean()) if px.size else float("nan"))


def resize_png(data: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor PNG resize: decode → index-sample → re-encode
    (filter 0). Channel count is preserved."""
    width, height, _ch, px = _png_pixels(data)
    yi = (np.arange(target_h) * height) // target_h
    xi = (np.arange(target_w) * width) // target_w
    return encode_png_pixels(np.ascontiguousarray(px[yi][:, xi]))


def resample_audio(df: DataFrame, target_rate: int) -> DataFrame:
    """Resample every audio blob to ``target_rate`` via ``mapInPandas``
    (same production shape as :func:`decode_media`/:func:`resize_images`).
    REAL for PCM16 WAV; non-audio rows pass through untouched; compressed
    audio raises ``NotImplementedError`` (no codecs in this environment).
    Output: media_id, kind, content, sample_rate, duration_ms."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, rates, durs = [], [], []
            for kind, c in zip(pdf["kind"], pdf["content"]):
                if kind != "audio" or c is None:
                    contents.append(c)
                    rates.append(None)
                    durs.append(None)
                elif bytes(c[:4]) == b"RIFF":
                    out = resample_wav(bytes(c), target_rate)
                    contents.append(out)
                    rates.append(target_rate)
                    _ch, _r, dur, _a = decode_wav(out)
                    durs.append(dur)
                else:
                    raise NotImplementedError(
                        "resampling this format needs an external codec "
                        "(librosa/ffmpeg), not present in this environment; "
                        "PCM16 WAV resamples natively"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": contents,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                }
            )

    return df.mapInPandas(
        kernel,
        schema="media_id long, kind string, content binary, "
        "sample_rate int, duration_ms long",
    )


# ---------------------------------------------------------------------------
# decode kernel: real for BMP/WAV, fake-decoder for FAKEMEDIA blobs, stub
# (NotImplementedError) for codec-dependent formats


def _decode_blob(content: bytes, fake: bool) -> tuple[int, int, int, float]:
    """→ (kind_code, width, height, payload_mean).

    kind codes: 1=image, 2=audio, 3=video. For audio the (width, height)
    slots carry (sample_rate, duration_ms) — the schema keeps one shape per
    batch. Real decoding for BMP ('BM') and PCM16 WAV ('RIFF..WAVE');
    FAKEMEDIA blobs only under ``fake=True``; everything else raises."""
    if content is None:
        return (0, 0, 0, float("nan"))
    if content[:2] == b"BM":
        w, h, mean = decode_bmp(content)
        return (1, w, h, mean)
    if content[:8] == _PNG_MAGIC:
        w, h, mean = decode_png(content)
        return (1, w, h, mean)
    if content[:3] == b"\xff\xd8\xff":
        from approximate_query_engine_spark.functions.jpeg import decode_jpeg

        w, h, mean = decode_jpeg(content)
        return (1, w, h, mean)
    if content[:4] == b"GIF8":
        from approximate_query_engine_spark.functions.gif import decode_gif

        w, h, mean = decode_gif(content)
        return (1, w, h, mean)
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        _channels, rate, dur_ms, amp = decode_wav(content)
        return (2, rate, dur_ms, amp)
    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        from approximate_query_engine_spark.functions.video import decode_avi

        w, h, _n_frames, _dur_ms, mean = decode_avi(content)
        return (3, w, h, mean)
    if content[: len(_MAGIC)] == _MAGIC and fake:
        kind, w, h = struct.unpack_from("<BII", content, len(_MAGIC))
        payload = np.frombuffer(content[len(_MAGIC) + 9 :], dtype=np.uint8)
        return (kind, w, h, float(payload.mean()) if payload.size else float("nan"))
    raise NotImplementedError(
        "this format needs an external codec (PIL/librosa/ffmpeg), not present "
        "in this environment; BMP, PNG, baseline JPEG, and PCM16 WAV decode "
        "natively, or pass fake=True for the deterministic test decoder"
    )


DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, decoded_kind int, "
    "decoded_width int, decoded_height int, payload_mean double"
)


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode blobs via ``mapInPandas`` (Arrow batches per partition)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_blob(c, fake) for c in pdf["content"]]
            out = pdf[["media_id", "kind", "width", "height"]].copy()
            out["decoded_kind"] = [d[0] for d in decoded]
            out["decoded_width"] = [d[1] for d in decoded]
            out["decoded_height"] = [d[2] for d in decoded]
            out["payload_mean"] = [d[3] for d in decoded]
            yield out

    return df.mapInPandas(kernel, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, content binary, width int, height int"
)


def resize_images(
    df: DataFrame, target_w: int, target_h: int, fake: bool = False
) -> DataFrame:
    """Resize every image blob to (target_w, target_h) via ``mapInPandas``
    (Arrow batches, one kernel call per batch — the same production shape
    as :func:`decode_media`). REAL nearest-neighbor resampling for BMP,
    PNG, and baseline JPEG (JPEG re-encodes lossily, as any JPEG round
    trip does); non-image rows pass through with content untouched; other image
    formats raise ``NotImplementedError`` (their codecs are not in this
    environment) unless ``fake=True``, in which case FAKEMEDIA blobs get
    their header dims rewritten (payload kept) as the clearly-marked fake.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, widths, heights = [], [], []
            for kind, c in zip(pdf["kind"], pdf["content"]):
                if c is not None and kind == "video" and bytes(c[8:12]) == b"AVI ":
                    from approximate_query_engine_spark.functions.video import (
                        resize_avi,
                    )

                    contents.append(resize_avi(bytes(c), target_w, target_h))
                    widths.append(target_w)
                    heights.append(target_h)
                elif kind != "image" or c is None:
                    contents.append(c)
                    widths.append(None)
                    heights.append(None)
                elif bytes(c[:2]) == b"BM":
                    contents.append(resize_bmp(bytes(c), target_w, target_h))
                    widths.append(target_w)
                    heights.append(target_h)
                elif bytes(c[:8]) == _PNG_MAGIC:
                    contents.append(resize_png(bytes(c), target_w, target_h))
                    widths.append(target_w)
                    heights.append(target_h)
                elif bytes(c[:3]) == b"\xff\xd8\xff":
                    from approximate_query_engine_spark.functions.jpeg import (
                        resize_jpeg,
                    )

                    contents.append(resize_jpeg(bytes(c), target_w, target_h))
                    widths.append(target_w)
                    heights.append(target_h)
                elif bytes(c[:4]) == b"GIF8":
                    from approximate_query_engine_spark.functions.gif import (
                        resize_gif,
                    )

                    contents.append(resize_gif(bytes(c), target_w, target_h))
                    widths.append(target_w)
                    heights.append(target_h)
                elif bytes(c[: len(_MAGIC)]) == _MAGIC and fake:
                    kind_b, _w, _h = struct.unpack_from("<BII", bytes(c), len(_MAGIC))
                    head = bytes(c[: len(_MAGIC)]) + struct.pack(
                        "<BII", kind_b, target_w, target_h
                    )
                    contents.append(head + bytes(c[len(_MAGIC) + 9 :]))
                    widths.append(target_w)
                    heights.append(target_h)
                else:
                    raise NotImplementedError(
                        "resizing this format needs an external codec "
                        "(PIL/ffmpeg), not present in this environment; "
                        "BMP, PNG, and baseline JPEG resize natively, "
                        "or pass fake=True"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": contents,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                }
            )

    return df.mapInPandas(kernel, schema=RESIZED_SCHEMA)


FEATURES_SCHEMA = "media_id long, feature array<float>"


def _decode_gray(content: bytes) -> "np.ndarray":
    """Any decodable image/video blob → (h, w) float grayscale in [0, 255]
    (video: first frame). Shared by the real feature extractor."""
    if content[:2] == b"BM":
        _w, _h, px, top_down = _bmp_pixel_rows(content)
        rows = px.reshape(px.shape[0], -1, 3).astype(np.float64)
        gray = rows.mean(axis=2)
        # stored order is bottom-up unless the header says top-down;
        # features must see the LOGICAL orientation so the same picture
        # yields the same vector regardless of container
        return gray if top_down else gray[::-1]
    if content[:8] == _PNG_MAGIC:
        _w, _h, _ch, px = _png_pixels(content)
        return px.astype(np.float64).mean(axis=2)
    if content[:3] == b"\xff\xd8\xff":
        from approximate_query_engine_spark.functions.jpeg import _jpeg_pixels

        _w, _h, _ch, px = _jpeg_pixels(content)
        return px.astype(np.float64).mean(axis=2)
    if content[:4] == b"GIF8":
        from approximate_query_engine_spark.functions.gif import _gif_pixels

        _w, _h, px = _gif_pixels(content)
        return px.astype(np.float64).mean(axis=2)
    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        from approximate_query_engine_spark.functions.video import _parse_avi
        from approximate_query_engine_spark.functions.jpeg import _jpeg_pixels

        info = _parse_avi(content)
        s, e = info.offsets[0]
        _w, _h, _ch, px = _jpeg_pixels(content[s:e])
        return px.astype(np.float64).mean(axis=2)
    raise NotImplementedError("no native decoder for this format")


def _pooled_feature(content: bytes, dim: int) -> list[float]:
    """REAL model-free perceptual descriptor, per modality:

    - image/video: average-pool the grayscale image onto a fixed
      ``2 × dim/2`` grid and scale to [0, 1] — the classic aHash-family
      thumbnail feature; near-duplicate images land near each other in
      cosine space, which is exactly what the ANN / embedding-dedup
      operators consume downstream.
    - audio: REAL spectral descriptor — mean magnitude of the rfft over
      ``dim`` equal-width frequency bands (numpy FFT, no DSP library),
      normalized by the int16 range. Pitch-shifted content separates in
      this space where a plain loudness envelope cannot.
    """
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        _channels, _rate, pcm = _wav_pcm(content)
        x = pcm.astype(np.float64)
        if x.size == 0:
            return [0.0] * dim
        mag = np.abs(np.fft.rfft(x / 32768.0)) / max(x.size, 1)
        bounds = (np.arange(dim + 1) * mag.size) // dim
        return [
            float(mag[bounds[i]:bounds[i + 1]].mean())
            if bounds[i + 1] > bounds[i] else 0.0
            for i in range(dim)
        ]
    gray = _decode_gray(content)
    rows = 2 if dim % 2 == 0 and dim >= 2 else 1
    cols = dim // rows
    h, w = gray.shape
    yb = (np.arange(rows + 1) * h) // rows
    xb = (np.arange(cols + 1) * w) // cols
    out = []
    for r in range(rows):
        for c in range(cols):
            cell = gray[yb[r]:max(yb[r + 1], yb[r] + 1),
                        xb[c]:max(xb[c + 1], xb[c] + 1)]
            out.append(float(cell.mean()) / 255.0)
    return out


def extract_features(df: DataFrame, dim: int = 8, fake: bool = False) -> DataFrame:
    """Feature extraction: blob → fixed-dim float vector, REAL for every
    natively-decodable format (see :func:`_pooled_feature` — pooled
    grayscale intensities for image/video, FFT band energies for audio;
    a learned model swaps into the same batched mapInPandas shape).
    ``fake=True`` keeps the original seeded-noise kernel for plumbing
    tests of undecodable blobs. NULL content yields a NULL feature (the
    same tolerance every sibling kernel extends)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    feats.append(None)
                elif fake:
                    rng = np.random.default_rng(int(mid))
                    feats.append(
                        rng.standard_normal(dim).astype(np.float32).tolist()
                    )
                else:
                    feats.append(_pooled_feature(bytes(c), dim))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(kernel, schema=FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp,
    metadata-only (no blob read — check ReadSchema). Pure built-ins:
    explode a generated timestamp sequence. For the decoding variant over
    MJPEG-AVI blobs see :func:`sample_video_frames`."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_index int, frame_ts_ms long, frame_mean double"
)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling over MJPEG-AVI blobs via ``mapInPandas``: one
    output row per sampled frame with its decoded pixel mean. Only the
    sampled frames are JPEG-decoded — the RIFF walk skips the rest — so
    cost scales with frames *kept*, not clip length. Non-video rows are
    filtered out plan-side before the kernel sees them."""
    from approximate_query_engine_spark.functions.video import (
        sample_avi_frames,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, means = [], [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c is None:
                    continue
                for idx, ts_ms, _npx, mean in sample_avi_frames(
                    bytes(c), every_ms
                ):
                    ids.append(mid)
                    idxs.append(idx)
                    tss.append(ts_ms)
                    means.append(mean)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_mean": pd.Series(means, dtype="float64"),
                }
            )

    return df.filter(F.col("kind") == "video").select(
        "media_id", "content"
    ).mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)


def media_stats(df: DataFrame, include_bytes: bool = False) -> DataFrame:
    """Per-kind metadata aggregation. Default is metadata-only — the binary
    column is pruned out of the parquet scan (check ReadSchema in .explain);
    ``include_bytes`` adds total blob size at the cost of reading bytes."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
    ]
    if include_bytes:
        aggs.append(F.sum(F.length("content")).alias("total_bytes"))
    return df.groupBy("kind").agg(*aggs)
