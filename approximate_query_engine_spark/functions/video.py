"""MJPEG-in-AVI video: the video modality made REAL with no external
codec. An AVI file is a RIFF container (the same chunk grammar as WAV);
with Motion-JPEG streams every frame is a standalone baseline JPEG, which
``functions/jpeg.py`` decodes in pure numpy. So frame extraction, frame
sampling, and per-frame decode all run from spec + stdlib here.

The scale shape matches the other media paths: blobs live in binary
columns and kernels run per-blob inside Arrow-batched ``mapInPandas``
(functions/multimodal.py). Frame *sampling* only decodes the sampled
frames — the chunk walk skips the rest — which is the property that
matters when a pipeline wants 1 frame/sec from hour-long clips.

Out of scope (clear NotImplementedError): non-MJPEG streams (H.264 etc.
need ffmpeg), audio streams inside AVI, OpenDML extensions.
"""

from __future__ import annotations

import struct

import numpy as np

from approximate_query_engine_spark.functions.jpeg import (
    _jpeg_pixels,
    encode_jpeg_pixels,
)

_U32 = struct.Struct("<I")


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + _U32.pack(len(body)) + body + pad


def _list(subtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", subtype + body)


def encode_mjpeg_avi(
    frames: "list[np.ndarray]", fps: int = 10
) -> bytes:
    """uint8 frame arrays ((h, w) gray or (h, w, 3) RGB, all same shape)
    → MJPEG AVI bytes. Each frame is a standalone baseline JPEG in a
    '00dc' chunk."""
    if not frames:
        raise ValueError("need at least one frame")
    shape = frames[0].shape
    h, w = shape[0], shape[1]
    payloads = []
    for f in frames:
        if f.shape != shape:
            raise ValueError("all frames must share one shape")
        payloads.append(encode_jpeg_pixels(f))
    n = len(payloads)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0, 0,
        n,  # dwTotalFrames
        0,
        1,  # dwStreams
        max(len(p) for p in payloads),
        w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"MJPG",
        0, 0, 0, 0,
        1, fps,  # dwScale, dwRate → fps = rate/scale
        0, n,
        max(len(p) for p in payloads),
        0xFFFFFFFF,  # dwQuality: default
        0,
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + _U32.pack(len(riff_body)) + riff_body


def make_gradient_frames(
    width: int, height: int, n_frames: int, seed: int = 0, channels: int = 3
) -> "list[np.ndarray]":
    """Deterministic smooth test clip: a gradient that shifts per frame."""
    rng = np.random.default_rng(seed)
    base = rng.integers(60, 180, size=channels)
    yy, xx = np.mgrid[0:height, 0:width]
    out = []
    for t in range(n_frames):
        px = np.stack(
            [
                np.clip(
                    base[c]
                    + 40.0 * np.sin(xx / 13.0 + t / 3.0 + c)
                    + 25.0 * np.cos(yy / 11.0 - t / 5.0),
                    0,
                    255,
                )
                for c in range(channels)
            ],
            axis=-1,
        ).astype(np.uint8)
        out.append(px if channels > 1 else px[:, :, 0])
    return out


class _AviInfo:
    __slots__ = ("width", "height", "us_per_frame", "n_frames", "offsets")

    def __init__(self):
        self.width = self.height = self.us_per_frame = self.n_frames = None
        #: byte ranges of the '00dc'/'00db' frame payloads, in order
        self.offsets: list[tuple[int, int]] = []


def _parse_avi(data: bytes) -> _AviInfo:
    """RIFF walk → header info + frame payload offsets. Offsets only —
    callers decode the frames they want, not the whole clip. Malformed /
    truncated input raises ValueError, never a bare struct error."""
    try:
        return _parse_avi_inner(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated or corrupt AVI: {exc}") from exc


def _parse_avi_inner(data: bytes) -> _AviInfo:
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    info = _AviInfo()

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = _U32.unpack_from(data, pos + 4)
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if fourcc == b"LIST":
                walk(body_start + 4, body_end)  # skip list subtype
            elif fourcc == b"avih":
                vals = struct.unpack_from("<14I", data, body_start)
                info.us_per_frame = vals[0]
                info.n_frames = vals[4]
                info.width, info.height = vals[8], vals[9]
            elif fourcc == b"strh":
                fcc_type = data[body_start : body_start + 4]
                handler = data[body_start + 4 : body_start + 8]
                if fcc_type == b"vids" and handler not in (b"MJPG", b"mjpg"):
                    raise NotImplementedError(
                        f"AVI video codec {handler!r} needs ffmpeg; only "
                        "MJPG decodes natively"
                    )
                if fcc_type == b"auds":
                    raise NotImplementedError(
                        "AVI audio streams not supported"
                    )
            elif fourcc in (b"00dc", b"00db"):
                info.offsets.append((body_start, body_end))
            pos = body_end + (size % 2)
    walk(12, len(data))
    if info.width is None or not info.offsets:
        raise ValueError("AVI missing avih header or frame chunks")
    return info


def decode_avi(data: bytes) -> tuple[int, int, int, int, float]:
    """→ (width, height, n_frames, duration_ms, first_frame_mean). The
    mean decodes ONLY the first frame — metadata plus one JPEG decode,
    not the whole clip."""
    info = _parse_avi(data)
    n = len(info.offsets)
    duration_ms = (n * (info.us_per_frame or 0)) // 1000
    s, e = info.offsets[0]
    _w, _h, _ch, px = _jpeg_pixels(data[s:e])
    return (info.width, info.height, n, duration_ms,
            float(px.mean()) if px.size else float("nan"))


def resize_avi(data: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor video resize: every frame decoded,
    index-sampled, and re-encoded (lossy per frame, like any MJPEG
    round trip). Frame count and timing are preserved."""
    info = _parse_avi(data)
    fps = max(1, round(1_000_000 / info.us_per_frame)) if info.us_per_frame else 1
    frames = []
    for s, e in info.offsets:
        _w, h, ch, px = _jpeg_pixels(data[s:e])
        yi = (np.arange(target_h) * px.shape[0]) // target_h
        xi = (np.arange(target_w) * px.shape[1]) // target_w
        out = np.ascontiguousarray(px[yi][:, xi])
        frames.append(out[:, :, 0] if ch == 1 else out)
    return encode_mjpeg_avi(frames, fps=fps)


def sample_avi_frames(
    data: bytes, every_ms: int
) -> "list[tuple[int, int, int, float]]":
    """Frame sampling with selective decode: → [(frame_index, ts_ms,
    n_pixels, frame_mean)] for one frame every ``every_ms``. Only the
    sampled '00dc' payloads are JPEG-decoded; the walk skips the rest."""
    info = _parse_avi(data)
    us = info.us_per_frame or 0
    if us <= 0:
        raise ValueError("AVI missing frame timing")
    out = []
    step_us = every_ms * 1000
    next_ts = 0
    for idx, (s, e) in enumerate(info.offsets):
        ts_us = idx * us
        if ts_us >= next_ts:
            _w, _h, _ch, px = _jpeg_pixels(data[s:e])
            out.append((idx, ts_us // 1000, int(px.size), float(px.mean())))
            next_ts += step_us
    return out
