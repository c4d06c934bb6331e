"""GIF87a/89a in pure python + numpy — the web-scrape-common palette
format joins BMP/PNG/JPEG/WAV/AVI in the real-decode set.

The decoder is fully general for non-interlaced GIFs: logical screen
descriptor, global/local color tables, extension-block skipping, and a
complete variable-width LZW decompressor (dictionary growth to 12 bits,
CLEAR/END handling, LSB-first code packing per the spec). The encoder
runs REAL LZW compression (greedy longest-match dictionary, width
growth 9→12 bits, CLEAR on dictionary overflow), so round trips
exercise the decoder's growth path with genuinely compressed streams.

GIF is lossless, so unlike JPEG no quantizer argument is needed for
value-exact oracles: decoded pixels equal encoded pixels always.

Out of scope (clear NotImplementedError): interlaced images; animation
frames beyond the first are ignored by ``decode_gif`` (the first image
descriptor wins, as most thumbnailers do).
"""

from __future__ import annotations

import struct

import numpy as np


def _gray_palette() -> bytes:
    return bytes(v for i in range(256) for v in (i, i, i))


def encode_gif_pixels(pixels: "np.ndarray") -> bytes:
    """(h, w) uint8 grayscale → GIF89a bytes with a 256-entry gray
    palette (pixel value == palette index == gray level)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 2:
        raise ValueError("encode_gif_pixels expects a 2-D grayscale array")
    h, w = px.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # global table, 256 entries
    out += _gray_palette()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    mcs = 8  # min LZW code size for 256-entry palette
    out.append(mcs)
    clear, end = 1 << mcs, (1 << mcs) + 1

    acc = 0
    nbits = 0
    width = mcs + 1
    data = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first packing
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    # real LZW: greedy longest-match over a growing dictionary. The
    # decoder adds its mirror entry one step behind the encoder, so the
    # width-change points line up exactly when checked AFTER appending.
    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    next_code = end + 1
    emit(clear)
    run = b""
    for v in px.reshape(-1).tobytes():
        cand = run + bytes([v])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < (1 << 12):
            table[cand] = next_code
            next_code += 1
            # the decoder's table is one entry BEHIND the encoder's (it
            # creates the mirror entry only on the following code), so
            # widen one code later than the local table would suggest:
            # when the decoder's size (next_code - 1) fills the width
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code = end + 1
            width = mcs + 1
        run = bytes([v])
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> "np.ndarray":
    """Full variable-width GIF LZW decode → uint8 palette indices."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream exhausted")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _gif_pixels(data: bytes) -> tuple[int, int, "np.ndarray"]:
    """→ (width, height, (h, w, 3) uint8 RGB) for the first image."""
    try:
        return _gif_pixels_inner(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated or corrupt GIF: {exc}") from exc


def _gif_pixels_inner(data: bytes) -> tuple[int, int, "np.ndarray"]:
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(
            data, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += data[pos] + 1
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02X}")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        pal = palette
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without a color table")
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = _lzw_decode(bytes(lzw), mcs, w * h)
        if idx.max(initial=0) >= pal.shape[0]:
            raise ValueError("GIF pixel index outside color table")
        return (w, h, pal[idx].reshape(h, w, 3))
    raise ValueError("GIF missing image descriptor")


def decode_gif(data: bytes) -> tuple[int, int, float]:
    """→ (width, height, pixel_mean) — REAL lossless decode."""
    w, h, px = _gif_pixels(data)
    return (w, h, float(px.mean()) if px.size else float("nan"))


def resize_gif(data: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor GIF resize (re-encoded with the gray
    palette: channel-mean of the palette-mapped RGB, lossless for
    gray-palette inputs)."""
    w, h, px = _gif_pixels(data)
    yi = (np.arange(target_h) * h) // target_h
    xi = (np.arange(target_w) * w) // target_w
    small = px[yi][:, xi]
    gray = np.round(small.astype(np.float64).mean(axis=2)).astype(np.uint8)
    return encode_gif_pixels(gray)
