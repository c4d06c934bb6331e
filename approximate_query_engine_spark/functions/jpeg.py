"""Baseline JPEG (ITU-T T.81 sequential DCT) in pure numpy + stdlib.

The reference treats media blobs as opaque binaries (SURVEY §multimodal);
this repo decodes the entropy-codable formats natively. JPEG joins BMP /
PNG / PCM16-WAV: the full baseline pipeline — marker parse, DQT/DHT/SOF0/
SOS, canonical Huffman entropy decode with byte unstuffing, DC prediction,
dequantize, inverse zigzag, orthonormal 8×8 IDCT, YCbCr→RGB — implemented
from the public spec with no external codec.

Scope (documented, checked, raising NotImplementedError outside it):
- baseline sequential DCT (SOF0), 8-bit samples
- grayscale (1 component) and YCbCr 4:4:4 (3 components, no subsampling)
- no progressive (SOF2), no arithmetic coding, no restart intervals

Design note: the DECODER builds its Huffman tables from the file's own
DHT segments (canonical code construction per T.81 §C.2), so decoding is
fully general for in-scope files; the ENCODER emits simple valid
canonical tables (every AC symbol 8 bits, every DC symbol 4 bits — Kraft
sums 162/256 and 12/16) plus the standard Annex-K-style quantization
matrices. Correctness therefore never depends on memorized Huffman
constants: whatever tables the encoder writes, the decoder reads back
from the bitstream, exactly as with real-world files.

Like the PNG/BMP/WAV paths this runs per-blob inside Arrow-batched
``mapInPandas`` kernels (functions/multimodal.py), never per Spark row.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants

#: zigzag scan order, generated (T.81 Figure 5): zz[k] = flat index into
#: the 8x8 block of the k-th coefficient in scan order
def _zigzag_order() -> "np.ndarray":
    order = []
    for s in range(15):  # anti-diagonals
        rng = range(s + 1) if s < 8 else range(s - 7, 8)
        idx = [(i, s - i) for i in rng]
        if s % 2 == 0:  # even diagonals run bottom-left -> top-right
            idx = idx[::-1]
        order += [r * 8 + c for r, c in idx]
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag_order()
_UNZZ = np.argsort(_ZZ)

#: standard luminance / chrominance quantization tables (T.81 Annex K)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

#: orthonormal 8-point DCT-II matrix: forward block = C @ B @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0)
_C *= np.sqrt(2.0 / 8.0)
_C[0] *= 1.0 / np.sqrt(2.0)


def _dct2(block: "np.ndarray") -> "np.ndarray":
    return _C @ block @ _C.T


def _idct2(coef: "np.ndarray") -> "np.ndarray":
    return _C.T @ coef @ _C


# ---------------------------------------------------------------------------
# Huffman: canonical construction (T.81 Annex C)


def _canonical_codes(bits: list[int], huffval: list[int]):
    """BITS (count of codes per length 1..16) + HUFFVAL (symbols in code
    order) → {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    if len(bits) < 16 or sum(bits) > len(huffval):
        raise ValueError("truncated JPEG Huffman table")
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], huffval: list[int]):
    """→ {(length, code): symbol} for the sequential decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, huffval).items()
    }


#: encoder tables: trivially valid canonical codes (see module docstring).
#: DC: 12 size categories, all 4 bits. AC: the 162 baseline run/size
#: symbols (runs 0-15 x sizes 1-10, plus EOB 0x00 and ZRL 0xF0), 8 bits.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 B.1.1.5)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated at 0xFF")
            marker = self.data[self.pos]
            if marker == 0x00:  # stuffed
                self.pos += 1
            else:
                raise ValueError(f"unexpected marker 0xFF{marker:02X} in scan")
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        b = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def symbol(self, table) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(bits: int, size: int) -> int:
    """T.81 F.12: map ``size`` magnitude bits back to a signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ---------------------------------------------------------------------------
# encoder


def _encode_component(
    writer: _BitWriter, blocks: "np.ndarray", q: "np.ndarray",
    dc_codes, ac_codes, pred: int,
) -> int:
    for blk in blocks:
        coef = np.round(_dct2(blk) / q).astype(np.int64)
        zz = coef.reshape(-1)[_ZZ]
        dc = int(zz[0])
        diff = dc - pred
        pred = dc
        size = _size_cat(diff)
        code, length = dc_codes[size]
        writer.write(code, length)
        if size:
            bits = diff if diff >= 0 else diff + (1 << size) - 1
            writer.write(bits, size)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if nz.size else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            size = _size_cat(v)
            code, length = ac_codes[(run << 4) | size]
            writer.write(code, length)
            bits = v if v >= 0 else v + (1 << size) - 1
            writer.write(bits, size)
            run = 0
        if last < 63:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)
    return pred


def _to_blocks(plane: "np.ndarray") -> "np.ndarray":
    """(h, w) float → (n_blocks, 8, 8), edge-replicated to multiples of 8,
    blocks in raster order."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = plane
    padded[h:, :w] = plane[-1:, :]
    padded[:h, w:] = padded[:h, w - 1 : w]
    padded[h:, w:] = padded[h - 1 : h, w - 1 : w]
    return (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def encode_jpeg_pixels(pixels: "np.ndarray") -> bytes:
    """(h, w) or (h, w, 1) grayscale, or (h, w, 3) RGB uint8 → baseline
    JPEG bytes (4:4:4, standard quant tables, simple canonical Huffman
    tables transmitted in DHT)."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg_pixels expects 1 or 3 channels")
    px = px.astype(np.float64)
    if ch == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qs = [_Q_LUMA, _Q_CHROMA, _Q_CHROMA]
    else:
        planes = [px[:, :, 0]]
        qs = [_Q_LUMA]

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    writer = _BitWriter()
    preds = [0] * ch
    # interleaved MCU order == per-component raster blocks at 4:4:4: one
    # 8x8 block per component per MCU
    comp_blocks = [
        _to_blocks(np.clip(p, 0, 255) - 128.0) for p in planes
    ]
    n_mcu = comp_blocks[0].shape[0]
    for m in range(n_mcu):
        for c in range(ch):
            preds[c] = _encode_component(
                writer, comp_blocks[c][m : m + 1], qs[c],
                dc_codes, ac_codes, preds[c],
            )
    scan = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(
        0xDB, b"\x00" + _Q_LUMA.reshape(-1)[_ZZ].astype(np.uint8).tobytes()
    )
    if ch == 3:
        out += seg(
            0xDB,
            b"\x01" + _Q_CHROMA.reshape(-1)[_ZZ].astype(np.uint8).tobytes(),
        )
    sof = struct.pack(">BHHB", 8, h, w, ch)
    for c in range(ch):
        # component id, sampling 1x1, quant table id
        sof += struct.pack(">BBB", c + 1, 0x11, 0 if c == 0 else 1)
    out += seg(0xC0, sof)
    dht = (
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    out += seg(0xC4, dht)
    sos = struct.pack(">B", ch)
    for c in range(ch):
        sos += struct.pack(">BB", c + 1, 0x00)  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"  # spectral selection 0..63, approx 0
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg(width: int, height: int, seed: int = 0, channels: int = 3) -> bytes:
    """Seeded smooth-gradient JPEG blob (the JPEG analog of encode_png;
    smooth content keeps quantization error testably small)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    base = rng.integers(40, 200, size=channels)
    px = np.stack(
        [
            np.clip(
                base[c] + 40.0 * np.sin(xx / 17.0 + c) + 30.0 * np.cos(yy / 23.0),
                0,
                255,
            )
            for c in range(channels)
        ],
        axis=-1,
    ).astype(np.uint8)
    if channels == 1:
        px = px[:, :, 0]
    return encode_jpeg_pixels(px)


# ---------------------------------------------------------------------------
# decoder


def _jpeg_pixels(data: bytes) -> tuple[int, int, int, "np.ndarray"]:
    """→ (width, height, channels, (h, w, ch) uint8). Baseline sequential
    only; tables come from the file's own DQT/DHT segments. Malformed or
    truncated input raises ValueError (the decode-path contract), never a
    bare struct/index error."""
    try:
        return _jpeg_pixels_inner(data)
    except (struct.error, IndexError, KeyError) as exc:
        raise ValueError(f"truncated or corrupt JPEG: {exc}") from exc


def _jpeg_pixels_inner(data: bytes) -> tuple[int, int, int, "np.ndarray"]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hs, vs, tq)]
    scan_comps = None
    scan_data = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: any marker may be preceded by any number of 0xFF
        # fill bytes — skip them so padded real-world files parse
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:  # DQT: one or more tables
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                b += 1
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                vals = np.frombuffer(body, dtype=np.uint8, count=64, offset=b)
                b += 64
                q = np.zeros(64, dtype=np.int32)
                q[_ZZ] = vals  # stored in zigzag order
                qtables[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT: one or more tables
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                b += 1
                bits = list(body[b : b + 16])
                b += 16
                n = sum(bits)
                vals = list(body[b : b + n])
                b += n
                htables[(tc, th)] = _decode_table(bits, vals)
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                hs, vs = hv >> 4, hv & 0x0F
                if (hs, vs) != (1, 1):
                    raise NotImplementedError(
                        "chroma subsampling not supported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"JPEG frame type 0xFF{marker:02X} (non-baseline) not supported"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xDA:  # SOS: header, then entropy data to EOI
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = struct.unpack_from(">BB", body, 1 + 2 * c)
                scan_comps.append((cs, tt >> 4, tt & 0x0F))
            scan_data = data[pos:]
            break
        # other segments (APPn, COM) are skipped
    if frame is None or scan_data is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    nc = len(comps)
    if nc not in (1, 3):
        raise NotImplementedError("only 1- or 3-component JPEG supported")

    reader = _BitReader(scan_data)
    bh, bw = -(-h // 8), -(-w // 8)
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.float64) for _ in range(nc)]
    preds = [0] * nc
    cid_to_tq = dict(comps)
    for by in range(bh):
        for bx in range(bw):
            for ci, (cs, td, ta) in enumerate(scan_comps):
                dc_tab = htables[(0, td)]
                ac_tab = htables[(1, ta)]
                q = qtables[cid_to_tq[cs]]
                zz = np.zeros(64, dtype=np.int64)
                size = reader.symbol(dc_tab)
                diff = _extend(reader.bits(size), size) if size else 0
                preds[ci] += diff
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = reader.symbol(ac_tab)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = rs >> 4, rs & 0x0F
                    k += run
                    if k > 63:
                        raise ValueError("JPEG AC coefficient overrun")
                    zz[k] = _extend(reader.bits(size), size)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[_ZZ] = zz  # inverse zigzag
                block = _idct2(coef.reshape(8, 8) * q) + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block

    planes = [p[:h, :w] for p in planes]
    if nc == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        px = np.stack([r, g, b], axis=-1)
    else:
        px = planes[0][:, :, None]
    return (w, h, nc, np.clip(np.round(px), 0, 255).astype(np.uint8))


def decode_jpeg(data: bytes) -> tuple[int, int, float]:
    """→ (width, height, pixel_mean) — REAL baseline decode, no codec."""
    w, h, _ch, px = _jpeg_pixels(data)
    return (w, h, float(px.mean()) if px.size else float("nan"))


def resize_jpeg(data: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor JPEG resize: decode → index-sample →
    re-encode (lossy, like any JPEG round trip)."""
    w, h, ch, px = _jpeg_pixels(data)
    yi = (np.arange(target_h) * h) // target_h
    xi = (np.arange(target_w) * w) // target_w
    out = np.ascontiguousarray(px[yi][:, xi])
    if ch == 1:
        out = out[:, :, 0]
    return encode_jpeg_pixels(out)
