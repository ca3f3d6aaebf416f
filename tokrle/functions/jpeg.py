"""Baseline JPEG codec in pure Python/NumPy (ITU-T T.81 public spec).

No libjpeg/PIL exists in this runtime, so — like the PNG codec
(tokrle.functions.png) — the format is implemented from the published
specification: the DECODER handles baseline sequential DCT (SOF0),
8-bit samples, 1- or 3-component images with arbitrary sampling factors
up to 2x2 (covers 4:4:4, 4:2:2, 4:2:0), multiple DQT/DHT segments,
byte stuffing, and restart markers; the ENCODER produces grayscale or
4:2:0 color baseline JPEGs with the Annex K quantization + Huffman
tables (libjpeg-compatible quality scaling), and doubles as the
independent round-trip reference for the decoder tests.

Performance shape: the entropy scan is a per-symbol Python loop (the
irreducibly sequential part of JPEG), but everything per-block —
(I)DCT, quantize, zigzag, level shift, color transform — is one
vectorized NumPy pass over ALL blocks of a component.  Inside the Ray
pipelines this runs per item in an actor-pool ``map_batches`` stage
(media payloads are row-level binaries), so the Python loop is bounded
by one image, never a batch.

Reference provenance: pyrle has no media surface at all — this module
belongs to the training-data-pipeline extension of the brief (decode /
feature-extract as actor stages over opaque binary columns).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables
# zigzag scan order (T.81 figure 5): ZIGZAG[i] = raster index of the
# i-th coefficient in scan order
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# T.81 Annex K.1 example quantization tables (the de-facto standard)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# T.81 Annex K.3 typical Huffman tables: (BITS counts per code length
# 1..16, HUFFVAL symbol list)
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])

# orthonormal 8-point DCT-II basis: forward F = C f C^T, inverse
# f = C^T F C — one einsum over all blocks of a component at once
_C = np.zeros((8, 8))
for _k in range(8):
    _s = np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
    _C[_k] = _s * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)


def _canonical_codes(bits: list[int], vals: list[int]):
    """(symbol -> (code, length)) and ((length, code) -> symbol) from the
    T.81 BITS/HUFFVAL canonical construction (Annex C)."""
    enc, dec = {}, {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            dec[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return enc, dec


def quality_tables(quality: int = 75):
    """Annex K tables scaled with the libjpeg quality formula, clamped
    to [1, 255] (baseline requires 8-bit table entries)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out


# ---------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 B.1.1.5)
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a (H, W) plane -> (n_blocks, 64) quantized
    zigzag coefficients, fully vectorized."""
    h, w = plane.shape
    blocks = (plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
              .reshape(-1, 8, 8).astype(np.float64) - 128.0)
    coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    qz = np.round(coef.reshape(-1, 64)[:, ZIGZAG]
                  / qtab[ZIGZAG]).astype(np.int64)
    return qz


def _encode_blocks(bw: _BitWriter, blocks_zz: np.ndarray, prev_dc: int,
                   dc_enc: dict, ac_enc: dict) -> int:
    """Huffman-encode quantized zigzag blocks; returns the new DC
    predictor.  The per-symbol loop is the sequential entropy stage; the
    (run, size) symbol extraction per block is numpy-assisted."""
    for blk in blocks_zz:
        size, bits = _magnitude(int(blk[0]) - prev_dc)
        code, length = dc_enc[size]
        bw.write(code, length)
        bw.write(bits, size)
        prev_dc = int(blk[0])
        nz = np.flatnonzero(blk[1:])
        pos = 0
        for idx in nz:
            run = int(idx) - pos
            while run >= 16:
                zc, zl = ac_enc[0xF0]      # ZRL
                bw.write(zc, zl)
                run -= 16
            size, bits = _magnitude(int(blk[1 + idx]))
            code, length = ac_enc[run * 16 + size]
            bw.write(code, length)
            bw.write(bits, size)
            pos = int(idx) + 1
        if pos < 63:
            code, length = ac_enc[0x00]    # EOB
            bw.write(code, length)
    return prev_dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    m = img.astype(np.float64)
    y = 0.299 * m[..., 0] + 0.587 * m[..., 1] + 0.114 * m[..., 2]
    cb = 128.0 - 0.168736 * m[..., 0] - 0.331264 * m[..., 1] \
        + 0.5 * m[..., 2]
    cr = 128.0 + 0.5 * m[..., 0] - 0.418688 * m[..., 1] \
        - 0.081312 * m[..., 2]
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % mult, -w % mult
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(img: np.ndarray, quality: int = 75,
                restart_interval: int = 0) -> bytes:
    """Encode (H, W, 3) RGB as baseline 4:2:0 JPEG, or (H, W)/(H, W, 1)
    grayscale as single-component JPEG — Annex K tables, quality-scaled.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (resets the DC predictors, the T.81 error-resilience
    mechanism)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2 or img.shape[2] == 1
    h, w = img.shape[:2]
    ql, qc = quality_tables(quality)
    dcl_enc, _ = _canonical_codes(*DC_LUMA)
    acl_enc, _ = _canonical_codes(*AC_LUMA)
    dcc_enc, _ = _canonical_codes(*DC_CHROMA)
    acc_enc, _ = _canonical_codes(*AC_CHROMA)

    out = bytearray(b"\xff\xd8")                       # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(ql[ZIGZAG].tolist()))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(qc[ZIGZAG].tolist()))

    if gray:
        comps = bytes([1, 0x11, 0])
        ncomp = 1
    else:
        comps = bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        ncomp = 3
    out += _seg(0xC0, bytes([8]) + h.to_bytes(2, "big")
                + w.to_bytes(2, "big") + bytes([ncomp]) + comps)

    def dht(cls, tid, table):
        bits, vals = table
        return _seg(0xC4, bytes([cls * 16 + tid]) + bytes(bits)
                    + bytes(vals))

    out += dht(0, 0, DC_LUMA) + dht(1, 0, AC_LUMA)
    if not gray:
        out += dht(0, 1, DC_CHROMA) + dht(1, 1, AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, int(restart_interval).to_bytes(2, "big"))

    if gray:
        out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    else:
        out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    bw = _BitWriter()

    def maybe_restart(m: int, prev: list[int]) -> None:
        # pad to byte boundary, emit RSTn (cycling 0-7), reset DC preds
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            prev[:] = [0] * len(prev)

    if gray:
        plane = img if img.ndim == 2 else img[:, :, 0]
        zz = _fdct_quant(_pad_to(plane, 8), ql)
        prev = [0]
        for m in range(len(zz)):             # one MCU = one block
            maybe_restart(m, prev)
            prev[0] = _encode_blocks(bw, zz[m:m + 1], prev[0],
                                     dcl_enc, acl_enc)
    else:
        ycc = rgb_to_ycbcr(img)
        yp = _pad_to(ycc[..., 0], 16)
        # 2x2 mean chroma downsample over the padded plane
        cbp = _pad_to(ycc[..., 1], 16)
        crp = _pad_to(ycc[..., 2], 16)
        cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2) \
            .mean(axis=(1, 3))
        cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2) \
            .mean(axis=(1, 3))
        yzz = _fdct_quant(yp, ql)
        cbzz = _fdct_quant(cb, qc)
        crzz = _fdct_quant(cr, qc)
        # interleave per MCU: 4 Y blocks (2x2) then 1 Cb then 1 Cr
        ybw = yp.shape[1] // 8           # Y blocks per row
        mcux, mcuy = yp.shape[1] // 16, yp.shape[0] // 16
        cbw = cb.shape[1] // 8
        prev = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart(my * mcux + mx, prev)
                yidx = [(2 * my + dy) * ybw + 2 * mx + dx
                        for dy in (0, 1) for dx in (0, 1)]
                prev[0] = _encode_blocks(bw, yzz[yidx], prev[0],
                                         dcl_enc, acl_enc)
                cidx = my * cbw + mx
                prev[1] = _encode_blocks(bw, cbzz[cidx:cidx + 1], prev[1],
                                         dcc_enc, acc_enc)
                prev[2] = _encode_blocks(bw, crzz[cidx:cidx + 1], prev[2],
                                         dcc_enc, acc_enc)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder
class _BitReader:
    """Entropy-scan bit reader: un-stuffs 0xFF00, stops at markers, and
    resyncs past RSTn on request."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # marker reached: feed 1-bits (spec pad); caller handles
                # the RST/EOI boundary via sync()/at_marker()
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
            else:
                self.pos += 1
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker and reset bit state."""
        d = self.data
        p = self.pos
        while not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2
        self.acc = 0
        self.n = 0


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_huff(br: _BitReader, dec: dict) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = dec.get((length, code))
        if sym is not None:
            return sym
        if length > 16:
            raise ValueError("invalid JPEG Huffman stream")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG to (H, W, C) uint8 (C = 1 or 3,
    RGB for 3).  Supports per-component sampling factors up to 2x2,
    restart intervals, and multi-table DQT/DHT segments."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    pos = 2
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = d[pos + 1]
        if marker == 0xD9:
            break
        seglen = int.from_bytes(d[pos + 2:pos + 4], "big")
        body = d[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 15
                n = 64 * (2 if prec else 1)
                raw = body[i + 1:i + 1 + n]
                vals = (np.frombuffer(raw, dtype=">u2").astype(np.int64)
                        if prec else
                        np.frombuffer(raw, dtype=np.uint8).astype(np.int64))
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = vals
                qtabs[tid] = tab
                i += 1 + n
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                _, dec = _canonical_codes(bits, vals)
                huffs[(cls, tid)] = dec
                i += 17 + nv
        elif marker == 0xC0:
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type FF{marker:02X} "
                             "(only baseline SOF0)")
        elif marker == 0xDD:
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan = {}
            for s in range(ns):
                cid, tabs = body[1 + 2 * s], body[2 + 2 * s]
                scan[cid] = (tabs >> 4, tabs & 15)
            return _decode_scan(d, pos, frame, scan, qtabs, huffs, restart)
        # all other markers (APPn, COM): skipped
    raise ValueError("no scan (SOS) found")


def _decode_scan(d: bytes, pos: int, frame: dict, scan: dict,
                 qtabs: dict, huffs: dict, restart: int) -> np.ndarray:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    n_mcu = mcux * mcuy
    # per component: quantized coefficient store, (n_blocks, 64)
    store = [np.zeros((n_mcu * c["h"] * c["v"], 64), dtype=np.int64)
             for c in comps]
    br = _BitReader(d, pos)
    prev = [0] * len(comps)
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            br.sync_restart()
            prev = [0] * len(comps)
        for ci, c in enumerate(comps):
            dc_dec = huffs[(0, scan[c["id"]][0])]
            ac_dec = huffs[(1, scan[c["id"]][1])]
            nb = c["h"] * c["v"]
            for b in range(nb):
                blk = store[ci][m * nb + b]
                size = _decode_huff(br, dc_dec)
                prev[ci] += _extend(br.receive(size), size)
                blk[0] = prev[ci]
                k = 1
                while k < 64:
                    sym = _decode_huff(br, ac_dec)
                    if sym == 0x00:          # EOB
                        break
                    run, size = sym >> 4, sym & 15
                    if size == 0:
                        if run == 15:        # ZRL
                            k += 16
                            continue
                        break
                    k += run
                    if k > 63:
                        raise ValueError("AC coefficient overrun")
                    blk[k] = _extend(br.receive(size), size)
                    k += 1

    planes = []
    for ci, c in enumerate(comps):
        q = qtabs[c["tq"]]
        coef = np.zeros((len(store[ci]), 64), dtype=np.float64)
        # store is in SCAN order -> multiply by the scan-order view of
        # the (raster-kept) quant table, then scatter back to raster
        coef[:, ZIGZAG] = store[ci] * q[ZIGZAG]  # dequant + dezigzag
        blocks = np.einsum("ji,njk,kl->nil", _C,
                           coef.reshape(-1, 8, 8), _C) + 128.0
        # reassemble: blocks are stored MCU-major, h*v sub-blocks each
        bw_ = mcux * c["h"]
        plane = np.zeros((mcuy * c["v"] * 8, bw_ * 8))
        idx = 0
        for m in range(n_mcu):
            my, mx = divmod(m, mcux)
            for dy in range(c["v"]):
                for dx in range(c["h"]):
                    y0 = (my * c["v"] + dy) * 8
                    x0 = (mx * c["h"] + dx) * 8
                    plane[y0:y0 + 8, x0:x0 + 8] = blocks[idx]
                    idx += 1
        # upsample to full resolution by pixel replication
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:frame["h"], :frame["w"]])
    stacked = np.stack(planes, axis=-1)
    if len(comps) == 1:
        return np.clip(np.round(stacked), 0, 255).astype(np.uint8)
    return ycbcr_to_rgb(stacked)
