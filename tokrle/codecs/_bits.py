"""Vectorized bit-packing primitives (pure NumPy).

Pack n unsigned integers at an arbitrary bit width w into ceil(n*w/8) bytes.

Two paths, both C-speed:
- byte-aligned widths (8/16/32/64): plain dtype cast + tobytes, zero bit math;
- other widths: view the values as little-endian bytes, np.unpackbits to an
  (n, sw) bit matrix, slice the low w bit-columns, np.packbits back.  This
  avoids broadcast shifts on uint64 (an order of magnitude slower in NumPy)
  and keeps the transient at n*sw bytes, where sw is the smallest staging
  width (32 or 64) — bounded by the encoder stage's batch size.
"""

from __future__ import annotations

import numpy as np

_ALIGNED = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}


def bit_width(max_value: int) -> int:
    """Bits needed to represent values in [0, max_value]."""
    if max_value < 0:
        raise ValueError("bit_width requires non-negative max")
    return int(max_value).bit_length()


# values per processing chunk — a multiple of 8 so every chunk's bit
# stream is byte-aligned and chunks concatenate exactly.  Keeps the
# transient bit matrix at ~chunk*sw bytes (~1-4 MB): small enough that the
# allocator recycles it across calls instead of mmap/munmapping tens of MB
# per batch (fresh-page faults are the scarce resource when many encoder
# workers run concurrently).
_CHUNK = 1 << 16


def pack_uints(x: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into ``width``-bit little-endian codes."""
    n = len(x)
    if width == 0 or n == 0:
        return b""
    if width in _ALIGNED:
        return np.ascontiguousarray(x.astype(_ALIGNED[width])).tobytes()
    sw = next(w for w in (8, 16, 32, 64) if w > width)
    out = np.empty((n * width + 7) // 8, dtype=np.uint8)
    pos = 0
    for s in range(0, n, _CHUNK):
        seg = x[s:s + _CHUNK]
        raw = np.ascontiguousarray(seg.astype(_ALIGNED[sw])).view(np.uint8)
        bits = np.unpackbits(raw, bitorder="little").reshape(len(seg),
                                                            sw)[:, :width]
        packed = np.packbits(bits.ravel(), bitorder="little")
        out[pos:pos + len(packed)] = packed
        pos += len(packed)
    return out.tobytes()


def unpack_uints(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_uints`; returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if width in _ALIGNED:
        return np.frombuffer(buf, dtype=_ALIGNED[width],
                             count=n).astype(np.uint64)
    sw = next(w for w in (8, 16, 32, 64) if w > width)
    raw = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint64)
    full = np.zeros((min(_CHUNK, n), sw), dtype=np.uint8)
    for s in range(0, n, _CHUNK):
        c = min(_CHUNK, n - s)
        bits = np.unpackbits(raw[s * width // 8:((s + c) * width + 7) // 8],
                             count=c * width,
                             bitorder="little").reshape(c, width)
        full[:c, :width] = bits
        out[s:s + c] = np.packbits(full[:c].ravel(),
                                   bitorder="little").view(_ALIGNED[sw])
    return out


def unpack_uints_range(buf, n: int, width: int, start: int,
                       stop: int) -> np.ndarray:
    """``values[start:stop]`` of a :func:`pack_uints` stream, touching
    only the bytes that cover the 8-value-aligned window around the
    range — any multiple of 8 values begins exactly at a byte boundary
    for every width, so random access needs no bit-offset arithmetic."""
    if width == 0 or stop <= start:
        return np.zeros(max(stop - start, 0), dtype=np.uint64)
    s8 = start & ~7
    e8 = min(n, (stop + 7) & ~7)
    if width in _ALIGNED:
        it = np.dtype(_ALIGNED[width]).itemsize
        vals = np.frombuffer(buf, dtype=_ALIGNED[width], count=e8 - s8,
                             offset=s8 * it).astype(np.uint64)
    else:
        sub = buf[s8 * width // 8: (e8 * width + 7) // 8]
        vals = unpack_uints(sub, e8 - s8, width)
    return vals[start - s8: stop - s8]
