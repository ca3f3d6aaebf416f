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


def pack_uints(x: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into ``width``-bit little-endian codes."""
    n = len(x)
    if width == 0 or n == 0:
        return b""
    if width in _ALIGNED:
        return np.ascontiguousarray(x.astype(_ALIGNED[width])).tobytes()
    sw = next(w for w in (8, 16, 32, 64) if w > width)
    raw = np.ascontiguousarray(x.astype(_ALIGNED[sw])).view(np.uint8)
    bits = np.unpackbits(raw, bitorder="little").reshape(n, sw)[:, :width]
    return np.packbits(np.ascontiguousarray(bits).ravel(),
                       bitorder="little").tobytes()


def unpack_uints(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_uints`; returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if width in _ALIGNED:
        return np.frombuffer(buf, dtype=_ALIGNED[width],
                             count=n).astype(np.uint64)
    sw = next(w for w in (8, 16, 32, 64) if w > width)
    raw = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(raw, count=n * width,
                         bitorder="little").reshape(n, width)
    full = np.zeros((n, sw), dtype=np.uint8)
    full[:, :width] = bits
    return np.packbits(full.ravel(),
                       bitorder="little").view(_ALIGNED[sw]).astype(np.uint64)
