"""Lightweight per-chunk compression codecs: dict, RLE, FSST-lite, bit-pack,
frame-of-reference, plain.

Each codec maps a 1-D integer NumPy array to an opaque ``bytes`` payload and
back, bit-identical (the round-trip gate generalizes the reference's
Rle-construction round-trips, ref pyrle/rle.py:34-64 + tests/test_hypothesis.py).
Chunk metadata (codec name, element count, dtype) travels in Arrow columns
next to the payload, not inside it — see tokrle.stages.encoder.

All codecs are fully vectorized (NumPy kernels only; no per-element Python
loops).  Integer dtypes int8..int64 / uint8..uint64 are supported; float64
round-trips via the 'plain' codec (bit-pattern copy).

Payload layouts are little-endian struct headers + np.packbits streams; see
each codec's docstring.
"""

from __future__ import annotations

import struct

import numpy as np

from tokrle.codecs._bits import bit_width, pack_uints, unpack_uints

__all__ = ["CODECS", "encode", "decode", "Codec"]


def _span_to_unsigned(x: np.ndarray, ref: int) -> np.ndarray:
    """(x - ref) as uint64 without overflow for any int64 input."""
    return (x.astype(np.int64) - np.int64(ref)).astype(np.uint64)


class Codec:
    name: str

    def encode(self, x: np.ndarray) -> bytes:
        raise NotImplementedError

    def decode(self, payload: bytes, n: int, dtype: np.dtype) -> np.ndarray:
        raise NotImplementedError


class Plain(Codec):
    """Raw native bytes — the fallback that can never lose by more than 0%."""

    name = "plain"

    def encode(self, x):
        return x.tobytes()

    def decode(self, payload, n, dtype):
        return np.frombuffer(payload, dtype=dtype, count=n).copy()


class BitPack(Codec):
    """Zero-referenced bit packing: ``<B width>`` + width-bit codes.

    Valid for non-negative inputs only (the selector guards this); width is
    chosen from the chunk max.
    """

    name = "bitpack"

    def encode(self, x):
        if len(x) and int(x.min()) < 0:
            raise ValueError("bitpack requires non-negative values")
        w = bit_width(int(x.max())) if len(x) else 0
        return struct.pack("<B", w) + pack_uints(x.astype(np.uint64), w)

    def decode(self, payload, n, dtype):
        (w,) = struct.unpack_from("<B", payload, 0)
        return unpack_uints(payload[1:], n, w).astype(dtype)


class FrameOfReference(Codec):
    """Frame-of-reference: ``<q ref><B width>`` + width-bit (x - ref) codes."""

    name = "for"

    def encode(self, x):
        if len(x) == 0:
            return struct.pack("<qB", 0, 0)
        ref = int(x.min())
        deltas = _span_to_unsigned(x, ref)
        w = bit_width(int(deltas.max()))
        return struct.pack("<qB", ref, w) + pack_uints(deltas, w)

    def decode(self, payload, n, dtype):
        ref, w = struct.unpack_from("<qB", payload, 0)
        out = unpack_uints(payload[9:], n, w).astype(np.int64) + ref
        return out.astype(dtype)


class Dictionary(Codec):
    """Dictionary: sorted-unique values (themselves FOR-bitpacked) + per
    element codes at ceil(log2(cardinality)) bits.

    Layout: ``<I k><B code_w><q ref><B dict_w>`` + dict codes + element codes.
    """

    name = "dict"

    def encode(self, x):
        if len(x) == 0:
            return struct.pack("<IBqB", 0, 0, 0, 0) + struct.pack("<I", 0)
        vmin = int(x.min())
        vmax = int(x.max())
        span = vmax - vmin
        if 0 <= span < (1 << 20) and span < 8 * len(x):
            # O(n + span) unique+codes via a presence table instead of the
            # O(n log n) sort inside np.unique
            shifted = (x.astype(np.int64) - vmin)
            present = np.zeros(span + 1, dtype=bool)
            present[shifted] = True
            uniq_idx = np.flatnonzero(present)
            code_of = np.zeros(span + 1, dtype=np.uint32)
            code_of[uniq_idx] = np.arange(len(uniq_idx), dtype=np.uint32)
            uniq = (uniq_idx + vmin).astype(x.dtype)
            inv = code_of[shifted]
        else:
            uniq, inv = np.unique(x, return_inverse=True)
        k = len(uniq)
        ref = int(uniq[0])
        dict_deltas = _span_to_unsigned(uniq, ref)
        dict_w = bit_width(int(dict_deltas.max())) if k else 0
        code_w = bit_width(k - 1)
        dict_bytes = pack_uints(dict_deltas, dict_w)
        header = struct.pack("<IBqB", k, code_w, ref, dict_w)
        return header + struct.pack("<I", len(dict_bytes)) + dict_bytes + \
            pack_uints(inv.astype(np.uint64), code_w)

    def decode(self, payload, n, dtype):
        k, code_w, ref, dict_w = struct.unpack_from("<IBqB", payload, 0)
        (dict_len,) = struct.unpack_from("<I", payload, 14)
        off = 18
        uniq = unpack_uints(payload[off:off + dict_len], k, dict_w).astype(np.int64) + ref
        codes = unpack_uints(payload[off + dict_len:], n, code_w)
        return uniq[codes].astype(dtype)


class RunLength(Codec):
    """RLE: exact-equality run detection (integer-native find_runs idiom,
    ref pyrle/rle.py:34-64), runs and values each bit-packed.

    Layout: ``<I nruns><B run_w><q vref><B val_w>`` + (runs-1) codes +
    (values - vref) codes.
    """

    name = "rle"

    def encode(self, x):
        if len(x) == 0:
            return struct.pack("<IBqB", 0, 0, 0, 0)
        boundary = np.empty(len(x), dtype=bool)
        boundary[0] = True
        np.not_equal(x[:-1], x[1:], out=boundary[1:])
        starts = np.flatnonzero(boundary)
        runs = np.diff(starts, append=len(x)).astype(np.uint64) - np.uint64(1)
        values = x[starts]
        run_w = bit_width(int(runs.max()))
        vref = int(values.min())
        vdeltas = _span_to_unsigned(values, vref)
        val_w = bit_width(int(vdeltas.max()))
        header = struct.pack("<IBqB", len(starts), run_w, vref, val_w)
        return header + pack_uints(runs, run_w) + pack_uints(vdeltas, val_w)

    def decode(self, payload, n, dtype):
        nruns, run_w, vref, val_w = struct.unpack_from("<IBqB", payload, 0)
        off = 14
        runs_nbytes = (nruns * run_w + 7) // 8
        runs = unpack_uints(payload[off:off + runs_nbytes], nruns, run_w) + np.uint64(1)
        values = unpack_uints(payload[off + runs_nbytes:], nruns, val_w).astype(np.int64) + vref
        return np.repeat(values.astype(dtype), runs.astype(np.int64))


class FsstLite(Codec):
    """FSST-lite: a byte-level symbol-table codec in the spirit of FSST
    (Boncz/Neumann/Leis, "FSST: Fast Random Access String Compression",
    VLDB 2020) restricted to fixed 2-byte symbols so both directions stay
    fully vectorizable in NumPy.

    The raw little-endian bytes of the chunk are split into 16-bit words; the
    ≤254 most frequent words become 1-byte codes.  Instead of FSST's in-band
    escape byte we store an explicit hit bitmap (1 bit/word), 1-byte codes
    for hits and 2-byte literals for misses — same information, but decode
    is a single vectorized scatter rather than a sequential scan.

    Layout: ``<Q nbytes><H k>`` + k*2B symbol table + ceil(nwords/8) bitmap +
    hit codes + miss literals.
    """

    name = "fsst"
    MAX_SYMBOLS = 254

    def encode(self, x):
        raw = np.frombuffer(x.tobytes(), dtype=np.uint8)
        nbytes = len(raw)
        if nbytes % 2:
            raw = np.concatenate([raw, np.zeros(1, dtype=np.uint8)])
        words = raw.view(np.uint16)
        if len(words) == 0:
            return struct.pack("<QH", 0, 0)
        uniq, counts = np.unique(words, return_counts=True)
        # symbols must save more than their 2-byte table cost: count > 2
        order = np.argsort(counts)[::-1]
        top = order[: self.MAX_SYMBOLS]
        top = top[counts[top] > 2]
        table = np.sort(uniq[top])
        idx = np.searchsorted(table, words)
        idx_c = np.clip(idx, 0, max(len(table) - 1, 0))
        hit = len(table) > 0 and (table[idx_c] == words)
        if isinstance(hit, bool):
            hit = np.zeros(len(words), dtype=bool)
        codes = idx_c[hit].astype(np.uint8)
        literals = words[~hit]
        bitmap = np.packbits(hit.astype(np.uint8), bitorder="little")
        return (struct.pack("<QH", nbytes, len(table))
                + table.astype(np.uint16).tobytes()
                + bitmap.tobytes()
                + codes.tobytes()
                + literals.astype(np.uint16).tobytes())

    def decode(self, payload, n, dtype):
        nbytes, k = struct.unpack_from("<QH", payload, 0)
        nwords = (nbytes + 1) // 2
        off = 10
        table = np.frombuffer(payload, dtype=np.uint16, count=k, offset=off)
        off += 2 * k
        bm_len = (nwords + 7) // 8
        hit = np.unpackbits(
            np.frombuffer(payload, dtype=np.uint8, count=bm_len, offset=off),
            count=nwords, bitorder="little").astype(bool)
        off += bm_len
        nhits = int(hit.sum())
        codes = np.frombuffer(payload, dtype=np.uint8, count=nhits, offset=off)
        off += nhits
        literals = np.frombuffer(payload, dtype=np.uint16,
                                 count=nwords - nhits, offset=off)
        words = np.empty(nwords, dtype=np.uint16)
        words[hit] = table[codes]
        words[~hit] = literals
        raw = words.view(np.uint8)[:nbytes]
        return np.frombuffer(raw.tobytes(), dtype=dtype, count=n).copy()


CODECS: dict[str, Codec] = {
    c.name: c
    for c in [Plain(), BitPack(), FrameOfReference(), Dictionary(),
              RunLength(), FsstLite()]
}


def encode(codec: str, x: np.ndarray) -> bytes:
    return CODECS[codec].encode(np.ascontiguousarray(x))


def decode(codec: str, payload: bytes, n: int, dtype) -> np.ndarray:
    return CODECS[codec].decode(payload, n, np.dtype(dtype))
