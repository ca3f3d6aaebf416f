"""Distributed sketches for approximate analytics over token streams.

HyperLogLog distinct counting as a Ray Data two-level aggregate: each
batch builds a tiny register-array partial (vectorized NumPy, no Python
per-row work), partials merge by elementwise max under ``groupby(key)``,
and only (key, 2^p-byte register) rows ever shuffle — the classic
sketch shape for COUNT(DISTINCT) at 100 TB where an exact two-level
groupby would shuffle every distinct value.

Flajolet et al., "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm" (AofA 2007), with the standard small-range
linear-counting correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_SPLITMIX_1 = np.uint64(0x9E3779B97F4A7C15)
_SPLITMIX_2 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_3 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a well-distributed 64-bit hash, vectorized."""
    x = (x + _SPLITMIX_1)
    x = (x ^ (x >> np.uint64(30))) * _SPLITMIX_2
    x = (x ^ (x >> np.uint64(27))) * _SPLITMIX_3
    return x ^ (x >> np.uint64(31))


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """Register array (uint8, length 2^p) for one batch of values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _mix64(values.astype(np.uint64))
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)
    # rank = 1 + leading zeros of the remaining 64-p bits (capped)
    nz = rest != 0
    lz = np.full(len(h), 64 - p, dtype=np.uint8)
    # count leading zeros via float64 exponent trick is lossy; use a
    # 16-bit table over the top bits, vectorized and exact
    top = (rest >> np.uint64(48)).astype(np.int64)
    lz16 = _LZ16[top]
    need_more = nz & (lz16 == 16)
    lz[nz] = np.minimum(lz16[nz], np.uint8(64 - p))
    if need_more.any():
        r = rest[need_more] << np.uint64(16)
        extra = np.zeros(int(need_more.sum()), dtype=np.uint8)
        shift = np.uint64(48)
        for k in range(3):
            t = (r >> shift).astype(np.int64)
            step = _LZ16[t]
            extra = extra + np.where(step < 16, step, 16).astype(np.uint8)
            done = step < 16
            r = np.where(done, r, r << np.uint64(16))
            if done.all():
                break
        lz[need_more] = np.minimum(16 + extra, 64 - p)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


_LZ16 = np.array([16] + [15 - int(np.floor(np.log2(i)))
                         for i in range(1, 1 << 16)], dtype=np.uint8)


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate from a register array (with the standard
    linear-counting small-range correction)."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct_by_key(ds, key_col: str, p: int = 12,
                        values_fn=None) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT value) per key over a Dataset.

    ``values_fn(batch) -> (values ndarray, key ndarray-of-str)`` extracts
    the value stream; defaults to the flat token stream keyed by
    ``key_col``.  Shuffle payload: one (key, 2^p uint8 registers) row per
    (batch, key) — never the values themselves.
    """
    if values_fn is None:
        def values_fn(batch: pa.Table):
            from tokrle.stages.encoder import _flat_tokens

            values, offsets = _flat_tokens(batch)
            keys = np.repeat(
                batch.column(key_col).to_numpy(zero_copy_only=False),
                np.diff(offsets))
            return values, keys

    def partials(batch: pa.Table) -> pa.Table:
        values, keys = values_fn(batch)
        out_key = []
        out_regs = []
        if len(values):
            order = np.argsort(keys, kind="stable")
            sk = keys[order]
            sv = values[order]
            bounds = np.concatenate(
                ([0], np.flatnonzero(sk[1:] != sk[:-1]) + 1, [len(sk)]))
            for s, e in zip(bounds[:-1], bounds[1:]):
                out_key.append(str(sk[s]))
                out_regs.append(hll_partial(sv[s:e], p))
        m = 1 << p
        flat = (np.concatenate(out_regs) if out_regs
                else np.zeros(0, dtype=np.uint8))
        offs = pa.array(np.arange(len(out_key) + 1, dtype=np.int32) * m)
        return pa.table({
            key_col: pa.array(out_key, type=pa.string()),
            "regs": pa.ListArray.from_arrays(
                offs, pa.array(flat.astype(np.int32), type=pa.int32())),
        })

    part_ds = ds.map_batches(partials, batch_format="pyarrow")

    m = 1 << p

    def merge_block(batch: pa.Table) -> pa.Table:
        """Hash-co-located block fold (complete key groups per block):
        one sort + one axis-0 maximum.reduceat over the (rows, m)
        register matrix merges every key in the block at once — no
        per-key Ray dispatch, no per-row Python list round-trips."""
        if len(batch) == 0:
            return pa.schema([(key_col, pa.string()),
                              ("approx_unique", pa.int64())]).empty_table()
        from tokrle.functions._arrays import key_groups, list_rows

        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        flat, offs = list_rows(batch.column("regs"))
        mat = flat[offs[0]:offs[-1]].astype(np.uint8).reshape(-1, m)
        out_keys, out_est = [], []
        for label, idx in key_groups(keys):
            out_keys.append(str(label))
            out_est.append(int(round(hll_estimate(
                mat[idx].max(axis=0)))))
        return pa.table({
            key_col: pa.array(out_keys, type=pa.string()),
            "approx_unique": pa.array(out_est, type=pa.int64()),
        })

    from tokrle.functions.dedup import _group_blocks

    out = _group_blocks(part_ds, [key_col]).map_batches(
        merge_block, batch_size=None, batch_format="pyarrow").to_pandas()
    return out.sort_values(key_col).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Count-min sketch: approximate per-item frequencies


CM_DEPTH = 4


def cm_partial(values: np.ndarray, width_log2: int = 14) -> np.ndarray:
    """Count-min counter matrix (CM_DEPTH x 2^width_log2, int64) for one
    batch — CM_DEPTH row hashes from independent splitmix streams, one
    bincount per row, no Python per value.  Cormode & Muthukrishnan,
    "An improved data stream summary: the count-min sketch" (J.
    Algorithms 2005)."""
    w = 1 << width_log2
    mat = np.zeros((CM_DEPTH, w), dtype=np.int64)
    if len(values) == 0:
        return mat
    u = values.astype(np.uint64)
    for d in range(CM_DEPTH):
        h = _mix64(u + np.uint64(d * 0x9E3779B9))
        col = (h & np.uint64(w - 1)).astype(np.int64)
        mat[d] = np.bincount(col, minlength=w)
    return mat


def cm_query(mat: np.ndarray, items: np.ndarray) -> np.ndarray:
    """Point estimates (min over depth rows) — never under the true
    count, over by at most ~N/width w.h.p."""
    w = mat.shape[1]
    u = np.asarray(items).astype(np.uint64)
    est = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(CM_DEPTH):
        h = _mix64(u + np.uint64(d * 0x9E3779B9))
        col = (h & np.uint64(w - 1)).astype(np.int64)
        est = np.minimum(est, mat[d, col])
    return est


def cm_sketch_tokens(ds, width_log2: int = 14) -> np.ndarray:
    """Distributed count-min over the flat token stream: per-batch counter
    matrices (CM_DEPTH x 2^w int64) fold by elementwise SUM — the
    exchange ships fixed-size matrices, never tokens, and partials merge
    associatively exactly like the HLL registers above."""
    def partials(batch: pa.Table) -> pa.Table:
        from tokrle.stages.encoder import _flat_tokens

        values, _ = _flat_tokens(batch)
        mat = cm_partial(values, width_log2)
        return pa.table({"cm": pa.array([mat.ravel().tobytes()],
                                        type=pa.large_binary())})

    shape = (CM_DEPTH, 1 << width_log2)

    def fold(batch: pa.Table) -> pa.Table:
        acc = np.zeros(shape[0] * shape[1], dtype=np.int64)
        for buf in batch.column("cm"):
            acc += np.frombuffer(buf.as_py(), dtype=np.int64)
        return pa.table({"cm": pa.array([acc.tobytes()],
                                        type=pa.large_binary())})

    parts = ds.map_batches(partials, batch_format="pyarrow") \
        .map_batches(fold, batch_size=64, batch_format="pyarrow") \
        .take_all()
    acc = np.zeros(shape[0] * shape[1], dtype=np.int64)
    for row in parts:
        acc += np.frombuffer(row["cm"], dtype=np.int64)
    return acc.reshape(shape)
