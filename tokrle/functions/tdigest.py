"""Mergeable t-digest quantile sketch for FLOAT columns (Dunning &
Ertl 2019, "Computing extremely accurate quantiles using t-digests") —
the unbounded-domain companion to the exact integer histogram quantiles
in :mod:`tokrle.functions.quantiles`.

The classic greedy centroid merge is sequential; this implementation uses
the vectorizable *scale-function clustering* formulation of the merging
digest: sort the batch, compute each point's mid-rank quantile q, map it
through the k1 scale function k(q) = (delta/2pi) * asin(2q - 1), and fold
every run of equal floor(k) into one (mean, weight) centroid with a
lexsort + reduceat — no Python loop over points OR keys on the hot path,
tail-biased resolution (clusters near q=0/1 hold O(1) points, so extreme
quantiles stay sharp).

Scale shape: each batch emits a partial sketch of <= ~delta (key, value,
weight) rows per key; ONE exchange moves sketch rows (never
observations); the per-key finalize re-compresses the concatenated
centroid set with the same kernel and interpolates the requested
quantiles.  Exchange volume is n_batches x delta x keys-per-batch rows
regardless of input size.

No SQL analog (rows-only in the sweep): the sketch is approximate by
construction; tests bound the RANK error empirically and the driver query
carries an in-row comparison against the EXACT distributed histogram
quantile of the same column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _compress_sorted_segments(keys: np.ndarray, v: np.ndarray,
                              w: np.ndarray, delta: int
                              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Segmented t-digest compression: ``keys`` sorted, ``v`` sorted within
    each key.  One pass, vectorized across ALL keys: per-key mid-rank
    quantiles via segmented cumsum, k1 scale function, run fold on
    (key-change | cluster-change) boundaries with reduceat.  Returns
    (key per centroid, centroid mean, centroid weight)."""
    n = len(v)
    if n == 0:
        return keys, v.astype(np.float64), w.astype(np.float64)
    v = v.astype(np.float64)
    w = w.astype(np.float64)
    new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
    kstarts = np.flatnonzero(new_key)
    seg_len = np.diff(np.append(kstarts, n))
    cum = np.cumsum(w)
    base = np.repeat(cum[kstarts] - w[kstarts], seg_len)
    totals = np.repeat(np.add.reduceat(w, kstarts), seg_len)
    q_mid = np.clip((cum - base - w / 2.0) / totals, 0.0, 1.0)
    k = (delta / (2.0 * np.pi)) * np.arcsin(2.0 * q_mid - 1.0)
    cid = np.floor(k).astype(np.int64)
    starts = np.flatnonzero(new_key | np.concatenate(
        ([True], cid[1:] != cid[:-1])))
    wsum = np.add.reduceat(w, starts)
    vsum = np.add.reduceat(v * w, starts)
    return keys[starts], vsum / wsum, wsum


def tdigest_compress(values: np.ndarray, weights: np.ndarray,
                     delta: int = 200) -> tuple[np.ndarray, np.ndarray]:
    """Compress weighted points to <= ~delta centroids (sorted by value).
    Deterministic for a given multiset (stable mergesort)."""
    if len(values) == 0:
        return (np.empty(0, dtype=np.float64), np.empty(0, dtype=np.float64))
    order = np.argsort(values, kind="mergesort")
    _, cv, cw = _compress_sorted_segments(
        np.zeros(len(values), dtype=np.int8), values[order].astype(
            np.float64), np.asarray(weights, dtype=np.float64)[order], delta)
    return cv, cw


def tdigest_quantiles(values: np.ndarray, weights: np.ndarray,
                      qs: tuple[float, ...],
                      delta: int = 200) -> np.ndarray:
    """Quantile estimates from centroids: linear interpolation on the
    mid-rank cumulative weights, clamped to the centroid value range."""
    v, w = tdigest_compress(values, weights, delta)
    if len(v) == 0:
        return np.full(len(qs), np.nan)
    cum = np.cumsum(w) - w / 2.0
    return np.interp(np.asarray(qs, dtype=np.float64) * w.sum(), cum, v,
                     left=v[0], right=v[-1])


def tdigest_quantiles_by_key(ds, key_col: str, value_col: str,
                             qs: tuple[float, ...] = (0.5, 0.9),
                             delta: int = 200) -> pd.DataFrame:
    """Per-key approximate quantiles of a float column.

    Batches emit <= ~delta centroid rows per key present in the batch
    (one lexsort + one segmented fold for ALL keys — no per-key Python);
    the single exchange co-locates each key's sketch rows
    (:func:`~tokrle.functions.dedup._group_blocks`), and the block
    finalize re-compresses every key with the same segmented kernel, then
    interpolates the requested quantiles (a small loop over the block's
    KEYS, which are aggregate-sized, never over data rows).
    """
    from tokrle.functions.dedup import _group_blocks

    empty_cols = {key_col: pa.array([], type=pa.string()),
                  "v": pa.array([], type=pa.float64()),
                  "w": pa.array([], type=pa.float64())}

    def partials(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(str)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if len(vals) == 0:
            return pa.table(empty_cols)
        order = np.lexsort((vals, keys))
        ck, cv, cw = _compress_sorted_segments(
            keys[order], vals[order], np.ones(len(vals)), delta)
        return pa.table({key_col: pa.array(ck),
                         "v": pa.array(cv, type=pa.float64()),
                         "w": pa.array(cw, type=pa.float64())})

    sketch = ds.map_batches(partials, batch_format="pyarrow")
    co = _group_blocks(sketch, [key_col])

    def finalize(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(str)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        qcols = {f"q{int(q * 100)}": [] for q in qs}
        if len(keys) == 0:
            cols = {key_col: pa.array([], type=pa.string())}
            cols.update({c: pa.array([], type=pa.float64()) for c in qcols})
            return pa.table(cols)
        order = np.lexsort((v, keys))
        ck, cv, cw = _compress_sorted_segments(keys[order], v[order],
                                               w[order], delta)
        starts = np.flatnonzero(np.concatenate(
            ([True], ck[1:] != ck[:-1])))
        out_k = ck[starts]
        for i, s in enumerate(starts):     # loop over KEYS, not rows
            e = starts[i + 1] if i + 1 < len(starts) else len(ck)
            cum = np.cumsum(cw[s:e]) - cw[s:e] / 2.0
            est = np.interp(np.asarray(qs) * cw[s:e].sum(), cum, cv[s:e],
                            left=cv[s], right=cv[e - 1])
            for q, x in zip(qs, est):
                qcols[f"q{int(q * 100)}"].append(x)
        cols = {key_col: pa.array(out_k)}
        cols.update({c: pa.array(xs, type=pa.float64())
                     for c, xs in qcols.items()})
        return pa.table(cols)

    df = co.map_batches(finalize, batch_format="pyarrow").to_pandas()
    return df.sort_values(key_col).reset_index(drop=True)
