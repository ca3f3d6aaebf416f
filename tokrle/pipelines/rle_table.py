"""Keyed RLE tables as Ray Datasets — the scale-out replacement for the
reference's driver-held ``RleDict`` (ref pyrle/rledict.py:37-131).

Representation: one row per key, ``(key: string, runs: list<int64>,
values: list<float64>)``.  The per-key Rle vectors stay *inside* blocks —
no driver-side dict — and all keyed alignment happens through
``groupby(key).map_groups`` (Ray Data's shuffle), mirroring the
reference's per-key ray.remote fan-out (ref pyrle/methods.py:80-120) but
with streaming execution, spilling and retries for free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tokrle.kernels import rle as K

_EMPTY = np.empty(0)


def coverage_by_key(ds, key_col: str, start_col: str, end_col: str,
                    value_col: str | None = None):
    """Interval rows -> one (key, runs, values) row per key.

    The reference's RleDict-from-intervals lifecycle (ref
    pyrle/rledict.py:133-180 + pyrle/methods.py:139-156) as a grouped
    Dataset transform.  ``groupby`` is the one all-to-all exchange; the
    per-group kernel is the vectorized coverage from tokrle.kernels.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        starts = g[start_col].to_numpy(dtype=np.int64)
        ends = g[end_col].to_numpy(dtype=np.int64)
        weights = (g[value_col].to_numpy(dtype=np.float64)
                   if value_col else None)
        runs, values = K.coverage(starts, ends, weights)
        return pd.DataFrame({
            "key": [str(g[key_col].iloc[0])],
            "runs": [runs.tolist()],
            "values": [values.tolist()],
        })

    return ds.groupby(key_col).map_groups(per_group, batch_format="pandas")


def _binop_kernel(op: str):
    kernels = {"add": K.rle_add, "sub": K.rle_sub,
               "mul": K.rle_mul, "div": K.rle_div}
    if op in kernels:
        return kernels[op]
    # comparison ops: eq/ne/ge/gt/le/lt (ref pyrle/rle.py:248-466)
    return lambda r1, v1, r2, v2, _op=op: K.rle_compare(r1, v1, r2, v2, _op)


def coverage_binop_by_key(ds, key_col: str, start_col: str, end_col: str,
                          side_col: str, op: str,
                          value_col: str | None = None):
    """Fused one-scan, one-shuffle equivalent of
    ``binop_keyed(coverage_by_key(a), coverage_by_key(b))`` when both
    operand interval sets come from the SAME table: rows carry a 0/1
    ``side_col`` tag, the single groupby(key) shuffle co-locates both
    sides, and the per-group kernel builds each side's coverage then
    combines — half the scans and half the exchanges of the two-dataset
    path.  A side with no intervals becomes a zero-Rle of the other
    side's length (ref pyrle/methods.py:105-110)."""
    kernel = _binop_kernel(op)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        def cov(side: int):
            rows = g[g[side_col] == side]
            if len(rows) == 0:
                return None
            starts = rows[start_col].to_numpy(dtype=np.int64)
            ends = rows[end_col].to_numpy(dtype=np.int64)
            weights = (rows[value_col].to_numpy(dtype=np.float64)
                       if value_col else None)
            return K.coverage(starts, ends, weights)

        a = cov(0)
        b = cov(1)
        if a is None:
            length = int(np.sum(b[0]))
            a = (np.array([length], dtype=np.int64), np.zeros(1))
        if b is None:
            length = int(np.sum(a[0]))
            b = (np.array([length], dtype=np.int64), np.zeros(1))
        runs, values = kernel(a[0], a[1], b[0], b[1])
        return pd.DataFrame({
            "key": [str(g[key_col].iloc[0])],
            "runs": [runs.tolist()],
            "values": [values.tolist()],
        })

    return ds.groupby(key_col).map_groups(per_group, batch_format="pandas")


def binop_keyed(ds_a, ds_b, op: str):
    """Partition-aligned binary op between two keyed RLE tables.

    Reference semantics (ref pyrle/methods.py:80-120): keys in both ->
    op(pair); keys only in one side -> op against a zero-Rle of the present
    side's length; result keyed by the union of keys.

    Implemented as union-tag + groupby(key).map_groups (a co-group): one
    shuffle, no driver-side key bookkeeping.
    """
    kernel = _binop_kernel(op)

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["side"] = side
            return df
        return fn

    tagged = ds_a.map_batches(tag(0), batch_format="pandas").union(
        ds_b.map_batches(tag(1), batch_format="pandas"))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        def side(s):
            rows = g[g["side"] == s]
            if len(rows) == 0:
                return None
            # a keyed RLE table holds exactly one Rle per (key, side);
            # duplicate rows mean a malformed upstream union — fail loudly
            # instead of silently using only the first row
            if len(rows) != 1:
                raise ValueError(
                    f"binop_keyed: {len(rows)} rows for key "
                    f"{g['key'].iloc[0]!r} side {s}; keyed RLE tables must "
                    "have one row per key")
            return (np.asarray(rows["runs"].iloc[0], dtype=np.int64),
                    np.asarray(rows["values"].iloc[0], dtype=np.float64))

        a = side(0)
        b = side(1)
        if a is None:  # zero-Rle of b's length (ref methods.py:105-110)
            length = int(np.sum(b[0]))
            a = (np.array([length], dtype=np.int64), np.zeros(1))
        if b is None:
            length = int(np.sum(a[0]))
            b = (np.array([length], dtype=np.int64), np.zeros(1))
        runs, values = kernel(a[0], a[1], b[0], b[1])
        return pd.DataFrame({
            "key": [str(g["key"].iloc[0])],
            "runs": [runs.tolist()],
            "values": [values.tolist()],
        })

    return tagged.groupby("key").map_groups(per_key, batch_format="pandas")


def slice_keyed(ds, start: int, end: int):
    """Per-key logical slice [start:end) (ref pyrle/src/getitem.pyx:11-83
    under RleDict.__getitem__)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out_runs = []
        out_values = []
        for r, v in zip(df["runs"], df["values"]):
            sr, sv = K.rle_slice(np.asarray(r, dtype=np.int64),
                                 np.asarray(v, dtype=np.float64), start, end)
            out_runs.append(sr.tolist())
            out_values.append(sv.tolist())
        return pd.DataFrame({"key": df["key"], "runs": out_runs,
                             "values": out_values})

    return ds.map_batches(fn, batch_format="pandas")


def shift_keyed(ds, dist: int, *, preserve_length: bool = True,
                fill: float = 0.0):
    """Per-key logical shift (ref pyrle/rle.py:1000-1095 under
    RleDict.shift, pyrle/rledict.py:688-689) as a stateless batch map."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out_runs = []
        out_values = []
        for r, v in zip(df["runs"], df["values"]):
            sr, sv = K.rle_shift(np.asarray(r, dtype=np.int64),
                                 np.asarray(v, dtype=np.float64),
                                 dist, preserve_length, fill)
            out_runs.append(sr.tolist())
            out_values.append(sv.tolist())
        return pd.DataFrame({"key": df["key"], "runs": out_runs,
                             "values": out_values})

    return ds.map_batches(fn, batch_format="pandas")


def getlocs_keyed(ds, locs):
    """Per-key point lookups (ref pyrle/src/getitem.pyx:89-109 under
    RleDict getitem): one row per key with the values at ``locs``
    (positions at/after the vector end read as 0)."""
    locs = np.sort(np.asarray(locs, dtype=np.int64))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for r, v in zip(df["runs"], df["values"]):
            r = np.asarray(r, dtype=np.int64)
            v = np.asarray(v, dtype=np.float64)
            length = int(r.sum())
            inside = locs[locs < length]
            vals = np.zeros(len(locs), dtype=np.float64)
            if len(inside):
                vals[: len(inside)] = K.rle_getlocs(r, v, inside)
            out.append(vals.tolist())
        return pd.DataFrame({"key": df["key"], "loc_values": out})

    return ds.map_batches(fn, batch_format="pandas")


def aggregate_keyed(ds):
    """Per-key decode-domain aggregates computed ON the compressed form
    (never materializing the dense vector): weighted total
    sum(runs*values), max value, logical length, run count."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, r, v in zip(df["key"], df["runs"], df["values"]):
            r = np.asarray(r, dtype=np.int64)
            v = np.asarray(v, dtype=np.float64)
            rows.append({
                "key": key,
                "total": float((r * v).sum()) if len(r) else 0.0,
                "max_value": float(v.max()) if len(v) else 0.0,
                "length": int(r.sum()),
                "n_runs": len(r),
            })
        return pd.DataFrame(rows,
                            columns=["key", "total", "max_value", "length",
                                     "n_runs"])

    return ds.map_batches(fn, batch_format="pandas")
