"""Keyed RLE tables as Ray Datasets — the scale-out replacement for the
reference's driver-held ``RleDict`` (ref pyrle/rledict.py:37-131).

Representation: one row per key, ``(key: string, runs: large_list<int64>,
values: large_list<float64>)``.  The per-key Rle vectors stay *inside*
blocks — no driver-side dict — and keyed alignment happens through ONE
hash exchange (``dedup._group_blocks``) that co-locates complete key
groups per block, then a single vectorized fold per BLOCK iterates its
keys in-process.  This replaces the r2 ``groupby(key).map_groups`` shape
(one Ray-level pandas dispatch per key — ~ms each, brutal at
chromosome-scale key counts and worse at token-corpus key counts) with
the same block-local fold pattern the dedup/sessionize operators use;
the reference instead fans out one ray.remote per key
(ref pyrle/methods.py:80-120).

List columns are packed zero-copy: each fold emits ONE flat int64/float64
buffer per column plus offsets (``large_list`` so a block's total run
count may exceed 2^31), never per-row Python ``tolist()`` round-trips.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tokrle.functions._arrays import key_groups as _key_groups
from tokrle.functions._arrays import list_rows as _list_rows
from tokrle.kernels import rle as K

_EMPTY = np.empty(0)


def _rle_schema(extra: list[tuple[str, pa.DataType]] | None = None):
    return pa.schema([("key", pa.string()),
                      ("runs", pa.large_list(pa.int64())),
                      ("values", pa.large_list(pa.float64()))]
                     + list(extra or []))


def _pack_rle_rows(keys: list, runs_list: list, values_list: list) -> pa.Table:
    """(keys, [runs...], [values...]) -> Arrow table with ONE concatenate
    per column: flat child buffers + int64 offsets, no per-row lists."""
    n = len(keys)
    counts = np.fromiter((len(r) for r in runs_list), dtype=np.int64,
                         count=n)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    flat_r = (np.concatenate(runs_list) if n else
              np.empty(0, dtype=np.int64)).astype(np.int64, copy=False)
    flat_v = (np.concatenate(values_list) if n else
              np.empty(0)).astype(np.float64, copy=False)
    off_arr = pa.array(offs, type=pa.int64())
    return pa.Table.from_arrays(
        [pa.array([str(k) for k in keys], type=pa.string()),
         pa.LargeListArray.from_arrays(off_arr, pa.array(flat_r)),
         pa.LargeListArray.from_arrays(off_arr, pa.array(flat_v))],
        schema=_rle_schema())


def coverage_by_key(ds, key_col: str, start_col: str, end_col: str,
                    value_col: str | None = None):
    """Interval rows -> one (key, runs, values) row per key.

    The reference's RleDict-from-intervals lifecycle (ref
    pyrle/rledict.py:133-180 + pyrle/methods.py:139-156): one hash
    exchange co-locates each key's intervals, one fold per block runs the
    vectorized coverage kernel per key in-process.
    """
    from tokrle.functions.dedup import _group_blocks

    def fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _rle_schema().empty_table()
        key = batch.column(key_col).to_numpy(zero_copy_only=False)
        starts = batch.column(start_col).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        ends = batch.column(end_col).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        weights = (batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64, copy=False)
            if value_col else None)
        keys_out, runs_out, vals_out = [], [], []
        for label, idx in _key_groups(key):
            runs, values = K.coverage(
                starts[idx], ends[idx],
                weights[idx] if weights is not None else None)
            keys_out.append(label)
            runs_out.append(runs)
            vals_out.append(values)
        return _pack_rle_rows(keys_out, runs_out, vals_out)

    return _group_blocks(ds, [key_col]).map_batches(
        fold, batch_size=None, batch_format="pyarrow")


def _binop_kernel(op: str):
    kernels = {"add": K.rle_add, "sub": K.rle_sub,
               "mul": K.rle_mul, "div": K.rle_div}
    if op in kernels:
        return kernels[op]
    # comparison ops: eq/ne/ge/gt/le/lt (ref pyrle/rle.py:248-466)
    return lambda r1, v1, r2, v2, _op=op: K.rle_compare(r1, v1, r2, v2, _op)


def _zero_like(other: tuple[np.ndarray, np.ndarray]):
    """Zero-Rle of the other side's length (ref pyrle/methods.py:105-110)."""
    length = int(np.sum(other[0]))
    return (np.array([length], dtype=np.int64), np.zeros(1))


def coverage_binop_by_key(ds, key_col: str, start_col: str, end_col: str,
                          side_col: str, op: str,
                          value_col: str | None = None):
    """Fused one-scan, one-shuffle equivalent of
    ``binop_keyed(coverage_by_key(a), coverage_by_key(b))`` when both
    operand interval sets come from the SAME table: rows carry a 0/1
    ``side_col`` tag, the single hash exchange co-locates both sides of
    each key, and the per-key fold builds each side's coverage then
    combines — half the scans and half the exchanges of the two-dataset
    path.  A side with no intervals becomes a zero-Rle of the other
    side's length (ref pyrle/methods.py:105-110)."""
    from tokrle.functions.dedup import _group_blocks

    kernel = _binop_kernel(op)

    def fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _rle_schema().empty_table()
        key = batch.column(key_col).to_numpy(zero_copy_only=False)
        starts = batch.column(start_col).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        ends = batch.column(end_col).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)
        sides = batch.column(side_col).to_numpy(zero_copy_only=False)
        weights = (batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64, copy=False)
            if value_col else None)
        keys_out, runs_out, vals_out = [], [], []
        for label, idx in _key_groups(key):
            def cov(side: int, idx=idx):
                rows = idx[sides[idx] == side]
                if len(rows) == 0:
                    return None
                return K.coverage(
                    starts[rows], ends[rows],
                    weights[rows] if weights is not None else None)

            a = cov(0)
            b = cov(1)
            if a is None:
                a = _zero_like(b)
            if b is None:
                b = _zero_like(a)
            runs, values = kernel(a[0], a[1], b[0], b[1])
            keys_out.append(label)
            runs_out.append(runs)
            vals_out.append(values)
        return _pack_rle_rows(keys_out, runs_out, vals_out)

    return _group_blocks(ds, [key_col]).map_batches(
        fold, batch_size=None, batch_format="pyarrow")


def binop_keyed(ds_a, ds_b, op: str):
    """Partition-aligned binary op between two keyed RLE tables.

    Reference semantics (ref pyrle/methods.py:80-120): keys in both ->
    op(pair); keys only in one side -> op against a zero-Rle of the present
    side's length; result keyed by the union of keys.

    Implemented as tag + union + one hash exchange on key (a co-group)
    with a per-block fold: one shuffle, no driver-side key bookkeeping,
    no per-key Ray dispatch.
    """
    from tokrle.functions.dedup import _group_blocks

    kernel = _binop_kernel(op)
    tagged_schema = _rle_schema([("side", pa.int8())])

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            # normalize (list vs large_list, int widths) so the union of
            # two independently-built keyed tables has ONE schema
            runs_f, runs_o = _list_rows(batch.column("runs"))
            vals_f, vals_o = _list_rows(batch.column("values"))
            base = runs_o[0]
            offs = pa.array((runs_o - base).astype(np.int64),
                            type=pa.int64())
            vbase = vals_o[0]
            voffs = pa.array((vals_o - vbase).astype(np.int64),
                             type=pa.int64())
            return pa.Table.from_arrays(
                [batch.column("key").cast(pa.string()),
                 pa.LargeListArray.from_arrays(offs, pa.array(
                     runs_f[base:runs_o[-1]].astype(np.int64, copy=False))),
                 pa.LargeListArray.from_arrays(voffs, pa.array(
                     vals_f[vbase:vals_o[-1]].astype(np.float64,
                                                     copy=False))),
                 pa.array(np.full(len(batch), side, dtype=np.int8))],
                schema=tagged_schema)
        return fn

    tagged = ds_a.map_batches(tag(0), batch_format="pyarrow").union(
        ds_b.map_batches(tag(1), batch_format="pyarrow"))

    def fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _rle_schema().empty_table()
        key = batch.column("key").to_numpy(zero_copy_only=False)
        sides = batch.column("side").to_numpy(zero_copy_only=False)
        runs_f, runs_o = _list_rows(batch.column("runs"))
        vals_f, vals_o = _list_rows(batch.column("values"))
        keys_out, runs_out, vals_out = [], [], []
        for label, idx in _key_groups(key):
            def side(s, idx=idx):
                rows = idx[sides[idx] == s]
                if len(rows) == 0:
                    return None
                # a keyed RLE table holds exactly one Rle per (key, side);
                # duplicate rows mean a malformed upstream union — fail
                # loudly instead of silently using only the first row
                if len(rows) != 1:
                    raise ValueError(
                        f"binop_keyed: {len(rows)} rows for key "
                        f"{label!r} side {s}; keyed RLE tables must have "
                        "one row per key")
                i = int(rows[0])
                return (runs_f[runs_o[i]:runs_o[i + 1]].astype(
                            np.int64, copy=False),
                        vals_f[vals_o[i]:vals_o[i + 1]].astype(
                            np.float64, copy=False))

            a = side(0)
            b = side(1)
            if a is None:
                a = _zero_like(b)
            if b is None:
                b = _zero_like(a)
            runs, values = kernel(a[0], a[1], b[0], b[1])
            keys_out.append(label)
            runs_out.append(runs)
            vals_out.append(values)
        return _pack_rle_rows(keys_out, runs_out, vals_out)

    return _group_blocks(tagged, ["key"]).map_batches(
        fold, batch_size=None, batch_format="pyarrow")


def _map_rle_rows(ds, per_row, out_cols=None):
    """Stateless per-row transform over a keyed RLE table: extracts each
    row's (runs, values) as zero-copy views, applies ``per_row`` ->
    (runs', values'), re-packs once per batch."""

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _rle_schema().empty_table()
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        runs_f, runs_o = _list_rows(batch.column("runs"))
        vals_f, vals_o = _list_rows(batch.column("values"))
        runs_out, vals_out = [], []
        for i in range(len(batch)):
            r = runs_f[runs_o[i]:runs_o[i + 1]].astype(np.int64,
                                                       copy=False)
            v = vals_f[vals_o[i]:vals_o[i + 1]].astype(np.float64,
                                                       copy=False)
            sr, sv = per_row(r, v)
            runs_out.append(sr)
            vals_out.append(sv)
        return _pack_rle_rows(list(keys), runs_out, vals_out)

    return ds.map_batches(fn, batch_format="pyarrow")


def slice_keyed(ds, start: int, end: int):
    """Per-key logical slice [start:end) (ref pyrle/src/getitem.pyx:11-83
    under RleDict.__getitem__)."""
    return _map_rle_rows(
        ds, lambda r, v: K.rle_slice(r, v, start, end))


def shift_keyed(ds, dist: int, *, preserve_length: bool = True,
                fill: float = 0.0):
    """Per-key logical shift (ref pyrle/rle.py:1000-1095 under
    RleDict.shift, pyrle/rledict.py:688-689) as a stateless batch map."""
    return _map_rle_rows(
        ds, lambda r, v: K.rle_shift(r, v, dist, preserve_length, fill))


def getlocs_keyed(ds, locs):
    """Per-key point lookups (ref pyrle/src/getitem.pyx:89-109 under
    RleDict getitem): one row per key with the values at ``locs``
    (positions at/after the vector end read as 0)."""
    locs = np.sort(np.asarray(locs, dtype=np.int64))
    out_schema = pa.schema([("key", pa.string()),
                            ("loc_values", pa.large_list(pa.float64()))])

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        runs_f, runs_o = _list_rows(batch.column("runs"))
        vals_f, vals_o = _list_rows(batch.column("values"))
        n = len(batch)
        out = np.zeros((n, len(locs)), dtype=np.float64)
        for i in range(n):
            r = runs_f[runs_o[i]:runs_o[i + 1]].astype(np.int64,
                                                       copy=False)
            v = vals_f[vals_o[i]:vals_o[i + 1]].astype(np.float64,
                                                       copy=False)
            length = int(r.sum())
            inside = locs[locs < length]
            if len(inside):
                out[i, :len(inside)] = K.rle_getlocs(r, v, inside)
        offs = pa.array(np.arange(n + 1, dtype=np.int64) * len(locs),
                        type=pa.int64())
        return pa.Table.from_arrays(
            [pa.array([str(k) for k in keys], type=pa.string()),
             pa.LargeListArray.from_arrays(offs, pa.array(out.ravel()))],
            schema=out_schema)

    return ds.map_batches(fn, batch_format="pyarrow")


def aggregate_keyed(ds):
    """Per-key decode-domain aggregates computed ON the compressed form
    (never materializing the dense vector): weighted total
    sum(runs*values), max value, logical length, run count — all via
    segment reductions over the flat list buffers (no per-row loop)."""

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.schema([("key", pa.string()),
                              ("total", pa.float64()),
                              ("max_value", pa.float64()),
                              ("length", pa.int64()),
                              ("n_runs", pa.int64())]).empty_table()
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        runs_f, runs_o = _list_rows(batch.column("runs"))
        vals_f, vals_o = _list_rows(batch.column("values"))
        n = len(batch)
        counts = np.diff(runs_o)
        nonempty = counts > 0
        starts = runs_o[:-1]
        total = np.zeros(n)
        length = np.zeros(n, dtype=np.int64)
        max_value = np.zeros(n)
        if runs_o[-1] > runs_o[0]:
            lo = runs_o[0]
            r = runs_f[lo:runs_o[-1]].astype(np.int64, copy=False)
            v = vals_f[vals_o[0]:vals_o[-1]].astype(np.float64, copy=False)
            # reduceat over nonempty-row starts: empty rows occupy no
            # flat space, so each segment runs to the next nonempty start
            idx = (starts - lo)[nonempty]
            total[nonempty] = np.add.reduceat(r * v, idx)
            length[nonempty] = np.add.reduceat(r, idx)
            max_value[nonempty] = np.maximum.reduceat(v, idx)
        return pa.table({
            "key": pa.array([str(k) for k in keys], type=pa.string()),
            "total": pa.array(total),
            "max_value": pa.array(max_value),
            "length": pa.array(length),
            "n_runs": pa.array(counts.astype(np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")
