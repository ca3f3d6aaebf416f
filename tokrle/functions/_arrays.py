"""Shared Arrow/numpy helpers for block-fold operators.

One canonical implementation of the two patterns every fold needs —
list-column buffer extraction and within-block key grouping — so the
slicing discipline (absolute offsets, sliced/chunked arrays, Ray's
tensor extension) lives in exactly one place.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def list_rows(col: pa.ChunkedArray | pa.Array):
    """(flat_values, offsets) of an Arrow list/large_list column; row i is
    ``flat[offs[i]:offs[i+1]]`` with offsets indexed ABSOLUTELY into
    ``flat`` (sliced arrays read correctly — do not assume offs[0]==0).
    Ray's variable-shaped tensor extension (in-memory datasets built from
    pandas object columns) falls back to per-row concatenation."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        flat = arr.values.to_numpy(zero_copy_only=False)
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        return flat, offs
    rows = arr.to_numpy(zero_copy_only=False)
    lens = np.fromiter((len(r) for r in rows), dtype=np.int64,
                       count=len(rows))
    offs = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = (np.concatenate([np.asarray(r) for r in rows])
            if len(rows) and offs[-1] else np.empty(0, dtype=np.int32))
    return flat, offs


def list_row_sums(col: pa.ChunkedArray | pa.Array,
                  dtype=np.int64) -> np.ndarray:
    """Per-row sums of a list column, guarded for absolute offsets and
    empty rows (reduceat would otherwise bleed past offs[-1] and misread
    zero-length segments)."""
    flat, offs = list_rows(col)
    n = len(offs) - 1
    out = np.zeros(n, dtype=dtype)
    lo, hi = offs[0], offs[-1]
    if hi > lo:
        x = flat[lo:hi].astype(dtype, copy=False)
        nonempty = np.diff(offs) > 0
        out[nonempty] = np.add.reduceat(x, (offs[:-1] - lo)[nonempty])
    return out


def key_groups(key_arr: np.ndarray):
    """Yield (label, row_index_array) per distinct key: one factorize +
    one stable sort, group extents from boundary flatnonzero."""
    codes, uniques = pd.factorize(key_arr)
    order = np.argsort(codes, kind="stable")
    c = codes[order]
    if len(c) == 0:
        return
    starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
    ends = np.concatenate((starts[1:], [len(c)]))
    for s, e in zip(starts, ends):
        yield uniques[c[s]], order[s:e]


def string_buffers(col: pa.ChunkedArray | pa.Array):
    """(offsets: int64, data: uint8) of an Arrow string column, zero-copy
    off its offsets/data buffers — the ONE place the offset-rebase and
    None-data-buffer (all-empty-strings) discipline lives.

    ``offsets`` are ABSOLUTE indices into ``data`` (length ``len+1``,
    already rebased past ``arr.offset``); callers slice words/documents
    as ``data[offsets[i]:offsets[i+1]]`` or run reduceat/cumsum kernels
    over the offset vector directly.  Handles string and large_string.
    """
    import numpy as np

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    o = arr.offset
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype,
                            count=len(arr) + 1 + o)[o:].astype(np.int64)
    buf = arr.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8) if buf is not None
            else np.zeros(0, dtype=np.uint8))
    return offsets, data
