"""Data-layout optimization: Z-order (Morton) clustering.

A single-column sort gives perfect zone-map pruning on that column and
none on any other; interleaving the bits of two columns gives BOTH
columns locality, so chunk min/max zone maps (see
tokrle.pipelines.table_encode) prune 2-D range queries.  The same
technique as Delta Lake / Databricks Z-ORDER, expressed as one
vectorized key computation + Ray Data's distributed sort.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_M = [np.uint64(m) for m in (
    0x0000FFFF0000FFFF, 0x00FF00FF00FF00FF, 0x0F0F0F0F0F0F0F0F,
    0x3333333333333333, 0x5555555555555555)]


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each value to even bit positions
    (classic Morton magic-mask doubling, fully vectorized)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & _M[0]
    v = (v | (v << np.uint64(8))) & _M[1]
    v = (v | (v << np.uint64(4))) & _M[2]
    v = (v | (v << np.uint64(2))) & _M[3]
    v = (v | (v << np.uint64(1))) & _M[4]
    return v


def zorder_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleaved-bit (Morton) key of two non-negative integer columns,
    as int64 (column a in even bits, b in odd).  Values must fit in 31
    bits each so the interleaved key stays in the int64 sort domain."""
    a = np.asarray(a)
    b = np.asarray(b)
    if len(a) and (a.min() < 0 or b.min() < 0
                   or a.max() >= (1 << 31) or b.max() >= (1 << 31)):
        raise ValueError("zorder_key needs values in [0, 2^31)")
    return (_spread_bits(a) | (_spread_bits(b) << np.uint64(1))) \
        .astype(np.int64)


def cluster_zorder(ds, col_a: str, col_b: str):
    """Return ``ds`` distributed-sorted by the Morton key of two columns
    (the key column is dropped from the output — it exists only to drive
    the range-partition exchange)."""

    def add_key(batch: pa.Table) -> pa.Table:
        a = batch.column(col_a).to_numpy(zero_copy_only=False)
        b = batch.column(col_b).to_numpy(zero_copy_only=False)
        return batch.append_column("__zorder",
                                   pa.array(zorder_key(a, b),
                                            type=pa.int64()))

    sorted_ds = ds.map_batches(add_key, batch_format="pyarrow") \
                  .sort("__zorder")
    return sorted_ds.drop_columns(["__zorder"])
