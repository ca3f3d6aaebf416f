"""Per-key SQL window functions as one co-locating exchange + one
vectorized pass per block.

``row_number() / lag() / sum() OVER (PARTITION BY key ORDER BY ...)``
over a 100-TB table: ONE hash exchange co-locates each key's rows
(complete key groups per block via ``_group_blocks``), then each block
gets ONE lexsort + segment-relative kernels across ALL its keys —
``row_number`` is an arange minus repeated segment starts, the running
sum is a cumsum minus the repeated segment-start prefix, ``lag`` is a
shifted diff with segment firsts masked.  No per-key Python, no
whole-table sort (the global order inside a key is all the semantics
need), and the output stays a streaming per-row Dataset.

No reference counterpart (pyrle has no window layer); the segment idiom
matches kernels/segments.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: lag() of the first row in a partition is NULL in SQL; derived numeric
#: columns carry this sentinel instead so downstream kernels stay int64
#: (consumers must exclude it exactly like SQL excludes NULL)
LAG_NULL = np.int64(-(1 << 62))


def add_window_columns(ds, key: str, order_by: list[str], value_col: str,
                       num_partitions: int | None = None):
    """Append per-row window columns over ``PARTITION BY key ORDER BY
    order_by``:

    - ``rn``        1-based row_number
    - ``run_value`` running (inclusive) sum of ``value_col``
    - ``lag_gap``   ``order_by[0]`` minus its lag, ``LAG_NULL`` on the
      first row of each key

    ``order_by`` columns must be int64-like (cast timestamps upstream);
    ties must be broken by the trailing columns for determinism.
    """
    from tokrle.functions.dedup import _group_blocks

    grouped = _group_blocks(ds, [key], num_partitions)

    def per_block(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return batch.append_column(
                "rn", pa.array([], pa.int64())).append_column(
                "run_value", pa.array([], pa.int64())).append_column(
                "lag_gap", pa.array([], pa.int64()))
        k = batch.column(key).to_numpy(zero_copy_only=False)
        obs = [batch.column(c).to_numpy(zero_copy_only=False)
               .astype(np.int64, copy=False) for c in order_by]
        order = np.lexsort(tuple(reversed(obs)) + (k,))
        k_s = k[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], k_s[1:] != k_s[:-1])))
        counts = np.diff(starts, append=n)
        seg0 = np.repeat(starts, counts)
        rn = np.arange(n, dtype=np.int64) - seg0 + 1
        v_s = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64, copy=False)[order]
        csum = np.cumsum(v_s)
        run = csum - csum[seg0] + v_s[seg0]
        o0 = obs[0][order]
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = o0[1:] - o0[:-1]
        gap[starts] = LAG_NULL
        # scatter back to the block's original row order so the appended
        # columns align with the untouched input columns
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n, dtype=np.int64)
        return batch.append_column(
            "rn", pa.array(rn[inv])).append_column(
            "run_value", pa.array(run[inv])).append_column(
            "lag_gap", pa.array(gap[inv]))

    return grouped.map_batches(per_block, batch_size=None,
                               batch_format="pyarrow")
