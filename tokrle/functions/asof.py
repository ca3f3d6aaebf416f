"""Distributed as-of join — the canonical operator Ray Data lacks.

For every left row, attach the right row with the greatest timestamp
<= the left row's timestamp within the same key (``direction
="backward"``, SQL ``ASOF JOIN ... ON l.key = r.key AND l.ts >= r.ts``
semantics; unmatched left rows keep nulls, i.e. LEFT ASOF).

Scale shape: both sides are tagged, schema-harmonized and unioned, then
ONE hash exchange co-locates complete key groups
(:func:`tokrle.functions.dedup._group_blocks`); each block is matched
in a single vectorized pass — sort by (key, ts, side) with right rows
first at equal timestamps, then a running ``maximum.accumulate`` of
right-row positions gives every left row its latest predecessor, with
cross-key carryover invalidated by a key comparison (no per-key Python,
no per-row loop).  Equal right timestamps within a key tie-break to the
last row in (ts, original-order) sort — deterministic.

Partitioning assumption (documented per the custom-operator rule): one
key's rows must fit a block — keys here are users/entities, the same
assumption the sessionization operator makes.  A pathological single
key would need range-partitioned merge; not needed for entity-keyed
telemetry.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def asof_join(left_ds, right_ds, *, on: str, ts_col: str,
              right_cols: tuple[str, ...] = (),
              right_prefix: str = "right_",
              num_partitions: int | None = None):
    """LEFT ASOF (backward) join of two datasets.

    Output: every left row's columns, plus ``right_prefix + ts_col`` and
    ``right_prefix + c`` for each ``c`` in ``right_cols`` (null when no
    right row precedes the left row within the key)."""
    from tokrle.functions.dedup import (_combined_size_hint, _group_blocks,
                                        _join_partitions)

    left_fields = _fields(left_ds)
    right_schema = dict(_fields(right_ds))
    carry_right = [(f"{right_prefix}{c}", right_schema[c])
                   for c in (ts_col, *right_cols)]
    all_fields = left_fields + carry_right
    names = [n for n, _ in all_fields]
    left_names = [n for n, _ in left_fields]

    def tag(side: int):
        # side 0 = right (sorts FIRST at equal ts, so a right row at
        # exactly the left row's timestamp is eligible), side 1 = left
        def fn(batch: pa.Table) -> pa.Table:
            cols = {}
            for name, typ in all_fields:
                if side == 1 and name in batch.column_names:
                    cols[name] = batch.column(name).cast(typ)
                elif side == 0 and name.startswith(right_prefix) \
                        and name[len(right_prefix):] in batch.column_names:
                    cols[name] = batch.column(
                        name[len(right_prefix):]).cast(typ)
                elif side == 0 and name == on:
                    cols[name] = batch.column(on).cast(dict(all_fields)[on])
                else:
                    cols[name] = pa.nulls(len(batch), type=typ)
            cols["_side"] = pa.array(np.full(len(batch), side, np.int8))
            return pa.table(cols)
        return fn

    both = left_ds.map_batches(tag(1), batch_format="pyarrow").union(
        right_ds.map_batches(tag(0), batch_format="pyarrow"))
    n = _join_partitions(num_partitions,
                         size_bytes=_combined_size_hint(left_ds, right_ds))
    grouped = _group_blocks(both, keys=[on], num_partitions=n)
    rts_col = f"{right_prefix}{ts_col}"

    def match_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.schema(all_fields).empty_table()
        side = batch.column("_side").to_numpy(zero_copy_only=False)
        key = batch.column(on).to_numpy(zero_copy_only=False)
        is_left = side == 1
        ts = np.where(
            is_left,
            _ts_numpy(batch.column(ts_col)),
            _ts_numpy(batch.column(rts_col)))
        order = np.lexsort((side, ts, key))
        k, s = key[order], side[order]
        # latest right-row position at or before each sorted slot
        marker = np.where(s == 0, np.arange(len(s)), -1)
        last_right = np.maximum.accumulate(marker)
        li = np.flatnonzero(s == 1)
        src = order[li]                          # original left row index
        match = last_right[li]
        valid = (match >= 0) & (k[np.maximum(match, 0)] == k[li])
        take_right = np.where(valid, order[np.maximum(match, 0)], -1)

        out_cols = {}
        left_take = pa.array(src, type=pa.int64())
        right_take = pa.array(
            np.where(take_right >= 0, take_right, None), type=pa.int64())
        for name, _typ in left_fields:
            out_cols[name] = batch.column(name).take(left_take)
        for name, _typ in carry_right:
            out_cols[name] = batch.column(name).take(right_take)
        return pa.table(out_cols)

    return grouped.map_batches(match_block, batch_size=None,
                               batch_format="pyarrow")


def _fields(ds) -> list:
    from tokrle.functions.dedup import _arrow_fields

    return _arrow_fields(ds.schema())


def _ts_numpy(col) -> np.ndarray:
    """Timestamp/numeric column -> sortable int64/float64 numpy view
    (timestamps normalize to int64 epoch ticks; null slots, which only
    occur on the OTHER side's column, become a harmless constant)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type):
        return arr.cast(pa.int64()).fill_null(0).to_numpy(
            zero_copy_only=False)
    return arr.fill_null(0).to_numpy(zero_copy_only=False)
