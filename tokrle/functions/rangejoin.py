"""Distributed range-overlap join over keyed interval sets — the core
query of the PyRanges family (the reference pyrle is its run-length
companion), expressed Ray-Data-first.

Two interval datasets (key, start, end, half-open) are tagged,
schema-harmonized, unioned and hash-co-located by key in ONE exchange;
each block then runs a vectorized bounded-length sweep: B intervals are
sorted by start, every A interval's candidate window is
``searchsorted(B.start, a.start - max_b_len) .. searchsorted(B.start,
a.end)``, candidates expand with one repeat/arange, and the exact
overlap predicate filters them — no per-interval Python loop.  The
max-candidate-window trick is exact (an interval of length <= L
overlapping ``a`` must start after ``a.start - L``), and ``L`` is
computed per block from the data.

:func:`range_join_overlap_stats` FUSES the aggregation into the sweep:
enumerated pairs are reduced to per-key (n_pairs, overlap_sum) partials
inside the task, so the pair set — which can be quadratically larger
than the inputs — never enters the object store.  Use
:func:`range_join_pairs` only when the pairs themselves are the output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _tagged_union(a_ds, b_ds, key: str, start: str, end: str,
                  id_col: str | None, num_partitions: int | None):
    from tokrle.functions.dedup import (_combined_size_hint, _group_blocks,
                                        _join_partitions)

    fields = [(key, _key_type(a_ds, key)), (start, pa.int64()),
              (end, pa.int64())] + ([(id_col, pa.int64())] if id_col else [])

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {n: batch.column(n).cast(t) for n, t in fields}
            cols["_side"] = pa.array(np.full(len(batch), side, np.int8))
            return pa.table(cols)
        return fn

    both = a_ds.map_batches(tag(0), batch_format="pyarrow").union(
        b_ds.map_batches(tag(1), batch_format="pyarrow"))
    n = _join_partitions(num_partitions,
                         size_bytes=_combined_size_hint(a_ds, b_ds))
    return _group_blocks(both, keys=[key], num_partitions=n)


def _key_type(ds, key: str):
    from tokrle.functions.dedup import _arrow_fields

    return dict(_arrow_fields(ds.schema()))[key]


def _sweep(batch: pa.Table, key: str, start: str, end: str):
    """Shared sweep prologue over one co-located block: sort B by
    key-offset start, bound every A interval's candidate window.

    Returns ``(a, b_sorted, lo, cnt, s, e, k)`` — A row indices, B row
    indices in start order, per-A window starts and widths — or None
    when either side is empty."""
    side = batch.column("_side").to_numpy(zero_copy_only=False)
    k = batch.column(key).to_numpy(zero_copy_only=False)
    s = batch.column(start).to_numpy(zero_copy_only=False)
    e = batch.column(end).to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(k)
    a = np.flatnonzero(side == 0)
    b = np.flatnonzero(side == 1)
    if len(a) == 0 or len(b) == 0:
        return None
    # key-offset coordinates keep the sweep key-local in one pass: with
    # positions < 2^32 and max length L, stride 2^33 guarantees windows
    # never cross keys (a window reaches at most L below its key's base,
    # and the previous key's intervals end > 2^32 below it)
    stride = np.int64(1) << np.int64(33)
    xa_s = codes[a].astype(np.int64) * stride + s[a]
    xa_e = codes[a].astype(np.int64) * stride + e[a]
    xb_s = codes[b].astype(np.int64) * stride + s[b]
    border = np.argsort(xb_s, kind="stable")
    b_len_max = int((e[b] - s[b]).max())
    lo = np.searchsorted(xb_s[border], xa_s - b_len_max, side="right")
    hi = np.searchsorted(xb_s[border], xa_e, side="left")
    return a, b[border], lo, hi - lo, s, e, k


def _expand(a, b_sorted, lo, cnt, s, e):
    """Candidate expansion + exact overlap test.  Index arrays stay
    int32 (blocks are far below 2^31 rows), one repeat builds the
    candidate positions, and the key-equality recheck is omitted — the
    stride construction in :func:`_sweep` already guarantees windows
    never cross keys.  Returns (ai, bi, ok) aligned to the candidate
    order (grouped by A row)."""
    total = int(cnt.sum())
    if total >= (1 << 31):
        # int32 candidate indices would wrap; a block this dense (>17 GB
        # of expansion) needs smaller partitions, not a silent overflow
        raise ValueError(
            f"range-join block expands to {total} candidates; raise "
            "num_partitions to split the key space")
    a_rep = np.repeat(np.arange(len(a), dtype=np.int32), cnt)
    # (lo - running_base) is bounded by +-total < 2^31, so the int32 cast
    # happens BEFORE the repeat and the full-size temp stays 4 B/elem
    cand = np.repeat((lo - (np.cumsum(cnt) - cnt)).astype(np.int32),
                     cnt) + np.arange(total, dtype=np.int32)
    ai = a[a_rep].astype(np.int32)
    bi = b_sorted[cand].astype(np.int32)
    ok = (s[bi] < e[ai]) & (s[ai] < e[bi])
    return ai, bi, ok


def _block_pairs(batch: pa.Table, key: str, start: str, end: str):
    """Vectorized sweep over one co-located block -> (a_idx, b_idx)
    original-row index pairs of overlapping A/B intervals (same key)."""
    sw = _sweep(batch, key, start, end)
    if sw is None or sw[3].sum() == 0:
        return (np.empty(0, np.int64),) * 2
    a, b_sorted, lo, cnt, s, e, _ = sw
    ai, bi, ok = _expand(a, b_sorted, lo, cnt, s, e)
    return ai[ok].astype(np.int64), bi[ok].astype(np.int64)


def range_join_pairs(a_ds, b_ds, *, key: str, start: str = "start",
                     end: str = "end", a_id: str, b_id: str,
                     num_partitions: int | None = None):
    """Overlapping (key, a_id, b_id, overlap) pairs — the enumerating
    variant; prefer the fused stats when only aggregates are needed."""
    def _rename(batch: pa.Table) -> pa.Table:
        # harmonize the id column name (Ray 2.49's Dataset.rename_columns
        # breaks on pandas-block datasets)
        return batch.rename_columns(
            [a_id if n == b_id else n for n in batch.column_names])

    grouped = _tagged_union(a_ds.select_columns([key, start, end, a_id]),
                            b_ds.select_columns([key, start, end, b_id])
                            .map_batches(_rename, batch_format="pyarrow"),
                            key, start, end, a_id, num_partitions)

    def enumerate_block(batch: pa.Table) -> pa.Table:
        ai, bi = _block_pairs(batch, key, start, end)
        k = batch.column(key).take(pa.array(ai, type=pa.int64()))
        s = batch.column(start).to_numpy(zero_copy_only=False)
        e = batch.column(end).to_numpy(zero_copy_only=False)
        ids = batch.column(a_id).to_numpy(zero_copy_only=False)
        overlap = (np.minimum(e[ai], e[bi])
                   - np.maximum(s[ai], s[bi])) if len(ai) else \
            np.empty(0, np.int64)
        return pa.table({
            key: k,
            a_id: pa.array(ids[ai] if len(ai) else [], pa.int64()),
            b_id: pa.array(ids[bi] if len(bi) else [], pa.int64()),
            "overlap": pa.array(overlap, pa.int64()),
        })

    return grouped.map_batches(enumerate_block, batch_size=None,
                               batch_format="pyarrow")


def range_join_overlap_stats(a_ds, b_ds, *, key: str, start: str = "start",
                             end: str = "end",
                             num_partitions: int | None = None
                             ) -> pd.DataFrame:
    """Per-key (n_pairs, overlap_sum) of the A-x-B overlap join, with the
    pair enumeration REDUCED INSIDE each task."""
    from ray.data.aggregate import Sum

    grouped = _tagged_union(a_ds.select_columns([key, start, end]),
                            b_ds.select_columns([key, start, end]),
                            key, start, end, None, num_partitions)

    def partials(batch: pa.Table) -> pa.Table:
        key_type = batch.schema.field(key).type if key in \
            batch.column_names else pa.string()
        schema = pa.schema([(key, key_type), ("n", pa.int64()),
                            ("ov", pa.int64())])
        sw = _sweep(batch, key, start, end)
        if sw is None or sw[3].sum() == 0:
            return schema.empty_table()
        a, b_sorted, lo, cnt, s, e, k = sw
        ai, bi, ok = _expand(a, b_sorted, lo, cnt, s, e)
        # fold candidates -> per-A-ROW partials first (one cumsum-diff
        # per quantity over the candidate stream, which is grouped by A
        # row), THEN per-key over the much smaller A set — no
        # per-candidate key gather, no factorize/add.at on the pair set
        ov_c = (np.minimum(e[bi], e[ai])
                - np.maximum(s[bi], s[ai])) * ok
        ends = np.cumsum(cnt)
        cs_n = np.concatenate(([0], np.cumsum(ok)))
        cs_o = np.concatenate(([0], np.cumsum(ov_c)))
        n_row = cs_n[ends] - cs_n[ends - cnt]
        ov_row = cs_o[ends] - cs_o[ends - cnt]
        codes, uniques = pd.factorize(k[a])
        n = np.bincount(codes, weights=n_row).astype(np.int64)
        ov = np.bincount(codes, weights=ov_row).astype(np.int64)
        return pa.table({key: pa.array(uniques).cast(key_type),
                         "n": pa.array(n, pa.int64()),
                         "ov": pa.array(ov, pa.int64())})

    df = grouped.map_batches(partials, batch_size=None,
                             batch_format="pyarrow") \
        .groupby(key).aggregate(Sum("n", alias_name="n_pairs"),
                                Sum("ov", alias_name="overlap_sum")) \
        .to_pandas()
    df["n_pairs"] = df["n_pairs"].astype("int64")
    df["overlap_sum"] = df["overlap_sum"].astype("int64")
    return df.sort_values(key).reset_index(drop=True)
