"""Exact distributed quantiles for bounded-domain integer columns.

The pre-aggregation pattern applied to order statistics: each batch emits
(key, value, count) histogram partials (vectorized), a small
``groupby(key, value)`` sums them, and a per-key pass reads the quantile
off the cumulative histogram.  The shuffle moves one row per distinct
(key, value) — never the observations — so exact p50/p99 over trillions
of rows is cheap whenever the value domain is bounded (doc lengths,
scores, token counts), with no sketch approximation needed.

Quantile definition matches DuckDB's ``quantile_disc``: the element at
1-based position ceil(q * n) of the sorted multiset — so results are
SQL-oracle comparable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def histogram_quantiles_by_key(ds, key_col: str, value_col: str,
                               qs: tuple[float, ...] = (0.5, 0.9)
                               ) -> pd.DataFrame:
    """Exact per-key quantiles of an integer column via histogram partials.

    Returns one row per key with a ``q{percent}`` column per requested
    quantile.
    """
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if len(vals) == 0:
            return pa.table({key_col: pa.array([], type=pa.string()),
                             value_col: pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        order = np.lexsort((vals, keys))
        k, v = keys[order], vals[order]
        bounds = np.ones(len(k), dtype=bool)
        bounds[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
        starts = np.flatnonzero(bounds)
        cnts = np.diff(starts, append=len(k))
        return pa.table({
            key_col: pa.array(k[starts].astype(str), type=pa.string()),
            value_col: pa.array(v[starts], type=pa.int64()),
            "cnt": pa.array(cnts, type=pa.int64()),
        })

    hist = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby([key_col, value_col]).aggregate(Sum("cnt", alias_name="n"))

    qcols = [f"q{int(q * 100)}" for q in qs]

    def block_quantiles(batch: pa.Table) -> pa.Table:
        """Hash-co-located block fold: every key's full histogram sits in
        this block; one (key, value) lexsort, then the quantile read-off
        per key in-process (histograms are tiny — one row per distinct
        value)."""
        if len(batch) == 0:
            return pa.schema([(key_col, pa.string())]
                             + [(c, pa.int64()) for c in qcols]) \
                .empty_table()
        from tokrle.functions._arrays import key_groups

        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        values = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        counts = batch.column("n").to_numpy(
            zero_copy_only=False).astype(np.int64)
        out: dict = {key_col: []}
        out.update({qc: [] for qc in qcols})
        for label, idx in key_groups(keys):
            o = np.argsort(values[idx], kind="stable")
            v = values[idx][o]
            cum = np.cumsum(counts[idx][o])
            total = int(cum[-1])
            out[key_col].append(str(label))
            for q, qc in zip(qs, qcols):
                pos = max(1, int(np.ceil(q * total)))   # 1-based rank
                out[qc].append(int(
                    v[np.searchsorted(cum, pos, side="left")]))
        return pa.table({key_col: pa.array(out[key_col], type=pa.string()),
                         **{qc: pa.array(out[qc], type=pa.int64())
                            for qc in qcols}})

    from tokrle.functions.dedup import _group_blocks

    out = _group_blocks(hist, [key_col]).map_batches(
        block_quantiles, batch_size=None, batch_format="pyarrow") \
        .to_pandas()
    return out.sort_values(key_col).reset_index(drop=True)
