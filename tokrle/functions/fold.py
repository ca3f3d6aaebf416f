"""Driver-side folds for TINY-cardinality grouped aggregates.

A ``ds.groupby(k).aggregate(...)`` pays the hash-exchange aggregator
pool — a multi-second fixed constant sized for ARBITRARY key
cardinality.  When the key cardinality is small and known-bounded (the
``source`` column: tens of values; language codes; codec names), the
right shape is the map-side combiner the Ray guide recommends: shrink
every block to at most ``cardinality`` partial rows inside
``map_batches``, then fold the partials.  At that point the fold input
is ``n_blocks x cardinality`` fixed-width rows — streaming them to the
driver with ``iter_batches`` and folding in pandas is equivalent to the
exchange, bounded (accumulator state = one row per key), and pays no
exchange constant.  At 100 TB / 1e5 blocks x 20 sources that is ~2M
tiny rows through the driver, folded incrementally — still trivially
safe.

NOT for unbounded-cardinality keys (doc ids, gram hashes): those need
the real exchange; use ``groupby`` there.

Scale rationale per the repo convention: no full-input materialization
(the partial shrink happens in the tasks; only key-bounded partials
reach the driver), vectorized partials (factorize + bincount), and the
incremental re-fold keeps driver memory at O(cardinality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: re-fold the accumulated partial frames whenever buffered rows exceed
#: this (keeps driver memory flat on long streams)
_FOLD_EVERY = 1 << 16


def fold_sum_partials(ds, keys: list[str], cols: list[str]) -> pd.DataFrame:
    """Fold a dataset of per-block PARTIAL rows (already shrunk to at
    most one row per key per block) into one summed row per key.
    Streams blocks to the driver; never more than ``_FOLD_EVERY``
    buffered rows plus one row per distinct key."""
    frames: list[pd.DataFrame] = []
    total = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if not b.num_rows:
            continue
        frames.append(b.select(keys + cols).to_pandas())
        total += b.num_rows
        if total > _FOLD_EVERY:
            m = pd.concat(frames).groupby(keys, sort=False)[cols].sum() \
                .reset_index()
            frames, total = [m], len(m)
    if not frames:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in keys + cols})
    out = pd.concat(frames).groupby(keys, sort=False)[cols].sum() \
        .reset_index()
    for c in cols:
        if pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out


def source_sums(ds, key: str, sum_cols: list[str],
                count_alias: str | None = None) -> pd.DataFrame:
    """Per-``key`` sums (and optionally a row count) over a dataset with
    one row per record: shrinks each batch to per-key partials with
    factorize + bincount (vectorized, at most ``cardinality`` rows out
    per batch), then driver-folds the partials.  Result columns:
    ``[key, *sum_cols, count_alias?]`` sorted by key."""
    cols = list(sum_cols)

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column(key).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(src)
        out: dict = {key: pa.array(uniq)}
        for c in cols:
            v = batch.column(c).to_numpy(zero_copy_only=False)
            out[c] = pa.array(
                np.bincount(codes, weights=v.astype(np.float64),
                            minlength=len(uniq)).astype(np.int64)
                if np.issubdtype(v.dtype, np.integer) or
                v.dtype == np.bool_
                else np.bincount(codes, weights=v, minlength=len(uniq)))
        if count_alias is not None:
            out[count_alias] = pa.array(
                np.bincount(codes, minlength=len(uniq)).astype(np.int64))
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out_cols = cols + ([count_alias] if count_alias else [])
    res = fold_sum_partials(parts, [key], out_cols)
    return res.sort_values(key).reset_index(drop=True)
