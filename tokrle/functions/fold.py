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


def fold_sum_partials(ds, keys: list[str], cols: list[str],
                      min_cols: tuple = (),
                      max_cols: tuple = ()) -> pd.DataFrame:
    """Fold a dataset of per-block PARTIAL rows (already shrunk to at
    most one row per key per block) into one row per key: ``cols`` are
    summed, ``min_cols``/``max_cols`` take the extremum.  Streams blocks
    to the driver; never more than ``_FOLD_EVERY`` buffered rows plus
    one row per distinct key."""
    spec = {**{c: "sum" for c in cols},
            **{c: "min" for c in min_cols},
            **{c: "max" for c in max_cols}}
    sel = keys + list(spec)

    def fold(fs: list[pd.DataFrame]) -> pd.DataFrame:
        # dropna=False: a null key is a group, matching the Ray groupby
        # exchange this fold replaces
        return pd.concat(fs).groupby(keys, sort=False, dropna=False) \
            .agg(spec).reset_index()

    frames: list[pd.DataFrame] = []
    total = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if not b.num_rows:
            continue
        frames.append(b.select(sel).to_pandas())
        total += b.num_rows
        if total > _FOLD_EVERY:
            m = fold(frames)
            frames, total = [m], len(m)
    if not frames:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in sel})
    out = fold(frames)
    for c in spec:
        if pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
    return out


def source_sums(ds, key: str, sum_cols: list[str],
                count_alias: str | None = None,
                min_cols: tuple = (),
                max_cols: tuple = ()) -> pd.DataFrame:
    """Per-``key`` sums (plus optional row count and per-key extrema)
    over a dataset with one row per record: shrinks each batch to
    per-key partials with factorize + bincount / scatter-extremum
    (vectorized, at most ``cardinality`` rows out per batch), then
    driver-folds the partials.  Result columns:
    ``[key, *sum_cols, count_alias?, *min_cols, *max_cols]`` sorted by
    key."""
    cols = list(sum_cols)

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column(key).to_numpy(zero_copy_only=False)
        # use_na_sentinel=False: null keys get their own code (a group,
        # like the Ray groupby exchange), never -1 — which would make
        # bincount raise and scatter-extremum corrupt the last key
        codes, uniq = pd.factorize(src, use_na_sentinel=False)
        # from_pandas=True: the NaN a null key factorizes to becomes an
        # Arrow null instead of breaking string-array inference
        out: dict = {key: pa.array(uniq, from_pandas=True)}
        for c in cols:
            v = batch.column(c).to_numpy(zero_copy_only=False)
            if np.issubdtype(v.dtype, np.integer) or v.dtype == np.bool_:
                # float64 bincount is exact only while every per-key
                # partial sum stays under 2^53; gate on a conservative
                # bound (factor-2 margin absorbs the float cast of
                # extreme int64 values) and fall back to an exact int64
                # scatter-add otherwise
                vmax = float(np.abs(v.astype(np.float64)).max()) \
                    if len(v) else 0.0
                if vmax < float((1 << 52) // max(len(v), 1)):
                    out[c] = pa.array(
                        np.bincount(codes, weights=v.astype(np.float64),
                                    minlength=len(uniq))
                        .astype(np.int64))
                else:
                    acc = np.zeros(len(uniq), dtype=np.int64)
                    np.add.at(acc, codes,
                              v.astype(np.int64, copy=False))
                    out[c] = pa.array(acc)
            else:
                out[c] = pa.array(
                    np.bincount(codes, weights=v, minlength=len(uniq)))
        if count_alias is not None:
            out[count_alias] = pa.array(
                np.bincount(codes, minlength=len(uniq)).astype(np.int64))
        for c, fill, op in [(m, np.iinfo(np.int64).max, np.minimum)
                            for m in min_cols] + \
                           [(m, np.iinfo(np.int64).min, np.maximum)
                            for m in max_cols]:
            v = batch.column(c).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            acc = np.full(len(uniq), fill, dtype=np.int64)
            op.at(acc, codes, v)
            out[c] = pa.array(acc)
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out_cols = cols + ([count_alias] if count_alias else [])
    res = fold_sum_partials(parts, [key], out_cols,
                            min_cols=min_cols, max_cols=max_cols)
    return res.sort_values(key).reset_index(drop=True)
