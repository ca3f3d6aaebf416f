"""ROLLUP / grouping-sets aggregation with one data-scale shuffle.

``GROUP BY ROLLUP(k1, .., kn)`` over a 100-TB table must NOT shuffle the
data once per level: only the FINEST level touches the input (Ray's
hash aggregate already computes per-block partials, so the exchange
carries (key-combo, partial) rows); every coarser level re-aggregates
the previous LEVEL's aggregate rows — a dataset whose size is the
distinct-key-combo count, not the row count.  SUM/COUNT/MIN/MAX are
re-aggregable exactly (COUNT folds as a SUM of counts), which is why
this decomposition is lossless.

Rolled-up key columns are filled with the sentinel ``'ALL'`` (not NULL)
so the result hash-compares bit-for-bit with a
``coalesce(col, 'ALL') .. GROUP BY ROLLUP(..)`` SQL oracle across
engines with different null orderings.
"""

from __future__ import annotations

import pandas as pd

ALL = "ALL"


def _validate_keys(df: pd.DataFrame, keys: list[str],
                   sentinel: str) -> None:
    """Key columns must be string-typed and free of the sentinel value:
    a non-string key would make the sentinel assignment produce a mixed
    int/str column (sort_values TypeError), and a legitimate key equal to
    the sentinel would silently merge with the rolled-up rows.  Validated
    on the FINEST aggregate frame (every level's key values derive from
    it), so the check is aggregate-sized, never input-sized."""
    for k in keys:
        col = df[k]
        if len(col) and not all(isinstance(v, str) for v in col):
            raise TypeError(
                f"rollup key {k!r} must be string-typed (cast it or use "
                f"NULL-safe keys); got {col.map(type).unique()!r}")
        if (col == sentinel).any():
            raise ValueError(
                f"rollup key {k!r} contains the sentinel {sentinel!r}; "
                f"pass a different `sentinel=` to avoid merging real "
                f"rows into the rolled-up level")


def rollup_aggregate(ds, keys: list[str], sum_cols: list[str],
                     count_alias: str = "n",
                     sentinel: str = ALL) -> pd.DataFrame:
    """Distributed ROLLUP over ``keys``: exact COUNT(*) plus SUM of each
    ``sum_cols`` (pre-cast integer columns) at every rollup level.

    Returns the concatenated levels as pandas (aggregate rows only — the
    driver never sees input rows); rolled-up keys read ``sentinel``
    (default ``'ALL'``; keys are validated against collisions).
    """
    from ray.data.aggregate import Sum

    finest = ds.groupby(keys).aggregate(
        Sum("__one", alias_name=count_alias),
        *[Sum(c, alias_name=f"sum_{c}") for c in sum_cols])
    vals = [count_alias] + [f"sum_{c}" for c in sum_cols]
    out: list[pd.DataFrame] = []
    level = finest
    df = level.to_pandas()
    _validate_keys(df, keys, sentinel)
    out.append(df.copy())
    # coarser levels: re-aggregate the AGGREGATE dataset (sum of sums /
    # sum of counts); each is a distributed groupby over aggregate rows
    for i in range(len(keys) - 1, 0, -1):
        sub = keys[:i]
        level = level.groupby(sub).aggregate(
            *[Sum(v, alias_name=v) for v in vals])
        df = level.to_pandas()
        for k in keys[i:]:
            df[k] = sentinel
        out.append(df[keys + vals])
    # grand total from the finest pandas frame (exact integer sums)
    total = {k: [sentinel] for k in keys}
    for v in vals:
        total[v] = [int(out[0][v].sum())]
    out.append(pd.DataFrame(total))
    res = pd.concat([d[keys + vals] for d in out], ignore_index=True)
    for v in vals:
        res[v] = res[v].astype("int64")
    return res.sort_values(keys + vals).reset_index(drop=True)


def with_ones(ds):
    """Append the ``__one`` counting column (COUNT(*) as a re-aggregable
    SUM) as a zero-copy Arrow transform."""
    import numpy as np
    import pyarrow as pa

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__one", pa.array(np.ones(len(batch), dtype=np.int64)))

    return ds.map_batches(add, batch_format="pyarrow")


def grouping_sets_aggregate(ds, keys: list[str], sets: list[list[str]],
                            sum_cols: list[str],
                            count_alias: str = "n",
                            sentinel: str = ALL) -> pd.DataFrame:
    """Distributed GROUPING SETS: exact COUNT(*) + SUMs at every requested
    subset of ``keys``, with ONE input-scale shuffle.

    The finest level (the full key tuple) aggregates the input once and
    is materialized (aggregate-sized: distinct-combo count, not row
    count); every requested set then re-aggregates that AGGREGATE
    dataset with its own small distributed groupby — sums of sums and
    sums of counts are exact, so the decomposition is lossless.  A set
    that is not a subset of ``keys`` is rejected (it could not be
    derived without a second input pass).  Absent keys read ``'ALL'``.
    """
    from ray.data.aggregate import Sum

    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} not derivable from {keys}")
    vals = [count_alias] + [f"sum_{c}" for c in sum_cols]
    finest = ds.groupby(keys).aggregate(
        Sum("__one", alias_name=count_alias),
        *[Sum(c, alias_name=f"sum_{c}") for c in sum_cols]).materialize()
    fdf = finest.to_pandas()   # aggregate-sized
    _validate_keys(fdf, keys, sentinel)
    out: list[pd.DataFrame] = []
    for s in sets:
        s = list(s)
        if s == list(keys):
            df = fdf.copy()
        elif s:
            df = finest.groupby(s).aggregate(
                *[Sum(v, alias_name=v) for v in vals]).to_pandas()
        else:
            df = pd.DataFrame({v: [int(fdf[v].sum())] for v in vals})
        for k in keys:
            if k not in s:
                df[k] = sentinel
        out.append(df[keys + vals])
    res = pd.concat(out, ignore_index=True)
    for v in vals:
        res[v] = res[v].astype("int64")
    return res.sort_values(keys + vals).reset_index(drop=True)


def cube_aggregate(ds, keys: list[str], sum_cols: list[str],
                   count_alias: str = "n",
                   sentinel: str = ALL) -> pd.DataFrame:
    """Distributed GROUP BY CUBE: every subset of ``keys`` (2^n grouping
    sets), derived from one input-scale shuffle via
    :func:`grouping_sets_aggregate`."""
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_aggregate(ds, keys, sets, sum_cols,
                                   count_alias=count_alias,
                                   sentinel=sentinel)
