"""Group-normalized filtering: compare each row against its GROUP's
aggregate without joining the aggregate back through an exchange.

``value > group_mean`` filters (per-source length outliers, per-domain
quality cuts) are two passes at scale: one distributed aggregate whose
result is one row PER GROUP (tiny), broadcast; then a shuffle-free
filter map.  The comparison is kept in exact integer form —
``value * n_group > sum_group`` instead of ``value > sum/n`` — so the
row set is bit-reproducible across engines (no float division).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def group_mean_filter(ds, key: str, value_col: str, *,
                      above: bool = True):
    """Rows whose integer ``value_col`` is strictly above (or, with
    ``above=False``, at/below) their ``key`` group's mean.  One
    distributed aggregate + one broadcast filter map; the input is never
    shuffled."""
    from ray.data.aggregate import Count, Sum

    stats = ds.groupby(key).aggregate(
        Count(alias_name="n_g"),
        Sum(value_col, alias_name="sum_g")).to_pandas()
    n_of = dict(zip(stats[key], stats["n_g"].astype(np.int64)))
    sum_of = dict(zip(stats[key], stats["sum_g"].astype(np.int64)))

    def keep(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_pandas()
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_g = k.map(n_of).to_numpy(dtype=np.int64)
        sum_g = k.map(sum_of).to_numpy(dtype=np.int64)
        m = v * n_g > sum_g
        return batch.filter(pa.array(m if above else ~m))

    return ds.map_batches(keep, batch_format="pyarrow")
