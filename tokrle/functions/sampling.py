"""Deterministic stratified sampling: keep the ``k`` rows per key with
the smallest multiplicative-hash rank (Knuth hash on the row id, ties
on the id) — exact per-group quotas without a random state, exactly
reproducible across runs and partitionings, and SQL-expressible so the
oracle re-derives the IDENTICAL row set (a ``row_number() OVER
(PARTITION BY key ORDER BY hash, id) <= k`` in DuckDB).

Scale shape: a map stage first reduces every batch to its own top-k per
key (each batch forwards at most k × keys_in_batch rows), then ONE hash
exchange co-locates keys and the same kernel finalizes per block —
payload rows beyond the local quota never enter the exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tokrle.functions.mixture import KNUTH, MOD


def sample_rank(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """The Knuth-hash rank shared with the SQL oracle (bitand reduction,
    see mixture.mixture_mask for the negative-id rationale)."""
    return (((ids.astype(np.int64) & (MOD - np.int64(1)))
             * np.int64(KNUTH) + np.int64(seed)) % MOD)


def rank_sql_expr(id_col: str = "doc_id", *, seed: int = 0) -> str:
    return (f"((({id_col} & {(1 << 31) - 1}) * {KNUTH} + {seed})"
            f" % {1 << 31})")


def _topk_by_rank(batch: pa.Table, rank: np.ndarray, *, key: str,
                  k: int, id_col: str) -> pa.Table:
    """Keep each key's k smallest (rank, id) rows — ONE factorize +
    lexsort, rank-within-group via a repeated-group-start subtraction.
    The shared kernel behind both the hash-rank and score-rank top-k
    (ties broken by ascending id, so the row set is total-ordered and
    SQL-reproducible)."""
    import pandas as pd

    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    keys = batch.column(key).to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(keys)
    order = np.lexsort((ids, rank, codes))
    c = codes[order]
    starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
    group_sizes = np.diff(np.concatenate((starts, [len(c)])))
    pos_in_group = (np.arange(len(c), dtype=np.int64)
                    - np.repeat(starts, group_sizes))
    keep = order[pos_in_group < k]
    return batch.take(pa.array(np.sort(keep), type=pa.int64()))


def _topk_kernel(batch: pa.Table, *, key: str, k: int, id_col: str,
                 seed: int) -> pa.Table:
    if len(batch) == 0:
        return batch
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return _topk_by_rank(batch, sample_rank(ids, seed),
                         key=key, k=k, id_col=id_col)


def _topk_score_kernel(batch: pa.Table, *, key: str, k: int,
                       score_col: str, id_col: str,
                       descending: bool) -> pa.Table:
    if len(batch) == 0:
        return batch
    s = batch.column(score_col).to_numpy(zero_copy_only=False)
    if descending:
        s = -s.astype(np.int64) if s.dtype.kind in "iu" else -s
    return _topk_by_rank(batch, s, key=key, k=k, id_col=id_col)


def top_k_by_score(ds, *, key: str = "source", score_col: str,
                   k: int = 10, id_col: str = "doc_id",
                   descending: bool = True,
                   num_partitions: int | None = None):
    """Curriculum-style selection: the k best rows per key by a score
    column (exact, deterministic — ties on ascending id).  Same scale
    shape as :func:`stratified_sample`: a map stage prunes every batch
    to its local top-k per key, ONE hash exchange co-locates keys, and
    the same kernel finalizes per block — rows beyond the local quota
    never enter the exchange, so the shuffle volume is bounded by
    k x keys x blocks regardless of input size."""
    from tokrle.functions.dedup import _group_blocks

    kw = {"key": key, "k": k, "score_col": score_col, "id_col": id_col,
          "descending": descending}
    pruned = ds.map_batches(lambda b: _topk_score_kernel(b, **kw),
                            batch_format="pyarrow")
    grouped = _group_blocks(pruned, keys=[key],
                            num_partitions=num_partitions)
    return grouped.map_batches(lambda b: _topk_score_kernel(b, **kw),
                               batch_size=None, batch_format="pyarrow")


def stratified_sample(ds, *, key: str = "source", k: int = 10,
                      id_col: str = "doc_id", seed: int = 0,
                      num_partitions: int | None = None):
    """Exactly k rows per key (fewer when the key has < k rows),
    deterministically chosen by hash rank."""
    from tokrle.functions.dedup import _group_blocks

    kw = {"key": key, "k": k, "id_col": id_col, "seed": seed}
    pruned = ds.map_batches(lambda b: _topk_kernel(b, **kw),
                            batch_format="pyarrow")
    grouped = _group_blocks(pruned, keys=[key],
                            num_partitions=num_partitions)
    return grouped.map_batches(lambda b: _topk_kernel(b, **kw),
                               batch_size=None, batch_format="pyarrow")
