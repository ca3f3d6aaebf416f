"""Skew-aware inner join: sampled hot-key detection, then cold keys
through the native hash join and hot keys through a broadcast map-join
or a salted replicate join.

A hash join's exchange sends every row of a key to ONE partition; a hot
key (power-law join keys are the norm in web-scale tables) turns that
partition into the straggler that sets the whole stage's wall time.
The classic fixes, both here:

- **broadcast-hot**: when the hot keys' RIGHT rows are small, ship them
  once (``ray.put``) and map-join the hot LEFT rows in place — the hot
  keys never enter an exchange at all;
- **salted**: otherwise append ``salt = arange % S`` to hot left rows,
  replicate each hot right row S times (one per salt), and run the
  native join on ``(key, salt)`` — the hot key's rows now spread over S
  partitions.  Any salt assignment is correct for an inner join; only
  uniformity matters.

Detection is sampled (per-block key-count partials over a stride
sample, combined on the driver) — a full exact count would itself be a
key-shuffle.  Misclassification is SAFE either way: a missed hot key
just rides the native join (slow, correct), a false positive pays one
extra broadcast row.  The split is one broadcast-membership filter per
side; results are the exact multiset union of the two paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: right-side hot rows above this take the salted path, below it the
#: broadcast map-join (same kind of size guard as dupspan's rewrite)
BROADCAST_MAX_BYTES = 256 << 20
SALT_FANOUT = 16


#: driver-side accumulator bound for the heavy-hitter fold; eviction
#: keeps the top CAPACITY keys by accumulated count (space-saving)
SAMPLE_CAPACITY = 1 << 16
#: per-block partial bound: a globally hot key is by definition frequent
#: in most blocks, so it survives a per-block top-K cut
SAMPLE_BLOCK_TOPK = 4096


def _sample_key_counts(ds, key: str, stride: int):
    """(key, estimated count) frame: per-block stride-sampled top-K count
    partials, folded on the DRIVER with space-saving eviction — no hash
    exchange.  A groupby here would pay the full aggregate actor-pool
    exchange constant twice per join just to find heavy hitters; instead
    each block ships at most SAMPLE_BLOCK_TOPK (key, count) rows and the
    driver keeps at most SAMPLE_CAPACITY accumulated keys, evicting the
    smallest (Misra-Gries/space-saving style), so driver memory is
    bounded regardless of input size.  Approximation errors are SAFE by
    the module-docstring argument: an undercount can only MISS a hot key
    (it rides the native join, slow but correct) and an overcount only
    adds a key to the broadcast set (one extra small row shipped)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)[::stride]
        uniq, cnt = np.unique(k, return_counts=True)
        if len(uniq) > SAMPLE_BLOCK_TOPK:
            top = np.argpartition(cnt, -SAMPLE_BLOCK_TOPK)[
                -SAMPLE_BLOCK_TOPK:]
            uniq, cnt = uniq[top], cnt[top]
        return pa.table({"k": pa.array(uniq),
                         "c": pa.array(cnt * stride, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    frames: list = []
    total = 0
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        if not b.num_rows:
            continue
        frames.append(pd.DataFrame({
            "k": b.column("k").to_numpy(zero_copy_only=False),
            "c": b.column("c").to_numpy(zero_copy_only=False)}))
        total += b.num_rows
        if total > 4 * SAMPLE_CAPACITY:
            m = pd.concat(frames).groupby("k", sort=False)["c"].sum() \
                .reset_index()
            if len(m) > SAMPLE_CAPACITY:
                m = m.nlargest(SAMPLE_CAPACITY, "c")
            frames, total = [m], len(m)
    if not frames:
        return pd.DataFrame({"k": pd.Series(dtype=object),
                             "c": pd.Series(dtype="int64")})
    return pd.concat(frames).groupby("k", sort=False)["c"].sum() \
        .reset_index()


def sample_hot_keys(ds, key: str, *, threshold: int,
                    stride: int = 64) -> np.ndarray:
    """Keys whose ESTIMATED count (stride-sampled) >= threshold."""
    est = _sample_key_counts(ds, key, stride)
    return est.loc[est["c"] >= threshold, "k"].to_numpy()


# per-WORKER-PROCESS broadcast cache: skew_join runs four split stages
# plus the native join's aggregator actors CONCURRENTLY, so actor pools
# here (one reserved CPU per actor for the stage lifetime) deadlock the
# streaming executor on small hosts — measured: the 4-pool variant hangs
# at num_cpus=4.  Stateless tasks + a process-level memo give the same
# fetch-once-per-worker semantics without reserving anything.
_BCAST_CACHE: dict = {}


def _cached_get(ref):
    val = _BCAST_CACHE.get(ref)
    if val is None:
        import ray

        val = ray.get(ref)
        # a join holds two broadcasts (hot keys + hot right table); keep
        # both, evict older joins' entries
        while len(_BCAST_CACHE) >= 2:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[ref] = val
    return val


def _split(ds, key: str, hot_ref):
    """(hot rows, cold rows) by broadcast membership — one filter pass,
    no shuffle; the hot-key set is fetched once per worker process."""
    import functools

    def part(batch: pa.Table, want_hot: bool) -> pa.Table:
        hot = _cached_get(hot_ref)
        k = batch.column(key).to_numpy(zero_copy_only=False)
        m = np.isin(k, hot)
        return batch.filter(pa.array(m if want_hot else ~m))

    return (ds.map_batches(functools.partial(part, want_hot=True),
                           batch_format="pyarrow"),
            ds.map_batches(functools.partial(part, want_hot=False),
                           batch_format="pyarrow"))


def _broadcast_join_hot(left_hot, right_hot_tbl: pa.Table,
                        left_key: str, right_key: str):
    """Map-join hot left rows against the broadcast right rows: one
    searchsorted + repeat-gather per batch, no exchange.  The broadcast
    table is fetched once per worker process (_cached_get) — stateless
    tasks, because this stage runs concurrently with the cold-path
    join's aggregator actors (see _BCAST_CACHE note)."""
    import ray

    order = np.argsort(right_hot_tbl.column(right_key)
                       .to_numpy(zero_copy_only=False), kind="mergesort")
    right_sorted = right_hot_tbl.take(pa.array(order))
    right_ref = ray.put(right_sorted)

    def join_batch(batch: pa.Table) -> pa.Table:
        right = _cached_get(right_ref)
        rk = right.column(right_key).to_numpy(zero_copy_only=False)
        lk = batch.column(left_key).to_numpy(zero_copy_only=False)
        lo = np.searchsorted(rk, lk, side="left")
        hi = np.searchsorted(rk, lk, side="right")
        cnt = hi - lo
        l_idx = np.repeat(np.arange(len(batch), dtype=np.int64), cnt)
        r_idx = (np.arange(int(cnt.sum()), dtype=np.int64)
                 - np.repeat(np.concatenate(([0], np.cumsum(cnt[:-1])))
                             if len(cnt) else np.empty(0, np.int64), cnt)
                 + np.repeat(lo, cnt))
        out = batch.take(pa.array(l_idx))
        rtaken = right.take(pa.array(r_idx))
        for name in rtaken.schema.names:
            if name != right_key:
                out = out.append_column(name, rtaken.column(name))
        return out

    return left_hot.map_batches(join_batch, batch_format="pyarrow")


def _salted_join_hot(left_hot, right_hot, left_key: str, right_key: str,
                     num_partitions: int):
    """Salt hot left rows over SALT_FANOUT partitions and replicate hot
    right rows once per salt; native join on (key, salt)."""
    def salt_left(batch: pa.Table) -> pa.Table:
        return batch.append_column("__salt", pa.array(
            np.arange(len(batch), dtype=np.int64) % SALT_FANOUT))

    def replicate_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        idx = np.repeat(np.arange(n, dtype=np.int64), SALT_FANOUT)
        out = batch.take(pa.array(idx))
        return out.append_column("__rsalt", pa.array(
            np.tile(np.arange(SALT_FANOUT, dtype=np.int64), n)))

    lh = left_hot.map_batches(salt_left, batch_format="pyarrow")
    rh = right_hot.map_batches(replicate_right, batch_format="pyarrow")
    joined = lh.join(rh, "inner", num_partitions,
                     on=(left_key, "__salt"),
                     right_on=(right_key, "__rsalt"))
    # the native join keeps only the LEFT join keys; __rsalt is gone
    return joined.drop_columns(["__salt"])


def skew_join(left, right, *, left_key: str, right_key: str,
              hot_threshold: int = 10_000, stride: int = 64,
              force_path: str | None = None):
    """Inner join ``left`` x ``right`` on ``left_key == right_key``,
    skew-split as module docstring describes.  Returns the joined
    Dataset (cold-path native join unioned with the hot-path join);
    output columns = left columns + right columns minus ``right_key``.

    ``force_path`` ('broadcast' | 'salted') pins the hot mechanism for
    tests; default picks by the hot right rows' byte size.
    """
    import ray

    from tokrle.functions.dedup import (_combined_size_hint,
                                        _join_partitions)

    # align column order before the final union (join output orders can
    # differ).  Derive the list from the INPUT schemas — calling
    # cold.schema() would execute the cold join once just to learn
    # column names, then the consumer re-executes it (measured: +2.6 s
    # per query at sf0.1).  The derivation assumes the native join
    # output is exactly left columns + right columns minus right_key,
    # which requires disjoint non-key names (Ray would suffix
    # duplicates and the select below would fail late and obscurely) —
    # validate up front instead, on every path.
    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    overlap = (set(left_cols) & set(right_cols)) - {right_key}
    if overlap:
        raise ValueError(
            f"skew_join requires disjoint non-key column names; "
            f"rename overlapping columns {sorted(overlap)} first")
    cols = left_cols + [c for c in right_cols if c != right_key]
    hot = sample_hot_keys(left, left_key, threshold=hot_threshold,
                          stride=stride)
    n = _join_partitions(None,
                         size_bytes=_combined_size_hint(left, right))
    if len(hot) == 0:
        return left.join(right, "inner", n,
                         on=(left_key,), right_on=(right_key,))
    hot_ref = ray.put(hot)
    left_hot, left_cold = _split(left, left_key, hot_ref)
    right_hot, right_cold = _split(right, right_key, hot_ref)
    cold = left_cold.join(right_cold, "inner", n,
                          on=(left_key,), right_on=(right_key,))
    if force_path == "salted":
        hot_joined = _salted_join_hot(left_hot, right_hot,
                                      left_key, right_key, n)
        return cold.select_columns(cols).union(
            hot_joined.select_columns(cols))
    # Single-pass path choice (r4 verdict item 6): instead of a sampled
    # right-side key-count pass plus a limit() bytes/row probe just to
    # PREDICT the hot right size, stream right_hot's blocks directly
    # under the hard byte cap.  iter_internal_ref_bundles() consumes
    # with backpressure, so breaking out on cap overflow stops the
    # upstream instead of running it to completion; within the cap the
    # materialized tables ARE the broadcast payload — no estimate, no
    # second right-side execution, and the cap is exact rather than
    # sampled.
    tables, total, over = [], 0, False
    for bundle in right_hot.iter_internal_ref_bundles():
        for r in bundle.block_refs:
            t = ray.get(r)
            if not isinstance(t, pa.Table):  # pandas block upstream
                t = pa.Table.from_pandas(t)
            if len(t):
                tables.append(t)
                total += t.nbytes
        if total > BROADCAST_MAX_BYTES and force_path != "broadcast":
            over = True
            break
    if over:
        hot_joined = _salted_join_hot(left_hot, right_hot,
                                      left_key, right_key, n)
    elif not tables:
        # no hot right rows: the hot-left rows have no match
        return cold
    else:
        hot_joined = _broadcast_join_hot(
            left_hot, pa.concat_tables(tables), left_key, right_key)
    return cold.select_columns(cols).union(hot_joined.select_columns(cols))
