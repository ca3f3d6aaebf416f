"""Windowed / sessionized aggregates over event streams.

The reference has no streaming surface (SURVEY.md §2.9); these are the
"custom operator" layer the engine adds for training-data pipelines:
sessionization expressed as groupby(user) + per-group vectorized gap
detection — semantics a streaming engine would give for session windows,
computed batch-style over a Dataset (one shuffle on user_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _user_session_bounds(u: np.ndarray, ts_us: np.ndarray,
                         gap_seconds: int):
    """Session boundaries over a (user, ts)-sorted block covering MANY
    users at once: returns (new_user, new_sess) boolean masks.  One
    vectorized pass replaces a per-user Python call."""
    n = len(u)
    new_user = np.empty(n, dtype=bool)
    if n:
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
    gaps = np.diff(ts_us, prepend=ts_us[0] if n else 0)
    new_sess = new_user | (gaps > gap_seconds * 1_000_000)
    return new_user, new_sess


def sessionize(ds, *, gap_seconds: int = 1800, user_col: str = "user_id",
               ts_col: str = "ts"):
    """Assign session ids per user: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``.  Returns the input rows plus
    ``session_id`` (f"{user}:{k}") and per-row session index.

    Scale shape: hash-repartition by user (complete users per block), then
    ONE vectorized pass per block across all its users — no per-user
    Python call (a map_groups would pay ~1ms of call overhead per user;
    users number in the billions at 100 TB)."""
    from tokrle.functions.dedup import _group_blocks

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col], kind="mergesort")
        u = g[user_col].to_numpy()
        ts = g[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        new_user, new_sess = _user_session_bounds(u, ts, gap_seconds)
        c = np.cumsum(new_sess)                  # global session ordinal
        user_starts = np.flatnonzero(new_user)
        per_user_n = np.diff(np.append(user_starts, len(u)))
        base = np.repeat(c[user_starts], per_user_n)
        k = c - base                             # 0-based within user
        g = g.copy()
        g["session_idx"] = k
        g["session_id"] = (g[user_col].astype(str).to_numpy()
                           + np.char.add(":", k.astype(str)))
        return g

    return _group_blocks(ds, [user_col]).map_batches(
        per_block, batch_size=None, batch_format="pandas")


def sliding_window_assign(ds, *, window_seconds: int = 3600,
                          step_seconds: int = 900, ts_col: str = "ts",
                          keep_cols: tuple[str, ...] = ()):
    """Assign each event to every sliding window covering it: window ``w``
    spans [w*step, w*step + window); an event belongs to window/step
    consecutive windows.  Expansion happens vectorized inside map_batches
    (np.repeat — no per-row loop, no shuffle); aggregate downstream with a
    normal groupby."""
    import pyarrow as pa

    k = window_seconds // step_seconds

    def assign(batch: pa.Table) -> pa.Table:
        # normalize to microseconds first: a raw int64 cast of a
        # timestamp[ns] column would silently compute ns-scaled windows
        ts = batch.column(ts_col).cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        base = ts // (step_seconds * 1_000_000)
        win = (np.repeat(base, k)
               - np.tile(np.arange(k, dtype=np.int64), len(ts)))
        idx = np.repeat(np.arange(len(ts), dtype=np.int64), k)
        cols = {c: batch.column(c).take(pa.array(idx)) for c in keep_cols}
        cols["window_id"] = pa.array(win, type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")


def sliding_window_partial_agg(ds, *, window_seconds: int = 3600,
                               step_seconds: int = 900,
                               key_cols: tuple[str, ...] = ("event_type",),
                               id_col: str = "event_id", ts_col: str = "ts"):
    """Sliding-window count/min/max via STEP-LEVEL PARTIALS — the scale
    shape for large k = window/step.

    :func:`sliding_window_assign` expands every event k-fold before the
    shuffle; here each batch first combines its events into one partial row
    per (key, step) (a pandas C-level groupby — no Python loop), the
    shuffle then moves only those partials, a small groupby combines them
    per step, and only the combined STEP AGGREGATES are expanded k-fold
    into the windows they cover (step s lands in windows s-k+1..s) for a
    final tiny groupby.  Exchange volume drops from k x n_events rows to
    ~n_batches x keys x steps_per_batch partial rows.

    Works for any aggregate that decomposes over disjoint partitions
    (count/sum/min/max); windows with zero events produce no row, matching
    the event-expansion variant.
    """
    import pyarrow as pa
    from ray.data.aggregate import Max, Min, Sum

    k = window_seconds // step_seconds
    step_us = step_seconds * 1_000_000
    keys = list(key_cols)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        step = (df[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
                // step_us)
        g = df.assign(step=step).groupby(keys + ["step"], sort=False)[id_col] \
            .agg(n="count", mn="min", mx="max").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    steps = ds.map_batches(partials, batch_format="pandas") \
        .groupby(keys + ["step"]) \
        .aggregate(Sum("n", alias_name="n"), Min("mn", alias_name="mn"),
                   Max("mx", alias_name="mx"))

    def expand(batch: pa.Table) -> pa.Table:
        s = batch.column("step").to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(len(s), dtype=np.int64), k)
        win = np.repeat(s, k) - np.tile(np.arange(k, dtype=np.int64), len(s))
        cols = {c: batch.column(c).take(pa.array(idx))
                for c in keys + ["n", "mn", "mx"]}
        cols["window_id"] = pa.array(win, type=pa.int64())
        return pa.table(cols)

    return steps.map_batches(expand, batch_format="pyarrow") \
        .groupby(keys + ["window_id"]) \
        .aggregate(Sum("n", alias_name="n_events"),
                   Min("mn", alias_name="min_eid"),
                   Max("mx", alias_name="max_eid"))


def session_stats(ds, *, gap_seconds: int = 1800, user_col: str = "user_id",
                  ts_col: str = "ts"):
    """Per-session aggregates: n_events, duration_us.

    Fully vectorized across ALL users in a hash-co-located block: session
    boundaries come from the combined (user-change | gap) mask, counts
    from boundary differences, durations from first/last timestamps per
    contiguous segment — no per-user or per-session Python loop.
    """
    from tokrle.functions.dedup import _group_blocks

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([user_col, ts_col], kind="mergesort")
        u = g[user_col].to_numpy()
        ts = g[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        if len(ts) == 0:
            return pd.DataFrame(columns=["user_id", "session_idx",
                                         "n_events", "duration_us"])
        new_user, new_sess = _user_session_bounds(u, ts, gap_seconds)
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], len(ts))
        # session_idx: ordinal of the session within its user
        gidx = np.arange(len(starts))
        user_first = new_user[starts]
        base = np.maximum.accumulate(np.where(user_first, gidx, 0))
        return pd.DataFrame({
            "user_id": u[starts],
            "session_idx": (gidx - base).astype(np.int64),
            "n_events": (ends - starts).astype(np.int64),
            "duration_us": ts[ends - 1] - ts[starts],
        })

    return _group_blocks(ds, [user_col]).map_batches(
        per_block, batch_size=None, batch_format="pandas")
