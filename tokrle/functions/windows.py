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


def sessionize(ds, *, gap_seconds: int = 1800, user_col: str = "user_id",
               ts_col: str = "ts"):
    """Assign session ids per user: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``.  Returns the input rows plus
    ``session_id`` (f"{user}:{k}") and per-row session index."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort").copy()
        ts = g[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gaps = np.diff(ts, prepend=ts[0] if len(ts) else 0)
        new_session = gaps > gap_seconds * 1_000_000
        k = np.cumsum(new_session)
        g["session_idx"] = k
        g["session_id"] = [f"{u}:{i}" for u, i in zip(g[user_col], k)]
        return g

    return ds.groupby(user_col).map_groups(per_user, batch_format="pandas")


def session_stats(ds, *, gap_seconds: int = 1800, user_col: str = "user_id",
                  ts_col: str = "ts"):
    """Per-session aggregates: n_events, duration_us, sum(value)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gaps = np.diff(ts, prepend=ts[0] if len(ts) else 0)
        k = np.cumsum(gaps > gap_seconds * 1_000_000)
        val = g["value"].to_numpy(dtype=np.float64)
        rows = []
        for s in np.unique(k):
            m = k == s
            rows.append({
                "user_id": g[user_col].iloc[0],
                "session_idx": int(s),
                "n_events": int(m.sum()),
                "duration_us": int(ts[m].max() - ts[m].min()),
            })
        return pd.DataFrame(rows, columns=["user_id", "session_idx",
                                           "n_events", "duration_us"])

    return ds.groupby(user_col).map_groups(per_user, batch_format="pandas")
