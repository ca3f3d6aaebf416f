"""Deterministic weighted mixture sampling — the data-mixing step of a
training pipeline (down-weight crawl dumps, keep curated sources whole).

Selection is a pure function of the row id: keep a row iff
``(id * KNUTH + seed) mod 2^31  <  weight * 2^31``.  That makes the
sample (a) exactly reproducible across runs/partitionings, (b) a
shuffle-free stateless filter that composes with read pruning, and
(c) SQL-expressible, so the driver oracle re-derives the selected set
EXACTLY (not statistically) — the same multiplicative-hash idea as
Knuth's 2654435761 scheme.

A row's fate never depends on which batch or block it lands in, so the
operator streams at any scale with zero coordination.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = 2654435761
MOD = np.int64(1) << np.int64(31)


def mixture_mask(ids: np.ndarray, weights: np.ndarray,
                 seed: int = 0) -> np.ndarray:
    """Vectorized keep-mask: hash(id) in [0, 2^31) compared to the row's
    weight threshold.  Exact int64 arithmetic (no float hash)."""
    # reduce with BITAND, not %: numpy % floors while SQL % truncates
    # toward zero, so negative ids would diverge; & (2^31-1) has identical
    # two's-complement semantics in both engines and also caps the
    # multiply at 2^62 (DuckDB errors on int64 overflow).  The outer %
    # then operates on a non-negative value, matching everywhere.
    h = (((ids.astype(np.int64) & (MOD - np.int64(1)))
          * np.int64(KNUTH) + np.int64(seed)) % MOD)
    thresholds = np.minimum(
        (weights * float(MOD)).astype(np.int64), MOD)
    return h < thresholds


def sample_mixture(ds, weights: dict[str, float], *,
                   id_col: str = "doc_id", key_col: str = "source",
                   seed: int = 0, default_weight: float = 1.0):
    """Filter a Dataset to the deterministic weighted sample.

    ``weights`` maps key values (e.g. source names) to keep-fractions in
    [0, 1]; unlisted keys keep ``default_weight`` of their rows."""

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        w = np.fromiter((weights.get(k, default_weight) for k in keys),
                        dtype=np.float64, count=len(keys))
        return batch.filter(pa.array(mixture_mask(ids, w, seed)))

    return ds.map_batches(fn, batch_format="pyarrow")


def mixture_sql_predicate(weights: dict[str, float], *,
                          id_col: str = "doc_id", key_col: str = "source",
                          seed: int = 0,
                          default_weight: float = 1.0) -> str:
    """The exact SQL equivalent of :func:`sample_mixture`'s keep rule —
    used by the driver oracle so Ray and DuckDB select identical rows."""
    default = min(int(default_weight * (1 << 31)), 1 << 31)
    if weights:
        thresh = " ".join(
            f"WHEN '{k}' THEN {min(int(w * (1 << 31)), 1 << 31)}"
            for k, w in sorted(weights.items()))
        threshold_sql = f"(CASE {key_col} {thresh} ELSE {default} END)"
    else:       # CASE with no WHEN arm is invalid SQL
        threshold_sql = str(default)
    return (f"((({id_col} & {(1 << 31) - 1}) * {KNUTH} + {seed})"
            f" % {1 << 31}) < {threshold_sql}")
