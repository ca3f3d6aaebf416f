"""Deterministic epoch shuffle — the global data-ordering step of a
training pipeline (a new reproducible permutation of the corpus per
epoch/seed, independent of file layout or partition count).

The permutation key is a seeded two-round multiplicative hash of the row
id, so the order is (a) a pure function of (id, seed) — re-running on a
repartitioned or resumed input yields the identical sequence, (b) a
genuinely different permutation per seed (the seed perturbs the input
of the first multiply, not the output, so it does not just rotate the
order), and (c) exactly SQL-expressible, so the driver oracle re-derives
the full order — not a statistical property of it.

The shuffle itself is ``Dataset.sort`` on the key: Ray Data's
range-partitioned distributed sort, the same exchange a 100-TB epoch
materialization needs (sample boundaries -> partition -> per-partition
sort), with no driver-side materialization.  Ties (hash collisions) are
broken by the id, keeping the order total and deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = 2654435761          # Knuth multiplicative-hash constant
MIX2 = 2246822519           # xxhash PRIME32_2; h < 2^31 keeps h*MIX2 < 2^63
M31 = (1 << 31) - 1
MOD = 1 << 31
KEY_COL = "shuffle_key"


def epoch_hash(ids: np.ndarray, seed: int) -> np.ndarray:
    """Seeded permutation key in [0, 2^31): two multiplicative mixing
    rounds in exact int64 arithmetic (identical in NumPy and SQL —
    all intermediates stay below 2^63, and & masks avoid the
    numpy-floors-vs-SQL-truncates negative-modulo divergence)."""
    h = ((ids.astype(np.int64) & np.int64(M31)) + np.int64(seed)) & np.int64(M31)
    h = (h * np.int64(KNUTH)) % np.int64(MOD)
    return (h * np.int64(MIX2)) % np.int64(MOD)


def epoch_hash_sql(id_col: str, seed: int) -> str:
    """The exact SQL equivalent of :func:`epoch_hash`."""
    return (f"(((({id_col} & {M31}) + {seed}) & {M31})"
            f" * {KNUTH} % {MOD}) * {MIX2} % {MOD}")


def shuffle_epoch(ds, *, seed: int = 0, id_col: str = "doc_id"):
    """Return ``ds`` in the seed's global shuffle order, with the
    permutation key attached as ``shuffle_key``.

    One vectorized key pass + one distributed range-partition sort; the
    output streams in order (consume with ``iter_batches`` /
    ``write_parquet`` — blocks arrive sorted, never collected on the
    driver)."""

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            KEY_COL, pa.array(epoch_hash(ids, seed), type=pa.int64()))

    return ds.map_batches(add_key, batch_format="pyarrow") \
             .sort([KEY_COL, id_col])
