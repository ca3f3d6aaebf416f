"""Corpus-trained token-frequency scoring — the train -> broadcast ->
score shape of model-based quality filtering (unigram LM / rarity
scoring: flag documents dominated by tokens that are rare corpus-wide).

Two streaming passes over the token table:

1. **Train**: per-batch ``np.bincount`` partials over the fixed-size
   vocab (one int64 vector per batch, NOT per token — the exchange moves
   ``O(batches * vocab)`` ints, never the tokens), summed into one count
   vector.  The model is a few hundred KB regardless of corpus size.
2. **Score**: the count vector is broadcast once via ``ray.put`` and every
   scoring task reads it from the object store (zero re-ship per batch);
   each document's count-sum is one gather + ``reduceat`` per batch.

All scoring arithmetic is exact int64 (the rarity rule compares
``RARITY_SCALE * sum_counts < n_tok * total_tokens`` — no division, no
floats), so a SQL oracle re-derives the flagged set EXACTLY.  The
negative-log-likelihood variant (:func:`score_nll`) keeps the classic
per-token ``-ln p`` form for consumers that want a perplexity-style
number; it is deliberately not part of the oracle contract (libm ln is
not bit-stable across engines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# tokens must fall in [0, VOCAB_BOUND); token = codepoint(first)*32 + len
# stays well under this for any BMP-leading word (0xFFFF*32+31 < 2^21)
VOCAB_BOUND = 1 << 21
# a doc is "rare" when its mean token frequency is below 1/RARITY_SCALE of
# uniform corpus mass: RARITY_SCALE * sum_counts < n_tok * total_tokens
RARITY_SCALE = 27


def train_unigram_counts(token_ds) -> np.ndarray:
    """One pass -> int64 count vector of length ``max_token + 1``.

    Partials are per-*batch* bincounts (vocab-bounded), so the reduction
    input is tiny and the driver-side sum is over #batches vectors, not
    rows."""

    def partial(batch: pa.Table) -> pa.Table:
        flat = batch.column("tokens").combine_chunks().flatten()
        toks = flat.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(toks) and (toks.min() < 0 or toks.max() >= VOCAB_BOUND):
            raise ValueError("token id outside [0, VOCAB_BOUND)")
        counts = np.bincount(toks)
        return pa.table({"counts": pa.array([counts.astype(np.int64)],
                                            type=pa.large_list(pa.int64()))})

    parts = []
    for b in token_ds.map_batches(partial, batch_format="pyarrow") \
                     .iter_batches(batch_format="pyarrow"):
        col = b.column("counts").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        parts.extend(flat[offs[i]:offs[i + 1]] for i in range(len(col)))
    if not parts:
        return np.zeros(0, dtype=np.int64)
    total = np.zeros(max(map(len, parts)), dtype=np.int64)
    for c in parts:
        total[: len(c)] += c
    return total


def score_rarity(token_ds, counts: np.ndarray):
    """Attach exact int64 rarity columns to each document row:
    ``sum_counts`` (sum of corpus-wide counts of the doc's tokens) and
    ``is_rare`` (mean token frequency below 1/RARITY_SCALE of uniform).

    ``counts`` is shipped through the object store once (``ray.put``); the
    per-batch work is one gather + one ``add.reduceat``."""
    import ray

    counts_ref = ray.put(counts.astype(np.int64))
    total_tokens = int(counts.sum())

    def score(batch: pa.Table) -> pa.Table:
        c = ray.get(counts_ref)
        lst = batch.column("tokens").combine_chunks()
        toks = lst.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.asarray(
            pa.compute.list_value_length(lst), dtype=np.int64)
        # reduceat over NON-EMPTY segment starts only: empty docs add no
        # length, so consecutive non-empty starts delimit exact segments
        # (repeated/out-of-range offsets from empty docs would otherwise
        # misattribute or crash)
        starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        nz = n_tok > 0
        per_tok = c[toks]
        sums = np.zeros(len(n_tok), dtype=np.int64)
        if len(toks):
            sums[nz] = np.add.reduceat(per_tok, starts[nz])
        rare = (np.int64(RARITY_SCALE) * sums
                < n_tok * np.int64(total_tokens)) & (n_tok > 0)
        batch = batch.append_column("sum_counts",
                                    pa.array(sums, type=pa.int64()))
        return batch.append_column("is_rare",
                                   pa.array(rare.astype(np.int64),
                                            type=pa.int64()))

    return token_ds.map_batches(score, batch_format="pyarrow")


def score_nll(token_ds, counts: np.ndarray, *, add_k: float = 0.5):
    """Perplexity-style mean negative log-likelihood per document under
    the add-k-smoothed unigram model (floating point; rows-only — ln is
    not cross-engine bit-stable, see module docstring)."""
    import ray

    counts_ref = ray.put(counts.astype(np.float64))
    total = float(counts.sum()) + add_k * len(counts)

    def score(batch: pa.Table) -> pa.Table:
        c = ray.get(counts_ref)
        logp = np.log((c + add_k) / total)
        lst = batch.column("tokens").combine_chunks()
        toks = lst.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok = np.asarray(
            pa.compute.list_value_length(lst), dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        nz = n_tok > 0
        sums = np.zeros(len(n_tok), dtype=np.float64)
        if len(toks):
            sums[nz] = np.add.reduceat(logp[toks], starts[nz])
        nll = np.where(nz, -sums / np.maximum(n_tok, 1), 0.0)
        return batch.append_column("nll", pa.array(nll, type=pa.float64()))

    return token_ds.map_batches(score, batch_format="pyarrow")
