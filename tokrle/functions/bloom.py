"""Bloom-filter membership as a broadcast primitive.

The exact broadcast sets used across this repo (decontamination eval
n-grams, frequent-gram indexes, dedup keys) cost ~16 bytes per key on
every worker.  A Bloom filter (Bloom 1970, CACM; sizing per Broder &
Mitzenmakher's survey) gets the same one-sided test at ~1.2 bytes/key
for a 1% false-positive rate — the difference between "ships to every
actor" and "doesn't fit" when the key side reaches billions at 100 TB.

One-sided contract: NO false negatives ever; false positives at a
configurable rate.  Use it as a PREFILTER in front of an exact check
(candidates shrink by ~(1 - fpr)), or accept the FP rate where the
downstream op tolerates over-selection (dedup candidate generation,
cache admission).

Build is distributed: each batch sets its keys' bits in a LOCAL bitmap
partial, partials OR together (a commutative, idempotent fold) — one
small exchange of fixed-size bitmaps, never keys.  Membership is a
stateful actor stage: the bitmap ships once per actor via ``ray.put``.

Hashing: double hashing ``h_i = h1 + i * h2 (mod m)`` (Kirsch &
Mitzenmacher 2006: two independent 64-bit mixes simulate k independent
hash functions with no measurable FPR loss).  Keys are int64 pairs —
the same (h1, h2) shape :mod:`tokrle.functions.decontam` already
produces — so any hashable record maps in via two polynomial mixes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def optimal_params(n_keys: int, fpr: float) -> tuple[int, int]:
    """(n_bits, k_hashes) for a target false-positive rate:
    m = -n ln p / (ln 2)^2, k = (m/n) ln 2, both rounded up/sane."""
    n_keys = max(1, n_keys)
    m = int(np.ceil(-n_keys * np.log(fpr) / (np.log(2) ** 2)))
    m = max(64, m)
    k = max(1, int(round(m / n_keys * np.log(2))))
    return m, min(k, 16)


def _positions(h1: np.ndarray, h2: np.ndarray, n_bits: int,
               k: int) -> np.ndarray:
    """(len, k) bit positions via double hashing, all-uint64 modular."""
    m = np.uint64(n_bits)
    a = h1.view(np.uint64) if h1.dtype == np.int64 else h1.astype(np.uint64)
    b = h2.view(np.uint64) if h2.dtype == np.int64 else h2.astype(np.uint64)
    # force h2 odd so the stride cycles the whole table
    b = b | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((a[:, None] + i[None, :] * b[:, None]) % m)


def bitmap_set(bitmap: np.ndarray, h1: np.ndarray, h2: np.ndarray,
               k: int) -> None:
    """Set all k positions of every key in a packed uint8 bitmap."""
    if len(h1) == 0:
        return
    pos = _positions(h1, h2, len(bitmap) * 8, k).ravel()
    np.bitwise_or.at(bitmap, (pos >> np.uint64(3)).astype(np.int64),
                     np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))


def bitmap_test(bitmap: np.ndarray, h1: np.ndarray, h2: np.ndarray,
                k: int) -> np.ndarray:
    """Boolean membership (no false negatives) for every key."""
    if len(h1) == 0:
        return np.empty(0, dtype=bool)
    pos = _positions(h1, h2, len(bitmap) * 8, k)
    byte = bitmap[(pos >> np.uint64(3)).astype(np.int64)]
    bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return bit.all(axis=1)


def build_bloom(pair_ds, *, n_bits: int, k: int,
                h1_col: str = "h1", h2_col: str = "h2") -> np.ndarray:
    """Distributed build over a Dataset of (h1, h2) int64 key rows:
    per-batch local bitmaps, OR-folded.  The fold runs on the driver
    over one fixed-size partial per block (bitmap_bytes x n_blocks
    transferred once); at larger n_bits switch the fold to a tree of
    ``ray.remote`` ORs — the partial shape is already associative."""
    nbytes = (n_bits + 7) // 8

    def partial(batch: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, dtype=np.uint8)
        bitmap_set(bm,
                   batch.column(h1_col).to_numpy(zero_copy_only=False),
                   batch.column(h2_col).to_numpy(zero_copy_only=False),
                   k)
        return pa.table({"bm": pa.array([bm.tobytes()],
                                        type=pa.binary())})

    out = np.zeros(nbytes, dtype=np.uint8)
    for b in pair_ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for buf in b.column("bm"):
            np.bitwise_or(out,
                          np.frombuffer(buf.as_buffer(), dtype=np.uint8),
                          out=out)
    return out


class BloomNgramFlagger:
    """Stateful actor stage: flag documents sharing any k-word n-gram
    with a Bloom filter of the eval set's n-grams — the broadcast-scale
    variant of :class:`tokrle.functions.decontam.ContaminationFlagger`.
    One-sided: flags a STRICT SUPERSET of the exact flagger's documents
    (false positives only, never false negatives)."""

    def __init__(self, bloom_ref, *, k_gram: int, k_hash: int,
                 text_col: str = "text") -> None:
        import ray

        self._bitmap = ray.get(bloom_ref) if not isinstance(
            bloom_ref, np.ndarray) else bloom_ref
        self._k_gram = k_gram
        self._k_hash = k_hash
        self._text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tokrle.functions.decontam import word_ngram_hashes

        h1, h2, offs = word_ngram_hashes(
            batch.column(self._text_col), self._k_gram)
        flag = np.zeros(len(batch), dtype=bool)
        if len(h1):
            hit = bitmap_test(self._bitmap, h1.view(np.int64),
                              h2.view(np.int64), self._k_hash)
            if hit.any():
                doc_idx = np.searchsorted(
                    offs, np.flatnonzero(hit), side="right") - 1
                flag[np.unique(doc_idx)] = True
        return batch.append_column(
            "contaminated", pa.array(flag, type=pa.bool_()))


def flag_contaminated_bloom(train_ds, eval_ds, *, k: int = 8,
                            fpr: float = 1e-5, text_col: str = "text",
                            concurrency=None):
    """Bloom-broadcast contamination flagging: same semantics as
    :func:`tokrle.functions.decontam.flag_contaminated` up to false
    POSITIVES (never false negatives).  ``fpr`` is PER N-GRAM PROBE; a
    document is flagged if ANY of its ~G n-grams probes positive, so the
    doc-level FP rate is ~``1 - (1-fpr)^G`` — size fpr to
    ``target_doc_fpr / G`` (default 1e-5 keeps doc-level FPs ~0.1% at
    100-gram docs while still costing only ~3 bytes/key, 5x under the
    exact index's 16)."""
    import ray

    from tokrle.functions.decontam import _grams_table
    from tokrle.functions.dedup import auto_concurrency

    if concurrency is None:
        concurrency = auto_concurrency()

    grams = eval_ds.map_batches(
        lambda b: _grams_table(b.column(text_col), k),
        batch_format="pyarrow").materialize()
    n_keys = grams.count()
    n_bits, k_hash = optimal_params(n_keys, fpr)
    bitmap = build_bloom(grams, n_bits=n_bits, k=k_hash)
    bloom_ref = ray.put(bitmap)
    return train_ds.map_batches(
        BloomNgramFlagger,
        fn_constructor_kwargs={"bloom_ref": bloom_ref, "k_gram": k,
                               "k_hash": k_hash, "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency)
