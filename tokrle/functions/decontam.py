"""Test-set decontamination: drop training documents that share any
k-word n-gram with a held-out evaluation set (the GPT-3 appendix-C /
PaLM-style overlap rule).

Semantics are defined on LITERAL word n-grams (the SQL oracle compares
strings); the distributed implementation compares 128-bit n-gram hashes
(two independent 64-bit polynomial mixes), so it can diverge from the
string semantics only on a 128-bit collision — ~n²/2¹²⁹, negligible at
10¹³ n-grams.  Documents with fewer than k words contribute no n-grams
(never contaminated, never contaminating).

Scale shape (100 TB): the eval side is a benchmark suite — tiny next to
the training corpus.  Its DISTINCT n-gram hashes are deduplicated per
batch (map-side combine), exchanged once as (h1, h2) int64 pairs,
pulled to the driver (bounded by the BENCHMARK size, not the corpus)
and broadcast with ``ray.put``.  The train side is a stateful actor
stage: each actor materializes the broadcast index ONCE in
``__init__`` and flags every batch with one vectorized hash join —
training text never shuffles; there is no corpus-side all-to-all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
# two independent (base, gram-mix) pairs -> two 64-bit hashes per n-gram
_BASES = (131, 137)
_MIXES = (1000003, 1000033)


def word_ngram_hashes(texts: pa.Array | pa.ChunkedArray, k: int):
    """Hashed k-word n-grams of each document, fully vectorized.

    Returns ``(h1, h2, gram_offsets)`` where doc i's n-grams are rows
    ``gram_offsets[i]:gram_offsets[i+1]`` — exactly ``max(n_words-k+1, 0)``
    per doc (no short-doc clamping, unlike the minhash shingler in
    :mod:`tokrle.functions.dedup` which pads short docs to one shingle).
    """
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    words = pc.split_pattern(texts, " ")
    la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    per_doc = pc.list_value_length(la).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = la.flatten()
    from tokrle.functions._arrays import string_buffers

    word_offsets, data_u8 = string_buffers(flat)
    empty = (np.empty(0, np.uint64), np.empty(0, np.uint64),
             np.zeros(n_docs + 1, np.int64))
    if len(flat) == 0:
        return empty
    data = data_u8.astype(np.uint64)
    lengths = np.diff(word_offsets)
    within = (np.arange(word_offsets[0], word_offsets[-1], dtype=np.int64)
              - np.repeat(word_offsets[:-1], lengths))
    maxlen = int(lengths.max()) if len(lengths) else 1

    from tokrle.kernels.segments import segment_sums

    seg_bytes = data[word_offsets[0]:word_offsets[-1]]
    word_off0 = word_offsets - word_offsets[0]
    whashes = []
    for base in _BASES:
        pw = np.array([pow(base, p, _MERSENNE) for p in range(maxlen)],
                      dtype=np.uint64)
        # products/sums wrap mod 2^64 — a deterministic mix, not modular
        # arithmetic; batching-invariant because segment_sums is.
        whashes.append(segment_sums(seg_bytes * pw[within], word_off0))

    doc_offsets = np.concatenate(([0], np.cumsum(per_doc)))
    grams_per_doc = np.maximum(per_doc - k + 1, 0)
    gram_offsets = np.concatenate(
        ([0], np.cumsum(grams_per_doc))).astype(np.int64)
    n_grams = int(gram_offsets[-1])
    if n_grams == 0:
        return empty[0], empty[1], gram_offsets
    # flat word index of gram g's first word
    first = (np.arange(n_grams, dtype=np.int64)
             - np.repeat(gram_offsets[:-1], grams_per_doc)
             + np.repeat(doc_offsets[:-1], grams_per_doc))
    out = []
    for whash, mix in zip(whashes, _MIXES):
        h = np.zeros(n_grams, dtype=np.uint64)
        for j in range(k):   # k C-level passes, no per-doc Python
            h = h * np.uint64(mix) + whash[first + j]
        out.append(h)
    return out[0], out[1], gram_offsets


def _grams_table(texts, k: int) -> pa.Table:
    h1, h2, _ = word_ngram_hashes(texts, k)
    if len(h1):
        # per-batch distinct before anything leaves the task
        pair = np.stack([h1.view(np.int64), h2.view(np.int64)], axis=1)
        pair = np.unique(pair, axis=0)
        h1v, h2v = pair[:, 0], pair[:, 1]
    else:
        h1v = h2v = np.empty(0, np.int64)
    return pa.table({"h1": pa.array(h1v, type=pa.int64()),
                     "h2": pa.array(h2v, type=pa.int64())})


def eval_ngram_index(eval_ds, *, k: int = 8, text_col: str = "text",
                     max_rows: int | None = None):
    """Distinct n-gram hash pairs of the eval corpus as two driver-side
    int64 arrays (sorted lexicographically).  Driver materialization is
    bounded by the benchmark's distinct-n-gram count, not the corpus.

    With ``max_rows`` set, returns ``None`` as soon as the streamed
    per-batch-distinct rows exceed it (a conservative upper bound on
    the true distinct count) — the caller's signal to take a
    non-broadcast path; iteration stops there, so the overflow case
    never materializes the index."""
    grams = eval_ds.map_batches(
        lambda b: _grams_table(b.column(text_col), k),
        batch_format="pyarrow")
    parts: list = []
    total = 0
    for b in grams.iter_batches(batch_size=None, batch_format="pyarrow"):
        parts.append(b)
        total += b.num_rows
        if max_rows is not None and total > max_rows:
            return None
    if parts:
        t = pa.concat_tables(parts)
        pair = np.unique(np.stack(
            [t.column("h1").to_numpy(zero_copy_only=False),
             t.column("h2").to_numpy(zero_copy_only=False)], axis=1), axis=0)
        return pair[:, 0].copy(), pair[:, 1].copy()
    return np.empty(0, np.int64), np.empty(0, np.int64)


class ContaminationFlagger:
    """Stateful actor stage: broadcast eval-hash index is materialized
    once per actor; each batch is flagged with one vectorized hash join
    (pandas merge on the two int64 hash columns)."""

    def __init__(self, index_ref, *, k: int = 8,
                 text_col: str = "text") -> None:
        import ray

        h1, h2 = ray.get(index_ref) if not isinstance(index_ref, tuple) \
            else index_ref
        self._index = pd.DataFrame({"h1": h1, "h2": h2})
        self._k = k
        self._text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h1, h2, offs = word_ngram_hashes(
            batch.column(self._text_col), self._k)
        flag = np.zeros(len(batch), dtype=bool)
        if len(h1) and len(self._index):
            q = pd.DataFrame({"h1": h1.view(np.int64),
                              "h2": h2.view(np.int64),
                              "g": np.arange(len(h1), dtype=np.int64)})
            hits = q.merge(self._index, on=["h1", "h2"], how="inner")
            if len(hits):
                doc_idx = np.searchsorted(
                    offs, hits["g"].to_numpy(), side="right") - 1
                flag[np.unique(doc_idx)] = True
        return batch.append_column(
            "contaminated", pa.array(flag, type=pa.bool_()))


#: eval-index broadcast cap (~16 bytes/gram -> ~800 MB, the dupspan
#: precedent): eval splits are benchmark-sized by construction (GPT-3
#: practice), but an unguarded broadcast of a mislabeled "eval" corpus
#: would OOM the driver — above the cap the Bloom variant (fixed-size
#: bitmap, superset-safe) takes over automatically
MAX_INDEX_GRAMS = 50_000_000


def flag_contaminated(train_ds, eval_ds, *, k: int = 8,
                      text_col: str = "text",
                      concurrency: tuple[int, int] | None = None,
                      max_index_grams: int = MAX_INDEX_GRAMS):
    """Append a boolean ``contaminated`` column to ``train_ds``.

    Exact eval-hash broadcast while the distinct-gram index fits
    ``max_index_grams``; above it, falls through to
    :func:`tokrle.functions.bloom.flag_contaminated_bloom` — identical
    semantics up to false POSITIVES only (the flagged set is a superset;
    one-sided-safe for decontamination, where over-dropping is the safe
    direction).  ``concurrency`` defaults to an autoscaling pool capped
    at the cluster's CPU count."""
    import ray

    if concurrency is None:
        from tokrle.functions.dedup import auto_concurrency

        concurrency = auto_concurrency()

    index = eval_ngram_index(eval_ds, k=k, text_col=text_col,
                             max_rows=max_index_grams)
    if index is None:  # over the broadcast cap: fixed-size bloom path
        import logging

        from tokrle.functions.bloom import flag_contaminated_bloom

        logging.getLogger(__name__).warning(
            "eval n-gram index exceeds max_index_grams=%d; falling "
            "through to the Bloom prefilter — 'contaminated' flags are "
            "now a SUPERSET (false positives possible); counts from "
            "this column overestimate contamination", max_index_grams)
        return flag_contaminated_bloom(train_ds, eval_ds, k=k,
                                       text_col=text_col,
                                       concurrency=concurrency)
    index_ref = ray.put(index)
    return train_ds.map_batches(
        ContaminationFlagger,
        fn_constructor_kwargs={"index_ref": index_ref, "k": k,
                               "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency)


def decontaminate(train_ds, eval_ds, *, k: int = 8, text_col: str = "text",
                  concurrency: tuple[int, int] | None = None):
    """Training rows with every contaminated document removed."""
    flagged = flag_contaminated(train_ds, eval_ds, k=k, text_col=text_col,
                                concurrency=concurrency)
    import pyarrow.compute as pc

    return flagged.map_batches(
        lambda b: b.filter(pc.invert(b.column("contaminated")))
        .drop_columns(["contaminated"]),
        batch_format="pyarrow")
