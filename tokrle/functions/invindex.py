"""Distributed inverted index with codec-compressed posting lists.

Generalizes the engine's encode layer (tokrle.codecs) to the classic
retrieval structure a training-data pipeline needs for corpus search,
targeted decontamination probes, and filter-by-phrase: term -> sorted
doc-id posting list, each list compressed through the SAME auto-selected
codec family as token chunks.  Sorted doc-id gaps are exactly the
delta->pfor cascade's home turf (Lemire & Boytsov-style d-gap coding),
so the index dogfoods ``dpfor``.

Scale shape (100 TB corpus, fixed cluster):
- one tokenize + per-batch (term, doc) dedup stage (Arrow group_by, no
  Python per row) emits int64 doc ids + term strings only — text never
  leaves the map stage;
- ONE hash exchange co-locates each term's pairs (``_group_blocks``);
- per-BLOCK vectorized fold: dictionary-encode terms, one lexsort, run
  boundaries, then one codec encode per HEAD term (df >= INLINE_MAX);
  the long tail of tiny posting lists is stored INLINE as an Arrow
  large_list column via one concatenate + offsets — zero Python per
  tail term (real engines inline short postings for the same reason);
- the index is written hive-partitioned by ``bucket = term_hash % B``,
  so a query reads only the probed terms' partitions with an Arrow
  filter pushdown — O(matched postings), never the whole index.

No reference counterpart (pyrle has no retrieval layer); the posting
decode path reuses codecs.core exactly as pipelines/encode.py does.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE31 = (1 << 31) - 1   # keeps h*131+byte < 2^39: no uint64 wrap
INLINE_MAX = 8          # df < INLINE_MAX stays an inline list column
NUM_BUCKETS = 64


def term_hash(term: str) -> int:
    """Horner polynomial byte hash mod 2^31-1 — the scalar twin of
    :func:`_term_hash_vec`; both sides of the build/query split MUST
    agree on the bucket (only bucketing uses it, so 31 bits suffice and
    every intermediate fits uint64 in the vectorized twin)."""
    h = 0
    for b in term.encode():
        h = (h * 131 + b) % _MERSENNE31
    return h


def _term_hash_vec(terms: pa.Array) -> np.ndarray:
    """Vectorized :func:`term_hash`: one masked Horner step per byte
    position (O(max word length) passes over the word array)."""
    flat = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) \
        else terms
    from tokrle.functions._arrays import string_buffers

    offsets, data = string_buffers(flat)
    if len(offsets) <= 1:
        return np.empty(0, np.uint64)
    lengths = np.diff(offsets)
    maxlen = int(lengths.max()) if len(lengths) else 0
    h = np.zeros(len(lengths), dtype=np.uint64)
    m31 = np.uint64(_MERSENNE31)
    for p in range(maxlen):
        has = lengths > p
        b = data[offsets[:-1][has] + p].astype(np.uint64)
        h[has] = (h[has] * np.uint64(131) + b) % m31
    return h


def _pairs_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> distinct (term, did, bucket) pairs.  All-Arrow:
    split, flatten, cast doc ids, hash-dedup via Acero group_by."""
    words = pc.split_pattern(batch.column("text"), " ")
    la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) \
        else words
    did = pc.cast(batch.column("doc_id"), pa.int64())
    parents = pc.list_parent_indices(la)
    pairs = pa.table({
        "term": la.flatten(),
        "did": pc.take(did, parents),
    }).group_by(["term", "did"]).aggregate([])
    bucket = (_term_hash_vec(pairs.column("term"))
              % np.uint64(NUM_BUCKETS)).astype(np.int32)
    return pairs.append_column("bucket", pa.array(bucket, pa.int32()))


def _fold_block(batch: pa.Table) -> pa.Table:
    """One co-located block of (term, did, bucket) pairs -> index rows.
    One dictionary encode + one lexsort for the whole block; codec encode
    per head term only; tail postings inline via one offsets repack."""
    from tokrle.select import auto_encode

    n = len(batch)
    if n == 0:
        return pa.table({
            "term": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "codec": pa.array([], pa.string()),
            "payload": pa.array([], pa.large_binary()),
            "inline": pa.array([], pa.large_list(pa.int64())),
            "bucket": pa.array([], pa.int32()),
        })
    tcodes_arr = pc.dictionary_encode(
        batch.column("term").combine_chunks())
    if isinstance(tcodes_arr, pa.ChunkedArray):
        tcodes_arr = tcodes_arr.combine_chunks()
    codes = tcodes_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = tcodes_arr.dictionary
    did = batch.column("did").to_numpy(zero_copy_only=False)
    bucket = batch.column("bucket").to_numpy(zero_copy_only=False)
    order = np.lexsort((did, codes))
    codes_s, did_s, bucket_s = codes[order], did[order], bucket[order]
    starts = np.flatnonzero(np.concatenate(
        ([True], codes_s[1:] != codes_s[:-1])))
    ends = np.append(starts[1:], n)
    df = ends - starts
    term_idx = codes_s[starts]
    head = df >= INLINE_MAX
    # head terms: one auto_encode per term (vectorized inside)
    codecs: list[str] = []
    payloads: list[bytes] = []
    for s, e in zip(starts[head], ends[head]):
        codec, payload, _ = auto_encode(did_s[s:e])
        codecs.append(codec)
        payloads.append(payload)
    # tail terms: ONE gather + offsets repack, no per-term Python
    tail_starts, tail_ends = starts[~head], ends[~head]
    tail_df = tail_ends - tail_starts
    inline_offsets = np.concatenate(([0], np.cumsum(tail_df)))
    gather = (np.arange(int(inline_offsets[-1]), dtype=np.int64)
              - np.repeat(inline_offsets[:-1], tail_df)
              + np.repeat(tail_starts, tail_df))
    inline_vals = did_s[gather]
    n_head, n_tail = int(head.sum()), int((~head).sum())
    inline_col = pa.concat_arrays([
        pa.nulls(n_head, pa.large_list(pa.int64())),
        pa.LargeListArray.from_arrays(inline_offsets,
                                      pa.array(inline_vals, pa.int64())),
    ])
    terms_out = pc.take(vocab, pa.array(
        np.concatenate([term_idx[head], term_idx[~head]])))
    return pa.table({
        "term": terms_out,
        "df": pa.array(np.concatenate([df[head], df[~head]]), pa.int64()),
        "codec": pa.array(codecs + ["inline"] * n_tail, pa.string()),
        "payload": pa.concat_arrays([
            pa.array(payloads, pa.large_binary()),
            pa.nulls(n_tail, pa.large_binary())]),
        "inline": inline_col,
        "bucket": pa.array(np.concatenate(
            [bucket_s[starts[head]], bucket_s[tail_starts]]), pa.int32()),
    })


def build_inverted_index(ds, index_dir: str, *,
                         num_partitions: int | None = None):
    """documents Dataset -> hive-partitioned posting-list index on disk.
    Returns the index Dataset (already written)."""
    from tokrle.functions.dedup import _group_blocks

    pairs = ds.map_batches(_pairs_batch, batch_format="pyarrow")
    grouped = _group_blocks(pairs, ["term"], num_partitions)
    index = grouped.map_batches(_fold_block, batch_size=None,
                                batch_format="pyarrow")
    index.write_parquet(os.path.join(index_dir, "data"),
                        partition_cols=["bucket"])
    return index


def _decode_postings(batch: pa.Table) -> dict[str, np.ndarray]:
    """Index rows -> {term: sorted doc-id array}; asserts every codec
    payload decodes to a strictly sorted list (in-task leak check)."""
    from tokrle.codecs.core import decode

    out: dict[str, np.ndarray] = {}
    inline = batch.column("inline")
    payloads = batch.column("payload")
    for i, (term, df, codec) in enumerate(zip(
            batch.column("term").to_pylist(),
            batch.column("df").to_pylist(),
            batch.column("codec").to_pylist())):
        if codec == "inline":
            ids = np.asarray(inline[i].as_py(), dtype=np.int64)
        else:
            ids = decode(codec, payloads[i].as_py(), df, np.int64)
        assert len(ids) == df and (len(ids) < 2 or (np.diff(ids) > 0).all())
        out[term] = ids
    return out


def query_terms(index_dir: str, terms: list[str]) -> dict[str, np.ndarray]:
    """Read ONLY the probed terms' bucket partitions (hive pruning) with a
    term filter pushed into the Parquet scan; returns {term: doc ids}
    (missing terms -> empty array)."""
    import pyarrow.dataset as pads

    buckets = sorted({term_hash(t) % NUM_BUCKETS for t in terms})
    dset = pads.dataset(os.path.join(index_dir, "data"),
                        partitioning="hive")
    expr = (pads.field("bucket").isin(buckets)
            & pads.field("term").isin(terms))
    tbl = dset.to_table(filter=expr,
                        columns=["term", "df", "codec", "payload", "inline"])
    found = _decode_postings(tbl)
    return {t: found.get(t, np.empty(0, np.int64)) for t in terms}


def search(index_dir: str, terms: list[str], *,
           mode: str = "and") -> np.ndarray:
    """Boolean retrieval over the index: sorted doc ids matching ALL
    (``and``) or ANY (``or``) of ``terms``."""
    postings = query_terms(index_dir, terms)
    arrays = [postings[t] for t in terms]
    if mode == "or":
        return np.unique(np.concatenate(arrays)) if arrays else \
            np.empty(0, np.int64)
    if not arrays:
        return np.empty(0, np.int64)
    acc = arrays[0]
    for a in sorted(arrays[1:], key=len):
        acc = np.intersect1d(acc, a, assume_unique=True)
    return acc
