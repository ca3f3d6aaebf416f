"""Sliding-window sequence splitting — the long-document chunking step
of a training pipeline (cut each document's token stream into
``max_len``-token windows that overlap by ``overlap`` tokens, so no
context is lost at window boundaries).  The inverse concern of
:mod:`tokrle.functions.packing`: packing merges short docs, splitting
cuts long ones.

Purely row-local (a chunk depends only on its own document), so the
operator is one vectorized ``map_batches`` expansion with NO shuffle —
it streams at any scale and composes with read pruning.  Chunk starts
are ``i * (max_len - overlap)``; a window is emitted only if it begins
before the document ends, and the final window is truncated, never
padded (padding is packing's job).  Everything about the output —
chunk count, lengths, content — is a closed-form function of the input
row, which is what the SQL oracle recomputes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tokrle.functions._arrays import list_rows


def split_sequences(ds, *, max_len: int = 128, overlap: int = 16,
                    id_col: str = "doc_id", tokens_col: str = "tokens"):
    """Token table -> chunk table ``(doc_id, chunk_idx, tokens:
    large_list<int32>, n_tok, + passthrough columns)`` with one row per
    window.

    The expansion is one gather per batch: window starts/lengths are
    computed vectorially, the output's flat value buffer is built with a
    single fancy-index over the batch's flat token buffer, and the list
    column is re-packed through one offsets array (no per-row Python).
    """
    if not 0 <= overlap < max_len:
        raise ValueError("need 0 <= overlap < max_len")
    step = max_len - overlap

    def split(batch: pa.Table) -> pa.Table:
        flat, offs = list_rows(batch.column(tokens_col))
        lens = np.diff(offs)
        # windows per doc: 1 + ceil((n - max_len) / step) for n > max_len
        n_chunks = np.where(
            lens > max_len,
            1 + -(-(lens - max_len) // step),
            (lens > 0).astype(np.int64)).astype(np.int64)
        total = int(n_chunks.sum())
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
        chunk_starts_per_doc = np.concatenate(
            ([0], np.cumsum(n_chunks)[:-1]))
        chunk_idx = (np.arange(total, dtype=np.int64)
                     - chunk_starts_per_doc[doc_idx])
        win_start = chunk_idx * step
        win_len = np.minimum(lens[doc_idx] - win_start, max_len)
        # one gather builds every window's tokens: position p of window w
        # reads flat[doc_off + win_start + p]
        out_offs = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(win_len, out=out_offs[1:])
        pos = np.arange(int(out_offs[-1]), dtype=np.int64) \
            - np.repeat(out_offs[:-1], win_len)
        src = (offs[:-1][doc_idx] + win_start)[
            np.repeat(np.arange(total), win_len)] + pos
        values = flat[src] if len(src) else flat[:0]
        tok_arr = pa.LargeListArray.from_arrays(
            pa.array(out_offs, type=pa.int64()),
            pa.array(values, type=pa.int32()))
        cols = {
            id_col: batch.column(id_col).take(
                pa.array(doc_idx, type=pa.int64())),
            "chunk_idx": pa.array(chunk_idx, type=pa.int64()),
            tokens_col: tok_arr,
            "n_tok": pa.array(win_len, type=pa.int64()),
        }
        for name in batch.column_names:
            if name not in (id_col, tokens_col, "n_tok"):
                if name in cols:
                    continue
                cols[name] = batch.column(name).take(
                    pa.array(doc_idx, type=pa.int64()))
        return pa.table(cols)

    return ds.map_batches(split, batch_format="pyarrow")
