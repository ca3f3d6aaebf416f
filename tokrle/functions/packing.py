"""Fixed-length training-example packing over token tables.

The standard LLM pre-training data-prep step (no reference analog —
pyrle stops at the vector layer): concatenate each group's documents,
EOS-terminating every document, into one token stream and cut it into
``seq_len``-sized examples, padding only the final example of each
group.  Deterministic: documents are packed in ``doc_id`` order within
their group.

Scale shape: ONE hash exchange co-locates each group's rows
(complete key groups per block via dedup._group_blocks), then a single
vectorized fold per BLOCK packs every group at once — the token payload
crosses the wire exactly once and nothing materializes beyond a block.
A group is bounded by a block: for groups that outgrow worker memory,
pre-split the key upstream (e.g. add a deterministic doc-hash bucket to
``key_col``) — each sub-bucket packs independently at the cost of one
extra padded tail per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tokrle.functions._arrays import list_rows as _list_rows


def _flat_list_column(batch: pa.Table, col: str):
    """(flat_values, per-row offsets) of a list column — shared helper
    (tokrle.functions._arrays.list_rows), absolute-indexed."""
    return _list_rows(batch.column(col))


def pack_sequences(ds, *, seq_len: int = 2048, eos: int = 1, pad: int = 0,
                   key_col: str = "source", id_col: str = "doc_id",
                   tokens_col: str = "tokens"):
    """Token table -> packed-example Dataset with one row per example:
    ``(key, example_idx, input_ids: large_list<int32>, n_real)`` where
    ``n_real`` counts non-pad tokens (document tokens + EOS markers)."""
    from tokrle.functions.dedup import _group_blocks

    out_schema = pa.schema([
        ("key", pa.string()),
        ("example_idx", pa.int64()),
        ("input_ids", pa.large_list(pa.int32())),
        ("n_real", pa.int64()),
    ])

    def fold(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        flat, offs = _flat_list_column(batch, tokens_col)
        lens = np.diff(offs)
        codes, uniques = pd.factorize(keys)
        order = np.lexsort((ids, codes))       # group, then doc_id
        lens_o = lens[order]
        # gather the flat tokens into group-then-doc order in one shot
        total = int(lens_o.sum())
        prefix = np.zeros(len(order), dtype=np.int64)
        np.cumsum(lens_o[:-1], out=prefix[1:])
        base = np.repeat(offs[:-1][order] - prefix, lens_o)
        gathered = flat[base + np.arange(total, dtype=np.int64)] \
            if total else flat[:0]
        # interleave one EOS after each document (vectorized scatter)
        n_docs = len(order)
        out = np.empty(total + n_docs, dtype=np.int32)
        ends_with_eos = np.cumsum(lens_o + 1)
        mask = np.ones(len(out), dtype=bool)
        mask[ends_with_eos - 1] = False
        out[mask] = gathered
        out[~mask] = eos
        # per-group token spans (doc-order is already group-contiguous)
        c = codes[order]
        g_starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
        tok_per_group = np.add.reduceat(lens_o + 1, g_starts)
        g_tok_starts = np.zeros(len(g_starts), dtype=np.int64)
        np.cumsum(tok_per_group[:-1], out=g_tok_starts[1:])
        keys_out, ids_out, real_out, chunks = [], [], [], []
        for gi in range(len(g_starts)):
            seg = out[g_tok_starts[gi]:g_tok_starts[gi]
                      + tok_per_group[gi]]
            n_ex = -(-len(seg) // seq_len)
            padded = np.full(n_ex * seq_len, pad, dtype=np.int32)
            padded[:len(seg)] = seg
            chunks.append(padded)
            label = str(uniques[c[g_starts[gi]]])
            keys_out.extend([label] * n_ex)
            ids_out.extend(range(n_ex))
            real_out.extend([seq_len] * (n_ex - 1))
            real_out.append(len(seg) - (n_ex - 1) * seq_len)
        flat_out = (np.concatenate(chunks) if chunks
                    else np.empty(0, dtype=np.int32))
        offs_out = pa.array(
            np.arange(len(keys_out) + 1, dtype=np.int64) * seq_len,
            type=pa.int64())
        return pa.Table.from_arrays(
            [pa.array(keys_out, type=pa.string()),
             pa.array(ids_out, type=pa.int64()),
             pa.LargeListArray.from_arrays(offs_out, pa.array(flat_out)),
             pa.array(real_out, type=pa.int64())],
            schema=out_schema)

    return _group_blocks(ds, [key_col]).map_batches(
        fold, batch_size=None, batch_format="pyarrow")
