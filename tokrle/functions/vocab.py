"""Frequency-ranked token id remapping.

Token columns compress as well as their id assignment allows: bitpack /
FOR / PFOR widths follow the MAGNITUDE of the ids, not their entropy, so
assigning the smallest ids to the most frequent tokens (new_id = rank by
count desc, ties on old id asc) shrinks the common case — the same trick
dictionary encodings and modern tokenizers' id layouts exploit.  The
remap is a bijection over the observed vocabulary, so it is exactly
invertible; both directions ship with the encoded output as lineage.

Scale shape: per-batch ``np.unique`` partials -> one ``groupby(t).sum``
whose exchange carries (token, count) rows (vocab-bounded, never the
corpus) -> the rank table is built once on the driver (vocab-sized:
10^5..10^7 entries, trivially driver-holdable) -> ``ray.put`` broadcast
-> the apply stage is a single vectorized gather per batch.

The rank rule (count desc, old id asc) is a pure integer total order, so
a SQL window function re-derives the IDENTICAL mapping — the remapped
stream itself is oracle-checkable, not just its round-trip.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def token_frequencies(ds):
    """(token, count) Dataset: per-batch unique+count partials, one
    vocab-bounded groupby-sum exchange."""
    from ray.data.aggregate import Sum

    from tokrle.stages.encoder import _flat_tokens

    def partial(batch: pa.Table) -> pa.Table:
        values, _ = _flat_tokens(batch)
        uniq, cnts = np.unique(values.astype(np.int64),
                               return_counts=True)
        return pa.table({"t": pa.array(uniq, type=pa.int64()),
                         "cnt": pa.array(cnts.astype(np.int64),
                                         type=pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("t").aggregate(Sum("cnt", alias_name="n"))


def build_token_remap(ds) -> tuple[np.ndarray, np.ndarray]:
    """Learn the frequency-ranked remap.  Returns ``(old_of_new,
    new_of_old)``: ``old_of_new[new_id] -> old_id`` (dense, vocab-sized)
    and ``new_of_old`` (size max_old+1, -1 for unobserved ids)."""
    freq = token_frequencies(ds).to_pandas()
    t = freq["t"].to_numpy(dtype=np.int64)
    n = freq["n"].to_numpy(dtype=np.int64)
    order = np.lexsort((t, -n))          # count desc, old id asc
    old_of_new = t[order]
    new_of_old = np.full(int(t.max()) + 1 if len(t) else 0, -1,
                         dtype=np.int64)
    new_of_old[old_of_new] = np.arange(len(old_of_new), dtype=np.int64)
    return old_of_new, new_of_old


def apply_token_remap(ds, mapping: np.ndarray, *,
                      strict: bool = True):
    """Rewrite the tokens column through ``mapping`` (``mapping[old] ->
    new``): the table is broadcast once via ``ray.put`` and each batch is
    one vectorized gather.  ``strict`` raises on ids outside the learned
    vocabulary (mapping -1 or out of range) instead of writing -1."""
    import ray

    from tokrle.stages.encoder import _flat_tokens

    ref = ray.put(np.ascontiguousarray(mapping))

    def remap(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        values, offsets = _flat_tokens(batch)
        v = values.astype(np.int64, copy=False)
        if strict and len(v) and (int(v.max()) >= len(m) or
                                  (m[v] < 0).any()):
            raise ValueError("token outside the learned vocabulary")
        out = m[v].astype(np.int32)
        offs = offsets.astype(np.int64)
        arr = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32)), pa.array(out)) \
            if offs[-1] < 2**31 else \
            pa.LargeListArray.from_arrays(pa.array(offs), pa.array(out))
        i = batch.schema.get_field_index("tokens")
        return batch.set_column(i, "tokens", arr)

    return ds.map_batches(remap, batch_format="pyarrow")


def invert_remap(old_of_new: np.ndarray) -> np.ndarray:
    """``new -> old`` gather table (the dense rank table itself)."""
    return np.ascontiguousarray(old_of_new.astype(np.int64))
