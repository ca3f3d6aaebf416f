"""Distributed byte-pair-encoding (BPE) merge training over token sequences.

Exact greedy BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") re-expressed Ray-Data-first.  Each merge round is:

1. one ``map_batches`` pass emitting per-batch PARTIAL pair counts
   (``np.unique`` is the map-side combiner — the shuffle moves
   ``(pair, count)`` rows, never tokens),
2. a ``groupby("pair").sum`` + distributed partial-argmax for the winning
   pair (ties broken by smallest ``(a, b)`` — a pure integer rule any
   engine reproduces),
3. one ``map_batches`` pass applying the merge fully vectorized:
   overlapping matches (runs like ``aaaa`` for pair ``(a, a)``) resolve
   left-to-right by run parity — no Python loop over tokens.

The token dataset is materialized once per round so round ``i+1`` reads
merged blocks instead of re-running the whole lineage; exact BPE is
inherently iterative (counts change after every merge).  At 100 TB the
per-round exchange stays the same shape but rounds 2..k would switch to
delta count maintenance (only pairs adjacent to merge sites change) —
the classic single-node trainers (SentencePiece) do the equivalent.

A fresh merge id never equals ``a`` or ``b``, so one left-to-right pass
per merge is exact: replacing ``(a, b)`` with ``new_id`` cannot create a
new ``(a, b)`` occurrence.

``expand_bpe`` is the exact inverse (reverse-order splice), which turns
"the merge table is lossless" into an aggregate-checkable round-trip —
the same encode/decode-equality gate the codec layer uses (generalizing
the reference's Rle construction round-trips, ref pyrle/rle.py:34-64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# pair key = a * 2^31 + b: token ids (base vocab + merge ids) stay far
# below 2^31, so the key is collision-free inside int64
_PAIR_SHIFT = np.int64(1) << np.int64(31)


def _pair_counts_partial(values: np.ndarray, offsets: np.ndarray):
    """(unique pair keys, counts) over the flat token buffer, pairs that
    cross document boundaries masked out."""
    n = len(values)
    if n < 2:
        return (np.empty(0, dtype=np.int64),) * 2
    valid = np.ones(n - 1, dtype=bool)
    ends = offsets[1:-1]                       # first position of each doc
    valid[ends[(ends > 0) & (ends < n)] - 1] = False
    a = values[:-1].astype(np.int64)[valid]
    b = values[1:].astype(np.int64)[valid]
    return np.unique(a * _PAIR_SHIFT + b, return_counts=True)


def apply_merge_flat(values: np.ndarray, offsets: np.ndarray,
                     a: int, b: int, new_id: int):
    """One vectorized left-to-right greedy merge of pair ``(a, b)`` ->
    ``new_id`` over a flat token buffer with doc offsets.

    Returns ``(new_values, new_lens, n_merged)``.  Overlap rule: within a
    run of consecutive candidate positions (only possible when ``a == b``)
    the even offsets win — exactly the order a sequential scan merges.
    """
    n = len(values)
    lens = np.diff(offsets)
    if n < 2:
        return values.astype(np.int32, copy=True), lens, 0
    v = values
    m = np.empty(n, dtype=bool)
    m[-1] = False
    np.logical_and(v[:-1] == a, v[1:] == b, out=m[:-1])
    ends = offsets[1:-1]
    m[ends[(ends > 0) & (ends < n)] - 1] = False   # cross-doc pairs
    idx = np.flatnonzero(m)
    if idx.size == 0:
        return values.astype(np.int32, copy=True), lens, 0
    starts = np.empty(len(idx), dtype=bool)
    starts[0] = True
    np.not_equal(np.diff(idx), 1, out=starts[1:])
    run_first = np.maximum.accumulate(np.where(starts, idx, -1))
    sel = idx[((idx - run_first) & 1) == 0]
    out = v.astype(np.int32, copy=True)
    out[sel] = new_id
    keep = np.ones(n, dtype=bool)
    keep[sel + 1] = False
    doc_of = np.searchsorted(offsets, sel + 1, side="right") - 1
    removed = np.bincount(doc_of, minlength=len(lens))
    return out[keep], lens - removed, len(sel)


def expand_merge_flat(values: np.ndarray, offsets: np.ndarray,
                      a: int, b: int, new_id: int):
    """Inverse of :func:`apply_merge_flat`: every ``new_id`` splices back
    to ``(a, b)``.  Returns ``(new_values, new_lens)``."""
    lens = np.diff(offsets)
    hit = values == new_id
    n_hit = int(np.count_nonzero(hit))
    if n_hit == 0:
        return values.astype(np.int32, copy=True), lens
    rep = np.where(hit, 2, 1)
    pos = np.cumsum(rep) - rep                  # output index per input
    out = np.empty(len(values) + n_hit, dtype=np.int32)
    out[pos] = np.where(hit, a, values)
    out[pos[hit] + 1] = b
    doc_of = np.searchsorted(offsets, np.flatnonzero(hit),
                             side="right") - 1
    added = np.bincount(doc_of, minlength=len(lens))
    return out, lens + added


def _rebuild_batch(batch: pa.Table, values: np.ndarray,
                   lens: np.ndarray) -> pa.Table:
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    arr = pa.ListArray.from_arrays(
        pa.array(offs.astype(np.int32)),
        pa.array(values, type=pa.int32())) if offs[-1] < 2**31 \
        else pa.LargeListArray.from_arrays(pa.array(offs),
                                           pa.array(values,
                                                    type=pa.int32()))
    i = batch.schema.get_field_index("tokens")
    out = batch.set_column(i, "tokens", arr)
    if "n_tok" in batch.column_names:
        j = out.schema.get_field_index("n_tok")
        out = out.set_column(j, "n_tok",
                             pa.array(lens.astype(np.int32)))
    return out


def _top_pair(pair_ds):
    """Distributed argmax over the summed pair counts: per-block best row
    (one np.lexsort-free argmin on the (-count, pair) order), tiny final
    reduce on the driver."""
    def best(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"pair": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        pair = batch.column("pair").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((pair, -n))
        i = order[0]
        return pa.table({"pair": pa.array([pair[i]], type=pa.int64()),
                         "n": pa.array([int(n[i])], type=pa.int64())})

    rows = pair_ds.map_batches(best, batch_format="pyarrow").take_all()
    if not rows:
        return None
    top = min(rows, key=lambda r: (-r["n"], r["pair"]))
    key = int(top["pair"])
    return key // int(_PAIR_SHIFT), key % int(_PAIR_SHIFT), int(top["n"])


def train_bpe(ds, n_merges: int, *, first_new_id: int | None = None,
              min_count: int = 2, checkpoint_path: str | None = None):
    """Learn ``n_merges`` BPE merges over a token-table Dataset.

    Returns ``(merges, merged_ds)`` where ``merges`` is the ordered list
    of ``{rank, pair_a, pair_b, new_id, pair_count}`` and ``merged_ds``
    is the corpus with all merges applied.  Stops early when no pair
    reaches ``min_count``.  ``first_new_id`` defaults to one past the
    corpus max token (computed distributed).

    ``checkpoint_path``: JSON file the merge table is rewritten to after
    EVERY round; if it already exists, training resumes after its last
    recorded merge (the recorded rounds re-apply as one cheap vectorized
    pass — no pair counting — so an interrupted k-round job repeats none
    of its k exchanges).  The merge table IS the whole training state:
    merge application is deterministic given the table, which is what
    makes round-granular resume sound."""
    import json as _json
    import os as _os

    from ray.data.aggregate import Sum

    from tokrle.stages.encoder import _flat_tokens

    if first_new_id is None:
        def batch_max(batch: pa.Table) -> pa.Table:
            values, _ = _flat_tokens(batch)
            hi = int(values.max()) if len(values) else -1
            return pa.table({"hi": pa.array([hi], type=pa.int64())})

        from ray.data.aggregate import Max
        first_new_id = int(ds.map_batches(
            batch_max, batch_format="pyarrow").aggregate(
                Max("hi", alias_name="hi"))["hi"]) + 1

    def partial_counts(batch: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(batch)
        uniq, cnts = _pair_counts_partial(values, offsets)
        return pa.table({"pair": pa.array(uniq, type=pa.int64()),
                         "cnt": pa.array(cnts.astype(np.int64),
                                         type=pa.int64())})

    import functools

    merges: list[dict] = []
    if checkpoint_path and _os.path.exists(checkpoint_path):
        with open(checkpoint_path) as f:
            merges = _json.load(f)
        if merges:
            if first_new_id != merges[0]["new_id"] - merges[0]["rank"]:
                raise ValueError(
                    "checkpoint was trained with a different "
                    "first_new_id; refusing to mix id spaces")
            ds = apply_bpe(ds, merges)
    ds = ds.materialize()
    for rank in range(len(merges), n_merges):
        counts = ds.map_batches(partial_counts, batch_format="pyarrow") \
            .groupby("pair").aggregate(Sum("cnt", alias_name="n"))
        top = _top_pair(counts)
        if top is None or top[2] < min_count:
            break
        a, b, cnt = top
        new_id = first_new_id + rank
        merges.append({"rank": rank, "pair_a": a, "pair_b": b,
                       "new_id": new_id, "pair_count": cnt})
        if checkpoint_path:
            tmp = checkpoint_path + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(merges, f)
            _os.replace(tmp, checkpoint_path)       # atomic per round
        ds = ds.map_batches(
            functools.partial(_apply_one_merge, a=a, b=b, new_id=new_id),
            batch_format="pyarrow").materialize()
    return merges, ds


def _apply_one_merge(batch: pa.Table, *, a: int, b: int,
                     new_id: int) -> pa.Table:
    from tokrle.stages.encoder import _flat_tokens

    values, offsets = _flat_tokens(batch)
    out, lens, _ = apply_merge_flat(values, offsets, a, b, new_id)
    return _rebuild_batch(batch, out, lens)


def apply_bpe(ds, merges: list[dict]):
    """Apply a learned merge table to a token-table Dataset: ONE
    map_batches pass, merges applied in rank order inside the batch."""
    from tokrle.stages.encoder import _flat_tokens

    ordered = sorted(merges, key=lambda m: m["rank"])

    def apply_all(batch: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(batch)
        lens = np.diff(offsets)
        for m in ordered:
            values, lens, _ = apply_merge_flat(
                values, offsets, m["pair_a"], m["pair_b"], m["new_id"])
            offsets = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
        return _rebuild_batch(batch, values.astype(np.int32), lens)

    return ds.map_batches(apply_all, batch_format="pyarrow")


def expand_bpe(ds, merges: list[dict]):
    """Exact inverse of :func:`apply_bpe`: splice merges back in reverse
    rank order — ``expand_bpe(apply_bpe(ds, m), m)`` reproduces the
    original token arrays bit-identically."""
    from tokrle.stages.encoder import _flat_tokens

    ordered = sorted(merges, key=lambda m: -m["rank"])

    def expand_all(batch: pa.Table) -> pa.Table:
        values, offsets = _flat_tokens(batch)
        lens = np.diff(offsets)
        for m in ordered:
            values, lens = expand_merge_flat(
                values, offsets, m["pair_a"], m["pair_b"], m["new_id"])
            offsets = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
        return _rebuild_batch(batch, values.astype(np.int32), lens)

    return ds.map_batches(expand_all, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# pure-Python reference (tests only): the sequential greedy definition


def reference_train_bpe(docs: list[list[int]], n_merges: int,
                        first_new_id: int, min_count: int = 2):
    from collections import Counter

    docs = [list(d) for d in docs]
    merges = []
    for rank in range(n_merges):
        c: Counter = Counter()
        for d in docs:
            for i in range(len(d) - 1):
                c[(d[i], d[i + 1])] += 1
        if not c:
            break
        (a, b), cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        new_id = first_new_id + rank
        merges.append({"rank": rank, "pair_a": a, "pair_b": b,
                       "new_id": new_id, "pair_count": cnt})
        docs = [reference_apply_merge(d, a, b, new_id) for d in docs]
    return merges, docs


def reference_apply_merge(d: list[int], a: int, b: int,
                          new_id: int) -> list[int]:
    out: list[int] = []
    i = 0
    while i < len(d):
        if i < len(d) - 1 and d[i] == a and d[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(d[i])
            i += 1
    return out
