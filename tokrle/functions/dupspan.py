"""Duplicated n-gram span detection / removal (exact substring dedup in
the style of Lee et al., "Deduplicating Training Data Makes Language
Models Better" — n-gram-counting formulation rather than suffix arrays).

A k-word n-gram is FREQUENT when it occurs at least ``min_count`` times
corpus-wide; every word position covered by a frequent gram (the union
of ``[p, p+k)`` over frequent gram starts ``p``) is a duplicated-span
position.  128-bit gram hashes (the :mod:`tokrle.functions.decontam`
hasher) stand in for the literal strings; the SQL oracle compares
strings, so parity can break only on a 128-bit collision.

Scale shape (100 TB), two passes over the text like the reference
algorithm — document text NEVER enters an exchange:

1. count pass: per-batch partial gram counts (map-side combine of
   (h1, h2, c)) -> one hash aggregate -> ``frequent`` pairs.
2. occurrence pass: per-batch gram-start rows (doc_id, source, p,
   h1, h2) — fixed-width ints — tagged-union co-grouped with the
   frequent pairs on (h1, h2) (same empty-partition-safe pattern as
   :func:`tokrle.functions.dedup.semi_join`, which is single-key),
   then hash-co-located by doc_id for an exact per-doc interval union
   (one vectorized pass per block, docs offset into disjoint
   coordinate ranges so spans never merge across docs).

:func:`remove_dup_spans` (the rewriting variant) broadcasts the
frequent-pair index instead — right when the duplicated-gram set is
benchmark-/boilerplate-sized; at corpus scale where that set is huge,
use the join path of :func:`dup_span_source_stats` to locate spans and
rewrite from the occurrence join instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tokrle.functions.dedup import auto_concurrency as _auto

from tokrle.functions.decontam import word_ngram_hashes

# doc-local positions are < 2^32; offsetting doc codes by 2^32 keeps
# per-doc intervals in disjoint coordinate ranges for the fused union
_DOC_STRIDE = np.int64(1) << np.int64(32)


def _gram_count_partials(batch: pa.Table, *, k: int,
                         text_col: str) -> pa.Table:
    h1, h2, _ = word_ngram_hashes(batch.column(text_col), k)
    if len(h1) == 0:
        return pa.table({"h1": pa.array([], pa.int64()),
                         "h2": pa.array([], pa.int64()),
                         "c": pa.array([], pa.int64())})
    pair = np.stack([h1.view(np.int64), h2.view(np.int64)], axis=1)
    uniq, counts = np.unique(pair, axis=0, return_counts=True)
    return pa.table({"h1": pa.array(uniq[:, 0], pa.int64()),
                     "h2": pa.array(uniq[:, 1], pa.int64()),
                     "c": pa.array(counts.astype(np.int64), pa.int64())})


def frequent_grams(ds, *, k: int = 8, min_count: int = 2,
                   text_col: str = "text"):
    """(h1, h2) pairs of k-grams occurring >= min_count times corpus-wide.
    One hash aggregate over map-side-combined counts."""
    import pyarrow.compute as pc

    from tokrle.functions.dedup import _join_partitions, _upstream_size_hint

    # this groupby is the PIPELINE'S FIRST exchange, so it doesn't inherit
    # the byte-aware parallelism _group_blocks pins later; pin it so the
    # finalize emits CPU-sized output partitions instead of Ray's 200
    # (A/B at sf0.1: 6.9 -> ~5.9 s; the sort exchange itself dominates —
    # the hash-shuffle strategy was also tried and measured WORSE, 17 s)
    ds.context.default_hash_shuffle_parallelism = _join_partitions(
        None, size_bytes=_upstream_size_hint(ds))
    counts = ds.map_batches(
        lambda b: _gram_count_partials(b, k=k, text_col=text_col),
        batch_format="pyarrow") \
        .groupby(["h1", "h2"]).sum("c")
    return counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("sum(c)"), min_count))
        .select(["h1", "h2"]),
        batch_format="pyarrow")


def _gram_occurrences(batch: pa.Table, *, k: int, text_col: str,
                      id_col: str, carry: str | None) -> pa.Table:
    h1, h2, offs = word_ngram_hashes(batch.column(text_col), k)
    n = len(h1)
    per_doc = np.diff(offs)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), per_doc)
    p = (np.arange(n, dtype=np.int64)
         - np.repeat(offs[:-1], per_doc)) if n else np.empty(0, np.int64)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)[doc_idx]
    cols = {id_col: pa.array(ids, pa.int64()),
            "p": pa.array(p, pa.int64()),
            "h1": pa.array(h1.view(np.int64), pa.int64()),
            "h2": pa.array(h2.view(np.int64), pa.int64())}
    if carry is not None:
        cols[carry] = batch.column(carry).take(pa.array(doc_idx))
    return pa.table(cols)


def covered_gram_starts(ds, freq_ds, *, k: int = 8, text_col: str = "text",
                        id_col: str = "doc_id", carry: str | None = None,
                        num_partitions: int | None = None):
    """Gram-start rows of ``ds`` whose gram is in ``freq_ds`` — a pair-key
    semi-join as a tagged-union co-group (fixed-width int rows only)."""
    from tokrle.functions.dedup import _group_blocks

    occ = ds.map_batches(
        lambda b: _gram_occurrences(b, k=k, text_col=text_col,
                                    id_col=id_col, carry=carry),
        batch_format="pyarrow")
    occ_schema = [(id_col, pa.int64()), ("p", pa.int64()),
                  ("h1", pa.int64()), ("h2", pa.int64())] \
        + ([(carry, pa.string())] if carry else [])

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            cols = {}
            for name, typ in occ_schema:
                if name in batch.column_names:
                    cols[name] = batch.column(name).cast(typ)
                else:
                    cols[name] = pa.nulls(len(batch), type=typ)
            cols["_side"] = pa.array(
                np.full(len(batch), side, dtype=np.int8))
            return pa.table(cols)
        return fn

    both = occ.map_batches(tag(0), batch_format="pyarrow").union(
        freq_ds.map_batches(tag(1), batch_format="pyarrow"))
    grouped = _group_blocks(both, keys=["h1", "h2"],
                            num_partitions=num_partitions)

    def filter_block(batch: pa.Table) -> pa.Table:
        side = batch.column("_side").to_numpy(zero_copy_only=False)
        h1 = batch.column("h1").to_numpy(zero_copy_only=False)
        h2 = batch.column("h2").to_numpy(zero_copy_only=False)
        left = side == 0
        right = ~left
        if not right.any() or not left.any():
            keep = np.zeros(len(batch), dtype=bool)
        else:
            m = pd.DataFrame({"h1": h1[left], "h2": h2[left]}).merge(
                pd.DataFrame({"h1": h1[right], "h2": h2[right],
                              "_hit": np.int8(1)}).drop_duplicates(
                                  ["h1", "h2"]),
                on=["h1", "h2"], how="left")
            keep = np.zeros(len(batch), dtype=bool)
            keep[np.flatnonzero(left)] = \
                m["_hit"].notna().to_numpy()
        return batch.filter(pa.array(keep)).drop_columns(
            ["h1", "h2", "_side"])

    return grouped.map_batches(filter_block, batch_size=None,
                               batch_format="pyarrow")


def dup_span_word_counts(covered_ds, *, k: int, id_col: str = "doc_id",
                         carry: str | None = None,
                         num_partitions: int | None = None):
    """Per-doc duplicated-word counts: hash-co-locate covered gram starts
    by doc, then ONE vectorized interval union per block (docs offset
    into disjoint ranges, so cross-doc spans can never merge)."""
    from tokrle.functions.dedup import _group_blocks

    grouped = _group_blocks(covered_ds, keys=[id_col],
                            num_partitions=num_partitions)

    def union_block(batch: pa.Table) -> pa.Table:
        out_schema = [(id_col, pa.int64()), ("dup_words", pa.int64())] \
            + ([(carry, pa.string())] if carry else [])
        if len(batch) == 0:
            return pa.schema(out_schema).empty_table()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        p = batch.column("p").to_numpy(zero_copy_only=False)
        codes, uniques = pd.factorize(ids)
        x = codes.astype(np.int64) * _DOC_STRIDE + p
        order = np.argsort(x, kind="stable")
        s = x[order]
        e = s + k
        cme = np.maximum.accumulate(e)
        new_span = np.concatenate(([True], s[1:] > cme[:-1]))
        span_starts = np.flatnonzero(new_span)
        span_len = (np.maximum.reduceat(e, span_starts)
                    - s[span_starts])
        span_doc = codes[order][span_starts]
        per_doc = np.zeros(len(uniques), dtype=np.int64)
        np.add.at(per_doc, span_doc, span_len)
        cols = {id_col: pa.array(uniques.astype(np.int64), pa.int64()),
                "dup_words": pa.array(per_doc, pa.int64())}
        if carry is not None:
            first = np.zeros(len(uniques), dtype=np.int64)
            first[codes[::-1]] = np.arange(len(ids))[::-1]
            cols[carry] = batch.column(carry).take(pa.array(first))
        return pa.table(cols)

    return grouped.map_batches(union_block, batch_size=None,
                               batch_format="pyarrow")


def _mask_rewrite(texts: pa.Array, doc_idx: np.ndarray,
                  p_local: np.ndarray, k: int) -> pa.Array:
    """Rewrite ``texts`` with every word in ``[p, p+k)`` of each
    (doc_idx, p_local) span start removed: one +1/-1 delta array + one
    cumulative sum builds the keep mask, one Arrow filter + binary_join
    rebuilds the strings.  Shared by the broadcast rewriter (starts from
    in-task hash hits) and the join-path rewriter (starts shipped to the
    doc's block by the exchange)."""
    import pyarrow.compute as pc

    from tokrle.kernels.segments import segment_sums

    words = pc.split_pattern(texts, " ")
    words = words.combine_chunks() if isinstance(
        words, pa.ChunkedArray) else words
    n_words = pc.list_value_length(words).to_numpy(
        zero_copy_only=False).astype(np.int64)
    word_offs = np.concatenate(([0], np.cumsum(n_words)))
    keep = np.ones(int(word_offs[-1]), dtype=bool)
    if len(doc_idx):
        starts = word_offs[doc_idx] + p_local
        delta = np.zeros(len(keep) + 1, dtype=np.int64)
        np.add.at(delta, starts, 1)
        np.add.at(delta, starts + k, -1)
        keep &= np.cumsum(delta[:-1]) == 0
    flat = words.flatten()
    kept_words = flat.filter(pa.array(keep))
    kept_per_doc = segment_sums(keep.astype(np.int64), word_offs)
    new_offs = np.concatenate(
        ([0], np.cumsum(kept_per_doc))).astype(np.int32)
    return pc.binary_join(
        pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()),
                                 kept_words), " ")


class _SpanRemover:
    """Stateful stage for :func:`remove_dup_spans`: the frequent-pair
    index is materialized once per actor; each batch is rewritten with
    one hash join + one boolean word mask + one vectorized re-join."""

    def __init__(self, index_ref, *, k: int, text_col: str) -> None:
        import ray

        h1, h2 = ray.get(index_ref) if not isinstance(index_ref, tuple) \
            else index_ref
        self._index = pd.DataFrame({"h1": h1, "h2": h2})
        self._k = k
        self._text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self._text_col)
        texts = texts.combine_chunks() if isinstance(
            texts, pa.ChunkedArray) else texts
        h1, h2, offs = word_ngram_hashes(texts, self._k)
        doc_idx = np.empty(0, dtype=np.int64)
        p_hit = np.empty(0, dtype=np.int64)
        if len(h1) and len(self._index):
            per_doc = np.diff(offs)
            all_doc = np.repeat(
                np.arange(len(batch), dtype=np.int64), per_doc)
            p_local = (np.arange(len(h1), dtype=np.int64)
                       - np.repeat(offs[:-1], per_doc))
            q = pd.DataFrame({"h1": h1.view(np.int64),
                              "h2": h2.view(np.int64),
                              "g": np.arange(len(h1), dtype=np.int64)})
            hits = q.merge(self._index, on=["h1", "h2"], how="inner")
            if len(hits):
                g = hits["g"].to_numpy()
                doc_idx = all_doc[g]
                p_hit = p_local[g]
        rebuilt = _mask_rewrite(texts, doc_idx, p_hit, self._k)
        i = batch.column_names.index(self._text_col)
        return batch.set_column(i, self._text_col, rebuilt)


def remove_dup_spans(ds, *, k: int = 8, min_count: int = 2,
                     text_col: str = "text", id_col: str = "doc_id",
                     concurrency=None,
                     max_index_rows: int = 50_000_000):
    """Rewrite ``text`` with every duplicated span's words removed.

    Broadcast variant while the frequent-pair index fits
    ``max_index_rows`` (~800 MB at the default): the index is pulled to
    the driver and ``ray.put`` once, and the rewrite is one stateful
    pass over the text.  Above the cap — a crawl-scale frequent-gram
    set no longer fits a broadcast — it falls through to
    :func:`remove_dup_spans_join`, which never materializes the index
    anywhere (r4 verdict item 3).  Both paths produce byte-identical
    output (pinned by tests/test_functions.py)."""
    import ray

    # materialize once: count() comes free from block metadata and BOTH
    # branches consume the same executed blocks (to_pandas here, the
    # covered-starts join below) instead of re-running the corpus scan
    # + gram-count shuffle per consumer; blocks spill, never the driver
    freq = frequent_grams(ds, k=k, min_count=min_count,
                          text_col=text_col).materialize()
    if freq.count() > max_index_rows:
        return remove_dup_spans_join(ds, k=k, min_count=min_count,
                                     text_col=text_col, id_col=id_col,
                                     freq=freq)
    t = freq.to_pandas()
    index_ref = ray.put((t["h1"].to_numpy(), t["h2"].to_numpy()))
    return ds.map_batches(
        _SpanRemover,
        fn_constructor_kwargs={"index_ref": index_ref, "k": k,
                               "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency or _auto())


def remove_dup_spans_join(ds, *, k: int = 8, min_count: int = 2,
                          text_col: str = "text", id_col: str = "doc_id",
                          num_partitions: int | None = None,
                          freq=None):
    """Join-path duplicated-span rewrite: no broadcast, no driver-side
    index — the scale path when the frequent-gram set itself is huge
    (Lee et al. operate at exactly that scale).

    Shape: ``covered_gram_starts``'s (h1, h2) co-group semi-join ships
    each doc ONLY its own covered starts as fixed-width int rows, a
    second hash exchange co-locates those starts with their doc row,
    and each block runs the same vectorized delta-mask rewrite kernel
    as the broadcast path (:func:`_mask_rewrite`).  Text crosses the
    wire once (the doc-side of the final co-location); gram hashes and
    positions are the only other exchange payload."""
    from tokrle.functions.dedup import _group_blocks

    if freq is None:
        freq = frequent_grams(ds, k=k, min_count=min_count,
                              text_col=text_col)
    covered = covered_gram_starts(ds, freq, k=k, text_col=text_col,
                                  id_col=id_col,
                                  num_partitions=num_partitions)
    # arrow schema via a one-row probe: ds.schema() can surface pandas
    # block types (plain Python classes) for from_pandas inputs, which
    # pa.nulls rejects
    try:
        probe = ds.take_batch(1, batch_format="pyarrow")
    except (ValueError, StopIteration):
        return ds  # empty corpus: nothing to rewrite
    names = list(probe.column_names)
    types = [probe.schema.field(n).type for n in names]

    def tag_doc(batch: pa.Table) -> pa.Table:
        cols = {n: batch.column(n) for n in names}
        cols["p"] = pa.nulls(len(batch), pa.int64())
        cols["_side"] = pa.array(np.zeros(len(batch), dtype=np.int8))
        return pa.table(cols)

    def tag_cov(batch: pa.Table) -> pa.Table:
        cols = {}
        for n, t in zip(names, types):
            cols[n] = batch.column(n) if n == id_col \
                else pa.nulls(len(batch), t)
        cols["p"] = batch.column("p")
        cols["_side"] = pa.array(np.ones(len(batch), dtype=np.int8))
        return pa.table(cols)

    both = ds.map_batches(tag_doc, batch_format="pyarrow").union(
        covered.map_batches(tag_cov, batch_format="pyarrow"))
    grouped = _group_blocks(both, keys=[id_col],
                            num_partitions=num_partitions)
    out_schema = pa.schema(list(zip(names, types)))
    text_i = names.index(text_col)

    def rewrite_block(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        side = batch.column("_side").to_numpy(zero_copy_only=False)
        docs = batch.filter(pa.array(side == 0))
        if len(docs) == 0:
            return out_schema.empty_table()
        cov = batch.filter(pa.array(side == 1))
        texts = docs.column(text_col)
        texts = texts.combine_chunks() if isinstance(
            texts, pa.ChunkedArray) else texts
        if len(cov):
            # doc ids are unique, so position-of-id is a plain index map
            pos = pd.Series(np.arange(len(docs), dtype=np.int64),
                            index=docs.column(id_col).to_numpy(
                                zero_copy_only=False))
            doc_idx = pos.loc[cov.column(id_col).to_numpy(
                zero_copy_only=False)].to_numpy()
            p_local = cov.column("p").to_numpy(zero_copy_only=False)
        else:
            doc_idx = np.empty(0, dtype=np.int64)
            p_local = np.empty(0, dtype=np.int64)
        rebuilt = _mask_rewrite(texts, doc_idx, p_local, k)
        return docs.set_column(text_i, text_col, rebuilt) \
            .drop_columns(["p", "_side"])

    return grouped.map_batches(rewrite_block, batch_size=None,
                               batch_format="pyarrow")


class _SpanStatsCounter:
    """Stateful stage for the broadcast path of
    :func:`dup_span_source_stats`: frequent-pair index pulled once per
    actor; each batch does ONE pass — gram hashes, index hits, the same
    +1/-1 delta coverage union as :class:`_SpanRemover`, then per-source
    partials (n_docs, total_words, dup_words) via factorize+bincount."""

    def __init__(self, index_ref, *, k: int, text_col: str,
                 source_col: str) -> None:
        import ray

        h1, h2 = ray.get(index_ref) if not isinstance(index_ref, tuple) \
            else index_ref
        self._index = pd.DataFrame({"h1": h1, "h2": h2})
        self._k = k
        self._text_col = text_col
        self._source_col = source_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from tokrle.kernels.segments import segment_sums

        texts = batch.column(self._text_col)
        texts = texts.combine_chunks() if isinstance(
            texts, pa.ChunkedArray) else texts
        n_words = (pc.count_substring(texts, " ").to_numpy(
            zero_copy_only=False) + 1).astype(np.int64)
        word_offs = np.concatenate(([0], np.cumsum(n_words)))
        dup_per_doc = np.zeros(len(batch), dtype=np.int64)
        h1, h2, offs = word_ngram_hashes(texts, self._k)
        if len(h1) and len(self._index):
            per_doc = np.diff(offs)
            doc_idx = np.repeat(
                np.arange(len(batch), dtype=np.int64), per_doc)
            p_local = (np.arange(len(h1), dtype=np.int64)
                       - np.repeat(offs[:-1], per_doc))
            q = pd.DataFrame({"h1": h1.view(np.int64),
                              "h2": h2.view(np.int64),
                              "g": np.arange(len(h1), dtype=np.int64)})
            hits = q.merge(self._index, on=["h1", "h2"], how="inner")
            if len(hits):
                g = hits["g"].to_numpy()
                starts = word_offs[doc_idx[g]] + p_local[g]
                delta = np.zeros(int(word_offs[-1]) + 1, dtype=np.int64)
                np.add.at(delta, starts, 1)
                np.add.at(delta, starts + self._k, -1)
                covered = np.cumsum(delta[:-1]) > 0
                dup_per_doc = segment_sums(covered.astype(np.int64),
                                           word_offs)
        src = batch.column(self._source_col).to_numpy(
            zero_copy_only=False)
        codes, uniq = pd.factorize(src)
        return pa.table({
            self._source_col: pa.array(uniq),
            "n_docs": pa.array(np.bincount(codes, minlength=len(uniq))
                               .astype(np.int64), pa.int64()),
            "total_words": pa.array(
                np.bincount(codes, weights=n_words,
                            minlength=len(uniq)).astype(np.int64),
                pa.int64()),
            "dup_words": pa.array(
                np.bincount(codes, weights=dup_per_doc,
                            minlength=len(uniq)).astype(np.int64),
                pa.int64()),
        })


def dup_span_source_stats(ds, *, k: int = 8, min_count: int = 2,
                          text_col: str = "text", id_col: str = "doc_id",
                          source_col: str = "source",
                          max_index_rows: int = 50_000_000,
                          concurrency=None) -> pd.DataFrame:
    """Per-source (n_docs, total_words, dup_words).

    Two execution paths, picked by the frequent-pair index size:

    - BROADCAST (index <= ``max_index_rows``, ~800 MB): the index is
      pulled to the driver once and ``ray.put``; everything after the
      ``frequent_grams`` exchange is ONE stateful pass over the text
      (hits + coverage union + per-source partials batch-local) and a
      source-cardinality groupby.  Measured at sf0.1/32cpu this halves
      the query (the occurrence exchange it removes carried one int row
      per gram).
    - JOIN (index too large for a broadcast): the original
      tagged-union co-group semi-join over (h1, h2) plus the doc-group
      interval union — exchanges move only fixed-width int rows, never
      text."""
    freq = frequent_grams(ds, k=k, min_count=min_count,
                          text_col=text_col).materialize()
    if freq.count() <= max_index_rows:
        import ray

        t = freq.to_pandas()
        index_ref = ray.put((t["h1"].to_numpy(), t["h2"].to_numpy()))
        from tokrle.functions.fold import fold_sum_partials

        # _SpanStatsCounter already shrinks each batch to one row per
        # source; a groupby exchange over those partials would pay the
        # aggregator-pool constant for a cardinality-bounded result —
        # driver-fold instead (see fold.py scale rationale)
        parts = ds.map_batches(
            _SpanStatsCounter,
            fn_constructor_kwargs={"index_ref": index_ref, "k": k,
                                   "text_col": text_col,
                                   "source_col": source_col},
            batch_format="pyarrow", concurrency=concurrency or _auto())
        out = fold_sum_partials(parts, [source_col],
                                ["n_docs", "total_words", "dup_words"])
        return out.sort_values(source_col).reset_index(drop=True)

    import pyarrow.compute as pc

    from tokrle.functions.fold import source_sums

    covered = covered_gram_starts(ds, freq, k=k, text_col=text_col,
                                  id_col=id_col, carry=source_col)
    per_doc = dup_span_word_counts(covered, k=k, id_col=id_col,
                                   carry=source_col)
    dup = source_sums(per_doc, source_col, ["dup_words"])

    def totals(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        spaces = pc.count_substring(texts, " ").to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({source_col: batch.column(source_col),
                         "total_words": pa.array(spaces + 1, pa.int64())})

    tot = source_sums(ds.map_batches(totals, batch_format="pyarrow"),
                      source_col, ["total_words"], count_alias="n_docs")
    out = tot.merge(dup, on=source_col, how="left")
    out["dup_words"] = out["dup_words"].fillna(0).astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_words"] = out["total_words"].astype("int64")
    out = out[[source_col, "n_docs", "total_words", "dup_words"]]
    return out.sort_values(source_col).reset_index(drop=True)
