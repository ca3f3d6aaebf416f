"""End-to-end training-data preparation: the flagship composition as a
reusable pipeline (also exposed as ``python -m tokrle.cli prep``).

    quality filter -> exact dedup -> eval-split decontamination ->
    tokenize -> fixed-length packing -> (caller encodes)

Returns a lazy token-table Dataset of packed training examples
``(doc_id, tokens, n_tok, source)`` ready for ``encode_tokens`` /
``encode_corpus``.  Scale shape: two exchanges total — the dedup
survivors' hash shuffle + doc_id re-join, and packing's key
co-location; everything else (filter, contamination flagging against a
broadcast n-gram index, tokenize) is a narrow map stage.
"""

from __future__ import annotations

import pyarrow as pa


def training_examples(docs_path: str, *, seq_len: int = 512,
                      eos: int = 3, pad: int = 0,
                      min_words: int = 20, max_frac_den: int = 5,
                      eval_mask: int | None = 15, decontam_k: int = 8):
    """documents parquet path -> packed-example token table (lazy).

    ``eval_mask``: docs with ``doc_id & eval_mask == 0`` form the
    held-out eval split; training docs sharing any ``decontam_k``-gram
    with it are dropped.  Pass ``None`` to skip decontamination.
    """
    import functools

    import pyarrow.compute as pc
    import ray.data

    from tokrle.functions.decontam import flag_contaminated
    from tokrle.functions.dedup import exact_dedup
    from tokrle.functions.packing import pack_sequences
    from tokrle.functions.text import quality_filter
    from tokrle.sources.tokens import tokenize_batch

    ds = ray.data.read_parquet(docs_path,
                               columns=["doc_id", "source", "text"])
    passing = ds.map_batches(
        functools.partial(quality_filter, min_words=min_words,
                          max_frac_den=max_frac_den),
        batch_format="pyarrow")
    clean = exact_dedup(passing, key="text", return_full_rows=True)

    if eval_mask is not None:
        import numpy as np

        mask = eval_mask

        def drop_eval(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array((ids & mask) != 0))

        train = clean.map_batches(drop_eval, batch_format="pyarrow")
        idexpr = pc.Expression._call(
            "bit_wise_and", [pc.field("doc_id"), pc.scalar(mask)])
        eval_ds = ray.data.read_parquet(docs_path,
                                        columns=["doc_id", "text"],
                                        filter=(idexpr == 0))
        flagged = flag_contaminated(train, eval_ds, k=decontam_k)

        def keep_clean(batch: pa.Table) -> pa.Table:
            m = batch.column("contaminated").to_numpy(
                zero_copy_only=False)
            return batch.filter(pa.array(~m)).select(
                ["doc_id", "source", "text"])

        clean = flagged.map_batches(keep_clean, batch_format="pyarrow")

    toks = clean.map_batches(tokenize_batch, batch_format="pyarrow")
    packed = pack_sequences(toks, seq_len=seq_len, eos=eos, pad=pad)

    def as_token_table(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(batch.column("input_ids")) \
            .cast(pa.int32())
        # example_idx restarts at 0 per packing key, so the key must be
        # part of the id — doc_id-keyed consumers (upsert, dedup, joins)
        # would otherwise conflate unrelated examples across sources
        ids = pc.binary_join_element_wise(
            batch.column("key"),
            pc.cast(batch.column("example_idx"), pa.string()), "#")
        return pa.table({
            "doc_id": ids,
            "tokens": batch.column("input_ids"),
            "n_tok": n,
            "source": batch.column("key"),
        })

    return packed.map_batches(as_token_table, batch_format="pyarrow")
