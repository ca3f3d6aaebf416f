"""Token-table sources.

The engine's input shape (per BASELINE.json input_hint) is a Parquet table
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``.
The sandbox testdata has no such table, so it is derived deterministically:

- :func:`documents_to_tokens` — tokenize ``documents.parquet`` with a
  vectorized whitespace tokenizer whose token ids are SQL-expressible
  (``token = ascii(first_char) * 32 + length(word)``), so DuckDB oracles can
  recompute every aggregate over the decoded output exactly;
- :func:`synth_tokens` — a larger deterministic Zipf corpus for benchmarks,
  generated per-doc from a counter-based RNG (seed = doc index), so the
  result is identical under any partitioning / parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# keep in sync with the DuckDB oracle SQL in __ray_entry__.py
TOKEN_SQL_EXPR = "ascii(w) * 32 + length(w)"


def tokenize_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> token-table rows, fully vectorized over Arrow buffers.

    token(word) = codepoint(first char) * 32 + char_len(word): exactly
    DuckDB's ``ascii(w) * 32 + length(w)`` for ANY UTF-8 input — the first
    code point is decoded from the UTF-8 lead-byte pattern and the length
    counts characters (non-continuation bytes), not bytes, so the SQL
    contract holds on multilingual corpora too.  All straight off the
    flattened word array's offsets/data buffers with NumPy — no Python
    per-row loop.
    """
    import pyarrow.compute as pc

    text = batch.column("text")
    words = pc.split_pattern(text, " ")  # list<string> per doc
    la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    # per-doc offsets recomputed from value lengths (robust to array slicing)
    per_doc = pc.list_value_length(la).to_numpy(zero_copy_only=False)
    doc_offsets = np.concatenate(([0], np.cumsum(per_doc))).astype(np.int64)
    flat = la.flatten()  # StringArray of all words, doc order preserved
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    # word lengths + first code points straight off the string array's buffers
    from tokrle.functions._arrays import string_buffers

    word_offsets, data = string_buffers(flat)
    byte_lengths = np.diff(word_offsets)
    # character length = count of non-continuation bytes per word
    # (one cumsum pass over the text buffer; == byte length for pure ASCII)
    from tokrle.kernels.segments import segment_sums

    # segment_sums only takes offset differences, so the absolute string
    # offsets into the shared data buffer are used directly
    non_cont = ((data & 0xC0) != 0x80).astype(np.int32)
    lengths = segment_sums(non_cont, word_offsets)
    # first code point decoded from the UTF-8 lead byte (+ up to 3
    # continuation bytes, gathered with clamped indices — out-of-range
    # gathers only happen for invalid UTF-8, which Arrow never produces).
    # Empty words take 0 — matches DuckDB's ascii('') == 0.
    nd = len(data)
    if nd and len(byte_lengths):
        safe = np.minimum(word_offsets[:-1], nd - 1)
        b0 = data[safe].astype(np.int32)

        def cont(k: int) -> np.ndarray:
            return data[np.minimum(safe + k, nd - 1)].astype(np.int32) & 0x3F

        c1, c2, c3 = cont(1), cont(2), cont(3)
        first = np.where(
            b0 < 0x80, b0,
            np.where(b0 < 0xE0, ((b0 & 0x1F) << 6) | c1,
                     np.where(b0 < 0xF0,
                              ((b0 & 0x0F) << 12) | (c1 << 6) | c2,
                              ((b0 & 0x07) << 18) | (c1 << 12)
                              | (c2 << 6) | c3)))
        first = np.where(byte_lengths > 0, first, 0)
    else:
        first = np.zeros(len(byte_lengths), dtype=np.int32)
    tokens = (first * 32 + lengths).astype(np.int32)
    tok_list = pa.ListArray.from_arrays(pa.array(doc_offsets, type=pa.int32()),
                                        pa.array(tokens, type=pa.int32()))
    n_tok = np.diff(doc_offsets).astype(np.int32)
    doc_id = pc.cast(batch.column("doc_id"), pa.string())
    return pa.table({
        "doc_id": doc_id,
        "tokens": tok_list,
        "n_tok": pa.array(n_tok, type=pa.int32()),
        "source": batch.column("source"),
    })


def documents_to_tokens(sf_dir: str, *, repeat: int = 1):
    """documents.parquet -> token-table Dataset.

    ``repeat`` > 1 replicates each document deterministically (doc_id gets a
    ``#k`` suffix) — used by the bench to scale volume without external data.
    """
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"])
    ds = ds.map_batches(tokenize_batch, batch_format="pyarrow")
    if repeat > 1:
        def replicate(batch: pa.Table, *, k: int = repeat) -> pa.Table:
            tables = []
            for i in range(k):
                import pyarrow.compute as pc
                t = batch.set_column(
                    batch.schema.get_field_index("doc_id"), "doc_id",
                    pc.binary_join_element_wise(batch.column("doc_id"),
                                                f"#{i}", ""))
                tables.append(t)
            return pa.concat_tables(tables)
        ds = ds.map_batches(replicate, batch_format="pyarrow")
    return ds


def _synth_doc_tokens(doc_index: np.ndarray, vocab: int, mean_len: int,
                      n_sources: int):
    """Deterministic per-doc token generation (counter-based: each doc's RNG
    is seeded by its global index, so output is partitioning-invariant).

    Sources cycle through four value regimes (per FIXTURES.md F1) so codec
    auto-selection and the by-source skew stage have real work:
      regime 0 long_runs    — few values, geometric runs (RLE wins)
      regime 1 low_card     — <=256 distinct ids (dict / 8-bit pack wins)
      regime 2 narrow_range — small window at a large offset (FOR wins)
      regime 3 zipf         — high-cardinality Zipf (bitpack/FSST territory)
    """
    out_tokens = []
    offsets = [0]
    rng_lens = ((doc_index * 2654435761) % (2 * mean_len)) + 1  # 1..2*mean
    for idx, n in zip(doc_index, rng_lens):
        rng = np.random.default_rng(int(idx))
        regime = (int(idx) % n_sources) % 4
        n = int(n)
        if regime == 0:
            vals = rng.integers(0, 16, size=max(n // 32, 1))
            reps = rng.geometric(1 / 32, size=len(vals))
            toks = np.repeat(vals, reps)[:n].astype(np.int32)
            if len(toks) < n:
                toks = np.pad(toks, (0, n - len(toks)),
                              constant_values=int(vals[0]))
        elif regime == 1:
            toks = rng.integers(0, 256, size=n).astype(np.int32)
        elif regime == 2:
            toks = (1_000_000 + (rng.zipf(1.4, n).astype(np.int64) % 2048)) \
                .astype(np.int32)
        else:
            toks = (rng.zipf(1.3, n).astype(np.int64) % vocab).astype(np.int32)
        out_tokens.append(toks)
        offsets.append(offsets[-1] + len(toks))
    flat = np.concatenate(out_tokens) if out_tokens else np.empty(0, np.int32)
    return flat, np.asarray(offsets, dtype=np.int32), rng_lens


def synth_tokens(n_docs: int, *, vocab: int = 32000, mean_len: int = 512,
                 n_sources: int = 20, override_num_blocks: int | None = None):
    """Deterministic synthetic token corpus as a Ray Dataset (for benches).

    Sources are skewed (source id = doc_index % n_sources, but doc length
    depends on the index hash), giving the long-run-heavy vs high-entropy
    mix the skew stage is designed for.
    """
    import ray.data

    ds = ray.data.range(n_docs, override_num_blocks=override_num_blocks)

    def make(batch: dict) -> pa.Table:
        idx = batch["id"].astype(np.int64)
        flat, offsets, _ = _synth_doc_tokens(idx, vocab, mean_len, n_sources)
        tok_list = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                            pa.array(flat, type=pa.int32()))
        return pa.table({
            "doc_id": pa.array([f"doc{int(i)}" for i in idx], type=pa.string()),
            "tokens": tok_list,
            "n_tok": pa.array(np.diff(offsets).astype(np.int32),
                              type=pa.int32()),
            "source": pa.array([f"src{int(i) % n_sources}" for i in idx],
                               type=pa.string()),
        })

    return ds.map_batches(make, batch_format="numpy")
