"""Text-analysis stages for training-data pipelines: token counting,
quality/stopword scoring, language-ID heuristic, fingerprinting.

All vectorized per batch; language-ID is a stateful stage (profile tables
built once per actor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

STOPWORDS = ("the", "a", "of", "and", "to")


def text_stats(batch: pa.Table) -> pa.Table:
    """Per-doc counts used by quality scoring — SQL-matchable definitions:
    n_words = words split on ' '; n_alpha = chars excluding spaces;
    n_stop = words in STOPWORDS."""
    import pyarrow.compute as pc

    text = batch.column("text")
    words = pc.split_pattern(text, " ")
    n_words = pc.list_value_length(words).cast(pa.int64())
    n_chars = pc.utf8_length(text).cast(pa.int64())
    no_space = pc.replace_substring(text, " ", "")
    n_alpha = pc.utf8_length(no_space).cast(pa.int64())
    from tokrle.kernels.segments import segment_sums

    flat = words.combine_chunks().flatten() if isinstance(words, pa.ChunkedArray) \
        else words.flatten()
    is_stop = pc.is_in(flat, value_set=pa.array(STOPWORDS))
    per_doc = pc.list_value_length(words).to_numpy(zero_copy_only=False)
    offsets = np.concatenate(([0], np.cumsum(per_doc, dtype=np.int64)))
    stop_np = is_stop.to_numpy(zero_copy_only=False).astype(np.int64)
    n_stop = segment_sums(stop_np, offsets)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "source": batch.column("source"),
        "lang": batch.column("lang"),
        "n_words": n_words,
        "n_chars": n_chars,
        "n_alpha": n_alpha,
        "n_stop": pa.array(n_stop, type=pa.int64()),
    })


class LangId:
    """Character-trigram language-ID heuristic (stateful actor stage).

    Deterministic per-language trigram profiles are built once per actor in
    __init__ from fixed seed text; prediction = argmax profile overlap of
    the doc's UNIQUE trigrams (first 200 characters).  Fully vectorized:
    trigram codes come straight off the Arrow string buffer, per-doc
    dedupe is a lexsort pass, and each profile scores every doc with one
    np.isin + segment-sum.  A stand-in for fasttext-style LID with the
    same Ray plumbing (actor pool, batch scoring)."""

    SEED_TEXT = {
        "en": "the quick brown fox jumps over the lazy dog and runs away",
        "de": "der schnelle braune fuchs springt ueber den faulen hund und",
        "es": "el rapido zorro marron salta sobre el perro perezoso y corre",
        "fr": "le renard brun rapide saute par dessus le chien paresseux",
        "zh": "kuai su de zong se hu li tiao guo lan gou ran hou pao kai",
    }
    MAX_CHARS = 200

    @staticmethod
    def _tri_codes(b: np.ndarray) -> np.ndarray:
        """Byte-trigram codes at every position of one flat byte array."""
        if len(b) < 3:
            return np.empty(0, dtype=np.uint32)
        b = b.astype(np.uint32)
        return b[:-2] | (b[1:-1] << np.uint32(8)) | (b[2:] << np.uint32(16))

    def __init__(self) -> None:
        self.langs = list(self.SEED_TEXT)
        self.profiles = [
            np.unique(self._tri_codes(
                np.frombuffer(txt.encode(), dtype=np.uint8)))
            for txt in self.SEED_TEXT.values()
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from tokrle.kernels.segments import segment_sums

        head = pc.utf8_slice_codeunits(batch.column("text"), 0,
                                       self.MAX_CHARS)
        arr = head.combine_chunks() if isinstance(head, pa.ChunkedArray) \
            else head
        from tokrle.functions._arrays import string_buffers

        offs, data = string_buffers(arr)
        n = len(arr)
        doc_len = np.diff(offs)
        tri_per_doc = np.maximum(doc_len - 2, 0)
        # trigram codes at every in-doc position (positions crossing a doc
        # boundary dropped via the per-doc count)
        all_codes = self._tri_codes(data[offs[0]:offs[-1]]
                                    if len(data) else data)
        starts = offs[:-1] - offs[0]
        pos = (np.arange(int(tri_per_doc.sum()), dtype=np.int64)
               - np.repeat(np.concatenate(
                   ([0], np.cumsum(tri_per_doc)))[:-1], tri_per_doc)
               + np.repeat(starts, tri_per_doc))
        codes = all_codes[pos] if len(all_codes) else all_codes
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), tri_per_doc)
        # unique (doc, trigram) pairs: lexsort + adjacent-dedupe
        if len(codes):
            order = np.lexsort((codes, doc_idx))
            d, c = doc_idx[order], codes[order]
            keep = np.ones(len(d), dtype=bool)
            keep[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
            d, c = d[keep], c[keep]
        else:
            d = np.empty(0, dtype=np.int64)
            c = codes
        per_doc_u = np.bincount(d, minlength=n)
        u_offs = np.concatenate(([0], np.cumsum(per_doc_u)))
        scores = np.empty((len(self.profiles), n), dtype=np.int64)
        for li, prof in enumerate(self.profiles):
            hit = np.isin(c, prof).astype(np.int64)
            scores[li] = segment_sums(hit, u_offs)
        # first-max tie-break == the dict-order scan it replaces
        pred = np.asarray(self.langs)[np.argmax(scores, axis=0)]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "lang": batch.column("lang"),
            "pred_lang": pa.array(pred, type=pa.string()),
        })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """64-bit rolling-hash document fingerprint over the token stream
    (order-sensitive), vectorized: fp = sum(tokens * 31^pos mod 2^61-1)."""
    from tokrle.stages.encoder import _flat_tokens

    from tokrle.kernels.segments import segment_sums

    values, offsets = _flat_tokens(batch)
    MOD = (1 << 61) - 1
    if len(values):
        within = (np.arange(len(values), dtype=np.int64)
                  - np.repeat(offsets[:-1], np.diff(offsets)))
        pw = np.array(
            [pow(31, int(p), MOD) for p in range(int(within.max()) + 1)],
            dtype=np.uint64) if len(within) else np.empty(0, np.uint64)
        weighted = (values.astype(np.uint64) % MOD) * pw[within] % MOD
        sums = segment_sums(weighted, offsets) % MOD
    else:
        sums = np.zeros(len(batch), dtype=np.uint64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "source": batch.column("source"),
        "fingerprint": pa.array(sums.astype(np.int64), type=pa.int64()),
    })


class RegexTokenCounter:
    """BPE-ish regex token counting.  Pattern kept RE2-compatible so both
    Arrow's count_substring_regex kernel (used here — one vectorized RE2
    scan over the whole batch, verified match-count-identical to Python
    ``re.findall``) and the DuckDB oracle's regexp_extract_all agree.
    Still a callable-class stage so heavier tokenizers (trained BPE
    merges) can hold per-actor state in ``__init__``."""

    PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.count_substring_regex(batch.column("text"), self.PATTERN)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "n_regex_tokens": n.cast(pa.int64()),
        })


def doc_unigram_stats(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (word_count, max_unigram_count) for a token-table batch.
    Fully vectorized: one lexsort of the batch's flat (doc, token) pairs,
    run lengths from boundary diffs, per-doc max run via maximum.reduceat
    — no per-doc loop."""
    from tokrle.stages.encoder import _flat_tokens

    values, offsets = _flat_tokens(batch)
    per_doc = np.diff(offsets)
    n_docs = len(per_doc)
    di = np.repeat(np.arange(n_docs, dtype=np.int64), per_doc)
    maxrun = np.zeros(n_docs, dtype=np.int64)
    if len(values):
        order = np.lexsort((values, di))
        t, d = values[order], di[order]
        runs = np.flatnonzero(np.concatenate(
            ([True], (t[1:] != t[:-1]) | (d[1:] != d[:-1]))))
        runlen = np.diff(np.append(runs, len(t)))
        rd = d[runs]
        first = np.flatnonzero(np.concatenate(([True], rd[1:] != rd[:-1])))
        maxrun[rd[first]] = np.maximum.reduceat(runlen, first)
    return per_doc, maxrun


def quality_filter(batch: pa.Table, *, min_words: int = 20,
                   max_frac_den: int = 5) -> pa.Table:
    """Keep only quality-passing documents rows: at least ``min_words``
    words AND not repetitive (top unigram < 1/``max_frac_den`` of words).
    Input: documents rows (doc_id, source, text); tokenization happens
    in-task, the filter is a vectorized Arrow mask — nothing leaves the
    task but the surviving rows."""
    from tokrle.sources.tokens import tokenize_batch

    toks = tokenize_batch(batch)
    per_doc, maxrun = doc_unigram_stats(toks)
    keep = (per_doc >= min_words) & (maxrun * max_frac_den < per_doc)
    return batch.filter(pa.array(keep))


def doc_repetition_partials(batch: pa.Table, *, min_words: int = 20,
                            max_frac_den: int = 5) -> pa.Table:
    """Per-batch PARTIAL counts for a Gopher-style repetition filter
    (cf. Rae et al. 2021, "Scaling Language Models" repetition rules): a
    doc is *repetitive* when its most frequent unigram accounts for at
    least 1/``max_frac_den`` of its words (docs shorter than ``min_words``
    are not eligible).

    Input: token-table rows (doc_id, tokens list<int32>, source).  Fully
    vectorized: one lexsort of the batch's flat (doc, token) pairs, run
    lengths from boundary diffs, per-doc max run via maximum.reduceat —
    no per-doc loop.  Output: one (source, n_eligible, n_repetitive)
    partial row per source per batch, so the shuffle moves a handful of
    int64 rows, never tokens.
    """
    per_doc, maxrun = doc_unigram_stats(batch)
    eligible = per_doc >= min_words
    repetitive = eligible & (maxrun * max_frac_den >= per_doc)
    src = batch.column("source").to_pandas()
    out = pd.DataFrame({"source": src,
                        "n_eligible": eligible.astype(np.int64),
                        "n_repetitive": repetitive.astype(np.int64)}) \
        .groupby("source", sort=False, as_index=False).sum()
    return pa.Table.from_pandas(out, preserve_index=False)


def doc_ngram_stats(batch: pa.Table) -> dict[str, np.ndarray]:
    """Per-doc word-n-gram repetition measures for the Gopher rules
    (Rae et al. 2021 repetition filters, word-level variants): for every
    token-table row return

    - ``n_words``  — word count,
    - ``c2`` / ``n2`` — count of the MOST FREQUENT word bigram and the
      number of bigram positions (``n_words - 1``),
    - ``dup3`` / ``n3`` — number of trigram positions whose trigram occurs
      at least twice in the doc, and the number of trigram positions.

    Fully vectorized across the whole batch: n-gram keys are the token
    TUPLES themselves (no hash packing — token ids can exceed 2^21, so a
    single-int64 pack could overflow; ``np.lexsort`` takes the columns
    directly), one lexsort per n, run lengths from boundary diffs, per-doc
    folds via ``reduceat``.  No per-doc Python loop.
    """
    from tokrle.stages.encoder import _flat_tokens

    values, offsets = _flat_tokens(batch)
    per_doc = np.diff(offsets)
    n_docs = len(per_doc)
    di = np.repeat(np.arange(n_docs, dtype=np.int64), per_doc)

    def max_run_per_doc(keys: tuple[np.ndarray, ...],
                        d: np.ndarray) -> np.ndarray:
        """Per-doc (max run length, duplicated-position count) over runs of
        identical key tuples within a doc."""
        top = np.zeros(n_docs, dtype=np.int64)
        dup = np.zeros(n_docs, dtype=np.int64)
        if not len(d):
            return top, dup
        # primary sort by doc, then the key tuple (np.lexsort: LAST key
        # is the primary sort key)
        order = np.lexsort(tuple(reversed(keys)) + (d,))
        ks = [k[order] for k in keys]
        ds = d[order]
        change = ds[1:] != ds[:-1]
        for k in ks:
            change = change | (k[1:] != k[:-1])
        starts = np.flatnonzero(np.concatenate(([True], change)))
        runlen = np.diff(np.append(starts, len(ds)))
        rd = ds[starts]
        first = np.flatnonzero(np.concatenate(([True], rd[1:] != rd[:-1])))
        docs = rd[first]
        top[docs] = np.maximum.reduceat(runlen, first)
        dup[docs] = np.add.reduceat(np.where(runlen >= 2, runlen, 0), first)
        return top, dup

    # bigrams: positions i where token i and i+1 are in the same doc
    if len(values) >= 2:
        m2 = di[1:] == di[:-1]
        b0, b1, d2 = values[:-1][m2], values[1:][m2], di[:-1][m2]
    else:
        b0 = b1 = d2 = np.zeros(0, dtype=np.int64)
    c2, _ = max_run_per_doc((b0, b1), d2)
    # trigrams
    if len(values) >= 3:
        m3 = di[2:] == di[:-2]
        t0, t1, t2 = values[:-2][m3], values[1:-1][m3], values[2:][m3]
        d3 = di[:-2][m3]
    else:
        t0 = t1 = t2 = d3 = np.zeros(0, dtype=np.int64)
    _, dup3 = max_run_per_doc((t0, t1, t2), d3)
    return {
        "n_words": per_doc,
        "c2": c2, "n2": np.maximum(per_doc - 1, 0),
        "dup3": dup3, "n3": np.maximum(per_doc - 2, 0),
    }


def gopher_ngram_partials(batch: pa.Table, *, min_words: int = 20,
                          top2_den: int = 18,
                          dup3_num: int = 1, dup3_den: int = 50) -> pa.Table:
    """Per-batch PARTIALS for the Gopher word-n-gram repetition rules:
    among docs with >= ``min_words`` words, count docs whose

    - most frequent word BIGRAM covers >= 1/``top2_den`` of bigram
      positions (``c2 * top2_den >= n2``), and
    - duplicated word TRIGRAMS cover >= ``dup3_num``/``dup3_den`` of
      trigram positions (``dup3 * dup3_den >= n3 * dup3_num``).

    Default thresholds sit near this corpus's 90th percentile (Gopher's
    published cut points flag nothing here), so the rule is exercised.

    All compares are integer cross-multiplications — no float division, so
    the DuckDB oracle reproduces the row set exactly.  Output: one
    (source, n_eligible, n_top_bigram, n_dup_trigram) int64 row per source
    per batch; the downstream shuffle moves these partials, never tokens.
    """
    s = doc_ngram_stats(batch)
    eligible = s["n_words"] >= min_words
    top2 = eligible & (s["c2"] * top2_den >= s["n2"])
    dup3 = eligible & (s["dup3"] * dup3_den >= s["n3"] * dup3_num)
    src = batch.column("source").to_pandas()
    out = pd.DataFrame({"source": src,
                        "n_eligible": eligible.astype(np.int64),
                        "n_top_bigram": top2.astype(np.int64),
                        "n_dup_trigram": dup3.astype(np.int64)}) \
        .groupby("source", sort=False, as_index=False).sum()
    return pa.Table.from_pandas(out, preserve_index=False)


def normalize_text(batch: pa.Table, *, col: str = "text") -> pa.Table:
    """Standard text normalization as pure Arrow RE2/UTF-8 kernels:
    lowercase -> collapse whitespace runs to one space -> trim.  Every
    kernel has an exact DuckDB equivalent (lower / regexp_replace ' +'
    / trim), so the REWRITTEN BYTES are SQL-comparable — the same
    contract as :mod:`tokrle.functions.redact`."""
    import pyarrow.compute as pc

    t = pc.utf8_lower(batch.column(col))
    t = pc.replace_substring_regex(t, r" +", " ")
    t = pc.utf8_trim_whitespace(t)
    return batch.set_column(batch.schema.get_field_index(col), col, t)
