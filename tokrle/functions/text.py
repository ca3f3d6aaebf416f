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
    """Character-n-gram language-ID heuristic (stateful actor stage).

    Deterministic per-language byte-trigram profiles are built once per
    actor in __init__ from fixed seed text; prediction = argmax profile
    overlap.  A stand-in for fasttext-style LID with the same Ray plumbing
    (actor pool, batch scoring)."""

    SEED_TEXT = {
        "en": "the quick brown fox jumps over the lazy dog and runs away",
        "de": "der schnelle braune fuchs springt ueber den faulen hund und",
        "es": "el rapido zorro marron salta sobre el perro perezoso y corre",
        "fr": "le renard brun rapide saute par dessus le chien paresseux",
        "zh": "kuai su de zong se hu li tiao guo lan gou ran hou pao kai",
    }

    def __init__(self) -> None:
        self.profiles = {}
        for lang, txt in self.SEED_TEXT.items():
            grams = {txt[i:i + 3] for i in range(len(txt) - 2)}
            self.profiles[lang] = grams

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def predict(t: str) -> str:
            grams = {t[i:i + 3] for i in range(min(len(t), 200) - 2)}
            best, best_score = "unk", -1
            for lang, prof in self.profiles.items():
                score = len(grams & prof)
                if score > best_score:
                    best, best_score = lang, score
            return best

        batch = batch.copy()
        batch["pred_lang"] = batch["text"].map(predict)
        return batch[["doc_id", "source", "lang", "pred_lang"]]


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
    """BPE-ish regex token counting (stateful stage: pattern compiled once
    per actor/worker).  Pattern kept RE2-compatible so the DuckDB oracle can
    recount with regexp_extract_all."""

    PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

    def __init__(self) -> None:
        import re

        self.pat = re.compile(self.PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["n_regex_tokens"] = batch["text"].map(
            lambda t: len(self.pat.findall(t)))
        return batch[["doc_id", "source", "n_regex_tokens"]]
