"""TF-IDF-style term scoring: document frequencies -> per-doc top term.

Scoring uses ``score(w, d) = tf(w, d) / df(w)`` — a 1/df idf variant
chosen for CROSS-ENGINE DETERMINISM: tf and df are small ints, so the
score is one correctly-rounded IEEE division that numpy and DuckDB
compute bit-identically, and equal-score ties break on the term string
ascending in both engines.  (The classical ``tf * ln(N/df)`` ranking is
monotone-equivalent per fixed tf but not across terms; ln's last-ulp
can differ between libm implementations, which would make an exact
oracle flaky.  The ranking difference is immaterial for top-term
extraction; swap ``score_fn`` for research use.)

Scale shape: document frequencies are vocabulary-bounded, not
corpus-bounded — per-batch distinct-doc partials, ONE hash aggregate,
driver pull, ``ray.put`` broadcast (the standard IDF-table shape).  The
scoring pass is a stateful actor stage: the df index is materialized
once per actor and each batch scores with factorize + reduceat — no
per-doc Python, text never shuffles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tokrle.functions.dedup import auto_concurrency as _auto


def _doc_words(batch: pa.Table, text_col: str):
    """(flat word object array, doc index per word)."""
    import pyarrow.compute as pc

    words = pc.split_pattern(batch.column(text_col), " ")
    la = words.combine_chunks() if isinstance(words, pa.ChunkedArray) \
        else words
    per_doc = pc.list_value_length(la).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = la.flatten().to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), per_doc)
    return flat, doc_idx


def document_frequencies(ds, *, text_col: str = "text") -> pd.DataFrame:
    """(w, df) over the corpus: df = number of docs containing w.
    Driver materialization is VOCABULARY-bounded."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _doc_words(batch, text_col)
        if len(flat) == 0:
            return pa.table({"w": pa.array([], pa.string()),
                             "dfp": pa.array([], pa.int64())})
        pairs = pd.DataFrame({"w": flat, "d": doc_idx}) \
            .drop_duplicates()
        counts = pairs.groupby("w", sort=False).size()
        return pa.table({"w": pa.array(counts.index.to_numpy(), pa.string()),
                         "dfp": pa.array(counts.to_numpy().astype(np.int64),
                                         pa.int64())})

    df = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("w").aggregate(Sum("dfp", alias_name="df")).to_pandas()
    df["df"] = df["df"].astype("int64")
    return df


class _TopTermScorer:
    """Stateful stage: df index built once per actor; per batch one
    factorize + bincount tf pass, one vectorized per-doc argmax."""

    def __init__(self, df_ref, *, text_col: str) -> None:
        import ray

        table = ray.get(df_ref) if not isinstance(df_ref, pd.DataFrame) \
            else df_ref
        self._df_index = pd.Series(
            table["df"].to_numpy(np.float64),
            index=pd.Index(table["w"]))
        self._text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_idx = _doc_words(batch, self._text_col)
        schema = pa.schema([("source", batch.schema.field("source").type),
                            ("top_term", pa.string())])
        if len(flat) == 0:
            return schema.empty_table()
        codes, uniques = pd.factorize(flat)
        # tf per (doc, word): combined key fits int64 (vocab < 2^31)
        key = doc_idx * np.int64(len(uniques)) + codes
        uk, tf = np.unique(key, return_counts=True)
        d = (uk // len(uniques)).astype(np.int64)
        wi = (uk % len(uniques)).astype(np.int64)
        dfv = self._df_index.reindex(uniques).to_numpy(np.float64)[wi]
        score = tf.astype(np.float64) / dfv
        # per-doc argmax with term-ASC tie-break: sort by (doc, -score,
        # word string) and take each doc's first row
        wstr = uniques[wi]
        order = np.lexsort((wstr, -score, d))
        ds_, first_pos = np.unique(d[order], return_index=True)
        top = wstr[order[first_pos]]
        return pa.table({
            "source": batch.column("source").take(
                pa.array(ds_, type=pa.int64())),
            "top_term": pa.array(top.astype(object), pa.string()),
        })


def top_tfidf_terms(ds, *, text_col: str = "text", concurrency=None):
    """Per-doc top-scoring term (score = tf/df, term-ASC ties) as a
    (source, top_term) dataset."""
    import ray

    df_ref = ray.put(document_frequencies(ds, text_col=text_col))
    return ds.map_batches(
        _TopTermScorer,
        fn_constructor_kwargs={"df_ref": df_ref, "text_col": text_col},
        batch_format="pyarrow", concurrency=concurrency or _auto())


def top_term_source_stats(ds, *, text_col: str = "text") -> pd.DataFrame:
    """(source, top_term, n_docs): how many of each source's docs have
    each term as their TF-IDF top term."""
    from ray.data.aggregate import Count

    top = top_tfidf_terms(ds, text_col=text_col)
    df = top.groupby(["source", "top_term"]) \
        .aggregate(Count(alias_name="n_docs")).to_pandas()
    df["n_docs"] = df["n_docs"].astype("int64")
    return df.sort_values(["source", "top_term"]).reset_index(drop=True)
