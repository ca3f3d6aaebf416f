"""End-to-end corpus cleaning pipeline: the composition a training-data
user actually runs — quality filter -> exact dedup -> (optional) near
dedup -> partitioned parquet of surviving documents.

Scale shape:
- the quality filter is a fused map stage (tokenize + per-doc unigram
  stats + Arrow mask inside one task; nothing shuffles);
- exact dedup shuffles (128-bit hash, doc_id, source) rows, never text,
  and joins survivors back with Ray's native hash join only because the
  payload must reach the output;
- near dedup (MinHash+LSH) adds two bucket-keyed exchanges (see
  functions.dedup.minhash_lsh_dedup);
- output is hive-partitioned by ``source`` so a re-run or a downstream
  reader can prune / resume at partition granularity.
"""

from __future__ import annotations


def clean_corpus(in_path: str, out_dir: str, *, min_words: int = 20,
                 max_frac_den: int = 5, near_dedup: bool = False) -> dict:
    """Clean ``in_path`` (documents parquet: doc_id, source, text, ...)
    into ``out_dir``.  Returns {"n_in", "n_kept", "out_dir"} — counts come
    from parquet metadata, not a second pipeline execution."""
    import ray.data

    from tokrle.functions.dedup import exact_dedup, minhash_lsh_dedup
    from tokrle.functions.text import quality_filter

    ds = ray.data.read_parquet(in_path)
    passing = ds.map_batches(
        quality_filter, batch_format="pyarrow",
        fn_kwargs={"min_words": min_words, "max_frac_den": max_frac_den})
    kept = exact_dedup(passing, key="text", keep_cols=("source",),
                       return_full_rows=True)
    if near_dedup:
        kept = minhash_lsh_dedup(kept, return_full_rows=True)
    # a re-run must not leave the previous run's uuid-named shards live
    # (write_parquet appends new files; stale ones would double every
    # surviving doc for readers AND in the n_kept count below).  Only
    # the hive partition dirs this pipeline itself writes are cleared —
    # never foreign files in a user-supplied out_dir.
    import glob as _glob
    import os
    import shutil

    for part in _glob.glob(os.path.join(out_dir, "source=*")):
        shutil.rmtree(part, ignore_errors=True)
    kept.write_parquet(out_dir, partition_cols=["source"])

    return {"n_in": _parquet_rows(in_path), "n_kept": _parquet_rows(out_dir),
            "out_dir": out_dir}


def _parquet_rows(path: str) -> int:
    """Row count from parquet FOOTERS only (no data read)."""
    import os

    import pyarrow.parquet as pq

    if os.path.isfile(path):
        files = [path]
    else:
        files = [os.path.join(r, f) for r, _, fs in os.walk(path)
                 for f in fs if f.endswith(".parquet")]
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
