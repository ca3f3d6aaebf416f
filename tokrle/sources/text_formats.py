"""CSV / JSONL document ingestion and export.

Parquet is the scale path (column-pruned, row-group-predicate reads);
these readers exist because real corpora arrive as delimited text or
JSON-lines dumps and a user should be able to point the engine at them
directly.  Both wrap Ray Data's native parallel file readers — the
streaming executor schedules one read task per file/block, so a
directory of shards ingests with the same backpressure as Parquet —
and normalize to the canonical ``documents`` schema
``(doc_id: int64, source: string, text: string)`` so every downstream
stage (tokenize, dedup, quality, prep) is format-agnostic.

Scale notes (100 TB):

- Row formats cannot prune columns at the scan; ``columns=`` here
  selects right after parse, before anything crosses the object store.
  For repeated analytics over the same corpus, ingest once to Parquet
  (``ingest_to_parquet``) and read that from then on.
- Writers shard output one file per block (Ray Data's layout), so a
  re-run with the same partitioning overwrites shard-for-shard and a
  partial run is resumable at the directory level.
- CSV quoting: pyarrow's writer quotes embedded delimiters/newlines and
  doubles quotes; the reader inverts that, so the text column
  round-trips byte-exact (the ``csv_source_stats`` /
  ``jsonl_source_stats`` oracles pin this with per-source integer
  checksums recomputed by DuckDB from the original Parquet).
"""

from __future__ import annotations

from typing import Sequence


def read_documents_csv(paths, *, columns: Sequence[str] | None = None):
    """Parallel CSV read -> canonical documents dataset.

    ``paths``: a file, directory, or list of either (Ray fans out one
    read task per file/block).  ``columns`` prunes immediately after
    parse so only the requested columns enter the object store.
    """
    import ray.data

    ds = ray.data.read_csv(paths)
    return _normalize(ds, columns)


def read_documents_jsonl(paths, *, columns: Sequence[str] | None = None):
    """Parallel JSON-lines read -> canonical documents dataset."""
    import ray.data

    ds = ray.data.read_json(paths)
    return _normalize(ds, columns)


def _normalize(ds, columns: Sequence[str] | None):
    """Cast to the canonical column types; select requested columns."""
    import pyarrow as pa
    import pyarrow.compute as pc

    want = list(columns) if columns is not None else None

    def cast(batch: pa.Table) -> pa.Table:
        cols = {}
        names = set(batch.column_names)
        take = want if want is not None else batch.column_names
        for c in take:
            if c not in names:
                raise KeyError(f"column {c!r} missing from source "
                               f"(has {sorted(names)})")
            arr = batch.column(c)
            if c == "doc_id" and not pa.types.is_int64(arr.type):
                arr = pc.cast(arr, pa.int64())
            elif c in ("source", "text", "lang") and \
                    not pa.types.is_string(arr.type):
                arr = pc.cast(arr, pa.string())
            elif c in ("n_chars", "n_tok") and \
                    not pa.types.is_int64(arr.type):
                arr = pc.cast(arr, pa.int64())
            cols[c] = arr
        return pa.table(cols)

    return ds.map_batches(cast, batch_format="pyarrow")


def write_documents_csv(ds, out_dir: str) -> None:
    """Shard the dataset to CSV files, one per block (quoted text)."""
    ds.write_csv(out_dir)


def write_documents_jsonl(ds, out_dir: str) -> None:
    """Shard the dataset to JSON-lines files, one per block."""
    ds.write_json(out_dir)


def ingest_to_parquet(paths, out_dir: str, *, fmt: str = "csv",
                      columns: Sequence[str] | None = None) -> None:
    """One-shot ingest: delimited/JSONL corpus -> columnar Parquet.

    The recommended pattern for repeated analytics at scale: pay the
    row-format parse once, then every later read is column-pruned.
    """
    if fmt == "csv":
        ds = read_documents_csv(paths, columns=columns)
    elif fmt in ("jsonl", "json"):
        ds = read_documents_jsonl(paths, columns=columns)
    else:
        raise ValueError(f"unsupported ingest format {fmt!r}")
    ds.write_parquet(out_dir)
