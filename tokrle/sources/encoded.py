"""Ray-free consumer API for encoded outputs.

A downstream consumer (data-loader, inspection tool) can read an encoded
directory with pure pyarrow — no Ray session — and stream decoded docs:

    from tokrle.sources.encoded import iter_decoded, read_chunk_table
    for doc_id, tokens in iter_decoded("/data/encoded"):
        ...

The same chunk layout is what `tokrle.pipelines.encode.decode_tokens`
consumes distributed; this is the single-process edge of that contract.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator

import numpy as np
import pyarrow.parquet as pq

from tokrle.codecs.core import decode as codec_decode


def chunk_files(enc_dir: str) -> list[str]:
    files = sorted(glob.glob(os.path.join(enc_dir, "group=*", "*.parquet")))
    return files or sorted(glob.glob(os.path.join(enc_dir, "*.parquet")))


def read_chunk_table(enc_dir: str, columns=None):
    """All chunk rows (lineage + payloads) as one pyarrow Table."""
    import pyarrow as pa

    tables = [pq.read_table(f, columns=columns) for f in chunk_files(enc_dir)]
    return pa.concat_tables(tables) if tables else None


def iter_decoded(enc_dir: str) -> Iterator[tuple[str, np.ndarray]]:
    """Stream (doc_id, tokens int32) pairs, one chunk in memory at a time."""
    for f in chunk_files(enc_dir):
        t = pq.read_table(f)
        for i in range(t.num_rows):
            codec = t.column("codec")[i].as_py()
            payload = t.column("payload")[i].as_py()
            n_tokens = t.column("n_tokens")[i].as_py()
            values = codec_decode(codec, payload, n_tokens, np.int32)
            offsets = np.asarray(t.column("row_offsets")[i].as_py(),
                                 dtype=np.int64)
            doc_ids = t.column("doc_id")[i].as_py()
            for d, (s, e) in enumerate(zip(offsets[:-1], offsets[1:])):
                yield doc_ids[d], values[s:e]


def lineage_summary(enc_dir: str) -> dict:
    """Codec mix + sizes from lineage columns only (payloads untouched)."""
    t = read_chunk_table(enc_dir, columns=["codec", "n_tokens", "raw_bytes",
                                           "encoded_bytes"])
    if t is None or t.num_rows == 0:
        return {"chunks": 0}
    df = t.to_pandas()
    mix = df.groupby("codec").agg(
        chunks=("codec", "size"), n_tokens=("n_tokens", "sum"),
        encoded_bytes=("encoded_bytes", "sum")).to_dict("index")
    return {
        "chunks": len(df),
        "n_tokens": int(df["n_tokens"].sum()),
        "raw_bytes": int(df["raw_bytes"].sum()),
        "encoded_bytes": int(df["encoded_bytes"].sum()),
        "codec_mix": {k: {kk: int(vv) for kk, vv in v.items()}
                      for k, v in mix.items()},
    }
