"""Generic per-column encode for arbitrary integer tables.

The codec layer is column-agnostic; this pipeline applies it to ANY
Parquet table's integer columns — each batch becomes one encoded row
holding (codec, payload, dtype) per column plus lineage sizes, exactly
the per-chunk auto-selection shape the north star describes
(generalizing beyond the token table; ref pyrle stores one hard-coded
representation, runs+values, pyrle/rle.py:146-147 — here every column
gets the codec that fits its distribution).

Decode is the stateless inverse; round-trips are bit-identical per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tokrle.codecs.core import decode as codec_decode
from tokrle.select import auto_encode


def encode_table_columns(ds, columns: list[str], *,
                         batch_size: int = 65536):
    """Dataset -> encoded Dataset with one row per input batch and, per
    column, ``{col}__codec/__payload/__dtype`` plus byte lineage."""

    def enc(batch: pa.Table) -> pa.Table:
        out: dict = {"n_rows": pa.array([len(batch)], type=pa.int64())}
        raw_bytes = 0
        enc_bytes = 0
        for c in columns:
            x = np.ascontiguousarray(
                batch.column(c).to_numpy(zero_copy_only=False))
            codec, payload, prof = auto_encode(x)
            raw_bytes += prof.raw_bytes
            enc_bytes += len(payload)
            out[f"{c}__codec"] = pa.array([codec], type=pa.string())
            out[f"{c}__dtype"] = pa.array([str(x.dtype)], type=pa.string())
            out[f"{c}__payload"] = pa.array([payload], type=pa.binary())
        out["raw_bytes"] = pa.array([raw_bytes], type=pa.int64())
        out["encoded_bytes"] = pa.array([enc_bytes], type=pa.int64())
        return pa.table(out)

    return ds.map_batches(enc, batch_size=batch_size,
                          batch_format="pyarrow")


def decode_table_columns(encoded_ds, columns: list[str]):
    """Inverse of :func:`encode_table_columns` (zero-copy payload reads)."""

    def dec(batch: pa.Table) -> pa.Table:
        parts = []
        for i in range(len(batch)):
            n = batch.column("n_rows")[i].as_py()
            cols = {}
            for c in columns:
                codec = batch.column(f"{c}__codec")[i].as_py()
                dtype = np.dtype(batch.column(f"{c}__dtype")[i].as_py())
                payload = memoryview(
                    batch.column(f"{c}__payload")[i].as_buffer())
                cols[c] = pa.array(codec_decode(codec, payload, n, dtype))
            parts.append(pa.table(cols))
        if not parts:
            return pa.table({c: pa.array([]) for c in columns})
        return pa.concat_tables(parts)

    return encoded_ds.map_batches(dec, batch_size=4,
                                  batch_format="pyarrow")
