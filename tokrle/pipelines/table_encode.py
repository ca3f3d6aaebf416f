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

import os

import numpy as np
import pyarrow as pa

from tokrle.codecs.core import decode as codec_decode
from tokrle.select import auto_encode


def _string_buffers(col: pa.ChunkedArray | pa.Array):
    """(lengths:int64, flat_bytes:uint8) of an Arrow string or
    large_string column, zero-copy from its offsets/data buffers."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    o = arr.offset
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype,
                         count=len(arr) + 1 + o)[o:]
    data = (np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            [offs[0]:offs[-1]] if arr.buffers()[2] is not None
            else np.zeros(0, dtype=np.uint8))
    return np.diff(offs).astype(np.int64), np.ascontiguousarray(data)


def _validity_bits(col: pa.ChunkedArray | pa.Array) -> bytes:
    """LSB-packed validity bitmap of a column, b'' when no nulls (the
    common case pays one null_count check and ships zero bytes)."""
    if col.null_count == 0:
        return b""
    import pyarrow.compute as pc

    valid = pc.is_valid(col)
    if isinstance(valid, pa.ChunkedArray):
        valid = valid.combine_chunks()
    return np.packbits(valid.to_numpy(zero_copy_only=False),
                       bitorder="little").tobytes()


def _apply_validity(arr: pa.Array, packed: bytes) -> pa.Array:
    """Re-attach a packed validity bitmap produced by _validity_bits."""
    if not packed:
        return arr
    valid = np.unpackbits(np.frombuffer(packed, dtype=np.uint8),
                          count=len(arr), bitorder="little").astype(bool)
    null_count = int(len(arr) - valid.sum())
    return pa.Array.from_buffers(
        arr.type, len(arr),
        [pa.py_buffer(packed)] + arr.buffers()[1:],
        null_count=null_count)


def encode_table_columns(ds, columns: list[str], *,
                         batch_size: int = 65536, text_codec: str = "fsst"):
    """Dataset -> encoded Dataset with one row per input batch and, per
    column, ``{col}__codec/__payload/__dtype`` plus byte lineage.

    Integer/float/timestamp columns go through codec auto-selection.
    LIST<numeric> columns (embeddings, token sequences) split into
    per-row lengths and the flat child values, each auto-selected.
    STRING columns split into their Arrow buffers: per-row byte lengths
    (an int column — auto-selected, usually for/bitpack) and the flat
    UTF-8 bytes through
    ``text_codec`` ('fsst' aligned tables, 'fsstg' for the greedy
    arbitrary-offset parse: ~1.5x better ratio at ~5x the encode cost, or
    'auto' to pick per chunk from a 64 KiB sample encode of each)."""
    from tokrle.codecs.core import encode as codec_encode

    def pick_text_codec(data: np.ndarray) -> str:
        if text_codec != "auto":
            return text_codec
        sample = data[: 1 << 16].view(np.int8)
        if len(sample) < 256:          # too small for trained tables to
            return "fsst"              # differentiate; take the fast one
        sizes = {c: len(codec_encode(c, sample)) for c in ("fsst", "fsstg")}
        return min(sizes, key=sizes.__getitem__)

    def enc(batch: pa.Table) -> pa.Table:
        out: dict = {"n_rows": pa.array([len(batch)], type=pa.int64())}
        raw_bytes = 0
        enc_bytes = 0
        for c in columns:
            col = batch.column(c)
            # nulls: carry an LSB-packed validity bitmap (b'' when none)
            # so None round-trips exactly instead of flattening to ''/0
            vbits = _validity_bits(col)
            out[f"{c}__valid"] = pa.array([vbits], type=pa.binary())
            enc_bytes += len(vbits)
            if pa.types.is_list(col.type) or pa.types.is_large_list(
                    col.type):
                # list<numeric> (embeddings, token sequences): per-row
                # lengths and the flat child values each go through codec
                # auto-selection — same split as strings, typed child
                import pyarrow.compute as pc
                lens = pc.fill_null(pc.list_value_length(col), 0) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                flat = pc.list_flatten(col)   # skips null slots
                if isinstance(flat, pa.ChunkedArray):
                    flat = flat.combine_chunks()
                if flat.null_count:
                    raise NotImplementedError(
                        f"column {c!r}: null list ELEMENTS not supported")
                v = np.ascontiguousarray(
                    flat.to_numpy(zero_copy_only=False))
                if v.dtype == object:
                    raise NotImplementedError(
                        f"column {c!r}: nested list types not supported")
                lcodec, lpayload, _ = auto_encode(lens)
                vcodec, vpayload, _ = auto_encode(v)
                raw_bytes += v.nbytes + 4 * len(batch)
                enc_bytes += len(lpayload) + len(vpayload)
                out[f"{c}__codec"] = pa.array(
                    [f"list:{lcodec}:{vcodec}"], type=pa.string())
                out[f"{c}__dtype"] = pa.array([f"list:{v.dtype}"],
                                              type=pa.string())
                out[f"{c}__lens_payload"] = pa.array([lpayload],
                                                     type=pa.binary())
                out[f"{c}__payload"] = pa.array([vpayload],
                                                type=pa.binary())
                continue
            if pa.types.is_string(col.type) or pa.types.is_large_string(
                    col.type):
                if vbits:
                    # null slots' lengths/bytes are whatever the buffers
                    # hold; canonicalize to empty so encode is content-
                    # deterministic regardless of upstream buffer state
                    import pyarrow.compute as pc
                    col = pc.fill_null(col, "")
                lens, data = _string_buffers(col)
                lcodec, lpayload, lprof = auto_encode(lens)
                raw_bytes += lens.sum() + len(batch) * 4   # data + offsets
                # string zone map: chunk min/max values (UTF-8 byte
                # order == code-point order, so pyarrow footer-filter
                # comparisons agree with Python's).  eq/in/prefix
                # leaves push a conservative overlap test into the
                # Parquet read — clustered-by-string layouts skip
                # non-overlapping chunks without touching payloads.
                # Null slots were canonicalized to '' above, which only
                # widens the window (never unsound).
                if len(batch):
                    import pyarrow.compute as pc
                    mm = pc.min_max(col)
                    out[f"{c}__smin"] = pa.array(
                        [mm["min"].as_py()], type=pa.string())
                    out[f"{c}__smax"] = pa.array(
                        [mm["max"].as_py()], type=pa.string())
                else:
                    out[f"{c}__smin"] = pa.array([""], type=pa.string())
                    out[f"{c}__smax"] = pa.array([""], type=pa.string())
                # low-cardinality chunks take the STRING-DICTIONARY
                # form: distinct set + integer code stream.  Predicates
                # then evaluate on codes (match_eq/match_in — no text
                # decode at all) and gathers become dictionary takes.
                # The per-row lens stream is kept so lengths-based
                # prefilters work identically on both forms.
                de = None
                if len(batch) >= 8 and len(lens) and \
                        int(lens.max()) <= 256:
                    # short values only: long-text columns are never
                    # low-cardinality and the distinct probe would
                    # hash every byte for nothing.  A slice pre-probe
                    # gates the full pass: if the first rows already
                    # exceed the cardinality cap, the whole chunk will
                    # too (slice distinct <= full distinct)
                    import pyarrow.compute as pc
                    probe = col.slice(0, min(len(batch), 2048))
                    if pc.count_distinct(probe).as_py() <= 256:
                        de = col.dictionary_encode()
                        if isinstance(de, pa.ChunkedArray):
                            de = de.combine_chunks()
                n_u = len(de.dictionary) if de is not None else 0
                if 0 < n_u <= 256 and len(batch) >= 4 * n_u:
                    dlens, dbytes = _string_buffers(de.dictionary)
                    codes = de.indices.to_numpy(zero_copy_only=False)
                    ccodec, cpayload, _ = auto_encode(
                        codes.astype(np.int64))
                    dl_codec, dl_payload, _ = auto_encode(dlens)
                    dt_codec = pick_text_codec(dbytes)
                    db_payload = codec_encode(dt_codec,
                                              dbytes.view(np.int8))
                    from tokrle.codecs.core import sdict_pack
                    packed = sdict_pack(cpayload, dl_payload,
                                        db_payload, n_u)
                    enc_bytes += len(lpayload) + len(packed)
                    out[f"{c}__codec"] = pa.array(
                        [f"sdict:{ccodec}:{dl_codec}:{dt_codec}"],
                        type=pa.string())
                    out[f"{c}__dtype"] = pa.array(["str"],
                                                  type=pa.string())
                    out[f"{c}__lens_payload"] = pa.array(
                        [lpayload], type=pa.binary())
                    out[f"{c}__payload"] = pa.array([packed],
                                                    type=pa.binary())
                    continue
                tcodec = pick_text_codec(data)
                bpayload = codec_encode(tcodec, data.view(np.int8))
                enc_bytes += len(lpayload) + len(bpayload)
                out[f"{c}__codec"] = pa.array(
                    [f"str:{lcodec}:{tcodec}"], type=pa.string())
                out[f"{c}__dtype"] = pa.array(["str"], type=pa.string())
                out[f"{c}__lens_payload"] = pa.array([lpayload],
                                                     type=pa.binary())
                out[f"{c}__payload"] = pa.array([bpayload], type=pa.binary())
                continue
            if vbits:
                import pyarrow.compute as pc
                col = pc.fill_null(col, pa.scalar(0, type=col.type))
            x = np.ascontiguousarray(col.to_numpy(zero_copy_only=False))
            codec, payload, prof = auto_encode(x)
            raw_bytes += prof.raw_bytes
            enc_bytes += len(payload)
            out[f"{c}__codec"] = pa.array([codec], type=pa.string())
            out[f"{c}__dtype"] = pa.array([str(x.dtype)], type=pa.string())
            out[f"{c}__payload"] = pa.array([payload], type=pa.binary())
            # zone map: the profile's chunk extrema, free at encode time.
            # A range scan pushes (vmax >= lo AND vmin <= hi) into the
            # Parquet read and never decodes non-overlapping chunks —
            # effective when the table is clustered (sorted) on the column.
            # Integer/timestamp columns only (timestamps profile as their
            # exact int64 counts): the profile truncates float extrema.
            # uint64 is excluded too: full-range values don't fit the
            # int64 zone-map columns (the codec layer stores them via an
            # xor-2^63 bias), so uint64 hash/signature columns are
            # storage+decode only — value-domain scans/aggregates on
            # them fail loudly on the missing __vmin/__vmax columns.
            if (np.issubdtype(x.dtype, np.integer)
                    and x.dtype != np.uint64) or x.dtype.kind == "M":
                out[f"{c}__vmin"] = pa.array([int(prof.vmin)],
                                             type=pa.int64())
                out[f"{c}__vmax"] = pa.array([int(prof.vmax)],
                                             type=pa.int64())
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
                payload = memoryview(
                    batch.column(f"{c}__payload")[i].as_buffer())
                vbits = (batch.column(f"{c}__valid")[i].as_py()
                         if f"{c}__valid" in batch.column_names else b"")
                if codec.startswith("list:"):
                    _, lcodec, vcodec = codec.split(":")
                    child = np.dtype(batch.column(f"{c}__dtype")[i]
                                     .as_py().split(":", 1)[1])
                    lpayload = memoryview(
                        batch.column(f"{c}__lens_payload")[i].as_buffer())
                    lens = codec_decode(lcodec, lpayload, n, np.int64)
                    v = codec_decode(vcodec, payload, int(lens.sum()),
                                     child)
                    offs = np.zeros(n + 1, dtype=np.int64)
                    np.cumsum(lens, out=offs[1:])
                    mask = None
                    if vbits:
                        valid = np.unpackbits(
                            np.frombuffer(vbits, dtype=np.uint8),
                            count=n, bitorder="little").astype(bool)
                        mask = pa.array(~valid)
                    if offs[-1] < 2**31:
                        cols[c] = pa.ListArray.from_arrays(
                            pa.array(offs.astype(np.int32)), pa.array(v),
                            mask=mask)
                    else:
                        cols[c] = pa.LargeListArray.from_arrays(
                            pa.array(offs), pa.array(v), mask=mask)
                    continue
                if codec.startswith("sdict:"):
                    from tokrle.codecs.core import (_sdict_distinct_array,
                                                    sdict_unpack)
                    ccodec, codes_p, dlens, dbytes = sdict_unpack(
                        codec, payload)
                    codes_v = codec_decode(ccodec, codes_p, n, np.int64)
                    arr = _sdict_distinct_array(dlens, dbytes) \
                        .take(pa.array(codes_v))
                    if arr.nbytes < 2**31:
                        arr = arr.cast(pa.string())
                    cols[c] = _apply_validity(arr, vbits)
                    continue
                if codec.startswith("str:"):
                    _, lcodec, tcodec = codec.split(":")
                    lpayload = memoryview(
                        batch.column(f"{c}__lens_payload")[i].as_buffer())
                    lens = codec_decode(lcodec, lpayload, n, np.int64)
                    nbytes = int(lens.sum())
                    data = codec_decode(tcodec, payload, nbytes, np.int8)
                    offs = np.zeros(n + 1, dtype=np.int64)
                    np.cumsum(lens, out=offs[1:])
                    arr = pa.StringArray.from_buffers(
                        n, pa.py_buffer(offs.astype(np.int32).tobytes()),
                        pa.py_buffer(data.tobytes())) if offs[-1] < 2**31 \
                        else pa.LargeStringArray.from_buffers(
                            n, pa.py_buffer(offs.tobytes()),
                            pa.py_buffer(data.tobytes()))
                    cols[c] = _apply_validity(arr, vbits)
                    continue
                dtype = np.dtype(batch.column(f"{c}__dtype")[i].as_py())
                cols[c] = _apply_validity(
                    pa.array(codec_decode(codec, payload, n, dtype)), vbits)
            parts.append(pa.table(cols))
        if not parts:
            return pa.table({c: pa.array([]) for c in columns})
        return pa.concat_tables(parts)

    return encoded_ds.map_batches(dec, batch_size=4,
                                  batch_format="pyarrow")


def range_scan(enc_dir: str, columns: list[str],
               preds: list[tuple[str, int, int]]):
    """Zone-map pruned range scan over a table-encode directory.

    ``preds`` is a conjunction of inclusive ranges ``(col, lo, hi)`` on
    integer columns.  The chunk-level predicate ``vmax >= lo AND vmin <=
    hi`` (per range) is pushed into the Parquet scan, so non-overlapping
    chunks' payloads never leave storage; surviving chunks decode and
    row-filter.  Returns ``(Dataset, {"chunks_total", "chunks_scanned"})``
    — the counts come from two metadata-column reads, cheap relative to
    payload decode, and let callers assert the layout actually pruned.
    """
    import pyarrow.compute as pc
    import ray.data

    keep = None
    for c, lo, hi in preds:
        e = (pc.field(f"{c}__vmax") >= lo) & (pc.field(f"{c}__vmin") <= hi)
        keep = e if keep is None else keep & e
    n_total = _n_chunks(enc_dir)
    n_kept = ray.data.read_parquet(enc_dir, columns=["n_rows"],
                                   filter=keep).count()
    dec = decode_table_columns(
        ray.data.read_parquet(enc_dir, filter=keep), columns)

    def row_filter(batch: pa.Table) -> pa.Table:
        m = np.ones(len(batch), dtype=bool)
        for c, lo, hi in preds:
            x = batch.column(c).to_numpy(zero_copy_only=False)
            m &= (x >= lo) & (x <= hi)
        return batch.filter(pa.array(m))

    return dec.map_batches(row_filter, batch_format="pyarrow"), \
        {"chunks_total": n_total, "chunks_scanned": n_kept}


def encoded_column_agg(enc_dir: str, columns: list[str]):
    """COUNT/SUM/MIN/MAX over encoded integer columns WITHOUT decoding.

    Reads only the metadata + payload columns of a table-encode directory
    (column-pruned Parquet scan), answers SUM per chunk in the compressed
    domain via :func:`tokrle.codecs.core.agg_sum` (rle: runs x values
    over nruns elements; dict: code histogram x dictionary; for/pfor:
    ref*n + code sums) and MIN/MAX from the zone-map extrema recorded at
    encode time — the decoded column is never materialized anywhere.

    Exactness: per-chunk sums are Python-int exact; cross-chunk partials
    travel as Arrow int64, so a |partial| >= 2^63 raises loudly instead
    of wrapping.  Nullable chunks raise (encode fills nulls with 0, which
    would silently skew SUM/MIN/MAX).  Returns one row per column:
    ``(col, n, sum_val, min_val, max_val)``.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    from tokrle.codecs.core import agg_sum

    need = ["n_rows"]
    for c in columns:
        need += [f"{c}__codec", f"{c}__payload", f"{c}__dtype",
                 f"{c}__vmin", f"{c}__vmax", f"{c}__valid"]
    ds = ray.data.read_parquet(enc_dir, columns=need)

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        out = {"n": pa.array([int(nrows.sum())], type=pa.int64())}
        for c in columns:
            codecs = batch.column(f"{c}__codec").to_pylist()
            dtypes = batch.column(f"{c}__dtype").to_pylist()
            payloads = batch.column(f"{c}__payload")
            valids = batch.column(f"{c}__valid")
            total = 0
            for i, codec in enumerate(codecs):
                if np.dtype(dtypes[i]) == np.uint64:
                    raise TypeError(
                        f"column {c!r}: uint64 sums can exceed the int64 "
                        "partial-row domain; decode and reduce instead")
                if len(valids[i].as_py() or b""):
                    raise ValueError(
                        f"column {c!r}: nullable chunks not supported by "
                        "the compressed-domain aggregate (encode fills "
                        "nulls with 0)")
                total += agg_sum(codec,
                                 memoryview(payloads[i].as_buffer()),
                                 int(nrows[i]), np.dtype(dtypes[i]))
            vmin = batch.column(f"{c}__vmin").to_numpy(
                zero_copy_only=False)
            vmax = batch.column(f"{c}__vmax").to_numpy(
                zero_copy_only=False)
            keep = nrows > 0
            out[f"sum_{c}"] = pa.array([total], type=pa.int64())
            out[f"min_{c}"] = pa.array(
                [int(vmin[keep].min()) if keep.any() else None],
                type=pa.int64())
            out[f"max_{c}"] = pa.array(
                [int(vmax[keep].max()) if keep.any() else None],
                type=pa.int64())
        return pa.table(out)

    aggs = [Sum("n", alias_name="n")]
    for c in columns:
        aggs += [Sum(f"sum_{c}", alias_name=f"sum_{c}"),
                 Min(f"min_{c}", alias_name=f"min_{c}"),
                 Max(f"max_{c}", alias_name=f"max_{c}")]
    row = ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)
    return pd.DataFrame({
        "col": columns,
        "n": [int(row["n"])] * len(columns),
        "sum_val": [int(row[f"sum_{c}"]) for c in columns],
        "min_val": [int(row[f"min_{c}"]) for c in columns],
        "max_val": [int(row[f"max_{c}"]) for c in columns],
    })


def encoded_range_agg(enc_dir: str, key_col: str, lo: int, hi: int,
                      agg_cols: list[str]):
    """COUNT/SUM of ``agg_cols`` over rows with ``key_col`` in
    ``[lo, hi]``, answered from a clustered table-encode directory with
    a three-way chunk split:

    - chunks whose zone map lies OUTSIDE the range: payloads never leave
      storage (predicate pushed into the Parquet scan);
    - INTERIOR chunks (``vmin >= lo and vmax <= hi``): every row
      qualifies, so SUM comes from :func:`tokrle.codecs.core.agg_sum`
      in the compressed domain — neither the key nor the agg column is
      decoded;
    - BOUNDARY chunks: decode the key, mask, decode + mask-sum the agg
      columns (the only decode in the whole query, proportional to the
      cluster boundary, not the selected volume).

    Returns ``(DataFrame, counters)`` where counters report the chunk
    split so callers can assert the layout actually pruned and the
    compressed-domain path actually ran.  Integer columns only; the
    table should be clustered (sorted / z-ordered) on ``key_col`` for
    the split to be effective — on an unclustered table everything
    lands in the boundary class, which is correct but decodes."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from tokrle.codecs.core import agg_sum, decode as codec_decode

    inside = (pc.field(f"{key_col}__vmin") >= lo) & \
        (pc.field(f"{key_col}__vmax") <= hi)
    overlap = (pc.field(f"{key_col}__vmax") >= lo) & \
        (pc.field(f"{key_col}__vmin") <= hi)
    boundary = overlap & ~inside

    meta_cols = ["n_rows", f"{key_col}__vmin", f"{key_col}__vmax"]
    n_total = _n_chunks(enc_dir)
    agg_payload_cols = ["n_rows"] + [
        f"{c}__{part}" for c in agg_cols
        for part in ("codec", "payload", "dtype", "valid")]

    def _check_valid(batch: pa.Table, c: str, i: int) -> None:
        if len(batch.column(f"{c}__valid")[i].as_py() or b""):
            raise ValueError(
                f"column {c!r}: nullable chunks not supported by the "
                "compressed-domain aggregate")

    def interior_partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        out = {"n": pa.array([int(nrows.sum())], type=pa.int64()),
               "chunks": pa.array([len(batch)], type=pa.int64())}
        for i in range(len(batch)):
            _check_valid(batch, key_col, i)  # nulls-as-0 keys misclassify
        for c in agg_cols:
            total = 0
            for i in range(len(batch)):
                _check_valid(batch, c, i)
                total += agg_sum(
                    batch.column(f"{c}__codec")[i].as_py(),
                    memoryview(batch.column(f"{c}__payload")[i]
                               .as_buffer()),
                    int(nrows[i]),
                    np.dtype(batch.column(f"{c}__dtype")[i].as_py()))
            out[f"sum_{c}"] = pa.array([total], type=pa.int64())
        return pa.table(out)

    def boundary_partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        n_sel = 0
        sums = dict.fromkeys(agg_cols, 0)
        for i in range(len(batch)):
            n = int(nrows[i])
            # the KEY's validity matters as much as the aggregates':
            # nulls encode as 0, so a nullable key chunk would silently
            # classify null rows as key==0 instead of raising
            _check_valid(batch, key_col, i)
            key = codec_decode(
                batch.column(f"{key_col}__codec")[i].as_py(),
                memoryview(batch.column(f"{key_col}__payload")[i]
                           .as_buffer()),
                n, np.dtype(batch.column(f"{key_col}__dtype")[i].as_py()))
            mask = (key >= lo) & (key <= hi)
            n_sel += int(np.count_nonzero(mask))
            for c in agg_cols:
                _check_valid(batch, c, i)
                v = codec_decode(
                    batch.column(f"{c}__codec")[i].as_py(),
                    memoryview(batch.column(f"{c}__payload")[i]
                               .as_buffer()),
                    n, np.dtype(batch.column(f"{c}__dtype")[i].as_py()))
                sums[c] += int(v[mask].astype(np.int64).sum())
        out = {"n": pa.array([n_sel], type=pa.int64()),
               "chunks": pa.array([len(batch)], type=pa.int64())}
        for c in agg_cols:
            out[f"sum_{c}"] = pa.array([sums[c]], type=pa.int64())
        return pa.table(out)

    def _run(filt, cols, fn):
        ds = ray.data.read_parquet(enc_dir, columns=cols, filter=filt)
        aggs = [Sum("n", alias_name="n"),
                Sum("chunks", alias_name="chunks")] + \
            [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in agg_cols]
        row = ds.map_batches(fn, batch_format="pyarrow").aggregate(*aggs)
        return {k: int(row[k] or 0) for k in
                ["n", "chunks"] + [f"sum_{c}" for c in agg_cols]}

    ri = _run(inside, list(dict.fromkeys(
        agg_payload_cols + [f"{key_col}__valid"])), interior_partial)
    rb = _run(boundary, list(dict.fromkeys(
        agg_payload_cols + [f"{key_col}__{p}"
                            for p in ("codec", "payload", "dtype",
                                      "valid")])),
        boundary_partial)
    counters = {"chunks_total": n_total,
                "chunks_interior": ri["chunks"],
                "chunks_boundary": rb["chunks"],
                "chunks_skipped": n_total - ri["chunks"] - rb["chunks"]}
    df = pd.DataFrame({
        "n_rows": [ri["n"] + rb["n"]],
        **{f"sum_{c}": [ri[f"sum_{c}"] + rb[f"sum_{c}"]]
           for c in agg_cols},
    })
    return df, counters


def encoded_value_count(enc_dir: str, col: str, value: int):
    """COUNT of rows with ``col == value`` over a table-encode directory,
    answered without decoding anything:

    - chunks whose zone map excludes the value (``value < vmin or
      value > vmax``) never leave storage — the predicate is pushed into
      the Parquet scan over the ``__vmin``/``__vmax`` columns;
    - surviving chunks count matches inside the compressed domain via
      :func:`tokrle.codecs.core.count_eq` (rle: O(#runs) run-length sum;
      dict: one searchsorted + a code compare; for/bitpack: a frame test
      that often answers 0 with no code-stream work) — the decoded
      column is never materialized anywhere.

    Integer/timestamp zone-mapped columns only (uint64 columns carry no
    zone maps — see :func:`encode_table_columns`); nullable chunks raise
    (encode fills nulls with 0, which would miscount ``value == 0``).
    Returns ``(DataFrame(n_match), counters)`` where counters report the
    chunk split so callers can assert the layout actually pruned."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from tokrle.codecs.core import count_eq

    value = int(value)
    overlap = (pc.field(f"{col}__vmin") <= value) & \
        (pc.field(f"{col}__vmax") >= value)
    n_total = _n_chunks(enc_dir)
    need = ["n_rows"] + [f"{col}__{p}"
                         for p in ("codec", "payload", "dtype", "valid")]

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        payloads = batch.column(f"{col}__payload")
        codecs = batch.column(f"{col}__codec").to_pylist()
        dtypes = batch.column(f"{col}__dtype").to_pylist()
        valids = batch.column(f"{col}__valid")
        total = 0
        for i, codec in enumerate(codecs):
            if len(valids[i].as_py() or b""):
                raise ValueError(
                    f"column {col!r}: nullable chunks not supported by "
                    "the compressed-domain count (encode fills nulls "
                    "with 0)")
            total += count_eq(codec,
                              memoryview(payloads[i].as_buffer()),
                              int(nrows[i]), np.dtype(dtypes[i]), value)
        return pa.table({
            "n_match": pa.array([total], type=pa.int64()),
            "chunks": pa.array([len(batch)], type=pa.int64())})

    ds = ray.data.read_parquet(enc_dir, columns=need, filter=overlap)
    row = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n_match", alias_name="n_match"),
        Sum("chunks", alias_name="chunks"))
    scanned = int(row["chunks"] or 0)
    counters = {"chunks_total": n_total,
                "chunks_scanned": scanned,
                "chunks_skipped": n_total - scanned}
    return pd.DataFrame({"n_match": [int(row["n_match"] or 0)]}), counters


def encoded_range_count(enc_dir: str, col: str, lo: int, hi: int):
    """COUNT of rows with ``col`` in ``[lo, hi]`` over a table-encode
    directory, split three ways on the zone maps:

    - chunks OUTSIDE the range: payloads never leave storage (predicate
      pushed into the Parquet scan);
    - INTERIOR chunks (``vmin >= lo and vmax <= hi``): every row
      qualifies, so the count is the chunk's ``n_rows`` — a
      metadata-only read, not even the payload column is fetched;
    - BOUNDARY chunks: count inside the compressed domain via
      :func:`tokrle.codecs.core.count_range` (rle: O(#runs); dict: two
      searchsorted calls; for/bitpack: window clamp) — still no decode.

    Same contracts as :func:`encoded_value_count` (integer zone-mapped
    columns, nullable chunks raise).  Returns ``(DataFrame(n_match),
    counters)`` with the chunk split."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from tokrle.codecs.core import count_range

    lo, hi = int(lo), int(hi)
    inside = (pc.field(f"{col}__vmin") >= lo) & \
        (pc.field(f"{col}__vmax") <= hi)
    overlap = (pc.field(f"{col}__vmax") >= lo) & \
        (pc.field(f"{col}__vmin") <= hi)
    boundary = overlap & ~inside
    n_total = _n_chunks(enc_dir)

    def interior_partial(batch: pa.Table) -> pa.Table:
        valids = batch.column(f"{col}__valid")
        for i in range(len(batch)):
            if len(valids[i].as_py() or b""):
                raise ValueError(
                    f"column {col!r}: nullable chunks not supported by "
                    "the compressed-domain count (encode fills nulls "
                    "with 0)")
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        return pa.table({
            "n_match": pa.array([int(nrows.sum())], type=pa.int64()),
            "chunks": pa.array([len(batch)], type=pa.int64())})

    def boundary_partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        payloads = batch.column(f"{col}__payload")
        codecs = batch.column(f"{col}__codec").to_pylist()
        dtypes = batch.column(f"{col}__dtype").to_pylist()
        valids = batch.column(f"{col}__valid")
        total = 0
        for i, codec in enumerate(codecs):
            if len(valids[i].as_py() or b""):
                raise ValueError(
                    f"column {col!r}: nullable chunks not supported by "
                    "the compressed-domain count (encode fills nulls "
                    "with 0)")
            total += count_range(codec,
                                 memoryview(payloads[i].as_buffer()),
                                 int(nrows[i]), np.dtype(dtypes[i]),
                                 lo, hi)
        return pa.table({
            "n_match": pa.array([total], type=pa.int64()),
            "chunks": pa.array([len(batch)], type=pa.int64())})

    def _run(filt, cols, fn):
        ds = ray.data.read_parquet(enc_dir, columns=cols, filter=filt)
        row = ds.map_batches(fn, batch_format="pyarrow").aggregate(
            Sum("n_match", alias_name="n_match"),
            Sum("chunks", alias_name="chunks"))
        return int(row["n_match"] or 0), int(row["chunks"] or 0)

    ni, ci = _run(inside, ["n_rows", f"{col}__valid"], interior_partial)
    nb, cb = _run(boundary,
                  ["n_rows"] + [f"{col}__{p}" for p in
                                ("codec", "payload", "dtype", "valid")],
                  boundary_partial)
    counters = {"chunks_total": n_total,
                "chunks_interior": ci,
                "chunks_boundary": cb,
                "chunks_skipped": n_total - ci - cb}
    return pd.DataFrame({"n_match": [ni + nb]}), counters


def encoded_distinct_count(enc_dir: str, col: str,
                           expr: tuple | None = None):
    """Exact COUNT(DISTINCT col) over a table-encode directory without
    decoding: each chunk's distinct set comes from the codec's own
    streams via :func:`tokrle.codecs.core.distinct_values` (dict chunks
    never read their code stream — the dictionary IS the distinct set;
    rle chunks read the O(#runs) value stream), per-batch sets union
    before leaving the task, and a hash-partitioned two-level dedupe
    counts the survivors — the exchange carries at most
    (#batches x chunk cardinality) values, never rows.

    ``expr`` (optional boolean predicate TREE, the integer sibling of
    :func:`encoded_str_distinct`'s filter): chunks the tree excludes
    via zone maps never leave storage, wholly-matching chunks keep the
    closed-form distinct, and run-list chunks late-materialize only
    the selected positions (:func:`gather_runs`) before the local
    unique.

    Intended for low/moderate-cardinality columns (keys, labels, enum
    codes); for high-cardinality columns the distinct set itself is the
    data — use the HLL sketch (`functions.sketch`) there.  Same
    contracts as :func:`encoded_value_count` (integer zone-mapped not
    required without ``expr``; nullable chunks raise).  Returns
    ``(DataFrame(n_distinct), counters)`` where counters report how
    many chunks answered from a closed form (dict/rle or ALL-match)
    vs decode/gather."""
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    from tokrle.codecs.core import distinct_values, gather_runs

    pred_cols = _expr_pred_cols(expr) if expr is not None else []
    str_cols = _expr_str_cols(expr) if expr is not None else []
    null_cols = _expr_null_cols(expr) if expr is not None else []
    need = ["n_rows"] + [f"{c}__{p}" for c in pred_cols
                         for p in ("vmin", "vmax")] + [
        f"{c}__{p}" for c in dict.fromkeys(pred_cols + [col])
        for p in ("codec", "payload", "dtype", "valid")] + [
        f"{c}__{p}" for c in str_cols
        for p in ("codec", "payload", "lens_payload", "valid")]
    need += [f"{c}__valid" for c in null_cols
             if f"{c}__valid" not in need]
    need = list(dict.fromkeys(need))
    n_total = _n_chunks(enc_dir)

    def _chunk_col3(batch, c, i):
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    def _valid(batch, c, i) -> bytes:
        return batch.column(f"{c}__valid")[i].as_py() or b""

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        codecs = batch.column(f"{col}__codec").to_pylist()
        zmin = {c: batch.column(f"{c}__vmin").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        zmax = {c: batch.column(f"{c}__vmax").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        parts = []
        closed = decoded = gathered = 0
        for i, codec in enumerate(codecs):
            n = int(nrows[i])
            if expr is None:
                # an empty chunk is trivially answered; classify it so
                # closed+decoded keeps summing to chunks_total
                if codec in ("dict", "rle"):
                    closed += 1
                else:
                    decoded += 1
                if n == 0:
                    continue
                sel = "all"
            else:
                if n == 0:
                    continue
                sel = _expr_eval(
                    expr, i, n, zmin, zmax,
                    lambda c2, j: _chunk_col3(batch, c2, j),
                    lambda c2, j: _chunk_str_col(batch, c2, j),
                    lambda c2, j: _valid(batch, c2, j))
                if not isinstance(sel, str) and not len(sel[0]):
                    continue
                if isinstance(sel, str):
                    if codec in ("dict", "rle"):
                        closed += 1
                    else:
                        decoded += 1
                else:
                    gathered += 1
            if _valid(batch, col, i):
                raise ValueError(
                    f"column {col!r}: nullable chunks not supported by "
                    "the compressed-domain distinct (encode fills nulls "
                    "with 0)")
            payload = memoryview(
                batch.column(f"{col}__payload")[i].as_buffer())
            dt = np.dtype(batch.column(f"{col}__dtype")[i].as_py())
            u = distinct_values(codec, payload, n, dt) \
                if isinstance(sel, str) else \
                np.unique(gather_runs(codec, payload, n, dt, *sel))
            # normalize every dtype into the int64 image before the
            # exchange (uint64 via the order-preserving bias, datetime
            # via its epoch counts) — sentinel/counter rows are int64,
            # so a mixed-schema block concat would otherwise crash
            if u.dtype == np.uint64:
                u = _hist_bias_u64(u)
            elif u.dtype.kind == "M":
                u = u.view(np.int64)
            parts.append(u.astype(np.int64))
        u = np.unique(np.concatenate(parts)) if parts \
            else np.empty(0, np.int64)
        # counter ROWS (kind 1/2/3) ride the same exchange — O(1) rows
        # per batch, no zero-padded columns
        return pa.table({
            "kind": pa.array(np.concatenate(
                (np.zeros(len(u), np.int64), [1, 2, 3]))),
            "v": pa.array(np.concatenate((u, [0, 0, 0]))),
            "m": pa.array(np.concatenate(
                (np.zeros(len(u), np.int64),
                 [closed, decoded, gathered])))})

    flt = _expr_zone_filter(expr) if expr is not None else None
    ds = ray.data.read_parquet(enc_dir, columns=need, filter=flt)
    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["kind", "v"]).aggregate(
        Sum("m", alias_name="m")).to_pandas()
    if agg.empty:   # zone filter pruned every chunk
        return (pd.DataFrame({"n_distinct": [0]}),
                {"chunks_total": n_total, "chunks_closed_form": 0,
                 "chunks_decoded": 0, "chunks_gathered": 0})
    meters = agg[agg["kind"] > 0].set_index("kind")["m"]
    counters = {"chunks_total": n_total,
                "chunks_closed_form": int(meters.get(1, 0)),
                "chunks_decoded": int(meters.get(2, 0)),
                "chunks_gathered": int(meters.get(3, 0))}
    n_distinct = int((agg["kind"] == 0).sum())
    return pd.DataFrame({"n_distinct": [n_distinct]}), counters


def encoded_string_value_count(enc_dir: str, col: str, value: str):
    """COUNT of rows with string ``col == value`` over a table-encode
    directory, with the LENGTHS stream as a compressed-domain prefilter:
    a chunk whose encoded per-row byte-lengths contain no
    ``len(value)`` entry (one :func:`tokrle.codecs.core.count_eq` over
    the narrow integer lengths payload) never decodes its text bytes —
    for selective predicates most chunks skip the FSST decode entirely.
    Surviving chunks decode lengths + flat bytes and compare only the
    length-matching candidate rows, vectorized.  Null slots encode as
    ``""`` with a validity bitmap; they are excluded from matches (SQL
    ``col = ''`` never matches NULL), so nullable chunks stay exact
    rather than raising.  Returns ``(DataFrame(n_match), counters)``
    where counters report how many chunks the length prefilter
    eliminated."""
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    from tokrle.codecs.core import count_eq, decode as codec_decode

    vbytes = value.encode("utf-8")
    vlen = len(vbytes)
    varr = np.frombuffer(vbytes, dtype=np.uint8)
    # validate the column kind up front: an integer column has no
    # __lens_payload, and the read below would fail with an opaque
    # missing-column KeyError instead of naming the contract
    spec0 = ray.data.read_parquet(
        enc_dir, columns=[f"{col}__codec"]).take(1)
    if spec0 and not str(spec0[0][f"{col}__codec"]) \
            .startswith(("str:", "sdict:")):
        raise TypeError(f"column {col!r}: not a string column "
                        f"({spec0[0][f'{col}__codec']})")
    need = ["n_rows"] + [f"{col}__{p}"
                         for p in ("codec", "payload", "lens_payload",
                                   "valid")]

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        codecs = batch.column(f"{col}__codec").to_pylist()
        lens_payloads = batch.column(f"{col}__lens_payload")
        payloads = batch.column(f"{col}__payload")
        valids = batch.column(f"{col}__valid")
        total = 0
        decoded = 0
        for i, spec in enumerate(codecs):
            n = int(nrows[i])
            if n == 0:
                continue
            if spec.startswith("sdict:"):
                # dictionary form: the value maps to a code (or misses)
                # and the count comes from the integer code stream —
                # neither the text nor the per-row lengths decode
                from tokrle.codecs.core import (_sdict_codes_of,
                                                sdict_unpack)
                ccodec, codes_p, dlens, dbytes = sdict_unpack(
                    spec, memoryview(payloads[i].as_buffer()))
                hit = _sdict_codes_of(dlens, dbytes, [vbytes])
                if not hit:
                    continue
                vb = valids[i].as_py() or b""
                if not vb:
                    total += count_eq(ccodec, codes_p, n, np.int64,
                                      hit[0])
                    continue
                cv = codec_decode(ccodec, codes_p, n, np.int64)
                valid = np.unpackbits(
                    np.frombuffer(vb, dtype=np.uint8), count=n,
                    bitorder="little").astype(bool)
                total += int(((cv == hit[0]) & valid).sum())
                continue
            if not spec.startswith("str:"):
                raise TypeError(
                    f"column {col!r}: not a string column ({spec})")
            _, lcodec, tcodec = spec.split(":", 2)
            lp = memoryview(lens_payloads[i].as_buffer())
            # compressed-domain length prefilter: no row of the right
            # byte length -> the text payload is never decoded
            if count_eq(lcodec, lp, n, np.int64, vlen) == 0:
                continue
            decoded += 1
            lens = codec_decode(lcodec, lp, n, np.int64)
            cand = lens == vlen
            vb = valids[i].as_py() or b""
            if vb:      # null slots encode as "" — never a match
                valid = np.unpackbits(
                    np.frombuffer(vb, dtype=np.uint8), count=n,
                    bitorder="little").astype(bool)
                cand &= valid
            if not cand.any():
                continue
            if vlen == 0:
                total += int(np.count_nonzero(cand))
                continue
            data = codec_decode(
                tcodec, memoryview(payloads[i].as_buffer()),
                int(lens.sum()), np.int8).view(np.uint8)
            offs = np.concatenate(([0], np.cumsum(lens)))
            starts = offs[:-1][cand]
            idx = starts[:, None] + np.arange(vlen)
            total += int(np.count_nonzero((data[idx] == varr).all(axis=1)))
        return pa.table({
            "n_match": pa.array([total], type=pa.int64()),
            "chunks": pa.array([len(batch)], type=pa.int64()),
            "text_decoded": pa.array([decoded], type=pa.int64())})

    ds = ray.data.read_parquet(enc_dir, columns=need)
    row = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n_match", alias_name="n_match"),
        Sum("chunks", alias_name="chunks"),
        Sum("text_decoded", alias_name="text_decoded"))
    counters = {"chunks_total": int(row["chunks"] or 0),
                "chunks_text_decoded": int(row["text_decoded"] or 0),
                "chunks_skipped_by_length":
                    int(row["chunks"] or 0) - int(row["text_decoded"] or 0)}
    return pd.DataFrame({"n_match": [int(row["n_match"] or 0)]}), counters


def encoded_histogram(enc_dir: str, col: str):
    """Exact GROUP BY ``col`` COUNT(*) over a table-encode directory:
    each chunk's (value, count) histogram comes from the codec streams
    via :func:`tokrle.codecs.core.value_counts` (dict: dictionary + one
    bincount over the narrow code stream, no value gather; rle:
    run-length fold per unique run value in O(#runs log #runs)), and a
    hash-partitioned sum over the per-chunk pairs produces the global
    histogram — the exchange carries (value, partial_count) pairs
    bounded by chunk cardinality, never rows.

    Same cardinality guidance and null contract as
    :func:`encoded_distinct_count`.  Returns ``(DataFrame(value, n)
    sorted by value, counters)``."""
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    from tokrle.codecs.core import value_counts

    need = ["n_rows"] + [f"{col}__{p}"
                         for p in ("codec", "payload", "dtype", "valid")]

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        payloads = batch.column(f"{col}__payload")
        codecs = batch.column(f"{col}__codec").to_pylist()
        dtypes = batch.column(f"{col}__dtype").to_pylist()
        valids = batch.column(f"{col}__valid")
        vs, cs = [], []
        for i, codec in enumerate(codecs):
            if len(valids[i].as_py() or b""):
                raise ValueError(
                    f"column {col!r}: nullable chunks not supported by "
                    "the compressed-domain histogram (encode fills "
                    "nulls with 0)")
            v, c = value_counts(codec,
                                memoryview(payloads[i].as_buffer()),
                                int(nrows[i]), np.dtype(dtypes[i]))
            vs.append(v)
            cs.append(c)
        if not vs:
            return pa.table({"v": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        # combine within the batch before the exchange: one more
        # unique-fold so repeated values across chunks ship once
        v_all = np.concatenate(vs)
        c_all = np.concatenate(cs)
        uniq, inv = np.unique(v_all, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, c_all)
        return pa.table({"v": pa.array(uniq), "c": pa.array(sums)})

    ds = ray.data.read_parquet(enc_dir, columns=need)
    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("v").aggregate(Sum("c", alias_name="n")).to_pandas()
    hist = hist.rename(columns={"v": "value"})
    hist["n"] = hist["n"].astype("int64")
    n_chunks = _n_chunks(enc_dir)
    counters = {"chunks_total": int(n_chunks),
                "hist_rows": int(len(hist))}
    return hist.sort_values("value").reset_index(drop=True), counters


def _hist_rank_idx(cum: np.ndarray, n: int, q_num: int,
                   q_den: int) -> int:
    """Histogram index of the SQL ``quantile_disc`` element: the 0-based
    rank is ``ceil(q*n) - 1`` of the sorted multiset (exact integer
    ceil-division), and the lookup is the first histogram row whose
    cumulative count covers it.  Shared by the integer, grouped,
    filtered and string quantile paths so the rank rule exists once."""
    k = max((q_num * n + q_den - 1) // q_den - 1, 0)
    return int(np.searchsorted(cum, k + 1))


def _hist_rank(values: np.ndarray, cum: np.ndarray, n: int,
               q_num: int, q_den: int) -> int:
    """Integer-valued :func:`_hist_rank_idx` lookup."""
    return int(values[_hist_rank_idx(cum, n, q_num, q_den)])


_U64_FLIP = np.uint64(1 << 63)


def _hist_bias_u64(v: np.ndarray) -> np.ndarray:
    """Order-preserving uint64 -> int64 bijection (xor 2^63), so uint64
    histograms fold and rank in int64 exchanges without wrapping."""
    return (v.astype(np.uint64) ^ _U64_FLIP).view(np.int64)


def _hist_unbias_u64(x: int) -> int:
    """Inverse of :func:`_hist_bias_u64` for a single driver-side
    value."""
    return int(np.int64(x).view(np.uint64) ^ _U64_FLIP)


def _agg_fold_u64(v: np.ndarray) -> np.ndarray:
    """uint64 agg values fold in the order-preserving xor-2^63 image
    (the driver unbiases); anything else is plain int64."""
    return _hist_bias_u64(v) if v.dtype == np.uint64 \
        else v.astype(np.int64)


def _group_value_run_fold(g: np.ndarray, v: np.ndarray):
    """One lexsort run-length fold of parallel (group, value) arrays to
    per-(group, value) triples ``(groups, values, counts)``."""
    order = np.lexsort((v, g))
    g, v = g[order], v[order]
    starts = np.flatnonzero(np.concatenate(
        ([True], (g[1:] != g[:-1]) | (v[1:] != v[:-1]))))
    return g[starts], v[starts], np.diff(np.concatenate((starts,
                                                         [len(g)])))


def _group_quantile_frame(hist, qs: tuple, group_col: str,
                          is_u64: bool):
    """Driver fold shared by the grouped quantile paths: per-group rank
    selection over the folded (grp, v, c) histogram + dtype-safe
    assembly (explicit quantile dtype — pandas inference would round
    >2^63 values through float64)."""
    import pandas as pd

    rows, quants = [], []
    for grp, sub in hist.groupby("grp", sort=True):
        values = sub["v"].to_numpy()
        cum = np.cumsum(sub["c"].to_numpy())
        n = int(cum[-1])
        for q_num, q_den in qs:
            q = _hist_rank(values, cum, n, q_num, q_den)
            quants.append(_hist_unbias_u64(q) if is_u64 else q)
            rows.append({group_col: int(grp), "q_num": q_num,
                         "q_den": q_den, "n_rows": n})
    out = pd.DataFrame(rows, columns=[group_col, "q_num", "q_den",
                                      "n_rows"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    out.insert(3, "quantile", np.array(
        quants, dtype=np.uint64 if is_u64 else np.int64))
    return out.sort_values([group_col, "q_num", "q_den"]) \
        .reset_index(drop=True)


def _col_dtype_probe(enc_dir: str, col: str) -> "np.dtype | None":
    """The stored numpy dtype of ``col`` from one footer row — a
    single-row column-pruned read of the first file's ``{col}__dtype``
    (the layout is dtype-uniform per column by construction)."""
    import glob
    import os

    import pyarrow.parquet as _pq

    files = sorted(glob.glob(os.path.join(enc_dir, "**", "*.parquet"),
                             recursive=True))
    for path in files:
        t = _pq.read_table(path, columns=[f"{col}__dtype"])
        if t.num_rows:
            return np.dtype(t.column(0)[0].as_py())
    return None


def encoded_quantiles(enc_dir: str, col: str,
                      qs: tuple = ((1, 4), (1, 2), (3, 4)),
                      with_moments: bool = True):
    """Exact discrete quantiles AND exact power sums (Σv, Σv²) of ``col``
    from a table-encode directory WITHOUT decoding: the per-chunk
    (value, count) histograms of :func:`encoded_histogram` are a
    sufficient statistic for any order statistic and any moment, so the
    exchange carries only cardinality-bounded pairs and the driver folds
    the global histogram — values themselves never move.

    Quantile semantics match SQL ``quantile_disc(col, q)``: the element
    at 0-based rank ``ceil(q*n) - 1`` of the sorted multiset.  Each
    ``q`` is an exact integer fraction ``(num, den)`` so the rank is
    computed in integer arithmetic (no float rounding at rank
    boundaries).  Power sums fold in Python integers (arbitrary
    precision) and are range-checked into int64 — Σv² of a large-value
    column that would overflow raises rather than wrapping.

    ``with_moments=False`` skips the power sums (and their int64 range
    check) — the right mode for timestamp-typed columns, whose
    microsecond epoch sums overflow int64 by construction while their
    order statistics stay perfectly well-defined.

    Same cardinality guidance and null contract as
    :func:`encoded_histogram`.  Returns ``(DataFrame(q_num, q_den,
    quantile, sum_v, sum_v2, n_rows), counters)`` with one row per
    requested quantile (no ``sum_v``/``sum_v2`` columns without
    moments)."""
    import pandas as pd

    hist, counters = encoded_histogram(enc_dir, col)
    values = hist["value"].to_numpy()
    if values.dtype.kind == "M":
        # datetime histograms rank identically in their int64 epoch
        # image; present quantiles as exact epoch MICROSECONDS
        # (DuckDB's internal timestamp unit, = epoch_us(...))
        unit = np.datetime_data(values.dtype)[0]
        factor = {"s": 1_000_000, "ms": 1_000, "us": 1}.get(unit)
        values = values.view(np.int64) // 1_000 if factor is None \
            else values.view(np.int64) * factor
    counts = hist["n"].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    # exact integer moments over the histogram (Python ints: no 2^53
    # float ceiling, no silent int64 wrap mid-fold)
    sum_v = sum_v2 = 0
    if with_moments:
        sum_v = sum(int(v) * int(c) for v, c in zip(values, counts))
        sum_v2 = sum(int(v) * int(v) * int(c)
                     for v, c in zip(values, counts))
        for name, s in (("sum_v", sum_v), ("sum_v2", sum_v2)):
            if not (-(1 << 63) <= s < (1 << 63)):
                raise OverflowError(
                    f"column {col!r}: {name}={s} exceeds int64; "
                    "aggregate in a wider representation before "
                    "presenting")
    rows = []
    quants = []
    for q_num, q_den in qs:
        quants.append(None if n == 0 else _hist_rank(values, cum, n,
                                                     q_num, q_den))
        rows.append({"q_num": q_num, "q_den": q_den,
                     **({"sum_v": sum_v, "sum_v2": sum_v2}
                        if with_moments else {}),
                     "n_rows": n})
    counters["n_rows"] = n
    df = pd.DataFrame(rows)
    # explicit dtype: pandas would otherwise round >2^63 uint64 values
    # through float64 during inference, corrupting the low bits
    if n == 0:
        df.insert(2, "quantile", pd.Series(quants, dtype="object"))
    else:
        df.insert(2, "quantile", np.array(
            quants, dtype=np.uint64 if values.dtype == np.uint64
            else np.int64))
    return df, counters


def encoded_group_agg(enc_dir: str, group_col: str, agg_cols: list[str],
                      *, with_minmax: bool = False):
    """GROUP BY ``group_col`` with COUNT/SUM (and optionally MIN/MAX, see
    below) of ``agg_cols`` over a table-encode directory, split per chunk
    on the group column's zone map:

    - PURE chunks (``vmin == vmax``: one group spans the whole chunk —
      the common case when the table is clustered on the group key):
      the group id comes from the zone map and each SUM from
      :func:`tokrle.codecs.core.agg_sum` — neither column decodes;
    - MIXED chunks decode and fold with one lexsort + ``add.reduceat``
      per chunk (only the cluster boundaries, on a clustered layout).

    Partials from both classes meet in one small ``groupby(group).sum``
    over per-chunk rows — the exchange carries (group, partial sums),
    never table rows.  Returns ``(DataFrame, counters)``; integer
    columns only, nullable chunks raise.

    ``with_minmax=True`` adds per-group MIN/MAX: pure chunks answer from
    the agg column's own ZONE MAP (``__vmin``/``__vmax`` — zero decode,
    like the SUM), mixed chunks from ``minimum/maximum.reduceat`` in the
    same sorted pass the sums already make."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    from tokrle.codecs.core import agg_sum, decode as codec_decode

    pure = pc.field(f"{group_col}__vmin") == pc.field(f"{group_col}__vmax")
    base_cols = ["n_rows", f"{group_col}__vmin"] + [
        f"{c}__{part}" for c in agg_cols
        for part in ("codec", "payload", "dtype", "valid")]
    if with_minmax:
        base_cols += [f"{c}__{p}" for c in agg_cols for p in ("vmin",
                                                              "vmax")]

    def _chunk_col(batch, c, i, n):
        if len(batch.column(f"{c}__valid")[i].as_py() or b""):
            raise ValueError(
                f"column {c!r}: nullable chunks not supported by the "
                "compressed-domain aggregate")
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                n, np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    def pure_partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        groups = batch.column(f"{group_col}__vmin").to_numpy(
            zero_copy_only=False)
        out = {"grp": pa.array(groups.astype(np.int64), type=pa.int64()),
               "n": pa.array(nrows.astype(np.int64), type=pa.int64()),
               "pure_chunks": pa.array(np.ones(len(batch), np.int64),
                                       type=pa.int64())}
        for c in agg_cols:
            sums = [agg_sum(*_chunk_col(batch, c, i, int(nrows[i])))
                    for i in range(len(batch))]
            out[f"sum_{c}"] = pa.array(sums, type=pa.int64())
            if with_minmax:
                out[f"min_{c}"] = batch.column(f"{c}__vmin") \
                    .cast(pa.int64())
                out[f"max_{c}"] = batch.column(f"{c}__vmax") \
                    .cast(pa.int64())
        return pa.table(out)

    def mixed_partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        grp_parts, n_parts, sum_parts = [], [], {c: [] for c in agg_cols}
        min_parts = {c: [] for c in agg_cols}
        max_parts = {c: [] for c in agg_cols}
        for i in range(len(batch)):
            n = int(nrows[i])
            g = codec_decode(*_chunk_col(batch, group_col, i, n)) \
                .astype(np.int64)
            order = np.argsort(g, kind="mergesort")
            gs = g[order]
            starts = np.flatnonzero(
                np.concatenate(([True], gs[1:] != gs[:-1])))
            grp_parts.append(gs[starts])
            n_parts.append(np.diff(np.concatenate((starts, [n]))))
            for c in agg_cols:
                v = codec_decode(*_chunk_col(batch, c, i, n)) \
                    .astype(np.int64)[order]
                sum_parts[c].append(np.add.reduceat(v, starts))
                if with_minmax:
                    min_parts[c].append(np.minimum.reduceat(v, starts))
                    max_parts[c].append(np.maximum.reduceat(v, starts))
        grp = np.concatenate(grp_parts) if grp_parts else \
            np.empty(0, np.int64)
        out = {"grp": pa.array(grp, type=pa.int64()),
               "n": pa.array(np.concatenate(n_parts).astype(np.int64)
                             if n_parts else np.empty(0, np.int64),
                             type=pa.int64()),
               "pure_chunks": pa.array(np.zeros(len(grp), np.int64),
                                       type=pa.int64())}
        for c in agg_cols:
            out[f"sum_{c}"] = pa.array(
                np.concatenate(sum_parts[c]) if sum_parts[c]
                else np.empty(0, np.int64), type=pa.int64())
            if with_minmax:
                for nm, parts in ((f"min_{c}", min_parts[c]),
                                  (f"max_{c}", max_parts[c])):
                    out[nm] = pa.array(
                        np.concatenate(parts) if parts
                        else np.empty(0, np.int64), type=pa.int64())
        return pa.table(out)

    pure_ds = ray.data.read_parquet(enc_dir, columns=base_cols,
                                    filter=pure) \
        .map_batches(pure_partial, batch_format="pyarrow")
    mixed_ds = ray.data.read_parquet(
        enc_dir,
        columns=list(dict.fromkeys(base_cols + [
            f"{group_col}__{p}" for p in ("codec", "payload", "dtype",
                                          "valid")])),
        filter=~pure).map_batches(mixed_partial, batch_format="pyarrow")

    aggs = [Sum("n", alias_name="n"),
            Sum("pure_chunks", alias_name="pure_chunks")] + \
        [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in agg_cols]
    if with_minmax:
        aggs += [Min(f"min_{c}", alias_name=f"min_{c}") for c in agg_cols]
        aggs += [Max(f"max_{c}", alias_name=f"max_{c}") for c in agg_cols]
    df = pure_ds.union(mixed_ds).groupby("grp").aggregate(*aggs) \
        .to_pandas()
    pure_chunks = int(df["pure_chunks"].sum())
    counters = {"pure_chunks": pure_chunks,
                "groups": len(df)}
    df = df.drop(columns=["pure_chunks"]) \
        .rename(columns={"grp": group_col}) \
        .sort_values(group_col).reset_index(drop=True)
    for c in df.columns:
        if c != group_col:
            df[c] = df[c].astype("int64")
    return df, counters


def encoded_group_quantiles(enc_dir: str, group_col: str, agg_col: str,
                            qs: tuple = ((1, 4), (1, 2), (3, 4))):
    """Exact per-group discrete quantiles of ``agg_col`` GROUP BY
    ``group_col`` from the encoded layout — the GROUP BY split of
    :func:`encoded_group_agg` composed with the histogram sufficient
    statistic of :func:`encoded_quantiles`:

    - PURE chunks (group zone map ``vmin == vmax``): the group id comes
      from the zone map (group column never decodes) and the agg
      column's (value, count) histogram from
      :func:`tokrle.codecs.core.value_counts` (dict/rle closed forms);
    - MIXED chunks decode both and fold one histogram per (group, value)
      pair with a single lexsort + run-length count per chunk.

    The exchange carries (group, value, partial_count) triples — bounded
    by group cardinality x per-chunk value cardinality, never rows — and
    the driver folds per-group ranks with the same exact integer
    ceil-division as :func:`encoded_quantiles` (SQL ``quantile_disc``
    semantics).  Integer columns only, nullable chunks raise.  Returns
    ``(DataFrame(group_col, q_num, q_den, quantile, n_rows), counters)``
    with one row per (group, q)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from tokrle.codecs.core import decode as codec_decode
    from tokrle.codecs.core import value_counts

    pure = pc.field(f"{group_col}__vmin") == pc.field(f"{group_col}__vmax")
    base_cols = ["n_rows", f"{group_col}__vmin"] + [
        f"{agg_col}__{p}" for p in ("codec", "payload", "dtype", "valid")]

    def _chunk_col(batch, c, i, n):
        if len(batch.column(f"{c}__valid")[i].as_py() or b""):
            raise ValueError(
                f"column {c!r}: nullable chunks not supported by the "
                "compressed-domain grouped quantile")
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                n, np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    def pure_partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        groups = batch.column(f"{group_col}__vmin").to_numpy(
            zero_copy_only=False).astype(np.int64)
        gs, vs, cs, flags = [], [], [], []
        for i in range(len(batch)):
            v, c = value_counts(*_chunk_col(batch, agg_col, i,
                                            int(nrows[i])))
            gs.append(np.full(len(v), groups[i], np.int64))
            vs.append(_agg_fold_u64(v))
            cs.append(c)
            # per-CHUNK counter: flag only the chunk's first triple
            f = np.zeros(len(v), np.int64)
            if len(f):
                f[0] = 1
            flags.append(f)
        empty = np.empty(0, np.int64)
        return pa.table({
            "grp": pa.array(np.concatenate(gs) if gs else empty),
            "v": pa.array(np.concatenate(vs) if vs else empty),
            "c": pa.array(np.concatenate(cs).astype(np.int64) if cs
                          else empty),
            "pure_chunks": pa.array(np.concatenate(flags) if flags
                                    else empty)})

    def mixed_partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        gs, vs, cs = [], [], []
        for i in range(len(batch)):
            n = int(nrows[i])
            g, v, c = _group_value_run_fold(
                codec_decode(*_chunk_col(batch, group_col, i, n))
                .astype(np.int64),
                _agg_fold_u64(codec_decode(*_chunk_col(batch, agg_col,
                                                       i, n))))
            gs.append(g)
            vs.append(v)
            cs.append(c)
        empty = np.empty(0, np.int64)
        return pa.table({
            "grp": pa.array(np.concatenate(gs) if gs else empty),
            "v": pa.array(np.concatenate(vs) if vs else empty),
            "c": pa.array(np.concatenate(cs).astype(np.int64)
                          if cs else empty),
            "pure_chunks": pa.array(
                np.zeros(sum(len(g) for g in gs), np.int64)
                if gs else empty)})

    pure_ds = ray.data.read_parquet(enc_dir, columns=base_cols,
                                    filter=pure) \
        .map_batches(pure_partial, batch_format="pyarrow")
    mixed_ds = ray.data.read_parquet(
        enc_dir,
        columns=list(dict.fromkeys(base_cols + [
            f"{group_col}__{p}" for p in ("codec", "payload", "dtype",
                                          "valid")])),
        filter=~pure).map_batches(mixed_partial, batch_format="pyarrow")

    # the triples are cardinality-bounded partials: fold them on the
    # driver (same shape as the repo's other driver folds) — one pandas
    # groupby over (group, value), then per-group rank selection
    part = pure_ds.union(mixed_ds).to_pandas()
    if part.empty:
        # every chunk was empty (or the table had zero rows): not even
        # one triple exists, so there are no groups to report
        part = pd.DataFrame({"grp": pd.Series(dtype="int64"),
                             "v": pd.Series(dtype="int64"),
                             "c": pd.Series(dtype="int64"),
                             "pure_chunks": pd.Series(dtype="int64")})
    is_u64 = _col_dtype_probe(enc_dir, agg_col) == np.dtype(np.uint64)
    pure_chunks = int(part["pure_chunks"].sum()) if len(part) else 0
    hist = part.groupby(["grp", "v"], sort=True)["c"].sum().reset_index()
    counters = {"pure_chunks": pure_chunks,
                "groups": int(hist["grp"].nunique()),
                "hist_rows": int(len(hist))}
    return _group_quantile_frame(hist, qs, group_col, is_u64), counters


def _boolean_value_hist(enc_dir: str, expr: tuple, agg_col: str):
    """Shared core of the filtered histogram family: evaluate the
    predicate TREE per chunk (zone-map leaf short-circuits, 3VL on
    nullable predicate columns, conservative scan filter — exactly as
    in :func:`encoded_boolean_agg`) and fold the (value, count)
    histogram of ``agg_col`` over ONLY the selected rows:

    - ALL-match chunks take their histogram from
      :func:`tokrle.codecs.core.value_counts` (dict/rle closed forms —
      zero decode);
    - run-list chunks late-materialize ONLY the selected positions
      (:func:`gather_runs`) and fold their counts.

    The exchange carries (value, partial_count) pairs bounded by chunk
    cardinality — never rows — plus three counter rows.  uint64 agg
    columns fold in the order-preserving xor-2^63 image.  Returns
    ``(hist, counters, is_u64)`` where ``hist`` is a pandas Series
    (index = folded value, possibly biased; values = exact counts)
    sorted by value."""
    import pandas as pd
    import ray.data

    from tokrle.codecs.core import gather_runs, value_counts

    pred_cols = _expr_pred_cols(expr)
    str_cols = _expr_str_cols(expr)
    null_cols = _expr_null_cols(expr)
    n_total = _n_chunks(enc_dir)
    need = ["n_rows"] + [f"{c}__{p}" for c in pred_cols
                         for p in ("vmin", "vmax")] + [
        f"{c}__{p}"
        for c in dict.fromkeys(pred_cols + [agg_col])
        for p in ("codec", "payload", "dtype", "valid")] + [
        f"{c}__{p}" for c in str_cols
        for p in ("codec", "payload", "lens_payload", "valid")]
    need += [f"{c}__valid" for c in null_cols
             if f"{c}__valid" not in need]

    def _chunk_col(batch, c, i):
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    def _valid(batch, c, i) -> bytes:
        return batch.column(f"{c}__valid")[i].as_py() or b""

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        zmin = {c: batch.column(f"{c}__vmin").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        zmax = {c: batch.column(f"{c}__vmax").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        vs, cs = [], []
        all_hit = run_chunks = 0
        for i in range(len(batch)):
            n = int(nrows[i])
            if n == 0:
                continue
            sel = _expr_eval(expr, i, n, zmin, zmax,
                             lambda col, j: _chunk_col(batch, col, j),
                             lambda col, j: _chunk_str_col(batch, col, j),
                             lambda col, j: _valid(batch, col, j))
            if not isinstance(sel, str) and not len(sel[0]):
                continue  # provably empty selection: nullability moot
            if _valid(batch, agg_col, i):
                raise ValueError(
                    f"column {agg_col!r}: nullable chunks not supported "
                    "by the compressed-domain quantile (encode fills "
                    "nulls with 0)")
            codec, payload, dt = _chunk_col(batch, agg_col, i)
            if isinstance(sel, str):
                all_hit += 1
                v, c = value_counts(codec, payload, n, dt)
            else:
                run_chunks += 1
                picked = gather_runs(codec, payload, n, dt, *sel)
                v, c = np.unique(picked, return_counts=True)
            # uint64 folds in the order-preserving xor-2^63 image (the
            # driver unbiases); anything else is plain int64
            vs.append(_hist_bias_u64(v) if v.dtype == np.uint64
                      else v.astype(np.int64))
            cs.append(c.astype(np.int64))
        empty = np.empty(0, np.int64)
        v_all = np.concatenate(vs) if vs else empty
        c_all = np.concatenate(cs) if cs else empty
        # three counter rows ride the same exchange under kind=1 so one
        # streaming pass carries data and instrumentation
        return pa.table({
            "kind": pa.array(np.concatenate(
                (np.zeros(len(v_all), np.int64), np.arange(1, 4))),
                type=pa.int64()),
            "v": pa.array(np.concatenate(
                (v_all, [len(batch), all_hit, run_chunks])),
                type=pa.int64()),
            "c": pa.array(np.concatenate((c_all, [1, 1, 1])),
                          type=pa.int64())})

    flt = _expr_zone_filter(expr)
    part = ray.data.read_parquet(enc_dir, columns=need, filter=flt) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    if part.empty:
        # the scan filter pruned EVERY chunk: no batch ever ran, so not
        # even counter rows exist — the selection is provably empty
        part = pd.DataFrame({"kind": pd.Series(dtype="int64"),
                             "v": pd.Series(dtype="int64"),
                             "c": pd.Series(dtype="int64")})
    meters = part[part["kind"] > 0].groupby("kind")["v"].sum()
    hist = part[part["kind"] == 0].groupby("v", sort=True)["c"].sum()
    is_u64 = _col_dtype_probe(enc_dir, agg_col) == np.dtype(np.uint64)
    scanned = int(meters.get(1, 0))
    counters = {"chunks_total": n_total,
                "chunks_scanned": scanned,
                "chunks_skipped": n_total - scanned,
                "all_hit_chunks": int(meters.get(2, 0)),
                "run_chunks": int(meters.get(3, 0)),
                "hist_rows": int(len(hist))}
    return hist, counters, is_u64


def encoded_boolean_quantiles(enc_dir: str, expr: tuple, agg_col: str,
                              qs: tuple = ((1, 4), (1, 2), (3, 4))):
    """Exact discrete quantiles of ``agg_col`` over the rows WHERE a
    boolean predicate TREE holds — order statistics joining the
    predicate algebra over the :func:`_boolean_value_hist` sufficient
    statistic; the driver folds ranks with the shared exact integer
    ceil-division.  Integer non-null agg columns only (the predicate
    side may be nullable — 3VL applies).  Returns
    ``(DataFrame(q_num, q_den, quantile, n_rows), counters)``;
    ``quantile`` is None when nothing matches (SQL NULL)."""
    import pandas as pd

    hist, counters, is_u64 = _boolean_value_hist(enc_dir, expr, agg_col)
    values = hist.index.to_numpy()
    cum = np.cumsum(hist.to_numpy())
    n = int(cum[-1]) if len(cum) else 0

    def _pick(q_num, q_den):
        q = _hist_rank(values, cum, n, q_num, q_den)
        return _hist_unbias_u64(q) if is_u64 else q

    rows = [{"q_num": q_num, "q_den": q_den, "n_rows": n}
            for q_num, q_den in qs]
    quants = [None if n == 0 else _pick(q_num, q_den)
              for q_num, q_den in qs]
    df = pd.DataFrame(rows)
    # explicit dtype: pandas would otherwise round >2^63 values through
    # float64 during inference, corrupting the low bits; empty
    # selections keep None (SQL NULL) in an object column
    if n == 0:
        df.insert(2, "quantile", pd.Series(quants, dtype="object"))
    else:
        df.insert(2, "quantile", np.array(
            quants, dtype=np.uint64 if is_u64 else np.int64))
    return df, counters


def encoded_boolean_histogram(enc_dir: str, expr: tuple, agg_col: str):
    """Exact GROUP BY value COUNT(*) over only the rows WHERE a boolean
    predicate TREE holds — :func:`encoded_histogram` joined with the
    predicate algebra via :func:`_boolean_value_hist` (ALL-match chunks
    histogram from the codec streams with zero decode, run chunks
    late-materialize selected positions only).  Same cardinality
    guidance as the unfiltered histogram.  Returns
    ``(DataFrame(value, n) sorted by value, counters)``."""
    import pandas as pd

    hist, counters, is_u64 = _boolean_value_hist(enc_dir, expr, agg_col)
    values = hist.index.to_numpy()
    if is_u64:
        values = (values.view(np.uint64) ^ _U64_FLIP)
    out = pd.DataFrame({"value": values,
                        "n": hist.to_numpy().astype(np.int64)})
    # the biased int64 sort order IS the uint64 order, so re-sorting
    # after the unbias is unnecessary — values are already ascending
    return out.reset_index(drop=True), counters


def encoded_boolean_topk(enc_dir: str, expr: tuple, col: str, k: int):
    """``ORDER BY col DESC LIMIT k`` over only the rows WHERE a boolean
    predicate TREE holds, as a (value, count) multiset with exact tie
    trimming — the filtered sibling of :func:`encoded_topk_rows`.

    Unlike the unfiltered top-k, the metadata-only exclusion threshold
    is unsound here (a chunk's zone map cannot bound how many of its
    rows SURVIVE the predicate), so this derives from the full filtered
    histogram — the exchange stays bounded by chunk value cardinality
    and the predicate's zone pruning still skips non-overlapping
    chunks.  Returns ``(DataFrame(value, n) sorted desc with
    sum(n) == min(k, selected rows), counters)``."""
    hist, counters, is_u64 = _boolean_value_hist(enc_dir, expr, col)
    values = hist.index.to_numpy()[::-1]          # descending
    counts = hist.to_numpy()[::-1].astype(np.int64)
    cum = np.cumsum(counts)
    cut = int(np.searchsorted(cum, k))            # first idx covering k
    values, counts, cum = (values[:cut + 1], counts[:cut + 1],
                           cum[:cut + 1])
    if len(counts) and cum[-1] > k:               # exact tie trim
        counts[-1] -= int(cum[-1] - k)
    import pandas as pd

    if is_u64:
        values = values.view(np.uint64) ^ _U64_FLIP
    out = pd.DataFrame({"value": values, "n": counts})
    out = out[out["n"] > 0]
    return out.reset_index(drop=True), counters


def encoded_group_where_quantiles(enc_dir: str, expr: tuple,
                                  group_col: str, agg_col: str,
                                  qs: tuple = ((1, 4), (1, 2), (3, 4))):
    """Per-group exact quantiles of ``agg_col`` over only the rows WHERE
    a boolean predicate TREE holds — the full composition: predicate
    algebra x GROUP BY x order statistics.  Per chunk:

    - the tree evaluates to ``_ALL`` / a selection run-list / empty
      exactly as in :func:`encoded_boolean_agg` (zone-map leaf
      short-circuits, 3VL nullable predicates, conservative scan
      filter);
    - ALL-selected chunks that are also GROUP-PURE (group zone map
      ``vmin == vmax``) take the agg histogram from the codec streams
      (:func:`value_counts` closed forms) with the group id from the
      zone map — neither column decodes;
    - every other surviving chunk late-materializes ONLY the selected
      positions of both columns (:func:`gather_runs`) and folds one
      lexsort run-length count.

    The exchange carries (group, value, count) triples plus counter
    rows; per-group ranks fold with the shared integer ceil-division.
    Integer group column (zone maps required); integer or uint64 agg
    column (uint64 folds in the xor-2^63 image); nullable agg chunks
    with a non-empty selection raise.  Returns
    ``(DataFrame(group_col, q_num, q_den, quantile, n_rows),
    counters)``."""
    import pandas as pd
    import ray.data

    from tokrle.codecs.core import decode as codec_decode
    from tokrle.codecs.core import gather_runs, value_counts

    pred_cols = _expr_pred_cols(expr)
    str_cols = _expr_str_cols(expr)
    null_cols = _expr_null_cols(expr)
    n_total = _n_chunks(enc_dir)
    need = ["n_rows"] + [
        f"{c}__{p}" for c in dict.fromkeys(pred_cols + [group_col])
        for p in ("vmin", "vmax")] + [
        f"{c}__{p}"
        for c in dict.fromkeys(pred_cols + [group_col, agg_col])
        for p in ("codec", "payload", "dtype", "valid")] + [
        f"{c}__{p}" for c in str_cols
        for p in ("codec", "payload", "lens_payload", "valid")]
    need += [f"{c}__valid" for c in null_cols
             if f"{c}__valid" not in need]
    need = list(dict.fromkeys(need))

    def _chunk_col(batch, c, i):
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    def _valid(batch, c, i) -> bytes:
        return batch.column(f"{c}__valid")[i].as_py() or b""

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        zmin = {c: batch.column(f"{c}__vmin").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        zmax = {c: batch.column(f"{c}__vmax").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        gvmin = batch.column(f"{group_col}__vmin").to_numpy(
            zero_copy_only=False)
        gvmax = batch.column(f"{group_col}__vmax").to_numpy(
            zero_copy_only=False)
        gs, vs, cs = [], [], []
        closed = gathered = 0
        for i in range(len(batch)):
            n = int(nrows[i])
            if n == 0:
                continue
            sel = _expr_eval(expr, i, n, zmin, zmax,
                             lambda col, j: _chunk_col(batch, col, j),
                             lambda col, j: _chunk_str_col(batch, col, j),
                             lambda col, j: _valid(batch, col, j))
            is_all = isinstance(sel, str)
            if not is_all and not len(sel[0]):
                continue
            for c in (group_col, agg_col):
                if _valid(batch, c, i):
                    raise ValueError(
                        f"column {c!r}: nullable chunks not supported "
                        "by the compressed-domain grouped quantile")
            group_pure = gvmin[i] == gvmax[i]
            ac, ap, adt = _chunk_col(batch, agg_col, i)
            if group_pure:
                # the zone map names the single group — the group
                # column NEVER decodes on pure chunks, whatever the
                # selection shape
                if is_all:
                    closed += 1
                    v, c = value_counts(ac, ap, n, adt)
                    v = _agg_fold_u64(v)
                    c = c.astype(np.int64)
                else:
                    gathered += 1
                    v, c = np.unique(
                        _agg_fold_u64(gather_runs(ac, ap, n, adt,
                                                  *sel)),
                        return_counts=True)
                gs.append(np.full(len(v), int(gvmin[i]), np.int64))
                vs.append(v)
                cs.append(c.astype(np.int64))
                continue
            gathered += 1
            gc, gp, gdt = _chunk_col(batch, group_col, i)
            if is_all:
                # wholly selected, group-mixed: straight decode beats a
                # synthetic full-range gather
                g = codec_decode(gc, gp, n, gdt).astype(np.int64)
                v = _agg_fold_u64(codec_decode(ac, ap, n, adt))
            else:
                g = gather_runs(gc, gp, n, gdt, *sel).astype(np.int64)
                v = _agg_fold_u64(gather_runs(ac, ap, n, adt, *sel))
            g, v, c = _group_value_run_fold(g, v)
            gs.append(g)
            vs.append(v)
            cs.append(c)
        empty = np.empty(0, np.int64)
        g_all = np.concatenate(gs) if gs else empty
        return pa.table({
            "kind": pa.array(np.concatenate(
                (np.zeros(len(g_all), np.int64), [1, 2, 3])),
                type=pa.int64()),
            "grp": pa.array(np.concatenate(
                (g_all, [0, 0, 0])), type=pa.int64()),
            "v": pa.array(np.concatenate(
                (np.concatenate(vs) if vs else empty,
                 [len(batch), closed, gathered])), type=pa.int64()),
            "c": pa.array(np.concatenate(
                (np.concatenate(cs).astype(np.int64) if cs else empty,
                 [1, 1, 1])), type=pa.int64())})

    flt = _expr_zone_filter(expr)
    part = ray.data.read_parquet(enc_dir, columns=need, filter=flt) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    if part.empty:
        part = pd.DataFrame({"kind": pd.Series(dtype="int64"),
                             "grp": pd.Series(dtype="int64"),
                             "v": pd.Series(dtype="int64"),
                             "c": pd.Series(dtype="int64")})
    meters = part[part["kind"] > 0].groupby("kind")["v"].sum()
    hist = part[part["kind"] == 0].groupby(
        ["grp", "v"], sort=True)["c"].sum().reset_index()
    is_u64 = _col_dtype_probe(enc_dir, agg_col) == np.dtype(np.uint64)
    scanned = int(meters.get(1, 0))
    counters = {"chunks_total": n_total,
                "chunks_scanned": scanned,
                "chunks_skipped": n_total - scanned,
                "closed_form_chunks": int(meters.get(2, 0)),
                "gathered_chunks": int(meters.get(3, 0)),
                "groups": int(hist["grp"].nunique()),
                "hist_rows": int(len(hist))}
    return _group_quantile_frame(hist, qs, group_col, is_u64), counters


def encoded_filtered_agg(enc_dir: str, key_col: str, value: int,
                         agg_cols: list[str]):
    """``SELECT count(*), sum(agg_cols...) WHERE key_col == value`` over
    a table-encode directory, evaluated against the compressed layout:

    - chunks whose zone map excludes the value never leave storage (the
      predicate is pushed into the Parquet scan over ``__vmin/__vmax``);
    - PURE-HIT chunks (``vmin == vmax == value``: every row matches —
      the common case when the table is clustered on the key) answer
      count from the chunk row count and each SUM via
      :func:`tokrle.codecs.core.agg_sum` — no positional work at all;
    - the rest build a selection run-list from the KEY column via
      :func:`tokrle.codecs.core.match_eq` (rle: the matching runs ARE
      the selection; dict: one searchsorted + a code compare) and sum
      each agg column inside those runs via
      :func:`tokrle.codecs.core.agg_sum_runs` (rle agg columns zip
      selection runs against value runs with a prefix-weighted closed
      form — the reference's run-merge idiom as a filtered aggregate);
      neither column ever materializes its n-element decode when both
      sides have compressed-domain paths.

    The exchange carries ONE partial row per batch.  Integer key and agg
    columns only; nullable chunks raise.  Returns ``(DataFrame(n_match,
    sum_<c>...), counters)`` with the chunk-class split so callers can
    assert the layout actually pruned."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from tokrle.codecs.core import agg_sum, agg_sum_runs, match_eq

    value = int(value)
    overlap = (pc.field(f"{key_col}__vmin") <= value) & \
        (pc.field(f"{key_col}__vmax") >= value)
    n_total = _n_chunks(enc_dir)
    need = ["n_rows", f"{key_col}__vmin", f"{key_col}__vmax"] + [
        f"{c}__{p}" for c in dict.fromkeys([key_col] + agg_cols)
        for p in ("codec", "payload", "dtype", "valid")]

    def _chunk_col(batch, c, i):
        if len(batch.column(f"{c}__valid")[i].as_py() or b""):
            raise ValueError(
                f"column {c!r}: nullable chunks not supported by the "
                "compressed-domain filtered aggregate")
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        vmins = batch.column(f"{key_col}__vmin").to_numpy(
            zero_copy_only=False)
        vmaxs = batch.column(f"{key_col}__vmax").to_numpy(
            zero_copy_only=False)
        n_match, pure_hit, run_scanned = 0, 0, 0
        sums = {c: 0 for c in agg_cols}
        for i in range(len(batch)):
            n = int(nrows[i])
            if int(vmins[i]) == int(vmaxs[i]) == value:
                # every row matches: count from metadata, sums via the
                # whole-chunk closed form — no selection built
                pure_hit += 1
                n_match += n
                for c in agg_cols:
                    codec, payload, dt = _chunk_col(batch, c, i)
                    sums[c] += agg_sum(codec, payload, n, dt)
                continue
            codec, payload, dt = _chunk_col(batch, key_col, i)
            starts, lengths = match_eq(codec, payload, n, dt, value)
            if not len(starts):
                continue
            run_scanned += 1
            n_match += int(lengths.sum())
            for c in agg_cols:
                codec, payload, dt = _chunk_col(batch, c, i)
                sums[c] += agg_sum_runs(codec, payload, n, dt,
                                        starts, lengths)
        out = {"n_match": pa.array([n_match], type=pa.int64()),
               "chunks": pa.array([len(batch)], type=pa.int64()),
               "pure_hit": pa.array([pure_hit], type=pa.int64()),
               "run_scanned": pa.array([run_scanned], type=pa.int64())}
        for c in agg_cols:
            out[f"sum_{c}"] = pa.array([sums[c]], type=pa.int64())
        return pa.table(out)

    ds = ray.data.read_parquet(enc_dir, columns=need, filter=overlap)
    aggs = [Sum("n_match", alias_name="n_match"),
            Sum("chunks", alias_name="chunks"),
            Sum("pure_hit", alias_name="pure_hit"),
            Sum("run_scanned", alias_name="run_scanned")] + \
        [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in agg_cols]
    row = ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)
    scanned = int(row["chunks"] or 0)
    counters = {"chunks_total": n_total,
                "chunks_scanned": scanned,
                "chunks_skipped": n_total - scanned,
                "pure_hit_chunks": int(row["pure_hit"] or 0),
                "run_scanned_chunks": int(row["run_scanned"] or 0)}
    data = {"n_match": [int(row["n_match"] or 0)]}
    for c in agg_cols:
        data[f"sum_{c}"] = [int(row[f"sum_{c}"] or 0)]
    return pd.DataFrame(data), counters


def encoded_conjunction_agg(enc_dir: str, predicates: list[tuple],
                            agg_cols: list[str]):
    """``SELECT count(*), sum(agg_cols...) WHERE p1 AND p2 AND ...``
    over a table-encode directory, with every predicate evaluated in
    the compressed domain and the conjunction taken by RUN-LIST
    INTERSECTION (:func:`tokrle.codecs.core.runs_intersect` — the
    reference's run-merge inner loop as set algebra, output bounded by
    the two lists' combined length).

    ``predicates`` is a list of ``("eq", col, value)`` /
    ``("range", col, lo, hi)`` tuples.  Per chunk:

    - the scan filter is the AND of every predicate's zone-map overlap
      test — a chunk any predicate excludes never leaves storage;
    - a predicate whose zone map proves the WHOLE chunk matches
      (eq: ``vmin == vmax == value``; range: ``lo <= vmin and
      vmax <= hi``) contributes no run-list at all (ALL-match);
    - the rest build selection run-lists via match_eq / match_range and
      fold through runs_intersect, short-circuiting to nothing on the
      first empty result;
    - all-ALL chunks answer count from metadata and sums via the
      whole-chunk closed form; otherwise agg_sum_runs sums inside the
      intersected selection.

    One partial row per batch on the exchange; integer columns only;
    nullable chunks raise.  Returns ``(DataFrame(n_match, sum_<c>...),
    counters)``."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from tokrle.codecs.core import (agg_sum, agg_sum_runs, match_eq,
                                    match_range, runs_intersect)

    preds = []
    for p in predicates:
        if p[0] == "eq":
            preds.append(("eq", p[1], int(p[2]), int(p[2])))
        elif p[0] == "range":
            preds.append(("range", p[1], int(p[2]), int(p[3])))
        else:
            raise ValueError(f"unknown predicate kind {p[0]!r}")

    overlap = None
    for _, col, lo, hi in preds:
        t = (pc.field(f"{col}__vmin") <= hi) & \
            (pc.field(f"{col}__vmax") >= lo)
        overlap = t if overlap is None else overlap & t
    n_total = _n_chunks(enc_dir)
    pred_cols = list(dict.fromkeys(c for _, c, _, _ in preds))
    need = ["n_rows"] + [f"{c}__{p}" for c in pred_cols
                         for p in ("vmin", "vmax")] + [
        f"{c}__{p}"
        for c in dict.fromkeys(pred_cols + list(agg_cols))
        for p in ("codec", "payload", "dtype", "valid")]

    def _chunk_col(batch, c, i):
        if len(batch.column(f"{c}__valid")[i].as_py() or b""):
            raise ValueError(
                f"column {c!r}: nullable chunks not supported by the "
                "compressed-domain conjunction aggregate")
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        zmin = {c: batch.column(f"{c}__vmin").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        zmax = {c: batch.column(f"{c}__vmax").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        n_match, all_hit, intersected = 0, 0, 0
        sums = {c: 0 for c in agg_cols}
        for i in range(len(batch)):
            n = int(nrows[i])
            sel = None          # None == ALL positions so far
            alive = True
            for kind, col, lo, hi in preds:
                if lo <= int(zmin[col][i]) and int(zmax[col][i]) <= hi:
                    continue    # zone map proves the whole chunk matches
                codec, payload, dt = _chunk_col(batch, col, i)
                if kind == "eq":
                    runs = match_eq(codec, payload, n, dt, lo)
                else:
                    runs = match_range(codec, payload, n, dt, lo, hi)
                if not len(runs[0]):
                    alive = False
                    break
                sel = runs if sel is None else \
                    runs_intersect(*sel, *runs)
                if not len(sel[0]):
                    alive = False
                    break
            if not alive:
                continue
            if sel is None:
                # every predicate was an ALL-match: metadata count +
                # whole-chunk closed-form sums, no selection built
                all_hit += 1
                n_match += n
                for c in agg_cols:
                    codec, payload, dt = _chunk_col(batch, c, i)
                    sums[c] += agg_sum(codec, payload, n, dt)
                continue
            intersected += 1
            n_match += int(sel[1].sum())
            for c in agg_cols:
                codec, payload, dt = _chunk_col(batch, c, i)
                sums[c] += agg_sum_runs(codec, payload, n, dt, *sel)
        out = {"n_match": pa.array([n_match], type=pa.int64()),
               "chunks": pa.array([len(batch)], type=pa.int64()),
               "all_hit": pa.array([all_hit], type=pa.int64()),
               "intersected": pa.array([intersected], type=pa.int64())}
        for c in agg_cols:
            out[f"sum_{c}"] = pa.array([sums[c]], type=pa.int64())
        return pa.table(out)

    ds = ray.data.read_parquet(enc_dir, columns=need, filter=overlap)
    aggs = [Sum("n_match", alias_name="n_match"),
            Sum("chunks", alias_name="chunks"),
            Sum("all_hit", alias_name="all_hit"),
            Sum("intersected", alias_name="intersected")] + \
        [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in agg_cols]
    row = ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)
    scanned = int(row["chunks"] or 0)
    counters = {"chunks_total": n_total,
                "chunks_scanned": scanned,
                "chunks_skipped": n_total - scanned,
                "all_hit_chunks": int(row["all_hit"] or 0),
                "intersected_chunks": int(row["intersected"] or 0)}
    data = {"n_match": [int(row["n_match"] or 0)]}
    for c in agg_cols:
        data[f"sum_{c}"] = [int(row[f"sum_{c}"] or 0)]
    return pd.DataFrame(data), counters


def _n_chunks(enc_dir: str) -> int:
    """Number of chunk rows in a table-encode directory, from Parquet
    FILE METADATA alone — no Ray job, no column read.  The query
    pipelines use this for their pruning counters; spending a whole
    cluster job to count rows that the footers already record is pure
    overhead (it dominated small-scale latency)."""
    import glob

    import pyarrow.parquet as pq

    total = 0
    for f in sorted(glob.glob(os.path.join(enc_dir, "**", "*.parquet"),
                              recursive=True)):
        total += pq.ParquetFile(f).metadata.num_rows
    return total


# Sentinel: every position of the chunk matches.  Detected by TYPE
# (isinstance(..., str)) rather than identity — the evaluator and its
# callers can land on opposite sides of a cloudpickle boundary, where
# a captured global's identity is not preserved.
_ALL = "__ALL__"


def _expr_leaves(e):
    if e[0] in ("and", "or"):
        yield from _expr_leaves(e[1])
        yield from _expr_leaves(e[2])
    elif e[0] == "not":
        yield from _expr_leaves(e[1])
    else:
        yield e


def _expr_leaf_bounds(e):
    """(col, lo, hi) value bounds of a leaf — used for zone-map tests.
    For ``in`` leaves the bounds are the set's min/max (conservative:
    bound coverage does NOT imply membership, see _expr_eval)."""
    if e[0] == "eq":
        return e[1], int(e[2]), int(e[2])
    if e[0] == "range":
        return e[1], int(e[2]), int(e[3])
    if e[0] == "in":
        vals = [int(v) for v in e[2]]
        if not vals:
            return e[1], 1, 0          # empty set: an always-false leaf
        return e[1], min(vals), max(vals)
    raise ValueError(f"unknown predicate kind {e[0]!r}")


#: leaf kinds that test a STRING column (lengths-stream prefilter
#: instead of zone maps; see match_eq_str / match_prefix_str)
_STR_LEAVES = ("eq_str", "prefix_str", "in_str", "suffix_str", "contains_str")

#: leaf kinds that test the VALIDITY BITMAP alone (payload-free; any
#: column type).  ``("is_null", col)`` / ``("not_null", col)``.
_NULL_LEAVES = ("is_null", "not_null")


def _expr_pred_cols(expr) -> list[str]:
    """Distinct INTEGER predicate columns of a tree (zone-mapped)."""
    return list(dict.fromkeys(
        c for c, _, _ in (_expr_leaf_bounds(lf) for lf in
                          _expr_leaves(expr)
                          if lf[0] not in _STR_LEAVES
                          and lf[0] not in _NULL_LEAVES)))


def _expr_null_cols(expr) -> list[str]:
    """Distinct columns of ``is_null`` / ``not_null`` leaves — these
    need only ``{col}__valid`` (the codec payload is never read)."""
    return list(dict.fromkeys(lf[1] for lf in _expr_leaves(expr)
                              if lf[0] in _NULL_LEAVES))


def _expr_str_cols(expr) -> list[str]:
    """Distinct STRING predicate columns of a tree (``eq_str`` /
    ``prefix_str`` leaves: lengths-stream prefilter instead of zone
    maps)."""
    return list(dict.fromkeys(lf[1] for lf in _expr_leaves(expr)
                              if lf[0] in _STR_LEAVES))


def _chunk_str_col(batch: pa.Table, c: str, i: int):
    """(spec, lens_payload, text_payload) of string chunk ``i`` — the
    inputs of :func:`tokrle.codecs.core.match_eq_str`.  Nullable chunks
    raise (the layer contract; also keeps NOT over string leaves sound,
    SQL ``<>`` excludes NULLs)."""
    if len(batch.column(f"{c}__valid")[i].as_py() or b""):
        raise ValueError(
            f"column {c!r}: nullable chunks not supported by "
            "compressed-domain string predicates")
    return (batch.column(f"{c}__codec")[i].as_py(),
            memoryview(batch.column(f"{c}__lens_payload")[i].as_buffer()),
            memoryview(batch.column(f"{c}__payload")[i].as_buffer()))


def _expr_zone_filter(e):
    """Conservative zone-map pushdown for a predicate tree: the and/or
    tree maps to the and/or of the leaves' overlap tests; any ``not``
    branch is unprunable (the complement of a zone test is not sound)
    and returns None == read everything."""
    import pyarrow.compute as pc

    if e[0] == "and":
        a, b = _expr_zone_filter(e[1]), _expr_zone_filter(e[2])
        return a & b if a is not None and b is not None else \
            (a if b is None else b)
    if e[0] == "or":
        a, b = _expr_zone_filter(e[1]), _expr_zone_filter(e[2])
        return a | b if a is not None and b is not None else None
    if e[0] == "not":
        return None
    if e[0] in _NULL_LEAVES:
        if e[0] == "is_null":
            # only chunks that SHIP a validity bitmap can hold nulls
            return pc.binary_length(pc.field(f"{e[1]}__valid")) > 0
        return None     # not_null matches rows of nearly every chunk
    if e[0] in _STR_LEAVES:
        # string zone maps (__smin/__smax, chunk min/max values):
        # conservative overlap tests per leaf kind.  UTF-8 byte order
        # equals code-point order, so the pyarrow comparisons agree
        # with the evaluator's byte-compare semantics.
        col = e[1]
        smin = pc.field(f"{col}__smin")
        smax = pc.field(f"{col}__smax")
        if e[0] == "eq_str":
            return (smin <= e[2]) & (smax >= e[2])
        if e[0] == "in_str":
            vals = sorted(dict.fromkeys(e[2]))
            if not vals:
                return pc.field("n_rows") < 0   # empty set: always false
            # conservative [min, max] window of the set
            return (smin <= vals[-1]) & (smax >= vals[0])
        if e[0] in ("suffix_str", "contains_str"):
            return None     # no suffix/substring metadata to test
        p = e[2]                                # prefix_str
        if not p:
            return None                         # '' prefixes everything
        # a chunk may contain a p-prefixed value iff smax >= p and
        # smin < successor(p); smin < successor(p) <=> smin <= p OR
        # smin itself starts with p
        return (smax >= p) & ((smin <= p)
                              | pc.starts_with(smin, pattern=p))
    col, lo, hi = _expr_leaf_bounds(e)
    return (pc.field(f"{col}__vmin") <= hi) & \
        (pc.field(f"{col}__vmax") >= lo)


def _rp_and(a, b):
    """AND of two ``_ALL``-or-run-list selections (``_ALL`` is the
    identity)."""
    from tokrle.codecs.core import runs_intersect
    if isinstance(a, str):
        return b
    if isinstance(b, str):
        return a
    return runs_intersect(*a, *b)


def _rp_or(a, b):
    """OR of two ``_ALL``-or-run-list selections (``_ALL`` absorbs)."""
    from tokrle.codecs.core import runs_union
    if isinstance(a, str) or isinstance(b, str):
        return _ALL
    return runs_union(*a, *b)


def _rp_not(a, n: int):
    """NOT of an ``_ALL``-or-run-list selection within ``[0, n)``."""
    from tokrle.codecs.core import runs_complement
    if isinstance(a, str):
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    return runs_complement(*a, n)


def _rp_empty(a) -> bool:
    return not isinstance(a, str) and not len(a[0])


def _expr_eval(e, i: int, n: int, zmin: dict, zmax: dict, chunk_col,
               str_chunk=None, valid_fn=None):
    """Evaluate a predicate tree against chunk ``i``: returns the
    ``_ALL`` sentinel or a canonical selection run-list of the rows
    where the tree is SQL-TRUE.  Leaves short-circuit on zone maps;
    ``and`` skips its right branch on an empty left, ``or`` on an ALL
    left.  String leaves need the ``str_chunk`` accessor
    ((spec, lens_payload, text_payload) per (col, i)); they prune via
    the lengths-stream prefilter inside
    :func:`tokrle.codecs.core.match_eq_str` instead of zone maps.

    Without ``valid_fn`` the chunk is assumed null-free (non-null-aware
    callers enforce that by raising in their accessors, which keeps
    two-valued evaluation sound).  With ``valid_fn``
    ((col, i) -> packed ``{col}__valid`` bytes, b'' when null-free) the
    tree evaluates under SQL THREE-VALUED LOGIC via
    :func:`_expr_eval3`: a WHERE clause keeps the root's TRUE set, so
    NULL comparisons never match and ``not`` never resurrects null
    rows — exactly ANSI/DuckDB semantics."""
    t, _ = _expr_eval3(e, i, n, zmin, zmax, chunk_col, str_chunk,
                       valid_fn)
    return t


def _expr_eval3(e, i: int, n: int, zmin: dict, zmax: dict, chunk_col,
                str_chunk=None, valid_fn=None):
    """Kleene (three-valued) predicate evaluation on the run
    representation: returns ``(TRUE, POSSIBLE)`` where TRUE is the
    run-list (or ``_ALL``) of rows where the tree is definitely true
    and POSSIBLE adds the rows where it is UNKNOWN (a NULL operand).
    ``POSSIBLE is None`` means POSSIBLE == TRUE — no nullable input
    reached this node, and the algebra degenerates to the two-valued
    single-run-list evaluation with zero extra work (the overwhelmingly
    common case).

    The connectives are pure run algebra (the reference's run-merge
    inner loop, ref pyrle/src/rle.pyx, as Kleene logic):
    ``and -> (T1 ∩ T2, P1 ∩ P2)``,
    ``or -> (T1 ∪ T2, P1 ∪ P2)``, ``not -> (¬P, ¬T)``.
    Value/string leaves on a nullable chunk match the null-filled
    payload, then ``T = match ∩ valid`` and ``P = T ∪ nulls``
    (a comparison against NULL is unknown).  ``is_null`` / ``not_null``
    leaves read the validity bitmap alone — payload-free, and
    two-valued: a null TEST is never unknown."""
    from tokrle.codecs.core import (match_contains_str, match_eq,
                                    match_eq_str, match_in,
                                    match_in_str, match_prefix_str,
                                    match_range, match_suffix_str,
                                    runs_complement, valid_to_runs)

    kind = e[0]
    if kind == "and":
        ta, pa_ = _expr_eval3(e[1], i, n, zmin, zmax, chunk_col,
                              str_chunk, valid_fn)
        if _rp_empty(ta) and (pa_ is None or _rp_empty(pa_)):
            return ta, None     # definitely-false left: skip the right
        tb, pb = _expr_eval3(e[2], i, n, zmin, zmax, chunk_col,
                             str_chunk, valid_fn)
        t = _rp_and(ta, tb)
        if pa_ is None and pb is None:
            return t, None
        return t, _rp_and(pa_ if pa_ is not None else ta,
                          pb if pb is not None else tb)
    if kind == "or":
        ta, pa_ = _expr_eval3(e[1], i, n, zmin, zmax, chunk_col,
                              str_chunk, valid_fn)
        if isinstance(ta, str):
            return _ALL, None   # definitely-true left: skip the right
        tb, pb = _expr_eval3(e[2], i, n, zmin, zmax, chunk_col,
                             str_chunk, valid_fn)
        t = _rp_or(ta, tb)
        if pa_ is None and pb is None:
            return t, None
        return t, _rp_or(pa_ if pa_ is not None else ta,
                         pb if pb is not None else tb)
    if kind == "not":
        ta, pa_ = _expr_eval3(e[1], i, n, zmin, zmax, chunk_col,
                              str_chunk, valid_fn)
        if pa_ is None:
            return _rp_not(ta, n), None
        return _rp_not(pa_, n), _rp_not(ta, n)
    col = e[1]
    if kind in _NULL_LEAVES:
        if valid_fn is None:
            raise ValueError(f"{kind} leaf reached an evaluator with "
                             "no validity accessor")
        vb = valid_fn(col, i)
        if kind == "not_null":
            return (_ALL if not vb else valid_to_runs(vb, n)), None
        if not vb:
            return (np.empty(0, np.int64), np.empty(0, np.int64)), None
        return runs_complement(*valid_to_runs(vb, n), n), None
    # value / string leaf: match the (null-filled) payload streams,
    # then wrap with the chunk's validity if it carries nulls
    if kind in _STR_LEAVES:
        if str_chunk is None:
            raise ValueError(f"{kind} leaf reached an evaluator with "
                             "no string-chunk accessor")
        spec, lp, tp = str_chunk(col, i)
        if kind == "eq_str":
            m = match_eq_str(spec, lp, tp, n, e[2])
        elif kind == "in_str":
            m = match_in_str(spec, lp, tp, n, e[2])
        elif kind == "suffix_str":
            m = match_suffix_str(spec, lp, tp, n, e[2])
        elif kind == "contains_str":
            m = match_contains_str(spec, lp, tp, n, e[2])
        else:
            m = match_prefix_str(spec, lp, tp, n, e[2])
    else:
        _, lo, hi = _expr_leaf_bounds(e)
        cmin, cmax = int(zmin[col][i]), int(zmax[col][i])
        # the zone map covers the null-FILLED values — a superset of
        # the real ones, so both shortcuts below stay sound on nullable
        # chunks (the validity wrap still intersects away null slots)
        if hi < cmin or lo > cmax:
            m = (np.empty(0, np.int64), np.empty(0, np.int64))
        elif kind == "in":
            # bound coverage does NOT imply set membership: the ALL
            # shortcut needs the set to contain EVERY value the chunk
            # can hold — only worth checking on narrow zone windows
            tgt = sorted({int(v) for v in e[2]})
            m = None
            if cmax - cmin < 1024 and len(tgt) > cmax - cmin:
                t = np.array(tgt, dtype=np.int64)
                window = t[(t >= cmin) & (t <= cmax)]
                if len(window) == cmax - cmin + 1:
                    m = _ALL   # the set covers the whole zone window
            if m is None:
                codec, payload, dt = chunk_col(col, i)
                m = match_in(codec, payload, n, dt, tgt)
        elif lo <= cmin and cmax <= hi:
            m = _ALL            # zone map proves the chunk matches
        else:
            codec, payload, dt = chunk_col(col, i)
            if kind == "eq":
                m = match_eq(codec, payload, n, dt, lo)
            else:
                m = match_range(codec, payload, n, dt, lo, hi)
    vb = valid_fn(col, i) if valid_fn is not None else b""
    if not vb:
        return m, None
    vr = valid_to_runs(vb, n)
    t = _rp_and(m, vr)          # null slots (filler-valued) never match
    return t, _rp_or(t, runs_complement(*vr, n))


def encoded_boolean_agg(enc_dir: str, expr: tuple, agg_cols: list[str],
                        with_minmax: bool = False):
    """COUNT/SUM under an arbitrary boolean predicate TREE, evaluated
    entirely on the run representation: leaves are ``("eq", col, v)`` /
    ``("range", col, lo, hi)`` selection run-lists from the codec
    streams, and the connectives ``("and", a, b)`` / ``("or", a, b)`` /
    ``("not", a)`` are :func:`runs_intersect` / :func:`runs_union` /
    :func:`runs_complement` — the reference's run-merge inner loop
    (ref pyrle/src/rle.pyx) as a complete boolean algebra; nothing ever
    expands to n elements.

    Per chunk, leaves short-circuit on zone maps (whole-chunk ALL-match
    or MISS answered metadata-only), ``and`` skips its right branch on
    an empty left, ``or`` on an ALL left.  A conservative zone-map scan
    filter is pushed into the Parquet read: the and/or tree maps to the
    and/or of the leaves' overlap tests, while any ``not`` branch is
    unprunable (the complement of a zone test is not sound) and reads
    everything.  One partial row per batch on the exchange; integer
    columns only; nullable chunks raise.

    ``with_minmax=True`` adds exact per-column MIN/MAX of the selected
    rows: ALL-match chunks answer from the aggregate column's own zone
    map (zero decode), run-list chunks late-materialize only the
    selected positions (:func:`gather_runs`).  ``min_<c>``/``max_<c>``
    are ``None`` when nothing matches (SQL ``min()`` over an empty set
    is NULL).

    NULLABLE columns are fully supported on both sides of the
    aggregate.  Predicate columns evaluate under SQL three-valued
    logic (:func:`_expr_eval3` — NULL comparisons never match, ``not``
    never resurrects them, and ``is_null``/``not_null`` leaves answer
    payload-free from the validity bitmap).  Aggregate columns skip
    null slots exactly like SQL: SUM stays exact because the encoder's
    null filler is 0, MIN/MAX gather only valid selected positions,
    and both return NULL when NO selected row holds a valid value
    (``n_valid_<c>`` carries that count; SUM over an all-null
    selection is emitted as 0 — pair it with ``coalesce`` in an
    oracle)."""
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Max, Min, Sum

    from tokrle.codecs.core import (agg_sum, agg_sum_runs, gather_runs,
                                    runs_intersect, valid_to_runs)

    pred_cols = _expr_pred_cols(expr)
    str_cols = _expr_str_cols(expr)
    null_cols = _expr_null_cols(expr)
    n_total = _n_chunks(enc_dir)
    need = ["n_rows"] + [f"{c}__{p}" for c in pred_cols
                         for p in ("vmin", "vmax")] + [
        f"{c}__{p}"
        for c in dict.fromkeys(pred_cols + list(agg_cols))
        for p in ("codec", "payload", "dtype", "valid")] + [
        f"{c}__{p}" for c in str_cols
        for p in ("codec", "payload", "lens_payload", "valid")]
    need += [f"{c}__valid" for c in null_cols
             if f"{c}__valid" not in need]
    if with_minmax:
        need += [f"{c}__{p}" for c in agg_cols
                 for p in ("vmin", "vmax")
                 if f"{c}__{p}" not in need]

    def _chunk_col(batch, c, i):
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    def _valid(batch, c, i) -> bytes:
        return batch.column(f"{c}__valid")[i].as_py() or b""

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        zmin = {c: batch.column(f"{c}__vmin").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        zmax = {c: batch.column(f"{c}__vmax").to_numpy(
            zero_copy_only=False) for c in pred_cols}

        n_match, all_hit, run_chunks = 0, 0, 0
        sums = {c: 0 for c in agg_cols}
        nvalid = {c: 0 for c in agg_cols}
        imax = np.iinfo(np.int64).max
        mins = {c: imax for c in agg_cols}
        maxs = {c: -imax - 1 for c in agg_cols}
        for i in range(len(batch)):
            n = int(nrows[i])
            if n == 0:
                # an empty chunk's zone map is the (0, 0) placeholder —
                # folding it into MIN/MAX would inject a bogus 0
                continue
            sel = _expr_eval(expr, i, n, zmin, zmax,
                             lambda col, j: _chunk_col(batch, col, j),
                             lambda col, j: _chunk_str_col(batch, col, j),
                             lambda col, j: _valid(batch, col, j))
            if isinstance(sel, str):
                all_hit += 1
                n_match += n
                for c in agg_cols:
                    codec, payload, dt = _chunk_col(batch, c, i)
                    vb = _valid(batch, c, i)
                    # the encoder fills null slots with 0, so the
                    # whole-payload sum equals SQL's null-skipping SUM
                    sums[c] += agg_sum(codec, payload, n, dt)
                    if not vb:
                        nvalid[c] += n
                        if with_minmax:
                            # whole chunk selected: its zone map IS
                            # the exact extrema — nothing decodes
                            mins[c] = min(mins[c], int(
                                batch.column(f"{c}__vmin")[i].as_py()))
                            maxs[c] = max(maxs[c], int(
                                batch.column(f"{c}__vmax")[i].as_py()))
                        continue
                    vr = valid_to_runs(vb, n)
                    nv = int(vr[1].sum())
                    nvalid[c] += nv
                    if with_minmax and nv:
                        # nullable chunk: the zone map covers the 0
                        # filler — gather only the valid positions
                        v = gather_runs(codec, payload, n, dt, *vr)
                        mins[c] = min(mins[c], int(v.min()))
                        maxs[c] = max(maxs[c], int(v.max()))
                continue
            if not len(sel[0]):
                continue
            run_chunks += 1
            n_match += int(sel[1].sum())
            for c in agg_cols:
                codec, payload, dt = _chunk_col(batch, c, i)
                vb = _valid(batch, c, i)
                # restrict to VALID selected positions on nullable
                # chunks — null slots neither count nor aggregate
                sv = sel if not vb else \
                    runs_intersect(*sel, *valid_to_runs(vb, n))
                nv = int(sv[1].sum())
                nvalid[c] += nv
                if not nv:
                    continue
                if with_minmax:
                    # min/max need the gathered values anyway — reuse
                    # them for the sum instead of a second decode
                    v = gather_runs(codec, payload, n, dt, *sv)
                    sums[c] += int(v.sum(dtype=np.int64))
                    mins[c] = min(mins[c], int(v.min()))
                    maxs[c] = max(maxs[c], int(v.max()))
                else:
                    sums[c] += agg_sum_runs(codec, payload, n, dt, *sv)
        out = {"n_match": pa.array([n_match], type=pa.int64()),
               "chunks": pa.array([len(batch)], type=pa.int64()),
               "all_hit": pa.array([all_hit], type=pa.int64()),
               "run_chunks": pa.array([run_chunks], type=pa.int64())}
        for c in agg_cols:
            out[f"sum_{c}"] = pa.array([sums[c]], type=pa.int64())
            out[f"nvalid_{c}"] = pa.array([nvalid[c]], type=pa.int64())
            if with_minmax:
                # sentinel extrema (no matches in this batch) fold
                # away in the cross-batch Min/Max
                out[f"min_{c}"] = pa.array([mins[c]], type=pa.int64())
                out[f"max_{c}"] = pa.array([maxs[c]], type=pa.int64())
        return pa.table(out)

    flt = _expr_zone_filter(expr)
    ds = ray.data.read_parquet(enc_dir, columns=need, filter=flt)
    aggs = [Sum("n_match", alias_name="n_match"),
            Sum("chunks", alias_name="chunks"),
            Sum("all_hit", alias_name="all_hit"),
            Sum("run_chunks", alias_name="run_chunks")] + \
        [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in agg_cols] + \
        [Sum(f"nvalid_{c}", alias_name=f"nvalid_{c}") for c in agg_cols]
    if with_minmax:
        aggs += [Min(f"min_{c}", alias_name=f"min_{c}")
                 for c in agg_cols] + \
            [Max(f"max_{c}", alias_name=f"max_{c}") for c in agg_cols]
    row = ds.map_batches(partial, batch_format="pyarrow").aggregate(*aggs)
    scanned = int(row["chunks"] or 0)
    counters = {"chunks_total": n_total,
                "chunks_scanned": scanned,
                "chunks_skipped": n_total - scanned,
                "all_hit_chunks": int(row["all_hit"] or 0),
                "run_chunks": int(row["run_chunks"] or 0)}
    matched = int(row["n_match"] or 0)
    data = {"n_match": [matched]}
    for c in agg_cols:
        nv = int(row[f"nvalid_{c}"] or 0)
        data[f"sum_{c}"] = [int(row[f"sum_{c}"] or 0)]
        # valid-value count per aggregate column (== SQL COUNT(col));
        # rides in counters so the DataFrame schema stays stable for
        # null-free callers
        counters[f"nvalid_{c}"] = nv
        if with_minmax:
            # SQL MIN/MAX over zero VALID values is NULL, even when
            # null-valued rows were selected
            data[f"min_{c}"] = [int(row[f"min_{c}"]) if nv else None]
            data[f"max_{c}"] = [int(row[f"max_{c}"]) if nv else None]
    return pd.DataFrame(data), counters


def encoded_filtered_group_agg(enc_dir: str, group_col: str, expr: tuple,
                               agg_cols: list[str]):
    """``SELECT group_col, count(*), sum(agg_cols...) WHERE <predicate
    tree> GROUP BY group_col`` over a table-encode directory — the
    grouped sibling of :func:`encoded_boolean_agg`.  The predicate
    evaluates per chunk to the ``_ALL`` sentinel or a selection
    run-list (zone-map short-circuits included, conservative zone scan
    filter pushed into the Parquet read), then the grouping splits on
    the GROUP column's zone map:

    - GROUP-PURE chunks (``vmin == vmax`` — the common case when the
      table is clustered on the group key): the group id comes from the
      zone map, the count from the selection alone, and each SUM from
      :func:`agg_sum` (ALL) / :func:`agg_sum_runs` (run-list) — the
      group column never decodes and the agg columns never expand;
    - MIXED chunks materialize the group/agg columns ONLY at the
      selected positions (:func:`gather_runs` late materialization)
      and fold with one argsort + ``add.reduceat`` over the selected
      subset, never the full chunk.

    The exchange carries (group, count, partial sums) rows plus one
    fixed-size counter row per batch — never table rows.  Returns
    ``(DataFrame, counters)`` with int64 ``group_col``/``n``/
    ``sum_<c>`` columns sorted by group; integer columns only;
    nullable chunks raise."""
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    from tokrle.codecs.core import (agg_sum, agg_sum_runs,
                                    decode as codec_decode, gather_runs)

    pred_cols = _expr_pred_cols(expr)
    str_cols = _expr_str_cols(expr)
    n_total = _n_chunks(enc_dir)
    need = ["n_rows"] + [
        f"{c}__{p}"
        for c in dict.fromkeys([group_col] + pred_cols)
        for p in ("vmin", "vmax")] + [
        f"{c}__{p}"
        for c in dict.fromkeys([group_col] + pred_cols + list(agg_cols))
        for p in ("codec", "payload", "dtype", "valid")] + [
        f"{c}__{p}" for c in str_cols
        for p in ("codec", "payload", "lens_payload", "valid")]

    def _chunk_col(batch, c, i):
        if len(batch.column(f"{c}__valid")[i].as_py() or b""):
            raise ValueError(
                f"column {c!r}: nullable chunks not supported by the "
                "compressed-domain grouped aggregate")
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    sum_names = [f"sum_{c}" for c in agg_cols]
    ctr_names = ["c_scanned", "c_all", "c_run", "c_pure"]

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        zcols = dict.fromkeys([group_col] + pred_cols)
        zmin = {c: batch.column(f"{c}__vmin").to_numpy(
            zero_copy_only=False) for c in zcols}
        zmax = {c: batch.column(f"{c}__vmax").to_numpy(
            zero_copy_only=False) for c in zcols}

        grp_parts, n_parts = [], []
        sum_parts = {c: [] for c in agg_cols}
        n_all, n_run, n_pure = 0, 0, 0
        for i in range(len(batch)):
            n = int(nrows[i])
            sel = _expr_eval(expr, i, n, zmin, zmax,
                             lambda col, j: _chunk_col(batch, col, j),
                             lambda col, j: _chunk_str_col(batch, col, j))
            is_all = isinstance(sel, str)
            if not is_all and not len(sel[0]):
                continue
            n_all += is_all
            n_run += not is_all
            gmin, gmax = int(zmin[group_col][i]), int(zmax[group_col][i])
            if gmin == gmax:
                # group-pure: zone map names the group; nothing decodes
                n_pure += 1
                grp_parts.append(np.array([gmin], np.int64))
                n_sel = n if is_all else int(sel[1].sum())
                n_parts.append(np.array([n_sel], np.int64))
                for c in agg_cols:
                    codec, payload, dt = _chunk_col(batch, c, i)
                    s = agg_sum(codec, payload, n, dt) if is_all else \
                        agg_sum_runs(codec, payload, n, dt, *sel)
                    sum_parts[c].append(np.array([s], np.int64))
                continue
            # mixed chunk: late-materialize group + agg values at the
            # selected positions only, then one sorted fold
            gc, gp, gdt = _chunk_col(batch, group_col, i)
            g = (codec_decode(gc, gp, n, gdt) if is_all else
                 gather_runs(gc, gp, n, gdt, *sel)).astype(np.int64)
            order = np.argsort(g, kind="mergesort")
            gs = g[order]
            starts = np.flatnonzero(
                np.concatenate(([True], gs[1:] != gs[:-1])))
            grp_parts.append(gs[starts])
            n_parts.append(np.diff(np.concatenate((starts, [len(gs)]))))
            for c in agg_cols:
                codec, payload, dt = _chunk_col(batch, c, i)
                v = (codec_decode(codec, payload, n, dt) if is_all else
                     gather_runs(codec, payload, n, dt, *sel)) \
                    .astype(np.int64)[order]
                sum_parts[c].append(np.add.reduceat(v, starts)
                                    if len(starts)
                                    else np.empty(0, np.int64))
        grp = np.concatenate(grp_parts) if grp_parts else \
            np.empty(0, np.int64)
        k = len(grp)
        out = {"kind": np.zeros(k + 1, np.int64),
               "grp": np.concatenate((grp, [0])).astype(np.int64),
               "n": np.concatenate(
                   (np.concatenate(n_parts) if n_parts
                    else np.empty(0, np.int64), [0])).astype(np.int64)}
        for c in agg_cols:
            out[f"sum_{c}"] = np.concatenate(
                (np.concatenate(sum_parts[c]) if sum_parts[c]
                 else np.empty(0, np.int64), [0])).astype(np.int64)
        # one counter row per batch (kind=1, grp=0): chunk accounting
        # rides the same exchange without a second read job
        out["kind"][k] = 1
        for nm, val in zip(ctr_names,
                           (len(batch), n_all, n_run, n_pure)):
            col = np.zeros(k + 1, np.int64)
            col[k] = val
            out[nm] = col
        return pa.table({nm: pa.array(v, type=pa.int64())
                         for nm, v in out.items()})

    flt = _expr_zone_filter(expr)
    ds = ray.data.read_parquet(enc_dir, columns=need, filter=flt)
    aggs = [Sum("n", alias_name="n")] + \
        [Sum(nm, alias_name=nm) for nm in sum_names] + \
        [Sum(nm, alias_name=nm) for nm in ctr_names]
    df = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["kind", "grp"]).aggregate(*aggs).to_pandas()
    if df.empty:  # zone filter pruned every chunk: no partials at all
        empty = pd.DataFrame({group_col: pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64"),
                              **{nm: pd.Series([], dtype="int64")
                                 for nm in sum_names}})
        return empty, {"chunks_total": n_total, "chunks_scanned": 0,
                       "chunks_skipped": n_total, "all_hit_chunks": 0,
                       "run_chunks": 0, "pure_group_chunks": 0}
    ctr = df[df["kind"] == 1]
    scanned = int(ctr["c_scanned"].sum())
    counters = {"chunks_total": n_total,
                "chunks_scanned": scanned,
                "chunks_skipped": n_total - scanned,
                "all_hit_chunks": int(ctr["c_all"].sum()),
                "run_chunks": int(ctr["c_run"].sum()),
                "pure_group_chunks": int(ctr["c_pure"].sum())}
    df = df[(df["kind"] == 0) & (df["n"] > 0)] \
        .drop(columns=["kind"] + ctr_names) \
        .rename(columns={"grp": group_col}) \
        .sort_values(group_col).reset_index(drop=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df, counters


def _footer_fields(enc_dir: str) -> tuple[set, str | None]:
    """``(field names, first file path)`` of a table-encode directory's
    footer schema (first file only — the layout is uniform by
    construction).  Used to classify columns (a ``__lens_payload``
    field marks a string/list column) without reading any data; the
    path supports follow-up single-row probes (dtypes)."""
    import glob
    import os

    import pyarrow.parquet as _pq

    files = sorted(glob.glob(os.path.join(enc_dir, "**", "*.parquet"),
                             recursive=True))
    if not files:
        return set(), None
    return set(_pq.ParquetFile(files[0]).schema_arrow.names), files[0]


def encoded_str_distinct(enc_dir: str, col: str,
                         expr: tuple | None = None):
    """Exact DISTINCT over a STRING column of a table-encode directory
    — the string sibling of :func:`encoded_distinct_count`.  ``sdict``
    chunks the predicate matches WHOLLY (or with no predicate) answer
    from the dictionary HEADER alone (the distinct set rides ahead of
    the code stream and contains exactly the present values — the code
    stream never decodes); predicate-selected sdict chunks gather only
    the selected CODES and dedup those (codes -> values via one
    dictionary take); plain ``str`` chunks decode and dedup locally.
    The exchange carries per-chunk distinct value sets
    (cardinality-bounded), never rows.  Null slots are excluded (SQL
    ``COUNT(DISTINCT col)`` ignores NULLs); chunks that are BOTH
    nullable and under a predicate raise (ambiguous NULL/selection
    interaction is not supported).  Returns
    ``(DataFrame(n_distinct), counters)``."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count, Sum

    from tokrle.codecs.core import (_mask_to_runs, _sdict_distinct_array,
                                    gather_str_runs, sdict_unpack)

    pred_cols = _expr_pred_cols(expr) if expr is not None else []
    str_cols = _expr_str_cols(expr) if expr is not None else []
    need = ["n_rows"] + [f"{c}__{p}" for c in pred_cols
                         for p in ("vmin", "vmax")] + [
        f"{c}__{p}" for c in pred_cols
        for p in ("codec", "payload", "dtype", "valid")] + [
        f"{c}__{p}"
        for c in dict.fromkeys(str_cols + [col])
        for p in ("codec", "payload", "lens_payload", "valid")]
    need = list(dict.fromkeys(need))
    n_total = _n_chunks(enc_dir)

    def _chunk_col(batch, c, i):
        if len(batch.column(f"{c}__valid")[i].as_py() or b""):
            raise ValueError(
                f"column {c!r}: nullable chunks not supported by the "
                "compressed-domain string distinct's predicates")
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        codecs = batch.column(f"{col}__codec").to_pylist()
        zmin = {c: batch.column(f"{c}__vmin").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        zmax = {c: batch.column(f"{c}__vmax").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        out_vals: list = []
        header_only, decoded_chunks = 0, 0
        for i, spec in enumerate(codecs):
            n = int(nrows[i])
            if n == 0:
                continue
            if not spec.startswith(("str:", "sdict:")):
                raise TypeError(
                    f"column {col!r}: not a string column ({spec})")
            vb = batch.column(f"{col}__valid")[i].as_py() or b""
            lp = memoryview(
                batch.column(f"{col}__lens_payload")[i].as_buffer())
            tp = memoryview(
                batch.column(f"{col}__payload")[i].as_buffer())
            if expr is None:
                sel = _ALL
            else:
                if vb:
                    raise ValueError(
                        f"column {col!r}: nullable chunks under a "
                        "predicate not supported by string distinct")
                sel = _expr_eval(
                    expr, i, n, zmin, zmax,
                    lambda c2, j: _chunk_col(batch, c2, j),
                    lambda c2, j: _chunk_str_col(batch, c2, j))
                if not isinstance(sel, str) and not len(sel[0]):
                    continue
            is_all = isinstance(sel, str)
            if spec.startswith("sdict:") and not vb and is_all:
                # header-only: the dictionary IS the present-value set
                # (dictionary_encode emits exactly the values that
                # occur) — the code stream never decodes
                _, _, dlens, dbytes = sdict_unpack(spec, tp)
                out_vals.append(_sdict_distinct_array(dlens, dbytes))
                header_only += 1
                continue
            if is_all:
                if vb:  # nulls excluded: COUNT(DISTINCT) skips NULL
                    valid = np.unpackbits(
                        np.frombuffer(vb, dtype=np.uint8), count=n,
                        bitorder="little").astype(bool)
                    runs = _mask_to_runs(valid)
                else:
                    runs = (np.zeros(1, np.int64),
                            np.full(1, n, np.int64))
            else:
                runs = sel
            decoded_chunks += 1
            arr = gather_str_runs(spec, lp, tp, n, *runs)
            out_vals.append(pc.unique(arr))
        u = pc.unique(pa.concat_arrays(out_vals)) if out_vals else \
            pa.array([], type=pa.large_utf8())
        hdr = np.zeros(max(len(u), 1), np.int64)
        hdr[0] = header_only
        dec = np.zeros(max(len(u), 1), np.int64)
        dec[0] = decoded_chunks
        # the counters ride the value exchange (first slot; a sentinel
        # row carries them when the batch yielded no values)
        vals = u if len(u) else pa.array([""], type=pa.large_utf8())
        kind = np.zeros(max(len(u), 1), np.int64)
        if not len(u):
            kind[0] = 1
        return pa.table({"v": vals,
                         "kind": pa.array(kind),
                         "hdr": pa.array(hdr),
                         "dec": pa.array(dec)})

    flt = _expr_zone_filter(expr) if expr is not None else None
    ds = ray.data.read_parquet(enc_dir, columns=need, filter=flt)
    flat = ds.map_batches(partial, batch_format="pyarrow")
    agg = flat.groupby(["kind", "v"]).aggregate(
        Count(alias_name="_c"),
        Sum("hdr", alias_name="hdr"),
        Sum("dec", alias_name="dec")).to_pandas()
    if agg.empty:   # zone filter pruned every chunk
        return (pd.DataFrame({"n_distinct": [0]}),
                {"chunks_total": n_total, "chunks_header_only": 0,
                 "chunks_decoded": 0})
    real = agg[agg["kind"] == 0]
    counters = {"chunks_total": n_total,
                "chunks_header_only": int(agg["hdr"].sum()),
                "chunks_decoded": int(agg["dec"].sum())}
    return (pd.DataFrame({"n_distinct": [int(len(real))]}),
            counters)


def encoded_str_quantiles(enc_dir: str, col: str,
                          qs: tuple = ((1, 4), (1, 2), (3, 4))):
    """Exact discrete quantiles of a STRING column (binary-collation
    order, SQL ``quantile_disc`` semantics) from the encoded layout:
    ``sdict`` chunks histogram their integer CODE stream
    (:func:`tokrle.codecs.core.value_counts` closed forms — the text
    never decodes beyond the dictionary header) and map codes to the
    distinct set; plain ``str`` chunks decode once and fold with Arrow
    ``value_counts``.  The exchange carries (string value, count)
    pairs bounded by chunk cardinality, never rows; the driver sorts
    the folded histogram in UTF-8 byte order (== code-point order, so
    Python/pandas sorting matches DuckDB's binary collation) and picks
    ranks with the shared integer ceil-division.  Null slots are
    skipped like SQL; the returned ``n_rows`` counts non-null values.
    Returns ``(DataFrame(q_num, q_den, quantile, n_rows), counters)``
    with ``quantile`` None when every value is NULL."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from tokrle.codecs.core import (_mask_to_runs, _sdict_distinct_array,
                                    gather_str_runs, sdict_unpack,
                                    value_counts)

    need = ["n_rows"] + [f"{col}__{p}"
                         for p in ("codec", "payload", "lens_payload",
                                   "valid")]
    n_total = _n_chunks(enc_dir)

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        codecs = batch.column(f"{col}__codec").to_pylist()
        vs, cs = [], []
        code_only = decoded_chunks = 0
        for i, spec in enumerate(codecs):
            n = int(nrows[i])
            if n == 0:
                continue
            if not spec.startswith(("str:", "sdict:")):
                raise TypeError(
                    f"column {col!r}: not a string column ({spec})")
            vb = batch.column(f"{col}__valid")[i].as_py() or b""
            lp = memoryview(
                batch.column(f"{col}__lens_payload")[i].as_buffer())
            tp = memoryview(
                batch.column(f"{col}__payload")[i].as_buffer())
            if spec.startswith("sdict:") and not vb:
                # closed form: histogram the integer code stream, then
                # one dictionary take — zero text gather
                ccodec, codes_p, dlens, dbytes = sdict_unpack(spec, tp)
                u, c = value_counts(ccodec, codes_p, n, np.int64)
                dist = _sdict_distinct_array(dlens, dbytes)
                vs.append(dist.take(pa.array(u)))
                cs.append(c.astype(np.int64))
                code_only += 1
                continue
            if vb:  # SQL quantiles skip NULLs
                valid = np.unpackbits(
                    np.frombuffer(vb, dtype=np.uint8), count=n,
                    bitorder="little").astype(bool)
                runs = _mask_to_runs(valid)
                if not len(runs[0]):
                    continue
            else:
                runs = (np.zeros(1, np.int64), np.full(1, n, np.int64))
            decoded_chunks += 1
            arr = gather_str_runs(spec, lp, tp, n, *runs)
            vc = pc.value_counts(arr)
            vs.append(vc.field("values"))
            cs.append(vc.field("counts").to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        if vs:
            v_all = pa.concat_arrays([v.cast(pa.large_utf8())
                                      for v in vs])
            c_all = np.concatenate(cs)
        else:
            v_all = pa.array([], type=pa.large_utf8())
            c_all = np.empty(0, np.int64)
        # counter rows ride the exchange under kind=1/2 (value column
        # unused there); one streaming pass carries data + meters
        return pa.table({
            "kind": pa.array(np.concatenate(
                (np.zeros(len(v_all), np.int64), [1, 2])),
                type=pa.int64()),
            "v": pa.concat_arrays(
                [v_all, pa.array(["", ""], type=pa.large_utf8())]),
            "c": pa.array(np.concatenate(
                (c_all, [code_only, decoded_chunks])), type=pa.int64())})

    part = ray.data.read_parquet(enc_dir, columns=need) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    if part.empty:
        # zero-row table / all-empty chunks: the UDF never ran
        part = pd.DataFrame({"kind": pd.Series(dtype="int64"),
                             "v": pd.Series(dtype="object"),
                             "c": pd.Series(dtype="int64")})
    meters = part[part["kind"] > 0].groupby("kind")["c"].sum()
    hist = part[part["kind"] == 0].groupby("v", sort=True)["c"].sum()
    # pandas sorts str by code point == UTF-8 byte order (binary
    # collation), so the rank lookup below matches DuckDB
    values = hist.index.to_numpy()
    cum = np.cumsum(hist.to_numpy())
    n = int(cum[-1]) if len(cum) else 0
    rows = [{"q_num": q_num, "q_den": q_den,
             "quantile": None if n == 0 else str(
                 values[_hist_rank_idx(cum, n, q_num, q_den)]),
             "n_rows": n}
            for q_num, q_den in qs]
    counters = {"chunks_total": n_total,
                "chunks_code_only": int(meters.get(1, 0)),
                "chunks_decoded": int(meters.get(2, 0)),
                "hist_rows": int(len(hist))}
    return pd.DataFrame(rows), counters


def encoded_str_minmax(enc_dir: str, col: str):
    """``SELECT min(col), max(col)`` over a STRING column — answered
    from the string ZONE MAPS alone (``__smin``/``__smax``, recorded at
    encode time): the scan reads two short string fields per chunk and
    folds; payloads never leave storage.  NOTE: chunks whose validity
    bitmap is non-empty fall back to a decode of that chunk (null
    slots canonicalize to ``''`` at encode, which would corrupt the
    metadata min — SQL min/max skip NULLs).  Returns
    ``(DataFrame(min_<col>, max_<col>), counters)``."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from tokrle.codecs.core import _mask_to_runs, gather_str_runs

    n_total = _n_chunks(enc_dir)
    nullable = pc.binary_length(pc.field(f"{col}__valid")) > 0

    def meta_fold(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        keep = nrows > 0
        smin = pa.array(batch.column(f"{col}__smin").to_pandas()[keep])
        smax = pa.array(batch.column(f"{col}__smax").to_pandas()[keep])
        has = len(smin) > 0
        return pa.table({
            "mn": pa.array(
                [pc.min_max(smin)["min"].as_py() if has else ""],
                type=pa.large_utf8()),
            "mx": pa.array(
                [pc.min_max(smax)["max"].as_py() if has else ""],
                type=pa.large_utf8()),
            "has": pa.array([int(has)], type=pa.int64()),
            "meta": pa.array([int(keep.sum())], type=pa.int64()),
            "dec": pa.array([0], type=pa.int64())})

    def decode_fold(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        mn, mx, decoded = None, None, 0
        for i in range(len(batch)):
            n = int(nrows[i])
            if n == 0:
                continue
            vb = batch.column(f"{col}__valid")[i].as_py() or b""
            valid = np.unpackbits(
                np.frombuffer(vb, dtype=np.uint8), count=n,
                bitorder="little").astype(bool)
            if not valid.any():   # all-NULL chunk contributes nothing
                continue
            decoded += 1
            spec = batch.column(f"{col}__codec")[i].as_py()
            lp = memoryview(
                batch.column(f"{col}__lens_payload")[i].as_buffer())
            tp = memoryview(
                batch.column(f"{col}__payload")[i].as_buffer())
            arr = gather_str_runs(spec, lp, tp, n,
                                  *_mask_to_runs(valid))
            mm = pc.min_max(arr)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            mn = lo if mn is None or lo < mn else mn
            mx = hi if mx is None or hi > mx else mx
        has = mn is not None
        return pa.table({
            "mn": pa.array([mn if has else ""], type=pa.large_utf8()),
            "mx": pa.array([mx if has else ""], type=pa.large_utf8()),
            "has": pa.array([int(has)], type=pa.int64()),
            "meta": pa.array([0], type=pa.int64()),
            "dec": pa.array([decoded], type=pa.int64())})

    # metadata pass: two short string fields per NON-NULL chunk —
    # payloads never leave storage
    meta_ds = ray.data.read_parquet(
        enc_dir, columns=["n_rows", f"{col}__smin", f"{col}__smax"],
        filter=~nullable).map_batches(meta_fold, batch_format="pyarrow")
    # nullable chunks (rare) decode their valid rows only
    dec_ds = ray.data.read_parquet(
        enc_dir, columns=["n_rows", f"{col}__codec", f"{col}__payload",
                          f"{col}__lens_payload", f"{col}__valid"],
        filter=nullable).map_batches(decode_fold, batch_format="pyarrow")
    df = meta_ds.union(dec_ds).to_pandas()
    real = df[df["has"] > 0]
    counters = {"chunks_total": n_total,
                "chunks_metadata_only": int(df["meta"].sum()),
                "chunks_decoded": int(df["dec"].sum())}
    if real.empty:
        return (pd.DataFrame({f"min_{col}": [None],
                              f"max_{col}": [None]}), counters)
    return (pd.DataFrame({f"min_{col}": [str(real["mn"].min())],
                          f"max_{col}": [str(real["mx"].max())]}),
            counters)


def encoded_group_by_str(enc_dir: str, group_col,
                         agg_cols: list[str], expr: tuple | None = None):
    """``SELECT group_col(s), count(*), sum(agg_cols...) [WHERE
    <predicate tree>] GROUP BY group_col(s)`` where the GROUP
    column(s) are STRINGS — the string sibling of
    :func:`encoded_filtered_group_agg`.  ``group_col`` may be one
    column name or a LIST (composite grouping, e.g. (lang, source)),
    and list entries may MIX string and integer columns (a footer
    schema probe classifies them; integer keys gather through
    gather_runs and ride the exchange as int64).
    The predicate (integer and/or string leaves) evaluates to a
    selection run-list per chunk; each group column late-materializes
    ONLY the selected rows (:func:`tokrle.codecs.core.gather_str_runs`
    — one lengths decode + one vectorized byte gather, or a dictionary
    take on sdict chunks), integer agg columns gather the same
    positions, and each batch folds to (group tuple, count, partial
    sums) rows before the exchange — the exchange carries per-batch
    distinct group tuples, never table rows.  Returns ``(DataFrame,
    counters)`` sorted by the group columns; nullable chunks raise."""
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    from tokrle.codecs.core import (decode as codec_decode,
                                    gather_runs, gather_str_runs)

    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    gnames = [f"g{j}" for j in range(len(gcols))]
    # footer-schema probe: group columns may mix strings and integers
    fields, _ = _footer_fields(enc_dir)
    g_str = {g for g in gcols if f"{g}__lens_payload" in fields}
    g_int = [g for g in gcols if g not in g_str]
    pred_cols = _expr_pred_cols(expr) if expr is not None else []
    str_cols = _expr_str_cols(expr) if expr is not None else []
    n_total = _n_chunks(enc_dir)
    need = ["n_rows"] + [f"{c}__{p}" for c in pred_cols
                         for p in ("vmin", "vmax")] + [
        f"{c}__{p}"
        for c in dict.fromkeys(pred_cols + list(agg_cols) + g_int)
        for p in ("codec", "payload", "dtype", "valid")] + [
        f"{c}__{p}"
        for c in dict.fromkeys(str_cols + sorted(g_str))
        for p in ("codec", "payload", "lens_payload", "valid")]
    need = list(dict.fromkeys(need))

    def _chunk_col(batch, c, i):
        if len(batch.column(f"{c}__valid")[i].as_py() or b""):
            raise ValueError(
                f"column {c!r}: nullable chunks not supported by the "
                "compressed-domain string grouping")
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    sum_names = [f"sum_{c}" for c in agg_cols]
    ctr_names = ["c_scanned", "c_all", "c_run"]

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        zmin = {c: batch.column(f"{c}__vmin").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        zmax = {c: batch.column(f"{c}__vmax").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        grp_parts: dict = {g: [] for g in gcols}
        val_parts = {c: [] for c in agg_cols}
        n_all, n_run = 0, 0
        for i in range(len(batch)):
            n = int(nrows[i])
            if n == 0:
                continue
            if expr is None:
                sel = _ALL
            else:
                sel = _expr_eval(
                    expr, i, n, zmin, zmax,
                    lambda col, j: _chunk_col(batch, col, j),
                    lambda col, j: _chunk_str_col(batch, col, j))
            is_all = isinstance(sel, str)
            if not is_all and not len(sel[0]):
                continue
            n_all += is_all
            n_run += not is_all
            runs = (np.zeros(1, np.int64),
                    np.full(1, n, np.int64)) if is_all else sel
            for g in gcols:
                if g in g_str:
                    spec, lp, tp = _chunk_str_col(batch, g, i)
                    grp_parts[g].append(
                        gather_str_runs(spec, lp, tp, n, *runs))
                else:
                    codec, payload, dt = _chunk_col(batch, g, i)
                    grp_parts[g].append(
                        (codec_decode(codec, payload, n, dt) if is_all
                         else gather_runs(codec, payload, n, dt,
                                          *runs)).astype(np.int64))
            for c in agg_cols:
                codec, payload, dt = _chunk_col(batch, c, i)
                v = (codec_decode(codec, payload, n, dt) if is_all
                     else gather_runs(codec, payload, n, dt, *runs))
                val_parts[c].append(v.astype(np.int64))
        if grp_parts[gcols[0]]:
            fold = pd.DataFrame(
                {nm: (pa.concat_arrays(grp_parts[g]).to_pandas()
                      if g in g_str else np.concatenate(grp_parts[g]))
                 for nm, g in zip(gnames, gcols)})
            for c in agg_cols:
                fold[c] = np.concatenate(val_parts[c])
            agg = fold.groupby(gnames, sort=False).agg(
                n=(gnames[0], "size"),
                **{f"sum_{c}": (c, "sum") for c in agg_cols}) \
                .reset_index()
        else:
            agg = pd.DataFrame({**{nm: pd.Series(
                                       [], dtype=(object if g in g_str
                                                  else "int64"))
                                   for nm, g in zip(gnames, gcols)},
                                "n": pd.Series([], dtype="int64"),
                                **{nm: pd.Series([], dtype="int64")
                                   for nm in sum_names}})
        k = len(agg)
        out = {"kind": pa.array(np.r_[np.zeros(k, np.int64), [1]])}
        for nm, g in zip(gnames, gcols):
            if g in g_str:
                out[nm] = pa.array(list(agg[nm]) + [""],
                                   type=pa.large_utf8())
            else:
                out[nm] = pa.array(np.r_[
                    agg[nm].to_numpy(np.int64), [0]])
        out["n"] = pa.array(np.r_[agg["n"].to_numpy(np.int64), [0]])
        for nm in sum_names:
            out[nm] = pa.array(np.r_[agg[nm].to_numpy(np.int64), [0]])
        for nm, val in zip(ctr_names, (len(batch), n_all, n_run)):
            col = np.zeros(k + 1, np.int64)
            col[k] = val
            out[nm] = pa.array(col)
        return pa.table(out)

    flt = _expr_zone_filter(expr) if expr is not None else None
    ds = ray.data.read_parquet(enc_dir, columns=need, filter=flt)
    aggs = [Sum("n", alias_name="n")] + \
        [Sum(nm, alias_name=nm) for nm in sum_names] + \
        [Sum(nm, alias_name=nm) for nm in ctr_names]
    df = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["kind"] + gnames).aggregate(*aggs).to_pandas()
    if df.empty:
        empty = pd.DataFrame({**{g: pd.Series([], dtype=object)
                                 for g in gcols},
                              "n": pd.Series([], dtype="int64"),
                              **{nm: pd.Series([], dtype="int64")
                                 for nm in sum_names}})
        return empty, {"chunks_total": n_total, "chunks_scanned": 0,
                       "chunks_skipped": n_total, "all_hit_chunks": 0,
                       "run_chunks": 0}
    ctr = df[df["kind"] == 1]
    scanned = int(ctr["c_scanned"].sum())
    counters = {"chunks_total": n_total,
                "chunks_scanned": scanned,
                "chunks_skipped": n_total - scanned,
                "all_hit_chunks": int(ctr["c_all"].sum()),
                "run_chunks": int(ctr["c_run"].sum())}
    df = df[(df["kind"] == 0) & (df["n"] > 0)] \
        .drop(columns=["kind"] + ctr_names) \
        .rename(columns=dict(zip(gnames, gcols))) \
        .sort_values(gcols).reset_index(drop=True)
    for g in gcols:
        df[g] = df[g].astype(str) if g in g_str \
            else df[g].astype("int64")
    for c in ["n"] + sum_names:
        df[c] = df[c].astype("int64")
    return df, counters


def encoded_scan_where(enc_dir: str, expr: tuple, out_cols: list[str]):
    """``SELECT out_cols WHERE <predicate tree>`` over a table-encode
    directory — the row-RETRIEVAL sibling of
    :func:`encoded_boolean_agg`, with LATE MATERIALIZATION: the
    predicate evaluates to a selection run-list per chunk (zone-map
    short-circuits included), and only then are the projected columns
    decoded, and only at the selected positions
    (:func:`tokrle.codecs.core.gather_runs` — bit-addressable codecs
    fetch each run via decode_range, touching O(selected) payload
    bytes; sequential codecs decode once and gather).  Chunks the scan
    filter or the evaluator rules out never decode anything.

    Returns a lazy ``ray.data.Dataset`` of the matching rows (streamed,
    never collected).  Projection columns may be integer OR string
    (string projections late-materialize via
    :func:`tokrle.codecs.core.gather_str_runs` — one lengths decode +
    one vectorized byte gather of only the selected rows); nullable
    chunks raise."""
    import ray.data

    from tokrle.codecs.core import decode as codec_decode
    from tokrle.codecs.core import gather_runs, gather_str_runs

    pred_cols = _expr_pred_cols(expr)
    str_cols = _expr_str_cols(expr)
    # footer-schema probe (no data read): a projection column with a
    # __lens_payload field is a string/list column and needs that
    # stream; the str-vs-list dispatch happens on the codec spec
    fields, first_file = _footer_fields(enc_dir)
    out_str = [c for c in out_cols if f"{c}__lens_payload" in fields]
    # dtype probe (first footer row group only): pins the output schema
    # so a fully-zone-pruned scan still yields a typed empty dataset,
    # and rejects unsupported projections before any task runs
    out_dtypes = {}
    if first_file is not None:
        import pyarrow.parquet as _pq
        first = _pq.ParquetFile(first_file).read_row_group(
            0, columns=[f"{c}__dtype" for c in out_cols])
        for c in out_cols:
            d = first.column(f"{c}__dtype")[0].as_py()
            if c in out_str and d != "str":
                raise TypeError(f"column {c!r}: only string and integer "
                                f"projections supported (dtype {d})")
            out_dtypes[c] = d
    need = ["n_rows"] + [f"{c}__{p}" for c in pred_cols
                         for p in ("vmin", "vmax")] + [
        f"{c}__{p}"
        for c in dict.fromkeys(pred_cols + list(out_cols))
        for p in ("codec", "payload", "dtype", "valid")] + [
        f"{c}__lens_payload"
        for c in dict.fromkeys(str_cols + out_str)] + [
        f"{c}__{p}" for c in str_cols if c not in out_cols
        for p in ("codec", "payload", "valid")]
    need = list(dict.fromkeys(need))

    def _chunk_col(batch, c, i):
        if len(batch.column(f"{c}__valid")[i].as_py() or b""):
            raise ValueError(
                f"column {c!r}: nullable chunks not supported by the "
                "compressed-domain scan")
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    def extract(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        zmin = {c: batch.column(f"{c}__vmin").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        zmax = {c: batch.column(f"{c}__vmax").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        parts: dict = {c: [] for c in out_cols}
        for i in range(len(batch)):
            n = int(nrows[i])
            sel = _expr_eval(expr, i, n, zmin, zmax,
                             lambda col, j: _chunk_col(batch, col, j),
                             lambda col, j: _chunk_str_col(batch, col, j))
            if isinstance(sel, str):        # ALL: select every row
                runs = (np.zeros(1, np.int64), np.full(1, n, np.int64))
            elif len(sel[0]):
                runs = sel
            else:
                continue
            for c in out_cols:
                if c in out_str:
                    spec, lp, tp = _chunk_str_col(batch, c, i)
                    if not spec.startswith(("str:", "sdict:")):
                        raise TypeError(
                            f"column {c!r}: only string and integer "
                            f"projections supported ({spec})")
                    parts[c].append(gather_str_runs(spec, lp, tp, n,
                                                    *runs))
                    continue
                codec, payload, dt = _chunk_col(batch, c, i)
                parts[c].append(
                    codec_decode(codec, payload, n, dt)
                    if isinstance(sel, str)
                    else gather_runs(codec, payload, n, dt, *runs))
        out = {}
        for c in out_cols:
            if c in out_str:
                out[c] = pa.concat_arrays(parts[c]) if parts[c] else \
                    pa.array([], type=pa.large_utf8())
            elif parts[c]:
                out[c] = pa.array(np.concatenate(parts[c]))
            else:
                # schema-stable empties: the column's true dtype comes
                # from any chunk's metadata, selected or not
                dt = np.dtype(batch.column(f"{c}__dtype")[0].as_py()) \
                    if len(batch) else np.dtype(np.int64)
                out[c] = pa.array(np.empty(0, dtype=dt))
        return pa.table(out)

    ds = ray.data.read_parquet(enc_dir, columns=need,
                               filter=_expr_zone_filter(expr))
    mapped = ds.map_batches(extract, batch_format="pyarrow")
    # schema seed: one empty typed block so a scan whose zone filter
    # prunes EVERY chunk still reports the projection schema
    seed = pa.table({
        c: (pa.array([], type=pa.large_utf8()) if c in out_str
            else pa.array(np.empty(
                0, dtype=np.dtype(out_dtypes.get(c, "int64")))))
        for c in out_cols})
    return mapped.union(ray.data.from_arrow(seed))


def encoded_lookup_join(enc_dir: str, key_col: str, dim, dim_key: str,
                        dim_cols: list[str], out_cols: list[str],
                        expr: tuple | None = None):
    """INNER JOIN of the encoded FACT table against a SMALL dimension
    frame (``dim``, pandas) on ``key_col == dim_key`` — broadcast hash
    join re-expressed in the compressed domain.  The dimension's sorted
    key array becomes an ``in`` leaf of the predicate tree (optionally
    ANDed with ``expr``), so membership evaluates on the codec streams
    (rle: O(#runs); dict: sorted-set intersection + boolean-table code
    lookup) with zone-map chunk pruning; only then are ``key_col`` and
    ``out_cols`` late-materialized at the matching positions, and the
    dimension attributes ``dim_cols`` attach via one ``searchsorted``
    against the broadcast keys.  The fact table never shuffles and
    never decodes non-matching rows; the dimension rides into each task
    once (closure capture — dimension sides that don't fit a task
    closure belong in a shuffle join, not here).

    Returns a lazy ``ray.data.Dataset`` of joined rows (``key_col`` +
    ``out_cols`` from the fact side, ``dim_cols`` from the dimension).
    Dimension keys must be unique; fact out columns may be integer OR
    string (string projections late-materialize via
    :func:`tokrle.codecs.core.gather_str_runs`); nullable chunks
    raise."""
    import ray.data

    from tokrle.codecs.core import decode as codec_decode
    from tokrle.codecs.core import gather_runs, gather_str_runs

    keys = np.asarray(dim[dim_key], dtype=np.int64)
    if len(np.unique(keys)) != len(keys):
        raise ValueError(f"dim[{dim_key!r}] must be unique for a lookup "
                         "join (got duplicate keys)")
    order = np.argsort(keys, kind="mergesort")
    skeys = keys[order]
    dvals = {c: np.asarray(dim[c])[order] for c in dim_cols}
    overlap = set(dim_cols) & set([key_col] + list(out_cols))
    if overlap:
        raise ValueError(f"dim_cols collide with fact columns: "
                         f"{sorted(overlap)}")

    join_expr = ("in", key_col, [int(k) for k in skeys])
    if expr is not None:
        join_expr = ("and", join_expr, expr)

    pred_cols = _expr_pred_cols(join_expr)
    str_cols = _expr_str_cols(join_expr)
    fact_cols = list(dict.fromkeys([key_col] + list(out_cols)))
    # footer-schema probe (no data read): fact columns with a
    # __lens_payload field are string projections
    fields, _ = _footer_fields(enc_dir)
    out_str = [c for c in fact_cols if f"{c}__lens_payload" in fields]
    if key_col in out_str:
        raise TypeError(f"join key {key_col!r} must be an integer "
                        "column")
    need = ["n_rows"] + [f"{c}__{p}" for c in pred_cols
                         for p in ("vmin", "vmax")] + [
        f"{c}__{p}"
        for c in dict.fromkeys(pred_cols + fact_cols)
        for p in ("codec", "payload", "dtype", "valid")] + [
        f"{c}__lens_payload"
        for c in dict.fromkeys(str_cols + out_str)] + [
        f"{c}__{p}" for c in str_cols if c not in fact_cols
        for p in ("codec", "payload", "valid")]
    need = list(dict.fromkeys(need))

    def _chunk_col(batch, c, i):
        if len(batch.column(f"{c}__valid")[i].as_py() or b""):
            raise ValueError(
                f"column {c!r}: nullable chunks not supported by the "
                "compressed-domain lookup join")
        return (batch.column(f"{c}__codec")[i].as_py(),
                memoryview(batch.column(f"{c}__payload")[i].as_buffer()),
                np.dtype(batch.column(f"{c}__dtype")[i].as_py()))

    def joined(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        zmin = {c: batch.column(f"{c}__vmin").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        zmax = {c: batch.column(f"{c}__vmax").to_numpy(
            zero_copy_only=False) for c in pred_cols}
        parts: dict = {c: [] for c in fact_cols}
        key_parts: list = []
        for i in range(len(batch)):
            n = int(nrows[i])
            sel = _expr_eval(join_expr, i, n, zmin, zmax,
                             lambda col, j: _chunk_col(batch, col, j),
                             lambda col, j: _chunk_str_col(batch, col, j))
            if isinstance(sel, str):
                runs = (np.zeros(1, np.int64), np.full(1, n, np.int64))
            elif len(sel[0]):
                runs = sel
            else:
                continue
            for c in fact_cols:
                if c in out_str:
                    spec, lp, tp = _chunk_str_col(batch, c, i)
                    parts[c].append(gather_str_runs(spec, lp, tp, n,
                                                    *runs))
                    continue
                codec, payload, dt = _chunk_col(batch, c, i)
                parts[c].append(
                    codec_decode(codec, payload, n, dt)
                    if isinstance(sel, str)
                    else gather_runs(codec, payload, n, dt, *runs))
            key_parts.append(parts[key_col][-1].astype(np.int64))
        out = {}
        for c in fact_cols:
            if c in out_str:
                out[c] = pa.concat_arrays(parts[c]) if parts[c] else \
                    pa.array([], type=pa.large_utf8())
            elif parts[c]:
                out[c] = pa.array(np.concatenate(parts[c]))
            else:
                dt = np.dtype(batch.column(f"{c}__dtype")[0].as_py()) \
                    if len(batch) else np.dtype(np.int64)
                out[c] = pa.array(np.empty(0, dtype=dt))
        # the `in` leaf guarantees membership (an ALL shortcut requires
        # the set to cover the chunk's whole zone window), so the
        # searchsorted positions are exact hits by construction
        kv = np.concatenate(key_parts) if key_parts else \
            np.empty(0, np.int64)
        idx = np.searchsorted(skeys, kv)
        for c in dim_cols:
            out[c] = pa.array(dvals[c][idx] if len(kv)
                              else dvals[c][:0])
        return pa.table(out)

    ds = ray.data.read_parquet(enc_dir, columns=need,
                               filter=_expr_zone_filter(join_expr))
    return ds.map_batches(joined, batch_format="pyarrow")


def encoded_topk_rows(enc_dir: str, col: str, k: int):
    """The k largest values of ``col`` (row multiset, ties by count)
    over a table-encode directory — ``ORDER BY col DESC LIMIT k``
    answered with METADATA-ONLY pruning first, codec streams second:

    - pass 0 reads just ``(n_rows, vmin)`` and derives the exclusion
      threshold T: sort chunks by vmin descending and cumsum their row
      counts — once >= k rows provably have values >= T (every row of a
      chunk is >= its vmin), any chunk with ``vmax < T`` cannot
      contribute and never leaves storage;
    - surviving chunks answer from their codec streams via
      :func:`tokrle.codecs.core.value_counts` (dict: dictionary + code
      bincount; rle: run fold — no decode), keep only values >= T, and
      TRIM to their own top-k row budget (sorted desc, cumulative count
      cut at k) so the exchange carries at most #chunks x k pairs;
    - one groupby-sum over the pairs, then the driver cuts the global
      multiset at exactly k rows.

    Returns ``(DataFrame(value, n) sorted desc with sum(n) == min(k,
    total rows), counters)``.  Integer zone-mapped columns only;
    nullable chunks raise."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from tokrle.codecs.core import value_counts

    k = int(k)
    if k <= 0:
        raise ValueError("k must be positive")
    # pass 0 is a driver-side read of two tiny int columns straight
    # from the parquet footprint — no Ray job for metadata (at 1e8
    # chunks this is still two int64 vectors)
    import pyarrow.parquet as pq
    meta = pq.read_table(
        enc_dir, columns=["n_rows", f"{col}__vmin"]).to_pandas()
    n_total_chunks = len(meta)
    if n_total_chunks == 0:
        return (pd.DataFrame({"value": pd.Series([], dtype="int64"),
                              "n": pd.Series([], dtype="int64")}),
                {"chunks_total": 0, "chunks_scanned": 0,
                 "chunks_skipped": 0})
    m = meta.sort_values(f"{col}__vmin", ascending=False)
    cum = m["n_rows"].cumsum()
    covered = cum.searchsorted(k)     # first index with cumsum >= k
    if covered >= len(m):
        t_bound = None                # fewer than k rows exist: scan all
    else:
        t_bound = int(m[f"{col}__vmin"].iloc[covered])

    need = ["n_rows"] + [f"{col}__{p}"
                         for p in ("codec", "payload", "dtype", "valid")]
    flt = None if t_bound is None else \
        (pc.field(f"{col}__vmax") >= t_bound)

    def partial(batch: pa.Table) -> pa.Table:
        nrows = batch.column("n_rows").to_numpy(zero_copy_only=False)
        vs, cs = [], []
        for i in range(len(batch)):
            if len(batch.column(f"{col}__valid")[i].as_py() or b""):
                raise ValueError(
                    f"column {col!r}: nullable chunks not supported by "
                    "the compressed-domain top-k")
            vals, counts = value_counts(
                batch.column(f"{col}__codec")[i].as_py(),
                memoryview(batch.column(
                    f"{col}__payload")[i].as_buffer()),
                int(nrows[i]),
                np.dtype(batch.column(f"{col}__dtype")[i].as_py()))
            if t_bound is not None:
                keep = vals >= vals.dtype.type(t_bound)
                vals, counts = vals[keep], counts[keep]
            if len(vals) == 0:
                continue
            # per-chunk row budget: largest values until k rows covered
            vals, counts = vals[::-1], counts[::-1]     # descending
            cut = int(np.searchsorted(np.cumsum(counts), k)) + 1
            vs.append(vals[:cut].astype(np.int64))
            cs.append(counts[:cut])
        if not vs:
            return pa.table({"value": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64()),
                             "chunks": pa.array([len(batch)],
                                                type=pa.int64())})
        out_v = np.concatenate(vs)
        out_c = np.concatenate(cs)
        pad = np.zeros(len(out_v), np.int64)
        pad[0] = len(batch)
        return pa.table({"value": pa.array(out_v),
                         "c": pa.array(out_c),
                         "chunks": pa.array(pad)})

    ds = ray.data.read_parquet(enc_dir, columns=need, filter=flt)
    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("value").aggregate(Sum("c", alias_name="n"),
                                    Sum("chunks", alias_name="chunks")) \
        .to_pandas()
    scanned = int(hist["chunks"].sum()) if len(hist) else 0
    hist = hist.drop(columns=["chunks"]) \
        .sort_values("value", ascending=False).reset_index(drop=True)
    cum = hist["n"].cumsum()
    # k past the table size keeps every row (cut clamps to the
    # histogram length; nothing to trim since cumsum never reaches k)
    cut = min(int(cum.searchsorted(k)) + 1, len(hist))
    top = hist.iloc[:cut].copy()
    if len(top) and int(cum.iloc[cut - 1]) > k:
        top.loc[top.index[-1], "n"] -= int(cum.iloc[cut - 1]) - k
    top["value"] = top["value"].astype("int64")
    top["n"] = top["n"].astype("int64")
    counters = {"chunks_total": n_total_chunks,
                "chunks_scanned": scanned,
                "chunks_skipped": n_total_chunks - scanned,
                "threshold": t_bound}
    return top.reset_index(drop=True), counters


def _column_checksums(ds, columns: list[str]) -> dict:
    """Order-independent per-column checksums, computed distributed: row
    count plus a sum of vectorized 64-bit content hashes per column (so
    two datasets with equal multisets of values — regardless of row or
    block order — produce equal checksums)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    P = (1 << 31) - 1   # sums stay far inside int64 up to ~2^32 partials;
                        # elementwise-mod -> partial-mod -> final-mod is
                        # additive, so the checksum is BATCHING-INDEPENDENT

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {"n": [len(df)]}
        for c in columns:
            h = pd.util.hash_array(df[c].to_numpy(dtype=object),
                                   categorize=False)
            out[f"h_{c}"] = [int((h % np.uint64(P)).sum() % P)]
        return pd.DataFrame(out)

    aggs = [Sum("n", alias_name="n")] + [
        Sum(f"h_{c}", alias_name=f"h_{c}") for c in columns]
    row = ds.map_batches(partial, batch_format="pandas").aggregate(*aggs)
    return {k: int(v) % P if k.startswith("h_") else int(v)
            for k, v in row.items()}
