"""The flagship pipeline: token table -> encoded chunk table (+ reverse).

Idiomatic Ray Data throughout: ``read_parquet`` -> optional skew rebalance ->
``map_batches`` encode (fused task stage by default, actor pool opt-in) ->
``write_parquet`` with per-partition lineage; decode is the stateless
inverse.  Checkpoint/resume operates at input-file-group granularity via
the manifest in tokrle.state.

Replaces the reference's driver-held dict-of-Rles + manual ray.remote
fan-out (ref pyrle/rledict.py:21-34,155-176; pyrle/methods.py:80-120) with
streaming Dataset execution: no driver-side materialization, backpressure
and spilling for free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tokrle.stages.encoder import TokenEncoder, decode_chunks

# ~1M tokens per encoded chunk: big enough to amortize codec headers and
# profiling, small enough that the transient bit matrix (n*4B) plus batch
# stays well inside a worker heap even at concurrency 32.
DEFAULT_BATCH_SIZE = 2048  # docs per chunk (~1M tokens at mean 512)


def rebalance_by_source(ds, num_blocks: int | None = None):
    """Skew stage: co-locate rows of one source and split into ~equal-token
    blocks (north_rule: "groupby-on-source + repartition before encoding").

    ``sort("source")`` is a range-partitioned shuffle — one all-to-all
    exchange — after which each output block holds a contiguous source
    range, so chunks are (almost always) single-source and codec choice can
    exploit per-source value distributions.  At 100 TB this is the only
    shuffle in the pipeline and is executed by Ray Data's shuffle operator
    (hash/range partitioned, spillable), not on the driver.
    """
    ds = ds.sort("source")
    if num_blocks:
        ds = ds.repartition(num_blocks)
    return ds


def rebalance_by_source_bucket(ds, num_blocks: int | None = None):
    """Bucketed-hash alternative to :func:`rebalance_by_source`: one
    hash-partitioned exchange on the (tiny) source key co-locates every
    source's rows in one output partition — no boundary-sampling scan and
    no within-block sort, the two extra passes ``sort("source")`` pays.
    Output blocks hold a few WHOLE sources each, so the encoder's local
    per-batch source grouping recovers source-pure chunks.

    Key-based repartition needs ``shuffle_strategy=HASH_SHUFFLE``; it is
    set on THIS dataset lineage's captured DataContext only — the global
    context (and unrelated pipelines) keep their strategy.  Aggregator
    actors are capped at CPUs/2: each exchange partition is an actor
    holding a CPU slot, and more aggregators than free CPUs stalls the
    streaming executor (same sizing rule as dedup._join_partitions).

    Skew note: one giant source still lands in one partition — the
    encoder slices it into chunk-sized pieces, so only that partition's
    task runs long; nothing accumulates in memory.
    """
    import ray
    from ray.data.context import ShuffleStrategy

    from tokrle.functions.dedup import _join_partitions, _upstream_size_hint

    cpus = max(1, int(ray.cluster_resources().get("CPU", 8)))
    if num_blocks is None:
        # byte-aware: small inputs get few exchange partitions (aggregator
        # actor spin-up dominates tiny exchanges; see dedup._join_partitions)
        num_blocks = _join_partitions(None,
                                      size_bytes=_upstream_size_hint(ds))
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds.context.max_hash_shuffle_aggregators = min(num_blocks,
                                                  max(2, cpus // 2))
    # downstream hash aggregates in this lineage inherit the context; pin
    # the partition default (Ray's 200) to the same CPU-sized count so a
    # trailing small groupby doesn't become a 200-way exchange
    ds.context.default_hash_shuffle_parallelism = num_blocks
    return ds.repartition(num_blocks, keys=["source"])


_TASK_ENCODERS: dict[bool, TokenEncoder] = {}


def _encode_batch(batch, local_group: bool = False):
    """Stateless-task wrapper: the encoder instance is cached in the worker
    process's module state, so setup still happens once per worker while the
    stage stays a TASK stage — which lets Ray Data fuse read->encode->write
    into single tasks (an actor stage cannot fuse with the read, forcing
    every input byte through the object store)."""
    enc = _TASK_ENCODERS.get(local_group)
    if enc is None:
        enc = _TASK_ENCODERS[local_group] = TokenEncoder(
            local_group=local_group)
    return enc(batch)


def encode_tokens(ds, *, batch_size: int = DEFAULT_BATCH_SIZE,
                  concurrency=None, by_source: bool = False,
                  num_blocks: int | None = None, use_actors: bool = False):
    """Token-table Dataset -> encoded-chunk Dataset (lazy).

    Default is a fused task stage (see _encode_batch).  ``use_actors=True``
    switches to an explicit actor pool — the right call when the encoder
    grows genuinely heavy per-actor state (trained FSST tables, shared
    dictionaries); pass ``concurrency=(min, max)`` to size it.

    ``by_source``: ``"sort"``/True = the global sort("source") shuffle
    (chunks near-perfectly source-pure); ``"local"`` = per-batch source
    grouping inside the encoder — no shuffle at all, smaller chunks, most
    of the codec-fit benefit (see BASELINE.md); ``"hash"`` = one bucketed
    hash exchange co-locating whole sources (run under
    :func:`hash_shuffle`), then local grouping — source-pure chunks at a
    cheaper exchange than the sort.
    """
    local_group = by_source in ("local", "hash")
    if by_source == "hash":
        ds = rebalance_by_source_bucket(ds, num_blocks)
    elif by_source and not local_group:
        ds = rebalance_by_source(ds, num_blocks)
    if not use_actors:
        import functools

        kwargs = {}
        if isinstance(concurrency, int):
            kwargs["concurrency"] = concurrency
        fn = (functools.partial(_encode_batch, local_group=True)
              if local_group else _encode_batch)
        return ds.map_batches(fn, batch_size=batch_size,
                              batch_format="pyarrow", **kwargs)
    if concurrency is None or isinstance(concurrency, int):
        import ray

        n = max(1, int(ray.cluster_resources().get("CPU", 8)))
        concurrency = (1, concurrency if isinstance(concurrency, int) else n)
    return ds.map_batches(TokenEncoder, batch_size=batch_size,
                          batch_format="pyarrow", concurrency=concurrency,
                          fn_constructor_kwargs={"local_group": local_group})


def decode_tokens(encoded_ds, *, batch_size: int = 4):
    """Encoded-chunk Dataset -> token-table Dataset (stateless inverse)."""
    return encoded_ds.map_batches(decode_chunks, batch_size=batch_size,
                                  batch_format="pyarrow")


def roundtrip_check(src_ds, decoded_ds) -> dict:
    """Streaming row-level equality evidence without materializing either
    side: per-doc token checksums aggregated globally.

    checksum(doc) = sum(tokens * (1 + position)) — order-sensitive, so any
    per-row reorder or corruption changes the global sum.  Returns both
    sides' (n_docs, n_tokens, checksum) for comparison.
    """

    def doc_checksums(batch: pa.Table) -> pa.Table:
        from tokrle.kernels.segments import segment_sums
        from tokrle.stages.encoder import _flat_tokens

        values, offsets = _flat_tokens(batch)
        if len(values):
            pos = np.arange(len(values), dtype=np.uint64)
            starts = offsets[:-1]
            # position within the doc: global pos minus doc start, +1
            within = pos - np.repeat(starts.astype(np.uint64),
                                     np.diff(offsets).astype(np.int64))
            weighted = values.astype(np.uint64) * (within + 1)
            sums = segment_sums(weighted, offsets)
            # fold per DOC (batching-invariant), sum raw per batch; the
            # global int64 sum may wrap at extreme scale but wraps
            # identically on both sides, so equality evidence holds
            total = int((sums & 0xFFFFFFFF).sum(dtype=np.uint64))
        else:
            total = 0
        return pa.table({
            "n_docs": pa.array([len(batch)], type=pa.int64()),
            "n_tokens": pa.array([int(len(values))], type=pa.int64()),
            "checksum": pa.array([total], type=pa.int64()),
        })

    def agg(ds):
        t = ds.map_batches(doc_checksums, batch_format="pyarrow")
        row = t.sum(["n_docs", "n_tokens", "checksum"])
        return {
            "n_docs": row["sum(n_docs)"],
            "n_tokens": row["sum(n_tokens)"],
            "checksum": row["sum(checksum)"],
        }

    return {"source": agg(src_ds), "decoded": agg(decoded_ds)}


def fetch_docs(enc_dir: str, doc_ids):
    """Point lookups on the encoded corpus WITHOUT full decode.

    Pass 1 reads only the (chunk_id, doc_id) metadata columns — column
    pruning keeps every payload byte in storage — and finds the chunks
    holding requested docs with one vectorized is_in + segment-any per
    batch.  Pass 2 reads just those chunks (``chunk_id isin`` pushed to
    the Parquet scan) and decodes ONLY each requested doc's row range via
    codec random access (:func:`tokrle.codecs.core.decode_range` —
    O(doc tokens) for the bit-addressable codecs, full-chunk fallback for
    the sequential ones).  Returns a token-table Dataset of the requested
    docs; the per-doc Python loop in pass 2 runs over the REQUESTED set
    only, which is small by the definition of a point lookup.
    """
    import pyarrow.compute as pc
    import ray.data

    from tokrle.codecs.core import decode_range

    wanted_arr = pa.array(sorted({str(d) for d in doc_ids}),
                          type=pa.string())

    def find(batch: pa.Table) -> pa.Table:
        col = batch.column("doc_id").combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten()
        hit = pc.is_in(flat, value_set=wanted_arr).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(hit)))
        ends = np.cumsum(lens)
        keep = (cs[ends] - cs[ends - lens]) > 0
        return batch.select(["chunk_id"]).filter(pa.array(keep))

    from tokrle.pipelines.corpus import corpus_files

    hits = ray.data.read_parquet(corpus_files(enc_dir),
                                 columns=["chunk_id", "doc_id"]) \
        .map_batches(find, batch_format="pyarrow").to_pandas()
    # a no-hit lookup yields a 0-row frame that may drop its schema
    chunk_ids = hits["chunk_id"].tolist() if len(hits) else []
    return _fetch_chunks(enc_dir, chunk_ids, wanted_arr)


def _empty_token_ds():
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.string()),
        "tokens": pa.array([], type=pa.list_(pa.int32())),
        "n_tok": pa.array([], type=pa.int32()),
        "source": pa.array([], type=pa.string()),
    }))


def _fetch_chunks(enc_dir: str, chunk_ids: list, wanted_arr: pa.Array):
    """Pass 2 of a point lookup: read ONLY the named chunks (isin pushed
    to the Parquet scan) and range-decode just the requested docs."""
    import pyarrow.compute as pc
    import ray.data

    from tokrle.codecs.core import decode_range

    if not chunk_ids:       # empty isin set is a null-typed Arrow error
        return _empty_token_ds()

    from tokrle.pipelines.corpus import corpus_files

    enc = ray.data.read_parquet(
        corpus_files(enc_dir), filter=pc.field("chunk_id").isin(chunk_ids))

    def extract(batch: pa.Table) -> pa.Table:
        out_ids, out_srcs, out_toks = [], [], []
        for i in range(len(batch)):
            ids = batch.column("doc_id")[i].values
            mask = pc.is_in(ids, value_set=wanted_arr).to_numpy(
                zero_copy_only=False)
            rows = np.flatnonzero(mask)
            if not len(rows):
                continue
            offs = np.asarray(batch.column("row_offsets")[i].as_py(),
                              dtype=np.int64)
            codec = batch.column("codec")[i].as_py()
            payload = memoryview(batch.column("payload")[i].as_buffer())
            n = batch.column("n_tokens")[i].as_py()
            srcs = batch.column("doc_source")[i].values
            for r in rows:
                out_ids.append(ids[int(r)].as_py())
                out_srcs.append(srcs[int(r)].as_py())
                out_toks.append(decode_range(codec, payload, n, np.int32,
                                             int(offs[r]),
                                             int(offs[r + 1])))
        return pa.table({
            "doc_id": pa.array(out_ids, type=pa.string()),
            "tokens": pa.array([t.tolist() for t in out_toks],
                               type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for t in out_toks],
                              type=pa.int32()),
            "source": pa.array(out_srcs, type=pa.string()),
        })

    return enc.map_batches(extract, batch_format="pyarrow")


def build_doc_index(enc_dir: str, index_dir: str | None = None, *,
                    n_buckets: int = 64) -> str:
    """Persistent doc_id -> chunk_id index for the encoded corpus,
    hive-partitioned by id-hash bucket (the LSH/IVF-index layout applied
    to point lookups).

    One metadata-only scan of (chunk_id, doc_id list) columns flattens to
    (doc_id, chunk_id, bucket) rows and writes them partitioned by
    ``bucket``, so a lookup reads ~1/``n_buckets`` of the index instead
    of scanning every chunk's doc list (:func:`fetch_docs` pass 1).  The
    index is a SNAPSHOT of the corpus: rebuild it after
    ``upsert_corpus`` / ``compact_corpus`` (the builder overwrites in
    place; ``meta.json`` records n_buckets and the build time).
    """
    import json
    import os
    import shutil
    import time as _time

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    index_dir = index_dir or os.path.join(enc_dir, "_docindex")
    shutil.rmtree(index_dir, ignore_errors=True)

    def flatten(batch: pa.Table) -> pa.Table:
        col = batch.column("doc_id").combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten()
        ids = flat.to_pandas().to_numpy(dtype=object)
        chunk = batch.column("chunk_id").to_pandas().to_numpy(dtype=object)
        bucket = (pd.util.hash_array(ids, categorize=False)
                  % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.string()),
            "chunk_id": pa.array(np.repeat(chunk, lens), type=pa.string()),
            "bucket": pa.array(bucket, type=pa.int64()),
        })

    from tokrle.pipelines.corpus import corpus_files

    ray.data.read_parquet(corpus_files(enc_dir),
                          columns=["chunk_id", "doc_id"]) \
        .map_batches(flatten, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["bucket"])
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"n_buckets": n_buckets, "built_at": _time.time()}, f)
    return index_dir


def fetch_docs_indexed(enc_dir: str, doc_ids,
                       index_dir: str | None = None):
    """Point lookups through the persistent doc index: hash the requested
    ids to their buckets, read ONLY those index partitions (pruned at the
    path level, like the LSH/IVF query paths), then range-decode the
    located chunks — pass 1 touches ~|ids|/n_buckets of the index rather
    than every chunk's doc list."""
    import json
    import os

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from tokrle.functions.ann import _partition_paths

    index_dir = index_dir or os.path.join(enc_dir, "_docindex")
    with open(os.path.join(index_dir, "meta.json")) as f:
        n_buckets = json.load(f)["n_buckets"]
    wanted = sorted({str(d) for d in doc_ids})
    if not wanted:
        return _empty_token_ds()
    wanted_arr = pa.array(wanted, type=pa.string())
    ids_np = np.asarray(wanted, dtype=object)
    buckets = np.unique(pd.util.hash_array(ids_np, categorize=False)
                        % np.uint64(n_buckets)).astype(np.int64)
    paths = _partition_paths(index_dir, "bucket", buckets.tolist())
    if not paths:
        return _empty_token_ds()
    idx = ray.data.read_parquet(paths, columns=["doc_id", "chunk_id"])

    def probe(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("doc_id"), value_set=wanted_arr)
        return batch.filter(keep).select(["chunk_id"])

    hits = idx.map_batches(probe, batch_format="pyarrow").to_pandas()
    chunk_ids = sorted(set(hits["chunk_id"])) if len(hits) else []
    return _fetch_chunks(enc_dir, chunk_ids, wanted_arr)
