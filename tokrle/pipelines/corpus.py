"""Corpus-level resumable encode: directory of token Parquet -> encoded
Parquet + lineage, restartable at partition granularity.

Resume unit = a GROUP of input files (default 32): each group runs as ONE
streaming Dataset pipeline (read -> encode -> write -> manifest publish),
so actor-pool spin-up and pipeline startup amortize over the group while a
killed run loses at most one group's work.  Groups are deterministic
(sorted file list, fixed group size), so re-runs resume exactly.

The reference has no fault tolerance at all (a failed ray.get kills the
job, ref pyrle/rledict.py:173); this plus Ray Data's task retries is the
scale-out replacement.
"""

from __future__ import annotations

import glob
import hashlib
import os
import time

from tokrle.pipelines.encode import DEFAULT_BATCH_SIZE, encode_tokens
from tokrle.state.manifest import Manifest

GROUP_FILES = 32
# auto-sizing targets: enough bytes per group that pipeline spin-up
# amortizes, small enough that a crash loses minutes, not hours.  The
# target counts ON-DISK (compressed parquet) bytes — ~256 MB on disk is
# roughly 1 GB of raw token data at typical parquet ratios
GROUP_TARGET_BYTES = 256 << 20
GROUP_MAX_FILES = 64


def list_units(in_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(in_dir, "*.parquet")))


def plan_groups(units: list[str], *, target_bytes: int = GROUP_TARGET_BYTES,
                max_files: int = GROUP_MAX_FILES) -> list[list[str]]:
    """Deterministic size-aware grouping: consecutive (sorted) files are
    grouped until ~target_bytes or max_files — so tiny-file corpora do not
    pay one pipeline spin-up per handful of MB and huge-file corpora still
    resume at a fine granularity.  Same files + sizes -> same groups."""
    groups: list[list[str]] = []
    cur: list[str] = []
    size = 0
    for p in units:
        s = os.path.getsize(p)
        if cur and (size + s > target_bytes or len(cur) >= max_files):
            groups.append(cur)
            cur, size = [], 0
        cur.append(p)
        size += s
    if cur:
        groups.append(cur)
    return groups


def _group_id(paths: list[str]) -> str:
    h = hashlib.blake2b(digest_size=10)
    for p in paths:
        h.update(p.encode())
        h.update(b"\x00")  # separator: ['ab','c'] must not equal ['a','bc']
    return h.hexdigest()


def _drain_unit_metrics(metrics_ds, unit_key: str, n_per_unit: dict,
                        on_unit_done, on_row=None) -> None:
    """Stream per-file metrics rows from a fused single-job Dataset and
    invoke ``on_unit_done(unit)`` the moment the unit's LAST row arrives —
    the shared countdown behind the encode / upsert / compact single-job
    paths, so crash-publish ordering is defined in exactly one place."""
    remaining = dict(n_per_unit)
    for row in metrics_ds.iter_rows():
        u = row[unit_key]
        if on_row is not None:
            on_row(u, row)
        remaining[u] -= 1
        if remaining[u] == 0:
            on_unit_done(u)


def _encode_corpus_single_job(groups, done, manifest, out_dir, run, *,
                              batch_size: int, local_group: bool,
                              task_fn=None, concurrency=None) -> dict:
    """Shuffle-free encode path: every pending group's files run in ONE
    Dataset job of fused read->encode->write tasks
    (:func:`_encode_write_file_task`, or ``task_fn`` — e.g.
    :func:`_recompress_file_task`); only per-file metrics rows return to
    the driver, which then publishes one manifest row per completed group.

    Per-group ``seconds`` in the manifest is the SUM of that group's
    per-file task times (compute seconds, not wall — groups now execute
    concurrently)."""
    import functools

    import ray.data

    pending: list[tuple[str, list[str]]] = []
    for grp in groups:
        gid = _group_id(grp)
        if gid in done:
            run["units_skipped"] += 1
            continue
        # a previous CRASHED attempt may have left partial files (its
        # manifest row was never published); clear them or stale-grouping
        # leftovers would sit next to the re-run's outputs
        unit_out = os.path.join(out_dir, f"group={gid}")
        if os.path.isdir(unit_out):
            import shutil

            shutil.rmtree(unit_out)
        pending.append((gid, grp))
    if not pending:
        return run
    t0 = time.perf_counter()
    items = [{"path": p, "group": gid} for gid, grp in pending for p in grp]
    paths = ray.data.from_items(items, override_num_blocks=len(items))
    # task pools take an int cap only — callers may pass the actor-pool
    # (min, max) tuple form, whose max is the equivalent bound here
    if isinstance(concurrency, (tuple, list)):
        concurrency = concurrency[-1]
    metrics_ds = paths.map_batches(
        functools.partial(task_fn or _encode_write_file_task,
                          out_dir=out_dir,
                          batch_size=batch_size, local_group=local_group),
        batch_size=1, batch_format="numpy",
        **({"concurrency": concurrency} if concurrency else {}))
    per_group: dict[str, dict] = {
        gid: {"n_files": len(grp), "first_file": grp[0], "n_tokens": 0,
              "raw_bytes": 0, "encoded_bytes": 0, "seconds": 0.0}
        for gid, grp in pending}

    def accumulate(gid: str, row) -> None:
        m = per_group[gid]
        for k in ("n_tokens", "raw_bytes", "encoded_bytes", "seconds"):
            m[k] += row[k]

    def publish(gid: str) -> None:
        manifest.mark_done(gid, per_group[gid])
        for k in ("n_tokens", "raw_bytes", "encoded_bytes"):
            run[k] += per_group[gid][k]

    # stream the metrics rows and publish each group's manifest row the
    # moment its LAST file reports — resume granularity stays per-group
    # even though all groups share one job (a crash mid-job keeps every
    # already-published group)
    _drain_unit_metrics(metrics_ds, "group",
                        {gid: len(grp) for gid, grp in pending},
                        publish, on_row=accumulate)
    run["seconds"] = time.perf_counter() - t0
    return run


def _encode_write_file_task(batch: dict, *, out_dir: str, batch_size: int,
                            local_group: bool = False) -> "pa.Table":
    """Fully-fused resume-unit task: read one input file locally, encode it
    chunk by chunk, WRITE the encoded table straight into its group's
    directory, and return a single ~100-byte metrics row.

    This is the single-job execution shape for :func:`encode_corpus`: ALL
    pending groups run inside ONE Dataset job at full cluster width (one
    pipeline spin-up total, stragglers amortize across every file), instead
    of one sequential Dataset job per 256 MB resume group — which on a
    256-node cluster would leave almost the whole cluster idle per group.
    Nothing but the metrics row crosses the object store.

    Crash-idempotent: the output file name is a pure function of the input
    path, written via tmp + ``os.replace``; a retried or re-run task
    atomically overwrites its own previous partial output.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokrle.pipelines.encode import _encode_batch

    rows: dict[str, list] = {"group": [], "path": [], "n_tokens": [],
                             "raw_bytes": [], "encoded_bytes": [],
                             "seconds": []}
    for path, gid in zip(batch["path"], batch["group"]):
        t0 = time.perf_counter()
        table = pq.read_table(path, columns=["doc_id", "tokens", "n_tok",
                                             "source"])
        parts = [_encode_batch(table.slice(start, batch_size),
                               local_group=local_group)
                 for start in range(0, len(table), batch_size)]
        n_tok, raw_b, enc_b = _write_encoded_parts(parts, out_dir, gid,
                                                   path)
        rows["group"].append(gid)
        rows["path"].append(path)
        rows["n_tokens"].append(n_tok)
        rows["raw_bytes"].append(raw_b)
        rows["encoded_bytes"].append(enc_b)
        rows["seconds"].append(time.perf_counter() - t0)
    return pa.table(rows)


def _write_encoded_parts(parts: list, out_dir: str, gid: str,
                         src_path: str) -> tuple[int, int, int]:
    """Concat per-batch encoded tables and publish them as this input
    file's output part (tmp + atomic rename, deterministic name).
    Returns (n_tokens, raw_bytes, encoded_bytes); writes nothing when the
    input decoded to zero rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokrle.state.manifest import _unit_id

    if not parts:
        return 0, 0, 0
    enc = pa.concat_tables(parts)
    if not enc.num_rows:
        return 0, 0, 0
    import pyarrow.compute as pc

    n_tok = pc.sum(enc.column("n_tokens")).as_py() or 0
    raw_b = pc.sum(enc.column("raw_bytes")).as_py() or 0
    enc_b = pc.sum(enc.column("encoded_bytes")).as_py() or 0
    gdir = os.path.join(out_dir, f"group={gid}")
    os.makedirs(gdir, exist_ok=True)
    final = os.path.join(gdir, f"part-{_unit_id(src_path)}.parquet")
    tmp = final + ".tmp"
    pq.write_table(enc, tmp)
    os.replace(tmp, final)
    return n_tok, raw_b, enc_b


def _recompress_file_task(batch: dict, *, out_dir: str, batch_size: int,
                          local_group: bool = False) -> "pa.Table":
    """Fused recompress resume-unit task: read one ENCODED parquet file
    locally, stream-decode it a few chunks at a time, re-encode at the new
    chunking/codec settings, and write the result into its group's
    directory — the decoded token stream never leaves the task, let alone
    the object store.  Single-job shape and crash idempotence exactly as
    :func:`_encode_write_file_task`.

    Decoded rows are buffered and re-sliced to uniform ``batch_size``
    chunks across the whole file (one tail chunk per file), matching what
    the Dataset map_batches path produced per block."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows: dict[str, list] = {"group": [], "path": [], "n_tokens": [],
                             "raw_bytes": [], "encoded_bytes": [],
                             "seconds": []}
    for path, gid in zip(batch["path"], batch["group"]):
        t0 = time.perf_counter()
        enc_in = pq.read_table(
            path, columns=["codec", "payload", "n_tokens", "row_offsets",
                           "doc_id", "doc_source"])
        parts = _decode_reencode_stream([enc_in], batch_size=batch_size,
                                        local_group=local_group)
        n_tok, raw_b, enc_b = _write_encoded_parts(parts, out_dir, gid,
                                                   path)
        rows["group"].append(gid)
        rows["path"].append(path)
        rows["n_tokens"].append(n_tok)
        rows["raw_bytes"].append(raw_b)
        rows["encoded_bytes"].append(enc_b)
        rows["seconds"].append(time.perf_counter() - t0)
    return pa.table(rows)


def _decode_reencode_stream(enc_tables, *, batch_size: int,
                            local_group: bool, filter_fn=None) -> list:
    """Stream chunk rows from ``enc_tables`` (an iterable of encoded
    pyarrow Tables) through decode -> optional ``filter_fn`` (token-table
    -> token-table) -> uniform ``batch_size`` re-batch -> encode,
    returning the encoded part tables.  Transient memory is bounded by a
    few chunks plus one re-batch buffer regardless of the total stream
    size."""
    import pyarrow as pa

    from tokrle.pipelines.encode import _encode_batch
    from tokrle.stages.encoder import decode_chunks

    decode_rows = 4
    parts: list = []
    buf: list = []
    buf_rows = 0
    for enc_in in enc_tables:
        for s in range(0, enc_in.num_rows, decode_rows):
            tok = decode_chunks(enc_in.slice(s, decode_rows))
            if filter_fn is not None:
                tok = filter_fn(tok)
            if tok.num_rows:
                buf.append(tok)
                buf_rows += tok.num_rows
            while buf_rows >= batch_size:
                t = pa.concat_tables(buf) if len(buf) > 1 else buf[0]
                parts.append(_encode_batch(t.slice(0, batch_size),
                                           local_group=local_group))
                rem = t.slice(batch_size)
                buf = [rem] if rem.num_rows else []
                buf_rows = rem.num_rows
    if buf_rows:
        t = pa.concat_tables(buf) if len(buf) > 1 else buf[0]
        parts.append(_encode_batch(t, local_group=local_group))
    return parts


def recompress(in_encoded: str, out_dir: str, *,
               batch_size: int = DEFAULT_BATCH_SIZE,
               by_source: bool = False, concurrency=None) -> dict:
    """Re-encode an already-encoded corpus (codec migration / compaction /
    re-chunking): streaming decode -> encode per resume group — the decoded
    token stream never materializes, and a killed run resumes at group
    granularity exactly like :func:`encode_corpus`.

    Typical uses: switch the skew strategy (``by_source``), change the
    chunk size after data drift, or pick up codec improvements on old data.
    """
    import ray.data

    from tokrle.pipelines.encode import decode_tokens, encode_tokens

    manifest = Manifest(out_dir)
    # scan the LIVE view only: a raw recursive glob would ingest
    # _docindex partitions (wrong schema), *.tmp/*.old crash leftovers,
    # and superseded pre-compaction member dirs (duplicated docs)
    live = corpus_files(in_encoded)
    units = sorted(glob.glob(os.path.join(in_encoded, "*.parquet"))) \
        if isinstance(live, str) else live
    groups = plan_groups(sorted(units))
    done = manifest.completed_units()
    run = {"units_total": len(groups), "units_skipped": 0,
           "n_tokens": 0, "raw_bytes": 0, "encoded_bytes": 0, "seconds": 0.0}
    if by_source in (False, "", "local"):
        # shuffle-free settings: single-job fused decode->encode->write
        # tasks, same shape (and same resume/crash semantics) as
        # encode_corpus's fast path
        return _encode_corpus_single_job(
            groups, done, manifest, out_dir, run, batch_size=batch_size,
            local_group=by_source == "local",
            task_fn=_recompress_file_task, concurrency=concurrency)
    for grp in groups:
        gid = _group_id(grp)
        if gid in done:
            run["units_skipped"] += 1
            continue
        t0 = time.perf_counter()
        enc_in = ray.data.read_parquet(grp,
                                       override_num_blocks=len(grp))
        tokens = decode_tokens(enc_in)
        enc_out = encode_tokens(tokens, batch_size=batch_size,
                                concurrency=concurrency,
                                by_source=by_source)
        unit_out = os.path.join(out_dir, f"group={gid}")
        if os.path.isdir(unit_out):
            import shutil

            shutil.rmtree(unit_out)
        enc_out.write_parquet(unit_out)
        agg = ray.data.read_parquet(
            unit_out, columns=["n_tokens", "raw_bytes", "encoded_bytes"]
        ).sum(["n_tokens", "raw_bytes", "encoded_bytes"])
        dt = time.perf_counter() - t0
        metrics = {
            "n_files": len(grp),
            "first_file": grp[0],
            "n_tokens": int(agg["sum(n_tokens)"] or 0),
            "raw_bytes": int(agg["sum(raw_bytes)"] or 0),
            "encoded_bytes": int(agg["sum(encoded_bytes)"] or 0),
            "seconds": dt,
        }
        manifest.mark_done(gid, metrics)
        for k in ("n_tokens", "raw_bytes", "encoded_bytes"):
            run[k] += metrics[k]
        run["seconds"] += dt
    return run


def encode_corpus(in_dir: str, out_dir: str, *,
                  batch_size: int = DEFAULT_BATCH_SIZE,
                  concurrency=None, by_source: bool = False,
                  group_files: int | None = None,
                  file_tasks: bool | None = None) -> dict:
    """Encode every token Parquet file under ``in_dir`` into ``out_dir``,
    skipping groups already recorded in the manifest. Returns run metrics.

    ``group_files``: None (default) = size-aware auto grouping
    (:func:`plan_groups`, ~1 GB or 64 files per resume unit); an int keeps
    the fixed files-per-group behavior.

    ``file_tasks``: read each input file inside its encode task
    (see _encode_write_file_task), so read -> encode -> write fuses into
    single tasks and NO raw token bytes cross the object store.  Default (None):
    on for the shuffle-free paths (plain / by_source="local"), off for
    the sort shuffle (which needs the Dataset exchange anyway).  Measured
    faster at every parallelism level since the chunked bit-packing change
    removed the other fault source; round-1's opposite measurement
    predated that fix."""
    import ray.data

    if file_tasks is None:
        file_tasks = by_source in (False, "", "local")
    manifest = Manifest(out_dir)
    units = list_units(in_dir)
    if group_files is None:
        groups = plan_groups(units)
    else:
        groups = [units[i:i + group_files]
                  for i in range(0, len(units), group_files)]
    done = manifest.completed_units()
    run = {"units_total": len(groups), "units_skipped": 0,
           "n_tokens": 0, "raw_bytes": 0, "encoded_bytes": 0, "seconds": 0.0}
    if file_tasks and by_source in (False, "", "local"):
        return _encode_corpus_single_job(
            groups, done, manifest, out_dir, run,
            batch_size=batch_size, local_group=by_source == "local",
            concurrency=concurrency)
    for grp in groups:
        gid = _group_id(grp)
        if gid in done:
            run["units_skipped"] += 1
            continue
        t0 = time.perf_counter()
        # one block per input file: avoids the SplitBlocks stage, so
        # blocks stay file-sized and far fewer objects cross the store;
        # the encode stage slices blocks into batch_size chunks anyway
        ds = ray.data.read_parquet(
            grp, columns=["doc_id", "tokens", "n_tok", "source"],
            override_num_blocks=len(grp))
        enc = encode_tokens(ds, batch_size=batch_size,
                            concurrency=concurrency, by_source=by_source)
        unit_out = os.path.join(out_dir, f"group={gid}")
        # a previous CRASHED attempt may have left partial files (its
        # manifest row was never published); clear them or the re-run would
        # append duplicate chunks
        if os.path.isdir(unit_out):
            import shutil

            shutil.rmtree(unit_out)
        enc.write_parquet(unit_out)
        # lineage aggregate over the 3 small metric columns of what was just
        # written — a column-pruned local scan (duckdb), touching only those
        # columns' pages, never the payloads.  A group whose inputs were all
        # empty writes no files at all: record zero metrics, don't crash.
        if not glob.glob(os.path.join(unit_out, "*.parquet")):
            row = (0, 0, 0)
        else:
            try:
                import duckdb

                row = duckdb.sql(
                    "SELECT sum(n_tokens), sum(raw_bytes), "
                    "sum(encoded_bytes) "
                    f"FROM '{unit_out}/*.parquet'").fetchone()
            except ImportError:
                agg = ray.data.read_parquet(
                    unit_out,
                    columns=["n_tokens", "raw_bytes", "encoded_bytes"]
                ).sum(["n_tokens", "raw_bytes", "encoded_bytes"])
                row = (agg["sum(n_tokens)"], agg["sum(raw_bytes)"],
                       agg["sum(encoded_bytes)"])
        dt = time.perf_counter() - t0
        metrics = {
            "n_files": len(grp),
            "first_file": grp[0],
            "n_tokens": int(row[0] or 0),
            "raw_bytes": int(row[1] or 0),
            "encoded_bytes": int(row[2] or 0),
            "seconds": dt,
        }
        manifest.mark_done(gid, metrics)
        for k in ("n_tokens", "raw_bytes", "encoded_bytes"):
            run[k] += metrics[k]
        run["seconds"] += dt
    return run


def _adopt_plain_layout(enc_dir: str) -> None:
    """Wrap a plain ``encode_tokens(...).write_parquet`` output (parquet
    files directly under ``enc_dir``, no ``group=*`` dirs) into a single
    ``group=base`` directory so the group-level writers (upsert/compact)
    can include it in the live view.  Without this, an upsert on a plain
    corpus would scan nothing for replacements and its delta group would
    then HIDE every pre-existing doc from :func:`live_groups` readers.

    Idempotent and crash-convergent under the module's single-writer
    assumption: files move one-by-one into the constant-named
    ``group=base.tmp`` (excluded from every live view), and the final
    rename publishes the group only when no plain files remain; a re-run
    after a crash resumes the moves and completes the rename."""
    if glob.glob(os.path.join(enc_dir, "group=*")):
        adopted = os.path.isdir(os.path.join(enc_dir, "group=base")) or \
            os.path.isdir(os.path.join(enc_dir, "group=base.tmp"))
        if not adopted:
            return  # already a group layout with no adoption in flight
    plain = sorted(glob.glob(os.path.join(enc_dir, "*.parquet")))
    tmp = os.path.join(enc_dir, "group=base.tmp")
    base = os.path.join(enc_dir, "group=base")
    if not plain and not os.path.isdir(tmp):
        return
    os.makedirs(tmp, exist_ok=True)
    for p in plain:
        os.rename(p, os.path.join(tmp, os.path.basename(p)))
    if os.path.isdir(base):  # crash between the two renames of a re-run
        for p in glob.glob(os.path.join(tmp, "*.parquet")):
            os.rename(p, os.path.join(base, os.path.basename(p)))
        os.rmdir(tmp)
    else:
        os.rename(tmp, base)


def upsert_corpus(enc_dir: str, delta_ds, *,
                  batch_size: int = DEFAULT_BATCH_SIZE,
                  by_source: bool = False) -> dict:
    """Doc-level upsert into an encoded corpus (LSM-style merge): rows of
    ``delta_ds`` (token-table schema: doc_id, tokens, n_tok, source)
    REPLACE same-doc_id documents already in the corpus and append
    otherwise.

    Scale shape — the delta is the SMALL side by definition (an
    incremental ingest batch against a 100-TB corpus):

    - the delta's doc_id set is collected once, broadcast via ``ray.put``,
      and matched against a metadata-only scan of the corpus's
      (doc_id-list) column with ``include_paths`` — payload bytes of
      untouched chunks never leave storage;
    - only the AFFECTED resume groups (directories holding a replaced
      doc) are decoded -> filtered -> re-encoded, and each is swapped in
      via write-to-``.tmp`` then rename-old-ASIDE (``gdir`` ->
      ``gdir.old``; ``tmp`` -> ``gdir``; delete ``.old``): every crash
      point leaves either the old or the new group fully readable, and
      :func:`recover_groups` / :func:`live_groups` resolve the leftovers;
    - the delta encodes into ONE new group keyed by the hash of its
      doc_id set, so re-running the same upsert is idempotent (the group
      is rewritten in place, never duplicated).

    Returns run metrics (groups_rewritten, docs_replaced, docs_added, ...).
    """
    import shutil

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    from tokrle.pipelines.encode import decode_tokens

    manifest = Manifest(enc_dir)
    recover_groups(enc_dir)  # converge any interrupted prior swap first
    _adopt_plain_layout(enc_dir)  # plain write_parquet output -> group=base
    delta = delta_ds.materialize()  # small side: ids are needed up front
    ids = sorted(set(delta.select_columns(["doc_id"]).to_pandas()["doc_id"]
                     .astype(str)))
    run = {"groups_rewritten": 0, "docs_replaced": 0,
           "docs_added": int(delta.count()), "seconds": 0.0}
    t0 = time.perf_counter()
    if not ids:
        return run
    wanted = pa.array(ids, type=pa.string())
    ref = ray.put(wanted)

    # scan the LIVE view only (post-compaction the pointer is
    # authoritative; superseded member dirs may still exist mid-GC)
    files = [f for g in live_groups(enc_dir)
             for f in sorted(glob.glob(os.path.join(g, "*.parquet")))]

    def find(batch: pa.Table) -> pa.Table:
        w = ray.get(ref)
        col = batch.column("doc_id").combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = col.flatten()
        hit = pc.is_in(flat, value_set=w).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(hit)))
        ends = np.cumsum(lens)
        per_chunk = cs[ends] - cs[ends - lens]
        keep = per_chunk > 0
        return pa.table({
            "path": batch.column("path").filter(pa.array(keep)),
            "n_hit": pa.array(per_chunk[keep], type=pa.int64()),
        })

    hits = pd.DataFrame(columns=["path", "n_hit"])
    if files:
        hits = ray.data.read_parquet(files, columns=["doc_id"],
                                     include_paths=True) \
            .map_batches(find, batch_format="pyarrow").to_pandas()
    run["docs_replaced"] = int(hits["n_hit"].sum()) if len(hits) else 0
    group_dirs = sorted({os.path.dirname(p) for p in hits["path"]}) \
        if len(hits) else []

    def _swap_group(gdir: str, n_files: int) -> None:
        """Crash-safe swap: rename the old group ASIDE (never delete it
        before the replacement is in place).  Every interruption point
        leaves a recoverable state — see recover_groups()/live_groups():
          after rename(gdir -> .old):  base missing, .old = old data
          after rename(tmp -> gdir):   base = new data, .old = garbage
        """
        tmp = gdir + ".tmp"
        # a fully-replaced group encodes to zero rows and writes no
        # files — keep the (empty) dir so the swap still works
        os.makedirs(tmp, exist_ok=True)
        old = gdir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(gdir, old)
        os.rename(tmp, gdir)
        shutil.rmtree(old)
        run["groups_rewritten"] += 1
        gid = os.path.basename(gdir).split("=", 1)[-1]
        manifest.mark_done(gid, {"n_files": n_files,
                                 "upsert_rewrite": True,
                                 "seconds": time.perf_counter() - t0})

    if group_dirs and by_source in (False, "", "local"):
        # ALL affected groups rewrite in ONE Dataset job of fused
        # decode->drop->re-encode->write tasks (one per member file);
        # each group's atomic swap publishes the moment its last file
        # reports — same single-job shape as encode_corpus/compact
        import functools

        group_files = {g: sorted(glob.glob(os.path.join(g, "*.parquet")))
                       for g in group_dirs}
        for g in group_dirs:
            shutil.rmtree(g + ".tmp", ignore_errors=True)
        items = [{"gdir": g, "path": p}
                 for g, fs in group_files.items() for p in fs]
        metrics_ds = ray.data.from_items(
            items, override_num_blocks=len(items)).map_batches(
            functools.partial(_upsert_rewrite_file_task,
                              batch_size=batch_size,
                              local_group=by_source == "local",
                              ids_ref=ref),
            batch_size=1, batch_format="numpy")
        _drain_unit_metrics(
            metrics_ds, "gdir",
            {g: len(fs) for g, fs in group_files.items()},
            lambda g: _swap_group(g, len(group_files[g])))
    else:
        for gdir in group_dirs:
            gfiles = sorted(glob.glob(os.path.join(gdir, "*.parquet")))
            toks = decode_tokens(ray.data.read_parquet(
                gfiles, override_num_blocks=len(gfiles)))

            def drop(batch: pa.Table) -> pa.Table:
                w = ray.get(ref)
                return batch.filter(pc.invert(pc.is_in(
                    batch.column("doc_id"), value_set=w)))

            kept = encode_tokens(
                toks.map_batches(drop, batch_format="pyarrow"),
                batch_size=batch_size, by_source=by_source)
            tmp = gdir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            kept.write_parquet(tmp)
            _swap_group(gdir, len(gfiles))

    h = hashlib.blake2b(digest_size=10)
    for i in ids:
        h.update(i.encode())
        h.update(b"\x00")
    gid = f"upsert-{h.hexdigest()}"
    unit_out = os.path.join(enc_dir, f"group={gid}")
    # write-to-tmp + atomic rename: a half-written delta must never be
    # live (on a pointerless corpus every complete group=* dir is)
    unit_tmp = unit_out + ".tmp"
    shutil.rmtree(unit_tmp, ignore_errors=True)
    shutil.rmtree(unit_out, ignore_errors=True)
    encode_tokens(delta, batch_size=batch_size,
                  by_source=by_source).write_parquet(unit_tmp)
    os.makedirs(unit_tmp, exist_ok=True)  # empty delta still publishes
    os.rename(unit_tmp, unit_out)
    dt = time.perf_counter() - t0
    manifest.mark_done(gid, {"n_files": 0, "first_file": "<delta>",
                             "upsert_delta": True, "seconds": dt})
    # keep the live-group pointer (if compaction created one) in sync:
    # the delta group joins the view atomically
    if os.path.exists(_groups_pointer(enc_dir)):
        names = {os.path.basename(g) for g in live_groups(enc_dir)}
        names.add(os.path.basename(unit_out))
        _publish_groups(enc_dir, sorted(names))
    run["seconds"] = dt
    return run


def _upsert_rewrite_file_task(batch: dict, *, batch_size: int,
                              local_group: bool, ids_ref) -> "pa.Table":
    """Fused upsert-rewrite task: stream-decode one member file of an
    affected group, DROP the replaced doc_ids (the wanted-id set arrives
    once per node via the ``ids_ref`` object-store broadcast), re-encode,
    and write into the group's invisible ``.tmp`` dir.  The driver
    performs the group's crash-safe swap when its last file reports."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from tokrle.state.manifest import _unit_id

    wanted = ray.get(ids_ref)

    def drop(tok: "pa.Table") -> "pa.Table":
        return tok.filter(pc.invert(pc.is_in(tok.column("doc_id"),
                                             value_set=wanted)))

    rows: dict[str, list] = {"gdir": [], "path": [], "seconds": []}
    for gdir, path in zip(batch["gdir"], batch["path"]):
        t0 = time.perf_counter()
        enc_in = pq.read_table(
            path, columns=["codec", "payload", "n_tokens", "row_offsets",
                           "doc_id", "doc_source"])
        parts = _decode_reencode_stream([enc_in], batch_size=batch_size,
                                        local_group=local_group,
                                        filter_fn=drop)
        if parts:
            enc = pa.concat_tables(parts)
            if enc.num_rows:
                tmp_dir = gdir + ".tmp"
                os.makedirs(tmp_dir, exist_ok=True)
                pq.write_table(enc, os.path.join(
                    tmp_dir, f"part-{_unit_id(path)}.parquet"))
        rows["gdir"].append(gdir)
        rows["path"].append(path)
        rows["seconds"].append(time.perf_counter() - t0)
    return pa.table(rows)


def _groups_pointer(enc_dir: str) -> str:
    return os.path.join(enc_dir, "_manifest", "groups.json")


def live_groups(enc_dir: str) -> list[str]:
    """Directories that make up the corpus's CURRENT view.

    If the atomic live-group pointer (written by :func:`compact_corpus`)
    exists it is authoritative; otherwise every ``group=*`` directory is
    live (the pre-compaction layout).  Readers that honor this list are
    immune to the compaction race: the pointer swap is a single
    ``os.replace``, so a reader sees either the old members or the new
    compacted group — never both, never neither.
    """
    import json

    ptr = _groups_pointer(enc_dir)
    if os.path.exists(ptr):
        with open(ptr) as f:
            names = json.load(f)["groups"]
        # read-only crash recovery: an upsert interrupted between its two
        # renames leaves only 'group=<gid>.old' — serve that as the group
        return [p if os.path.isdir(p) else p + ".old"
                for n in names for p in [os.path.join(enc_dir, n)]]
    # exclude '*.tmp' (partial rewrite — must never be read) and '*.old'
    # whose base dir exists (post-swap garbage awaiting GC); an '*.old'
    # with NO base dir is a swap interrupted mid-rename: the old data is
    # the only complete copy, so it IS the live group.
    out = []
    for p in sorted(glob.glob(os.path.join(enc_dir, "group=*"))):
        if not os.path.isdir(p) or p.endswith(".tmp"):
            continue
        if p.endswith(".old"):
            if not os.path.isdir(p[:-len(".old")]):
                out.append(p)
        else:
            out.append(p)
    return out


def recover_groups(enc_dir: str) -> dict:
    """Converge crash leftovers from an interrupted group swap (single
    writer assumed): ``group=<gid>.old`` with a missing base dir is the
    only complete copy — rename it back; with a base dir present it is
    post-swap garbage — delete it; ``group=<gid>.tmp`` is always a
    partial rewrite — delete it.  Idempotent; called by the writers
    (upsert/compact) before mutating.  Readers get the same view without
    mutation via :func:`live_groups`."""
    import shutil

    stats = {"restored": 0, "gc_old": 0, "gc_tmp": 0}
    for p in sorted(glob.glob(os.path.join(enc_dir, "group=*.old"))):
        base = p[:-len(".old")]
        if os.path.isdir(base):
            shutil.rmtree(p, ignore_errors=True)
            stats["gc_old"] += 1
        else:
            os.rename(p, base)
            stats["restored"] += 1
    for p in sorted(glob.glob(os.path.join(enc_dir, "group=*.tmp"))):
        if os.path.basename(p) == "group=base.tmp":
            continue  # adoption staging: holds the ONLY copy of plain
            # files mid-move; _adopt_plain_layout resumes it, never GC
        shutil.rmtree(p, ignore_errors=True)
        stats["gc_tmp"] += 1
    return stats


def _publish_groups(enc_dir: str, names: list[str]) -> None:
    import json

    ptr = _groups_pointer(enc_dir)
    os.makedirs(os.path.dirname(ptr), exist_ok=True)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"groups": sorted(names)}, f)
    os.replace(tmp, ptr)  # atomic commit point


def corpus_files(enc_dir: str) -> list[str] | str:
    """Parquet paths of the corpus's LIVE view — what every reader of an
    encoded dir must scan instead of ``enc_dir`` itself: while an upsert's
    ``group=*.tmp`` exists, or after a crashed ``compact_corpus`` that
    published the pointer but did not finish GC'ing member dirs, the raw
    directory holds superseded/partial groups that would surface
    duplicated or stale docs.  Falls back to ``enc_dir`` when there is no
    group layout (a plain ``encode_tokens(...).write_parquet`` output)."""
    groups = live_groups(enc_dir)
    if not groups:
        return enc_dir
    return [f for g in groups
            for f in sorted(glob.glob(os.path.join(g, "*.parquet")))]


def read_corpus(enc_dir: str, columns: list[str] | None = None):
    """Encoded-corpus Dataset over the LIVE groups only."""
    import ray.data

    return ray.data.read_parquet(corpus_files(enc_dir), columns=columns)


def _compact_bin_task(batch: dict, *, enc_dir: str, batch_size: int,
                      local_group: bool = False) -> "pa.Table":
    """Fused compaction task: stream-decode ALL of one bin's member files,
    re-batch to uniform ``batch_size`` chunks across the whole bin (so
    compression recovers — the point of compaction), encode, and write one
    consolidated file into the bin's invisible ``.tmp`` dir.  The driver
    publishes the atomic view swap when this task's metrics row arrives;
    all bins run in ONE Dataset job at full cluster width."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows: dict[str, list] = {"bin": [], "n_tokens": [],
                             "encoded_bytes": [], "seconds": []}
    for name, files_s in zip(batch["bin"], batch["files"]):
        t0 = time.perf_counter()
        files = [f for f in files_s.split("\x00") if f]
        parts = _decode_reencode_stream(
            (pq.read_table(f, columns=["codec", "payload", "n_tokens",
                                       "row_offsets", "doc_id",
                                       "doc_source"]) for f in files),
            batch_size=batch_size, local_group=local_group)
        tmp_dir = os.path.join(enc_dir, name) + ".tmp"
        os.makedirs(tmp_dir, exist_ok=True)
        n_tok = enc_b = 0
        if parts:
            enc = pa.concat_tables(parts)
            if enc.num_rows:
                import pyarrow.compute as pc

                n_tok = pc.sum(enc.column("n_tokens")).as_py() or 0
                enc_b = pc.sum(enc.column("encoded_bytes")).as_py() or 0
                pq.write_table(enc, os.path.join(tmp_dir,
                                                 "part-000.parquet"))
        rows["bin"].append(name)
        rows["n_tokens"].append(n_tok)
        rows["encoded_bytes"].append(enc_b)
        rows["seconds"].append(time.perf_counter() - t0)
    return pa.table(rows)


def compact_corpus(enc_dir: str, *, target_bytes: int = GROUP_TARGET_BYTES,
                   batch_size: int = DEFAULT_BATCH_SIZE,
                   by_source: bool = False) -> dict:
    """Merge undersized groups (LSM compaction): repeated
    :func:`upsert_corpus` deltas and fully-rewritten groups accumulate
    many small directories; this folds every group under
    ``target_bytes/2`` into consolidated ~``target_bytes`` groups by
    streaming decode -> re-encode (chunks get full batches again, so
    compression recovers too).

    Crash safety (no WAL): (1) the compacted group is written to a fresh
    ``group=compact-...`` dir nobody references, (2) the LIVE-GROUP
    POINTER swaps atomically (``os.replace``) to the new view, (3) member
    dirs are deleted last (pure garbage collection).  A crash at any
    point leaves one consistent view for :func:`read_corpus` readers.
    """
    import shutil

    import ray.data

    from tokrle.pipelines.encode import decode_tokens

    manifest = Manifest(enc_dir)
    recover_groups(enc_dir)  # never let '.old' leftovers enter the pointer
    _adopt_plain_layout(enc_dir)
    groups = live_groups(enc_dir)
    # pin the view BEFORE writing anything: on a pointerless corpus every
    # complete group=* dir is live, so a finished compact dir would be
    # double-counted between its final rename and the pointer publish
    if groups and not os.path.exists(_groups_pointer(enc_dir)):
        _publish_groups(enc_dir, [os.path.basename(g) for g in groups])
    sizes = {g: sum(os.path.getsize(f)
                    for f in glob.glob(os.path.join(g, "*.parquet")))
             for g in groups}
    small = [g for g in groups if sizes[g] < target_bytes // 2]
    run = {"groups_before": len(groups), "groups_after": len(groups),
           "bins": 0, "bytes_compacted": 0, "seconds": 0.0}
    if len(small) < 2:
        return run
    t0 = time.perf_counter()
    # greedy size-aware bin pack over the sorted small groups
    bins: list[list[str]] = []
    cur: list[str] = []
    acc = 0
    for g in small:
        if cur and acc + sizes[g] > target_bytes:
            bins.append(cur)
            cur, acc = [], 0
        cur.append(g)
        acc += sizes[g]
    if cur:
        bins.append(cur)
    bins = [b for b in bins if len(b) >= 2]
    live = set(groups)
    local_group = by_source in ("local",)
    single_job = by_source in (False, "", "local") and bins

    def _finish_bin(new_name: str, members: list[str],
                    n_files: int) -> None:
        """Atomic per-bin publish: rename the finished .tmp, swap the
        live-group pointer, then GC the member dirs."""
        nonlocal live
        new_dir = os.path.join(enc_dir, new_name)
        os.makedirs(new_dir + ".tmp", exist_ok=True)  # empty bin case
        os.rename(new_dir + ".tmp", new_dir)
        live = (live - set(members)) | {new_dir}
        _publish_groups(enc_dir, [os.path.basename(g) for g in live])
        for g in members:
            shutil.rmtree(g, ignore_errors=True)
        manifest.mark_done(new_name.split("=", 1)[1],
                           {"n_files": n_files, "compacted": True,
                            "members": ",".join(os.path.basename(g)
                                                for g in members),
                            "seconds": time.perf_counter() - t0})
        run["bins"] += 1
        run["bytes_compacted"] += sum(sizes[g] for g in members)

    plan: dict[str, tuple[list[str], list[str]]] = {}
    for members in bins:
        h = hashlib.blake2b(digest_size=10)
        for g in members:
            h.update(os.path.basename(g).encode())
            h.update(b"\x00")
        new_name = f"group=compact-{h.hexdigest()}"
        new_dir = os.path.join(enc_dir, new_name)
        files = [f for g in members
                 for f in sorted(glob.glob(os.path.join(g, "*.parquet")))]
        # write-to-tmp + atomic rename: the pointer is pinned (above), so
        # the renamed dir stays invisible until the publish below — and a
        # crash mid-write leaves only a .tmp that recover_groups GCs
        shutil.rmtree(new_dir + ".tmp", ignore_errors=True)
        shutil.rmtree(new_dir, ignore_errors=True)
        plan[new_name] = (members, files)

    if single_job:
        # ALL bins in ONE Dataset job (one fused decode->re-batch->encode
        # ->write task per bin — compaction's full-batch re-chunking is
        # preserved because each task streams its WHOLE bin), with each
        # bin's atomic view swap published the moment its task reports
        import functools

        items = [{"bin": name, "files": "\x00".join(files)}
                 for name, (members, files) in plan.items()]
        metrics_ds = ray.data.from_items(
            items, override_num_blocks=len(items)).map_batches(
            functools.partial(_compact_bin_task, enc_dir=enc_dir,
                              batch_size=batch_size,
                              local_group=local_group),
            batch_size=1, batch_format="numpy")
        def finish(name: str) -> None:
            members, files = plan[name]
            _finish_bin(name, members, len(files))

        _drain_unit_metrics(metrics_ds, "bin",
                            {name: 1 for name in plan}, finish)
    else:
        for new_name, (members, files) in plan.items():
            new_tmp = os.path.join(enc_dir, new_name) + ".tmp"
            if files:
                toks = decode_tokens(ray.data.read_parquet(
                    files, override_num_blocks=len(files)))
                encode_tokens(toks, batch_size=batch_size,
                              by_source=by_source).write_parquet(new_tmp)
            _finish_bin(new_name, members, len(files))
    run["groups_after"] = len(live)
    run["seconds"] = time.perf_counter() - t0
    return run
