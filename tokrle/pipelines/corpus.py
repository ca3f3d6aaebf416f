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
    return h.hexdigest()


def _encode_file_task(batch: dict, *, batch_size: int,
                      local_group: bool = False) -> "pa.Table":
    """One task = one input file: read the parquet locally inside the task,
    encode it chunk by chunk, emit the encoded rows.  The raw token bytes
    never enter the object store (and with the fused Write, neither does
    anything else: read -> encode -> write happens inside one task) — the
    object store / page-fault path is the scarce resource at scale."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tokrle.pipelines.encode import _encode_batch

    out = []
    for path in batch["path"]:
        table = pq.read_table(path, columns=["doc_id", "tokens", "n_tok",
                                             "source"])
        for start in range(0, len(table), batch_size):
            out.append(_encode_batch(table.slice(start, batch_size),
                                     local_group=local_group))
    return pa.concat_tables(out) if out else _encode_batch(
        pa.table({"doc_id": pa.array([], type=pa.string()),
                  "tokens": pa.array([], type=pa.list_(pa.int32())),
                  "n_tok": pa.array([], type=pa.int32()),
                  "source": pa.array([], type=pa.string())}))


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
    units = [p for p in glob.glob(os.path.join(in_encoded, "**",
                                               "*.parquet"), recursive=True)
             if "_manifest" not in p]
    groups = plan_groups(sorted(units))
    done = manifest.completed_units()
    run = {"units_total": len(groups), "units_skipped": 0,
           "n_tokens": 0, "raw_bytes": 0, "encoded_bytes": 0, "seconds": 0.0}
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
    (see _encode_file_task), so read -> encode -> write fuses into single
    tasks and NO raw token bytes cross the object store.  Default (None):
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
    for grp in groups:
        gid = _group_id(grp)
        if gid in done:
            run["units_skipped"] += 1
            continue
        t0 = time.perf_counter()
        if file_tasks and by_source in (False, "", "local"):
            import functools

            paths = ray.data.from_items(
                [{"path": p} for p in grp],
                override_num_blocks=len(grp))
            enc = paths.map_batches(
                functools.partial(_encode_file_task, batch_size=batch_size,
                                  local_group=by_source == "local"),
                batch_size=1, batch_format="numpy")
        else:
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
        # columns' pages, never the payloads
        try:
            import duckdb

            row = duckdb.sql(
                "SELECT sum(n_tokens), sum(raw_bytes), sum(encoded_bytes) "
                f"FROM '{unit_out}/*.parquet'").fetchone()
        except ImportError:
            agg = ray.data.read_parquet(
                unit_out, columns=["n_tokens", "raw_bytes", "encoded_bytes"]
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
