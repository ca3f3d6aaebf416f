"""Corpus-level resumable encode: directory of token Parquet -> encoded
Parquet + lineage, restartable at input-file granularity.

Each input file group is one resume unit: read -> encode -> write to
``out_dir/unit=<hash>/`` -> atomically publish a manifest row with the
unit's lineage metrics.  A killed run re-lists the inputs, filters
completed units via the manifest, and continues; finished partitions are
never re-read.  Unit groups run through ONE streaming Dataset pipeline
each, so within a unit Ray Data still pipelines read/encode/write with
backpressure.
"""

from __future__ import annotations

import glob
import os
import time

from tokrle.pipelines.encode import DEFAULT_BATCH_SIZE, encode_tokens
from tokrle.state.manifest import Manifest, _unit_id


def list_units(in_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(in_dir, "*.parquet")))


def encode_corpus(in_dir: str, out_dir: str, *,
                  batch_size: int = DEFAULT_BATCH_SIZE,
                  concurrency=None, by_source: bool = False) -> dict:
    """Encode every token Parquet file under ``in_dir`` into ``out_dir``,
    skipping units already recorded in the manifest. Returns run metrics."""
    import ray.data

    manifest = Manifest(out_dir)
    units = list_units(in_dir)
    pending = manifest.pending(units)
    skipped = len(units) - len(pending)
    run = {"units_total": len(units), "units_skipped": skipped,
           "n_tokens": 0, "raw_bytes": 0, "encoded_bytes": 0, "seconds": 0.0}
    for unit in pending:
        t0 = time.perf_counter()
        ds = ray.data.read_parquet(
            unit, columns=["doc_id", "tokens", "n_tok", "source"])
        enc = encode_tokens(ds, batch_size=batch_size,
                            concurrency=concurrency, by_source=by_source)
        unit_out = os.path.join(out_dir, f"unit={_unit_id(unit)}")
        enc.write_parquet(unit_out)
        # lineage aggregate from the 3 small metric columns of what was just
        # written (column-pruned read; avoids pinning payloads in the store)
        agg = ray.data.read_parquet(
            unit_out, columns=["n_tokens", "raw_bytes", "encoded_bytes"]
        ).sum(["n_tokens", "raw_bytes", "encoded_bytes"])
        dt = time.perf_counter() - t0
        metrics = {
            "path": unit,
            "n_tokens": int(agg["sum(n_tokens)"] or 0),
            "raw_bytes": int(agg["sum(raw_bytes)"] or 0),
            "encoded_bytes": int(agg["sum(encoded_bytes)"] or 0),
            "seconds": dt,
        }
        manifest.mark_done(unit, metrics)
        for k in ("n_tokens", "raw_bytes", "encoded_bytes"):
            run[k] += metrics[k]
        run["seconds"] += dt
    return run
