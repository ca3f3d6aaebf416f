"""Checkpoint manifest: resumable encode runs at partition granularity.

The resume unit is an input Parquet file (a deterministic, storage-level
partition).  For each completed unit we write one manifest row
(`_manifest/<unit-hash>.parquet`) carrying the unit's identity plus its
aggregated lineage metrics; on restart, completed units are filtered out of
the input file list BEFORE the read, so finished work is never re-read
(north_rule: "encoded blocks plus per-partition codec-choice lineage and
size/throughput metrics are checkpointed to Parquet so interrupted runs
resume at partition granularity").

The reference has no fault tolerance at all (a failed ray.get kills the
job, ref pyrle/rledict.py:173); this module plus Ray Data's task retries is
the scale-out replacement.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq


def _unit_id(path: str) -> str:
    return hashlib.blake2b(path.encode(), digest_size=10).hexdigest()


@dataclass
class Manifest:
    out_dir: str

    @property
    def manifest_dir(self) -> str:
        return os.path.join(self.out_dir, "_manifest")

    def completed_units(self) -> set[str]:
        d = self.manifest_dir
        if not os.path.isdir(d):
            return set()
        done = set()
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(d, f), columns=["unit"])
                done.update(t.column("unit").to_pylist())
        return done

    def pending(self, units: list[str]) -> list[str]:
        done = self.completed_units()
        return [u for u in units if u not in done]

    def mark_done(self, unit: str, metrics: dict) -> None:
        os.makedirs(self.manifest_dir, exist_ok=True)
        row = {"unit": [unit]}
        for k, v in metrics.items():
            row[k] = [v]
        path = os.path.join(self.manifest_dir, f"{_unit_id(unit)}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.table(row), tmp)
        os.replace(tmp, path)  # atomic publish: crash-safe checkpoint

    def metrics(self) -> pa.Table | None:
        d = self.manifest_dir
        if not os.path.isdir(d):
            return None
        tables = [pq.read_table(os.path.join(d, f))
                  for f in os.listdir(d) if f.endswith(".parquet")]
        return pa.concat_tables(tables) if tables else None
