"""Checkpoint manifest + per-partition lineage records.

The reference's resume mechanism is a mutable work queue: a ``processed``
flag per row, flipped in bulk AFTER a successful write
(ingest/pr_meta_store.py:119-139,188-189), plus a sweep pass for leftovers
(:142-194). That pattern cannot work on immutable distributed storage, so
this engine uses the equivalent immutable idiom (SURVEY §4 "Checkpoint /
resume"): per-partition output directories written atomically
(delete → write → commit-marker), with a JSON lineage record per partition
(rows_in, rows_out, checksum, stage, committed_at). Job start = read the
manifest, skip committed partitions. Idempotence comes from deterministic
content (seeded, content-hash ids): recomputing a partition writes
identical rows.

Layout:
    <out_dir>/<stage>/part=<k>/*.parquet     -- partition data
    <out_dir>/_manifest/<stage>-part-<k>.json -- commit marker + lineage
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass


@dataclass
class PartitionRecord:
    partition_id: int
    stage: str
    rows_in: int
    rows_out: int
    checksum: int          # order-independent content checksum
    committed_at: float
    extra: dict | None = None


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def _path(self, stage: str, part: int) -> str:
        return os.path.join(self.manifest_dir, f"{stage}-part-{part}.json")

    def committed(self, stage: str) -> set[int]:
        out = set()
        for name in os.listdir(self.manifest_dir):
            if name.startswith(f"{stage}-part-") and name.endswith(".json"):
                out.add(int(name[len(f"{stage}-part-") : -len(".json")]))
        return out

    def record(self, stage: str, part: int) -> PartitionRecord | None:
        p = self._path(stage, part)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return PartitionRecord(**json.load(f))

    def records(self, stage: str) -> list[PartitionRecord]:
        return [r for k in sorted(self.committed(stage)) if (r := self.record(stage, k))]

    def partition_dir(self, stage: str, part: int) -> str:
        return os.path.join(self.out_dir, stage, f"part={part}")

    def begin_partition(self, stage: str, part: int) -> str:
        """Clear any partial output from a crashed attempt; return the dir."""
        d = self.partition_dir(stage, part)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
        return d

    def commit_partition(
        self,
        stage: str,
        part: int,
        *,
        rows_in: int,
        rows_out: int,
        checksum: int = 0,
        extra: dict | None = None,
    ) -> PartitionRecord:
        rec = PartitionRecord(
            partition_id=part,
            stage=stage,
            rows_in=rows_in,
            rows_out=rows_out,
            checksum=checksum,
            committed_at=time.time(),
            extra=extra,
        )
        tmp = self._path(stage, part) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(rec), f)
        os.replace(tmp, self._path(stage, part))  # atomic commit
        return rec

    def totals(self, stage: str) -> dict[str, int]:
        recs = self.records(stage)
        return {
            "partitions": len(recs),
            "rows_in": sum(r.rows_in for r in recs),
            "rows_out": sum(r.rows_out for r in recs),
        }
