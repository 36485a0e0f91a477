"""Per-partition lineage records, checkpoint ledger, atomic writes.

The reference's checkpointing is coarse — a last-refresh timestamp file swapped
on success (tr2solr.sh:58,83; parseJSON.pl:413) with idempotency supplied by
content-derived Solr uniqueKeys (parseJSON.pl:330). This engine upgrades that
to per-partition checkpoints per the north rule: every build partition writes
its output atomically (temp file + rename), records a lineage entry (input
description, content-sha digest, doc counts), and a resumed build skips
partitions whose ledger entry and output file both exist — producing a
byte-identical index (tests/test_resume.py).

All records are deterministic (no wall-clock timestamps) so a resumed or
re-run build yields identical bytes.
"""

from __future__ import annotations

import json
import os
import uuid


def atomic_write_bytes(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_write_json(path: str, obj: dict) -> None:
    atomic_write_bytes(path, json.dumps(obj, sort_keys=True, indent=1).encode())


def atomic_write_parquet(path: str, table, compression: str | None = None) -> None:
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    if compression is None:
        pq.write_table(table, tmp)
    else:
        pq.write_table(table, tmp, compression=compression)
    os.replace(tmp, path)


class Ledger:
    """Completion ledger for one build stage: one JSON record per partition."""

    def __init__(self, index_dir: str, stage: str):
        self.dir = os.path.join(index_dir, "ledger", stage)

    def _path(self, partition_id: int) -> str:
        return os.path.join(self.dir, f"part-{partition_id:05d}.json")

    def get(self, partition_id: int, output_path: str | None = None) -> dict | None:
        """Return the record if this partition completed (and its output file
        still exists), else None."""
        p = self._path(partition_id)
        if not os.path.exists(p):
            return None
        if output_path is not None and not os.path.exists(output_path):
            return None
        with open(p) as f:
            return json.load(f)

    def put(self, partition_id: int, record: dict) -> None:
        record = {"partition_id": partition_id, **record}
        atomic_write_json(self._path(partition_id), record)

    def remove(self, partition_id: int) -> None:
        """Forget a partition (its output was deleted — e.g. a doc bucket
        emptied by delete_docs)."""
        p = self._path(partition_id)
        if os.path.exists(p):
            os.remove(p)

    def records(self) -> list[dict]:
        if not os.path.isdir(self.dir):
            return []
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out
