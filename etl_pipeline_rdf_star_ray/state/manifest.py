"""Checkpoint / commit manifest — the durable lineage record of a lake table.

Direct descendant of the reference's ``BatchMetadata`` + ``batches.json``
(``batch_manager.py:35-91`` dataclass; ``batch_manager.py:155-174`` persists
the manifest after every mutation; sha256 checksums at
``batch_manager.py:261``). Differences, driven by distributed execution:

- one commit RECORD per ``(partition_id, batch_id)`` instead of one mutable
  JSON file: each record is written to its own file via atomic
  write-temp-then-rename, so concurrent partition commits never contend and a
  torn write is impossible. Record file name = commit marker — re-committing
  the same (partition, batch) is detected and becomes a no-op (exactly-once
  under Ray task retries, SURVEY.md §7.5.1).
- batch lifecycle (PENDING→ACTIVE→SUPERSEDED, ``batch_manager.py:26-32``) is
  *derived*, not mutated: the active version of a partition is its record
  with the highest ``lsn_hi``; every earlier record is implicitly superseded
  but remains addressable for point-in-time reads
  (``batch_manager.py:506-528``).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class TableMeta:
    """Per-lake-table invariants, fixed at table creation so the
    key→partition mapping stays stable across every later ingest."""

    num_partitions: int = 64
    salt_buckets: int = 8
    hot_convs: list[str] = field(default_factory=list)
    key_hash: str = "xxh64"  # pinned key→partition hash impl (see partition.py)
    format_version: int = 1


@dataclass
class CommitRecord:
    partition_id: int
    batch_id: str
    lsn_lo: int
    lsn_hi: int
    file: str  # relative to lake dir
    row_count: int
    event_count: int
    checksum: str
    committed_at: str
    wall_sec: float
    status: str = "active"


MANIFEST_DIR = "_manifest"
META_FILE = "_meta.json"


def _atomic_write(path: str, data: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_or_create_meta(lake_dir: str, default: TableMeta) -> TableMeta:
    path = os.path.join(lake_dir, META_FILE)
    if os.path.exists(path):
        with open(path) as f:
            return TableMeta(**json.load(f))
    os.makedirs(os.path.join(lake_dir, MANIFEST_DIR), exist_ok=True)
    _atomic_write(path, json.dumps(asdict(default), indent=1))
    return default


def load_meta(lake_dir: str) -> TableMeta:
    with open(os.path.join(lake_dir, META_FILE)) as f:
        return TableMeta(**json.load(f))


def _record_path(lake_dir: str, partition_id: int, batch_id: str) -> str:
    return os.path.join(
        lake_dir, MANIFEST_DIR, f"p{partition_id:05d}-{batch_id}.json"
    )


def commit(lake_dir: str, rec: CommitRecord) -> bool:
    """Append one commit record; returns False (no-op) if the
    ``(partition_id, batch_id)`` marker already exists — the idempotence
    guarantee a retried sink task relies on."""
    path = _record_path(lake_dir, rec.partition_id, rec.batch_id)
    if os.path.exists(path):
        return False
    _atomic_write(path, json.dumps(asdict(rec)))
    return True


def has_commit(lake_dir: str, partition_id: int, batch_id: str) -> bool:
    return os.path.exists(_record_path(lake_dir, partition_id, batch_id))


def load_records(lake_dir: str) -> list[CommitRecord]:
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            out.append(CommitRecord(**json.load(f)))
    return out


def active_versions(
    lake_dir: str, *, at_lsn: int | None = None
) -> dict[int, CommitRecord]:
    """Per-partition active commit record; with ``at_lsn`` the point-in-time
    variant (highest ``lsn_hi <= at_lsn``) — batch-granularity addressing
    exactly like the reference's ``get_state_at_batch``
    (``batch_manager.py:506-528``)."""
    best: dict[int, CommitRecord] = {}
    for rec in load_records(lake_dir):
        if at_lsn is not None and rec.lsn_hi > at_lsn:
            continue
        cur = best.get(rec.partition_id)
        if cur is None or rec.lsn_hi > cur.lsn_hi:
            best[rec.partition_id] = rec
    return best


def watermarks(lake_dir: str) -> dict[int, int]:
    """Per-partition highest committed lsn — the dedup/resume watermark."""
    return {p: r.lsn_hi for p, r in active_versions(lake_dir).items()}
