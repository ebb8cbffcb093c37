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
    #: sample hash vector recorded at table creation; verified at every load
    #: so an environment whose hash impl changed (e.g. a polars upgrade that
    #: alters .hash()) fails loudly instead of silently remapping keys
    hash_probe: list[int] = field(default_factory=list)
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
    # make the rename itself durable: a record that survives power loss
    # while its referenced data file did not would corrupt the manifest
    # (ordering is data-dir fsync → record write → manifest-dir fsync)
    try:
        fd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    except OSError:  # pragma: no cover
        pass


def _verify_hash_probe(meta: TableMeta) -> TableMeta:
    if meta.hash_probe:
        from ..functions.hashing import hash_probe

        now = hash_probe(meta.key_hash)
        if now != meta.hash_probe:
            raise RuntimeError(
                f"lake table was created with key_hash={meta.key_hash!r} whose "
                f"implementation has CHANGED in this environment (probe "
                f"{meta.hash_probe} != {now}); reading it would remap keys to "
                "wrong partitions. Pin the original dependency versions or "
                "rewrite the table."
            )
    return meta


def load_or_create_meta(lake_dir: str, default: TableMeta) -> TableMeta:
    path = os.path.join(lake_dir, META_FILE)
    if os.path.exists(path):
        with open(path) as f:
            return _verify_hash_probe(TableMeta(**json.load(f)))
    if not default.hash_probe:
        from ..functions.hashing import hash_probe

        default.hash_probe = hash_probe(default.key_hash)
    os.makedirs(os.path.join(lake_dir, MANIFEST_DIR), exist_ok=True)
    _atomic_write(path, json.dumps(asdict(default), indent=1))
    return default


def load_meta(lake_dir: str) -> TableMeta:
    with open(os.path.join(lake_dir, META_FILE)) as f:
        return _verify_hash_probe(TableMeta(**json.load(f)))


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


OVERRIDE_PREFIX = "override-"

STATUS_ACTIVE = "active"
STATUS_ARCHIVED = "archived"
STATUS_DELETED = "deleted"


def _load_overrides(lake_dir: str) -> dict[tuple[int, str], str]:
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    out: dict[tuple[int, str], str] = {}
    if not os.path.isdir(mdir):
        return out
    for name in sorted(os.listdir(mdir)):
        if not name.startswith(OVERRIDE_PREFIX) or not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            o = json.load(f)
        out[(o["partition_id"], o["batch_id"])] = o["status"]
    return out


def load_records(lake_dir: str) -> list[CommitRecord]:
    mdir = os.path.join(lake_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    overrides = _load_overrides(lake_dir)
    out = []
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json") or name.startswith(OVERRIDE_PREFIX):
            continue
        with open(os.path.join(mdir, name)) as f:
            rec = CommitRecord(**json.load(f))
        rec.status = overrides.get((rec.partition_id, rec.batch_id), rec.status)
        out.append(rec)
    return out


def batch_ids(lake_dir: str) -> list[str]:
    return sorted({r.batch_id for r in load_records(lake_dir)})


def _set_status(lake_dir: str, batch_id: str, status: str) -> int:
    """Write status-override records for every partition version of a batch
    (append-only, atomic per record — the lifecycle flip is a manifest
    append, never a mutation, SURVEY.md §2.8)."""
    n = 0
    for rec in load_records(lake_dir):
        if rec.batch_id != batch_id:
            continue
        path = os.path.join(
            lake_dir,
            MANIFEST_DIR,
            f"{OVERRIDE_PREFIX}p{rec.partition_id:05d}-{batch_id}.json",
        )
        _atomic_write(
            path,
            json.dumps(
                {
                    "partition_id": rec.partition_id,
                    "batch_id": batch_id,
                    "status": status,
                }
            ),
        )
        n += 1
    return n


def _guard_not_active(lake_dir: str, batch_id: str, verb: str) -> None:
    """Reference guard: cannot archive/delete the ACTIVE batch
    (``batch_manager.py:560-605``)."""
    for pid, rec in active_versions(lake_dir).items():
        if rec.batch_id == batch_id:
            raise ValueError(
                f"cannot {verb} batch {batch_id!r}: it is the active version "
                f"of partition {pid}"
            )


def archive_batch(lake_dir: str, batch_id: str) -> int:
    _guard_not_active(lake_dir, batch_id, "archive")
    return _set_status(lake_dir, batch_id, STATUS_ARCHIVED)


def delete_batch(lake_dir: str, batch_id: str, *, hard: bool = False) -> int:
    """Soft delete marks versions DELETED (excluded from snapshots); hard
    delete also removes the data files (mirrors soft/hard delete,
    ``batch_manager.py:560-605``)."""
    _guard_not_active(lake_dir, batch_id, "delete")
    n = _set_status(lake_dir, batch_id, STATUS_DELETED)
    if hard:
        for rec in load_records(lake_dir):
            if rec.batch_id == batch_id:
                path = os.path.join(lake_dir, rec.file)
                if os.path.exists(path):
                    os.remove(path)
    return n


def active_versions(
    lake_dir: str, *, at_lsn: int | None = None
) -> dict[int, CommitRecord]:
    """Per-partition active commit record; with ``at_lsn`` the point-in-time
    variant (highest ``lsn_hi <= at_lsn``) — batch-granularity addressing
    exactly like the reference's ``get_state_at_batch``
    (``batch_manager.py:506-528``)."""
    best: dict[int, CommitRecord] = {}
    for rec in load_records(lake_dir):
        if rec.status in (STATUS_ARCHIVED, STATUS_DELETED):
            continue
        if at_lsn is not None and rec.lsn_hi > at_lsn:
            continue
        cur = best.get(rec.partition_id)
        # tie-break on commit time: a compaction/resalt rewrite commits the
        # SAME lsn_hi as the version it replaces and must become active
        if cur is None or (rec.lsn_hi, rec.committed_at) > (cur.lsn_hi, cur.committed_at):
            best[rec.partition_id] = rec
    return best


def watermarks(lake_dir: str) -> dict[int, int]:
    """Per-partition highest committed lsn — the dedup/resume watermark."""
    return {p: r.lsn_hi for p, r in active_versions(lake_dir).items()}
