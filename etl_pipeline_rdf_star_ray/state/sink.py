"""Exactly-once partitioned Parquet sink.

The commit step of the lake (SURVEY.md §2.2 "Batch loader" row): write the
partition's new state to a temp file → fsync → sha256 checksum (reference:
``batch_manager.py:261``) → atomic rename → append the manifest commit
record. All names are DETERMINISTIC functions of ``(partition_id, batch_id)``,
so a retried Ray task re-produces byte-identical artifacts and the manifest
marker turns the duplicate commit into a no-op (SURVEY.md §7.5.1) — the
distributed replacement for the reference's "fresh named graph per run +
idempotent ``Store.add``" (``batch_manager.py:231-283``).

Layout: one directory per hash partition (``part=NNNNN/``), one file per
committed version — resumable output: a failed run re-runs only partitions
without a commit marker, and never one giant file.

Multi-node note: commit tasks run on workers, so ``lake_dir`` must be
storage every node can reach (S3/NFS/shared volume) on a real cluster; the
atomic-rename commit protocol maps to S3's put-if-absent or a rename on a
POSIX-consistent shared fs. Single-node /tmp is what this sandbox tests.
"""

from __future__ import annotations

import hashlib
import os
import time
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from .manifest import CommitRecord, commit, has_commit


def partition_dir(lake_dir: str, partition_id: int) -> str:
    return os.path.join(lake_dir, f"part={partition_id:05d}")


def version_file(lake_dir: str, partition_id: int, batch_id: str) -> str:
    return os.path.join(partition_dir(lake_dir, partition_id), f"{batch_id}.parquet")


def _fsync_dir(path: str) -> None:
    """Make a rename/create in ``path`` durable: fsync the directory entry.
    Without this, power loss can persist the manifest record (a different
    directory) while the data-file rename is lost, leaving an active record
    pointing at a missing file (round-1 ADVICE). Best-effort on filesystems
    that reject directory fsync."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:  # pragma: no cover
        return
    try:
        os.fsync(fd)
    except OSError:  # pragma: no cover
        pass
    finally:
        os.close(fd)


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def commit_partition(
    table: pa.Table,
    *,
    lake_dir: str,
    partition_id: int,
    batch_id: str,
    lsn_lo: int,
    lsn_hi: int,
    event_count: int,
    wall_start: float,
) -> CommitRecord:
    """Durably write one partition version and append its commit record.

    Idempotent: if the ``(partition_id, batch_id)`` marker already exists the
    write is skipped entirely and the existing semantics stand.
    """
    rel = os.path.join(f"part={partition_id:05d}", f"{batch_id}.parquet")
    final = os.path.join(lake_dir, rel)
    if has_commit(lake_dir, partition_id, batch_id):
        # a prior attempt fully committed — nothing to do (exactly-once)
        return CommitRecord(
            partition_id=partition_id,
            batch_id=batch_id,
            lsn_lo=lsn_lo,
            lsn_hi=lsn_hi,
            file=rel,
            row_count=table.num_rows,
            event_count=event_count,
            checksum="",
            committed_at="",
            wall_sec=0.0,
            status="duplicate",
        )
    os.makedirs(os.path.dirname(final), exist_ok=True)
    tmp = final + f".tmp-{os.getpid()}"
    pq.write_table(table, tmp, compression="zstd")
    with open(tmp, "rb+") as f:
        f.flush()
        os.fsync(f.fileno())
    checksum = _sha256_file(tmp)
    os.replace(tmp, final)
    _fsync_dir(os.path.dirname(final))  # data rename durable BEFORE the record
    rec = CommitRecord(
        partition_id=partition_id,
        batch_id=batch_id,
        lsn_lo=lsn_lo,
        lsn_hi=lsn_hi,
        file=rel,
        row_count=table.num_rows,
        event_count=event_count,
        checksum=checksum,
        committed_at=datetime.now(timezone.utc).isoformat(),
        wall_sec=time.monotonic() - wall_start,
        status="active",
    )
    commit(lake_dir, rec)
    return rec
