"""Commit filesystem abstraction — the exactly-once protocol's storage seam.

The lake's commit protocol needs exactly two storage primitives:

- ``put_atomic(path, data)``: readers see either nothing or the full bytes
  (never a torn write); last writer wins. Retried tasks write the SAME
  deterministic bytes to the SAME deterministic name, so overwrite is safe.
- ``put_if_absent(path, data)``: atomic create-if-not-exists — the commit
  MARKER primitive. Exactly one of N racing committers returns True; the
  rest observe False and no-op. On S3 this is a conditional write
  (``If-None-Match: *``, natively supported since 2024); on GCS,
  ``x-goods-if-generation-match: 0``; on POSIX, ``link(2)`` of a fully
  fsynced temp file (hard-link creation is atomic and fails with EEXIST).

Everything else in the protocol (deterministic names derived from
``(partition_id, batch_id)``, sha256 checksums, marker-before-visibility
ordering) is pure logic in :mod:`.sink` and works over any implementation.

Two implementations ship:

- :class:`PosixCommitFS` — local disk / NFS / any POSIX-consistent mount;
  fsyncs file and directory so a power loss cannot persist the marker
  without its data (the round-1 ordering bug class).
- :class:`FakeObjectStoreCommitFS` — an in-memory S3 stand-in with
  conditional-write semantics and injectable faults (transient errors,
  crash-after-put, racing winners) used by the exactly-once contract tests.
  It is deliberately NOT durable; it exists so the protocol can be proven
  against object-store semantics (no rename, no directories, eventual
  listing) without a real bucket in this sandbox.

Reference analog: the single-process manifest persistence contract
(``batch_manager.py:155-174``) — re-expressed as storage primitives because
here N commit tasks race from different workers/nodes.
"""

from __future__ import annotations

import os
import threading


class CommitFSError(RuntimeError):
    """Transient storage error; callers may retry the whole commit."""


class PosixCommitFS:
    """POSIX implementation: temp file + fsync + rename/link, directory
    fsync after every namespace change."""

    def _fsync_dir(self, path: str) -> None:
        try:
            fd = os.open(path or ".", os.O_RDONLY)
        except OSError:  # pragma: no cover
            return
        try:
            os.fsync(fd)
        except OSError:  # pragma: no cover
            pass
        finally:
            os.close(fd)

    def _write_tmp(self, path: str, data: bytes) -> str:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        return tmp

    def put_atomic(self, path: str, data: bytes) -> None:
        tmp = self._write_tmp(path, data)
        os.replace(tmp, path)
        self._fsync_dir(os.path.dirname(path))

    def put_if_absent(self, path: str, data: bytes) -> bool:
        tmp = self._write_tmp(path, data)
        try:
            os.link(tmp, path)  # atomic create; EEXIST if a rival won
            created = True
        except FileExistsError:
            created = False
        finally:
            os.remove(tmp)
        if created:
            self._fsync_dir(os.path.dirname(path))
        return created

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def read(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()


class FakeObjectStoreCommitFS:
    """In-memory object store with S3-style conditional writes and fault
    injection, for contract-testing the exactly-once commit protocol.

    Fault hooks (all default off):

    - ``fail_next_puts``: the next N ``put_atomic``/``put_if_absent`` calls
      raise :class:`CommitFSError` BEFORE writing (transient storage error;
      the caller's retry must converge).
    - ``crash_after_data_put``: raise AFTER a successful ``put_atomic``
      (simulates the committing task dying between data write and marker —
      the retry must observe absent marker and redo safely).
    - ``race_marker``: before this store's own ``put_if_absent``, a rival
      committer's marker bytes land first (the conditional write must lose
      and the caller treat the commit as already done).
    """

    def __init__(self) -> None:
        self.objects: dict[str, bytes] = {}
        self.put_log: list[str] = []
        self.fail_next_puts = 0
        self.crash_after_data_put = False
        self.race_marker: bytes | None = None
        self._lock = threading.Lock()

    def _maybe_fail(self) -> None:
        if self.fail_next_puts > 0:
            self.fail_next_puts -= 1
            raise CommitFSError("injected transient storage error")

    def put_atomic(self, path: str, data: bytes) -> None:
        with self._lock:
            self._maybe_fail()
            self.objects[path] = bytes(data)
            self.put_log.append(path)
        if self.crash_after_data_put:
            self.crash_after_data_put = False
            raise CommitFSError("injected crash after data put")

    def put_if_absent(self, path: str, data: bytes) -> bool:
        with self._lock:
            self._maybe_fail()
            if self.race_marker is not None and path not in self.objects:
                self.objects[path] = self.race_marker  # rival wins the race
                self.race_marker = None
                return False
            if path in self.objects:
                return False
            self.objects[path] = bytes(data)
            self.put_log.append(path)
            return True

    def exists(self, path: str) -> bool:
        return path in self.objects

    def read(self, path: str) -> bytes:
        return self.objects[path]


DEFAULT_FS = PosixCommitFS()
