"""Actor-based partition exchange — the scale path for the CDC upsert.

Why not ``groupby(partition_id).map_groups``: measured on this node, Ray
Data's sort-based shuffle of the change log tops out near ~450k events/s
REGARDLESS of CPU count (a serial merge phase dominates; 8→32 CPUs gave only
1.4× — BASELINE.md bench notes). The exchange below has no sort and no
serial coordinator: stateless map tasks split each Arrow batch by partition
id and push sub-tables directly to a pool of long-lived MERGER ACTORS, each
owning a fixed set of lake partitions. This is raw Ray core by design — the
Dataset API cannot express a streaming per-partition mutable merge state
(the case SURVEY.md §7.3 and the brief reserve raw actors for).

Correctness properties:

- **Retry idempotence**: every pushed sub-table carries a deterministic
  chunk id derived from its content (order-independent hash of lsn values +
  partition); a retried map task re-sends identical chunks and the actor
  drops duplicates. The router ``ray.get``s its pushes, so a task only
  succeeds after delivery (and backpressure propagates).
- **Out-of-order arrival**: chunks reach an actor in arbitrary order; the
  actor's incremental compaction keeps per-key argmax(lsn) WITH the winning
  op (tombstones retained), which is associative and commutative — deletes
  are applied against prior lake state only at finalize.
- **Bounded memory**: an actor compacts its buffer whenever it exceeds
  ``compact_rows``, so actor heap is O(live keys per owned partition), not
  O(events) (SURVEY.md §7.5.3).
- **Exactly-once sink**: finalize funnels into the same marker-idempotent
  ``commit_partition`` as the shuffle path.
- **Failure recovery**: an actor lost mid-stream loses only BUFFERED chunks
  (nothing durable happened yet); the ingest raises and a re-run resumes
  from the per-partition watermarks, re-streaming exactly the uncommitted
  events. A crash between two partition commits of the same batch is the
  normal resume case: committed partitions skip via markers + watermarks.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..functions.hashing import splitmix64
from ..schema import concat_evolving
from ..stages.merge import lww_merge, merge_state_and_events
from ..state.sink import commit_partition


def _chunk_id(pid: int, lsns: np.ndarray) -> int:
    """Deterministic, order-independent id of one pushed sub-table.

    Combines XOR with a wrapping mod-2^64 SUM of the per-lsn hashes: XOR
    alone cancels duplicate lsn values pairwise (a changelog from an external
    CDC source need not have unique lsns), so two distinct same-length chunks
    could collide and the second be dropped as a retry duplicate (round-1
    ADVICE). The sum breaks multiset cancellation."""
    hs = splitmix64(lsns.astype(np.uint64))
    x = np.bitwise_xor.reduce(hs)
    s = np.add.reduce(hs)  # uint64 wraps mod 2^64 by design
    return int(
        splitmix64(np.uint64(x) ^ splitmix64(np.uint64(s)))
        ^ splitmix64(np.uint64(pid) ^ np.uint64(len(lsns)))
    )


class MergerActorImpl:
    """Owns a set of lake partitions; accumulates + incrementally compacts
    their change events, then merges with prior state and commits."""

    def __init__(self, lake_dir: str, batch_id: str, active_files: dict[int, str],
                 compact_rows: int = 4_000_000):
        self.lake_dir = lake_dir
        self.batch_id = batch_id
        self.active_files = active_files
        self.compact_rows = compact_rows
        self.chunks: list[pa.Table] = []  # mixed-pid tables, as received
        self.chunk_rows = 0
        self.seen: set[int] = set()

    def add(self, chunk_id: int, table: pa.Table) -> int:
        """Pure append — deliberately does NO compute: during the streaming
        phase every core belongs to the map stage, and a busy actor would
        both stall its (blocked, slot-holding) producers and oversubscribe
        the node. All splitting/merging happens in finalize, where the freed
        map slots give the actor pool full parallelism."""
        if chunk_id in self.seen:
            return 0  # duplicate push from a retried task
        self.seen.add(chunk_id)
        self.chunks.append(table)
        self.chunk_rows += table.num_rows
        if self.chunk_rows >= self.compact_rows:
            self._compact()
        return table.num_rows

    def _compact(self) -> None:
        # memory-bound guard for very large micro-batches: associative
        # pre-merge keeping per-key argmax(lsn) WITH its op (tombstones
        # retained), correct under any chunk arrival order
        merged = lww_merge(concat_evolving(self.chunks), drop_deletes=False)
        self.chunks = [merged]
        self.chunk_rows = merged.num_rows

    def finalize(self) -> list:
        """Split the buffered stream per partition and FAN OUT the merge +
        commit of each partition as detached Ray tasks — finalize
        parallelism is then bounded by the cluster, not by the actor count.
        Returns a list of ObjectRefs to manifest-record dicts."""
        if not self.chunks:
            return []
        all_events = concat_evolving(self.chunks)
        self.chunks = []
        pids = all_events.column("partition_id").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        refs = []
        for pid in np.unique(pids):
            pid = int(pid)
            events = all_events.filter(pa.array(pids == pid))
            refs.append(
                _merge_commit_task.remote(
                    events,
                    self.lake_dir,
                    pid,
                    self.batch_id,
                    self.active_files.get(pid),
                )
            )
        return refs


@ray.remote(num_cpus=1)
def _merge_commit_task(
    events: pa.Table, lake_dir: str, pid: int, batch_id: str, prior: str | None
) -> dict:
    t0 = time.monotonic()
    state = pq.read_table(prior) if prior is not None else None
    new_state = merge_state_and_events(state, events)
    lsns = events.column("lsn")
    rec = commit_partition(
        new_state,
        lake_dir=lake_dir,
        partition_id=pid,
        batch_id=batch_id,
        lsn_lo=pc.min(lsns).as_py(),
        lsn_hi=pc.max(lsns).as_py(),
        event_count=events.num_rows,
        wall_start=t0,
    )
    return rec.__dict__


def make_router(actors: list, num_partitions: int):
    """Stateless map stage: split the partitioned batch by ``partition_id``
    and push each sub-table to its owning merger actor. Returns a tiny
    counts table (the dataset consumer drives the stream)."""
    n_actors = len(actors)

    def route(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"routed": pa.array([0], pa.int64())})
        pids = batch.column("partition_id").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        aids = pids % n_actors
        refs = []
        for a in np.unique(aids):
            # take() materializes a COMPACT copy: a slice would serialize the
            # whole parent string buffer (Arrow IPC keeps un-rebased offsets),
            # amplifying shipped bytes by the number of sub-tables
            idx = np.flatnonzero(aids == a)
            sub = batch.take(pa.array(idx))
            lsns = sub.column("lsn").combine_chunks().to_numpy(zero_copy_only=False)
            cid = _chunk_id(int(a), lsns)
            refs.append(actors[int(a)].add.remote(cid, sub))
        # waiting for delivery makes task success == delivery (retry safety)
        # and applies backpressure to the read stage
        routed = sum(ray.get(refs))
        return pa.table({"routed": pa.array([routed], pa.int64())})

    return route


def exchange_ingest(
    partitioned,  # rd.Dataset already carrying partition_id (watermark-filtered)
    lake_dir: str,
    *,
    batch_id: str,
    num_partitions: int,
    active_files: dict[int, str],
    num_mergers: int | None = None,
    merger_num_cpus: float = 0,
) -> list[dict]:
    """Run the exchange: spawn the merger pool, stream the dataset through
    the router, finalize all actors in parallel. Returns manifest records."""
    if num_mergers is None:
        avail = int(ray.available_resources().get("CPU", 8))
        # few buffer actors (message count = blocks × actors, and actors do
        # no compute during streaming); finalize parallelism comes from the
        # per-partition merge TASKS they spawn, not from the actor count
        num_mergers = max(2, min(num_partitions, avail // 4))
    Merger = ray.remote(num_cpus=merger_num_cpus)(MergerActorImpl)
    actors = [
        Merger.remote(lake_dir, batch_id, active_files) for _ in range(num_mergers)
    ]
    try:
        partitioned.map_batches(
            make_router(actors, num_partitions), batch_format="pyarrow"
        ).count()
        task_refs = []
        for part in ray.get([a.finalize.remote() for a in actors]):
            task_refs.extend(part)
        return ray.get(task_refs)
    finally:
        for a in actors:
            ray.kill(a)
