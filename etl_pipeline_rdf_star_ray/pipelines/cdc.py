"""The CDC ingest pipeline: change log → partitioned LWW upsert → exactly-once
Parquet lake commit, with checkpoint/resume.

Ray-Data lifecycle (SURVEY.md §3.4): the change log streams through a
stateless partition+watermark ``map_batches`` stage, hash-shuffles once on
``partition_id`` (``groupby``), and each partition group merges with its
current lake version and commits durably *inside the worker task* — only tiny
manifest rows return to the driver. No stage materializes the full dataset.

Replacing (not porting) the reference loop ``batch_cli.py:36-87`` +
``batch_manager.load_batch_from_file`` (``batch_manager.py:231-283``): what
the reference does as "run engine → write whole-store TriG → load file into a
fresh named graph → supersede predecessor" becomes per-partition
copy-on-write versions addressed by a commit manifest.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..schema import MANIFEST_SCHEMA
from ..stages.merge import merge_state_and_events
from ..stages.partition import detect_hot_convs, make_partition_stage
from ..state import manifest as mf
from ..state.lake import read_state, state_table  # noqa: F401  (re-export)
from ..state.sink import commit_partition


def _manifest_table(recs: list[mf.CommitRecord]) -> pa.Table:
    cols = {name: [getattr(r, name) for r in recs] for name in MANIFEST_SCHEMA.names}
    return pa.table(cols, schema=MANIFEST_SCHEMA)


def ingest(
    changelog: "rd.Dataset",
    lake_dir: str,
    *,
    batch_id: str | None = None,
    num_partitions: int = 64,
    salt_buckets: int = 8,
    hot_convs: list[str] | str = "auto",
    coalesce_blocks: int | None = None,
    method: str = "exchange",
    transport: str = "auto",
) -> pa.Table:
    """Apply one micro-batch of change events to the lake table.

    Returns the manifest rows of this ingest (one per touched partition).
    Safe to re-run with the same input: the watermark filter drops all
    already-committed events and nothing is rewritten.

    ``method``: ``"exchange"`` (default) streams batches through the merger
    actor pool (``stages/exchange.py``) — no sort, near-linear scaling;
    ``"shuffle"`` uses ``groupby(partition_id).map_groups`` (simpler, but
    Ray's sort shuffle has a serial phase that caps throughput ~450k
    events/s on this node regardless of CPUs — BASELINE.md).

    ``coalesce_blocks``: shuffle cost scales with map-side block COUNT, not
    bytes — a log read as hundreds of tiny blocks pays quadratic slice
    fan-out in the sort shuffle. Coalescing to ~num_cpus blocks before the
    shuffle cut wall time 5× at 2M events (BENCH notes); size blocks toward
    ``DataContext.target_max_block_size`` at real scale instead.
    """
    default_meta = mf.TableMeta(
        num_partitions=num_partitions, salt_buckets=salt_buckets
    )
    if hot_convs == "auto":
        # decided once, at table creation, then pinned in _meta.json so the
        # key→partition mapping is stable for the table's lifetime
        if not os.path.exists(os.path.join(lake_dir, mf.META_FILE)):
            default_meta.hot_convs = detect_hot_convs(
                changelog, num_partitions=num_partitions
            )
    elif hot_convs:
        default_meta.hot_convs = sorted(hot_convs)

    os.makedirs(lake_dir, exist_ok=True)
    meta = mf.load_or_create_meta(lake_dir, default_meta)
    wm = mf.watermarks(lake_dir)
    active = {p: os.path.join(lake_dir, r.file) for p, r in mf.active_versions(lake_dir).items()}
    if batch_id is None:
        batch_id = f"ingest-{max(wm.values(), default=-1) + 1:020d}"

    exchange = method == "exchange"
    stage = make_partition_stage(
        num_partitions=meta.num_partitions,
        salt_buckets=meta.salt_buckets,
        hot_convs=frozenset(meta.hot_convs),
        watermarks=wm,
        key_hash=meta.key_hash,
        # exchange path: pid-sort inside the fused read→partition task so
        # each event hits the object store exactly once (no clustering copy)
        sort_output=exchange,
    )
    if coalesce_blocks:
        changelog = changelog.repartition(coalesce_blocks)
    partitioned = changelog.map_batches(
        # whole-block batches: one pid-sorted run per block, so the
        # exchange routes O(partitions) slices per block instead of
        # O(partitions x sub-batches)
        stage, batch_format="pyarrow", batch_size=None
    )

    if exchange:
        from ..stages.exchange import exchange_ingest

        recs = exchange_ingest(
            partitioned,
            lake_dir,
            batch_id=batch_id,
            num_partitions=meta.num_partitions,
            active_files=active,
            presorted=True,
            transport=transport,
        )
        return _manifest_table([mf.CommitRecord(**r) for r in recs])

    def merge_commit(group: pa.Table) -> pa.Table:
        t0 = time.monotonic()
        if group.num_rows == 0:
            return _manifest_table([])
        pid = group.column("partition_id")[0].as_py()
        state = None
        prior = active.get(pid)
        if prior is not None:
            state = pq.read_table(prior)
        new_state = merge_state_and_events(state, group)
        lsns = group.column("lsn")
        rec = commit_partition(
            new_state,
            lake_dir=lake_dir,
            partition_id=pid,
            batch_id=batch_id,
            lsn_lo=pc.min(lsns).as_py(),
            lsn_hi=pc.max(lsns).as_py(),
            event_count=group.num_rows,
            wall_start=t0,
        )
        return _manifest_table([rec])

    result = partitioned.groupby("partition_id").map_groups(
        merge_commit, batch_format="pyarrow"
    )
    # manifest rows: one per touched partition — tiny, safe to materialize
    batches = result.take_all()
    if not batches:
        return _manifest_table([])
    return pa.Table.from_pylist(batches, schema=MANIFEST_SCHEMA)


def replay(
    changelog_factory,
    lake_dir: str,
    *,
    lsn_splits: list[int],
    **ingest_kw,
) -> list[pa.Table]:
    """Replay a change log as consecutive micro-batches split at the given
    lsn boundaries. ``changelog_factory(lo, hi)`` must return the dataset for
    the half-open lsn range ``[lo, hi)``; each micro-batch is one durable
    ingest, so a crash resumes from the last committed watermark
    (``resume_from_checkpoint`` = simply calling :func:`replay` again — the
    per-partition watermark filter skips everything already committed)."""
    out = []
    bounds = [0, *lsn_splits]
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        ds = changelog_factory(lo, hi)
        out.append(
            ingest(ds, lake_dir, batch_id=f"b{lo:020d}_{hi:020d}", **ingest_kw)
        )
    return out


def upsert_dataset(
    changelog: "rd.Dataset",
    *,
    num_partitions: int = 64,
    salt_buckets: int = 8,
    hot_convs: list[str] | None = None,
    method: str = "exchange",
) -> "rd.Dataset":
    """Pure streaming upsert with no durable sink: change log → final table
    state as a Dataset (used by queries and as the in-memory flagship path).

    ``method="exchange"`` (default) routes through the block exchange —
    same scale shape as :func:`ingest`, minus the lake; ``"shuffle"`` keeps
    the fully-lazy ``groupby().map_groups`` plan (simpler, but Ray's sort
    shuffle has the documented serial phase — BASELINE.md)."""
    from ..stages.merge import lww_merge

    hot = frozenset(hot_convs or [])
    exchange = method == "exchange"
    stage = make_partition_stage(
        num_partitions=num_partitions,
        salt_buckets=salt_buckets,
        hot_convs=hot,
        sort_output=exchange,
    )
    partitioned = changelog.map_batches(
        # whole-block batches: one pid-sorted run per block, so the
        # exchange routes O(partitions) slices per block instead of
        # O(partitions x sub-batches)
        stage, batch_format="pyarrow", batch_size=None
    )

    if exchange:
        from ..stages.exchange import exchange_upsert

        return exchange_upsert(partitioned, presorted=True)

    def merge_group(group: pa.Table) -> pa.Table:
        return lww_merge(group).drop_columns(["op", "partition_id"])

    return partitioned.groupby("partition_id").map_groups(
        merge_group, batch_format="pyarrow"
    )


def tail_once(log_dir: str, lake_dir: str, **ingest_kw) -> pa.Table:
    """One tailing round over a growing change-log directory: read only rows
    past the lake's minimum committed watermark (row-group pushdown at the
    parquet read), then ingest. The per-partition watermark filter inside
    :func:`ingest` handles the finer-grained dedup — this pre-filter just
    prunes storage I/O (SURVEY.md 'prune at the read')."""
    wm = (
        mf.watermarks(lake_dir)
        if os.path.exists(os.path.join(lake_dir, mf.META_FILE))
        else {}
    )
    # A partition with NO commit record yet has effective watermark -1: after
    # a crash that committed some partitions but never a given partition's
    # first commit, pruning at min(existing watermarks) would filter that
    # partition's events out of the read forever. Only prune when every
    # partition has committed at least once; the per-partition filter inside
    # :func:`ingest` does the exact dedup either way.
    min_wm = -1
    if wm and len(wm) >= mf.load_meta(lake_dir).num_partitions:
        min_wm = min(wm.values())
    ds = rd.read_parquet(log_dir, filter=pc.field("lsn") > min_wm)
    return ingest(ds, lake_dir, **ingest_kw)


def tail(
    log_dir: str,
    lake_dir: str,
    *,
    rounds: int,
    poll_interval: float = 0.0,
    **ingest_kw,
) -> list[pa.Table]:
    """Bounded tailing loop (the reference's incremental-ingest loop,
    ``batch_cli.py:36-87``, one batch per round): each round is one durable
    exactly-once micro-batch; a crashed round resumes on the next call."""
    out = []
    for i in range(rounds):
        out.append(tail_once(log_dir, lake_dir, **ingest_kw))
        if poll_interval and i + 1 < rounds:
            time.sleep(poll_interval)
    return out
