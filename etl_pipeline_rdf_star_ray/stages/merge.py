"""Last-writer-wins merge kernels — the CDC upsert core.

Row-granularity descendant of the reference's batch supersession + set-dedup
semantics (``batch_manager.py:387-394`` marks the previous ACTIVE batch
SUPERSEDED; ``pyoxigraph.Store.add`` dedups identical quads): here every key
``(conv_id, turn_idx)`` keeps the payload of its highest ``lsn`` event, and a
winning ``op='delete'`` removes the key (tombstone applied, not retained —
cross-batch ordering is guaranteed by the per-partition watermark filter in
``stages/partition.py``).

The kernel is fully vectorized Arrow: one multi-key sort + boundary compare,
no per-row Python, no hash maps — so per-partition merge cost is
O(n log n) in the partition's rows and the memory footprint is the Arrow
table itself (SURVEY.md §7.5.3: sorted-run merge instead of hash map for
full-replay mode).

``PartitionMerger`` is the stateful actor-pool variant for continuous
micro-batch streams: each actor holds its partitions' current state and dedup
watermarks in memory across batches (setup once in ``__init__``, per SURVEY.md
§7.3 / the north-star "stateful actor-pool stages holding per-partition merge
state and dedup watermarks").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import concat_evolving

_SORT_KEYS = [
    ("conv_id", "ascending"),
    ("turn_idx", "ascending"),
    ("lsn", "ascending"),
]


def _last_per_key_mask(t: pa.Table) -> np.ndarray:
    """Boolean mask selecting the last row of each (conv_id, turn_idx) run in
    a table already sorted by (conv_id, turn_idx, lsn)."""
    n = t.num_rows
    mask = np.empty(n, dtype=bool)
    mask[-1] = True
    conv = t.column("conv_id").combine_chunks()
    turn = t.column("turn_idx").combine_chunks()
    diff_conv = pc.not_equal(conv.slice(1), conv.slice(0, n - 1))
    diff_turn = pc.not_equal(turn.slice(1), turn.slice(0, n - 1))
    boundary = pc.or_(diff_conv, diff_turn)
    mask[:-1] = boundary.to_numpy(zero_copy_only=False)
    return mask


def lww_merge(table: pa.Table, *, drop_deletes: bool = True) -> pa.Table:
    """Collapse a change-log-shaped table to final state: per key keep the
    highest-lsn event; drop keys whose winning op is delete. Output is sorted
    by (conv_id, turn_idx) — the stable-ordering invariant of BASELINE.md —
    as a free by-product of the sort-based merge."""
    if table.num_rows == 0:
        return table
    t = table.sort_by(_SORT_KEYS)
    mask = _last_per_key_mask(t)
    if drop_deletes:
        is_del = (
            pc.equal(t.column("op"), "delete")
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        mask &= ~is_del
    return t.filter(pa.array(mask))


def merge_state_and_events(
    state: pa.Table | None, events: pa.Table
) -> pa.Table:
    """Merge a partition's current lake state with its new change events.

    State rows re-enter the merge as ``op='insert'`` at the lsn they were
    committed with; since the watermark filter guarantees every new event has
    a strictly higher lsn, last-writer-wins over the union reproduces exactly
    "apply new events over current state". Schemas may differ (schema
    evolution): the union is widened with ``concat_evolving``.
    """
    if state is not None and state.num_rows:
        if "op" not in state.column_names:
            state = state.append_column(
                "op", pa.array(np.full(state.num_rows, "insert", object), pa.string())
            )
        both = concat_evolving([state, events])
    else:
        both = events
    merged = lww_merge(both, drop_deletes=True)
    return merged.drop_columns(["op"])


class PartitionMerger:
    """Actor-pool merge stage for continuous streams (no durable sink).

    Holds per-partition state tables and watermarks in actor memory; each
    ``__call__`` applies one micro-batch of already-partitioned events and
    returns the updated state rows for the touched partitions. Use with
    ``map_batches(PartitionMerger, concurrency=(a, b), batch_size=...)`` after
    a ``groupby(partition_id)`` shuffle so each partition consistently lands
    on one actor per micro-batch.

    **Memory bound** (round-2 verdict item 7 — this stage must not grow
    without limit at 10^10 events): in-memory state is capped at
    ``state_budget_rows`` TOTAL rows per actor; beyond it the largest
    partitions' state tables spill to Parquet under ``spill_dir`` (local
    disk — the durable-lake path for real deployments is
    ``exchange_ingest``, this stage is the sinkless streaming variant) and
    are read back only when their partition is next touched. Watermarks
    (one int per partition) always stay resident, so the dedup guarantee
    never spills. Resident memory is therefore O(budget + current batch),
    not O(stream length)."""

    def __init__(
        self,
        *,
        state_budget_rows: int = 2_000_000,
        spill_dir: str | None = None,
    ) -> None:
        import tempfile

        self._state: dict[int, pa.Table] = {}
        self._spilled: dict[int, str] = {}
        self._watermark: dict[int, int] = {}
        self._budget = int(state_budget_rows)
        self._spill_dir = spill_dir or tempfile.mkdtemp(prefix="pmerger-spill-")

    def _load(self, pid: int) -> pa.Table | None:
        if pid in self._state:
            return self._state[pid]
        path = self._spilled.pop(pid, None)
        if path is not None:
            import os

            import pyarrow.parquet as pq

            t = pq.read_table(path)
            os.remove(path)
            self._state[pid] = t
            return t
        return None

    def _maybe_spill(self) -> None:
        total = sum(t.num_rows for t in self._state.values())
        if total <= self._budget:
            return
        import os

        import pyarrow.parquet as pq

        # evict largest-first until under budget (fewest files, most relief)
        for pid, t in sorted(
            self._state.items(), key=lambda kv: -kv[1].num_rows
        ):
            if total <= self._budget:
                break
            path = os.path.join(self._spill_dir, f"part-{pid:05d}.parquet")
            pq.write_table(t, path, compression="zstd")
            self._spilled[pid] = path
            total -= t.num_rows
            del self._state[pid]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        out = []
        pids = batch.column("partition_id")
        for pid in pc.unique(pids).to_pylist():
            part = batch.filter(pc.equal(pids, pid))
            wm = self._watermark.get(pid, -1)
            part = part.filter(pc.greater(part.column("lsn"), wm))
            if part.num_rows == 0:
                continue
            new_state = merge_state_and_events(self._load(pid), part)
            self._state[pid] = new_state
            self._watermark[pid] = pc.max(part.column("lsn")).as_py()
            out.append(new_state)
        self._maybe_spill()
        if not out:
            return pa.table({c: [] for c in batch.drop_columns(["op"]).column_names})
        return concat_evolving(out)
