"""Streaming windowed aggregate: an hourly rollup maintained INCREMENTALLY
across micro-batches / tailing rounds — the brief's "streaming window"
operator.

Unlike :func:`~.analytics.events_hourly` (batch recompute), this keeps a
small versioned state table ``(event_type, hour, n, sum_value_c, users_hll)``
and folds each new log segment into it:

- **partial aggregation is distributed**: each ``map_batches`` task collapses
  its batch to per-window rows (counts, int-cent sums, HLL registers for
  distinct users) — only window partials leave the tasks, never events.
- **merge is associative**: counts/sums add, HLL registers take elementwise
  max — so the fold is order-insensitive across segments and safe to
  re-apply per batch id (idempotence recorded in ``_rollup.json``).
- **windows never close**: late events merge into their (old) window on
  arrival; reading the rollup at any time gives counts over everything
  ingested so far. Emission policy is therefore the reader's (this matches
  the lake's point-in-time philosophy, not a hard watermark eviction).
- **state size** is windows × ~1 KiB (p=10 HLL), independent of event
  count — driver-merged, versioned parquet, atomic rename commit (same
  temp→fsync→rename discipline as ``state/sink.py``).

Exactly-once: ``apply_batch`` is a no-op for an already-applied
``batch_id``; a crash after the data file but before the meta update leaves
an orphan version file that the retry overwrites.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.sketch import hll_estimate, hll_registers_from_hashes
from ..functions.hashing import hash64_column

META = "_rollup.json"
HLL_P = 10
_M = 1 << HLL_P


def _window_partials(events) -> pd.DataFrame:
    """Distributed partial aggregation: per-window (count, cent-sum, HLL
    registers) rows per batch, merged driver-side (windows are few)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch.column("event_type").to_pylist(),
                "hour": pc.floor_temporal(
                    batch.column("ts"), unit="hour"
                ).to_pylist(),
                "value_c": pc.cast(
                    pc.floor(pc.multiply(batch.column("value"), 100.0)),
                    pa.int64(),
                ).to_numpy(zero_copy_only=False),
                "uh": hash64_column(batch.column("user_id").cast(pa.string())),
            }
        )
        rows = []
        for (et, hr), g in df.groupby(["event_type", "hour"], sort=False):
            regs = hll_registers_from_hashes(
                g["uh"].to_numpy().astype(np.uint64), HLL_P
            )
            rows.append(
                (et, hr, len(g), int(g["value_c"].sum()), regs.tobytes())
            )
        out = pd.DataFrame(
            rows, columns=["event_type", "hour", "n", "sum_value_c", "users_hll"]
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    import ray

    blocks = [
        b
        for b in ray.get(
            events.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        )
        if b.num_rows
    ]
    if not blocks:
        return pd.DataFrame(
            columns=["event_type", "hour", "n", "sum_value_c", "users_hll"]
        )
    return _merge_frames(
        pa.concat_tables(blocks, promote_options="permissive").to_pandas()
    )


def _merge_frames(df: pd.DataFrame) -> pd.DataFrame:
    def fold(g: pd.DataFrame) -> pd.Series:
        regs = np.maximum.reduce(
            [np.frombuffer(b, dtype=np.uint8) for b in g["users_hll"]]
        )
        return pd.Series(
            {
                "n": int(g["n"].sum()),
                "sum_value_c": int(g["sum_value_c"].sum()),
                "users_hll": regs.tobytes(),
            }
        )

    out = (
        df.groupby(["event_type", "hour"], sort=False)
        .apply(fold, include_groups=False)
        .reset_index()
    )
    out["n"] = out["n"].astype(np.int64)
    out["sum_value_c"] = out["sum_value_c"].astype(np.int64)
    return out


def _load_meta(state_dir: str) -> dict:
    path = os.path.join(state_dir, META)
    if not os.path.exists(path):
        return {"version": 0, "applied": []}
    with open(path) as fh:
        return json.load(fh)


def _store_meta(state_dir: str, meta: dict) -> None:
    tmp = os.path.join(state_dir, META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(state_dir, META))


def _state_path(state_dir: str, version: int) -> str:
    return os.path.join(state_dir, f"rollup_v{version:06d}.parquet")


def apply_batch(state_dir: str, events, batch_id: str) -> dict:
    """Fold one log segment into the rollup. Idempotent per ``batch_id``."""
    os.makedirs(state_dir, exist_ok=True)
    meta = _load_meta(state_dir)
    if batch_id in meta["applied"]:
        return {"skipped": True, "version": meta["version"]}

    part = _window_partials(events)
    if meta["version"] > 0:
        prev = pq.read_table(_state_path(state_dir, meta["version"])).to_pandas()
        part = _merge_frames(pd.concat([prev, part], ignore_index=True))

    new_version = meta["version"] + 1
    tmp = _state_path(state_dir, new_version) + ".tmp"
    tbl = pa.Table.from_pandas(part, preserve_index=False)
    # pandas round-trips can narrow timestamps — pin the window type
    hour_idx = tbl.column_names.index("hour")
    tbl = tbl.set_column(
        hour_idx, "hour", tbl.column("hour").cast(pa.timestamp("us"))
    )
    pq.write_table(tbl, tmp)
    with open(tmp, "rb") as fh:
        os.fsync(fh.fileno())
    os.replace(tmp, _state_path(state_dir, new_version))
    meta = {"version": new_version, "applied": meta["applied"] + [batch_id]}
    _store_meta(state_dir, meta)
    return {"skipped": False, "version": new_version, "windows": len(part)}


def read_rollup(state_dir: str, *, with_users: bool = True) -> pa.Table:
    """Current rollup: exact counts/sums (+ HLL distinct-user estimates)."""
    meta = _load_meta(state_dir)
    if meta["version"] == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "hour": pa.array([], pa.timestamp("us")),
                "n": pa.array([], pa.int64()),
                "sum_value_c": pa.array([], pa.int64()),
            }
        )
    df = pq.read_table(_state_path(state_dir, meta["version"])).to_pandas()
    if with_users:
        df["approx_users"] = [
            int(round(hll_estimate(np.frombuffer(b, dtype=np.uint8))))
            for b in df["users_hll"]
        ]
    tbl = pa.Table.from_pandas(
        df.drop(columns=["users_hll"]), preserve_index=False
    )
    hour_idx = tbl.column_names.index("hour")
    return tbl.set_column(
        hour_idx, "hour", tbl.column("hour").cast(pa.timestamp("us"))
    )
