"""Lake-table reads: current snapshot and point-in-time state.

Ray-native re-expression of the reference's point-in-time addressing
(``batch_manager.get_state_at_batch`` ``batch_manager.py:506-528`` /
``query_at_batch`` ``:530-558``): instead of materializing a pyoxigraph store
for one named graph, we select per-partition version FILES through the
manifest and ``ray.data.read_parquet`` exactly those — a snapshot read never
scans superseded versions.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..schema import concat_evolving
from .manifest import active_versions


def snapshot_files(lake_dir: str, *, at_lsn: int | None = None) -> list[str]:
    recs = active_versions(lake_dir, at_lsn=at_lsn)
    return [os.path.join(lake_dir, r.file) for _, r in sorted(recs.items())]


def read_state(
    lake_dir: str,
    *,
    at_lsn: int | None = None,
    columns: list[str] | None = None,
) -> "rd.Dataset":
    """Streaming dataset over the (point-in-time) snapshot."""
    files = snapshot_files(lake_dir, at_lsn=at_lsn)
    if not files:
        from ..schema import CHANGELOG_SCHEMA

        empty = pa.table(
            {n: [] for n in CHANGELOG_SCHEMA.names if n != "op"},
        ).cast(pa.schema([f for f in CHANGELOG_SCHEMA if f.name != "op"]))
        return rd.from_arrow(empty)
    ds = rd.read_parquet(files, columns=columns)
    # the part=NNNNN directory layout is hive-parsed into a spurious "part"
    # column by the reader; the real partition id is the stored partition_id
    if "part" in ds.schema().names:
        ds = ds.drop_columns(["part"])
    return ds


def state_table(lake_dir: str, *, at_lsn: int | None = None) -> pa.Table:
    """Driver-side materialized snapshot — for tests and small results only
    (schemas across partition files may differ under evolution; widened
    here)."""
    files = snapshot_files(lake_dir, at_lsn=at_lsn)
    if not files:
        return pa.table({})
    tables = [pq.read_table(f) for f in files]
    out = concat_evolving(tables)
    return out.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
