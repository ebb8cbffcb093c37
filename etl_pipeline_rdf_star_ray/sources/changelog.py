"""Transcript CDC change log deterministically derived from the driver's
``events`` parquet table.

The sandbox provides no real transcripts table, so (per BASELINE.json
``input_hint``) we synthesize one of exactly the required shape
``(conv_id, turn_idx, role, text, tool, ts)`` + CDC envelope ``(op, lsn)``.
The derivation is defined ONCE, twice-expressed: :func:`derive_batch` is the
vectorized Arrow kernel used inside ``map_batches``, and
:data:`CHANGELOG_CTE` is the equivalent DuckDB SQL. The two must stay in
lockstep — every CDC oracle query in ``__ray_entry__.oracle_sql`` builds on
:data:`CHANGELOG_CTE`, so any drift fails the driver's value-hash comparison.

Derivation rules (arithmetic only — nothing engine-specific):

- ``lsn``       = ``event_id``                       (strictly increasing)
- ``op``        = insert/update/delete by ``event_id % 10`` (6/3/1 split)
- ``conv_id``   = ``'conv_hot'`` when ``event_id % 5 == 0`` (20% of events in
                  one hot conversation — the skew/salting scenario), else
                  ``'conv_' || (user_id % 419)``
- ``turn_idx``  = ``event_id % 211``   (prime modulus → key collisions →
                  genuine updates for last-writer-wins)
- ``role``      = enum by ``event_id % 4``
- ``text``      = ``event_type || ' #' || event_id % 97 || ' ' || props``
- ``tool``      = ``'tool_' || event_id % 7`` when role = tool, else NULL
- ``ts``        = the event's ``ts``
- delete events carry only the key: payload columns are NULL
- schema evolution: ``tool_args = 'a' || lsn % 13`` appears only for events
  with ``lsn > tool_args_after`` (late-added column scenario, FIXTURES.md §2)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)

#: DuckDB CTE producing the identical change log from the ``events`` view.
CHANGELOG_CTE = """
changelog_raw AS (
  SELECT
    event_id AS lsn,
    CASE WHEN event_id % 10 < 6 THEN 'insert'
         WHEN event_id % 10 < 9 THEN 'update'
         ELSE 'delete' END AS op,
    CASE WHEN event_id % 5 = 0 THEN 'conv_hot'
         ELSE 'conv_' || CAST(user_id % 419 AS VARCHAR) END AS conv_id,
    CAST(event_id % 211 AS INTEGER) AS turn_idx,
    CASE event_id % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                      WHEN 2 THEN 'system' ELSE 'tool' END AS role0,
    event_type || ' #' || CAST(event_id % 97 AS VARCHAR) || ' ' || props AS text0,
    CASE WHEN event_id % 4 = 3 THEN 'tool_' || CAST(event_id % 7 AS VARCHAR)
         ELSE NULL END AS tool0,
    ts AS ts0
  FROM events
),
changelog AS (
  SELECT op, lsn, conv_id, turn_idx,
         CASE WHEN op = 'delete' THEN NULL ELSE role0 END AS role,
         CASE WHEN op = 'delete' THEN NULL ELSE text0 END AS text,
         CASE WHEN op = 'delete' THEN NULL ELSE tool0 END AS tool,
         CASE WHEN op = 'delete' THEN NULL ELSE ts0 END AS ts
  FROM changelog_raw
)
"""

#: SQL expression for the late ``tool_args`` column (schema evolution oracle)
TOOL_ARGS_SQL = (
    "CASE WHEN lsn > {after} AND op <> 'delete' "
    "THEN 'a' || CAST(lsn % 13 AS VARCHAR) ELSE NULL END"
)


def derive_batch(batch: pa.Table, *, tool_args_after: int | None = None) -> pa.Table:
    """Arrow mirror of :data:`CHANGELOG_CTE` over an ``events`` batch."""
    eid = batch.column("event_id").to_numpy()
    uid = batch.column("user_id").to_numpy()

    m10 = eid % 10
    op = np.full(len(eid), "insert", dtype=object)
    op[(m10 >= 6) & (m10 < 9)] = "update"
    op[m10 >= 9] = "delete"
    is_del = op == "delete"

    conv_id = np.where(
        eid % 5 == 0, "conv_hot", np.char.add("conv_", (uid % 419).astype("U4"))
    ).astype(object)
    turn_idx = (eid % 211).astype(np.int32)
    role = _ROLES[eid % 4]

    etype = batch.column("event_type")
    props = batch.column("props")
    text = pc.binary_join_element_wise(
        etype,
        pa.array(np.char.add("#", (eid % 97).astype("U3")).astype(object), pa.string()),
        props,
        " ",
    )
    tool = np.where(
        eid % 4 == 3, np.char.add("tool_", (eid % 7).astype("U2")), None
    )
    ts = batch.column("ts")

    not_del = pa.array(~is_del)
    null_s = pa.scalar(None, pa.string())
    cols = {
        "op": pa.array(op, pa.string()),
        "lsn": pa.array(eid, pa.int64()),
        "conv_id": pa.array(conv_id, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pc.if_else(not_del, pa.array(role, pa.string()), null_s),
        "text": pc.if_else(not_del, text, null_s),
        "tool": pc.if_else(not_del, pa.array(tool, pa.string()), null_s),
        "ts": pc.if_else(not_del, ts, pa.scalar(None, ts.type)),
    }
    if tool_args_after is not None:
        targ = np.where(
            (~is_del) & (eid > tool_args_after),
            np.char.add("a", (eid % 13).astype("U3")),
            None,
        )
        cols["tool_args"] = pa.array(targ, pa.string())
    return pa.table(cols)


def changelog_from_events(
    sf_dir: str,
    *,
    tool_args_after: int | None = None,
    lsn_lo: int | None = None,
    lsn_hi: int | None = None,
) -> "rd.Dataset":
    """Streaming change log derived from ``{sf_dir}/events.parquet``.

    ``lsn_lo``/``lsn_hi`` bound the half-open lsn range ``[lo, hi)`` with a
    row filter pushed down to the parquet read (prune at the read).
    """
    filt = None
    if lsn_lo is not None:
        filt = pc.field("event_id") >= lsn_lo
    if lsn_hi is not None:
        f2 = pc.field("event_id") < lsn_hi
        filt = f2 if filt is None else filt & f2
    from . import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "props", "ts"],
        filter=filt,
    )
    return ds.map_batches(
        lambda b: derive_batch(b, tool_args_after=tool_args_after),
        batch_format="pyarrow",
    )
