"""Deterministic synthetic transcript-CDC change-log generator.

Descendant of the reference's seeded benchmark-data generator
(``csv_generator/generate_large_dataset.py:100-170``, seed 42) re-expressed as
a Ray Data pipeline: ``ray.data.range(n)`` → ``map_batches`` where **every
field is a pure arithmetic function of the event id** (SplitMix64 mixing), so
the output is identical regardless of block split, parallelism, seed reuse, or
process — the property the exactly-once / resume tests rely on.

Covers every fixture scenario of FIXTURES.md §2: insert-only prefix, updates
overwriting earlier lsns, delete + re-insert, out-of-order keys within a
micro-batch, a hot conversation holding ~``hot_frac`` of all events (skew /
salting test), and late schema evolution (``tool_args`` column present only
when ``with_tool_args=True``, used for chunks past the evolution lsn).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import splitmix64
from ..schema import CHANGELOG_SCHEMA

_ROLES = np.array(["user", "assistant", "system", "tool"], dtype=object)

#: epoch base for synthetic event time: 2026-01-01T00:00:00Z in microseconds
_TS0_US = 1_767_225_600_000_000


def synth_changelog_batch(
    ids: np.ndarray,
    *,
    seed: int = 42,
    n_convs: int = 1_000,
    turns_per_conv: int = 64,
    hot_frac: float = 0.10,
    hot_turns: int = 5_000,
    update_pct: int = 30,
    delete_pct: int = 5,
    with_tool_args: bool = False,
) -> pa.Table:
    """Derive one Arrow change-log batch from raw event ids (= lsn)."""
    lsn = ids.astype(np.int64)
    u = lsn.astype(np.uint64)
    r1 = splitmix64(u ^ np.uint64(seed))
    r2 = splitmix64(r1)
    r3 = splitmix64(r2)

    hot = (r1 % np.uint64(10_000)) < np.uint64(int(hot_frac * 10_000))
    conv_num = (r2 % np.uint64(n_convs)).astype(np.int64)
    turn = np.where(
        hot,
        (r3 % np.uint64(hot_turns)).astype(np.int64),
        (r3 % np.uint64(turns_per_conv)).astype(np.int64),
    ).astype(np.int32)

    conv_id = np.where(
        hot,
        "conv_hot",
        np.char.add("conv_", conv_num.astype("U7")),
    ).astype(object)

    opsel = (r1 >> np.uint64(17)) % np.uint64(100)
    op = np.full(len(lsn), "insert", dtype=object)
    op[opsel < np.uint64(update_pct)] = "update"
    op[opsel >= np.uint64(100 - delete_pct)] = "delete"
    is_del = op == "delete"

    role = _ROLES[(r2 >> np.uint64(9)).astype(np.int64) % 4]
    version = (r3 >> np.uint64(13)) % np.uint64(9_973)
    text = np.char.add(
        np.char.add(
            np.char.add("turn ", turn.astype("U6")),
            np.char.add(" of ", conv_id.astype("U16")),
        ),
        np.char.add(" v", version.astype("U6")),
    ).astype(object)
    tool = np.where(
        role == "tool",
        np.char.add("tool_", ((r1 >> np.uint64(33)) % np.uint64(7)).astype("U2")),
        None,
    )
    ts_us = _TS0_US + lsn * 1_000_000 + (r2 % np.uint64(1_000_000)).astype(np.int64)

    # delete events carry only the key (FIXTURES.md §2)
    role = np.where(is_del, None, role)
    text = np.where(is_del, None, text)
    tool = np.where(is_del, None, tool)

    ts = pa.array(ts_us, type=pa.timestamp("us"))
    if is_del.any():
        import pyarrow.compute as pc

        ts = pc.if_else(pa.array(~is_del), ts, pa.scalar(None, pa.timestamp("us")))

    table = pa.table(
        {
            "op": pa.array(op, type=pa.string()),
            "lsn": pa.array(lsn, type=pa.int64()),
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array(turn, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": ts,
        }
    )
    if with_tool_args:
        targ = np.where(
            (~is_del) & (role == "tool"),
            np.char.add("args_", ((r3 >> np.uint64(29)) % np.uint64(13)).astype("U2")),
            None,
        )
        table = table.append_column("tool_args", pa.array(targ, type=pa.string()))
    return table


def changelog_dataset(
    num_events: int,
    *,
    lsn_start: int = 0,
    seed: int = 42,
    with_tool_args: bool = False,
    override_num_blocks: int | None = None,
    **knobs,
) -> "rd.Dataset":
    """Streaming synthetic change log of ``num_events`` events with lsns
    ``[lsn_start, lsn_start + num_events)``."""

    def make(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy() + lsn_start
        return synth_changelog_batch(
            ids, seed=seed, with_tool_args=with_tool_args, **knobs
        )

    ds = rd.range(num_events, override_num_blocks=override_num_blocks)
    return ds.map_batches(make, batch_format="pyarrow")


def changelog_table(num_events: int, *, lsn_start: int = 0, **kw) -> pa.Table:
    """Driver-side (small!) materialized change log for unit tests."""
    ids = np.arange(lsn_start, lsn_start + num_events, dtype=np.int64)
    t = synth_changelog_batch(ids, **kw)
    assert t.schema.names[: len(CHANGELOG_SCHEMA.names)] == list(
        CHANGELOG_SCHEMA.names
    )
    return t
