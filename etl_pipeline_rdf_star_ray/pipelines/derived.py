"""Incremental maintenance of the derived RDF-quads view.

The reference re-lifts every batch and accumulates the triples into a
growing graph store (``batch_manager.load_batch_from_file``
``batch_manager.py:231-283``; the store keeps one named graph per batch).
At lake scale, re-lifting the whole transcript state per micro-batch is
O(table) work for O(delta) change — so the Ray-native form is classic
incremental view maintenance: :func:`lift_delta` computes the exact
assert/retract quad stream between two commit watermarks.

Scale shape: the changed-row scan piggybacks on the lake's own partition
assignment (one task reads ONE partition's (A, B) snapshot version pair —
the same shuffle-free layout as ``ops.diff``), so O(changed keys) rows flow
into the lift, never the whole table, and nothing is exchanged.

Delta semantics (row-granular, like the engine's LWW unit): for each
changed ``(conv_id, turn_idx)`` key, the stream retracts every quad lifted
from the OLD row (``delta_op='retract'``) and asserts every quad lifted
from the NEW row (``delta_op='assert'``). Appliers must apply a key's
retracts before its asserts. Conversation-level quads (``ex:Conversation``
type, membership) are re-asserted by every surviving turn of the
conversation, so applying the stream to a quad SET is idempotent and
convergent; a retract only removes a conversation-level quad transiently
if another turn's assert does not restore it — i.e. exactly when the
conversation's last turn was deleted."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from ..schema import KEY_COLUMNS
from ..stages.lift import lift_dataset, transcripts_spec
from ..state import manifest as mf
from .ops import _NON_PAYLOAD

DELTA_ASSERT = "assert"
DELTA_RETRACT = "retract"


def changed_rows(lake_dir: str, lsn_a: int, lsn_b: int | None = None) -> "rd.Dataset":
    """Full rows that differ between the snapshots at two watermarks, with a
    ``delta_op`` column: the OLD row (``retract``) for removed/modified keys
    and the NEW row (``assert``) for added/modified keys. Unchanged keys
    never leave the partition task."""
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
        # same committed version at both watermarks ⇒ delta is empty by
        # construction; skipping keeps the cost O(changed partitions) on
        # mostly-idle lakes (ADVICE r2)
        if not (p in va and p in vb and va[p].file == vb[p].file)
    ]
    if not pairs:
        return rd.from_items([]).limit(0)

    key = list(KEY_COLUMNS)

    def delta_partition(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, row in batch.iterrows():
            a = pq.read_table(row["file_a"]).to_pandas() if row["file_a"] else None
            b = pq.read_table(row["file_b"]).to_pandas() if row["file_b"] else None
            if a is None:
                a = pd.DataFrame(columns=key)
            if b is None:
                b = pd.DataFrame(columns=key)
            payload = sorted((set(a.columns) | set(b.columns)) - _NON_PAYLOAD)
            for df in (a, b):
                for c in payload:
                    if c not in df.columns:
                        df[c] = None
            m = a[key + payload].merge(
                b[key + payload], on=key, how="outer", indicator=True,
                suffixes=("_a", "_b"),
            )
            both = m["_merge"] == "both"
            neq = pd.Series(False, index=m.index)
            for c in payload:
                ca, cb = m[f"{c}_a"], m[f"{c}_b"]
                neq |= ~((ca == cb) | (ca.isna() & cb.isna()))
            retract_mask = (m["_merge"] == "left_only") | (both & neq)
            assert_mask = (m["_merge"] == "right_only") | (both & neq)

            def side(mask, suffix, op):
                out = m.loc[mask, key].copy()
                for c in payload:
                    out[c] = m.loc[mask, f"{c}{suffix}"].values
                out["delta_op"] = op
                return out

            outs.append(side(retract_mask, "_a", DELTA_RETRACT))
            outs.append(side(assert_mask, "_b", DELTA_ASSERT))
        out = pd.concat(outs, ignore_index=True)
        # stable dtypes even when a partition contributes no changes
        return out.astype({"delta_op": str}) if len(out) else out

    return rd.from_items(pairs).map_batches(
        delta_partition, batch_format="pandas", batch_size=1
    )


def lift_delta(
    lake_dir: str,
    lsn_a: int,
    lsn_b: int | None = None,
    spec=None,
) -> "rd.Dataset":
    """Assert/retract quad stream that moves the derived quads view from the
    snapshot at ``lsn_a`` to the one at ``lsn_b`` (default: current).
    ``delta_op`` rides through the lift via ``carry_columns`` — one pass,
    no re-lift of unchanged rows."""
    return lift_dataset(
        changed_rows(lake_dir, lsn_a, lsn_b),
        spec or transcripts_spec(),
        carry_columns=("delta_op",),
    )
