"""The reference's canonical two-batch change scenario, at row granularity:
update / decrease / no-change / delete / insert across two micro-batches
(``simulate_batch_flow.py:96-274``: Alice 720→735, Bob 680→675, Carol
unchanged, David removed, Eve new) — verified through the durable lake,
diff classification, point-in-time, and value history."""

import pyarrow as pa

from etl_pipeline_rdf_star_ray.pipelines import cdc, ops
from etl_pipeline_rdf_star_ray.state.lake import state_table
import ray.data as rd


def _row(op, lsn, cid, text, score):
    return {
        "op": op, "lsn": lsn, "conv_id": "customers", "turn_idx": cid,
        "role": "record", "text": f"{text} score={score}" if text else None,
        "tool": None, "ts": None,
    }


BATCH1 = [
    _row("insert", 1, 1, "Alice Johnson", 720),
    _row("insert", 2, 2, "Bob Smith", 680),
    _row("insert", 3, 3, "Carol Williams", 750),
    _row("insert", 4, 4, "David Brown", 695),
]
BATCH2 = [
    _row("update", 5, 1, "Alice Johnson", 735),   # improved
    _row("update", 6, 2, "Bob Smith", 675),       # decreased
    _row("update", 7, 3, "Carol Williams", 750),  # no change (same payload)
    _row("delete", 8, 4, None, None),             # account closed
    _row("insert", 9, 5, "Eve Davis", 710),       # new customer
]


def _ds(rows):
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_two_batch_customer_flow(tmp_path):
    lake = str(tmp_path / "lake")
    cdc.ingest(_ds(BATCH1), lake, num_partitions=2, batch_id="batch1")
    cdc.ingest(_ds(BATCH2), lake, num_partitions=2, batch_id="batch2")

    # final state: David gone, Eve present, Alice/Bob updated
    state = {r["turn_idx"]: r["text"] for r in state_table(lake).to_pylist()}
    assert state == {
        1: "Alice Johnson score=735",
        2: "Bob Smith score=675",
        3: "Carol Williams score=750",
        5: "Eve Davis score=710",
    }

    # "what did we know when": point-in-time at batch 1
    then = {r["turn_idx"]: r["text"] for r in state_table(lake, at_lsn=4).to_pylist()}
    assert then[4] == "David Brown score=695" and 5 not in then

    # diff between the two batches classifies exactly like the reference demo
    d = {
        (r["turn_idx"]): r["change_type"]
        for r in ops.diff(lake, 4, 9).take_all()
    }
    assert d == {
        1: "modified", 2: "modified", 3: "unchanged", 4: "removed", 5: "added",
    }

    # value history over the full log
    hist = {
        r["turn_idx"]: (r["n_events"], r["n_versions"], r["n_changes"], r["last_op"])
        for r in ops.value_history(_ds(BATCH1 + BATCH2), num_partitions=2).take_all()
    }
    assert hist[1] == (2, 2, 2, "update")   # two versions, text changed
    assert hist[3] == (2, 2, 1, "update")   # two versions, same text
    assert hist[4] == (2, 1, 1, "delete")
    assert hist[5] == (1, 1, 1, "insert")
