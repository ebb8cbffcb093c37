"""Streaming hourly rollup: incremental == batch recompute, idempotent
re-apply, late-window merging, HLL user estimates in bound."""

import shutil

import duckdb
import numpy as np
import pyarrow.compute as pc
import pytest
import ray.data as rd

from etl_pipeline_rdf_star_ray.pipelines.rollup import apply_batch, read_rollup

SF = "/root/testdata/sf0.001"


def _events(lo: int, hi: int):
    return rd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "event_type", "ts", "user_id", "value"],
        filter=(pc.field("event_id") >= lo) & (pc.field("event_id") < hi),
    )


@pytest.fixture()
def state_dir(tmp_path):
    d = str(tmp_path / "rollup")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _norm(tbl):
    df = tbl.to_pandas().sort_values(["event_type", "hour"]).reset_index(drop=True)
    return df[["event_type", "hour", "n", "sum_value_c"]]


def test_incremental_equals_recompute(ray_session, state_dir):
    for i, (lo, hi) in enumerate([(0, 300), (300, 700), (700, 10**9)]):
        res = apply_batch(state_dir, _events(lo, hi), f"b{i}")
        assert not res["skipped"]
    got = _norm(read_rollup(state_dir, with_users=False))
    oracle = (
        duckdb.sql(
            f"""SELECT event_type, date_trunc('hour', ts) AS hour,
                count(*)::BIGINT AS n,
                sum(CAST(floor(value*100) AS BIGINT))::BIGINT AS sum_value_c
                FROM '{SF}/events.parquet' GROUP BY 1, 2"""
        )
        .arrow()
        .to_pandas()
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    assert got["n"].tolist() == oracle["n"].tolist()
    assert got["sum_value_c"].tolist() == oracle["sum_value_c"].tolist()
    assert got["hour"].tolist() == oracle["hour"].tolist()


def test_reapply_is_idempotent(ray_session, state_dir):
    apply_batch(state_dir, _events(0, 500), "b0")
    before = _norm(read_rollup(state_dir, with_users=False))
    res = apply_batch(state_dir, _events(0, 500), "b0")
    assert res["skipped"]
    after = _norm(read_rollup(state_dir, with_users=False))
    assert before.equals(after)


def test_late_events_merge_into_old_windows(ray_session, state_dir):
    # apply the LATER half of the log first, then the earlier half — final
    # state must be identical to in-order application (associative merge)
    apply_batch(state_dir, _events(500, 10**9), "late-first")
    apply_batch(state_dir, _events(0, 500), "early-second")
    a = _norm(read_rollup(state_dir, with_users=False))

    other = state_dir + "_ordered"
    apply_batch(other, _events(0, 500), "b0")
    apply_batch(other, _events(500, 10**9), "b1")
    b = _norm(read_rollup(other, with_users=False))
    shutil.rmtree(other, ignore_errors=True)
    assert a.equals(b)


def test_hll_users_within_bound(ray_session, state_dir):
    apply_batch(state_dir, _events(0, 10**9), "all")
    got = read_rollup(state_dir, with_users=True).to_pandas()
    exact = duckdb.sql(
        f"""SELECT event_type, date_trunc('hour', ts) AS hour,
            count(DISTINCT user_id) AS nu
            FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).df()
    m = got.merge(exact, on=["event_type", "hour"])
    assert len(m) == len(got)
    rel = np.abs(m["approx_users"] - m["nu"]) / np.maximum(m["nu"], 1)
    # p=10 → σ≈3.25%; windows are tiny here so linear counting is near-exact
    assert rel.max() < 0.15
