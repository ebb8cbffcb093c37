"""Incremental materialized-view maintenance (incremental.refresh_view):
refresh == full recompute on the driver query (sf0.001 oracle), plus the
properties the driver's convergence check cannot see — untouched groups are
taken VERBATIM from the old view (no recompute), full post-delta deletes
vanish, an empty delta returns the old view unchanged, and NULL delta keys
mark nothing."""

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

sys.path.insert(0, "/root/repo/tests")
from oracle_harness import run as oracle_run

from etl_pipeline_rdf_star_ray.pipelines.incremental import refresh_view

SF = "/root/testdata/sf0.001"


def test_driver_query_matches_oracle():
    assert oracle_run(SF, ["conv_stats_refresh"]) == 0


def _view(ds):
    """A tiny per-key view (n rows + sum per conv), driver-side on purpose:
    the pipeline under test is refresh_view, not the aggregate."""
    def agg(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "conv_id" not in df.columns:
            # Ray normalizes fully-filtered inputs to zero-column blocks;
            # real per-key pipelines (map_batches-based) skip those blocks
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="int64"),
                }
            )
        return (
            df.groupby("conv_id", sort=False)
            .agg(n=("v", "size"), s=("v", "sum"))
            .reset_index()
        )

    return rd.from_pandas(agg(ds.to_pandas()))


def _sorted(ds) -> list:
    return sorted(ds.to_pandas().to_dict("records"), key=str)


def test_untouched_rows_come_from_old_view(ray_session):
    """Poison the old view's row for an UNTOUCHED conv: if refresh_view
    recomputed it, the poison would disappear — it must survive verbatim,
    proving untouched groups cost no recompute."""
    state_T = pa.table({"conv_id": ["a", "a", "b"], "v": [1, 2, 10]})
    state_now = pa.table({"conv_id": ["a", "a", "a", "b"], "v": [1, 2, 3, 10]})
    prev = _view(rd.from_arrow(state_T)).map_batches(
        lambda df: df.assign(s=np.where(df["conv_id"] == "b", 999, df["s"])),
        batch_format="pandas",
    )
    delta = rd.from_arrow(pa.table({"conv_id": ["a"], "lsn": [7]}))
    out = refresh_view(
        prev, rd.from_arrow(state_now), delta, _view, key_col="conv_id"
    )
    got = {r["conv_id"]: r for r in out.to_pandas().to_dict("records")}
    assert got["b"]["s"] == 999  # verbatim old row (poison survived)
    assert got["a"]["n"] == 3 and got["a"]["s"] == 6  # recomputed


def test_full_delete_vanishes_and_matches_recompute(ray_session):
    """A conv whose rows all disappeared post-T is dropped; everything else
    equals the full recompute over the current state."""
    state_T = pa.table(
        {"conv_id": ["a", "b", "b", "c"], "v": [1, 5, 6, 9]}
    )
    state_now = pa.table({"conv_id": ["a", "b"], "v": [1, 50]})  # c deleted
    prev = _view(rd.from_arrow(state_T))
    delta = rd.from_arrow(pa.table({"conv_id": ["b", "c"], "x": [0, 0]}))
    out = refresh_view(
        prev, rd.from_arrow(state_now), delta, _view, key_col="conv_id"
    )
    assert _sorted(out) == _sorted(_view(rd.from_arrow(state_now)))


def test_empty_delta_returns_old_view(ray_session):
    state_T = pa.table({"conv_id": ["a", "b"], "v": [1, 2]})
    prev = _view(rd.from_arrow(state_T))
    delta = rd.from_arrow(
        pa.table({"conv_id": pa.array([], pa.string()), "x": pa.array([], pa.int64())})
    )
    out = refresh_view(
        prev, rd.from_arrow(state_T), delta, _view, key_col="conv_id"
    )
    assert _sorted(out) == _sorted(prev)


def test_null_delta_keys_mark_nothing(ray_session):
    """SQL join semantics: a NULL delta key never touches any group — the
    old view passes through even though state changed under a NULL key."""
    state_T = pa.table({"conv_id": ["a", None], "v": [1, 2]})
    state_now = pa.table({"conv_id": ["a", None, None], "v": [1, 2, 3]})
    prev = _view(rd.from_arrow(state_T))
    delta = rd.from_arrow(
        pa.table({"conv_id": pa.array([None], pa.string()), "x": [1]})
    )
    out = refresh_view(
        prev, rd.from_arrow(state_now), delta, _view, key_col="conv_id"
    )
    assert _sorted(out) == _sorted(prev)


def test_random_refresh_equals_recompute(ray_session):
    """Randomized: arbitrary T-split of a multi-conv state + arbitrary
    touched set == full recompute (multi-block both sides)."""
    rng = np.random.default_rng(3)
    convs = [f"c{i}" for i in range(20)]
    n = 400
    full = pa.table(
        {
            "conv_id": pa.array(rng.choice(convs, n)),
            "v": pa.array(rng.integers(0, 100, n), pa.int64()),
        }
    )
    # state at T: drop rows of some convs entirely, halve others
    df = full.to_pandas()
    touched = set(rng.choice(convs, 8, replace=False))
    state_T = df[~df["conv_id"].isin(touched)]
    # current state keeps everything EXCEPT one touched conv fully deleted
    deleted = sorted(touched)[0]
    state_now = df[df["conv_id"] != deleted]
    prev = _view(rd.from_arrow(pa.Table.from_pandas(state_T, preserve_index=False)))
    delta = rd.from_arrow(pa.table({"conv_id": pa.array(sorted(touched))}))
    now_ds = rd.from_arrow(
        pa.Table.from_pandas(state_now, preserve_index=False)
    ).repartition(5)
    out = refresh_view(prev, now_ds, delta, _view, key_col="conv_id")
    assert _sorted(out) == _sorted(
        _view(rd.from_arrow(pa.Table.from_pandas(state_now, preserve_index=False)))
    )
