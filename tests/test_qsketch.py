"""Quantile sketch: the N/B rank-error bound holds on adversarial
distributions and arbitrary block splits; merge == concat semantics."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from etl_pipeline_rdf_star_ray.functions.qsketch import (
    batch_summary,
    merge_summaries,
    quantile_sketch,
    summary_quantile,
)


def _rank_err(sorted_vals: np.ndarray, x: float, target: float) -> float:
    """Distance from the target rank to the estimate's rank INTERVAL —
    with heavy ties (zipf) a value occupies a rank range [lo, hi); any
    target inside it is exact."""
    lo = np.searchsorted(sorted_vals, x, side="left")
    hi = np.searchsorted(sorted_vals, x, side="right")
    if lo <= target <= hi:
        return 0.0
    return min(abs(target - lo), abs(target - hi))


def _assert_bound(data: np.ndarray, B: int, blocks: int, ray_session=None):
    ds = rd.from_arrow(pa.table({"x": data})).repartition(blocks)
    qs = (0.01, 0.25, 0.5, 0.75, 0.99)
    out = quantile_sketch(ds, "x", B=B, quantiles=qs).to_pandas()
    s = np.sort(data)
    n = len(s)
    for q, est in zip(out["q"], out["value"]):
        # the estimate's rank interval must be within N/B of the target
        # rank (+ blocks slack for the ±1 discretization per batch summary)
        err = _rank_err(s, est, q * n)
        assert err <= n / B + blocks + 1, (q, est, err, n / B)


def test_bound_uniform_normal_zipf(ray_session):
    rng = np.random.default_rng(5)
    n = 60_000
    for data in (
        rng.uniform(0, 1, n),
        rng.normal(0, 100, n),
        rng.zipf(1.5, n).astype(np.float64),
    ):
        for blocks in (1, 9, 32):
            _assert_bound(data, B=512, blocks=blocks)


def test_merge_matches_whole():
    rng = np.random.default_rng(9)
    data = rng.normal(0, 1, 10_000)
    whole = batch_summary(data, 256)
    parts = [batch_summary(c, 256) for c in np.array_split(data, 5)]
    merged = merge_summaries(parts)
    qs = [0.1, 0.5, 0.9]
    a = summary_quantile(*merge_summaries([whole]), qs)
    b = summary_quantile(*merged, qs)
    s = np.sort(data)
    for q, ea, eb in zip(qs, a, b):
        assert _rank_err(s, ea, q * len(s)) <= len(s) / 256 + 1
        assert _rank_err(s, eb, q * len(s)) <= 5 * len(s) / 256 + 6


def test_grouped_bound(ray_session):
    from etl_pipeline_rdf_star_ray.functions.qsketch import (
        grouped_quantile_sketch,
    )

    rng = np.random.default_rng(17)
    groups = np.repeat(["a", "b", "c"], 8_000)
    vals = np.concatenate(
        [
            rng.uniform(0, 1, 8_000),
            rng.normal(50, 5, 8_000),
            rng.zipf(1.6, 8_000).astype(np.float64),
        ]
    )
    ds = rd.from_arrow(pa.table({"g": groups, "x": vals})).repartition(16)
    out = grouped_quantile_sketch(ds, "g", "x", B=256).to_pandas()
    assert sorted(out["g"].unique()) == ["a", "b", "c"]
    for g, start in (("a", 0), ("b", 8_000), ("c", 16_000)):
        s = np.sort(vals[start : start + 8_000])
        sub = out[out["g"] == g]
        for q, est in zip(sub["q"], sub["value"]):
            assert _rank_err(s, est, q * len(s)) <= len(s) / 256 + 17


def test_small_and_nan_inputs(ray_session):
    ds = rd.from_arrow(
        pa.table({"x": pa.array([3.0, None, 1.0, 2.0], pa.float64())})
    )
    out = quantile_sketch(ds, "x", B=8, quantiles=(0.5,)).to_pandas()
    assert out["value"].tolist() == [2.0]
