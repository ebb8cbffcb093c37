"""HyperLogLog sketch: error-bound properties, exact merge associativity,
grouped estimates vs exact distinct counts."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from etl_pipeline_rdf_star_ray.functions.sketch import (
    hll_distinct,
    hll_distinct_grouped,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _vals(n: int, prefix: str = "v") -> pa.Array:
    return pa.array([f"{prefix}{i}" for i in range(n)], pa.string())


@pytest.mark.parametrize("n", [100, 1_000, 20_000, 100_000])
def test_error_bound(n):
    est = hll_estimate(hll_registers(_vals(n), p=14))
    # σ ≈ 1.04/√m ≈ 0.81% at p=14; allow 5σ
    assert abs(est - n) / n < 0.045, (n, est)


def test_duplicates_do_not_inflate():
    a = hll_registers(_vals(5_000))
    dup = hll_registers(pa.array([f"v{i % 5_000}" for i in range(50_000)]))
    assert np.array_equal(a, dup)  # registers are set-semantics


def test_merge_is_union_exact():
    a = hll_registers(_vals(10_000, "a"))
    b = hll_registers(_vals(10_000, "b"))
    both = hll_registers(
        pa.array([f"a{i}" for i in range(10_000)] + [f"b{i}" for i in range(10_000)])
    )
    assert np.array_equal(hll_merge(a, b), both)
    assert np.array_equal(hll_merge(b, a), hll_merge(a, b))  # commutative
    c = hll_registers(_vals(3, "c"))
    assert np.array_equal(
        hll_merge(hll_merge(a, b), c), hll_merge(a, hll_merge(b, c))
    )  # associative


def test_distributed_equals_single_pass(ray_session):
    vals = _vals(30_000)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(8)
    dist = hll_distinct(ds, "x", p=14)
    single = hll_estimate(hll_registers(vals, p=14))
    assert dist == pytest.approx(single)  # identical registers → identical


def test_grouped_matches_exact_within_tolerance(ray_session):
    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["event_type", "user_id"])
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in hll_distinct_grouped(ds, "event_type", "user_id", p=12).take_all()
    }
    import duckdb

    exact = dict(
        duckdb.sql(
            f"SELECT event_type, count(DISTINCT user_id) FROM '{sf}/events.parquet' "
            "GROUP BY event_type"
        ).fetchall()
    )
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) / max(n, 1) < 0.1, (k, n, got[k])  # p=12 → ~1.6% σ
