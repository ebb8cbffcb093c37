"""Count-Min sketch (functions/cms.py) property oracles, mirroring the
sketch-family test style (test_sketch / test_heavy_hitters / test_bloom):
one-sided error (never underestimates), ε·N additive bound at the
configured confidence, merge == single-pass EXACTLY (linearity), the
distributed per-block build == the whole-stream build, and weighted
inserts."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from etl_pipeline_rdf_star_ray.functions.cms import (
    cms_build,
    cms_build_distributed,
    cms_merge,
    cms_params,
    cms_query,
)


def _zipf_stream(n: int, vocab: int, seed: int) -> pa.Array:
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, n).clip(max=vocab)
    return pa.array([f"tok{r}" for r in ranks])


def test_never_underestimates_and_eps_bound():
    eps, delta = 0.01, 0.01
    w, d = cms_params(eps, delta)
    stream = _zipf_stream(50_000, 5_000, 7)
    sk = cms_build(stream, w, d)
    assert sk.n == 50_000
    import collections

    true = collections.Counter(stream.to_pylist())
    keys = pa.array(list(true))
    est = cms_query(sk, keys)
    t = np.array([true[k] for k in keys.to_pylist()])
    assert (est >= t).all()  # one-sided: NEVER below the true count
    over = est - t
    # ≤ ε·N with prob ≥ 1−δ; allow 5× the nominal failure rate like the
    # bloom test's margin
    assert (over > eps * sk.n).mean() <= 5 * delta
    # unseen keys may only carry collision mass ≤ the same bound
    unseen = cms_query(sk, pa.array([f"unseen{i}" for i in range(1000)]))
    assert (unseen > eps * sk.n).mean() <= 5 * delta


def test_merge_equals_single_pass_exactly():
    w, d = cms_params(0.005, 0.01)
    parts = [_zipf_stream(8_000, 2_000, s) for s in (1, 2, 3)]
    whole = pa.concat_arrays([p for p in parts])
    merged = cms_merge(*[cms_build(p, w, d) for p in parts])
    single = cms_build(whole, w, d)
    assert merged.n == single.n
    assert (merged.counts == single.counts).all()  # linearity: bit-exact
    with pytest.raises(ValueError, match="share"):
        cms_merge(cms_build(parts[0], w, d), cms_build(parts[0], w, d + 1))


def test_distributed_build_matches_whole(ray_session):
    w, d = cms_params(0.01, 0.05)
    stream = _zipf_stream(20_000, 3_000, 11)
    ds = rd.from_arrow(pa.table({"tok": stream})).repartition(6)
    dist = cms_build_distributed(ds, "tok", w, d)
    single = cms_build(stream, w, d)
    assert dist.n == single.n
    assert (dist.counts == single.counts).all()


def test_weighted_and_validation():
    w, d = cms_params(0.01, 0.01)
    vals = pa.array(["a", "b", "a"])
    sk = cms_build(vals, w, d, weights=np.array([5, 2, 1]))
    assert sk.n == 8
    est = cms_query(sk, pa.array(["a", "b"]))
    assert est[0] >= 6 and est[1] >= 2
    with pytest.raises(ValueError, match="non-negative"):
        cms_build(vals, w, d, weights=np.array([1, -1, 0]))
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        cms_params(0, 0.5)
    # r4-advice regression: non-integral float weights must be REJECTED,
    # not silently floored (flooring undercounts → breaks the one-sided
    # never-below-the-true-count guarantee)
    with pytest.raises(ValueError, match="integral"):
        cms_build(vals, w, d, weights=np.array([2.9, 1.0, 1.0]))
    with pytest.raises(ValueError, match="integral"):
        cms_build(vals, w, d, weights=np.array([np.nan, 1.0, 1.0]))
    # integral-VALUED floats are fine (a common benign case)
    sk2 = cms_build(vals, w, d, weights=np.array([5.0, 2.0, 1.0]))
    assert sk2.n == 8
