"""Misra–Gries heavy hitters: the mergeable-summaries guarantee
(presence of every item above N/(m+1), estimates within N/(m+1) below
truth, never above) on adversarial distributions and across arbitrary
block splits."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_pipeline_rdf_star_ray.functions.heavy_hitters import (
    heavy_hitters,
    heavy_terms,
    mg_compress,
    mg_merge,
)


def _zipf_stream(rng, n=20_000, vocab=2_000):
    vals = rng.zipf(1.3, size=n) % vocab
    return np.char.add("t", vals.astype(str))


def test_mg_compress_bound():
    items = np.array([f"i{j}" for j in range(100)])
    counts = np.arange(1, 101, dtype=np.int64)
    out_i, out_c = mg_compress(items, counts, 10)
    assert len(out_i) <= 10
    # survivors are the largest counters, decremented by the 11th largest
    assert set(out_i) == {f"i{j}" for j in range(90, 100)}
    assert out_c.tolist() == [c - 90 for c in range(91, 101)]


def test_guarantee_on_zipf_any_split(ray_session):
    rng = np.random.default_rng(7)
    stream = _zipf_stream(rng)
    n = len(stream)
    m = 64
    truth = pd.Series(stream).value_counts()
    for blocks in (1, 7, 32):
        ds = rd.from_arrow(pa.table({"v": stream})).repartition(blocks)
        got = heavy_hitters(ds, "v", m=m).to_pandas().set_index("item")["count_lo"]
        bound = n / (m + 1)
        # presence: every true heavy hitter above the bound is reported
        for item, c in truth[truth > bound].items():
            assert item in got.index, (blocks, item, c)
        # estimates: lower bounds within the bound, never overcounts
        for item, est in got.items():
            true_c = int(truth.get(item, 0))
            assert est <= true_c
            assert true_c - est <= bound + 1e-9


def test_merge_matches_single_pass():
    rng = np.random.default_rng(11)
    stream = _zipf_stream(rng, n=5_000, vocab=300)
    m = 32
    vc = pd.Series(stream).value_counts()
    single = mg_compress(vc.index.to_numpy(), vc.to_numpy(), m)
    # split into 4 chunks, compress each, merge
    chunks = np.array_split(stream, 4)
    parts = []
    for ch in chunks:
        v = pd.Series(ch).value_counts()
        parts.append(mg_compress(v.index.to_numpy(), v.to_numpy(), m))
    merged = mg_merge(parts, m)
    bound = len(stream) / (m + 1)
    s = dict(zip(*single))
    mg = dict(zip(*merged))
    for item, c in vc.items():
        true_c = int(c)
        for est_map in (s, mg):
            est = est_map.get(item, 0)
            assert est <= true_c
            assert true_c - est <= bound + 1e-9


def test_heavy_terms_agrees_with_exact_top(ray_session):
    # deterministic corpus where heavy terms are unambiguous
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(50)), pa.int64()),
            "text": pa.array(
                ["alpha beta alpha"] * 30
                + ["gamma beta"] * 15
                + ["delta epsilon zeta"] * 5
            ),
        }
    )
    got = heavy_terms(rd.from_arrow(docs), m=8, k=3).to_pandas()
    assert got["item"].tolist()[:2] == ["alpha", "beta"]
    # with m far above the vocab size, counts are exact
    assert got["count_lo"].tolist()[:2] == [60, 45]
