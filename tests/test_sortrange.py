"""Range-partitioned distributed sort (stages/sortrange.sort_global):
global total order across OUTPUT BLOCK boundaries — the property the
order-insensitive driver compare cannot see — plus multiset preservation,
NULLS LAST, string keys, 2^53 exactness and degenerate splits."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from etl_pipeline_rdf_star_ray.stages.sortrange import sort_global


def _blocks(ds) -> list[pa.Table]:
    return [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]


def _assert_global_order(tabs: list[pa.Table], keys: list[str]) -> pa.Table:
    """Concatenated blocks must be non-decreasing on the key tuple with
    nulls last — checked ACROSS block boundaries, not per block."""
    cat = pa.concat_tables(tabs)
    rows = list(zip(*(cat.column(k).to_pylist() for k in keys)))

    def sortkey(r):
        return tuple((v is None, v) for v in r)

    assert rows == sorted(rows, key=sortkey), "global order violated"
    return cat


def test_sort_global_int_keys_multiset_and_nulls(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1000, size=5000).astype(object)
    vals[::97] = None  # sprinkle nulls
    t = pa.table(
        {
            "k": pa.array(list(vals), pa.int64()),
            "v": pa.array(range(5000), pa.int64()),
        }
    )
    parts = [t.slice(i * 500, 500) for i in range(10)]
    out = sort_global(rd.from_arrow(parts), keys=["k", "v"], num_shards=8)
    tabs = _blocks(out)
    assert len(tabs) > 1, "test must exercise multiple output blocks"
    cat = _assert_global_order(tabs, ["k", "v"])
    assert sorted(cat.column("v").to_pylist()) == list(range(5000))
    # nulls are last
    ks = cat.column("k").to_pylist()
    first_null = next(i for i, x in enumerate(ks) if x is None)
    assert all(x is None for x in ks[first_null:])


def test_sort_global_string_keys(ray_session):
    words = ["pear", None, "apple", "fig", "apple", "kiwi", "banana", "fig"]
    t = pa.table(
        {"k": pa.array(words, pa.string()), "v": list(range(len(words)))}
    )
    out = sort_global(
        rd.from_arrow([t.slice(0, 4), t.slice(4)]), keys=["k", "v"],
        num_shards=3,
    )
    cat = _assert_global_order(_blocks(out), ["k", "v"])
    assert cat.column("k").to_pylist() == [
        "apple", "apple", "banana", "fig", "fig", "kiwi", "pear", None,
    ]


def test_sort_global_equal_first_keys_colocate_tiebreak(ray_session):
    # every row shares the first key: the whole dataset lands in one range
    # shard and the secondary key produces the total order
    t = pa.table(
        {
            "k": pa.array([7] * 100, pa.int64()),
            "v": pa.array(np.random.default_rng(3).permutation(100)),
        }
    )
    out = sort_global(
        rd.from_arrow([t.slice(0, 50), t.slice(50)]), keys=["k", "v"],
        num_shards=4,
    )
    cat = _assert_global_order(_blocks(out), ["k", "v"])
    assert cat.column("v").to_pylist() == list(range(100))


def test_sort_global_bigint_exact_beyond_2_53(ray_session):
    base = 2**53
    # adjacent bigints that collide in float64 must stay distinct and ordered
    ks = [base + 1, base, base + 3, base + 2, base + 1, None]
    t = pa.table(
        {"k": pa.array(ks, pa.int64()), "v": list(range(len(ks)))}
    )
    out = sort_global(
        rd.from_arrow([t.slice(0, 3), t.slice(3)]), keys=["k", "v"],
        num_shards=2,
    )
    cat = _assert_global_order(_blocks(out), ["k", "v"])
    assert cat.column("k").to_pylist() == [
        base, base + 1, base + 1, base + 2, base + 3, None,
    ]


def test_sort_global_validates_keys(ray_session):
    ds = rd.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError):
        sort_global(ds, keys=[])
