"""Distributed DISTINCT set operations (SQL EXCEPT / INTERSECT —
stages/setops.distinct_set_op): DuckDB parity on hand-built multi-block
frames covering the semantics joins do NOT share (NULL equals NULL,
DISTINCT output), type exactness (int64 ≥ 2^53, timestamps), right-side
column alignment, and the two driver queries against their exact oracles
at sf0.001."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

sys.path.insert(0, "/root/repo/tests")
from oracle_harness import run as oracle_run

from etl_pipeline_rdf_star_ray.stages.setops import distinct_set_op

SF = "/root/testdata/sf0.001"


def test_driver_queries_match_oracles():
    assert oracle_run(SF, ["except_event_pairs", "intersect_event_pairs"]) == 0


def _collect(ds) -> pa.Table:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs, promote_options="default")


def _rows(tbl) -> list:
    if isinstance(tbl, pa.Table):
        recs = tbl.to_pylist()
    else:
        recs = tbl.to_df().to_dict("records") if hasattr(tbl, "to_df") else tbl
    return sorted((sorted(r.items()) for r in recs), key=str)


def _duck(l: pa.Table, r: pa.Table, op: str) -> pa.Table:
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    cols = ", ".join(f'"{c}"' for c in l.column_names)
    return con.sql(
        f"SELECT {cols} FROM l {op.upper()} SELECT {cols} FROM r"
    ).arrow()


@pytest.mark.parametrize("op", ["except", "intersect"])
def test_null_semantics_and_distinct(op, ray_session):
    """Set-op NULL semantics: an all-NULL row on both sides is removed by
    EXCEPT and kept (once) by INTERSECT — the opposite of join NULL-key
    behavior; duplicate left rows collapse to one output row."""
    l = pa.table(
        {
            "a": pa.array([1, 1, 2, None, 3, 3, None], pa.int64()),
            "b": ["x", "x", "y", None, "z", "z", "q"],
        }
    )
    r = pa.table(
        {"a": pa.array([2, None, 9], pa.int64()), "b": ["y", None, "w"]}
    )
    got = _collect(
        distinct_set_op(
            rd.from_arrow(l).repartition(3),
            rd.from_arrow(r).repartition(2),
            op=op,
        )
    )
    assert _rows(got) == _rows(_duck(l, r, op))


@pytest.mark.parametrize("op", ["except", "intersect"])
def test_exact_types_survive(op, ray_session):
    """int64 identities beyond 2^53 and timestamp[us] columns round-trip
    exactly (no float coercion, no ns drift) and the output schema equals
    the left schema."""
    l = pa.table(
        {
            "a": pa.array([2**53 + 1, 2**53 + 2, None, 5], pa.int64()),
            "ts": pa.array([1, 2, 3, None], pa.timestamp("us")),
            "b": ["x", "y", None, "z"],
        }
    )
    r = pa.table(
        {
            "a": pa.array([2**53 + 2, None, 7], pa.int64()),
            "ts": pa.array([2, 3, 9], pa.timestamp("us")),
            "b": ["y", None, "w"],
        }
    )
    got = _collect(
        distinct_set_op(
            rd.from_arrow(l).repartition(2),
            rd.from_arrow(r).repartition(2),
            op=op,
        )
    )
    assert got.schema.types == l.schema.types
    assert _rows(got) == _rows(_duck(l, r, op))
    if op == "except":
        # the 2^53+1 row must survive AS 2^53+1 (a float64 round-trip would
        # alias it onto 2^53+2 and EXCEPT would wrongly drop it)
        assert 2**53 + 1 in got.column("a").to_pylist()


def test_right_columns_aligned_and_cast(ray_session):
    """Right side may order its columns differently and use narrower
    types — they are aligned to the left schema before comparison."""
    l = pa.table({"a": pa.array([1, 2, 3], pa.int64()), "b": ["x", "y", "z"]})
    r = pa.table({"b": ["y"], "a": pa.array([2], pa.int32())})
    got = _collect(
        distinct_set_op(rd.from_arrow(l), rd.from_arrow(r), op="except")
    )
    assert sorted(got.column("a").to_pylist()) == [1, 3]


def test_mismatched_columns_rejected(ray_session):
    l = rd.from_arrow(pa.table({"a": [1]}))
    r = rd.from_arrow(pa.table({"z": [1]}))
    with pytest.raises(ValueError, match="share column names"):
        distinct_set_op(l, r, op="except")
    with pytest.raises(ValueError, match="op must be"):
        distinct_set_op(l, l, op="union")


def test_random_frames_match_duckdb(ray_session):
    """Randomized multi-block parity: values drawn from a small domain so
    both sides overlap heavily, nulls everywhere, both ops."""
    rng = np.random.default_rng(11)

    def mk(n):
        a = rng.integers(0, 6, n).astype(np.int64)
        b = rng.choice(["p", "q", "r"], n).astype(object)
        a_null = rng.random(n) < 0.2
        b_null = rng.random(n) < 0.2
        return pa.table(
            {
                "a": pa.array(
                    pd.array(np.where(a_null, pd.NA, a), dtype="Int64")
                ),
                "b": pa.array(np.where(b_null, None, b)),
            }
        )

    for trial in range(3):
        l, r = mk(40), mk(25)
        for op in ("except", "intersect"):
            got = _collect(
                distinct_set_op(
                    rd.from_arrow(l).repartition(4),
                    rd.from_arrow(r).repartition(3),
                    op=op,
                    num_shards=8,
                )
            )
            assert _rows(got) == _rows(_duck(l, r, op)), (trial, op)


def test_separator_and_sentinel_bytes_do_not_collide(ray_session):
    """Injectivity of the canonical rendering (review r4): values containing
    the RS field separator or the NUL escape/sentinel bytes must not
    conflate distinct rows, and a literal '\\x00N' string is not NULL."""
    l = pa.table(
        {
            "a": ["x\x1ey", "x", "\x00N", None, "p\x00q"],
            "b": ["z", "y\x1ez", "w", "w", "r"],
        }
    )
    r = pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    got = _collect(
        distinct_set_op(rd.from_arrow(l).repartition(2), rd.from_arrow(r), op="except")
    )
    assert got.num_rows == 5  # every distinct row survives
    assert _rows(got) == _rows(_duck(l, r, "except"))
    # and INTERSECT does not falsely match across the separator shift
    r2 = pa.table({"a": ["x\x1ey", None], "b": ["z", "w"]})
    got2 = _collect(
        distinct_set_op(
            rd.from_arrow(l).repartition(2), rd.from_arrow(r2), op="intersect"
        )
    )
    assert _rows(got2) == _rows(_duck(l, r2, "intersect"))
    assert got2.num_rows == 2  # ('x\x1ey','z') and (NULL,'w') only


@pytest.mark.parametrize("op,sql", [
    ("except_all", "EXCEPT ALL"), ("intersect_all", "INTERSECT ALL"),
])
def test_bag_semantics_match_duckdb(op, sql, ray_session):
    """EXCEPT ALL / INTERSECT ALL multiset laws: per distinct row the
    output carries max(0, cl−cr) / min(cl, cr) copies — multiplicities
    summed exactly across blocks, NULL rows included."""
    l = pa.table(
        {
            "a": pa.array([1, 1, 1, 2, None, None, 3], pa.int64()),
            "b": ["x", "x", "x", "y", None, None, "z"],
        }
    )
    r = pa.table(
        {
            "a": pa.array([1, 2, 2, None, 9], pa.int64()),
            "b": ["x", "y", "y", None, "w"],
        }
    )
    got = _collect(
        distinct_set_op(
            rd.from_arrow(l).repartition(3),
            rd.from_arrow(r).repartition(2),
            op=op,
        )
    )
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    want = con.sql(f"SELECT a, b FROM l {sql} SELECT a, b FROM r").arrow()
    assert _rows(got) == _rows(want)
    if op == "except_all":
        # (1,'x'): 3 left − 1 right = 2 copies; (None,None): 2 − 1 = 1
        vals = got.to_pylist()
        assert sum(1 for v in vals if v["a"] == 1) == 2
        assert sum(1 for v in vals if v["a"] is None and v["b"] is None) == 1


def test_bag_random_frames_match_duckdb(ray_session):
    rng = np.random.default_rng(13)

    def mk(n):
        a = rng.integers(0, 4, n).astype(np.int64)
        null = rng.random(n) < 0.15
        return pa.table(
            {"a": pa.array(pd.array(np.where(null, pd.NA, a), dtype="Int64"))}
        )

    for trial in range(3):
        l, r = mk(60), mk(45)
        for op, sql in (("except_all", "EXCEPT ALL"),
                        ("intersect_all", "INTERSECT ALL")):
            got = _collect(
                distinct_set_op(
                    rd.from_arrow(l).repartition(5),
                    rd.from_arrow(r).repartition(4),
                    op=op, num_shards=8,
                )
            )
            con = duckdb.connect()
            con.register("l", l)
            con.register("r", r)
            want = con.sql(f"SELECT a FROM l {sql} SELECT a FROM r").arrow()
            assert _rows(got) == _rows(want), (trial, op)
