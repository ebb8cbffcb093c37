"""Property-based set-op and arg-max correctness (hypothesis): arbitrary
small frames with nulls, heavy duplication and overlap, all four set ops
and the map-side-reduced arg-max checked against DuckDB's answer. The
targeted tests pin specific edge cases; this fuzzes the space between."""

import duckdb
import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings

from etl_pipeline_rdf_star_ray.pipelines.windows import argmax_rows
from etl_pipeline_rdf_star_ray.stages.setops import distinct_set_op

val = st.one_of(st.none(), st.integers(0, 3))
txt = st.one_of(st.none(), st.sampled_from(["p", "q", "\x1e", "\x00N"]))
row = st.tuples(val, txt)

_SQL = {
    "except": "EXCEPT",
    "intersect": "INTERSECT",
    "except_all": "EXCEPT ALL",
    "intersect_all": "INTERSECT ALL",
}


def _norm(tbl: pa.Table) -> list:
    return sorted(
        (sorted(r.items()) for r in tbl.to_pylist()),
        key=str,
    )


@given(
    st.lists(row, min_size=0, max_size=10),
    st.lists(row, min_size=0, max_size=8),
    st.sampled_from(list(_SQL)),
)
@settings(max_examples=30, deadline=None)
def test_set_ops_match_duckdb(lrows, rrows, op):
    l = pa.table(
        {
            "a": pa.array([r[0] for r in lrows], pa.int64()),
            "b": pa.array([r[1] for r in lrows], pa.string()),
        }
    )
    r = pa.table(
        {
            "a": pa.array([x[0] for x in rrows], pa.int64()),
            "b": pa.array([x[1] for x in rrows], pa.string()),
        }
    )
    ds = distinct_set_op(
        rd.from_arrow(l).repartition(2),
        rd.from_arrow(r).repartition(2),
        op=op,
        num_shards=4,
    )
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    got = (
        pa.concat_tables(tabs, promote_options="default")
        if tabs
        else pa.table({"a": pa.array([], pa.int64()),
                       "b": pa.array([], pa.string())})
    )
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    want = con.sql(
        f"SELECT a, b FROM l {_SQL[op]} SELECT a, b FROM r"
    ).arrow()
    assert _norm(got) == _norm(want)


grp = st.one_of(st.none(), st.integers(0, 3))
ordv = st.one_of(st.none(), st.integers(0, 4))


@given(st.lists(st.tuples(grp, ordv), min_size=1, max_size=14))
@settings(max_examples=30, deadline=None)
def test_argmax_matches_duckdb(rows):
    tbl = pa.table(
        {
            "g": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.int64()),
            "rid": pa.array(range(len(rows)), pa.int64()),
        }
    )
    import ray

    ds = argmax_rows(
        rd.from_arrow(tbl).repartition(3),
        group_cols=["g"],
        order_by=["v", "rid"],
        ascending=[False, True],
        num_shards=4,
    )
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    got = pa.concat_tables(tabs, promote_options="default")
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.sql(
        """SELECT * FROM t QUALIFY row_number() OVER (
             PARTITION BY g
             ORDER BY v DESC NULLS LAST, rid ASC NULLS LAST) = 1"""
    ).arrow()
    assert _norm(got) == _norm(want)
