"""Property-based window-operator correctness (hypothesis): arbitrary small
frames with null keys, null values, duplicate keys and huge (>2^53)
magnitudes, checked against DuckDB's window functions. Complements the
targeted tests in test_join_windows.py the same way test_join_property.py
complements the join edge cases — and pins the round-4 exactness contract
(Int64 all the way, no float64 detour) under fuzz."""

import duckdb
import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from hypothesis import given, settings

from etl_pipeline_rdf_star_ray.pipelines.windows import (
    rolling_window_sum,
    running_totals,
)

# values include >2^53 magnitudes where float64 loses integers, and nulls
value = st.one_of(
    st.none(),
    st.integers(-100, 100),
    st.integers(2**53, 2**53 + 8),
    st.integers(-(2**53) - 8, -(2**53)),
)
row = st.tuples(st.one_of(st.none(), st.integers(0, 3)), value)


def _frame(rows) -> pa.Table:
    return pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            # unique tiebreak: total order within each key
            "o": pa.array(list(range(len(rows))), pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def _arrow_col(ds, sort_cols, col) -> list:
    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    return tbl.sort_by([(c, "ascending") for c in sort_cols]).column(
        col
    ).to_pylist()


@given(st.lists(row, min_size=1, max_size=14))
@settings(max_examples=25, deadline=None)
def test_running_totals_matches_duckdb(rows):
    t = _frame(rows)
    got = _arrow_col(
        running_totals(
            rd.from_arrow(t), key_cols=["k"], order_by=["o"],
            value_col="v", out_col="run",
        ),
        ["o"],
        "run",
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        """SELECT CAST(SUM(v) OVER (PARTITION BY k ORDER BY o
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
           FROM t ORDER BY o"""
    ).arrow().column("run").to_pylist()
    assert got == want, rows


@given(st.lists(row, min_size=1, max_size=14), st.integers(1, 4))
@settings(max_examples=25, deadline=None)
def test_rolling_sum_matches_duckdb(rows, window):
    t = _frame(rows)
    got = _arrow_col(
        rolling_window_sum(
            rd.from_arrow(t), key_cols=["k"], order_by=["o"],
            value_col="v", window=window, out_col="roll",
        ),
        ["o"],
        "roll",
    )
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        f"""SELECT CAST(SUM(v) OVER (PARTITION BY k ORDER BY o
              ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
            AS BIGINT) AS roll
            FROM t ORDER BY o"""
    ).arrow().column("roll").to_pylist()
    assert got == want, (rows, window)
