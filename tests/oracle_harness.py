"""Local mirror of the driver's correctness gate: run every
``__ray_entry__.queries()`` entry and compare to ``oracle_sql()`` via DuckDB
(row count, column names, order-insensitive value equality).

Usage: ``python tests/oracle_harness.py [sf_dir]`` — owns its own Ray
session (the library never calls ray.init).
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return pd.DataFrame(result)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted by
    every column value."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"columns: {sorted(got.columns)} != {sorted(want.columns)}"]
    if len(got) != len(want):
        problems.append(f"rows: {len(got)} != {len(want)}")
        return problems
    g, w = canon(got), canon(want)
    for c in g.columns:
        a, b = g[c], w[c]
        if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
            af = a.astype(float).to_numpy()
            bf = b.astype(float).to_numpy()
            ok = (np.isnan(af) & np.isnan(bf)) | (af == bf)
            if not ok.all():
                i = int(np.argmin(ok))
                problems.append(f"col {c}: value mismatch at {i}: {af[i]} != {bf[i]}")
        else:
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                problems.append(f"col {c}: mismatch at {i}: {a[i]!r} != {b[i]!r}")
    return problems


def run(sf_dir: str, only: list[str] | None = None) -> int:
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = connect(sf_dir)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        got = to_pandas(fn(sf_dir))
        if name not in oracles:
            print(f"  {name:26s} rows-only: {len(got)} rows")
            assert len(got) >= 0
            continue
        want = con.sql(oracles[name]).df()
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"✗ {name:26s} {problems[:3]}")
        else:
            print(f"✓ {name:26s} {len(got)} rows match oracle")
    return failures


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    import ray

    ray.init(
        address="local",
        num_cpus=8,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    rc = run(sf, only)
    ray.shutdown()
    print("FAILURES:", rc)
    sys.exit(1 if rc else 0)
