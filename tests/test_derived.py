"""Incremental quads-view maintenance (pipelines/derived.py): the
assert/retract delta stream between two watermarks must satisfy the exact
multiset identity  lift(A) + asserts == lift(B) + retracts  — because the
lift is row-wise and changed_rows partitions the row sets exactly."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from etl_pipeline_rdf_star_ray.pipelines import cdc, derived, ops
from etl_pipeline_rdf_star_ray.sources.synthetic import changelog_table
from etl_pipeline_rdf_star_ray.stages.lift import lift_dataset, transcripts_spec
from etl_pipeline_rdf_star_ray.state.lake import state_table

N = 3000
T = 1800


def _lake(tmp_path):
    t = changelog_table(N)
    lake = str(tmp_path / "lake")
    cdc.ingest(rd.from_arrow(t.slice(0, T)), lake, num_partitions=8)
    cdc.ingest(rd.from_arrow(t.slice(T)), lake, num_partitions=8)
    return lake


def _counts(df: pd.DataFrame) -> pd.Series:
    cols = [c for c in sorted(df.columns) if c != "delta_op"]
    return (
        df[cols].astype(str).apply("\x1f".join, axis=1).value_counts().sort_index()
    )


def test_lift_delta_multiset_identity(tmp_path):
    lake = _lake(tmp_path)
    spec = transcripts_spec()
    lift_a = lift_dataset(
        rd.from_arrow(state_table(lake, at_lsn=T - 1)), spec
    ).to_pandas()
    lift_b = lift_dataset(rd.from_arrow(state_table(lake)), spec).to_pandas()

    delta = derived.lift_delta(lake, T - 1, spec=spec).to_pandas()
    asserts = delta[delta["delta_op"] == derived.DELTA_ASSERT]
    retracts = delta[delta["delta_op"] == derived.DELTA_RETRACT]
    assert len(asserts) and len(retracts)

    lhs = _counts(pd.concat([lift_a, asserts], ignore_index=True))
    rhs = _counts(pd.concat([lift_b, retracts], ignore_index=True))
    pd.testing.assert_series_equal(lhs, rhs)


def test_changed_rows_matches_diff_classification(tmp_path):
    lake = _lake(tmp_path)
    changed = derived.changed_rows(lake, T - 1).to_pandas()
    summary = ops.diff_summary(lake, T - 1, None)
    n_retract = (changed["delta_op"] == derived.DELTA_RETRACT).sum()
    n_assert = (changed["delta_op"] == derived.DELTA_ASSERT).sum()
    assert n_retract == summary["removed"] + summary["modified"]
    assert n_assert == summary["added"] + summary["modified"]
    # unchanged keys never appear
    assert len(changed) == n_retract + n_assert
