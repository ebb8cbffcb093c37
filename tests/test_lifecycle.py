"""Batch lifecycle (archive / delete with ACTIVE guard), provenance lookup,
static provenance annotations, TriG export, shuffle-join annotation path —
mirroring the reference's lifecycle tests (``tests/test_batch_manager.py``)."""

import glob
import os

import pyarrow as pa
import pytest
import ray.data as rd

from etl_pipeline_rdf_star_ray.mapping import parse_yarrrml
from etl_pipeline_rdf_star_ray.pipelines import cdc, ops
from etl_pipeline_rdf_star_ray.pipelines.export import export_trig, format_trig
from etl_pipeline_rdf_star_ray.sources.synthetic import changelog_dataset
from etl_pipeline_rdf_star_ray.stages.annotate import (
    annotate_broadcast,
    annotate_shuffle,
    attach_static_annotations,
    build_annotation_index,
    compile_annotation,
)
from etl_pipeline_rdf_star_ray.stages.lift import lift_dataset
from etl_pipeline_rdf_star_ray.state import manifest as mf
from etl_pipeline_rdf_star_ray.state.lake import state_table


def _mk(lo, hi, **kw):
    return changelog_dataset(hi - lo, lsn_start=lo, **kw)


def test_archive_delete_lifecycle(tmp_path):
    lake = str(tmp_path / "lake")
    cdc.replay(_mk, lake, lsn_splits=[1000, 2000], num_partitions=4)
    batches = mf.batch_ids(lake)
    assert len(batches) == 2
    old, new = batches
    # cannot archive/delete the ACTIVE batch (reference guard)
    with pytest.raises(ValueError):
        mf.archive_batch(lake, new)
    with pytest.raises(ValueError):
        mf.delete_batch(lake, new)
    # archiving the superseded batch removes it from point-in-time reads
    n = mf.archive_batch(lake, old)
    assert n == 4
    assert state_table(lake, at_lsn=999).num_rows == 0
    # current state unaffected
    assert state_table(lake).num_rows > 0
    # hard delete removes files
    assert mf.delete_batch(lake, old, hard=True) == 4
    assert not any(
        old in f for f in glob.glob(os.path.join(lake, "part=*", "*.parquet"))
    )


SPEC = parse_yarrrml(
    """
prefixes: {ex: "http://example.org/"}
mappings:
  factTM:
    sources: [['d~parquet']]
    s: ex:f/$(id)
    po:
      - [ex:v, $(v)]
  annTM:
    sources: [['a~parquet']]
    subject:
      - function: join(quoted=factTM, equal(str1=$(fid), str2=$(id)))
    po:
      - [ex:note, $(note)]
"""
)


def test_annotate_shuffle_matches_broadcast():
    facts = rd.from_arrow(pa.table({"id": ["1", "2", "3"], "v": ["x", "y", "z"]}))
    anns_tab = pa.table({"fid": ["1", "1", "3"], "note": ["a", "b", "c"]})
    triples = lift_dataset(facts, SPEC, ["factTM"], carry_columns=("id",))
    kernel = compile_annotation(SPEC, "annTM")
    got = (
        annotate_shuffle(
            triples, rd.from_arrow(anns_tab), kernel, key_column="id",
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["subject", "object_value"])
        .reset_index(drop=True)
    )
    assert len(got) == 3
    assert got["object_value"].tolist() == ["a", "b", "c"]
    assert got["subject"].str.startswith("<< http://example.org/f/").all()


def test_provenance_for_subject():
    facts = rd.from_arrow(pa.table({"id": ["1", "2"], "v": ["x", "y"]}))
    triples = lift_dataset(facts, SPEC, ["factTM"], carry_columns=("id",))
    kernel = compile_annotation(SPEC, "annTM")
    index = build_annotation_index(
        pa.table({"fid": ["1"], "note": ["n"]}), kernel
    )
    annotated = annotate_broadcast(triples, index, key_column="id")
    df = ops.provenance_for_subject(annotated, "http://example.org/f/1")
    assert len(df) == 1
    assert df.iloc[0]["ann_value"] == "n"
    df2 = ops.provenance_for_subject(annotated, "http://example.org/f/2")
    assert df2.iloc[0]["ann_value"] is None


def test_attach_static_annotations():
    t = pa.table(
        {
            "subject": ["s1", "s2"],
            "predicate": ["p", "p"],
            "object_value": ["a", "b"],
        }
    )
    out = attach_static_annotations(
        rd.from_arrow(t),
        [
            {"predicate": "http://w3.org/prov#wasAttributedTo", "value": "sys"},
            {"predicate": "http://example.org/confidence", "value": 0.9,
             "datatype": "http://www.w3.org/2001/XMLSchema#decimal"},
        ],
    ).to_pandas()
    assert all(len(a) == 2 for a in out["annotations"])
    assert out["annotations"][0][1]["value"] == "0.9"


def test_trig_export(tmp_path):
    t = pa.table(
        {
            "subject": ["http://e/s1", "http://e/s2"],
            "predicate": ["http://e/p", "http://e/p"],
            "object_value": ["v", "http://e/o"],
            "object_type": ["literal", "iri"],
            "object_datatype": [None, None],
            "object_lang": [None, None],
            "graph": ["http://e/g1", None],
        }
    )
    lines = format_trig(t)["text"].to_pylist()
    assert lines[0] == 'GRAPH <http://e/g1> { <http://e/s1> <http://e/p> "v" . }'
    assert lines[1] == "<http://e/s2> <http://e/p> <http://e/o> ."
    out = str(tmp_path / "trig")
    export_trig(rd.from_arrow(t), out)
    files = sorted(os.listdir(out))
    assert files[0] == "00-prefixes.trig"
    body = "".join(open(os.path.join(out, f)).read() for f in files[1:])
    assert "GRAPH <http://e/g1>" in body
