"""Lift + annotation-join stages over Ray datasets, mirroring the
reference's end-to-end scenario (``mappings/data_products_rml.yaml`` +
``tests/test_dynamic_etl.py`` marker-style assertions)."""

import pyarrow as pa
import ray.data as rd

from etl_pipeline_rdf_star_ray.mapping import parse_yarrrml
from etl_pipeline_rdf_star_ray.stages.annotate import (
    annotate_broadcast,
    annotation_quads,
    build_annotation_index,
    compile_annotation,
)
from etl_pipeline_rdf_star_ray.stages.lift import (
    lift_dataset,
    transcripts_spec,
)
from etl_pipeline_rdf_star_ray.sources.synthetic import changelog_table
from etl_pipeline_rdf_star_ray.stages.merge import lww_merge

DATA_PRODUCTS_YAML = """
prefixes:
  ex:   "http://example.org/"
  dcat: "http://www.w3.org/ns/dcat#"
  dct:  "http://purl.org/dc/terms/"
  prov: "http://www.w3.org/ns/prov#"
  xsd:  "http://www.w3.org/2001/XMLSchema#"
mappings:
  datasetTM:
    sources: [['data_products~parquet']]
    subject: ex:dataset/$(dataset_id)
    predicateobjects:
      - [a, dcat:Dataset]
      - [dct:title, $(title), xsd:string]
      - [dct:issued, $(issued), xsd:date]
      - [dct:publisher, ex:org/$(owner)~iri]
  datasetThemeTM:
    sources: [['data_products~parquet']]
    subject: ex:dataset/$(dataset_id)
    predicateobjects:
      - predicates: dcat:theme
        objects: {value: $(theme_uri), type: iri}
  themeGovernanceTM:
    sources: [['lineage~parquet']]
    subject:
      - function: join(quoted=datasetThemeTM, equal(str1=$(dataset_id), str2=$(dataset_id)))
    predicateobjects:
      - predicates: prov:wasDerivedFrom
        objects: {value: ex:system/$(source_system), type: iri}
      - [ex:confidence, $(confidence), xsd:decimal]
"""


def _data_products():
    return pa.table(
        {
            "dataset_id": ["DS001", "DS002"],
            "title": ["Sales Data", "Risk Data"],
            "issued": ["2025-01-01", "2025-02-02"],
            "owner": ["Team A", "Team B"],
            "theme_uri": ["http://example.org/themes/Fin", "http://example.org/themes/Risk"],
        }
    )


def _lineage():
    return pa.table(
        {
            "dataset_id": ["DS001", "DS001", "DS003"],
            "source_system": ["COLLIBRA", "IBM IGC", "X"],
            "confidence": [0.9, 0.8, 0.5],
        }
    )


def test_data_products_scenario_with_annotation_join():
    spec = parse_yarrrml(DATA_PRODUCTS_YAML)
    dp = rd.from_arrow(_data_products())
    triples = lift_dataset(
        dp, spec, ["datasetTM", "datasetThemeTM"], carry_columns=("dataset_id",)
    )
    kernel = compile_annotation(spec, "themeGovernanceTM")
    assert kernel.quoted_ref == "datasetThemeTM"
    index = build_annotation_index(_lineage(), kernel)
    # annotations keyed by dataset_id; DS003 has no matching triples
    assert len(index) == 2
    annotated = annotate_broadcast(
        triples, index, key_column="dataset_id", only_map="datasetThemeTM"
    )
    out = annotated.to_arrow_refs()
    import ray

    table = pa.concat_tables([ray.get(r) for r in out])
    rows = table.to_pylist()
    # marker assertions (reference style, test_dynamic_etl.py:122-156)
    subjects = {r["subject"] for r in rows}
    assert "http://example.org/dataset/DS001" in subjects
    titles = [r for r in rows if r["predicate"] == "http://purl.org/dc/terms/title"]
    assert {t["object_value"] for t in titles} == {"Sales Data", "Risk Data"}
    pubs = [r for r in rows if r["predicate"].endswith("publisher")]
    assert {p["object_value"] for p in pubs} == {
        "http://example.org/org/Team_A",
        "http://example.org/org/Team_B",
    }
    # only datasetThemeTM triples carry annotations; DS001 has 2 lineage rows
    # x 2 predicate-objects = 4 annotation structs
    themed = [r for r in rows if r["map_name"] == "datasetThemeTM"]
    ds1 = [r for r in themed if "DS001" in r["subject"]][0]
    assert len(ds1["annotations"]) == 4
    preds = {a["predicate"] for a in ds1["annotations"]}
    assert "http://www.w3.org/ns/prov#wasDerivedFrom" in preds
    vals = {a["value"] for a in ds1["annotations"]}
    assert "http://example.org/system/COLLIBRA" in vals
    assert "http://example.org/system/IBM_IGC" in vals
    assert "0.9" in vals
    ds2 = [r for r in themed if "DS002" in r["subject"]][0]
    assert len(ds2["annotations"]) == 0
    # non-theme triples never annotated
    assert all(len(r["annotations"]) == 0 for r in rows if r["map_name"] != "datasetThemeTM")


def test_annotation_quads_flatten():
    spec = parse_yarrrml(DATA_PRODUCTS_YAML)
    dp = rd.from_arrow(_data_products())
    triples = lift_dataset(dp, spec, ["datasetThemeTM"], carry_columns=("dataset_id",))
    kernel = compile_annotation(spec, "themeGovernanceTM")
    index = build_annotation_index(_lineage(), kernel)
    annotated = annotate_broadcast(triples, index, key_column="dataset_id")
    quads = annotation_quads(annotated).to_pandas()
    assert len(quads) == 4
    assert quads["subject"].str.startswith("<< http://example.org/dataset/DS001").all()
    assert (
        quads["object_datatype"].dropna() == "http://www.w3.org/2001/XMLSchema#decimal"
    ).sum() == 2


def test_transcripts_lift_over_merged_state():
    """Flagship shape: changelog → LWW state → triple records."""
    state = lww_merge(changelog_table(2000)).drop_columns(["op"])
    spec = transcripts_spec()
    ds = rd.from_arrow(state)
    triples = lift_dataset(ds, spec, carry_columns=("conv_id", "turn_idx", "lsn"))
    df = triples.to_pandas()
    # every state row emits: type + role + text + ts + conversation (+tool when present)
    n = state.num_rows
    assert len(df[df.predicate == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"]) >= n
    texts = df[df.predicate == "http://example.org/text"]
    assert len(texts) == n
    # per-turn text equality: object_value == state.text under key ordering
    merged = texts.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    st = state.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (merged["object_value"].values == st["text"].values).all()
    # ts typed literal in ISO form
    ts = df[df.predicate == "http://example.org/ts"].iloc[0]
    assert ts["object_datatype"].endswith("dateTime")
    assert "T" in ts["object_value"]
