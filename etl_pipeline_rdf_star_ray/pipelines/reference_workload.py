"""The reference's benchmark workload, regenerated and re-run on Ray Data.

Mirrors ``benchmark_performance.py:21-64``: ``mappings/data_products_rml.yaml``
over ``data_products_10k.csv`` + ``lineage_10k.csv`` (seeded generator
``csv_generator/generate_large_dataset.py``, config FIXTURES.md §3/§4),
producing ≈330k quads (≈80k asserted + ≈250k annotation quads; amplification
documented in ``csv_generator/BENCHMARK_DELIVERY.md:119-126``). The reference
does this single-threaded in 4.03 s (optimized engine, BASELINE.md); here the
same semantics run as lift ``map_batches`` + broadcast annotation join."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..mapping import parse_yarrrml
from ..stages.annotate import (
    annotate_broadcast,
    annotation_quads,
    build_annotation_index,
    compile_annotation,
)
from ..stages.lift import lift_dataset

REFERENCE_MAPPING_YAML = """
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
      - predicates: prov:generatedAtTime
        objects: {value: $(extract_time), datatype: xsd:dateTime}
      - predicates: prov:wasGeneratedBy
        objects: {value: ex:activity/$(run_id), type: iri}
      - [ex:confidence, $(confidence), xsd:decimal]
      - predicates: ex:rule
        objects: {value: ex:rule/$(rule_id), type: iri}
  ingestActivityTM:
    sources: [['lineage~parquet']]
    subject: ex:activity/$(run_id)
    predicateobjects:
      - [a, prov:Activity]
      - [prov:startedAtTime, $(extract_time), xsd:dateTime]
      - predicates: prov:used
        objects: {value: ex:system/$(source_system), type: iri}
"""

_TITLES = [f"Data Product Title {i:02d}" for i in range(20)]
_OWNERS = [f"Owner{i:02d}" for i in range(15)]
_THEMES = [f"http://example.org/themes/Theme{i:02d}" for i in range(20)]
_SYSTEMS = [f"SYSTEM_{i:02d}" for i in range(15)]
_RUNS = [f"RUN_2025_{i:03d}" for i in range(50)]
_RULES = [f"RULE_{i:03d}" for i in range(25)]


def data_products_table(n: int, *, seed: int = 42) -> pa.Table:
    """Seeded mirror of ``csv_generator/config_data_products_10k.json``."""
    rng = np.random.RandomState(seed)
    ids = np.array([f"DS-{i:06d}" for i in range(n)], dtype=object)
    day = rng.randint(0, 365, n)
    issued = np.array(
        [f"2025-{1 + d // 31:02d}-{1 + d % 28:02d}" for d in day], dtype=object
    )
    return pa.table(
        {
            "dataset_id": pa.array(ids, pa.string()),
            "title": pa.array(np.array(_TITLES, object)[rng.randint(0, 20, n)], pa.string()),
            "issued": pa.array(issued, pa.string()),
            "owner": pa.array(np.array(_OWNERS, object)[rng.randint(0, 15, n)], pa.string()),
            "theme_uri": pa.array(np.array(_THEMES, object)[rng.randint(0, 20, n)], pa.string()),
        }
    )


def lineage_table(n: int, *, n_datasets: int | None = None, seed: int = 43) -> pa.Table:
    rng = np.random.RandomState(seed)
    n_datasets = n_datasets or n
    ids = np.array(
        [f"DS-{i:06d}" for i in rng.randint(0, n_datasets, n)], dtype=object
    )
    hours = rng.randint(0, 24 * 60, n)
    ext = np.array(
        [f"2025-02-{1 + h // (24 * 60 // 27):02d}T{h % 24:02d}:00:00Z" for h in hours],
        dtype=object,
    )
    conf = np.floor(rng.uniform(0.75, 0.99, n) * 100) / 100
    return pa.table(
        {
            "dataset_id": pa.array(ids, pa.string()),
            "source_system": pa.array(np.array(_SYSTEMS, object)[rng.randint(0, 15, n)], pa.string()),
            "extract_time": pa.array(ext, pa.string()),
            "run_id": pa.array(np.array(_RUNS, object)[rng.randint(0, 50, n)], pa.string()),
            "confidence": pa.array(np.char.mod("%.2f", conf).astype(object), pa.string()),
            "rule_id": pa.array(np.array(_RULES, object)[rng.randint(0, 25, n)], pa.string()),
        }
    )


def run_reference_workload(
    n_rows: int = 10_000, *, blocks: int = 16
) -> dict[str, int]:
    """Full reference pipeline: asserted lift of 3 maps + RDF-star annotation
    join, consumed by count. Returns quad counts (asserted, annotation)."""
    spec = parse_yarrrml(REFERENCE_MAPPING_YAML)
    dp = rd.from_arrow(data_products_table(n_rows)).repartition(blocks)
    lin_tab = lineage_table(n_rows)
    lineage = rd.from_arrow(lin_tab).repartition(blocks)

    # asserted feeds both the count and the annotation join → materialize the
    # (small) triple table once instead of re-running the lift per consumer
    asserted = lift_dataset(
        dp, spec, ["datasetTM", "datasetThemeTM"], carry_columns=("dataset_id",)
    ).materialize()
    activity = lift_dataset(lineage, spec, ["ingestActivityTM"])
    kernel = compile_annotation(spec, "themeGovernanceTM")
    index = build_annotation_index(lin_tab, kernel)
    # the reference annotates EVERY triple whose subject contains /dataset/
    # (all 5 per dataset, not just the theme fact): rdf_star_etl_yarrrml.py:482-484
    annotated = annotate_broadcast(
        asserted, index, key_column="dataset_id", subject_contains="/dataset/"
    )
    ann_quads = annotation_quads(annotated)

    # separate count() executions are cheaper than a union+groupby here:
    # asserted is materialized (its count is metadata), and the two lazy
    # counts avoid an all-to-all on the unioned stream
    n_asserted = asserted.count() + activity.count()
    n_annotation = ann_quads.count()
    return {"asserted": n_asserted, "annotation": n_annotation,
            "total": n_asserted + n_annotation}
