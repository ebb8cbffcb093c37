"""Connector (JSON/XML), metadata, mapping-ref, cross-product-fallback and
CLI coverage — mirroring the reference's ``tests/test_sources.py`` fixture
style (tmp files)."""

import json
import subprocess
import sys

import pyarrow as pa
import ray.data as rd

from etl_pipeline_rdf_star_ray.mapping import parse_yarrrml
from etl_pipeline_rdf_star_ray.pipelines.metadata import (
    parse_author,
    run_metadata_rows,
)
from etl_pipeline_rdf_star_ray.sources import create_source
from etl_pipeline_rdf_star_ray.sources.json_source import (
    flatten_json,
    read_json_records,
    simple_jsonpath,
)
from etl_pipeline_rdf_star_ray.sources.xml_source import (
    element_to_dict,
    flatten_xml_dict,
    read_xml_records,
)

EMPLOYEES_JSON = {
    "company": "ACME",
    "employees": [
        {
            "id": 1,
            "name": "Alice",
            "contact": {"email": "a@x.org", "phone": "1"},
            "skills": ["py", "sql"],
        },
        {
            "id": 2,
            "name": "Bob",
            "contact": {"email": "b@x.org", "phone": "2"},
            "skills": ["go"],
        },
    ],
}

PRODUCTS_XML = """<catalog>
  <product id="P1" category="tools">
    <name>Hammer</name>
    <price currency="USD">9.99</price>
    <tag>heavy</tag><tag>steel</tag>
  </product>
  <product id="P2" category="toys">
    <name>Ball</name>
    <price currency="EUR">2.50</price>
  </product>
</catalog>"""


def test_flatten_json_reference_semantics():
    flat = flatten_json(
        {"user": {"name": "John", "age": 30}, "tags": ["a", "b"],
         "addr": [{"city": "X"}, {"city": "Y"}]}
    )
    assert flat["user_name"] == "John" and flat["user_age"] == 30
    assert flat["tags"] == ["a", "b"]  # primitive lists kept
    assert flat["addr_0_city"] == "X" and flat["addr_1_city"] == "Y"


def test_simple_jsonpath_subset():
    data = EMPLOYEES_JSON
    assert len(simple_jsonpath(data, "$.employees[*]")) == 2
    assert simple_jsonpath(data, "$.employees[0]")[0]["name"] == "Alice"
    assert simple_jsonpath(data, "$.company") == [{"value": "ACME"}]
    assert simple_jsonpath(data, "$") == [data]


def test_read_json_records(tmp_path):
    p = tmp_path / "employees.json"
    p.write_text(json.dumps(EMPLOYEES_JSON))
    df = read_json_records(str(p), record_path="$.employees[*]").to_pandas()
    assert len(df) == 2
    assert set(df.columns) >= {"id", "name", "contact_email", "skills"}
    assert df.sort_values("id")["contact_email"].tolist() == ["a@x.org", "b@x.org"]


def test_xml_element_and_flatten():
    import xml.etree.ElementTree as ET

    root = ET.fromstring(PRODUCTS_XML)
    d = element_to_dict(root.find("product"))
    assert d["@id"] == "P1" and d["name"] == "Hammer"
    flat = flatten_xml_dict(d)
    assert flat["id"] == "P1"
    assert flat["price_text"] == "9.99" and flat["price_currency"] == "USD"
    assert flat["tag"] == "heavy, steel"  # repeated children joined


def test_read_xml_records(tmp_path):
    p = tmp_path / "products.xml"
    p.write_text(PRODUCTS_XML)
    df = read_xml_records(str(p), xpath="//product").to_pandas()
    assert len(df) == 2
    assert set(df["id"]) == {"P1", "P2"}
    ds = create_source({"type": "xml", "path": str(p), "iterator": "//product"})
    assert ds.count() == 2


def test_parse_author_shortcut():
    a = parse_author("Jane Doe <jane@x.org> (https://x.org)")
    assert a == {"name": "Jane Doe", "email": "jane@x.org", "website": "https://x.org"}
    assert parse_author("https://me.example/#id") == {"webid": "https://me.example/#id"}


def test_run_metadata_rows():
    spec = parse_yarrrml(
        "base: 'http://b.org/'\nauthors: ['Jane <j@x.org>']\nmappings: {}"
    )
    rows = run_metadata_rows(spec, mapping_name="m.yaml", now="2026-01-01T00:00:00Z")
    preds = [r["predicate"] for r in rows]
    assert "http://purl.org/dc/terms/created" in preds
    assert "http://purl.org/dc/terms/creator" in preds
    creator = [r for r in rows if r["predicate"].endswith("creator")][0]
    assert creator["object_value"] == "Jane"
    assert rows[0]["object_value"] == "http://www.w3.org/ns/dcat#Dataset"


def test_mapping_ref_executed():
    spec = parse_yarrrml(
        """
prefixes: {ex: "http://example.org/"}
mappings:
  person:
    sources: [['d~parquet']]
    s: ex:person/$(id)
    po:
      - [ex:name, $(name)]
  account:
    sources: [['d~parquet']]
    s: ex:account/$(acct)
    po:
      - predicates: ex:owner
        objects: {mapping: person}
"""
    )
    from etl_pipeline_rdf_star_ray.mapping import compile_lift

    t = pa.table({"id": ["7"], "acct": ["A1"], "name": ["N"]})
    out = compile_lift(spec, "account")(t).to_pylist()
    owner = [r for r in out if r["predicate"].endswith("owner")][0]
    assert owner["object_value"] == "http://example.org/person/7"
    assert owner["object_type"] == "iri"


def test_cross_product_annotation_fallback():
    from etl_pipeline_rdf_star_ray.stages.annotate import (
        annotate_broadcast,
        build_annotation_index,
        compile_annotation,
    )
    from etl_pipeline_rdf_star_ray.stages.lift import lift_dataset

    spec = parse_yarrrml(
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
      - function: join(quoted=factTM)
    po:
      - [ex:note, $(note)]
"""
    )
    facts = rd.from_arrow(pa.table({"id": ["1", "2"], "v": ["x", "y"]}))
    triples = lift_dataset(facts, spec, ["factTM"])
    kernel = compile_annotation(spec, "annTM")
    assert kernel.join_left is None
    index = build_annotation_index(pa.table({"note": ["n1", "n2"]}), kernel)
    out = annotate_broadcast(triples, index, key_column=None).to_pandas()
    # every triple gets BOTH annotations (cross product)
    assert all(len(a) == 2 for a in out["annotations"])


def test_cli_smoke(tmp_path):
    """End-to-end CLI: ingest a changelog parquet, then status/list/query."""
    import pyarrow.parquet as pq

    from etl_pipeline_rdf_star_ray.sources.synthetic import changelog_table

    log = tmp_path / "log.parquet"
    pq.write_table(changelog_table(2000), str(log))
    lake = str(tmp_path / "lake")
    env = {"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
           "HOME": "/root", "RAY_ADDRESS": "local"}
    r = subprocess.run(
        [sys.executable, "-m", "etl_pipeline_rdf_star_ray.cli", "--num-cpus", "2",
         "ingest", str(log), lake, "--num-partitions", "4"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "committed" in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "etl_pipeline_rdf_star_ray.cli", "status", lake],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert r.returncode == 0 and '"active_versions": 4' in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "etl_pipeline_rdf_star_ray.cli", "query", lake,
         "SELECT count(*) n FROM state"],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert r.returncode == 0 and "n" in r.stdout


def test_cli_provenance_import_resalt(tmp_path):
    """The round-2 verbs: provenance (reference ``batch_cli.py:290-325``),
    RDF import, resalt — driven in-process against a small lake."""
    import pyarrow.parquet as pq

    from etl_pipeline_rdf_star_ray.cli import main
    from etl_pipeline_rdf_star_ray.sources.synthetic import changelog_table

    log = tmp_path / "log"
    log.mkdir()
    pq.write_table(changelog_table(1500), str(log / "log.parquet"))
    lake = str(tmp_path / "lake")
    assert main(["--num-cpus", "2", "ingest", str(log), lake,
                 "--num-partitions", "4"]) == 0

    assert main(["resalt", lake, "conv_hot"]) == 0

    nt = tmp_path / "rdf"
    nt.mkdir()
    (nt / "x.nt").write_text('<http://a> <http://b> "v" .\n')
    out = str(tmp_path / "triples")
    assert main(["import", str(nt), out]) == 0
    assert pq.read_table(out).num_rows == 1

    import duckdb
    import json as _json

    from etl_pipeline_rdf_star_ray.state.lake import snapshot_files

    con = duckdb.connect()
    row = con.sql(
        "SELECT conv_id, turn_idx FROM read_parquet("
        + _json.dumps(snapshot_files(lake)) + ", union_by_name=true) LIMIT 1"
    ).fetchone()
    subj = f"http://example.org/turn/{row[0]}_{row[1]}"
    assert main(["provenance", lake, subj]) == 0


def test_cli_vacuum(tmp_path, capsys):
    """The round-4 vacuum verb: expire inactive conversations through the
    CLI, report rows dropped, leave the snapshot readable."""
    import pyarrow.parquet as pq

    from etl_pipeline_rdf_star_ray.cli import main
    from etl_pipeline_rdf_star_ray.sources.synthetic import changelog_table
    from etl_pipeline_rdf_star_ray.state.lake import state_table

    log = tmp_path / "log"
    log.mkdir()
    pq.write_table(changelog_table(1500), str(log / "log.parquet"))
    lake = str(tmp_path / "lake")
    assert main(["--num-cpus", "2", "ingest", str(log), lake,
                 "--num-partitions", "4"]) == 0
    before = state_table(lake).to_pandas()
    cutoff = int(before.groupby("conv_id")["lsn"].max().median())
    assert main(["vacuum", lake, "--min-lsn", str(cutoff)]) == 0
    out = capsys.readouterr().out
    assert '"rows_dropped"' in out
    after = state_table(lake).to_pandas()
    keep = before.groupby("conv_id")["lsn"].max()
    assert set(after["conv_id"].unique()) == set(keep[keep >= cutoff].index)
