"""Mapping-spec parser + kernel compiler tests, organized by the same
YARRRML spec sections as the reference's ``test_yarrrml_spec_comprehensive.py``
(SURVEY.md §5)."""

import pyarrow as pa
import pytest

from etl_pipeline_rdf_star_ray.mapping import (
    CompiledTemplate,
    compile_lift,
    expand_prefixed,
    parse_yarrrml,
    sanitize_component,
    split_template,
)

PREFIXES = {"ex": "http://example.org/", "xsd": "http://www.w3.org/2001/XMLSchema#"}


# --- templates & scalar kernels --------------------------------------------


def test_split_template():
    assert split_template("ex:d/$(id)_x$(n)") == [
        ("const", "ex:d/"),
        ("var", "id"),
        ("const", "_x"),
        ("var", "n"),
    ]


def test_expand_prefixed_guard():
    assert expand_prefixed("ex:foo", PREFIXES) == "http://example.org/foo"
    assert expand_prefixed("http://x.org/a:b", PREFIXES) == "http://x.org/a:b"
    assert expand_prefixed("nope:foo", PREFIXES) == "nope:foo"
    assert expand_prefixed("plain", PREFIXES) == "plain"


def test_sanitize_component_reference_semantics():
    arr = pa.array(["DS 001", "a/b", None, "", "ok-1.2"])
    out = sanitize_component(arr).to_pylist()
    assert out == ["DS_001", "a_b", "unknown", "unknown", "ok-1.2"]


def test_compiled_template_expands_prefix_head():
    t = CompiledTemplate("ex:dataset/$(id)", PREFIXES, sanitize=True)
    out = t(pa.table({"id": ["DS 1", None]}))
    assert out.to_pylist() == [
        "http://example.org/dataset/DS_1",
        "http://example.org/dataset/unknown",
    ]


def test_compiled_template_missing_column_unknown():
    t = CompiledTemplate("ex:d/$(nope)", PREFIXES, sanitize=True)
    assert t(pa.table({"id": ["x"]})).to_pylist() == ["http://example.org/d/unknown"]


# --- parser: spec sections -------------------------------------------------

FULL_YAML = """
base: "http://base.org/"
authors:
  - Jane Doe <jane@example.org>
prefixes:
  ex: "http://example.org/"
  xsd: "http://www.w3.org/2001/XMLSchema#"
sources:
  mainsrc:
    access: data.csv
    referenceFormulation: csv
targets:
  out1: {access: out.trig, type: trig}
mappings:
  person:
    sources:
      - ['data.csv~csv']
    s: ex:person/$(id)
    po:
      - [a, ex:Person]
      - [ex:name, $(name)]
      - [ex:age, $(age), xsd:integer]
      - [ex:label, $(name), en~lang]
      - [[ex:p1, ex:p2], [$(v1), $(v2)]]
      - [ex:home, ex:place/$(city)~iri]
      - predicates: ex:knows
        objects:
          value: ex:person/$(friend_id)
          type: iri
    graphs: ex:graph/people
  annot:
    sources:
      - ['lineage.csv~csv']
    subject:
      - function: join(quoted=person, equal(str1=$(person_id), str2=$(id)))
    po:
      - [ex:confidence, $(conf), xsd:decimal]
"""


def test_parse_full_grammar():
    spec = parse_yarrrml(FULL_YAML)
    assert spec.base == "http://base.org/"
    assert spec.authors == ["Jane Doe <jane@example.org>"]
    assert spec.sources["mainsrc"].path == "data.csv"
    assert "out1" in spec.targets
    tm = spec.maps["person"]
    assert tm.subject.template == "ex:person/$(id)"
    assert tm.type_statements == ["ex:Person"]
    preds = [(po.predicate, po.value) for po in tm.predicate_objects]
    assert ("ex:name", "$(name)") in preds
    # cartesian expansion: 2 predicates x 2 objects
    assert sum(1 for p, _ in preds if p in ("ex:p1", "ex:p2")) == 4
    dt = {po.predicate: po.datatype for po in tm.predicate_objects}
    assert dt["ex:age"] == "xsd:integer"
    lang = {po.predicate: po.language for po in tm.predicate_objects}
    assert lang["ex:label"] == "en"
    iri_po = [po for po in tm.predicate_objects if po.predicate == "ex:home"][0]
    assert iri_po.object_type == "iri" and iri_po.value == "ex:place/$(city)"
    assert tm.graphs == ["ex:graph/people"]


def test_parse_quoted_join():
    spec = parse_yarrrml(FULL_YAML)
    q = spec.maps["annot"].subject
    assert q.is_quoted and q.quoted_ref == "person"
    # RML convention: str1 = child/annotation-side column, str2 = parent
    assert q.join_left == "person_id" and q.join_right == "id"


def test_parse_shortcuts_and_inverse():
    spec = parse_yarrrml(
        """
mappings:
  m:
    sources: [['d.csv~csv']]
    s: ex:x/$(id)
    po:
      - p: ex:owns
        o: {value: ex:thing/$(t), type: iri}
        i: ex:ownedBy
"""
    )
    po = spec.maps["m"].predicate_objects[0]
    assert po.inverse_predicate == "ex:ownedBy"


# --- lift kernel -----------------------------------------------------------


def _person_table():
    return pa.table(
        {
            "id": ["1", "2"],
            "name": ["Alice", None],
            "age": [30, 41],
            "v1": ["a", "b"],
            "v2": ["c", "d"],
            "city": ["New York", "Oslo"],
            "friend_id": ["2", "1"],
            "theme": ["http://themes.org/T1", "not-a-uri"],
        }
    )


def test_lift_kernel_end_to_end():
    spec = parse_yarrrml(FULL_YAML)
    kernel = compile_lift(spec, "person")
    out = kernel(_person_table())
    rows = out.to_pylist()
    # type statements
    types = [r for r in rows if r["predicate"].endswith("#type")]
    assert len(types) == 2
    assert types[0]["object_value"] == "http://example.org/Person"
    assert types[0]["object_type"] == "iri"
    # literal with null dropped (row 2 has no name)
    names = [r for r in rows if r["predicate"] == "http://example.org/name"]
    assert len(names) == 1 and names[0]["object_value"] == "Alice"
    # typed literal
    ages = [r for r in rows if r["predicate"] == "http://example.org/age"]
    assert ages[0]["object_datatype"] == "http://www.w3.org/2001/XMLSchema#integer"
    assert ages[0]["object_value"] == "30"
    # language tag
    labels = [r for r in rows if r["predicate"] == "http://example.org/label"]
    assert labels[0]["object_lang"] == "en"
    # sanitized IRI template ("New York" → New_York)
    homes = [r for r in rows if r["predicate"] == "http://example.org/home"]
    assert homes[0]["object_value"] == "http://example.org/place/New_York"
    # graph applied to all
    assert all(r["graph"] == "http://example.org/graph/people" for r in rows)
    # subjects
    assert set(r["subject"] for r in types) == {
        "http://example.org/person/1",
        "http://example.org/person/2",
    }
    # cartesian po: 2 preds x 2 objs x 2 rows = 8
    p12 = [r for r in rows if r["predicate"].endswith(("/p1", "/p2"))]
    assert len(p12) == 8


def test_lift_iri_passthrough():
    spec = parse_yarrrml(
        """
prefixes: {ex: "http://example.org/"}
mappings:
  m:
    sources: [['d~parquet']]
    s: ex:d/$(id)
    po:
      - predicates: ex:theme
        objects: {value: $(theme), type: iri}
"""
    )
    out = compile_lift(spec, "m")(_person_table())
    vals = out.column("object_value").to_pylist()
    # http value passes through untouched; other value is sanitized+expanded
    assert "http://themes.org/T1" in vals
    assert "not-a-uri" in vals  # sanitized: no forbidden chars, no prefix


def test_lift_carry_columns():
    spec = parse_yarrrml(FULL_YAML)
    kernel = compile_lift(spec, "person", carry_columns=("id",))
    out = kernel(_person_table())
    assert "id" in out.column_names
    assert "map_name" in out.column_names
    assert out.column("map_name")[0].as_py() == "person"


def test_condition_execution_po_and_mapping_level():
    """YARRRML ``condition:`` filters EXECUTE here (the reference parses
    them at ``yarrrml_parser.py:608-612`` but never runs them): equal()
    long form on a predicate-object, shorthand string, and mapping-level."""
    import pyarrow as pa

    from etl_pipeline_rdf_star_ray.mapping import LiftKernel, parse_yarrrml

    spec = parse_yarrrml(
        """
prefixes: {ex: "http://example.org/"}
mappings:
  condTM:
    sources: [['t~parquet']]
    subject: ex:r/$(id)
    predicateobjects:
      - predicates: ex:flag
        objects: $(val)
        condition:
          function: equal
          parameters:
            - [str1, $(kind)]
            - [str2, special]
      - [ex:always, $(val)]
  mapCondTM:
    sources: [['t~parquet']]
    condition:
      function: equal
      parameters:
        - [str1, $(kind)]
        - [str2, special]
    subject: ex:r/$(id)
    predicateobjects:
      - [ex:v, $(val)]
"""
    )
    t = pa.table(
        {"id": [1, 2, 3], "kind": ["special", "plain", "special"], "val": ["a", "b", "c"]}
    )
    rows = LiftKernel(spec.maps["condTM"], spec.prefixes)(t).to_pylist()
    flagged = [r for r in rows if r["predicate"].endswith("flag")]
    always = [r for r in rows if r["predicate"].endswith("always")]
    assert sorted(r["object_value"] for r in flagged) == ["a", "c"]
    assert len(always) == 3  # unconditioned PO untouched

    rows2 = LiftKernel(spec.maps["mapCondTM"], spec.prefixes)(t).to_pylist()
    assert sorted(r["object_value"] for r in rows2) == ["a", "c"]


def test_condition_shorthand_and_notequal():
    import pyarrow as pa

    from etl_pipeline_rdf_star_ray.mapping import CompiledCondition

    t = pa.table({"k": ["x", "y", None]})
    eq = CompiledCondition("equal(str1=$(k), str2=x)", {})
    assert list(eq.mask(t)) == [True, False, False]  # null fails equality
    ne = CompiledCondition(
        {"function": "idlab-fn:notEqual",
         "parameters": [{"parameter": "str1", "value": "$(k)"},
                        {"parameter": "str2", "value": "x"}]}, {}
    )
    assert list(ne.mask(t)) == [False, True, True]
