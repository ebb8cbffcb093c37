"""SPARQL-star subset engine tests.

The query corpus mirrors the reference's 26 canonical Postman queries
(``tests/test_postman_queries.py:97-774``) over a deterministic DCAT-ish
quad fixture, with expected results asserted exactly (the reference only
smoke-checks that bindings come back)."""

import json

import pyarrow as pa
import pytest

from etl_pipeline_rdf_star_ray.schema import ANNOTATIONS_TYPE
from etl_pipeline_rdf_star_ray.sparql import (
    SparqlError,
    compile_sparql,
    parse_sparql,
    pattern_masks,
    prune_quads,
    sparql_select,
    sparql_select_json,
)

EX = "http://example.org/"
DCAT = "http://www.w3.org/ns/dcat#"
DCT = "http://purl.org/dc/terms/"
PROV = "http://www.w3.org/ns/prov#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_DT = "http://www.w3.org/2001/XMLSchema#dateTime"
XSD_D = "http://www.w3.org/2001/XMLSchema#double"

_SCHEMA = pa.schema(
    [
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object_value", pa.string()),
        ("object_type", pa.string()),
        ("object_datatype", pa.string()),
        ("object_lang", pa.string()),
        ("graph", pa.string()),
        ("annotations", ANNOTATIONS_TYPE),
    ]
)


def _quads() -> pa.Table:
    rows = []

    def t(s, p, o, ot="iri", dt=None, g=None, ann=None):
        rows.append(
            {
                "subject": s, "predicate": p, "object_value": o,
                "object_type": ot, "object_datatype": dt, "object_lang": None,
                "graph": g, "annotations": ann or [],
            }
        )

    for i in range(6):
        ds = f"{EX}dataset/DS-{i:06d}"
        t(ds, RDF_TYPE, DCAT + "Dataset", g=EX + "g/base")
        t(ds, DCT + "title", f"Dataset {i}", "literal", g=EX + "g/base")
        t(
            ds, DCT + "issued", f"2025-02-{10 + i:02d}T00:00:00Z", "literal",
            XSD_DT, g=EX + "g/base",
        )
        theme = EX + ("themes/A" if i % 2 == 0 else "themes/B")
        src = EX + ("src/crm" if i < 4 else "src/erp")
        t(
            ds, DCAT + "theme", theme, g=EX + "g/base",
            ann=[
                {
                    "predicate": EX + "confidence",
                    "value": f"{0.70 + 0.05 * i:.2f}",
                    "datatype": XSD_D,
                },
                {"predicate": PROV + "wasDerivedFrom", "value": src,
                 "datatype": None},
            ],
        )
    t(DCAT + "Dataset", RDFS + "label", "Dataset", "literal", g=EX + "g/base")
    # a second graph with one extra dataset — FROM <g> must exclude it
    t(EX + "dataset/DS-EXTRA", RDF_TYPE, DCAT + "Dataset", g=EX + "g/other")
    return pa.Table.from_pylist(rows, schema=_SCHEMA)


QUADS = _quads()

PREFIXES = f"""
PREFIX ex: <{EX}>
PREFIX dcat: <{DCAT}>
PREFIX dct: <{DCT}>
PREFIX prov: <{PROV}>
PREFIX rdfs: <{RDFS}>
"""


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def test_parse_shortcuts_and_quoted():
    q = parse_sparql(
        PREFIXES
        + """SELECT ?d ?t WHERE {
          ?d a dcat:Dataset ; dct:title ?t .
          <<?d dcat:theme ?th>> ex:confidence ?c ; prov:wasDerivedFrom ?s .
        }"""
    )
    assert len(q.patterns) == 4  # a + title + two annotation patterns
    assert q.patterns[0].p.value == RDF_TYPE
    quoted = q.patterns[2].s
    assert quoted.p.value == DCAT + "theme"


def test_parse_rejects_union():
    with pytest.raises(SparqlError, match="UNION"):
        parse_sparql("SELECT ?s WHERE { ?x ?y ?z . UNION { ?o ?p ?s } }")


def test_parse_undeclared_prefix():
    with pytest.raises(SparqlError, match="undeclared prefix"):
        parse_sparql("SELECT ?s WHERE { ?s dcat:theme ?o }")


def test_compile_unbound_var():
    with pytest.raises(SparqlError, match="unbound"):
        compile_sparql("SELECT ?s WHERE { ?a ?b ?c } ORDER BY ?nope")


def test_numeric_typed_literal_is_not_sql_injectable():
    """A numeric-typed literal carries arbitrary text — it must never be
    interpolated raw into the compiled SQL."""
    evil = (
        'SELECT ?s WHERE { ?s ?p ?o . FILTER(?o > "(SELECT 1)"'
        "^^<http://www.w3.org/2001/XMLSchema#integer>) }"
    )
    sql, _ = compile_sparql(evil)
    # the payload must appear ONLY inside a quoted string wrapped in a cast
    assert "TRY_CAST('(SELECT 1)' AS DOUBLE)" in sql
    assert sql.count("(SELECT 1)") == sql.count("'(SELECT 1)'")
    assert sparql_select(evil, QUADS).num_rows == 0  # NULL compare, no crash


def test_bad_arity_raises_sparql_error():
    for q in (
        "SELECT (COUNT() AS ?n) WHERE { ?s ?p ?o }",
        "SELECT ?s WHERE { ?s ?p ?o . FILTER(STRSTARTS(?s)) }",
    ):
        with pytest.raises(SparqlError, match="argument"):
            parse_sparql(q)


def test_limit_requires_integer():
    with pytest.raises(SparqlError, match="LIMIT"):
        parse_sparql("SELECT ?s WHERE { ?s ?p ?o } LIMIT 1.5")


def test_double_underscore_var_survives_json():
    doc = sparql_select_json(
        "SELECT ?a__b WHERE { ?a__b ?p ?o } LIMIT 1", QUADS
    )
    assert doc["head"]["vars"] == ["a__b"]
    assert doc["results"]["bindings"][0]["a__b"]["value"]


# ---------------------------------------------------------------------------
# executor — Postman corpus idioms with exact expected results
# ---------------------------------------------------------------------------


def test_count_all_datasets():  # Postman 1.1
    out = sparql_select(
        PREFIXES
        + "SELECT (COUNT(?d) as ?count) WHERE { ?d a dcat:Dataset . }",
        QUADS,
    )
    assert out.to_pylist() == [{"count": 7}]


def test_list_first_n_ordered():  # Postman 1.2
    out = sparql_select(
        PREFIXES
        + """SELECT ?d ?title ?issued WHERE {
             ?d a dcat:Dataset ; dct:title ?title ; dct:issued ?issued .
           } ORDER BY ?d LIMIT 3""",
        QUADS,
    )
    assert [r["title"] for r in out.to_pylist()] == [
        "Dataset 0", "Dataset 1", "Dataset 2",
    ]


def test_quoted_confidence_filter():  # Postman 2.1
    out = sparql_select(
        PREFIXES
        + """SELECT ?d ?title ?conf ?src WHERE {
             ?d dcat:theme ?theme ; dct:title ?title .
             <<?d dcat:theme ?theme>> ex:confidence ?conf ;
                                      prov:wasDerivedFrom ?src .
             FILTER(?conf > 0.80)
           } ORDER BY DESC(?conf)""",
        QUADS,
    )
    rows = out.to_pylist()
    assert [r["conf"] for r in rows] == ["0.95", "0.90", "0.85"]
    assert rows[0]["src"] == EX + "src/erp"


def test_group_by_source_count_distinct():  # Postman 2.2
    out = sparql_select(
        PREFIXES
        + """SELECT ?src (COUNT(DISTINCT ?d) as ?n) WHERE {
             ?d dcat:theme ?theme .
             <<?d dcat:theme ?theme>> prov:wasDerivedFrom ?src .
           } GROUP BY ?src ORDER BY DESC(?n)""",
        QUADS,
    )
    assert out.to_pylist() == [
        {"src": EX + "src/crm", "n": 4},
        {"src": EX + "src/erp", "n": 2},
    ]


def test_bind_and_predicate_filter():  # Postman 2.3
    out = sparql_select(
        PREFIXES
        + """SELECT ?p ?v WHERE {
             BIND(<http://example.org/dataset/DS-000001> as ?d)
             ?d ?p ?v .
             FILTER(?p != <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>)
           } ORDER BY ?p""",
        QUADS,
    )
    assert [r["p"] for r in out.to_pylist()] == [
        DCT + "issued", DCT + "title", DCAT + "theme",
    ]


def test_aggregate_panel():  # Postman 3.x: COUNT/AVG/MIN/MAX per source
    out = sparql_select(
        PREFIXES
        + """SELECT ?src (COUNT(?d) as ?n) (AVG(?c) as ?avgC)
                  (MIN(?c) as ?minC) (MAX(?c) as ?maxC) WHERE {
             ?d dcat:theme ?t .
             <<?d dcat:theme ?t>> ex:confidence ?c ;
                                  prov:wasDerivedFrom ?src .
           } GROUP BY ?src ORDER BY ?src""",
        QUADS,
    )
    rows = out.to_pylist()
    assert rows[0]["src"] == EX + "src/crm"
    assert rows[0]["n"] == 4
    assert abs(rows[0]["avgC"] - 0.775) < 1e-9
    assert rows[0]["minC"] == "0.70" and rows[0]["maxC"] == "0.85"


def test_datetime_filter():  # Postman 4.x recency
    out = sparql_select(
        PREFIXES
        + """SELECT ?d WHERE {
             ?d dct:issued ?ts .
             FILTER(?ts >= "2025-02-13T00:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>)
           } ORDER BY ?d""",
        QUADS,
    )
    assert out.num_rows == 3


def test_max_datetime_aggregate():  # Postman 4.3: MAX over dateTime strings
    out = sparql_select(
        PREFIXES
        + """SELECT (MAX(?ts) as ?latest) WHERE { ?d dct:issued ?ts . }""",
        QUADS,
    )
    assert out.to_pylist() == [{"latest": "2025-02-15T00:00:00Z"}]


def test_optional_label():  # Postman 5.1 ontology introspection
    out = sparql_select(
        PREFIXES
        + """SELECT DISTINCT ?class ?label WHERE {
             ?x a ?class .
             OPTIONAL { ?class rdfs:label ?label }
           }""",
        QUADS,
    )
    assert out.to_pylist() == [{"class": DCAT + "Dataset", "label": "Dataset"}]


def test_strstarts_disjunction():  # Postman 5.4 instance counts
    out = sparql_select(
        PREFIXES
        + """SELECT ?type (COUNT(?i) as ?n) WHERE {
             ?i a ?type .
             FILTER(STRSTARTS(STR(?type), "http://www.w3.org/ns/dcat#")
                 || STRSTARTS(STR(?type), "http://www.w3.org/ns/prov#"))
           } GROUP BY ?type""",
        QUADS,
    )
    assert out.to_pylist() == [{"type": DCAT + "Dataset", "n": 7}]


def test_var_to_var_str_comparison():  # Postman 6.2 source overlap dedup
    out = sparql_select(
        PREFIXES
        + """SELECT DISTINCT ?s1 ?s2 WHERE {
             <<?d1 dcat:theme ?t1>> prov:wasDerivedFrom ?s1 .
             <<?d2 dcat:theme ?t2>> prov:wasDerivedFrom ?s2 .
             FILTER(STR(?s1) < STR(?s2))
           }""",
        QUADS,
    )
    assert out.to_pylist() == [{"s1": EX + "src/crm", "s2": EX + "src/erp"}]


def test_from_graph_scopes_patterns():
    out = sparql_select(
        PREFIXES
        + f"SELECT (COUNT(?d) as ?n) FROM <{EX}g/base> "
        + "WHERE { ?d a dcat:Dataset . }",
        QUADS,
    )
    assert out.to_pylist() == [{"n": 6}]  # DS-EXTRA lives in g/other


def test_sparql_json_shapes_terms():
    doc = sparql_select_json(
        PREFIXES
        + """SELECT ?d ?title WHERE { ?d dct:title ?title . }
             ORDER BY ?d LIMIT 1""",
        QUADS,
    )
    assert doc["head"]["vars"] == ["d", "title"]
    b = doc["results"]["bindings"][0]
    assert b["d"]["type"] == "uri"
    assert b["title"] == {"type": "literal", "value": "Dataset 0"}
    json.dumps(doc)  # serializable


def test_provenance_chain_four_annotations():  # Postman 2.3 full chain
    """Quoted pattern with four chained annotation predicates — each adds a
    qann alias joined through the shared inner-triple variables."""
    rows = []
    ds = EX + "dataset/DS-CHAIN"
    rows.append(
        {
            "subject": ds, "predicate": DCT + "title", "object_value": "T",
            "object_type": "literal", "object_datatype": None,
            "object_lang": None, "graph": None,
            "annotations": [
                {"predicate": PROV + "wasDerivedFrom",
                 "value": EX + "src/crm", "datatype": None},
                {"predicate": PROV + "generatedAtTime",
                 "value": "2025-01-01T00:00:00Z", "datatype": XSD_DT},
                {"predicate": PROV + "wasGeneratedBy",
                 "value": EX + "activity/a1", "datatype": None},
                {"predicate": EX + "rule", "value": "r7", "datatype": None},
            ],
        }
    )
    quads = pa.Table.from_pylist(rows, schema=_SCHEMA)
    out = sparql_select(
        PREFIXES
        + f"""SELECT ?predicate ?value ?source ?timestamp ?activity ?rule
           WHERE {{
             BIND(<{ds}> as ?dataset)
             ?dataset ?predicate ?value .
             FILTER(?predicate != <{RDF_TYPE}>)
             <<?dataset ?predicate ?value>> prov:wasDerivedFrom ?source ;
                                            prov:generatedAtTime ?timestamp ;
                                            prov:wasGeneratedBy ?activity ;
                                            ex:rule ?rule .
           }} ORDER BY ?predicate""",
        quads,
    )
    assert out.to_pylist() == [
        {
            "predicate": DCT + "title", "value": "T",
            "source": EX + "src/crm", "timestamp": "2025-01-01T00:00:00Z",
            "activity": EX + "activity/a1", "rule": "r7",
        }
    ]


def test_cross_system_shared_datasets():  # Postman 6.2
    out = sparql_select(
        PREFIXES
        + """SELECT ?source1 ?source2 (COUNT(?d) as ?sharedDatasets) WHERE {
             ?d dcat:theme ?theme1 ; dcat:theme ?theme2 .
             <<?d dcat:theme ?theme1>> prov:wasDerivedFrom ?source1 .
             <<?d dcat:theme ?theme2>> prov:wasDerivedFrom ?source2 .
             FILTER(?source1 != ?source2)
             FILTER(STR(?source1) < STR(?source2))
           } GROUP BY ?source1 ?source2 ORDER BY DESC(?sharedDatasets)""",
        QUADS,
    )
    # fixture gives each dataset exactly one theme+source → no cross pairs
    assert out.num_rows == 0


def test_reified_statement_count():  # Postman 7.x: count annotated facts
    out = sparql_select(
        PREFIXES
        + """SELECT (COUNT(?conf) as ?reifiedStatements) WHERE {
             <<?d dcat:theme ?t>> ex:confidence ?conf .
           }""",
        QUADS,
    )
    assert out.to_pylist() == [{"reifiedStatements": 6}]


# ---------------------------------------------------------------------------
# batch_queries.rq idioms: GRAPH, UNION, NOT EXISTS, IF/NOW/FLOOR, arithmetic
# ---------------------------------------------------------------------------

OLD_G, NEW_G = EX + "batch/1", EX + "batch/2"


def _two_graph_quads() -> pa.Table:
    rows = []

    def t(s, o, g):
        rows.append(
            {
                "subject": s, "predicate": EX + "p", "object_value": o,
                "object_type": "literal", "object_datatype": None,
                "object_lang": None, "graph": g, "annotations": [],
            }
        )

    t(EX + "a", "v1", OLD_G)
    t(EX + "a", "v1", NEW_G)  # unchanged
    t(EX + "b", "v2", OLD_G)  # removed
    t(EX + "c", "v3", NEW_G)  # added
    return pa.Table.from_pylist(rows, schema=_SCHEMA)


# the reference's batch-diff query text, verbatim modulo its $-placeholders
# (sparql/batch_queries.rq:406-425)
REFERENCE_DIFF_RQ = """
SELECT ?changeType ?subject ?predicate ?object
WHERE {
    {
        GRAPH $NEW_BATCH_URI { ?subject ?predicate ?object }
        FILTER NOT EXISTS { GRAPH $OLD_BATCH_URI { ?subject ?predicate ?object } }
        BIND("added" AS ?changeType)
    }
    UNION
    {
        GRAPH $OLD_BATCH_URI { ?subject ?predicate ?object }
        FILTER NOT EXISTS { GRAPH $NEW_BATCH_URI { ?subject ?predicate ?object } }
        BIND("removed" AS ?changeType)
    }
}
ORDER BY ?changeType ?subject ?predicate
LIMIT $LIMIT
""".replace("$NEW_BATCH_URI", f"<{NEW_G}>").replace(
    "$OLD_BATCH_URI", f"<{OLD_G}>"
).replace("$LIMIT", "100")


def test_reference_batch_diff_runs_verbatim():
    out = sparql_select(REFERENCE_DIFF_RQ, _two_graph_quads())
    assert out.to_pylist() == [
        {"changeType": "added", "subject": EX + "c",
         "predicate": EX + "p", "object": "v3"},
        {"changeType": "removed", "subject": EX + "b",
         "predicate": EX + "p", "object": "v2"},
    ]


def test_sum_if_change_counts():  # batch_queries.rq:434-436
    q = f"""SELECT (SUM(IF(?changeType = "added", 1, 0)) AS ?addedCount)
            (SUM(IF(?changeType = "removed", 1, 0)) AS ?removedCount) WHERE {{
        {{ GRAPH <{NEW_G}> {{ ?s ?p ?o }}
           FILTER NOT EXISTS {{ GRAPH <{OLD_G}> {{ ?s ?p ?o }} }}
           BIND("added" AS ?changeType) }}
        UNION
        {{ GRAPH <{OLD_G}> {{ ?s ?p ?o }}
           FILTER NOT EXISTS {{ GRAPH <{NEW_G}> {{ ?s ?p ?o }} }}
           BIND("removed" AS ?changeType) }} }}"""
    assert sparql_select(q, _two_graph_quads()).to_pylist() == [
        {"addedCount": 1.0, "removedCount": 1.0}
    ]


def test_graph_variable_binding():
    q = ("SELECT ?g (COUNT(?s) as ?n) WHERE { GRAPH ?g { ?s ?p ?o } } "
         "GROUP BY ?g ORDER BY ?g")
    assert sparql_select(q, _two_graph_quads()).to_pylist() == [
        {"g": OLD_G, "n": 2},
        {"g": NEW_G, "n": 2},
    ]


def test_exists_in_bind_if():  # batch_queries.rq:561 shape
    q = f"""SELECT ?s ?state WHERE {{
        GRAPH <{NEW_G}> {{ ?s ?p ?o }}
        BIND(IF(EXISTS {{ GRAPH <{OLD_G}> {{ ?s ?p ?o }} }},
                "unchanged", "added") AS ?state)
    }} ORDER BY ?s"""
    assert sparql_select(q, _two_graph_quads()).to_pylist() == [
        {"s": EX + "a", "state": "unchanged"},
        {"s": EX + "c", "state": "added"},
    ]


def test_now_and_floor_arithmetic():
    q = """SELECT (COUNT(?s) as ?n) WHERE { ?s ?p ?o .
        FILTER(NOW() > "2020-01-01T00:00:00Z"^^<http://www.w3.org/2001/XMLSchema#dateTime>)
        FILTER(FLOOR((10 - 4) / 2) = 3) }"""
    assert sparql_select(q, _two_graph_quads()).to_pylist() == [{"n": 4}]


def test_union_prune_keeps_all_branch_patterns(ray_session):
    """Pruning over a query whose patterns live in UNION branches and NOT
    EXISTS groups must keep candidate rows for every one of them."""
    import ray
    import ray.data as rd

    q = parse_sparql(REFERENCE_DIFF_RQ)
    masks = pattern_masks(q)
    assert masks is not None and len(masks) == 4  # 2 branches + 2 NOT EXISTS
    quads = _two_graph_quads()
    pruned = pa.concat_tables(
        ray.get(prune_quads(rd.from_arrow(quads), q).to_arrow_refs())
    )
    assert pruned.num_rows == quads.num_rows  # graph constants match all rows
    via_ds = sparql_select(REFERENCE_DIFF_RQ, rd.from_arrow(quads))
    assert via_ds.to_pylist() == sparql_select(REFERENCE_DIFF_RQ, quads).to_pylist()


# ---------------------------------------------------------------------------
# distributed path
# ---------------------------------------------------------------------------


def test_pattern_masks_and_prune(ray_session):
    import ray.data as rd

    q = parse_sparql(
        PREFIXES + "SELECT ?d WHERE { ?d a dcat:Dataset ; dct:title ?t . }"
    )
    masks = pattern_masks(q)
    assert masks == [
        [("predicate", RDF_TYPE), ("object_value", DCAT + "Dataset")],
        [("predicate", DCT + "title")],
    ]
    ds = rd.from_arrow(QUADS)
    pruned = pa.concat_tables(
        [b for b in __import__("ray").get(prune_quads(ds, q).to_arrow_refs())]
    )
    preds = set(pruned.column("predicate").to_pylist())
    assert preds == {RDF_TYPE, DCT + "title"}


def test_select_over_dataset_matches_table(ray_session):
    import ray.data as rd

    query = (
        PREFIXES
        + """SELECT ?src (COUNT(DISTINCT ?d) as ?n) WHERE {
             ?d dcat:theme ?theme .
             <<?d dcat:theme ?theme>> prov:wasDerivedFrom ?src .
           } GROUP BY ?src ORDER BY DESC(?n)"""
    )
    via_table = sparql_select(query, QUADS)
    via_ds = sparql_select(query, rd.from_arrow(QUADS))
    assert via_table.to_pylist() == via_ds.to_pylist()


def test_select_over_parquet_path(tmp_path):
    import pyarrow.parquet as pq

    pq.write_table(QUADS, tmp_path / "quads.parquet")
    out = sparql_select(
        PREFIXES + "SELECT (COUNT(?d) as ?n) WHERE { ?d a dcat:Dataset . }",
        str(tmp_path),
    )
    assert out.to_pylist() == [{"n": 7}]


def test_sparql_over_lake_point_in_time(ray_session, tmp_path):
    """Time-travel SPARQL: at_lsn pins the snapshot, counts differ."""
    from etl_pipeline_rdf_star_ray.pipelines import cdc
    from etl_pipeline_rdf_star_ray.sources.synthetic import changelog_dataset
    from etl_pipeline_rdf_star_ray.sparql import sparql_over_lake

    lake = str(tmp_path / "lake")
    cdc.replay(
        lambda lo, hi: changelog_dataset(hi - lo, lsn_start=lo),
        lake, lsn_splits=[4000, 8000], num_partitions=4,
    )
    q = ("PREFIX ex: <http://example.org/> "
         "SELECT (COUNT(?t) as ?n) WHERE { ?t a ex:Turn . }")
    full = sparql_over_lake(lake, q).to_pylist()[0]["n"]
    early = sparql_over_lake(lake, q, at_lsn=3999).to_pylist()[0]["n"]
    assert 0 < early < full
    doc = sparql_over_lake(lake, q, json=True)
    assert doc["results"]["bindings"][0]["n"]["value"] == str(full)


def test_lifted_transcripts_queryable(ray_session):
    sf_dir = "/root/testdata/sf0.001"
    """End-to-end: CDC state → lift → SPARQL over the engine's own quads."""
    from etl_pipeline_rdf_star_ray.pipelines import cdc
    from etl_pipeline_rdf_star_ray.queries import changelog_from_events
    from etl_pipeline_rdf_star_ray.stages.lift import (
        lift_dataset,
        transcripts_spec,
    )

    state = cdc.upsert_dataset(
        changelog_from_events(sf_dir), num_partitions=8,
        hot_convs=["conv_hot"],
    )
    quads = lift_dataset(state, transcripts_spec())
    out = sparql_select(
        """PREFIX ex: <http://example.org/>
           SELECT ?role (COUNT(?turn) as ?n) WHERE {
             ?turn ex:role ?role .
           } GROUP BY ?role ORDER BY DESC(?n) (?role)""",
        quads,
    )
    rows = out.to_pylist()
    assert rows and all(r["n"] > 0 for r in rows)
    total = sum(r["n"] for r in rows)
    assert total == state.count()


# ---------------------------------------------------------------------------
# property paths (round-2 verdict item 8)
# ---------------------------------------------------------------------------


def _path_quads() -> pa.Table:
    # chain a -p-> b -p-> c -p-> d, plus a -q-> x -q-> y
    return pa.table(
        {
            "subject": ["a", "b", "c", "a", "x"],
            "predicate": ["p", "p", "p", "q", "q"],
            "object_value": ["b", "c", "d", "x", "y"],
        }
    )


def test_path_one_or_more_is_transitive_closure():
    t = sparql_select(
        "SELECT ?x ?y WHERE { ?x <p>+ ?y } ORDER BY ?x ?y", _path_quads()
    )
    assert list(zip(t.column("x").to_pylist(), t.column("y").to_pylist())) == [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    ]


def test_path_zero_or_more_and_zero_or_one():
    t = sparql_select("SELECT ?y WHERE { <a> <p>* ?y } ORDER BY ?y", _path_quads())
    assert t.column("y").to_pylist() == ["a", "b", "c", "d"]
    t = sparql_select("SELECT ?y WHERE { <a> <p>? ?y } ORDER BY ?y", _path_quads())
    assert t.column("y").to_pylist() == ["a", "b"]


def test_path_inverse_and_sequence():
    t = sparql_select("SELECT ?x WHERE { ?x ^<p> <c> }", _path_quads())
    assert t.column("x").to_pylist() == ["d"]
    t = sparql_select("SELECT ?z WHERE { <a> <q>/<q> ?z }", _path_quads())
    assert t.column("z").to_pylist() == ["y"]
    # sequence into a closure; internal fresh vars never leak into SELECT *
    t = sparql_select(
        "SELECT * WHERE { <a> <q>/<q> ?z } ORDER BY ?z", _path_quads()
    )
    assert t.column_names == ["z"]


def test_path_rejections_are_explicit():
    for bad, frag in [
        ("SELECT ?x WHERE { ?x ?p+ ?y }", "constant IRI predicate"),
        (
            "SELECT ?v WHERE { << ?s <p> ?o >> <p>+ ?v }",
            "annotation",
        ),
        # sequence-alternation executes in plain WHERE blocks (round 5)
        # but stays a documented rejection inside GRAPH blocks and
        # CONSTRUCT templates (no enclosing group to hold the UNION)
        (
            "SELECT ?x WHERE { GRAPH <g> { ?x <p>/<q>|<r> ?y } }",
            "UNION",
        ),
        (
            "CONSTRUCT { ?x <p>/<q>|<r> ?y } WHERE { ?x <p> ?y }",
            "UNION",
        ),
    ]:
        with pytest.raises(SparqlError, match=frag):
            compile_sparql(bad)


def test_path_mixed_sequence_alternation_executes():
    """round 5: 'a/b|c' = (a/b)|c lowers to UNION ALL — formerly a
    documented rejection (r4 verdict item 6)."""
    # (q/q)|p from <a>: q/q gives y; p gives b
    t = sparql_select(
        "SELECT ?z WHERE { <a> <q>/<q>|<p> ?z } ORDER BY ?z", _path_quads()
    )
    assert t.column("z").to_pylist() == ["b", "y"]
    # alternation of two sequences, with an inverse branch: from <c>,
    # ^p gives b; p/p gives nothing (c->d only one hop)
    t = sparql_select(
        "SELECT ?z WHERE { <c> <p>/<p>|^<p> ?z } ORDER BY ?z", _path_quads()
    )
    assert t.column("z").to_pylist() == ["b"]
    # closure step in one branch: p+|q from <a> = {b,c,d} ∪ {x}
    t = sparql_select(
        "SELECT ?z WHERE { <a> <p>+|<q> ?z } ORDER BY ?z", _path_quads()
    )
    assert t.column("z").to_pylist() == ["b", "c", "d", "x"]
    # bag semantics: duplicate SEQUENCE branches yield the solution twice
    # (UNION ALL), exactly like the SPARQL UNION rewrite. (A plain-IRI
    # duplicate p|p stays the IN-list fast path, which dedups predicates —
    # set semantics over a degenerate alternation.)
    t = sparql_select(
        "SELECT ?z WHERE { <a> <q>/<q>|<q>/<q> ?z }", _path_quads()
    )
    assert t.column("z").to_pylist() == ["y", "y"]
    # internal fresh chain vars never leak into SELECT *
    t = sparql_select(
        "SELECT * WHERE { <a> <q>/<q>|<p> ?z } ORDER BY ?z", _path_quads()
    )
    assert t.column_names == ["z"]
    # joins with the rest of the group on shared vars
    t = sparql_select(
        "SELECT ?z WHERE { <a> <q>/<q>|<p> ?z . ?z <q> ?w }", _path_quads()
    )
    assert t.column("z").to_pylist() == []


def _graphed_path_quads() -> pa.Table:
    # g1: a -p-> b -p-> c ; g2: c -p-> d  (closure must NOT cross graphs)
    return pa.table(
        {
            "subject": ["a", "b", "c"],
            "predicate": ["p", "p", "p"],
            "object_value": ["b", "c", "d"],
            "graph": ["g1", "g1", "g2"],
        }
    )


def test_path_closure_under_graph_var():
    """round 5: property paths under GRAPH ?var execute — the path CTE
    carries the active graph and the closure stays within one graph
    (formerly rejected; r4 verdict item 6)."""
    t = sparql_select(
        "SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x <p>+ ?y } } ORDER BY ?g ?x ?y",
        _graphed_path_quads(),
    )
    rows = list(
        zip(
            t.column("g").to_pylist(),
            t.column("x").to_pylist(),
            t.column("y").to_pylist(),
        )
    )
    # a->c within g1; NO a->d (would require crossing g1 into g2)
    assert rows == [
        ("g1", "a", "b"), ("g1", "a", "c"), ("g1", "b", "c"),
        ("g2", "c", "d"),
    ]
    # graph var joins against other patterns on the shared ?g
    t = sparql_select(
        "SELECT ?x ?y WHERE { GRAPH ?g { ?x <p>+ ?y } "
        "GRAPH ?g { <c> <p> ?d } } ORDER BY ?x ?y",
        _graphed_path_quads(),
    )
    assert list(zip(t.column("x").to_pylist(), t.column("y").to_pylist())) == [
        ("c", "d")
    ]
    # constant-graph scoping still prunes to the named graph only
    t = sparql_select(
        "SELECT ?y WHERE { GRAPH <g1> { <a> <p>+ ?y } } ORDER BY ?y",
        _graphed_path_quads(),
    )
    assert t.column("y").to_pylist() == ["b", "c"]
    # zero-or-more under GRAPH ?var: zero-length pairs carry their graph
    t = sparql_select(
        "SELECT ?g ?y WHERE { GRAPH ?g { <c> <p>* ?y } } ORDER BY ?g ?y",
        _graphed_path_quads(),
    )
    rows = list(zip(t.column("g").to_pylist(), t.column("y").to_pylist()))
    assert ("g2", "d") in rows and ("g1", "c") in rows and ("g2", "c") in rows


def test_path_prune_disables_itself():
    """prune_quads must pass paths through unpruned: the closure traverses
    rows whose constants no pattern mentions."""
    from etl_pipeline_rdf_star_ray.sparql import parse_sparql, pattern_masks

    q = parse_sparql("SELECT ?y WHERE { <a> <p>+ ?y }")
    assert pattern_masks(q) is None


def test_sparql_path_located_matches_oracle():
    """Driver-registered property-path query: closure over lifted
    customer→nation→region edges equals the DuckDB recursive-CTE oracle."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tests.oracle_harness import run as oracle_run

    assert oracle_run("/root/testdata/sf0.001", ["sparql_path_located"]) == 0


# ---------------------------------------------------------------------------
# ASK / CONSTRUCT query forms (reference: rdf-workbench.py:459-468)
# ---------------------------------------------------------------------------


def test_ask_true_and_false():
    from etl_pipeline_rdf_star_ray.sparql import sparql_ask

    assert sparql_ask(
        PREFIXES + "ASK WHERE { ?d a dcat:Dataset }", QUADS
    ) is True
    assert sparql_ask(
        PREFIXES + "ASK { ?d a ex:Nothing }", QUADS
    ) is False


def test_ask_all_constant_pattern():
    from etl_pipeline_rdf_star_ray.sparql import sparql_ask

    q = PREFIXES + "ASK { <http://example.org/dataset/DS-000000> a dcat:Dataset }"
    assert sparql_ask(q, QUADS) is True
    q2 = PREFIXES + "ASK { <http://example.org/dataset/DS-000000> a ex:Nope }"
    assert sparql_ask(q2, QUADS) is False


def test_ask_with_filter_and_from():
    from etl_pipeline_rdf_star_ray.sparql import sparql_ask

    # DS-EXTRA exists only in g/other; FROM g/base must exclude it
    assert sparql_ask(
        PREFIXES
        + f"ASK FROM <{EX}g/base> WHERE {{ ex:dataset/DS-EXTRA a dcat:Dataset }}".replace("ex:dataset/DS-EXTRA", f"<{EX}dataset/DS-EXTRA>"),
        QUADS,
    ) is False


def test_construct_basic_template():
    from etl_pipeline_rdf_star_ray.sparql import sparql_construct

    out = sparql_construct(
        PREFIXES
        + """CONSTRUCT { ?d ex:hasTitle ?t . ?d a ex:Doc }
             WHERE { ?d a dcat:Dataset ; dct:title ?t }""",
        QUADS,
    )
    # 6 datasets with titles -> 6 hasTitle + 6 type triples
    assert out.num_rows == 12
    preds = set(out.column("predicate").to_pylist())
    assert preds == {EX + "hasTitle", RDF_TYPE}
    # term info: object of hasTitle is a literal, of rdf:type an IRI
    by_pred = {}
    for r in out.to_pylist():
        by_pred.setdefault(r["predicate"], set()).add(r["object_type"])
    assert by_pred[EX + "hasTitle"] == {"literal"}
    assert by_pred[RDF_TYPE] == {"iri"}


def test_construct_dedups_and_sorts():
    from etl_pipeline_rdf_star_ray.sparql import sparql_construct

    # every dataset yields the same constant triple -> set semantics: 1 row
    out = sparql_construct(
        PREFIXES
        + "CONSTRUCT { ex:corpus a ex:Corpus } WHERE { ?d a dcat:Dataset }",
        QUADS,
    )
    assert out.num_rows == 1
    assert out.column("subject")[0].as_py() == EX + "corpus"
    assert out.column("object_type")[0].as_py() == "iri"


def test_construct_drops_unbound_optional_rows():
    from etl_pipeline_rdf_star_ray.sparql import sparql_construct

    # rdfs:label exists only for the dcat:Dataset class node, not datasets;
    # OPTIONAL leaves ?lbl unbound for all 6 -> those template rows drop
    out = sparql_construct(
        PREFIXES
        + """CONSTRUCT { ?d ex:label ?lbl . ?d a ex:Doc }
             WHERE { ?d a dcat:Dataset . OPTIONAL { ?d rdfs:label ?lbl } }""",
        QUADS,
    )
    preds = out.column("predicate").to_pylist()
    assert preds.count(RDF_TYPE) == 7  # 6 base datasets + DS-EXTRA (g/other)
    assert preds.count(EX + "label") == 0


def test_construct_output_requeryable():
    """CONSTRUCT output conforms to the quads relation: feed it back in."""
    from etl_pipeline_rdf_star_ray.sparql import sparql_construct, sparql_select

    out = sparql_construct(
        PREFIXES
        + "CONSTRUCT { ?d ex:hasTitle ?t } WHERE { ?d dct:title ?t }",
        QUADS,
    )
    again = sparql_select(
        PREFIXES + "SELECT ?t WHERE { ?d ex:hasTitle ?t } ORDER BY ?t", out
    )
    assert again.num_rows == 6
    assert again.column("t")[0].as_py() == "Dataset 0"


def test_construct_rejections():
    from etl_pipeline_rdf_star_ray.sparql import sparql_construct

    with pytest.raises(SparqlError, match="unbound variable"):
        sparql_construct(
            PREFIXES + "CONSTRUCT { ?x ex:p ?nope } WHERE { ?x a dcat:Dataset }",
            QUADS,
        )
    with pytest.raises(SparqlError, match="empty CONSTRUCT template"):
        parse_sparql(PREFIXES + "CONSTRUCT { } WHERE { ?x ?p ?o }")
    with pytest.raises(SparqlError, match="quoted-triple"):
        parse_sparql(
            PREFIXES
            + "CONSTRUCT { <<?s ex:p ?o>> ex:conf ?c } WHERE { ?s ex:p ?o }"
        )
    with pytest.raises(SparqlError, match="property-path"):
        parse_sparql(
            PREFIXES + "CONSTRUCT { ?s ex:p+ ?o } WHERE { ?s ex:p ?o }"
        )
    with pytest.raises(SparqlError, match="GROUP BY"):
        parse_sparql(
            PREFIXES
            + "CONSTRUCT { ?s ex:p ?o } WHERE { ?s ex:p ?o } GROUP BY ?s"
        )


def test_construct_literal_constant_with_datatype():
    from etl_pipeline_rdf_star_ray.sparql import sparql_construct

    out = sparql_construct(
        PREFIXES
        + 'CONSTRUCT { ?d ex:score "1.0"^^<http://www.w3.org/2001/XMLSchema#double> } '
        + "WHERE { ?d a dcat:Dataset }",
        QUADS,
    )
    assert out.num_rows == 7  # 6 base + DS-EXTRA in g/other
    assert out.column("object_datatype")[0].as_py().endswith("double")


def test_query_json_dispatch():
    from etl_pipeline_rdf_star_ray.sparql import sparql_query_json

    doc = sparql_query_json(PREFIXES + "ASK { ?d a dcat:Dataset }", QUADS)
    assert doc == {"head": {}, "boolean": True}
    doc = sparql_query_json(
        PREFIXES + "CONSTRUCT { ?d a ex:Doc } WHERE { ?d a dcat:Dataset }",
        QUADS,
    )
    assert doc["count"] == 7
    assert all(t.endswith(" .") for t in doc["triples"])
    assert f"<{EX}dataset/DS-000000> <{RDF_TYPE}> <{EX}Doc> ." in doc["triples"]
    doc = sparql_query_json(
        PREFIXES + "SELECT ?d WHERE { ?d a dcat:Dataset } LIMIT 1", QUADS
    )
    assert "results" in doc


def test_construct_ntriples_literal_escaping():
    from etl_pipeline_rdf_star_ray.sparql import _format_term

    assert _format_term('he said "hi"', "literal", None, None) == '"he said \\"hi\\""'
    assert _format_term("v", "literal", XSD_D, None) == f'"v"^^<{XSD_D}>'
    assert _format_term("bonjour", "literal", None, "fr") == '"bonjour"@fr'
    assert _format_term(EX + "x", "iri", None, None) == f"<{EX}x>"


# ---------------------------------------------------------------------------
# VALUES, is* term tests, OPTIONAL { GRAPH … FILTER … } (explorer idioms)
# ---------------------------------------------------------------------------


def test_values_single_var():
    out = sparql_select(
        PREFIXES
        + f"""SELECT ?d ?t WHERE {{
            VALUES ?d {{ <{EX}dataset/DS-000000> <{EX}dataset/DS-000002> }}
            ?d dct:title ?t }} ORDER BY ?d""",
        QUADS,
    )
    assert out.column("t").to_pylist() == ["Dataset 0", "Dataset 2"]


def test_values_multi_var_and_undef():
    out = sparql_select(
        PREFIXES
        + f"""SELECT ?d ?t WHERE {{
            VALUES (?d ?t) {{
              (<{EX}dataset/DS-000000> "Dataset 0")
              (<{EX}dataset/DS-000001> UNDEF)
              (<{EX}dataset/DS-000002> "WRONG TITLE")
            }}
            ?d dct:title ?t }} ORDER BY ?d""",
        QUADS,
    )
    # row 0 matches its exact title, row 1 (UNDEF) matches any, row 2's
    # constant disagrees with the data -> dropped
    assert out.column("t").to_pylist() == ["Dataset 0", "Dataset 1"]


def test_values_only_group():
    out = sparql_select(
        "SELECT ?x WHERE { VALUES ?x { <urn:a> <urn:b> } } ORDER BY ?x",
        QUADS,
    )
    assert out.column("x").to_pylist() == ["urn:a", "urn:b"]


def test_values_rejections():
    with pytest.raises(SparqlError, match="at least one variable"):
        parse_sparql("SELECT ?x WHERE { VALUES { <urn:a> } ?x ?p ?o }")
    with pytest.raises(SparqlError, match="constants or UNDEF"):
        parse_sparql("SELECT ?x WHERE { VALUES ?x { ?y } }")
    with pytest.raises(SparqlError, match="row has"):
        parse_sparql(
            "SELECT ?x WHERE { VALUES (?x ?y) { (<urn:a>) } }"
        )


def test_isblank_isiri_isliteral():
    from etl_pipeline_rdf_star_ray.sparql import sparql_ask

    # object-position var: term kind from object_type
    n_lit = sparql_select(
        PREFIXES
        + "SELECT (COUNT(?o) AS ?n) WHERE { ?s dct:title ?o . "
        + "FILTER(isLiteral(?o)) }",
        QUADS,
    ).column("n")[0].as_py()
    assert n_lit == 6
    n_iri = sparql_select(
        PREFIXES
        + "SELECT (COUNT(?o) AS ?n) WHERE { ?s dcat:theme ?o . "
        + "FILTER(isIRI(?o)) }",
        QUADS,
    ).column("n")[0].as_py()
    assert n_iri == 6
    # subject-position var: IRIs, never blank in this fixture
    assert sparql_ask(
        PREFIXES + "ASK { ?s a dcat:Dataset . FILTER(!isBlank(?s)) }", QUADS
    )
    assert not sparql_ask(
        PREFIXES + "ASK { ?s a dcat:Dataset . FILTER(isBlank(?s)) }", QUADS
    )
    assert not sparql_ask(
        PREFIXES + "ASK { ?s a dcat:Dataset . FILTER(isLiteral(?s)) }", QUADS
    )


def test_optional_with_graph_and_filter():
    # the explorer idiom: OPTIONAL { GRAPH ?g2 { ?d … } FILTER(...) } —
    # only the dcat:Dataset class node has an rdfs:label in the fixture
    out = sparql_select(
        PREFIXES
        + """SELECT ?d ?lbl WHERE {
             ?d a dcat:Dataset .
             OPTIONAL { GRAPH ?g2 { ?d dct:title ?lbl }
                        FILTER(CONTAINS(?lbl, "0")) }
           } ORDER BY ?d ?lbl""",
        QUADS,
    )
    assert out.num_rows == 7
    rows = out.to_pylist()
    # only DS-000000's title contains "0"; everything else keeps NULL
    assert [r["lbl"] for r in rows].count("Dataset 0") == 1
    assert sum(1 for r in rows if r["lbl"] is None) == 6


def test_optional_rejects_nested_forms():
    with pytest.raises(SparqlError, match="OPTIONAL groups support"):
        parse_sparql(
            "SELECT ?s WHERE { ?s ?p ?o . "
            "OPTIONAL { ?s ?p2 ?x . BIND(1 AS ?y) } }"
        )


def test_sparql_construct_regions_matches_oracle():
    """Driver-registered CONSTRUCT+path+VALUES query: materialized
    urn:inRegion triples equal the DuckDB recursive-CTE oracle."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tests.oracle_harness import run as oracle_run

    assert oracle_run("/root/testdata/sf0.001", ["sparql_construct_regions"]) == 0


# ---------------------------------------------------------------------------
# property-path alternation + DESCRIBE (round 4)
# ---------------------------------------------------------------------------


def test_path_alternation_of_constant_iris():
    """rdfs:label|dct:title — the common label-fallback alternation compiles
    to one predicate IN-list scan."""
    out = sparql_select(
        PREFIXES
        + "SELECT ?s ?v WHERE { ?s rdfs:label|dct:title ?v } ORDER BY ?v",
        QUADS,
    )
    vals = out.column("v").to_pylist()
    # 6 dct:title literals + 1 rdfs:label
    assert len(vals) == 7 and "Dataset" in vals and "Dataset 3" in vals
    sql, _ = compile_sparql(
        PREFIXES + "SELECT ?s WHERE { ?s rdfs:label|dct:title ?s2 }"
    )
    assert "IN (" in sql


def test_path_alternation_prunes_soundly():
    """pattern_masks fans an AltPred into one mask per alternative, so the
    distributed pre-filter keeps rows for BOTH predicates."""
    q = parse_sparql(
        PREFIXES + "SELECT ?s WHERE { ?s rdfs:label|dct:title ?v }"
    )
    masks = pattern_masks(q)
    preds = {dict(m)["predicate"] for m in masks}
    assert preds == {RDFS + "label", DCT + "title"}


def test_path_alternation_rejected_forms():
    # round 5: mixed sequences / inverses / closures in an alternation now
    # EXECUTE (UNION-lowered PathAlt — test_path_mixed_sequence_alternation
    # _executes); variables in a path remain invalid SPARQL and reject
    for ok in [
        "SELECT ?s WHERE { ?s ex:a/ex:b|ex:c ?o }",   # sequence mixed
        "SELECT ?s WHERE { ?s ex:a|ex:b/ex:c ?o }",   # sequence after
        "SELECT ?s WHERE { ?s ^ex:a|ex:b ?o }",       # inverse alternative
        "SELECT ?s WHERE { ?s ex:a|ex:b+ ?o }",       # modified alternative
        "SELECT ?s WHERE { ?s ex:a+|ex:b ?o }",       # modified first
    ]:
        parse_sparql(PREFIXES + ok)
    with pytest.raises(SparqlError, match="variable"):
        parse_sparql(PREFIXES + "SELECT ?s WHERE { ?s ex:a|?p ?o }")


def test_describe_constant_iri():
    from etl_pipeline_rdf_star_ray.sparql import sparql_describe

    out = sparql_describe(
        PREFIXES + "DESCRIBE <http://example.org/dataset/DS-000000>", QUADS
    )
    # type + title + issued + theme, all with the described subject
    assert out.num_rows == 4
    assert set(out.column("subject").to_pylist()) == {EX + "dataset/DS-000000"}
    assert DCT + "title" in out.column("predicate").to_pylist()


def test_describe_var_where_group():
    from etl_pipeline_rdf_star_ray.sparql import sparql_query

    out = sparql_query(
        PREFIXES
        + 'DESCRIBE ?d WHERE { ?d dct:title "Dataset 2" }',
        QUADS,
    )
    assert set(out.column("subject").to_pylist()) == {EX + "dataset/DS-000002"}
    assert out.num_rows == 4


def test_describe_mixed_terms_and_json_shape():
    from etl_pipeline_rdf_star_ray.sparql import sparql_query_json

    doc = sparql_query_json(
        PREFIXES
        + "DESCRIBE <http://example.org/dataset/DS-000001> ?d "
        + 'WHERE { ?d dct:title "Dataset 0" }',
        QUADS,
    )
    assert doc["count"] == 8  # 4 triples each for DS-000000 and DS-000001
    assert all(t.endswith(" .") for t in doc["triples"])


def test_describe_unknown_subject_is_empty():
    from etl_pipeline_rdf_star_ray.sparql import sparql_describe

    out = sparql_describe(PREFIXES + "DESCRIBE ex:nope", QUADS)
    assert out.num_rows == 0


def test_describe_over_dataset_and_parquet(tmp_path, ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from etl_pipeline_rdf_star_ray.sparql import sparql_describe

    q = PREFIXES + "DESCRIBE <http://example.org/dataset/DS-000003>"
    want = sparql_describe(q, QUADS)

    p = str(tmp_path / "quads.parquet")
    pq.write_table(QUADS.drop_columns(["annotations"]), p)
    got_path = sparql_describe(q, p)
    assert got_path.equals(want)

    got_ds = sparql_describe(q, rd.from_arrow(QUADS))
    assert got_ds.equals(want)


def test_describe_rejected_forms():
    with pytest.raises(SparqlError, match="DESCRIBE \\*"):
        parse_sparql("DESCRIBE * WHERE { ?s ?p ?o }")
    with pytest.raises(SparqlError, match="empty DESCRIBE"):
        parse_sparql("DESCRIBE WHERE { ?s ?p ?o }")
    with pytest.raises(SparqlError, match="binding them"):
        parse_sparql("DESCRIBE ?d")


# ---------------------------------------------------------------------------
# grouped path closures + negated property sets (round 4)
# ---------------------------------------------------------------------------


def _group_quads() -> pa.Table:
    # p-chain a->b->c->d, q-chain a->x->y, one stray r edge d->e
    return pa.table(
        {
            "subject": ["a", "b", "c", "a", "x", "d"],
            "predicate": ["p", "p", "p", "q", "q", "r"],
            "object_value": ["b", "c", "d", "x", "y", "e"],
        }
    )


def test_grouped_sequence_closure():
    # composite edges of (p/p): (a,c), (b,d); closure from a stops at c
    t = sparql_select(
        "SELECT ?y WHERE { <a> (<p>/<p>)+ ?y } ORDER BY ?y", _group_quads()
    )
    assert t.column("y").to_pylist() == ["c"]
    # '*' adds the zero-length pair; '?' likewise but without recursion
    t = sparql_select(
        "SELECT ?y WHERE { <a> (<p>/<p>)* ?y } ORDER BY ?y", _group_quads()
    )
    assert t.column("y").to_pylist() == ["a", "c"]
    t = sparql_select(
        "SELECT ?y WHERE { <a> (<p>/<p>)? ?y } ORDER BY ?y", _group_quads()
    )
    assert t.column("y").to_pylist() == ["a", "c"]


def test_grouped_sequence_bare_and_inverse():
    # a bare group is just the composite-edge relation
    t = sparql_select("SELECT ?y WHERE { <a> (<p>/<p>) ?y }", _group_quads())
    assert t.column("y").to_pylist() == ["c"]
    # inverse steps traverse object->subject: b -p-> c, then ^p from c: b
    t = sparql_select("SELECT ?y WHERE { <b> (<p>/^<p>) ?y }", _group_quads())
    assert t.column("y").to_pylist() == ["b"]
    # ^(a/b) == (^b/^a): ?x ^(p/p) <a> means <a> (p/p) ?x
    t = sparql_select("SELECT ?x WHERE { ?x ^(<p>/<p>) <a> }", _group_quads())
    assert t.column("x").to_pylist() == ["c"]
    # closure over pure-inverse steps walks the chain backwards
    t = sparql_select(
        "SELECT ?x WHERE { ?x (^<p>)+ <a> } ORDER BY ?x", _group_quads()
    )
    assert t.column("x").to_pylist() == ["b", "c", "d"]


def test_grouped_alternation_closure():
    # (p|q)+ from a reaches both chains transitively
    t = sparql_select(
        "SELECT ?y WHERE { <a> (<p>|<q>)+ ?y } ORDER BY ?y", _group_quads()
    )
    assert t.column("y").to_pylist() == ["b", "c", "d", "x", "y"]
    t = sparql_select(
        "SELECT ?y WHERE { <a> (<p>|<q>)* ?y } ORDER BY ?y", _group_quads()
    )
    assert t.column("y").to_pylist() == ["a", "b", "c", "d", "x", "y"]


def test_closure_cte_shared_between_star_and_plus():
    """`(p/p)*` registers its inner closure so a sibling `(p/p)+` of the
    SAME node reuses the CTE — results must still differ by the
    zero-length pairs."""
    t = sparql_select(
        "SELECT ?y ?z WHERE { <a> (<p>/<p>)* ?y . <a> (<p>/<p>)+ ?z } "
        "ORDER BY ?y ?z",
        _group_quads(),
    )
    assert list(
        zip(t.column("y").to_pylist(), t.column("z").to_pylist())
    ) == [("a", "c"), ("c", "c")]


def test_negated_property_set():
    t = sparql_select(
        "SELECT ?s ?o WHERE { ?s !<p> ?o } ORDER BY ?s ?o", _group_quads()
    )
    assert list(
        zip(t.column("s").to_pylist(), t.column("o").to_pylist())
    ) == [("a", "x"), ("d", "e"), ("x", "y")]
    t = sparql_select(
        "SELECT ?s ?o WHERE { ?s !(<p>|<q>) ?o }", _group_quads()
    )
    assert t.column("s").to_pylist() == ["d"]
    assert t.column("o").to_pylist() == ["e"]


def test_negated_set_pruning_keeps_other_constants():
    """NegPred contributes no (col, value) mask but the pattern's other
    constants still prune; a constant-free negated pattern disables
    pruning entirely."""
    q = parse_sparql("SELECT ?o WHERE { <a> !<p> ?o }")
    assert pattern_masks(q) == [[("subject", "a")]]
    assert pattern_masks(parse_sparql("SELECT ?s ?o WHERE { ?s !<p> ?o }")) is None
    # grouped closures (and bare groups, conservatively) disable pruning
    assert pattern_masks(parse_sparql("SELECT ?y WHERE { <a> (<p>/<q>)+ ?y }")) is None
    assert pattern_masks(parse_sparql("SELECT ?y WHERE { <a> (<p>/<q>) ?y }")) is None


def test_grouped_path_rejections_are_explicit():
    for bad, frag in [
        ("SELECT ?x WHERE { ?x ^!<p> ?y }", "inverse of a negated"),
        ("SELECT ?x WHERE { ?x !(^<p>) ?y }", "inverse members"),
        ("SELECT ?x WHERE { ?x !(<p>)+ ?y }", "closure modifiers over"),
        ("SELECT ?x WHERE { ?x !?p ?y }", "constant IRI members"),
        ("SELECT ?x WHERE { ?x (<p>+/<q>) ?y }", "INSIDE a path group"),
        ("SELECT ?x WHERE { ?x (<p>/<q>|<r>) ?y }", "mixing '/' and '|'"),
        ("SELECT ?x WHERE { ?x ^(<p>|<q>) ?y }", "distribute the inverse"),
        ("SELECT ?x WHERE { ?x (^<p>|<q>) ?y }", "inverse elements"),
        ("SELECT ?x WHERE { ?x (?p/<q>) ?y }", "constant IRI elements"),
    ]:
        with pytest.raises(SparqlError, match=frag):
            compile_sparql(bad)
    # grouped/negated forms stay off annotation predicates and CONSTRUCT
    with pytest.raises(SparqlError, match="annotation"):
        compile_sparql("SELECT ?v WHERE { << ?s <p> ?o >> (<p>/<q>)+ ?v }")
    with pytest.raises(SparqlError, match="CONSTRUCT template"):
        compile_sparql("CONSTRUCT { ?s !<p> ?o } WHERE { ?s <q> ?o }")


def test_grouped_closure_matches_duckdb_oracle():
    """Random DAG: (p/q)+ results equal a hand-written DuckDB recursive
    CTE over the same composite edges."""
    import duckdb
    import random

    rng = random.Random(41)
    n = 40
    rows = {"subject": [], "predicate": [], "object_value": []}
    for _ in range(160):
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        rows["subject"].append(f"n{min(a, b)}")
        rows["predicate"].append(rng.choice(["p", "q", "r"]))
        rows["object_value"].append(f"n{max(a, b)}")
    quads = pa.table(rows)

    got = sparql_select(
        "SELECT ?x ?y WHERE { ?x (<p>/<q>)+ ?y } ORDER BY ?x ?y", quads
    )
    con = duckdb.connect()
    con.register("quads", quads)
    want = con.execute(
        """
        WITH RECURSIVE edges AS (
            SELECT e0.subject AS s, e1.object_value AS o
            FROM quads e0, quads e1
            WHERE e0.predicate = 'p' AND e1.predicate = 'q'
              AND e1.subject = e0.object_value
        ), cl AS (
            SELECT s, o FROM edges
            UNION
            SELECT r.s, e.o FROM cl r JOIN edges e ON e.s = r.o
        )
        SELECT DISTINCT s AS x, o AS y FROM cl ORDER BY x, y
        """
    ).arrow()
    assert got.column("x").to_pylist() == want.column("x").to_pylist()
    assert got.column("y").to_pylist() == want.column("y").to_pylist()


# ---------------------------------------------------------------------------
# MINUS + HAVING (round 4)
# ---------------------------------------------------------------------------


def _minus_quads() -> pa.Table:
    return pa.table(
        {
            "subject": ["a", "b", "c", "a", "b", "d", "e"],
            "predicate": ["type", "type", "type", "flag", "flag", "type", "other"],
            "object_value": ["T", "T", "T", "x", "y", "T", "z"],
        }
    )


def test_minus_subtracts_on_shared_vars():
    t = sparql_select(
        "SELECT ?s WHERE { ?s <type> <T> MINUS { ?s <flag> <x> } } ORDER BY ?s",
        _minus_quads(),
    )
    assert t.column("s").to_pylist() == ["b", "c", "d"]
    # FILTER inside the MINUS group scopes to the group
    t = sparql_select(
        'SELECT ?s WHERE { ?s <type> <T> MINUS { ?s <flag> ?f '
        'FILTER(?f = "y") } } ORDER BY ?s',
        _minus_quads(),
    )
    assert t.column("s").to_pylist() == ["a", "c", "d"]


def test_minus_disjoint_domain_removes_nothing():
    """SPARQL 1.1 §8.3: a MINUS group sharing no variable subtracts
    nothing (the classic MINUS-vs-NOT-EXISTS divergence)."""
    t = sparql_select(
        "SELECT ?s WHERE { ?s <type> <T> MINUS { ?x <other> ?y } } ORDER BY ?s",
        _minus_quads(),
    )
    assert t.column("s").to_pylist() == ["a", "b", "c", "d"]


def test_minus_unbound_shared_var_survives():
    """A solution whose only shared variable is unbound (OPTIONAL miss)
    has an empty shared domain — kept, unlike NOT EXISTS."""
    quads = pa.table(
        {
            "subject": ["a", "b", "a", "b"],
            "predicate": ["type", "type", "lab", "bad"],
            "object_value": ["T", "T", "L", "L"],
        }
    )
    t = sparql_select(
        "SELECT ?s WHERE { ?s <type> <T> OPTIONAL { ?s <lab> ?l } "
        "MINUS { ?z <bad> ?l } } ORDER BY ?s",
        quads,
    )
    # a's ?l = L matches the MINUS binding -> removed; b's ?l is unbound
    # -> empty shared domain -> kept
    assert t.column("s").to_pylist() == ["b"]
    # the NOT EXISTS counterpart removes BOTH (NULL-compatible semantics
    # differ): pin the divergence
    t2 = sparql_select(
        "SELECT ?s WHERE { ?s <type> <T> OPTIONAL { ?s <lab> ?l } "
        "FILTER NOT EXISTS { ?z <bad> ?l } } ORDER BY ?s",
        quads,
    )
    assert t2.column("s").to_pylist() == ["b"]  # a removed in both here


def test_minus_pruning_keeps_group_rows(ray_session):
    import ray.data as rd

    q = parse_sparql("SELECT ?s WHERE { ?s <type> <T> MINUS { ?s <flag> <x> } }")
    masks = pattern_masks(q)
    assert [("predicate", "flag"), ("object_value", "x")] in masks
    pruned = pa.concat_tables(
        b for b in prune_quads(rd.from_arrow(_minus_quads()), q).iter_batches(
            batch_format="pyarrow"
        )
    )
    # the MINUS pattern's row survived pruning, so the subtraction holds
    got = sparql_select(
        "SELECT ?s WHERE { ?s <type> <T> MINUS { ?s <flag> <x> } } ORDER BY ?s",
        pruned,
    )
    assert got.column("s").to_pylist() == ["b", "c", "d"]


def test_having_filters_groups():
    t = sparql_select(
        "SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
        "HAVING (COUNT(?s) > 1) ORDER BY ?p",
        _minus_quads(),
    )
    assert list(zip(t.column("p").to_pylist(), t.column("n").to_pylist())) == [
        ("flag", 2),
        ("type", 4),
    ]
    # two HAVING clauses conjoin
    t = sparql_select(
        "SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
        "HAVING (COUNT(?s) > 1) HAVING (COUNT(?s) < 3) ORDER BY ?p",
        _minus_quads(),
    )
    assert t.column("p").to_pylist() == ["flag"]


def test_minus_having_rejections():
    for bad, frag in [
        (
            "SELECT ?s WHERE { ?s ?p ?o } HAVING (COUNT(?s) > 1)",
            "HAVING needs GROUP BY",
        ),
        (
            "SELECT ?s WHERE { ?s <t> <T> MINUS { OPTIONAL { ?s <f> ?x } } }",
            "triple patterns",
        ),
        (
            "SELECT ?s WHERE { ?s <t> <T> MINUS { FILTER(?s = <a>) } }",
            "at least one triple pattern",
        ),
    ]:
        with pytest.raises(SparqlError, match=frag):
            compile_sparql(bad)
