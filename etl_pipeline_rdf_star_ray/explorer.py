"""Ontology / class-explorer query layer over the SPARQL-star engine.

Re-expresses the reference workbench's exploration endpoints
(``rdf-workbench.py``: ``/ontologies`` :474-631, ``/api/graphs`` :631-655,
``/batches`` :327-368, ``/api/class/neighbors`` :720-806,
``/api/class/properties`` :807-863, ``/api/class/restrictions`` :864-1086,
``/api/class/individuals`` :1115-1262, ``/api/individual/details``
:1263-1385) as functions over a quads source (Arrow table, parquet path, or
``ray.data.Dataset`` — whatever :func:`~.sparql.sparql_select` accepts),
returning the reference's exact JSON shapes.

Every lookup here is a SPARQL query through this repo's own engine — the
explorer is a *consumer* of the ``/sparql`` surface, not a parallel code
path (the reference likewise issues store.query() SPARQL per endpoint).
Where the reference loops a Python frontier for the subclass closure
(``_collect_subclass_uris`` :1087-1113), this engine uses its native
``rdfs:subClassOf*`` property-path CTE instead.

Scale note: exploration runs on the *serving snapshot* (the resident quad
table held by ``server.py``), matching the reference's single-process
pyoxigraph store. For beyond-memory graphs pass a parquet path — DuckDB
evaluates each query with projection/filter pushdown — or pre-filter a
Dataset with :func:`~.sparql.prune_quads` semantics.
"""

from __future__ import annotations

import re

from .sparql import sparql_select

OWL = "http://www.w3.org/2002/07/owl#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
EX = "http://example.org/"
DCT = "http://purl.org/dc/terms/"

_PREFIXES = f"""
PREFIX owl: <{OWL}>
PREFIX rdfs: <{RDFS}>
PREFIX rdf: <{RDF}>
PREFIX xsd: <{XSD}>
PREFIX ex: <{EX}>
PREFIX dct: <{DCT}>
"""

#: the tokenizer's IRI shape — a URI parameter must be safe to splice as
#: ``<uri>`` into query text (no angle brackets / quotes / whitespace)
_SAFE_IRI = re.compile(r'^[^<>"{}|^`\\\s]+$')


class ExplorerError(ValueError):
    pass


def _iri(uri: str) -> str:
    if not uri or not _SAFE_IRI.match(uri):
        raise ExplorerError(f"not a spliceable IRI: {uri!r}")
    return f"<{uri}>"


def label_from_uri(uri: str | None) -> str | None:
    """Human-readable fallback label (reference ``rdf-workbench.py:73-75``)."""
    if uri is None:
        return None
    return uri.split("#")[-1].split("/")[-1]


def _rows(quads, query: str) -> list[dict]:
    return sparql_select(_PREFIXES + query, quads).to_pylist()


def _lbl(explicit, uri):
    return explicit if explicit is not None else label_from_uri(uri)


# ---------------------------------------------------------------------------
# graphs / batches
# ---------------------------------------------------------------------------


def list_graphs(quads) -> dict:
    """``GET /api/graphs`` — named graphs with triple counts
    (``rdf-workbench.py:631-655``)."""
    rows = _rows(
        quads,
        "SELECT ?graph (COUNT(?s) AS ?count) WHERE "
        "{ GRAPH ?graph { ?s ?p ?o } } GROUP BY ?graph ORDER BY ?graph",
    )
    graphs = [
        {"uri": r["graph"], "tripleCount": int(r["count"])}
        for r in rows
        if r["graph"] is not None
    ]
    return {"graphs": graphs, "count": len(graphs)}


def list_batches(quads) -> dict:
    """``GET /batches`` — batch metadata entities (``rdf-workbench.py:
    327-368``; the reference scopes to its metadata graph via FROM, here any
    graph carrying ``ex:Batch`` rows matches)."""
    rows = _rows(
        quads,
        """SELECT ?batch ?batchNumber ?status ?created ?description ?quadCount
        WHERE {
            ?batch a ex:Batch ;
                   ex:batchNumber ?batchNumber ;
                   ex:status ?status .
            OPTIONAL { ?batch dct:created ?created }
            OPTIONAL { ?batch dct:description ?description }
            OPTIONAL { ?batch ex:quadCount ?quadCount }
        }
        ORDER BY DESC(?batchNumber)""",
    )
    batches = [
        {k: v for k, v in r.items() if v is not None} for r in rows
    ]
    return {"count": len(batches), "batches": batches}


# ---------------------------------------------------------------------------
# ontology index
# ---------------------------------------------------------------------------


def ontology_index(quads) -> dict:
    """``GET /ontologies`` — classes + object/datatype properties
    (``rdf-workbench.py:474-631``)."""
    class_rows = _rows(
        quads,
        """SELECT DISTINCT ?class ?label ?comment ?parent WHERE {
            { ?class a owl:Class } UNION { ?class a rdfs:Class }
            OPTIONAL { ?class rdfs:label ?label }
            OPTIONAL { ?class rdfs:comment ?comment }
            OPTIONAL { ?class rdfs:subClassOf ?parent
                       FILTER(!isBlank(?parent)) }
            FILTER(!isBlank(?class))
        } ORDER BY ?class""",
    )
    classes = [
        {
            "uri": r["class"],
            "label": _lbl(r["label"], r["class"]),
            "comment": r["comment"],
            "parent": r["parent"],
        }
        for r in class_rows
    ]

    def props(type_iri: str) -> list[dict]:
        rows = _rows(
            quads,
            f"""SELECT DISTINCT ?prop ?label ?domain ?range WHERE {{
                ?prop a {type_iri} .
                OPTIONAL {{ ?prop rdfs:label ?label }}
                OPTIONAL {{ ?prop rdfs:domain ?domain }}
                OPTIONAL {{ ?prop rdfs:range ?range }}
                FILTER(!isBlank(?prop))
            }} ORDER BY ?prop""",
        )
        return [
            {
                "uri": r["prop"],
                "label": _lbl(r["label"], r["prop"]),
                "domain": r["domain"],
                "range": r["range"],
            }
            for r in rows
        ]

    object_properties = props("owl:ObjectProperty")
    datatype_properties = props("owl:DatatypeProperty")
    known = {p["uri"] for p in object_properties + datatype_properties}
    datatype_properties += [
        p for p in props("rdf:Property") if p["uri"] not in known
    ]
    return {
        "classes": classes,
        "objectProperties": object_properties,
        "datatypeProperties": datatype_properties,
        "counts": {
            "classes": len(classes),
            "objectProperties": len(object_properties),
            "datatypeProperties": len(datatype_properties),
        },
    }


# ---------------------------------------------------------------------------
# class explorer
# ---------------------------------------------------------------------------


def class_neighbors(quads, class_uri: str) -> dict:
    """``GET /api/class/neighbors`` — classes linked by object-property
    domain/range plus super/sub classes (``rdf-workbench.py:720-806``; the
    reference's one 4-branch UNION query decomposed into its branches)."""
    c = _iri(class_uri)
    specs = [
        (
            "outgoing", "objectProperty",
            f"""SELECT DISTINCT ?neighbor ?label ?property ?propertyLabel
            WHERE {{
                ?property a owl:ObjectProperty ;
                          rdfs:domain {c} ; rdfs:range ?neighbor .
                OPTIONAL {{ ?neighbor rdfs:label ?label }}
                OPTIONAL {{ ?property rdfs:label ?propertyLabel }}
                FILTER(!isBlank(?neighbor))
            }}""",
        ),
        (
            "incoming", "objectProperty",
            f"""SELECT DISTINCT ?neighbor ?label ?property ?propertyLabel
            WHERE {{
                ?property a owl:ObjectProperty ;
                          rdfs:domain ?neighbor ; rdfs:range {c} .
                OPTIONAL {{ ?neighbor rdfs:label ?label }}
                OPTIONAL {{ ?property rdfs:label ?propertyLabel }}
                FILTER(!isBlank(?neighbor))
            }}""",
        ),
        (
            "superClass", "subClassOf",
            f"""SELECT DISTINCT ?neighbor ?label WHERE {{
                {c} rdfs:subClassOf ?neighbor .
                OPTIONAL {{ ?neighbor rdfs:label ?label }}
                FILTER(!isBlank(?neighbor) && ?neighbor != {c})
            }}""",
        ),
        (
            "subClass", "subClassOf",
            f"""SELECT DISTINCT ?neighbor ?label WHERE {{
                ?neighbor rdfs:subClassOf {c} .
                OPTIONAL {{ ?neighbor rdfs:label ?label }}
                FILTER(!isBlank(?neighbor) && ?neighbor != {c})
            }}""",
        ),
    ]
    neighbors, seen = [], set()
    for direction, rel_type, query in specs:
        for r in _rows(quads, query):
            prop = r.get("property", RDFS + "subClassOf")
            key = f"{r['neighbor']}|{prop}|{direction}"
            if key in seen:
                continue
            seen.add(key)
            neighbors.append(
                {
                    "uri": r["neighbor"],
                    "label": _lbl(r.get("label"), r["neighbor"]),
                    "property": prop,
                    "propertyLabel": _lbl(r.get("propertyLabel"), prop),
                    "direction": direction,
                    "relType": rel_type,
                }
            )
    neighbors.sort(key=lambda n: (n["direction"], n["label"] or ""))
    return {"classUri": class_uri, "neighbors": neighbors}


def class_properties(quads, class_uri: str) -> dict:
    """``GET /api/class/properties`` (``rdf-workbench.py:807-863``)."""
    c = _iri(class_uri)

    def q(kind: str) -> list[dict]:
        rows = _rows(
            quads,
            f"""SELECT DISTINCT ?prop ?label ?range WHERE {{
                ?prop a {kind} ; rdfs:domain {c} .
                OPTIONAL {{ ?prop rdfs:label ?label }}
                OPTIONAL {{ ?prop rdfs:range ?range }}
            }} ORDER BY ?prop""",
        )
        return [
            {
                "uri": r["prop"],
                "label": _lbl(r["label"], r["prop"]),
                "range": r["range"],
            }
            for r in rows
        ]

    return {
        "classUri": class_uri,
        "datatype": q("owl:DatatypeProperty"),
        "object": q("owl:ObjectProperty"),
    }


_CARDINALITY_PREDS = [
    ("owl:qualifiedCardinality", "exactly"),
    ("owl:minQualifiedCardinality", "min"),
    ("owl:maxQualifiedCardinality", "max"),
    ("owl:cardinality", "exactly"),
    ("owl:minCardinality", "min"),
    ("owl:maxCardinality", "max"),
]

_CHARACTERISTICS = [
    ("owl:FunctionalProperty", "Functional"),
    ("owl:AsymmetricProperty", "Asymmetric"),
    ("owl:IrreflexiveProperty", "Irreflexive"),
    ("owl:SymmetricProperty", "Symmetric"),
    ("owl:TransitiveProperty", "Transitive"),
    ("owl:InverseFunctionalProperty", "InverseFunctional"),
    ("owl:ReflexiveProperty", "Reflexive"),
]


def class_restrictions(quads, class_uri: str) -> dict:
    """``GET /api/class/restrictions`` — OWL restrictions, value
    constraints, property characteristics, disjoints
    (``rdf-workbench.py:864-1086``)."""
    c = _iri(class_uri)
    restrictions, seen = [], set()
    for pred, card_label in _CARDINALITY_PREDS:
        rows = _rows(
            quads,
            f"""SELECT ?prop ?propLabel ?cardValue ?onClass ?onDataRange
            WHERE {{
                {c} rdfs:subClassOf ?r .
                ?r a owl:Restriction ;
                   owl:onProperty ?prop ;
                   {pred} ?cardValue .
                OPTIONAL {{ ?prop rdfs:label ?propLabel }}
                OPTIONAL {{ ?r owl:onClass ?onClass }}
                OPTIONAL {{ ?r owl:onDataRange ?onDataRange }}
            }}""",
        )
        for r in rows:
            entry = {
                "property": r["prop"],
                "propertyLabel": _lbl(r["propLabel"], r["prop"]),
                "cardinality": f"{card_label} {r['cardValue']}",
            }
            if r["onClass"]:
                entry["onClass"] = r["onClass"]
                entry["onClassLabel"] = label_from_uri(r["onClass"])
            if r["onDataRange"]:
                entry["onDataRange"] = r["onDataRange"]
                entry["onDataRangeLabel"] = label_from_uri(r["onDataRange"])
            key = (
                f"{entry['property']}|{entry['cardinality']}|"
                f"{entry.get('onClass', '')}|{entry.get('onDataRange', '')}"
            )
            if key not in seen:
                seen.add(key)
                restrictions.append(entry)

    # value constraints on datatype restrictions: the RDF list under
    # owl:withRestrictions walks via the native rdf:rest*/rdf:first path
    for pred, constraint_label in [
        ("xsd:minInclusive", "min"),
        ("xsd:maxInclusive", "max"),
        ("xsd:pattern", "pattern"),
    ]:
        rows = _rows(
            quads,
            f"""SELECT ?prop ?constraintValue WHERE {{
                {c} rdfs:subClassOf ?r .
                ?r a owl:Restriction ; owl:onProperty ?prop .
                {{ ?r owl:allValuesFrom ?dr }} UNION {{ ?r owl:onDataRange ?dr }}
                ?dr owl:withRestrictions ?resList .
                ?resList rdf:rest*/rdf:first ?restriction .
                ?restriction {pred} ?constraintValue .
            }}""",
        )
        for r in rows:
            vc = f"{constraint_label}: {r['constraintValue']}"
            for entry in restrictions:
                if entry["property"] == r["prop"]:
                    entry.setdefault("valueConstraints", [])
                    if vc not in entry["valueConstraints"]:
                        entry["valueConstraints"].append(vc)
                    break
            else:
                restrictions.append(
                    {
                        "property": r["prop"],
                        "propertyLabel": label_from_uri(r["prop"]),
                        "valueConstraints": [vc],
                    }
                )

    characteristics: dict[str, dict] = {}
    for char_iri, trait in _CHARACTERISTICS:
        rows = _rows(
            quads,
            f"""SELECT DISTINCT ?prop ?propLabel WHERE {{
                ?prop rdfs:domain {c} ; a {char_iri} .
                OPTIONAL {{ ?prop rdfs:label ?propLabel }}
            }}""",
        )
        for r in rows:
            entry = characteristics.setdefault(
                r["prop"],
                {
                    "property": r["prop"],
                    "propertyLabel": _lbl(r["propLabel"], r["prop"]),
                    "traits": [],
                    "inverseOf": None,
                },
            )
            if trait not in entry["traits"]:
                entry["traits"].append(trait)
    for r in _rows(
        quads,
        f"""SELECT DISTINCT ?prop ?propLabel ?inverse WHERE {{
            ?prop rdfs:domain {c} ; owl:inverseOf ?inverse .
            OPTIONAL {{ ?prop rdfs:label ?propLabel }}
        }}""",
    ):
        entry = characteristics.setdefault(
            r["prop"],
            {
                "property": r["prop"],
                "propertyLabel": _lbl(r["propLabel"], r["prop"]),
                "traits": [],
                "inverseOf": None,
            },
        )
        entry["inverseOf"] = r["inverse"]

    disjoint = [
        {"uri": r["other"], "label": _lbl(r["otherLabel"], r["other"])}
        for r in _rows(
            quads,
            f"""SELECT DISTINCT ?other ?otherLabel WHERE {{
                ?dc a owl:AllDisjointClasses ; owl:members ?list .
                ?list rdf:rest*/rdf:first {c} .
                ?list rdf:rest*/rdf:first ?other .
                FILTER(?other != {c})
                OPTIONAL {{ ?other rdfs:label ?otherLabel }}
            }}""",
        )
    ]

    desc_rows = _rows(
        quads,
        f"SELECT ?comment WHERE {{ {c} rdfs:comment ?comment }} LIMIT 1",
    )
    return {
        "classUri": class_uri,
        "description": desc_rows[0]["comment"] if desc_rows else None,
        "restrictions": restrictions,
        "characteristics": list(characteristics.values()),
        "disjointWith": disjoint,
    }


def subclass_closure(quads, class_uri: str) -> list[str]:
    """The class plus all transitive subclasses — one ``rdfs:subClassOf*``
    path query instead of the reference's Python frontier loop
    (``rdf-workbench.py:1087-1113``)."""
    c = _iri(class_uri)
    rows = _rows(
        quads,
        f"""SELECT DISTINCT ?sub WHERE {{
            ?sub rdfs:subClassOf* {c} .
            FILTER(!isBlank(?sub))
        }} ORDER BY ?sub""",
    )
    subs = [r["sub"] for r in rows if r["sub"] != class_uri]
    return [class_uri] + subs


def class_individuals(quads, class_uri: str, limit: int = 20) -> dict:
    """``GET /api/class/individuals`` — instances of the class or any
    subclass, with literal properties and object links
    (``rdf-workbench.py:1115-1262``)."""
    limit = max(1, min(int(limit), 100))
    target_classes = subclass_closure(quads, class_uri)
    values_block = " ".join(_iri(u) for u in target_classes)

    rows = _rows(
        quads,
        f"""SELECT DISTINCT ?individual ?type WHERE {{
            VALUES ?type {{ {values_block} }}
            ?individual a ?type .
            FILTER(!isBlank(?individual))
        }} ORDER BY ?individual""",
    )
    individuals: dict[str, dict] = {}
    for r in rows:
        if len(individuals) >= limit and r["individual"] not in individuals:
            continue
        individuals.setdefault(
            r["individual"],
            {
                "uri": r["individual"],
                "type": r["type"],
                "typeLabel": label_from_uri(r["type"]),
                "label": label_from_uri(r["individual"]),
                "properties": [],
                "objectProperties": [],
                "incomingProperties": [],
            },
        )
    if not individuals:
        return {
            "classUri": class_uri,
            "individuals": [],
            "count": 0,
            "inferredClasses": [label_from_uri(u) for u in target_classes],
        }

    ind_values = " ".join(_iri(u) for u in individuals)
    for r in _rows(
        quads,
        f"""SELECT DISTINCT ?individual ?label WHERE {{
            VALUES ?individual {{ {ind_values} }}
            ?individual rdfs:label ?label
        }}""",
    ):
        individuals[r["individual"]]["label"] = r["label"]

    for r in _rows(
        quads,
        f"""SELECT DISTINCT ?individual ?prop ?value WHERE {{
            VALUES ?individual {{ {ind_values} }}
            ?individual ?prop ?value .
            FILTER(isLiteral(?value))
            FILTER(?prop != rdf:type && ?prop != rdfs:label
                   && ?prop != rdfs:comment)
        }} ORDER BY ?individual ?prop ?value""",
    ):
        individuals[r["individual"]]["properties"].append(
            {
                "uri": r["prop"],
                "label": label_from_uri(r["prop"]),
                "value": r["value"],
            }
        )

    for r in _rows(
        quads,
        f"""SELECT DISTINCT ?individual ?prop ?target ?targetLabel WHERE {{
            VALUES ?individual {{ {ind_values} }}
            ?individual ?prop ?target .
            FILTER(isIRI(?target))
            FILTER(?prop != rdf:type)
            OPTIONAL {{ ?target rdfs:label ?targetLabel }}
        }} ORDER BY ?individual ?prop ?target""",
    ):
        individuals[r["individual"]]["objectProperties"].append(
            {
                "uri": r["prop"],
                "label": label_from_uri(r["prop"]),
                "target": r["target"],
                "targetLabel": _lbl(r["targetLabel"], r["target"]),
            }
        )

    for r in _rows(
        quads,
        f"""SELECT DISTINCT ?individual ?source ?sourceLabel ?prop WHERE {{
            VALUES ?individual {{ {ind_values} }}
            ?source ?prop ?individual .
            FILTER(isIRI(?source))
            FILTER(?prop != rdf:type)
            OPTIONAL {{ ?source rdfs:label ?sourceLabel }}
        }} ORDER BY ?individual ?prop ?source""",
    ):
        individuals[r["individual"]]["incomingProperties"].append(
            {
                "uri": r["prop"],
                "label": label_from_uri(r["prop"]),
                "source": r["source"],
                "sourceLabel": _lbl(r["sourceLabel"], r["source"]),
            }
        )

    return {
        "classUri": class_uri,
        "individuals": list(individuals.values()),
        "count": len(individuals),
        "inferredClasses": [label_from_uri(u) for u in target_classes],
    }


def individual_details(quads, ind_uri: str) -> dict:
    """``GET /api/individual/details`` (``rdf-workbench.py:1263-1385``)."""
    i = _iri(ind_uri)
    label_rows = _rows(
        quads, f"SELECT ?label WHERE {{ {i} rdfs:label ?label }} LIMIT 1"
    )
    ind_label = (
        label_rows[0]["label"] if label_rows else label_from_uri(ind_uri)
    )
    type_rows = _rows(
        quads,
        f"SELECT ?type WHERE {{ {i} a ?type . FILTER(!isBlank(?type)) }} "
        "LIMIT 1",
    )
    ind_type = type_rows[0]["type"] if type_rows else None

    data_props = [
        {
            "uri": r["prop"],
            "label": label_from_uri(r["prop"]),
            "value": r["value"],
        }
        for r in _rows(
            quads,
            f"""SELECT DISTINCT ?prop ?value WHERE {{
                {i} ?prop ?value .
                FILTER(isLiteral(?value))
                FILTER(?prop != rdf:type && ?prop != rdfs:label
                       && ?prop != rdfs:comment)
            }} ORDER BY ?prop ?value""",
        )
    ]
    obj_props = [
        {
            "uri": r["prop"],
            "label": label_from_uri(r["prop"]),
            "target": r["target"],
            "targetLabel": _lbl(r["targetLabel"], r["target"]),
        }
        for r in _rows(
            quads,
            f"""SELECT DISTINCT ?prop ?target ?targetLabel WHERE {{
                {i} ?prop ?target .
                FILTER(isIRI(?target))
                FILTER(?prop != rdf:type)
                OPTIONAL {{ ?target rdfs:label ?targetLabel }}
            }} ORDER BY ?prop ?target""",
        )
    ]
    inc_props = [
        {
            "uri": r["prop"],
            "label": label_from_uri(r["prop"]),
            "source": r["source"],
            "sourceLabel": _lbl(r["sourceLabel"], r["source"]),
        }
        for r in _rows(
            quads,
            f"""SELECT DISTINCT ?source ?sourceLabel ?prop WHERE {{
                ?source ?prop {i} .
                FILTER(isIRI(?source))
                FILTER(?prop != rdf:type)
                OPTIONAL {{ ?source rdfs:label ?sourceLabel }}
            }} ORDER BY ?prop ?source""",
        )
    ]
    return {
        "uri": ind_uri,
        "label": ind_label,
        "type": ind_type,
        "typeLabel": label_from_uri(ind_type) if ind_type else None,
        "dataProperties": data_props,
        "objectProperties": obj_props,
        "incomingProperties": inc_props,
    }
