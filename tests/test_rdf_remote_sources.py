"""RDF text import (round-trip vs export + reference fixture) and the
database/HTTP/SPARQL connector contract tests (injected factory/fetcher —
the plumbing runs without drivers or network, mirroring the reference's
connector behavior in ``sources/database/*.py`` / ``sources/remote/*.py``)."""

import json
import os
import sqlite3

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from etl_pipeline_rdf_star_ray.pipelines.export import (
    export_to_path,
    export_trig,
)
from etl_pipeline_rdf_star_ray.sources import create_source
from etl_pipeline_rdf_star_ray.sources.rdf_text import (
    RdfParseError,
    parse_rdf_text,
    read_rdf,
)
from etl_pipeline_rdf_star_ray.sources.remote import (
    parse_access,
    parse_sparql_json,
)

REF_TRIG = "/root/reference/output/batch_simulation/two_batches.trig"


def _triples_fixture() -> pa.Table:
    return pa.table(
        {
            "subject": [
                "http://example.org/turn/c1_0",
                "http://example.org/turn/c1_0",
                "http://example.org/turn/c1_1",
                "http://example.org/turn/c2_0",
            ],
            "predicate": [
                "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                "http://example.org/text",
                "http://example.org/text",
                "http://example.org/role",
            ],
            "object_value": [
                "http://example.org/Turn",
                'hi "there"\nline2\ttab\\slash',
                "héllo wörld",
                "user",
            ],
            "object_type": ["iri", "literal", "literal", "literal"],
            "object_datatype": [
                None,
                "http://www.w3.org/2001/XMLSchema#string",
                None,
                None,
            ],
            "object_lang": [None, None, "de", None],
            "graph": [None, "http://example.org/g1", "http://example.org/g1", None],
        }
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


# ---------------------------------------------------------------------------
# RDF text import
# ---------------------------------------------------------------------------


def test_ntriples_roundtrip(tmp_path):
    """export nt → read_rdf → identical records (graph/lang info is not in
    nt, so compare the graph-free columns)."""
    src = _triples_fixture()
    out = str(tmp_path / "nt")
    export_to_path(rd.from_arrow(src), out, fmt="nt")
    got = read_rdf(out).to_pandas()
    want = src.to_pandas().drop(columns=["graph"])
    # nt serializes lang via @lang and datatype via ^^; both survive
    got = got.drop(columns=["graph"])
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_dtype=False)


def test_nquads_roundtrip(tmp_path):
    src = _triples_fixture()
    out = str(tmp_path / "nq")
    export_to_path(rd.from_arrow(src), out, fmt="nq")
    got = read_rdf(out).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(src.to_pandas()), check_dtype=False)


def test_trig_roundtrip(tmp_path):
    src = _triples_fixture()
    out = str(tmp_path / "trig")
    export_trig(rd.from_arrow(src), out)
    got = read_rdf(out).to_pandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(src.to_pandas()), check_dtype=False)


@pytest.mark.skipif(not os.path.exists(REF_TRIG), reason="reference not present")
def test_reference_trig_fixture_parses():
    """The reference's own exported TriG (``batch_manager.export_batch``)
    loads: 32 quads per batch graph (as its metadata asserts via quadCount)
    + 16 metadata statements, including RDF-star reifier triples."""
    with open(REF_TRIG, encoding="utf-8") as f:
        t = parse_rdf_text(f.read())
    df = t.to_pandas()
    by_graph = df.groupby("graph").size().to_dict()
    assert by_graph["http://example.org/batch/2026-02-15T10:00:00Z"] == 32
    assert by_graph["http://example.org/batch/2026-02-17T10:00:00Z"] == 32
    assert by_graph["http://example.org/graph/metadata"] == 16
    quoted = df[df["object_type"] == "quoted"]
    assert len(quoted) == 8
    assert quoted["object_value"].str.startswith("<< <http://").all()
    # prefixed names expanded
    assert (df["predicate"].str.startswith("http")).all()


def test_turtle_subset_semicolon_comma_a_numbers():
    t = parse_rdf_text(
        """
        @prefix ex: <http://example.org/> .
        ex:s a ex:T ; ex:p "x", "y"@en ; ex:n 4.5 ; ex:i 7 ; ex:b true .
        """
    ).to_pandas()
    assert len(t) == 6
    assert (t["subject"] == "http://example.org/s").all()
    typed = t.set_index("object_value")
    assert typed.loc["http://example.org/T", "predicate"].endswith("#type")
    assert typed.loc["y", "object_lang"] == "en"
    assert typed.loc["4.5", "object_datatype"].endswith("#decimal")
    assert typed.loc["7", "object_datatype"].endswith("#integer")
    assert typed.loc["true", "object_datatype"].endswith("#boolean")


def test_parse_error_has_position():
    with pytest.raises(RdfParseError):
        parse_rdf_text("<a> <b> ???")


def test_rdf_source_registered(tmp_path):
    p = tmp_path / "x.nt"
    p.write_text('<http://a> <http://b> "v" .\n')
    ds = create_source({"type": "rdf", "path": str(p)})
    assert ds.count() == 1


# ---------------------------------------------------------------------------
# database connectors (contract-tested via injected sqlite factory)
# ---------------------------------------------------------------------------


def _sqlite_factory(tmp_path, rows=50):
    db = str(tmp_path / "contract.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (id INTEGER, name TEXT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, f"n{i}") for i in range(rows)]
    )
    con.commit()
    con.close()
    return lambda: sqlite3.connect(f"file:{db}?mode=ro", uri=True)


@pytest.mark.parametrize("kind", ["postgresql", "mysql"])
def test_db_connector_contract(tmp_path, kind):
    """The full config→query→Dataset plumbing runs with an injected DB-API
    factory (the documented test seam); the real drivers differ only in the
    connect call."""
    ds = create_source(
        {
            "type": kind,
            "access": "db.example.com:9999/prod",
            "credentials": {"username": "u", "password": "${DB_PASSWORD}"},
            "query": "SELECT id, name FROM t WHERE id < 10",
            "connection_factory": _sqlite_factory(tmp_path),
        }
    )
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(df) == 10
    assert list(df["name"][:3]) == ["n0", "n1", "n2"]


def test_db_connector_sharded_read(tmp_path):
    ds = create_source(
        {
            "type": "postgresql",
            "access": "h:5432/db",
            "query": "SELECT id, name FROM t",
            "connection_factory": _sqlite_factory(tmp_path, rows=100),
            "shard_keys": ["id"],
            "parallelism": 4,
        }
    )
    df = ds.to_pandas()
    assert len(df) == 100 and set(df["id"]) == set(range(100))


def test_parse_access_forms():
    a = parse_access("db.example.com:5433/prod", default_port=5432, default_db="postgres")
    assert (a["host"], a["port"], a["database"]) == ("db.example.com", 5433, "prod")
    b = parse_access("postgresql://u:pw@h:7777/d", default_port=5432, default_db="postgres")
    assert (b["host"], b["port"], b["database"], b["username"], b["password"]) == (
        "h", 7777, "d", "u", "pw")
    c = parse_access("localhost", default_port=3306, default_db="mysql")
    assert (c["host"], c["port"], c["database"]) == ("localhost", 3306, "mysql")


# ---------------------------------------------------------------------------
# HTTP / SPARQL (injected fetcher)
# ---------------------------------------------------------------------------


def test_http_source_with_fake_fetcher(monkeypatch):
    """The fetcher executes inside a Ray worker, so it echoes the request it
    received back through the response payload for assertion."""
    monkeypatch.setenv("API_TOKEN", "tok123")

    def fetcher(url, headers, body=None):
        return json.dumps(
            {"data": {"items": [
                {"id": 1, "user": {"name": "a"},
                 "req": {"url": url, "auth": headers.get("Authorization"),
                         "accept": headers.get("Accept")}},
                {"id": 2, "user": {"name": "b"}},
            ]}}
        ).encode()

    ds = create_source(
        {
            "type": "http",
            "access": "https://api.example.com/v1/items",
            "headers": {"Authorization": "Bearer ${API_TOKEN}"},
            "iterator": "$.data.items[*]",
            "fetcher": fetcher,
        }
    )
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df["user_name"]) == ["a", "b"]  # flatten_json applied
    assert df["req_url"][0].endswith("/items")
    assert df["req_auth"][0] == "Bearer tok123"  # env interpolated
    assert df["req_accept"][0] == "application/json"


def test_sparql_source_with_fake_fetcher():
    """Fetcher runs in a worker: echo the POST body + Accept header back as
    an extra binding row for assertion."""

    def fetcher(url, headers, body=None):
        results = {
            "head": {"vars": ["s", "o"]},
            "results": {"bindings": [
                {"s": {"type": "uri", "value": "http://a"},
                 "o": {"type": "literal", "value": "x"}},
                {"s": {"type": "uri", "value": "http://b"}},
                {"s": {"type": "literal", "value": "echo"},
                 "o": {"type": "literal",
                       "value": (body or b"").decode() + "|" + headers["Accept"]}},
            ]},
        }
        return json.dumps(results).encode()

    ds = create_source(
        {
            "type": "sparql",
            "access": "http://endpoint/sparql",
            "query": "SELECT ?s ?o WHERE { ?s ?p ?o }",
            "fetcher": fetcher,
        }
    )
    df = ds.to_pandas()
    assert list(df["s"][:2]) == ["http://a", "http://b"]
    assert df["o"][1] is None or pd.isna(df["o"][1])
    echo = df[df["s"] == "echo"]["o"].iloc[0]
    assert "query=SELECT" in echo and echo.endswith("|application/sparql-results+json")


def test_parse_sparql_json_empty():
    t = parse_sparql_json(json.dumps({"head": {"vars": ["x"]}, "results": {"bindings": []}}))
    assert t.num_rows == 0 and t.column_names == ["x"]


def test_http_source_csv_response():
    def fetcher(url, headers, body=None):
        return b"id,name\n1,a\n2,b\n"

    ds = create_source(
        {"type": "http", "access": "https://x/api.csv",
         "referenceFormulation": "csv", "fetcher": fetcher}
    )
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df["name"]) == ["a", "b"]
