"""HTTP serving layer tests — mirrors the reference's endpoint contract
(``fastapi_sparql_server.py``: /sparql GET+POST in three body encodings,
/stats, /health, HTML home) over loopback."""

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from etl_pipeline_rdf_star_ray.server import serve_background
from test_sparql import DCAT, PREFIXES, QUADS

COUNT_Q = PREFIXES + "SELECT (COUNT(?d) as ?n) WHERE { ?d a dcat:Dataset . }"


@pytest.fixture(scope="module")
def endpoint():
    srv, port = serve_background(QUADS)
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(url: str, body: bytes, ctype: str):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status, r.read()


def test_get_sparql(endpoint):
    status, ctype, body = _get(
        endpoint + "/sparql?" + urllib.parse.urlencode({"query": COUNT_Q})
    )
    assert status == 200
    assert ctype == "application/sparql-results+json"
    doc = json.loads(body)
    assert doc["results"]["bindings"][0]["n"]["value"] == "7"


def test_post_sparql_json_form_raw(endpoint):
    for body, ctype in [
        (json.dumps({"query": COUNT_Q}).encode(), "application/json"),
        (
            urllib.parse.urlencode({"query": COUNT_Q}).encode(),
            "application/x-www-form-urlencoded",
        ),
        (COUNT_Q.encode(), "application/sparql-query"),
    ]:
        status, out = _post(endpoint + "/sparql", body, ctype)
        assert status == 200
        assert (
            json.loads(out)["results"]["bindings"][0]["n"]["value"] == "7"
        ), ctype


def test_bad_query_is_400(endpoint):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(
            endpoint
            + "/sparql?"
            + urllib.parse.urlencode({"query": "SELECT ?s WHERE { BROKEN"})
        )
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())


def test_execution_error_is_400_not_dead_socket(endpoint):
    """Errors raised during DuckDB execution (not parse time) must still
    produce an error document (reference contract: JSON error body)."""
    q = 'SELECT ?s WHERE { ?s ?p ?o . FILTER(REGEX(?s, "(")) }'
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(endpoint + "/sparql?" + urllib.parse.urlencode({"query": q}))
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())


def test_stats_health_home(endpoint):
    status, _, body = _get(endpoint + "/stats")
    stats = json.loads(body)
    assert status == 200 and stats["total_quads"] == QUADS.num_rows
    status, _, body = _get(endpoint + "/health")
    assert status == 200 and json.loads(body)["status"] == "healthy"
    status, ctype, body = _get(endpoint + "/")
    assert status == 200 and ctype == "text/html"
    assert b"SPARQL-star endpoint" in body


def test_sparql_source_reads_own_server(endpoint, ray_session):
    """Full loop with the REAL urllib fetcher: the `sparql` connector source
    (sources/remote.py) reads bindings from this repo's own serving layer —
    endpoint-to-Dataset plumbing exercised end-to-end over loopback, no
    injected fake."""
    from etl_pipeline_rdf_star_ray.sources import create_source

    ds = create_source(
        {
            "type": "sparql",
            "access": endpoint + "/sparql",
            "query": PREFIXES
            + """SELECT ?d ?title WHERE { ?d dct:title ?title . }
                 ORDER BY ?d""",
        }
    )
    rows = ds.to_pandas()
    assert len(rows) == 6
    assert rows["title"].tolist() == [f"Dataset {i}" for i in range(6)]
    assert rows["d"].iloc[0].startswith("http://example.org/dataset/")


def test_parquet_path_server_serves_lazily(tmp_path):
    """Path-backed server: DuckDB reads the files per query (beyond-memory
    snapshot mode) — same results as the resident-table server."""
    import pyarrow.parquet as pq

    pq.write_table(QUADS, tmp_path / "quads.parquet")
    srv, port = serve_background(str(tmp_path))
    try:
        _, _, body = _get(f"http://127.0.0.1:{port}/stats")
        assert json.loads(body)["total_quads"] == QUADS.num_rows
        _, _, body = _get(
            f"http://127.0.0.1:{port}/sparql?"
            + urllib.parse.urlencode({"query": COUNT_Q})
        )
        assert json.loads(body)["results"]["bindings"][0]["n"]["value"] == "7"
    finally:
        srv.shutdown()


def test_quoted_pattern_over_http(endpoint):
    q = (
        PREFIXES
        + """SELECT ?src (COUNT(DISTINCT ?d) as ?n) WHERE {
             ?d dcat:theme ?t .
             <<?d dcat:theme ?t>> prov:wasDerivedFrom ?src .
           } GROUP BY ?src ORDER BY DESC(?n)"""
    )
    _, out = _post(endpoint + "/sparql", q.encode(), "application/sparql-query")
    bindings = json.loads(out)["results"]["bindings"]
    assert bindings[0]["src"]["type"] == "uri"
    assert bindings[0]["n"]["value"] == "4"


def test_ask_and_construct_over_http(endpoint):
    """The serving layer returns the reference's three response shapes
    (rdf-workbench.py:415-468): SELECT results doc, ASK boolean doc,
    CONSTRUCT triples doc."""
    status, _, body = _get(
        endpoint
        + "/sparql?"
        + urllib.parse.urlencode(
            {"query": PREFIXES + "ASK { ?d a dcat:Dataset }"}
        )
    )
    assert status == 200
    assert json.loads(body) == {"head": {}, "boolean": True}

    status, out = _post(
        endpoint + "/sparql",
        (
            PREFIXES
            + "CONSTRUCT { ?d a <http://example.org/Doc> } "
            + "WHERE { ?d a dcat:Dataset }"
        ).encode(),
        "application/sparql-query",
    )
    assert status == 200
    doc = json.loads(out)
    assert doc["count"] == 7
    assert all(t.endswith(" .") for t in doc["triples"])
