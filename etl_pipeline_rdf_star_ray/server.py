"""Stdlib HTTP serving layer for the SPARQL-star subset engine.

Re-expresses the reference's FastAPI SPARQL server
(``fastapi_sparql_server.py``: ``GET /`` home page :122, ``GET /sparql``
:212, ``POST /sparql`` with JSON / form / raw bodies :218-240, ``GET
/stats`` :354, ``GET /health`` :360) with only the standard library — no
FastAPI/uvicorn in this environment, and a quad *snapshot* server needs
nothing more than a threading HTTP server over an immutable Arrow table.

The served quad table is loaded once at startup (the reference likewise
loads its pyoxigraph store once at startup, ``initialize_store`` :32);
queries run against it via :func:`~.sparql.sparql_query_json` (SELECT /
ASK / CONSTRUCT, the reference's three response shapes). For live
data, restart the server on a new snapshot — serving is read-only by
design, matching the reference.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pyarrow as pa

from .sparql import SparqlError, sparql_query_json

_HOME_HTML = """<!doctype html>
<html><head><title>SPARQL-star endpoint</title></head><body>
<h1>SPARQL-star endpoint</h1>
<p>{total_quads:,} quads &middot; {subjects:,} subjects &middot;
{predicates:,} predicates</p>
<p>POST a query to <code>/sparql</code> (JSON <code>{{"query": …}}</code>,
form <code>query=…</code>, or raw <code>application/sparql-query</code>),
or GET <code>/sparql?query=…</code>. Health at <code>/health</code>,
stats at <code>/stats</code>.</p>
</body></html>"""


def _stats(quads) -> dict:
    if isinstance(quads, pa.Table):
        import pyarrow.compute as pc

        return {
            "total_quads": quads.num_rows,
            "subjects": pc.count_distinct(quads.column("subject")).as_py(),
            "predicates": pc.count_distinct(quads.column("predicate")).as_py(),
        }
    # parquet path: count via DuckDB so the snapshot never loads resident
    import duckdb

    path = (
        quads if quads.endswith(".parquet") else quads.rstrip("/") + "/**/*.parquet"
    )
    n, s, p = duckdb.sql(
        "SELECT count(*), count(DISTINCT subject), count(DISTINCT predicate) "
        f"FROM read_parquet('{path}')"
    ).fetchone()
    return {"total_quads": n, "subjects": s, "predicates": p}


def make_server(
    quads, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``port=0`` picks a free
    ephemeral port (``server.server_address[1]`` after construction).

    ``quads`` is an Arrow table (resident snapshot) **or a parquet
    path/directory** — the path form serves beyond-memory snapshots: each
    query runs DuckDB directly over the files with projection/filter
    pushdown, nothing held resident.

    The startup snapshot statistics are exposed as ``server.stats``."""
    stats = _stats(quads)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, doc: dict) -> None:
            self._send(code, json.dumps(doc).encode(), "application/json")

        def _run_query(self, query: str) -> None:
            if not query:
                self._send_json(400, {"error": "missing query"})
                return
            try:
                doc = sparql_query_json(query, quads)
            except SparqlError as e:
                self._send_json(400, {"error": str(e)})
                return
            except Exception as e:  # execution errors (e.g. bad REGEX) must
                # still produce an error document, not a dead socket
                self._send_json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send(
                200,
                json.dumps(doc).encode(),
                "application/sparql-results+json",
            )

        def do_GET(self) -> None:
            url = urlparse(self.path)
            if url.path == "/":
                self._send(
                    200, _HOME_HTML.format(**stats).encode(), "text/html"
                )
            elif url.path == "/sparql":
                q = parse_qs(url.query).get("query", [""])[0]
                self._run_query(q)
            elif url.path == "/stats":
                self._send_json(200, stats)
            elif url.path == "/health":
                self._send_json(
                    200,
                    {"status": "healthy", "total_quads": stats["total_quads"]},
                )
            else:
                self._send_json(404, {"error": "not found"})

        def do_POST(self) -> None:
            if urlparse(self.path).path != "/sparql":
                self._send_json(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length).decode("utf-8", "replace")
            ctype = self.headers.get("Content-Type", "")
            if "application/json" in ctype:
                try:
                    query = json.loads(body or "{}").get("query", "")
                except json.JSONDecodeError:
                    self._send_json(400, {"error": "bad JSON body"})
                    return
            elif "application/x-www-form-urlencoded" in ctype:
                query = parse_qs(body).get("query", [""])[0]
            else:  # application/sparql-query or bare text
                query = body
            self._run_query(query)

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.stats = stats  # computed once; reused by callers (CLI banner)
    return srv


def serve_background(
    quads: pa.Table, host: str = "127.0.0.1", port: int = 0
) -> tuple[ThreadingHTTPServer, int]:
    """Start the server on a daemon thread; returns (server, bound_port).
    Call ``server.shutdown()`` to stop."""
    srv = make_server(quads, host, port)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]
