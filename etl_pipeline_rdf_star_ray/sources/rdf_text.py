"""RDF text-format IMPORT: N-Triples / N-Quads / Turtle-TriG subset →
triple-record Dataset — the inverse of ``pipelines/export.py``.

Parity target: the reference loads ``.ttl/.trig/.nq/.nt`` files into named
graphs (``rdf-workbench.py:99-149``; ``batch_manager.load_batch_from_file``
``batch_manager.py:231-283`` does format-by-extension dispatch via
pyoxigraph). Here the parser produces the same triple-record schema the
rest of this engine uses (``subject, predicate, object_value, object_type,
object_datatype, object_lang, graph``), so reference output — e.g. the
shipped ``output/batch_simulation/two_batches.trig`` written by
``batch_manager.export_batch`` (``batch_manager.py:607-639``) — round-trips
into this engine's pipelines.

Grammar subset (covers everything the reference emits):
``@prefix``/``PREFIX`` declarations, named-graph blocks (``GRAPH <g> { … }``
and ``<g> { … }``), predicate lists (``;``), object lists (``,``), the ``a``
keyword, prefixed names, blank nodes, numeric/boolean shorthand literals,
``^^`` datatypes, ``@lang`` tags, and RDF-star quoted triples in subject or
object position (both ``<< … >>`` annotation syntax and the RDF 1.2
``<<( … )>>`` reifier form). Not covered: collections ``( … )``, anonymous
bnode property lists ``[ … ]``, ``@base``-relative IRIs beyond simple
concatenation.

Distribution model: ``.nt``/``.nq`` are line-independent → parsed with
``read_text`` + ``map_batches`` (parallel across line blocks). ``.ttl`` /
``.trig`` carry cross-line state (prefixes, graph blocks) → one task per
FILE (``from_items(paths) → map_batches``); at scale an RDF lake is many
files, so file-granular parallelism is the natural unit. The token loop is
Python, acceptable for an import connector (documented trade-off — the hot
100-TB paths in this engine are Parquet, text RDF is an interop boundary).
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import ray.data as rd

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

TRIPLE_SCHEMA = pa.schema(
    [
        ("subject", pa.string()),
        ("predicate", pa.string()),
        ("object_value", pa.string()),
        ("object_type", pa.string()),  # iri | literal | bnode | quoted
        ("object_datatype", pa.string()),
        ("object_lang", pa.string()),
        ("graph", pa.string()),
    ]
)

_TOKEN = re.compile(
    r"""
      (?P<ws>[ \t\r\n]+)
    | (?P<comment>\#[^\n]*)
    | (?P<qt_open><<\(|<<)
    | (?P<qt_close>\)>>|>>)
    | (?P<iri><[^<>"{}|^`\\\s]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*")
    | (?P<dtmark>\^\^)
    | (?P<decl>@prefix|@base)
    | (?P<langtag>@[A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*)
    | (?P<bnode>_:[A-Za-z0-9][\w.-]*)
    | (?P<punct>[{};,.])
    | (?P<number>[+-]?(?:\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?))
    | (?P<pname>(?:[A-Za-z_][\w-]*)?:[\w.%-]*)
    | (?P<word>[A-Za-z_][\w-]*)
    """,
    re.X,
)

_UNESCAPE = re.compile(r"\\(u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|[tbnrf\"'\\])")
_UNESCAPE_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
                 '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e[0] in "uU":
            return chr(int(e[1:], 16))
        return _UNESCAPE_MAP[e]

    return _UNESCAPE.sub(sub, s)


class _Term:
    __slots__ = ("kind", "value", "datatype", "lang")

    def __init__(self, kind: str, value: str, datatype: str | None = None,
                 lang: str | None = None):
        self.kind = kind  # iri | literal | bnode | quoted
        self.value = value
        self.datatype = datatype
        self.lang = lang

    def nt(self) -> str:
        """N-Triples lexical form (used to canonicalize quoted triples)."""
        if self.kind == "iri":
            return f"<{self.value}>"
        if self.kind == "bnode":
            return self.value
        if self.kind == "quoted":
            return self.value
        esc = (
            self.value.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
        )
        if self.datatype:
            return f'"{esc}"^^<{self.datatype}>'
        if self.lang:
            return f'"{esc}"@{self.lang}'
        return f'"{esc}"'


class RdfParseError(ValueError):
    pass


class _Parser:
    """Single-pass recursive-descent parser over the token stream of one
    document (or one block of independent N-Triples/N-Quads lines)."""

    def __init__(self, text: str, *, default_graph: str | None = None):
        self.toks: list[tuple[str, str]] = [
            (m.lastgroup, m.group())
            for m in _TOKEN.finditer(text)
            if m.lastgroup not in ("ws", "comment")
        ]
        pos = 0
        for m in _TOKEN.finditer(text):
            if m.start() != pos:
                raise RdfParseError(
                    f"unrecognized syntax at offset {pos}: {text[pos:pos+40]!r}"
                )
            pos = m.end()
        if pos != len(text):
            raise RdfParseError(
                f"unrecognized syntax at offset {pos}: {text[pos:pos+40]!r}"
            )
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.graph: str | None = default_graph
        self.rows: list[tuple] = []

    # --- token helpers -----------------------------------------------------

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, kind: str, value: str | None = None):
        k, v = self._next()
        if k != kind or (value is not None and v != value):
            raise RdfParseError(f"expected {value or kind}, got {v!r}")
        return v

    # --- terms ---------------------------------------------------------------

    def _expand_pname(self, pname: str) -> str:
        pre, _, local = pname.partition(":")
        if pre not in self.prefixes:
            raise RdfParseError(f"undeclared prefix {pre!r}:")
        return self.prefixes[pre] + local

    def _term(self) -> _Term:
        kind, v = self._next()
        if kind == "iri":
            return _Term("iri", self.base + v[1:-1] if self.base and not
                         re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", v[1:-1])
                         else v[1:-1])
        if kind == "pname":
            return _Term("iri", self._expand_pname(v))
        if kind == "bnode":
            return _Term("bnode", v)
        if kind == "literal":
            val = _unescape(v[1:-1])
            nk, nv = self._peek()
            if nk == "dtmark":
                self._next()
                dt = self._term()
                if dt.kind != "iri":
                    raise RdfParseError("datatype must be an IRI")
                return _Term("literal", val, datatype=dt.value)
            if nk == "langtag":
                self._next()
                return _Term("literal", val, lang=nv[1:])
            return _Term("literal", val)
        if kind == "number":
            if re.search(r"[eE]", v):
                return _Term("literal", v, datatype=XSD + "double")
            if "." in v:
                return _Term("literal", v, datatype=XSD + "decimal")
            return _Term("literal", v, datatype=XSD + "integer")
        if kind == "word" and v in ("true", "false"):
            return _Term("literal", v, datatype=XSD + "boolean")
        if kind == "qt_open":
            s = self._term()
            p = self._term()
            o = self._term()
            self._expect("qt_close")
            return _Term("quoted", f"<< {s.nt()} {p.nt()} {o.nt()} >>")
        raise RdfParseError(f"unexpected token {v!r} where a term was expected")

    def _predicate(self) -> _Term:
        kind, v = self._peek()
        if kind == "word" and v == "a":
            self._next()
            return _Term("iri", RDF_TYPE)
        return self._term()

    # --- statements ----------------------------------------------------------

    def _emit(self, s: _Term, p: _Term, o: _Term, graph: str | None):
        self.rows.append(
            (
                s.value,
                p.value,
                o.value,
                o.kind,
                o.datatype,
                o.lang,
                graph,
            )
        )

    def _predicate_object_list(self, subject: _Term):
        while True:
            p = self._predicate()
            while True:
                o = self._term()
                # N-Quads: a 4th term before '.' names the graph
                nk, nv = self._peek()
                if nk in ("iri", "pname", "bnode") and self.graph is None:
                    save = self.i
                    g = self._term()
                    if self._peek() == ("punct", "."):
                        self._emit(subject, p, o, g.value)
                        self._next()
                        return
                    self.i = save
                self._emit(subject, p, o, self.graph)
                if self._peek() == ("punct", ","):
                    self._next()
                    continue
                break
            nk, nv = self._peek()
            if (nk, nv) == ("punct", ";"):
                self._next()
                # tolerate trailing ';' before '.' or '}'
                if self._peek()[0] == "punct" and self._peek()[1] in ".}":
                    continue
                continue
            break
        nk, nv = self._peek()
        if (nk, nv) == ("punct", "."):
            self._next()

    def parse(self) -> list[tuple]:
        while self.i < len(self.toks):
            kind, v = self._peek()
            if kind == "decl" or (kind == "word" and v.upper() in ("PREFIX", "BASE")):
                self._next()
                if v.lower().lstrip("@") == "prefix":
                    pk, pv = self._next()
                    if pk != "pname" or not pv.endswith(":"):
                        raise RdfParseError(f"bad prefix declaration near {pv!r}")
                    iri = self._expect("iri")
                    self.prefixes[pv[:-1]] = iri[1:-1]
                else:
                    self.base = self._expect("iri")[1:-1]
                if self._peek() == ("punct", "."):
                    self._next()
                continue
            if kind == "word" and v.upper() == "GRAPH":
                self._next()
                g = self._term()
                self._parse_graph_block(g.value)
                continue
            # `<g> { … }` TriG block without the GRAPH keyword
            if kind in ("iri", "pname"):
                save = self.i
                t = self._term()
                if self._peek() == ("punct", "{"):
                    self._parse_graph_block(t.value)
                    continue
                self.i = save
            if (kind, v) == ("punct", "."):  # stray statement terminator
                self._next()
                continue
            subject = self._term()
            self._predicate_object_list(subject)
        return self.rows

    def _parse_graph_block(self, graph_iri: str):
        self._expect("punct", "{")
        outer = self.graph
        self.graph = graph_iri
        while self._peek() != ("punct", "}"):
            if self._peek()[0] is None:
                raise RdfParseError("unterminated graph block")
            if self._peek() == ("punct", "."):
                self._next()
                continue
            subject = self._term()
            self._predicate_object_list(subject)
        self._next()
        self.graph = outer


def parse_rdf_text(text: str) -> pa.Table:
    """Parse one document (any supported format) into a triple-record table."""
    rows = _Parser(text).parse()
    cols = list(zip(*rows)) if rows else [[] for _ in range(7)]
    return pa.table(
        {
            name: pa.array(list(col), pa.string())
            for name, col in zip(TRIPLE_SCHEMA.names, cols)
        },
        schema=TRIPLE_SCHEMA,
    )


def _parse_lines_batch(batch: pa.Table) -> pa.Table:
    text = "\n".join(v for v in batch.column("text").to_pylist() if v is not None)
    return parse_rdf_text(text)


def _parse_files_batch(batch: pa.Table) -> pa.Table:
    tables = []
    for path in batch.column("path").to_pylist():
        with open(path, encoding="utf-8") as f:
            tables.append(parse_rdf_text(f.read()))
    return (
        pa.concat_tables(tables) if tables else TRIPLE_SCHEMA.empty_table()
    )


_LINE_FORMATS = {".nt", ".nq"}
_DOC_FORMATS = {".ttl", ".trig"}


def read_rdf(path: str, *, fmt: str | None = None) -> "rd.Dataset":
    """Read RDF text file(s) into a triple-record Dataset.

    ``path`` may be one file or a directory (every ``.nt/.nq/.ttl/.trig``
    inside). Line formats parallelize across line blocks; document formats
    parallelize per file."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if os.path.splitext(n)[1] in (_LINE_FORMATS | _DOC_FORMATS)
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no RDF text files under {path}")

    def ext_of(f: str) -> str:
        return ("." + fmt) if fmt else os.path.splitext(f)[1]

    line_files = [f for f in files if ext_of(f) in _LINE_FORMATS]
    doc_files = [f for f in files if ext_of(f) not in _LINE_FORMATS]
    parts = []
    if line_files:
        parts.append(
            rd.read_text(line_files).map_batches(
                _parse_lines_batch, batch_format="pyarrow"
            )
        )
    if doc_files:
        parts.append(
            rd.from_items([{"path": f} for f in doc_files]).map_batches(
                _parse_files_batch, batch_format="pyarrow", batch_size=1
            )
        )
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
