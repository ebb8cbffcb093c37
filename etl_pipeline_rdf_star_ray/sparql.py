"""Executable SPARQL-star subset over the engine's triple-record tables.

The reference's daily-driver query surface is SPARQL / SPARQL-star served by
pyoxigraph (``fastapi_sparql_server.py:114-368``, ``rdf-workbench.py:226-1385``;
the 26 canonical queries in ``tests/test_postman_queries.py:97-774``). That
store is single-node and in-memory; this module gives the same query idioms an
executable counterpart over the engine's Arrow quad tables
(:data:`~.schema.ANNOTATED_TRIPLE_SCHEMA`):

- **parser** — recursive-descent SPARQL subset: PREFIX, SELECT (vars,
  aggregate expressions with ``AS``, DISTINCT), ``FROM <g>``, basic graph
  patterns with ``;`` / ``,`` continuations and ``a``, quoted-triple subject
  patterns ``<< ?s p ?o >>``, ``GRAPH <g>/?g { … }`` blocks, group
  ``UNION`` chains, FILTER (comparisons, arithmetic ``+ - * /``, ``&&``
  ``||`` ``!``, ``STR`` ``STRSTARTS`` ``CONTAINS`` ``REGEX`` ``BOUND``
  ``IF`` ``NOW`` ``FLOOR``, ``EXISTS`` / ``NOT EXISTS { … }``, typed
  literals), ``BIND``, single-level ``OPTIONAL``, ``MINUS`` (shared-domain
  compatibility subtraction per SPARQL 1.1 §8.3), GROUP BY, HAVING,
  ORDER BY ASC/DESC, LIMIT / OFFSET — the complete feature set exercised
  by the reference's Postman corpus and the SELECT queries of
  ``sparql/batch_queries.rq`` — plus the ``ASK`` and ``CONSTRUCT`` query
  forms (ASK = the group with LIMIT 1 → boolean; CONSTRUCT = template
  instantiation over the solution set → deduplicated triple table).
- **compiler** — BGP → self-join SQL over a ``quads`` relation (one alias per
  triple pattern, shared variables become join equalities — the standard
  SPARQL-to-SQL lowering). Quoted-triple patterns compile against an
  ``UNNEST(annotations)`` derivation of the same table, since this engine
  stores RDF-star annotations as a nested column on the asserted triple
  (``stages/annotate.py``) rather than reifier rows.
- **executor** — DuckDB runs the compiled SQL over the quad table. For a
  ``ray.data.Dataset`` input the BGP's constant constraints are first pushed
  down as a distributed vectorized pre-filter (:func:`prune_quads`), so at
  scale only pattern-candidate rows ever leave the cluster; the join itself
  runs on the pruned intermediate (documented bound — the reference's own
  executor holds the *entire* graph in one process, so the pruned bound is
  strictly more scalable).

Value semantics: all bindings are strings (RDF terms); comparisons and
aggregates against numeric or dateTime literals are lowered through
``TRY_CAST`` so ``?confidence > 0.90`` and ``MAX(?updated)`` behave
numerically / temporally when the data is, and lexicographically otherwise.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

import pyarrow as pa

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

_NUMERIC_DT = {
    XSD + s
    for s in (
        "integer int long short byte decimal float double "
        "nonNegativeInteger positiveInteger unsignedInt unsignedLong"
    ).split()
}
_TS_DT = {XSD + "dateTime", XSD + "date"}
_NUMBER_SHAPE = re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str


@dataclass(frozen=True)
class Literal:
    value: str
    datatype: str | None = None
    lang: str | None = None


@dataclass(frozen=True)
class Quoted:
    """Quoted-triple term ``<< s p o >>`` in subject position."""

    s: object
    p: object
    o: object


@dataclass(frozen=True)
class PathPred:
    """Modified property-path step ``p+`` / ``p*`` / ``p?`` in predicate
    position; compiled to a (recursive) CTE over the quads relation.
    Sequences (``p1/p2``) and inverses (``^p``) never reach the compiler —
    the parser lowers them to plain triple patterns with fresh variables.
    Whole-path alternation of plain constant IRIs (``p1|p2``) becomes
    :class:`AltPred` (a predicate IN-list); any other ``|`` form is
    rejected with a pointer to the UNION rewrite
    (docs/SPARQL_TRANSLATION.md)."""

    iri: str
    mod: str  # '+' | '*' | '?'


@dataclass(frozen=True)
class AltPred:
    """Property-path alternation ``p1|p2|…`` of plain constant IRIs in
    predicate position — SPARQL's PathAlternative restricted to the common
    label-fallback shape (``rdfs:label|skos:prefLabel``). Compiles to
    ``predicate IN (…)`` — one scan, no UNION. Alternations that mix
    sequences, inverses or modifiers are rejected at parse with the UNION
    rewrite hint."""

    iris: tuple  # tuple[str, ...]


@dataclass(frozen=True)
class SeqClosure:
    """Grouped sequence path under a closure modifier — ``(p1/p2)+``,
    ``(^p)*``, ``(p/^q)?`` — with every element a constant IRI, optionally
    inverse. Compiles to a composite-edge CTE (one join chain per step)
    plus the same recursive-closure skeleton as :class:`PathPred`."""

    steps: tuple  # tuple[(iri, inverse: bool), ...]
    mod: str  # '+' | '*' | '?'


@dataclass(frozen=True)
class AltClosure:
    """Grouped alternation under a closure modifier — ``(p1|p2)+`` — of
    plain constant forward IRIs. Edge relation is a single
    ``predicate IN (…)`` scan; closure as for :class:`PathPred`."""

    iris: tuple
    mod: str


@dataclass(frozen=True)
class PathAlt:
    """General property-path alternation whose branches are STEP SEQUENCES
    (``a/b|c``, ``(a/b)|(c/d)``, ``a|^b``, ``p+|q``) — everything the plain
    IN-list :class:`AltPred` cannot express. The parser lowers it to a
    SPARQL ``UNION`` at the triples-block level (round 5, executing the
    formerly documented-rejection rewrite): one fresh pattern group per
    branch, each the branch's chained patterns between the SAME
    subject/object terms, appended to the enclosing group's union list —
    so it compiles through the existing UNION-ALL derived-table plane
    (bag semantics, exactly SPARQL's path-alternation multiplicity)."""

    branches: tuple  # tuple[tuple[(node, inverse: bool), ...], ...]


@dataclass(frozen=True)
class NegPred:
    """Negated property set ``!p`` / ``!(p1|p2)`` of plain constant
    FORWARD IRIs in predicate position — compiles to ``predicate NOT IN
    (…)`` over the scoped quads. Inverse members (``!(^p)``) and modifiers
    on the set are rejected at parse."""

    iris: tuple


@dataclass(frozen=True)
class TriplePattern:
    s: object
    p: object
    o: object
    graph: object = None  # None | Iri | Var — a GRAPH-block scope


@dataclass(frozen=True)
class Call:
    name: str  # upper-cased function name
    args: tuple
    distinct: bool = False


@dataclass(frozen=True)
class BinOp:
    op: str
    left: object
    right: object


@dataclass(frozen=True)
class Bind:
    expr: object
    var: Var


@dataclass(frozen=True)
class Exists:
    """``EXISTS { … }`` / ``NOT EXISTS { … }`` in a FILTER or BIND expr."""

    group: "SelectQuery"
    negated: bool = False


@dataclass(frozen=True)
class Union:
    """``{ … } UNION { … } [UNION { … }]`` — branches are pattern groups."""

    branches: tuple


@dataclass
class SelectQuery:
    prefixes: dict[str, str]
    select: list[tuple[object, str | None]]  # (Var | expr, alias)
    distinct: bool
    select_star: bool
    from_graph: str | None
    patterns: list[TriplePattern]
    filters: list[object]
    binds: list[Bind]
    optionals: list[list[TriplePattern]] = field(default_factory=list)
    unions: list[Union] = field(default_factory=list)
    group_by: list[Var] = field(default_factory=list)
    order_by: list[tuple[object, bool]] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    #: query form: "SELECT" | "ASK" | "CONSTRUCT" | "DESCRIBE" (ASK compiles
    #: as the same WHERE group with LIMIT 1; CONSTRUCT carries its template
    #: separately; DESCRIBE carries its resource terms)
    form: str = "SELECT"
    #: CONSTRUCT template triples (vars must be bound by the WHERE group)
    template: list[TriplePattern] = field(default_factory=list)
    #: DESCRIBE resource terms (Iri constants and/or Vars bound by WHERE)
    describe_terms: list = field(default_factory=list)
    #: inline VALUES blocks: (vars, rows of Iri|Literal|None-for-UNDEF)
    values: list[tuple[list[Var], list[list[object]]]] = field(
        default_factory=list
    )
    #: MINUS groups (pattern+FILTER groups subtracted by shared-variable
    #: compatibility — SPARQL 1.1 §8.3)
    minuses: list["SelectQuery"] = field(default_factory=list)
    #: HAVING expressions (conjoined; aggregate calls allowed)
    having: list[object] = field(default_factory=list)


class SparqlError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<qopen><<)
  | (?P<qclose>>>)
  | (?P<iri><[^<>\s{}|^`\\]*>)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<dtype>\^\^)
  | (?P<lang>@[A-Za-z][A-Za-z0-9-]*)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_.-]*?:[A-Za-z0-9_.-]*)
  | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>&&|\|\||!=|<=|>=|[=<>!*/+\-^|?])
  | (?P<punct>[{}().;,])
    """,
    re.VERBOSE,
)


@dataclass(frozen=True)
class Tok:
    kind: str
    text: str
    pos: int


def tokenize(src: str) -> list[Tok]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise SparqlError(f"lex error at {i}: {src[i:i + 20]!r}")
        kind = m.lastgroup
        if kind != "ws":
            out.append(Tok(kind, m.group(), i))
        i = m.end()
    out.append(Tok("eof", "", len(src)))
    return out


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

#: builtin name -> (min_arity, max_arity)
_FUNC_ARITY = {
    "STR": (1, 1), "STRSTARTS": (2, 2), "CONTAINS": (2, 2),
    "REGEX": (2, 3), "BOUND": (1, 1), "IF": (3, 3), "NOW": (0, 0),
    "FLOOR": (1, 1), "COUNT": (1, 1), "SUM": (1, 1), "AVG": (1, 1),
    "MIN": (1, 1), "MAX": (1, 1),
    "ISBLANK": (1, 1), "ISIRI": (1, 1), "ISURI": (1, 1),
    "ISLITERAL": (1, 1),
}
_FUNCS = set(_FUNC_ARITY)


class _Parser:
    def __init__(self, src: str):
        self.toks = tokenize(src)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self._path_n = 0  # fresh-variable counter for path sequences

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_word(self, *words: str) -> bool:
        t = self.peek()
        return t.kind == "word" and t.text.upper() in words

    def eat_word(self, word: str) -> None:
        t = self.next()
        if t.kind != "word" or t.text.upper() != word:
            raise SparqlError(f"expected {word} at {t.pos}, got {t.text!r}")

    def eat(self, text: str) -> None:
        t = self.next()
        if t.text != text:
            raise SparqlError(f"expected {text!r} at {t.pos}, got {t.text!r}")

    # -- terms --------------------------------------------------------------
    def expand_pname(self, text: str) -> str:
        pfx, _, local = text.partition(":")
        if pfx not in self.prefixes:
            raise SparqlError(f"undeclared prefix {pfx!r}")
        return self.prefixes[pfx] + local

    def parse_term(self, *, as_predicate: bool = False):
        t = self.peek()
        if t.kind == "var":
            self.next()
            return Var(t.text[1:])
        if t.kind == "iri":
            self.next()
            return Iri(t.text[1:-1])
        if t.kind == "pname":
            self.next()
            return Iri(self.expand_pname(t.text))
        if t.kind == "word" and t.text == "a":
            self.next()
            return Iri(RDF_TYPE)
        if t.kind == "string":
            self.next()
            value = _unescape(t.text[1:-1])
            nxt = self.peek()
            if nxt.kind == "dtype":
                self.next()
                dt = self.parse_term()
                if not isinstance(dt, Iri):
                    raise SparqlError("datatype must be an IRI")
                return Literal(value, datatype=dt.value)
            if nxt.kind == "lang":
                self.next()
                return Literal(value, lang=nxt.text[1:])
            return Literal(value)
        if t.kind == "number":
            self.next()
            dt = XSD + ("integer" if re.fullmatch(r"[+-]?\d+", t.text) else "decimal")
            return Literal(t.text, datatype=dt)
        if t.kind == "qopen" and not as_predicate:
            self.next()
            s = self.parse_term()
            p = self.parse_term(as_predicate=True)
            o = self.parse_term()
            t2 = self.next()
            if t2.kind != "qclose":
                raise SparqlError(f"expected >> at {t2.pos}")
            return Quoted(s, p, o)
        raise SparqlError(f"unexpected token {t.text!r} at {t.pos}")

    # -- query --------------------------------------------------------------
    def parse(self) -> SelectQuery:
        while self.at_word("PREFIX"):
            self.next()
            t = self.next()
            if t.kind != "pname":
                raise SparqlError(f"bad PREFIX at {t.pos}")
            pfx = t.text.rstrip(":").partition(":")[0]
            iri = self.next()
            if iri.kind != "iri":
                raise SparqlError(f"bad PREFIX IRI at {iri.pos}")
            self.prefixes[pfx] = iri.text[1:-1]

        if self.at_word("ASK"):
            return self._parse_ask()
        if self.at_word("CONSTRUCT"):
            return self._parse_construct()
        if self.at_word("DESCRIBE"):
            return self._parse_describe()
        self.eat_word("SELECT")
        distinct = False
        if self.at_word("DISTINCT"):
            self.next()
            distinct = True

        select: list[tuple[object, str | None]] = []
        select_star = False
        if self.peek().text == "*":
            self.next()
            select_star = True
        else:
            while True:
                t = self.peek()
                if t.kind == "var":
                    self.next()
                    select.append((Var(t.text[1:]), None))
                elif t.text == "(":
                    self.next()
                    expr = self.parse_expr()
                    self.eat_word("AS")
                    v = self.next()
                    if v.kind != "var":
                        raise SparqlError(f"expected ?var after AS at {v.pos}")
                    self.eat(")")
                    select.append((expr, v.text[1:]))
                else:
                    break
            if not select:
                raise SparqlError("empty SELECT list")

        from_graph = self._parse_from()

        if self.at_word("WHERE"):
            self.next()
        q = SelectQuery(
            prefixes=self.prefixes, select=select, distinct=distinct,
            select_star=select_star, from_graph=from_graph,
            patterns=[], filters=[], binds=[],
        )
        self.parse_group(q)
        self._parse_modifiers(q)
        self._expect_eof()
        return q

    def _parse_from(self) -> str | None:
        if not self.at_word("FROM"):
            return None
        self.next()
        g = self.parse_term()
        if not isinstance(g, Iri):
            raise SparqlError("FROM requires an IRI")
        return g.value

    def _expect_eof(self) -> None:
        if self.peek().kind != "eof":
            t = self.peek()
            raise SparqlError(f"unexpected trailing {t.text!r} at {t.pos}")

    def _parse_ask(self) -> SelectQuery:
        """``ASK [FROM <g>] [WHERE] { … }`` — the WHERE group compiles
        exactly like a SELECT's with ``LIMIT 1``; the executor maps
        ≥1 row → true (reference serves ASK via pyoxigraph,
        ``rdf-workbench.py:459-461``)."""
        self.eat_word("ASK")
        q = SelectQuery(
            prefixes=self.prefixes, select=[], distinct=False,
            select_star=True, from_graph=self._parse_from(),
            patterns=[], filters=[], binds=[], form="ASK",
        )
        if self.at_word("WHERE"):
            self.next()
        self.parse_group(q)
        q.limit = 1
        self._expect_eof()
        return q

    def _parse_describe(self) -> SelectQuery:
        """``DESCRIBE (<iri>|?var)+ [FROM <g>] [WHERE { … }]`` — the subset
        of SPARQL DESCRIBE the reference serves through pyoxigraph
        (``rdf-workbench.py:402-473``). Semantics here: subject-based
        description — every asserted quad whose SUBJECT is a described
        resource (this engine's data model has no blank nodes, so the
        blank-node closure of a Concise Bounded Description is vacuous).
        Variables must be bound by the WHERE group; they compile as a
        SELECT DISTINCT over the group. ``DESCRIBE *`` is rejected."""
        self.eat_word("DESCRIBE")
        terms: list = []
        while True:
            t = self.peek()
            if t.kind == "var":
                self.next()
                terms.append(Var(t.text[1:]))
            elif t.kind in ("iri", "pname"):
                term = self.parse_term()
                if not isinstance(term, Iri):
                    raise SparqlError(
                        f"DESCRIBE needs IRIs or variables at {t.pos}"
                    )
                terms.append(term)
            elif t.text == "*":
                raise SparqlError(
                    "DESCRIBE * is not supported: name the resources or "
                    "variables to describe"
                )
            else:
                break
        if not terms:
            raise SparqlError("empty DESCRIBE term list")
        vars_ = [x for x in terms if isinstance(x, Var)]
        q = SelectQuery(
            prefixes=self.prefixes,
            select=[(v, None) for v in vars_],
            distinct=bool(vars_), select_star=False,
            from_graph=self._parse_from(),
            patterns=[], filters=[], binds=[], form="DESCRIBE",
            describe_terms=terms,
        )
        if self.at_word("WHERE"):
            self.next()
            self.parse_group(q)
        elif self.peek().text == "{":
            self.parse_group(q)
        elif vars_:
            raise SparqlError(
                "DESCRIBE with variables needs a WHERE group binding them"
            )
        self._expect_eof()
        return q

    def _parse_construct(self) -> SelectQuery:
        """``CONSTRUCT { template } [FROM <g>] WHERE { … } [ORDER/LIMIT]``.
        The WHERE group compiles to a SELECT of the template's variables;
        the executor instantiates the template per solution and returns the
        deduplicated triple set (reference: ``rdf-workbench.py:463-468``)."""
        self.eat_word("CONSTRUCT")
        self.eat("{")
        template: list[TriplePattern] = []
        while self.peek().text != "}":
            template.extend(self.parse_triples_block())
            if self.peek().text == ".":
                self.next()
        self.next()
        if not template:
            raise SparqlError("empty CONSTRUCT template")
        seen: set[str] = set()
        sel: list[tuple[object, str | None]] = []
        for t in template:
            if isinstance(
                t.p, (PathPred, AltPred, SeqClosure, AltClosure, NegPred)
            ):
                raise SparqlError(
                    "property-path terms are not allowed in a "
                    "CONSTRUCT template"
                )
            for x in (t.s, t.p, t.o):
                if isinstance(x, Quoted):
                    raise SparqlError(
                        "quoted-triple terms in a CONSTRUCT template are "
                        "not supported: annotations live on the asserted "
                        "triple's annotations column in this engine "
                        "(docs/SPARQL_TRANSLATION.md)"
                    )
                if isinstance(x, Var) and x.name not in seen:
                    seen.add(x.name)
                    sel.append((x, None))
        q = SelectQuery(
            prefixes=self.prefixes, select=sel, distinct=False,
            select_star=not sel, from_graph=self._parse_from(),
            patterns=[], filters=[], binds=[], form="CONSTRUCT",
            template=template,
        )
        if self.at_word("WHERE"):
            self.next()
        self.parse_group(q)
        self._parse_modifiers(q)
        if q.group_by:
            raise SparqlError("GROUP BY is not allowed in a CONSTRUCT query")
        self._expect_eof()
        return q

    def _parse_modifiers(self, q: SelectQuery) -> None:
        if self.at_word("GROUP"):
            self.next()
            self.eat_word("BY")
            while self.peek().kind == "var":
                q.group_by.append(Var(self.next().text[1:]))
        while self.at_word("HAVING"):
            self.next()
            self.eat("(")
            q.having.append(self.parse_expr())
            self.eat(")")
        if self.at_word("ORDER"):
            self.next()
            self.eat_word("BY")
            while True:
                t = self.peek()
                if self.at_word("ASC", "DESC"):
                    desc = t.text.upper() == "DESC"
                    self.next()
                    self.eat("(")
                    expr = self.parse_expr()
                    self.eat(")")
                    q.order_by.append((expr, desc))
                elif t.kind == "var":
                    self.next()
                    q.order_by.append((Var(t.text[1:]), False))
                elif t.text == "(":
                    self.next()
                    expr = self.parse_expr()
                    self.eat(")")
                    q.order_by.append((expr, False))
                else:
                    break
        if self.at_word("LIMIT"):
            self.next()
            t = self.next()
            if not re.fullmatch(r"\d+", t.text):
                raise SparqlError(f"LIMIT needs a non-negative integer at {t.pos}")
            q.limit = int(t.text)
        if self.at_word("OFFSET"):
            self.next()
            t = self.next()
            if not re.fullmatch(r"\d+", t.text):
                raise SparqlError(f"OFFSET needs a non-negative integer at {t.pos}")
            q.offset = int(t.text)

    def _fresh_group(self) -> SelectQuery:
        return SelectQuery(
            prefixes=self.prefixes, select=[], distinct=False,
            select_star=False, from_graph=None, patterns=[], filters=[],
            binds=[],
        )

    def parse_group(self, q: SelectQuery) -> None:
        self.eat("{")
        while True:
            t = self.peek()
            if t.text == "}":
                self.next()
                return
            if self.at_word("FILTER"):
                self.next()
                if self.at_word("NOT", "EXISTS"):
                    q.filters.append(self.parse_exists())
                else:
                    self.eat("(")
                    q.filters.append(self.parse_expr())
                    self.eat(")")
            elif self.at_word("BIND"):
                self.next()
                self.eat("(")
                expr = self.parse_expr()
                self.eat_word("AS")
                v = self.next()
                if v.kind != "var":
                    raise SparqlError(f"expected ?var after AS at {v.pos}")
                self.eat(")")
                q.binds.append(Bind(expr, Var(v.text[1:])))
            elif self.at_word("OPTIONAL"):
                self.next()
                g = self._fresh_group()
                self.parse_group(g)
                if g.binds or g.optionals or g.unions or g.values:
                    raise SparqlError(
                        "OPTIONAL groups support triple patterns, GRAPH "
                        "blocks and FILTERs only"
                    )
                q.optionals.append(g)
            elif self.at_word("MINUS"):
                self.next()
                g = self._fresh_group()
                self.parse_group(g)
                if g.binds or g.optionals or g.unions or g.values or g.minuses:
                    raise SparqlError(
                        "MINUS groups support triple patterns, GRAPH "
                        "blocks and FILTERs only"
                    )
                if not g.patterns:
                    raise SparqlError("MINUS needs at least one triple pattern")
                q.minuses.append(g)
            elif self.at_word("VALUES"):
                self.next()
                q.values.append(self._parse_values())
            elif self.at_word("GRAPH"):
                self.next()
                q.patterns.extend(self.parse_graph_block())
            elif t.text == "{":
                # braced subgroup: either an inline group or a UNION chain
                branches = [self._fresh_group()]
                self.parse_group(branches[0])
                while self.at_word("UNION"):
                    self.next()
                    g = self._fresh_group()
                    self.parse_group(g)
                    branches.append(g)
                if len(branches) == 1:
                    g = branches[0]
                    q.patterns.extend(g.patterns)
                    q.filters.extend(g.filters)
                    q.binds.extend(g.binds)
                    q.optionals.extend(g.optionals)
                    q.unions.extend(g.unions)
                else:
                    q.unions.append(Union(tuple(branches)))
            elif self.at_word("UNION"):
                raise SparqlError("UNION without a preceding { group }")
            else:
                q.patterns.extend(self.parse_triples_block(q))
            if self.peek().text == ".":
                self.next()

    def parse_graph_block(self) -> list[TriplePattern]:
        g = self.parse_term()
        if not isinstance(g, (Iri, Var)):
            raise SparqlError("GRAPH needs an IRI or ?var")
        self.eat("{")
        pats: list[TriplePattern] = []
        while self.peek().text != "}":
            pats.extend(self.parse_triples_block())
            if self.peek().text == ".":
                self.next()
        self.next()
        return [
            TriplePattern(p.s, p.p, p.o, graph=g) for p in pats
        ]

    def _parse_values(self) -> tuple[list[Var], list[list[object]]]:
        """Inline data: ``VALUES ?x { t… }`` / ``VALUES (?x ?y) { (t t) … }``.
        Terms are constants (IRI / literal) or ``UNDEF``; compiled to a
        ``(VALUES …)`` relation joined on the block's variables (the
        reference explorer's subclass-fan-out idiom,
        ``rdf-workbench.py:1128-1135``)."""
        vars_: list[Var] = []
        multi = False
        if self.peek().text == "(":
            self.next()
            multi = True
            while self.peek().kind == "var":
                vars_.append(Var(self.next().text[1:]))
            self.eat(")")
        elif self.peek().kind == "var":
            vars_.append(Var(self.next().text[1:]))
        if not vars_:
            raise SparqlError("VALUES needs at least one variable")

        def cell():
            if self.at_word("UNDEF"):
                self.next()
                return None
            t = self.parse_term()
            if not isinstance(t, (Iri, Literal)):
                raise SparqlError("VALUES terms must be constants or UNDEF")
            return t

        rows: list[list[object]] = []
        self.eat("{")
        while self.peek().text != "}":
            if multi:
                self.eat("(")
                row = []
                while self.peek().text != ")":
                    row.append(cell())
                self.next()
            else:
                row = [cell()]
            if len(row) != len(vars_):
                raise SparqlError(
                    f"VALUES row has {len(row)} terms for {len(vars_)} vars"
                )
            rows.append(row)
        self.next()
        if not rows:
            raise SparqlError("VALUES needs at least one row")
        return vars_, rows

    def parse_exists(self) -> Exists:
        negated = False
        if self.at_word("NOT"):
            self.next()
            negated = True
        self.eat_word("EXISTS")
        g = self._fresh_group()
        self.parse_group(g)
        return Exists(g, negated)

    def parse_path_step(self) -> tuple[object, bool]:
        """One property-path step: ``[^] (term | !negset | (group)) [+*?]``
        → (term-or-path-node, inverse). Modifiers require constant IRI
        predicates (the closure CTE is keyed by them)."""
        inv = False
        if self.peek().kind == "op" and self.peek().text == "^":
            self.next()
            inv = True
        if self.peek().kind == "op" and self.peek().text == "!":
            if inv:
                raise SparqlError(
                    "inverse of a negated property set (^!…) is not "
                    "supported"
                )
            return self.parse_neg_set(), False
        if self.peek().kind == "punct" and self.peek().text == "(":
            return self.parse_path_group(inv), False
        t = self.parse_term(as_predicate=True)
        nxt = self.peek()
        if nxt.kind == "op" and nxt.text in {"+", "*", "?"}:
            self.next()
            if not isinstance(t, Iri):
                raise SparqlError(
                    f"property-path modifier {nxt.text!r} needs a constant "
                    f"IRI predicate at {nxt.pos}"
                )
            t = PathPred(t.value, nxt.text)
        return t, inv

    def parse_neg_set(self) -> NegPred:
        """``!iri`` or ``!(iri1|iri2|…)`` — plain forward IRIs only;
        inverse members and modifiers on the set are rejected."""
        self.next()  # consume '!'
        iris: list[str] = []
        if self.peek().kind == "punct" and self.peek().text == "(":
            self.next()
            while True:
                if self.peek().kind == "op" and self.peek().text == "^":
                    raise SparqlError(
                        "inverse members in a negated property set "
                        "(!(^p…)) are not supported: rewrite as a FILTER "
                        "over ?p (docs/SPARQL_TRANSLATION.md)"
                    )
                t = self.parse_term(as_predicate=True)
                if not isinstance(t, Iri):
                    raise SparqlError(
                        "negated property sets need constant IRI members"
                    )
                iris.append(t.value)
                nxt = self.next()
                if nxt.kind == "op" and nxt.text == "|":
                    continue
                if nxt.kind == "punct" and nxt.text == ")":
                    break
                raise SparqlError(
                    f"expected '|' or ')' in negated property set at "
                    f"{nxt.pos}"
                )
        else:
            t = self.parse_term(as_predicate=True)
            if not isinstance(t, Iri):
                raise SparqlError(
                    "negated property sets need constant IRI members"
                )
            iris.append(t.value)
        nxt = self.peek()
        if nxt.kind == "op" and nxt.text in {"+", "*", "?"}:
            raise SparqlError(
                "closure modifiers over a negated property set "
                f"(!(…){nxt.text}) are not supported"
            )
        return NegPred(tuple(iris))

    def parse_path_group(self, outer_inv: bool) -> object:
        """``( step ('/' step)* )`` or ``( iri ('|' iri)* )`` followed by
        an optional closure modifier. Elements must be constant IRIs
        (optionally ``^``-inversed in sequences); nested modifiers or
        mixed '/'+'|' inside one group are rejected with the UNION-rewrite
        hint."""
        self.next()  # consume '('
        steps: list[tuple[str, bool]] = []
        sep: str | None = None
        while True:
            inv = False
            if self.peek().kind == "op" and self.peek().text == "^":
                self.next()
                inv = True
            t = self.parse_term(as_predicate=True)
            if not isinstance(t, Iri):
                raise SparqlError(
                    "grouped property paths need constant IRI elements"
                )
            if self.peek().kind == "op" and self.peek().text in {"+", "*", "?"}:
                raise SparqlError(
                    "a modifier INSIDE a path group (e.g. (p+/q)) is not "
                    "supported: rewrite with an intermediate variable "
                    "(docs/SPARQL_TRANSLATION.md §property-paths)"
                )
            steps.append((t.value, inv))
            nxt = self.next()
            if nxt.kind == "punct" and nxt.text == ")":
                break
            if nxt.kind == "op" and nxt.text in {"/", "|"}:
                if sep is None:
                    sep = nxt.text
                elif sep != nxt.text:
                    raise SparqlError(
                        "mixing '/' and '|' inside one path group is not "
                        "supported: group explicitly or use the UNION "
                        "rewrite (docs/SPARQL_TRANSLATION.md)"
                    )
                continue
            raise SparqlError(
                f"expected '/', '|' or ')' in path group at {nxt.pos}"
            )
        mod = None
        if self.peek().kind == "op" and self.peek().text in {"+", "*", "?"}:
            mod = self.next().text
        if sep == "|":
            if any(inv for _, inv in steps):
                raise SparqlError(
                    "inverse elements in a path alternation are not "
                    "supported: use the UNION rewrite"
                )
            iris = tuple(v for v, _ in steps)
            if outer_inv:
                raise SparqlError(
                    "^(alternation) is not supported: distribute the "
                    "inverse over the branches"
                )
            if mod is None:
                return AltPred(iris)
            return AltClosure(iris, mod)
        # sequence (or single element)
        if outer_inv:
            # ^(a/b) == (^b/^a); for closures the inverse of the closure is
            # the closure of the inverse
            steps = [(v, not inv) for v, inv in reversed(steps)]
        if mod is None:
            if len(steps) == 1 and not steps[0][1]:
                return Iri(steps[0][0])  # (p) is just p
            # (a/b) / (^p): composite edges, no closure — mod '' below
            return SeqClosure(tuple(steps), "")
        return SeqClosure(tuple(steps), mod)

    _ALT_REWRITE = (
        "property-path alternation '|' in this position is only supported "
        "between plain constant IRI predicates: rewrite as a UNION of the "
        "single-path groups (docs/SPARQL_TRANSLATION.md §property-paths) — "
        "general sequence-alternation is executed only in plain WHERE "
        "triples blocks, not inside CONSTRUCT templates or GRAPH blocks"
    )

    def parse_path(self) -> list[tuple[object, bool]]:
        """Top-level path: '/'-sequences at higher precedence than '|'
        (SPARQL: ``a/b|c`` means ``(a/b)|c``). A plain-IRI alternation
        stays the one-scan :class:`AltPred` IN-list; any other alternation
        (branches with sequences, inverses or closure steps) becomes a
        :class:`PathAlt` that the triples-block parser lowers to UNION
        (round 5 — formerly a documented rejection)."""

        def branch() -> list[tuple[object, bool]]:
            steps = [self.parse_path_step()]
            while self.peek().kind == "op" and self.peek().text == "/":
                self.next()
                steps.append(self.parse_path_step())
            return steps

        steps = branch()
        if not (self.peek().kind == "op" and self.peek().text == "|"):
            return steps
        branches = [tuple(steps)]
        while self.peek().kind == "op" and self.peek().text == "|":
            self.next()
            branches.append(tuple(branch()))
        if all(
            len(b) == 1 and not b[0][1] and isinstance(b[0][0], Iri)
            for b in branches
        ):
            return [(AltPred(tuple(b[0][0].value for b in branches)), False)]
        for b in branches:
            for node, _inv in b:
                if not isinstance(
                    node,
                    (Iri, PathPred, SeqClosure, AltClosure, AltPred, NegPred),
                ):
                    raise SparqlError(
                        "a property-path alternation cannot contain a "
                        "variable predicate"
                    )
        return [(PathAlt(tuple(branches)), False)]

    def _lower_path(
        self, subject, steps: list[tuple[object, bool]], obj,
        out: list[TriplePattern],
    ) -> None:
        """Sequence steps become chained patterns through fresh internal
        variables (named ``__p{n}`` — excluded from SELECT *)."""
        cur = subject
        for i, (node, inv) in enumerate(steps):
            if i == len(steps) - 1:
                nxt = obj
            else:
                nxt = Var(f"__p{self._path_n}")
                self._path_n += 1
            s, o = (nxt, cur) if inv else (cur, nxt)
            out.append(TriplePattern(s, node, o))
            cur = nxt

    def parse_triples_block(
        self, q: SelectQuery | None = None
    ) -> list[TriplePattern]:
        """``q`` is the enclosing pattern group when parsing a plain WHERE
        triples block — required to lower a general path alternation
        (:class:`PathAlt`) to that group's UNION list. Callers without a
        group (CONSTRUCT templates, GRAPH blocks) pass None and keep the
        documented UNION-rewrite rejection for those positions."""
        subject = self.parse_term()
        out: list[TriplePattern] = []
        while True:
            steps = self.parse_path()
            while True:
                obj = self.parse_term()
                if len(steps) == 1 and isinstance(steps[0][0], PathAlt):
                    if q is None:
                        raise SparqlError(self._ALT_REWRITE)
                    groups = []
                    for b in steps[0][0].branches:
                        g = self._fresh_group()
                        g.from_graph = q.from_graph
                        self._lower_path(subject, list(b), obj, g.patterns)
                        groups.append(g)
                    q.unions.append(Union(tuple(groups)))
                else:
                    self._lower_path(subject, steps, obj, out)
                if self.peek().text == ",":
                    self.next()
                    continue
                break
            if self.peek().text == ";":
                self.next()
                if self.peek().text in {".", "}"}:  # dangling ;
                    break
                continue
            break
        return out

    # -- expressions --------------------------------------------------------
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_and()
        while self.peek().text == "||":
            self.next()
            left = BinOp("||", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_cmp()
        while self.peek().text == "&&":
            self.next()
            left = BinOp("&&", left, self.parse_cmp())
        return left

    def parse_cmp(self):
        left = self.parse_add()
        t = self.peek()
        if t.text in {"=", "!=", "<", ">", "<=", ">="}:
            self.next()
            return BinOp(t.text, left, self.parse_add())
        return left

    def parse_add(self):
        left = self.parse_mul()
        while self.peek().text in {"+", "-"}:
            op = self.next().text
            left = BinOp(op, left, self.parse_mul())
        return left

    def parse_mul(self):
        left = self.parse_primary()
        while self.peek().text in {"*", "/"}:
            op = self.next().text
            left = BinOp(op, left, self.parse_primary())
        return left

    def parse_primary(self):
        t = self.peek()
        if t.text == "!":
            self.next()
            return Call("NOT", (self.parse_primary(),))
        if self.at_word("NOT", "EXISTS"):
            return self.parse_exists()
        if t.text == "(":
            self.next()
            e = self.parse_expr()
            self.eat(")")
            return e
        if t.kind == "word" and t.text.upper() in _FUNCS:
            name = t.text.upper()
            self.next()
            self.eat("(")
            distinct = False
            if self.at_word("DISTINCT"):
                self.next()
                distinct = True
            args: list[object] = []
            if self.peek().text == ")":
                pass  # zero-arg call, e.g. NOW()
            elif self.peek().text == "*":
                self.next()
                args.append("*")
            else:
                args.append(self.parse_expr())
                while self.peek().text == ",":
                    self.next()
                    args.append(self.parse_expr())
            self.eat(")")
            lo, hi = _FUNC_ARITY[name]
            if not (lo <= len(args) <= hi) and args != ["*"]:
                raise SparqlError(
                    f"{name} takes {lo}–{hi} argument(s), got {len(args)}"
                )
            return Call(name, tuple(args), distinct=distinct)
        return self.parse_term()


def _unescape(s: str) -> str:
    return (
        s.replace("\\\\", "\x00").replace("\\n", "\n").replace("\\t", "\t")
        .replace("\\r", "\r").replace('\\"', '"').replace("\x00", "\\")
    )


def parse_sparql(src: str) -> SelectQuery:
    return _Parser(src).parse()


# ---------------------------------------------------------------------------
# Compiler: SelectQuery -> SQL over a `quads` relation
# ---------------------------------------------------------------------------

_AGG_FUNCS = {"COUNT", "SUM", "AVG", "MIN", "MAX"}

_ANN_CTE = (
    "SELECT subject, predicate, object_value, object_type, object_datatype, "
    "object_lang, graph, "
    "ann.predicate AS ann_predicate, ann.value AS ann_value, "
    "ann.datatype AS ann_datatype "
    "FROM (SELECT *, unnest(annotations) AS ann FROM quads)"
)


def _sq(text: str) -> str:
    return "'" + text.replace("'", "''") + "'"


def _ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _expr_vars(e) -> set[str]:
    if isinstance(e, Var):
        return {e.name}
    if isinstance(e, BinOp):
        return _expr_vars(e.left) | _expr_vars(e.right)
    if isinstance(e, Call):
        out: set[str] = set()
        for a in e.args:
            if a != "*":
                out |= _expr_vars(a)
        return out
    if isinstance(e, Exists):
        # correlates with any same-named outer variable → never constant
        out = set()
        for pat in _all_patterns(e.group):
            for t in (pat.s, pat.p, pat.o, pat.graph):
                if isinstance(t, Var):
                    out.add(t.name)
                elif isinstance(t, Quoted):
                    out |= {
                        x.name for x in (t.s, t.p, t.o) if isinstance(x, Var)
                    }
        return out
    return set()


class _Compiler:
    def __init__(self, q: SelectQuery, counter=None, ctes=None):
        import itertools

        self.q = q
        # shared across nested compilers (EXISTS / UNION / OPTIONAL
        # subqueries) so correlated aliases never shadow outer ones
        self.counter = counter if counter is not None else itertools.count()
        self.aliases: list[tuple[str, str]] = []  # (relation, alias)
        self.conds: list[str] = []
        self.bind: dict[str, str] = {}  # var name -> SQL expr
        self.kind: dict[str, str] = {}  # var name -> iri|literal|object|unknown
        self.term_cols: dict[str, str] = {}  # object-position var -> alias
        self.union_from: list[str] = []  # UNION derived tables
        self.uses_ann = False
        # property-path CTEs, shared with nested compilers so a path inside
        # UNION/OPTIONAL/EXISTS still lands in the single top-level WITH
        self.ctes: list[tuple[str, str]] = ctes if ctes is not None else []
        self._cte_keys: dict[tuple, str] = {}

    # -- pattern lowering ---------------------------------------------------
    def _path_graph(self, pat: TriplePattern) -> str | None:
        if isinstance(pat.graph, Iri):
            return pat.graph.value
        return self.q.from_graph

    @staticmethod
    def _seq_edges_sql(
        steps: tuple, graph: str | None, graph_var: bool = False
    ) -> str:
        """Composite-edge relation for a grouped sequence: one quads scan
        per step joined end-to-start, inverse steps traversed
        object→subject. Under ``graph_var`` every step must come from the
        SAME graph (a path never crosses graph boundaries — SPARQL 1.1
        §9.2: paths are evaluated per active graph) and the relation
        carries that graph as ``gr``."""
        frm, conds = [], []
        first_start = prev_end = None
        for i, (iri, inv) in enumerate(steps):
            al = f"e{i}"
            frm.append(f"quads {al}")
            start = f"{al}.object_value" if inv else f"{al}.subject"
            end = f"{al}.subject" if inv else f"{al}.object_value"
            conds.append(f"{al}.predicate = {_sq(iri)}")
            if graph is not None:
                conds.append(f"{al}.graph = {_sq(graph)}")
            elif graph_var and i > 0:
                conds.append(f"{al}.graph IS NOT DISTINCT FROM e0.graph")
            if prev_end is not None:
                conds.append(f"{start} = {prev_end}")
            if first_start is None:
                first_start = start
            prev_end = end
        gcol = "e0.graph AS gr, " if graph_var else ""
        return (
            f"SELECT {gcol}{first_start} AS s, {prev_end} AS o FROM "
            + ", ".join(frm)
            + " WHERE "
            + " AND ".join(conds)
        )

    def _path_rel(self, p, graph: str | None, graph_var: bool = False) -> str:
        """CTE relation (columns ``s``, ``o``) for one modified path node
        (:class:`PathPred`, :class:`SeqClosure`, :class:`AltClosure`):
        ``…+`` = recursive transitive closure over the node's edge
        relation (single-predicate scan / IN-list scan / composite join
        chain); ``…*`` adds the zero-length pairs (every subject/object
        term of the scoped graph paired with itself, per SPARQL
        zero-length path semantics); ``…?`` = edges ∪ zero-length; a
        bare group ``(a/b)`` is the edge relation itself. DuckDB's WITH
        RECURSIVE evaluates closures as a semi-naive fixpoint — the same
        join-until-no-new-rows the distributed
        ``corpus.cc_label_propagation`` runs for edge sets beyond one
        node."""
        key = (p, graph, graph_var)
        if key in self._cte_keys:
            return self._cte_keys[key]
        g = f" AND graph = {_sq(graph)}" if graph is not None else ""
        gw = f" WHERE graph = {_sq(graph)}" if graph is not None else ""
        # under GRAPH ?var the relation carries the active graph as ``gr``:
        # edges keep their source graph, the closure recursion stays WITHIN
        # one graph (paths never cross graph boundaries — SPARQL evaluates
        # a path against one active graph at a time), and the enclosing
        # pattern binds ?var to ``gr`` (round 5; formerly rejected)
        sel = "graph AS gr, " if graph_var else ""
        if isinstance(p, PathPred):
            edges = (
                f"SELECT {sel}subject AS s, object_value AS o FROM quads "
                f"WHERE predicate = {_sq(p.iri)}{g}"
            )
        elif isinstance(p, AltClosure):
            inlist = ", ".join(_sq(v) for v in p.iris)
            edges = (
                f"SELECT {sel}subject AS s, object_value AS o FROM quads "
                f"WHERE predicate IN ({inlist}){g}"
            )
        else:  # SeqClosure
            edges = self._seq_edges_sql(p.steps, graph, graph_var)
        name = f"path{len(self.ctes)}"
        if p.mod == "":  # bare group: the edge relation IS the path
            self.ctes.append((name, edges))
            self._cte_keys[key] = name
            return name
        cols = "gr, s, o" if graph_var else "s, o"
        if p.mod in ("+", "*"):
            # the recursion joins against the edge relation, emitted as its
            # own (non-recursive) CTE so composite edges recurse identically
            # to single-predicate ones
            ename = f"{name}_e"
            self.ctes.append((ename, edges))
            same_graph = (
                "e.gr IS NOT DISTINCT FROM r.gr AND " if graph_var else ""
            )
            rcols = "r.gr, r.s, e.o" if graph_var else "r.s, e.o"
            closure = (
                f"SELECT {cols} FROM {ename} UNION SELECT {rcols} "
                f"FROM {name} r JOIN {ename} e ON {same_graph}e.s = r.o"
            )
        else:  # '?' — no recursion
            closure = edges
        if p.mod in ("*", "?"):
            if graph_var:
                zero = (
                    f"SELECT gr, n AS s, n AS o FROM (SELECT graph AS gr, "
                    f"subject AS n FROM quads UNION SELECT graph, "
                    f"object_value FROM quads)"
                )
            else:
                zero = (
                    f"SELECT n AS s, n AS o FROM (SELECT subject AS n FROM "
                    f"quads{gw} UNION SELECT object_value FROM quads{gw})"
                )
            if p.mod == "*":
                base = f"{name}_c"
                closure = closure.replace(f"{name} r", f"{base} r")
                self.ctes.append((base, closure))
                # share the inner closure with a later bare `…+` of the
                # same node
                self._cte_keys[(replace(p, mod="+"), graph, graph_var)] = base
                closure = f"SELECT {cols} FROM {base} UNION {zero}"
            else:
                closure = f"{closure} UNION {zero}"
        self.ctes.append((name, closure))
        self._cte_keys[key] = name
        return name

    def add_pattern(self, pat: TriplePattern) -> None:
        a = f"q{next(self.counter)}"
        if isinstance(pat.s, Quoted):
            if isinstance(
                pat.p, (PathPred, AltPred, SeqClosure, AltClosure, NegPred)
            ):
                raise SparqlError(
                    "property paths are not supported on annotation "
                    "predicates"
                )
            self.uses_ann = True
            self.aliases.append(("qann", a))
            self._bind_term(pat.s.s, f"{a}.subject", "iri")
            self._bind_term(pat.s.p, f"{a}.predicate", "iri")
            self._bind_term(pat.s.o, f"{a}.object_value", "object", term_alias=a)
            self._bind_term(pat.p, f"{a}.ann_predicate", "iri")
            # annotation values are stored as bare strings (no iri/literal
            # marker — ANNOTATION_STRUCT) → term kind resolved by value shape
            self._bind_term(pat.o, f"{a}.ann_value", "annvalue")
        elif isinstance(pat.p, (PathPred, SeqClosure, AltClosure)):
            if isinstance(pat.graph, Var):
                # GRAPH ?var: the path CTE carries the active graph as
                # ``gr``; binding it like any column gives the plain-
                # pattern GRAPH-?var semantics (round 5)
                rel = self._path_rel(pat.p, None, graph_var=True)
                self.aliases.append((rel, a))
                self._bind_term(pat.s, f"{a}.s", "iri")
                self._bind_term(pat.o, f"{a}.o", "unknown")
                self._bind_term(pat.graph, f"{a}.gr", "iri")
                return
            rel = self._path_rel(pat.p, self._path_graph(pat))
            self.aliases.append((rel, a))
            self._bind_term(pat.s, f"{a}.s", "iri")
            self._bind_term(pat.o, f"{a}.o", "unknown")
            return  # graph scoping is baked into the CTE
        else:
            self.aliases.append(("quads", a))
            self._bind_term(pat.s, f"{a}.subject", "iri")
            if isinstance(pat.p, AltPred):
                self.conds.append(
                    f"{a}.predicate IN ("
                    + ", ".join(_sq(v) for v in pat.p.iris)
                    + ")"
                )
            elif isinstance(pat.p, NegPred):
                self.conds.append(
                    f"{a}.predicate NOT IN ("
                    + ", ".join(_sq(v) for v in pat.p.iris)
                    + ")"
                )
            else:
                self._bind_term(pat.p, f"{a}.predicate", "iri")
            self._bind_term(pat.o, f"{a}.object_value", "object", term_alias=a)
        if pat.graph is not None:  # explicit GRAPH block overrides FROM
            self._bind_term(pat.graph, f"{a}.graph", "iri")
        elif self.q.from_graph is not None:
            self.conds.append(f"{a}.graph = {_sq(self.q.from_graph)}")

    def _bind_term(self, term, col: str, kind: str, *, term_alias=None) -> None:
        if isinstance(term, Var):
            if term.name in self.bind:
                self.conds.append(f"{col} = {self.bind[term.name]}")
            else:
                self.bind[term.name] = col
                self.kind[term.name] = kind
                if kind == "object" and term_alias is not None:
                    self.term_cols[term.name] = term_alias
        elif isinstance(term, (Iri, Literal)):
            self.conds.append(f"{col} = {_sq(term.value)}")
        else:
            raise SparqlError(
                "quoted triples are only supported in subject position"
            )

    # -- expression lowering ------------------------------------------------
    def expr_sql(self, e, *, numeric_hint: bool = False) -> str:
        if isinstance(e, Var):
            if e.name not in self.bind:
                raise SparqlError(f"unbound variable ?{e.name}")
            sql = self.bind[e.name]
            return f"TRY_CAST({sql} AS DOUBLE)" if numeric_hint else sql
        if isinstance(e, Iri):
            return _sq(e.value)
        if isinstance(e, Literal):
            if e.datatype in _NUMERIC_DT:
                # only emit bare SQL when the lexical form really is a
                # number — a typed literal carries ARBITRARY text, and raw
                # interpolation would be SQL injection via /sparql
                if _NUMBER_SHAPE.fullmatch(e.value):
                    return e.value
                return f"TRY_CAST({_sq(e.value)} AS DOUBLE)"
            if e.datatype in _TS_DT:
                return f"TRY_CAST({_sq(e.value)} AS TIMESTAMPTZ)"
            return _sq(e.value)
        if isinstance(e, BinOp):
            if e.op in {"&&", "||"}:
                op = "AND" if e.op == "&&" else "OR"
                return f"({self.expr_sql(e.left)} {op} {self.expr_sql(e.right)})"
            if e.op in {"+", "-", "*", "/"}:  # numeric arithmetic
                lhs = self.expr_sql(e.left, numeric_hint=True)
                rhs = self.expr_sql(e.right, numeric_hint=True)
                return f"({lhs} {e.op} {rhs})"
            num = _lit_in(e, _NUMERIC_DT)
            ts = _lit_in(e, _TS_DT) or _is_ts_expr(e.left) or _is_ts_expr(e.right)
            lhs = self.expr_sql(e.left, numeric_hint=num)
            rhs = self.expr_sql(e.right, numeric_hint=num)
            if ts:
                lhs = lhs if _is_ts_expr(e.left) else f"TRY_CAST({lhs} AS TIMESTAMPTZ)"
                rhs = rhs if _is_ts_expr(e.right) else f"TRY_CAST({rhs} AS TIMESTAMPTZ)"
            op = "<>" if e.op == "!=" else e.op
            return f"({lhs} {op} {rhs})"
        if isinstance(e, Exists):
            return self.exists_sql(e)
        if isinstance(e, Call):
            if e.name == "NOT":
                return f"(NOT {self.expr_sql(e.args[0])})"
            if e.name == "STR":
                return self.expr_sql(e.args[0])
            if e.name == "STRSTARTS":
                return (
                    f"starts_with({self.expr_sql(e.args[0])}, "
                    f"{self.expr_sql(e.args[1])})"
                )
            if e.name == "CONTAINS":
                return (
                    f"(position({self.expr_sql(e.args[1])} IN "
                    f"{self.expr_sql(e.args[0])}) > 0)"
                )
            if e.name == "REGEX":
                flags = f", {self.expr_sql(e.args[2])}" if len(e.args) > 2 else ""
                return (
                    f"regexp_matches({self.expr_sql(e.args[0])}, "
                    f"{self.expr_sql(e.args[1])}{flags})"
                )
            if e.name == "BOUND":
                return f"({self.expr_sql(e.args[0])} IS NOT NULL)"
            if e.name == "IF":
                c, t, f = (self.expr_sql(a) for a in e.args)
                return f"(CASE WHEN {c} THEN {t} ELSE {f} END)"
            if e.name == "NOW":
                return "now()"
            if e.name == "ISBLANK":
                # blank nodes carry the standard `_:` lexical prefix in the
                # term columns (sources/rdf_text.py keeps labels verbatim)
                return f"starts_with({self.expr_sql(e.args[0])}, '_:')"
            if e.name in {"ISIRI", "ISURI", "ISLITERAL"}:
                want_lit = e.name == "ISLITERAL"
                a0 = e.args[0]
                if isinstance(a0, Var) and a0.name in self.term_cols:
                    col = f"{self.term_cols[a0.name]}.object_type"
                    kind = "literal" if want_lit else "iri"
                    return f"({col} = '{kind}')"
                if isinstance(a0, Var) and self.kind.get(a0.name) == "iri":
                    if want_lit:
                        return "FALSE"
                    return f"(NOT starts_with({self.expr_sql(a0)}, '_:'))"
                sql = self.expr_sql(a0)
                shape = f"regexp_matches({sql}, '^[A-Za-z][A-Za-z0-9+.-]*://')"
                if want_lit:
                    return f"(NOT {shape} AND NOT starts_with({sql}, '_:'))"
                return shape
            if e.name == "FLOOR":
                return f"floor({self.expr_sql(e.args[0], numeric_hint=True)})"
            if e.name in _AGG_FUNCS:
                return self.agg_sql(e)
            raise SparqlError(f"unsupported function {e.name}")
        raise SparqlError(f"unsupported expression {e!r}")

    def exists_sql(self, e: Exists) -> str:
        """Correlated (NOT) EXISTS subquery on the variables shared with the
        enclosing scope (the reference's batch-diff idiom,
        ``sparql/batch_queries.rq:406-448``)."""
        if e.group.binds or e.group.optionals or e.group.unions:
            raise SparqlError(
                "EXISTS groups support only triple patterns and FILTERs"
            )
        sub = _Compiler(e.group, self.counter, self.ctes)
        sub.q.from_graph = self.q.from_graph
        for pat in e.group.patterns:
            sub.add_pattern(pat)
        if not sub.aliases:
            raise SparqlError("EXISTS needs at least one triple pattern")
        for v, outer in self.bind.items():
            if v in sub.bind:
                sub.conds.append(f"{sub.bind[v]} = {outer}")
        for f in e.group.filters:
            sub.conds.append(sub.expr_sql(f))
        self.uses_ann = self.uses_ann or sub.uses_ann
        src = " CROSS JOIN ".join(f"{rel} {al}" for rel, al in sub.aliases)
        where = " WHERE " + " AND ".join(sub.conds) if sub.conds else ""
        neg = "NOT " if e.negated else ""
        return f"{neg}EXISTS (SELECT 1 FROM {src}{where})"

    def minus_sql(self, g: "SelectQuery") -> str | None:
        """``MINUS { … }`` per SPARQL 1.1 §8.3: a solution is removed iff
        some MINUS-group solution is COMPATIBLE with it on their shared
        variables AND the shared domain is non-empty. Compiles to a
        correlated ``NOT EXISTS`` where each shared variable contributes
        ``(outer IS NULL OR inner = outer)`` (an unbound outer variable is
        vacuously compatible) plus one ``(o1 IS NOT NULL OR o2 IS NOT
        NULL …)`` guard for the non-empty-intersection rule — so a solution
        whose shared variables are ALL unbound (OPTIONAL misses) survives,
        exactly like the spec and unlike a plain NOT EXISTS. A group
        sharing no variable at all subtracts nothing and compiles away
        (returns None)."""
        sub = _Compiler(g, self.counter, self.ctes)
        sub.q.from_graph = self.q.from_graph
        for pat in g.patterns:
            sub.add_pattern(pat)
        shared = [v for v in self.bind if v in sub.bind]
        if not shared:
            return None  # disjoint domains: MINUS removes nothing
        for f in g.filters:
            sub.conds.append(sub.expr_sql(f))
        for v in shared:
            sub.conds.append(
                f"({self.bind[v]} IS NULL OR {sub.bind[v]} = {self.bind[v]})"
            )
        sub.conds.append(
            "(" + " OR ".join(f"{self.bind[v]} IS NOT NULL" for v in shared) + ")"
        )
        self.uses_ann = self.uses_ann or sub.uses_ann
        src = " CROSS JOIN ".join(f"{rel} {al}" for rel, al in sub.aliases)
        return f"NOT EXISTS (SELECT 1 FROM {src} WHERE " + " AND ".join(
            sub.conds
        ) + ")"

    def agg_sql(self, e: Call) -> str:
        if e.name == "COUNT":
            inner = "*" if e.args[0] == "*" else self.expr_sql(e.args[0])
            d = "DISTINCT " if e.distinct else ""
            return f"COUNT({d}{inner})"
        arg = self.expr_sql(e.args[0])
        d = "DISTINCT " if e.distinct else ""
        if e.name in {"SUM", "AVG"}:
            return f"{e.name}({d}TRY_CAST({arg} AS DOUBLE))"
        # MIN/MAX: numeric order when the column is fully numeric (arg_min /
        # arg_max keep the original lexical form), else lexicographic
        # (ISO-8601 dateTimes order correctly as strings). DISTINCT is a
        # no-op for MIN/MAX.
        fn = "arg_min" if e.name == "MIN" else "arg_max"
        return (
            f"CASE WHEN COUNT({arg}) = COUNT(TRY_CAST({arg} AS DOUBLE)) "
            f"THEN {fn}({arg}, TRY_CAST({arg} AS DOUBLE)) "
            f"ELSE {e.name}({arg}) END"
        )

    # -- groups / unions ----------------------------------------------------
    def _compile_group(self, g: SelectQuery) -> "_Compiler":
        """Standalone compilation of a pattern group (a UNION branch)."""
        if g.optionals or g.unions:
            raise SparqlError(
                "OPTIONAL / nested UNION inside a UNION branch is not "
                "supported in this subset"
            )
        sub = _Compiler(g, self.counter, self.ctes)
        deferred = []
        for b in g.binds:
            (deferred.append(b) if _expr_vars(b.expr) else sub._apply_bind(b))
        for pat in g.patterns:
            sub.add_pattern(pat)
        for b in deferred:
            sub._apply_bind(b)
        for f in g.filters:
            sub.conds.append(sub.expr_sql(f))
        self.uses_ann = self.uses_ann or sub.uses_ann
        return sub

    def _add_union(self, u: Union, idx: int) -> None:
        """Lower a UNION chain to a UNION ALL derived table projecting the
        ordered union of branch variables (missing → NULL), joined to the
        enclosing group on any already-bound variables."""
        subs = [self._compile_group(g) for g in u.branches]
        all_vars: list[str] = []
        for sub in subs:
            for v in sub.bind:
                # fresh internal path variables (__p{n}) are branch-local
                # chain plumbing — never projected out of the branch
                if v not in all_vars and not v.startswith("__p"):
                    all_vars.append(v)
        selects = []
        for sub in subs:
            cols = ", ".join(
                f"{sub.bind[v]} AS v_{v}"
                if v in sub.bind
                else f"CAST(NULL AS VARCHAR) AS v_{v}"
                for v in all_vars
            )
            src = " CROSS JOIN ".join(f"{rel} {al}" for rel, al in sub.aliases)
            frm = f" FROM {src}" if sub.aliases else ""
            where = " WHERE " + " AND ".join(sub.conds) if sub.conds else ""
            selects.append(f"SELECT {cols}{frm}{where}")
        ua = f"u{idx}"
        self.union_from.append(f"({' UNION ALL '.join(selects)}) {ua}")
        for v in all_vars:
            col = f"{ua}.v_{v}"
            if v in self.bind:
                self.conds.append(f"{col} = {self.bind[v]}")
            else:
                self.bind[v] = col
                for sub in subs:
                    if v in sub.kind:
                        self.kind[v] = sub.kind[v]
                        break

    # -- full query ---------------------------------------------------------
    def compile(self, *, term_info: bool = False) -> tuple[str, dict[str, str]]:
        q = self.q
        if (
            not q.patterns and not q.optionals and not q.unions
            and not q.values
        ):
            raise SparqlError("empty WHERE block")

        # Constant BINDs (no variable deps) establish bindings BEFORE the
        # patterns — the reference corpus uses BIND(<iri> AS ?x) as the
        # opening statement of the group (test_postman_queries.py:247).
        deferred: list[Bind] = []
        for b in q.binds:
            if _expr_vars(b.expr):
                deferred.append(b)
                continue
            self._apply_bind(b)

        for pat in q.patterns:
            self.add_pattern(pat)
        for i, u in enumerate(q.unions):
            self._add_union(u, i)

        # inline VALUES data: one (VALUES …) relation per block, joined on
        # the block's variables (UNDEF = NULL matches anything)
        for vi, (vals_vars, rows) in enumerate(q.values):
            al = f"val{vi}"
            cols = ", ".join(f"c{i}" for i in range(len(vals_vars)))
            row_sqls = [
                "("
                + ", ".join(
                    "NULL" if t is None else _sq(t.value) for t in row
                )
                + ")"
                for row in rows
            ]
            self.aliases.append(
                (f"(VALUES {', '.join(row_sqls)})", f"{al}({cols})")
            )
            for i, v in enumerate(vals_vars):
                col = f"{al}.c{i}"
                if v.name in self.bind:
                    self.conds.append(
                        f"({col} IS NULL OR {col} = {self.bind[v.name]})"
                    )
                else:
                    self.bind[v.name] = col
                    self.kind[v.name] = (
                        "iri"
                        if all(
                            isinstance(r[i], Iri)
                            for r in rows
                            if r[i] is not None
                        )
                        else "unknown"
                    )

        # OPTIONAL groups -> LEFT JOIN subselects on shared variables
        left_joins: list[str] = []
        for gi, group in enumerate(q.optionals):
            sub = _Compiler(
                SelectQuery(
                    prefixes=q.prefixes, select=[], distinct=False,
                    select_star=False, from_graph=q.from_graph,
                    patterns=[], filters=[], binds=[],
                ),
                self.counter,
                self.ctes,
            )
            group_pats = (
                group.patterns if isinstance(group, SelectQuery) else group
            )
            for pat in group_pats:
                sub.add_pattern(pat)
            if isinstance(group, SelectQuery):
                for f in group.filters:
                    sub.conds.append(sub.expr_sql(f))
            shared = [v for v in sub.bind if v in self.bind]
            if not shared:
                raise SparqlError("OPTIONAL shares no variable with the group")
            new = [v for v in sub.bind if v not in self.bind]
            self.uses_ann = self.uses_ann or sub.uses_ann
            cols = ", ".join(f"{sub.bind[v]} AS v_{v}" for v in (*shared, *new))
            src = " CROSS JOIN ".join(f"{rel} {al}" for rel, al in sub.aliases)
            where = " WHERE " + " AND ".join(sub.conds) if sub.conds else ""
            oa = f"opt{gi}"
            on = " AND ".join(f"{oa}.v_{v} = {self.bind[v]}" for v in shared)
            left_joins.append(
                f"LEFT JOIN (SELECT {cols} FROM {src}{where}) {oa} ON {on}"
            )
            for v in new:
                self.bind[v] = f"{oa}.v_{v}"
                self.kind[v] = sub.kind.get(v, "unknown")

        # expression BINDs may reference OPTIONAL vars (BOUND(?x) idiom,
        # batch_queries.rq:561) — applied after all bindings exist
        for b in deferred:
            self._apply_bind(b)

        for f in q.filters:
            self.conds.append(self.expr_sql(f))
        for mg in q.minuses:
            cond = self.minus_sql(mg)
            if cond is not None:
                self.conds.append(cond)

        # SELECT list
        has_agg = bool(q.group_by) or any(
            isinstance(e, Call) and e.name in _AGG_FUNCS for e, _ in q.select
        )
        if q.select_star:
            items: list[tuple[object, str | None]] = [
                (Var(n), None) for n in self.bind
                if not n.startswith("__p")  # path-internal fresh vars
            ]
        else:
            items = q.select
        sel_items: list[str] = []
        out_kinds: dict[str, str] = {}
        if q.select_star and not items:
            # all-constant group (ASK over fixed terms): emit a marker column
            sel_items.append("1 AS ask__hit")
            out_kinds["ask__hit"] = "literal"
        for expr, alias in items:
            if isinstance(expr, Var):
                name = alias or expr.name
                sel_items.append(f"{self.expr_sql(expr)} AS {_ident(name)}")
                out_kinds[name] = self.kind.get(expr.name, "unknown")
                if term_info and not has_agg and expr.name in self.term_cols:
                    a = self.term_cols[expr.name]
                    for suffix, col in (
                        ("__type", "object_type"),
                        ("__datatype", "object_datatype"),
                        ("__lang", "object_lang"),
                    ):
                        sel_items.append(
                            f"{a}.{col} AS {_ident(name + suffix)}"
                        )
            else:
                if alias is None:
                    raise SparqlError("expression SELECT items need AS ?alias")
                sel_items.append(f"{self.expr_sql(expr)} AS {_ident(alias)}")
                out_kinds[alias] = "literal"

        from_items = [
            f"{rel} {al}" for rel, al in self.aliases
        ] + self.union_from
        src = " CROSS JOIN ".join(from_items)
        sql = "SELECT "
        if q.distinct:
            sql += "DISTINCT "
        sql += ", ".join(sel_items) + f" FROM {src}"
        for lj in left_joins:
            sql += " " + lj
        if self.conds:
            sql += " WHERE " + " AND ".join(self.conds)
        if has_agg:
            group_exprs = [self.expr_sql(v) for v in q.group_by]
            for expr, _alias in items:  # plain vars must be grouped
                if isinstance(expr, Var):
                    e = self.expr_sql(expr)
                    if e not in group_exprs:
                        group_exprs.append(e)
            if group_exprs:
                sql += " GROUP BY " + ", ".join(group_exprs)
        if q.having:
            if not has_agg:
                raise SparqlError(
                    "HAVING needs GROUP BY or aggregate SELECT expressions"
                )
            sql += " HAVING " + " AND ".join(
                self.expr_sql(h) for h in q.having
            )
        if q.order_by:
            parts = []
            for expr, desc in q.order_by:
                d = " DESC" if desc else ""
                parts.extend(
                    f"{k}{d} NULLS LAST" for k in self._order_keys(expr, items)
                )
            sql += " ORDER BY " + ", ".join(parts)
        if q.limit is not None:
            sql += f" LIMIT {q.limit}"
        if q.offset is not None:
            sql += f" OFFSET {q.offset}"

        cte_parts = [f"{n} AS ({body})" for n, body in self.ctes]
        if self.uses_ann:
            cte_parts.append(f"qann AS ({_ANN_CTE})")
        if cte_parts:
            # RECURSIVE is harmless for the non-recursive members; path
            # closures need it
            sql = "WITH RECURSIVE " + ", ".join(cte_parts) + " " + sql
        return sql, out_kinds

    def _apply_bind(self, b: Bind) -> None:
        if b.var.name in self.bind:
            raise SparqlError(f"BIND rebinds ?{b.var.name}")
        self.bind[b.var.name] = self.expr_sql(b.expr)
        self.kind[b.var.name] = "iri" if isinstance(b.expr, Iri) else "unknown"

    def _order_keys(self, expr, items) -> list[str]:
        # An aggregate alias is already typed — order by the alias itself.
        if isinstance(expr, Var):
            for e, alias in items:
                if alias == expr.name and not isinstance(e, Var):
                    return [_ident(alias)]
            sql = self.expr_sql(expr)
            # hybrid: numeric order when castable, lexicographic otherwise
            return [f"TRY_CAST({sql} AS DOUBLE)", sql]
        if isinstance(expr, Call) and expr.name in _AGG_FUNCS:
            return [self.agg_sql(expr)]
        sql = self.expr_sql(expr)
        return [f"TRY_CAST({sql} AS DOUBLE)", sql]


def _lit_in(e: BinOp, dts: set[str]) -> bool:
    return any(
        isinstance(x, Literal) and x.datatype in dts for x in (e.left, e.right)
    )


def _is_ts_expr(e) -> bool:
    """Already-TIMESTAMPTZ operands: typed dateTime literals and NOW()."""
    return (isinstance(e, Literal) and e.datatype in _TS_DT) or (
        isinstance(e, Call) and e.name == "NOW"
    )


def compile_sparql(src: str, *, term_info: bool = False) -> tuple[str, dict[str, str]]:
    """SPARQL text → (DuckDB SQL over a ``quads`` relation, var→kind map)."""
    return _Compiler(parse_sparql(src)).compile(term_info=term_info)


# ---------------------------------------------------------------------------
# Distributed pattern pre-filter (the Ray scale path)
# ---------------------------------------------------------------------------


def _all_patterns(q: SelectQuery) -> list[TriplePattern]:
    """Every triple pattern the query can touch: the main BGP, OPTIONAL
    groups, UNION branches (recursively) and (NOT) EXISTS groups inside
    filter expressions — pruning must keep candidate rows for all of them."""
    out = list(q.patterns)
    for g in q.optionals:
        out.extend(g.patterns if isinstance(g, SelectQuery) else g)
    for g in q.minuses:
        # MINUS-group rows must SURVIVE pruning: subtracting needs them
        out.extend(_all_patterns(g))
    for u in q.unions:
        for branch in u.branches:
            out.extend(_all_patterns(branch))

    def walk(e) -> None:
        if isinstance(e, Exists):
            out.extend(_all_patterns(e.group))
        elif isinstance(e, BinOp):
            walk(e.left)
            walk(e.right)
        elif isinstance(e, Call):
            for a in e.args:
                if a != "*":
                    walk(a)

    for f in q.filters:
        walk(f)
    for b in q.binds:
        walk(b.expr)
    return out


def pattern_masks(q: SelectQuery) -> list[list[tuple[str, str]]] | None:
    """Per-pattern constant constraints as ``(column, value)`` conjunctions.

    A quad row can only participate in the join if it matches at least one
    pattern's constants — the union of these masks is a sound row filter
    (annotation rows ride the same physical row as their asserted triple, so
    inner-triple constants constrain quoted patterns too). Any pattern with
    no constant terms makes pruning unsound-to-skip → returns None."""
    masks: list[list[tuple[str, str]]] = []
    for pat in _all_patterns(q):
        if isinstance(pat.p, (PathPred, SeqClosure, AltClosure)):
            # a closure traverses intermediate rows no pattern constant
            # mentions (and * / ? zero-length paths range over every term
            # of the graph) — pruning would be unsound
            return None
        # NegPred contributes no predicate constant (NOT IN is not a
        # (col, value) mask) — the pattern's other constants still prune,
        # and a constant-free negated pattern falls through to `not conj`
        terms = (
            (("subject", pat.s.s), ("predicate", pat.s.p),
             ("object_value", pat.s.o))
            if isinstance(pat.s, Quoted)
            else (("subject", pat.s), ("predicate", pat.p),
                  ("object_value", pat.o))
        )
        conj = [
            (col, t.value) for col, t in terms if isinstance(t, (Iri, Literal))
        ]
        if isinstance(pat.graph, Iri):
            conj.append(("graph", pat.graph.value))
        if isinstance(pat.p, AltPred) and not isinstance(pat.s, Quoted):
            # a disjunctive predicate fans the pattern into one mask per
            # alternative, each sharing the pattern's other constants
            for iri in pat.p.iris:
                masks.append(conj + [("predicate", iri)])
            continue
        if not conj:
            return None
        masks.append(conj)
    return masks


def prune_quads(ds, query: str | SelectQuery):
    """Distributed pre-filter: keep only rows that can satisfy at least one
    triple pattern's constant constraints (vectorized ``map_batches`` — runs
    on the cluster, so at scale only candidate rows reach the join)."""
    import numpy as np
    import pyarrow.compute as pc

    q = parse_sparql(query) if isinstance(query, str) else query
    masks = pattern_masks(q)
    if masks is None:
        return ds

    def keep(batch: pa.Table) -> pa.Table:
        acc = np.zeros(batch.num_rows, dtype=bool)
        for conj in masks:
            m = np.ones(batch.num_rows, dtype=bool)
            for col, val in conj:
                eq = pc.fill_null(pc.equal(batch.column(col), pa.scalar(val)), False)
                m &= eq.to_numpy(zero_copy_only=False)
            acc |= m
        return batch.filter(pa.array(acc))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Executor
# ---------------------------------------------------------------------------

_OPT_COLS = (
    ("object_type", "VARCHAR"),
    ("object_datatype", "VARCHAR"),
    ("object_lang", "VARCHAR"),
    ("graph", "VARCHAR"),
    ("annotations", "STRUCT(predicate VARCHAR, value VARCHAR, datatype VARCHAR)[]"),
)


def _exec(query: str, quads, *, term_info: bool) -> tuple[pa.Table, dict[str, str]]:
    import duckdb

    parsed = parse_sparql(query)
    sql, kinds = _Compiler(parsed).compile(term_info=term_info)
    con = duckdb.connect()
    try:
        if isinstance(quads, pa.Table):
            con.register("quads", _with_optional_columns(quads))
        elif isinstance(quads, str):
            path = (
                quads
                if quads.endswith(".parquet")
                else quads.rstrip("/") + "/**/*.parquet"
            )
            con.sql(
                f"CREATE VIEW quads_raw AS SELECT * FROM read_parquet({_sq(path)})"
            )
            have = {r[0] for r in con.sql("DESCRIBE quads_raw").fetchall()}
            extra = [
                f"CAST(NULL AS {typ}) AS {name}"
                for name, typ in _OPT_COLS
                if name not in have
            ]
            sel = "*" + (", " + ", ".join(extra) if extra else "")
            con.sql(f"CREATE VIEW quads AS SELECT {sel} FROM quads_raw")
        else:  # ray.data.Dataset
            import ray

            blocks = ray.get(prune_quads(quads, parsed).to_arrow_refs())
            blocks = [b for b in blocks if b.num_rows]
            table = (
                pa.concat_tables(blocks, promote_options="permissive")
                if blocks
                else None
            )
            if table is None:
                from .schema import ANNOTATED_TRIPLE_SCHEMA

                table = ANNOTATED_TRIPLE_SCHEMA.empty_table()
            con.register("quads", _with_optional_columns(table))
        return con.sql(sql).arrow(), kinds
    finally:
        con.close()


def sparql_select(query: str, quads) -> pa.Table:
    """Run a SPARQL subset query over a quad table.

    ``quads`` may be a ``pyarrow.Table``, a parquet path / directory (DuckDB
    reads it with projection + filter pushdown), or a ``ray.data.Dataset``
    (pattern constants are pushed down as a distributed pre-filter first —
    see module docstring)."""
    table, _ = _exec(query, quads, term_info=False)
    return table


def sparql_select_json(query: str, quads) -> dict:
    """Run a query and shape the result as the standard SPARQL JSON results
    document (the reference's response shape,
    ``fastapi_sparql_server.py:220-265``)."""
    table, kinds = _exec(query, quads, term_info=True)
    return to_sparql_json(table, kinds)


def sparql_ask(query: str, quads) -> bool:
    """``ASK { … }`` — true iff the WHERE group has at least one solution.
    The group compiles with ``LIMIT 1``, so the executor stops at the first
    match (reference serves ASK via pyoxigraph, ``rdf-workbench.py:459-461``)."""
    table, _ = _exec(query, quads, term_info=False)
    return table.num_rows > 0


def sparql_construct(query: str, quads) -> pa.Table:
    """``CONSTRUCT { template } WHERE { … }`` — evaluate the WHERE group as
    a SELECT of the template's variables, instantiate the template per
    solution (vectorized: one column-select / constant-fill per template
    triple, rows with an unbound template variable dropped per the SPARQL
    spec), and return the DEDUPLICATED triple set as a quad-schema-shaped
    Arrow table (``subject predicate object_value object_type
    object_datatype object_lang``) — so CONSTRUCT output can feed straight
    back into :func:`sparql_select` or the TriG exporter. Reference analog:
    ``rdf-workbench.py:463-468`` (pyoxigraph triples)."""
    parsed = parse_sparql(query)
    if parsed.form != "CONSTRUCT":
        raise SparqlError("sparql_construct needs a CONSTRUCT query")
    table, kinds = _exec(query, quads, term_info=True)
    return _instantiate_template(parsed.template, table, kinds)


_TRIPLE_COLS = [
    "subject", "predicate", "object_value",
    "object_type", "object_datatype", "object_lang",
]


def sparql_describe(query: str, quads) -> pa.Table:
    """``DESCRIBE <iri>… / ?var WHERE { … }`` — subject-based description:
    the deduplicated set of asserted triples whose subject is one of the
    described resources, in the same quad-schema triple shape as
    :func:`sparql_construct` (feeds the TriG exporter / re-querying).
    Variables are resolved by running the WHERE group as SELECT DISTINCT;
    the subject filter itself is vectorized (``pc.is_in`` for tables,
    distributed ``map_batches`` for Datasets, an IN-list pushed into the
    DuckDB scan for parquet paths). Reference analog: pyoxigraph DESCRIBE
    (``rdf-workbench.py:402-473``)."""
    import pyarrow.compute as pc

    parsed = parse_sparql(query)
    if parsed.form != "DESCRIBE":
        raise SparqlError("sparql_describe needs a DESCRIBE query")
    terms: set[str] = {
        t.value for t in parsed.describe_terms if isinstance(t, Iri)
    }
    vars_ = [t for t in parsed.describe_terms if isinstance(t, Var)]
    if vars_:
        bound, _ = _exec(query, quads, term_info=False)
        for v in vars_:
            terms.update(
                x for x in bound.column(v.name).to_pylist() if x is not None
            )

    empty = pa.table({c: pa.array([], pa.string()) for c in _TRIPLE_COLS})
    if not terms:
        return empty
    subjects = pa.array(sorted(terms), pa.string())
    # FROM <g> scopes the description itself, not just the WHERE group: a
    # subject present in several graphs must only report the scoped triples
    from_g = parsed.from_graph

    def _row_mask(b: pa.Table):
        m = pc.is_in(b.column("subject"), value_set=subjects)
        if from_g is not None:
            m = pc.and_(
                m, pc.fill_null(pc.equal(b.column("graph"), from_g), False)
            )
        return m

    if isinstance(quads, str):
        import duckdb

        path = (
            quads if quads.endswith(".parquet")
            else quads.rstrip("/") + "/**/*.parquet"
        )
        con = duckdb.connect()
        try:
            con.sql(
                f"CREATE VIEW quads_raw AS SELECT * FROM read_parquet({_sq(path)})"
            )
            have = {r[0] for r in con.sql("DESCRIBE quads_raw").fetchall()}
            cols = ", ".join(
                c if c in have else f"CAST(NULL AS VARCHAR) AS {c}"
                for c in _TRIPLE_COLS
            )
            in_list = ", ".join(_sq(s) for s in sorted(terms))
            gcond = (
                f" AND graph = {_sq(from_g)}"
                if from_g is not None and "graph" in have
                else (" AND FALSE" if from_g is not None else "")
            )
            sub = con.sql(
                f"SELECT {cols} FROM quads_raw "
                f"WHERE subject IN ({in_list}){gcond}"
            ).arrow()
        finally:
            con.close()
    else:
        if isinstance(quads, pa.Table):
            t = _with_optional_columns(quads)
            sub = t.filter(_row_mask(t)).select(_TRIPLE_COLS)
        else:  # ray.data.Dataset — filter runs distributed
            import ray

            def keep(batch: pa.Table) -> pa.Table:
                b = _with_optional_columns(batch)
                return b.filter(_row_mask(b)).select(_TRIPLE_COLS)

            blocks = [
                b for b in ray.get(
                    quads.map_batches(keep, batch_format="pyarrow")
                    .to_arrow_refs()
                )
                if b.num_rows
            ]
            sub = (
                pa.concat_tables(blocks, promote_options="permissive")
                if blocks else empty
            )
    sub = pa.table(
        {c: pc.cast(sub.column(c), pa.string()) for c in _TRIPLE_COLS}
    )
    # DESCRIBE returns an RDF graph: set semantics + deterministic order
    out = sub.group_by(_TRIPLE_COLS, use_threads=False).aggregate([])
    return out.sort_by([(c, "ascending") for c in _TRIPLE_COLS])


def _instantiate_template(
    template: list[TriplePattern], table: pa.Table, kinds: dict[str, str]
) -> pa.Table:
    import pyarrow.compute as pc

    cols = [
        "subject", "predicate", "object_value",
        "object_type", "object_datatype", "object_lang",
    ]
    parts: list[pa.Table] = []
    for t in template:
        mask = None
        for x in (t.s, t.p, t.o):
            if isinstance(x, Var):
                if x.name not in table.column_names:
                    raise SparqlError(
                        f"CONSTRUCT template variable ?{x.name} is not bound "
                        "by the WHERE group"
                    )
                m = pc.is_valid(table.column(x.name))
                mask = m if mask is None else pc.and_(mask, m)
        sub = table if mask is None else table.filter(mask)
        n = sub.num_rows

        def const(val: str | None):
            if val is None:
                return pa.nulls(n, pa.string())
            return pa.nulls(n, pa.string()).fill_null(val)

        def term(x):
            if isinstance(x, Var):
                return pc.cast(sub.column(x.name), pa.string())
            if isinstance(x, Iri):
                return const(x.value)
            return const(x.value)  # Literal

        if isinstance(t.o, Var):
            name = t.o.name
            if f"{name}__type" in sub.column_names:
                otype = sub.column(f"{name}__type")
                odt = sub.column(f"{name}__datatype")
                olang = sub.column(f"{name}__lang")
            else:
                k = kinds.get(name, "unknown")
                otype = const("iri" if k == "iri" else None)
                odt, olang = const(None), const(None)
        elif isinstance(t.o, Iri):
            otype, odt, olang = const("iri"), const(None), const(None)
        else:
            otype = const("literal")
            odt = const(t.o.datatype)
            olang = const(t.o.lang)
        parts.append(
            pa.table(
                {
                    "subject": term(t.s),
                    "predicate": term(t.p),
                    "object_value": term(t.o),
                    "object_type": otype,
                    "object_datatype": odt,
                    "object_lang": olang,
                }
            )
        )
    out = pa.concat_tables(parts)
    # CONSTRUCT returns an RDF *graph*: set semantics + deterministic order
    out = out.group_by(cols, use_threads=False).aggregate([])
    return out.sort_by([(c, "ascending") for c in cols])


def _format_term(value, typ, datatype, lang) -> str:
    if typ == "iri" or (typ is None and value is not None and _IRI_SHAPE.match(str(value))):
        return f"<{value}>"
    s = '"' + str(value).replace("\\", "\\\\").replace('"', '\\"') + '"'
    if datatype:
        return f"{s}^^<{datatype}>"
    if lang:
        return f"{s}@{lang}"
    return s


def sparql_query(query: str, quads):
    """Form-dispatched execution: SELECT → result table, ASK → bool,
    CONSTRUCT → deduplicated triple table."""
    form = parse_sparql(query).form
    if form == "ASK":
        return sparql_ask(query, quads)
    if form == "CONSTRUCT":
        return sparql_construct(query, quads)
    if form == "DESCRIBE":
        return sparql_describe(query, quads)
    return sparql_select(query, quads)


def sparql_query_json(query: str, quads) -> dict:
    """Form-dispatched JSON shaping, matching the reference server's three
    response shapes (``rdf-workbench.py:415-468``): SELECT → SPARQL JSON
    results document, ASK → ``{"head": {}, "boolean": b}``, CONSTRUCT →
    ``{"triples": [N-Triples strings], "count": n}``."""
    form = parse_sparql(query).form
    if form == "ASK":
        return {"head": {}, "boolean": sparql_ask(query, quads)}
    if form in ("CONSTRUCT", "DESCRIBE"):
        t = (
            sparql_construct(query, quads)
            if form == "CONSTRUCT"
            else sparql_describe(query, quads)
        )
        triples = [
            f"<{r['subject']}> <{r['predicate']}> "
            + _format_term(
                r["object_value"], r["object_type"],
                r["object_datatype"], r["object_lang"],
            )
            + " ."
            for r in t.to_pylist()
        ]
        return {"triples": triples, "count": t.num_rows}
    return sparql_select_json(query, quads)


def load_quads_table(quads) -> pa.Table:
    """Materialize a quads source (Arrow table, parquet file / directory —
    recursive — or ``ray.data.Dataset``) to one Arrow table. Used by the
    serving layer, which holds the snapshot resident; :func:`sparql_select`
    itself accepts the same sources without pre-materializing."""
    if isinstance(quads, pa.Table):
        return quads
    if isinstance(quads, str):
        import pyarrow.parquet as pq

        if quads.endswith(".parquet"):
            return pq.read_table(quads)
        return pq.ParquetDataset(quads).read()
    import ray

    blocks = [b for b in ray.get(quads.to_arrow_refs()) if b.num_rows]
    if not blocks:
        from .schema import ANNOTATED_TRIPLE_SCHEMA

        return ANNOTATED_TRIPLE_SCHEMA.empty_table()
    return pa.concat_tables(blocks, promote_options="permissive")


def sparql_over_lake(
    lake_dir: str, query: str, *, at_lsn: int | None = None, json: bool = False
):
    """Point-in-time SPARQL over a CDC lake: snapshot → transcripts lift →
    query — the reference's ``FROM <batch graph>`` time-travel idiom
    (``rdf-workbench.py`` graph injection; here the manifest pins the
    snapshot instead, ``state/lake.py``)."""
    from .stages.lift import lift_dataset, transcripts_spec
    from .state.lake import read_state

    quads = lift_dataset(read_state(lake_dir, at_lsn=at_lsn), transcripts_spec())
    return sparql_select_json(query, quads) if json else sparql_select(query, quads)


def _with_optional_columns(table: pa.Table) -> pa.Table:
    """Ensure optional columns exist so compiled SQL always resolves."""
    from .schema import ANNOTATIONS_TYPE

    names = set(table.column_names)
    if "annotations" not in names:
        table = table.append_column(
            "annotations", pa.nulls(table.num_rows, ANNOTATIONS_TYPE)
        )
    for name in ("graph", "object_type", "object_datatype", "object_lang"):
        if name not in names:
            table = table.append_column(
                name, pa.nulls(table.num_rows, pa.string())
            )
    return table


_IRI_SHAPE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def to_sparql_json(table: pa.Table, kinds: dict[str, str] | None = None) -> dict:
    """Shape a result table as the SPARQL 1.1 JSON results document.

    Term typing: subject/predicate bindings are uris; object bindings use
    the carried ``object_type`` term-info column; annotation-value bindings
    (stored markerless, :data:`~.schema.ANNOTATION_STRUCT`) fall back to
    value shape (``scheme://`` ⇒ uri)."""
    kinds = kinds or {}
    names = set(table.column_names)
    base = [
        c
        for c in table.column_names
        if not any(
            c.endswith(suf) and c[: -len(suf)] in names
            for suf in ("__type", "__datatype", "__lang")
        )
    ]
    bindings = []
    for row in table.to_pylist():
        b = {}
        for var in base:
            val = row.get(var)
            if val is None:
                continue
            kind = kinds.get(var, "unknown")
            if (
                kind == "iri"
                or row.get(f"{var}__type") == "iri"
                or (
                    kind == "annvalue"
                    and f"{var}__type" not in row
                    and _IRI_SHAPE.match(str(val))
                )
            ):
                b[var] = {"type": "uri", "value": str(val)}
            else:
                term = {"type": "literal", "value": str(val)}
                if row.get(f"{var}__datatype"):
                    term["datatype"] = row[f"{var}__datatype"]
                elif row.get(f"{var}__lang"):
                    term["xml:lang"] = row[f"{var}__lang"]
                b[var] = term
        bindings.append(b)
    return {"head": {"vars": base}, "results": {"bindings": bindings}}
