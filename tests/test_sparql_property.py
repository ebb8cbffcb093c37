"""Property test: the SPARQL BGP→SQL compiler against a naive reference
evaluator.

Hypothesis generates small quad tables and random basic graph patterns
(2–3 triple patterns, random variable sharing and constant placement); the
compiled-SQL result must equal the textbook nested-loop evaluation of the
same BGP (multiset of solution mappings). This is the same
engine-vs-independent-model discipline the mapping layer uses
(``test_property.py``)."""

import itertools

import pyarrow as pa
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from etl_pipeline_rdf_star_ray.schema import ANNOTATIONS_TYPE
from etl_pipeline_rdf_star_ray.sparql import (
    Iri,
    Literal,
    TriplePattern,
    Var,
    parse_sparql,
    sparql_select,
)

_SUBJECTS = [f"http://x/s{i}" for i in range(4)]
_PREDICATES = [f"http://x/p{i}" for i in range(3)]
_OBJECTS = ["a", "b", "http://x/s0", "http://x/s1"]

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


def _quads_table(triples: list[tuple[str, str, str]]) -> pa.Table:
    rows = [
        {
            "subject": s, "predicate": p, "object_value": o,
            "object_type": "literal", "object_datatype": None,
            "object_lang": None, "graph": None, "annotations": [],
        }
        for s, p, o in triples
    ]
    return pa.Table.from_pylist(rows, schema=_SCHEMA)


def _naive_eval(
    triples: list[tuple[str, str, str]], patterns: list[TriplePattern]
) -> list[dict]:
    """Textbook BGP semantics: nested loops over the data, accumulating
    compatible solution mappings."""
    solutions = [{}]
    for pat in patterns:
        nxt = []
        for binding in solutions:
            for s, p, o in triples:
                cand = dict(binding)
                ok = True
                for term, value in ((pat.s, s), (pat.p, p), (pat.o, o)):
                    if isinstance(term, Var):
                        if cand.get(term.name, value) != value:
                            ok = False
                            break
                        cand[term.name] = value
                    elif term.value != value:
                        ok = False
                        break
                if ok:
                    nxt.append(cand)
        solutions = nxt
    return solutions


_term = st.one_of(
    st.sampled_from([Var("a"), Var("b"), Var("c")]),
    st.sampled_from([Iri(s) for s in _SUBJECTS[:2]]),
)
_pred_term = st.one_of(
    st.sampled_from([Var("p1"), Var("p2")]),
    st.sampled_from([Iri(p) for p in _PREDICATES]),
)
_obj_term = st.one_of(
    st.sampled_from([Var("a"), Var("b"), Var("v")]),
    st.sampled_from([Literal(o) for o in _OBJECTS[:2]]),
)

_pattern = st.builds(TriplePattern, _term, _pred_term, _obj_term)

_triples = st.lists(
    st.tuples(
        st.sampled_from(_SUBJECTS),
        st.sampled_from(_PREDICATES),
        st.sampled_from(_OBJECTS),
    ),
    min_size=0,
    max_size=12,
    unique=True,
)


def _to_sparql(patterns: list[TriplePattern]) -> tuple[str, list[str]]:
    def term(t):
        if isinstance(t, Var):
            return f"?{t.name}"
        if isinstance(t, Iri):
            return f"<{t.value}>"
        return f'"{t.value}"'

    var_names = sorted(
        {
            t.name
            for p in patterns
            for t in (p.s, p.p, p.o)
            if isinstance(t, Var)
        }
    )
    body = " . ".join(f"{term(p.s)} {term(p.p)} {term(p.o)}" for p in patterns)
    sel = " ".join(f"?{v}" for v in var_names) or "?unused"
    return f"SELECT {sel} WHERE {{ {body} }}", var_names


@settings(max_examples=120, deadline=None)
@given(triples=_triples, patterns=st.lists(_pattern, min_size=1, max_size=3))
def test_bgp_compiler_matches_naive_evaluator(triples, patterns):
    var_names = {
        t.name
        for p in patterns
        for t in (p.s, p.p, p.o)
        if isinstance(t, Var)
    }
    if not var_names:  # SELECT needs at least one variable
        patterns = patterns + [TriplePattern(Var("a"), Var("p1"), Var("v"))]
        var_names = {"a", "p1", "v"}

    query, sel_vars = _to_sparql(patterns)
    got = sparql_select(query, _quads_table(triples)).to_pylist()
    expected = [
        {v: sol[v] for v in sel_vars} for sol in _naive_eval(triples, patterns)
    ]
    key = lambda d: tuple(d[v] for v in sel_vars)  # noqa: E731
    assert sorted(got, key=key) == sorted(expected, key=key)


def test_naive_evaluator_sanity():
    """The reference model itself on a worked example."""
    triples = [
        ("http://x/s0", "http://x/p0", "http://x/s1"),
        ("http://x/s1", "http://x/p0", "http://x/s2"),
    ]
    pats = [
        TriplePattern(Var("a"), Iri("http://x/p0"), Var("b")),
        TriplePattern(Var("b"), Iri("http://x/p0"), Var("c")),
    ]
    assert _naive_eval(triples, pats) == [
        {"a": "http://x/s0", "b": "http://x/s1", "c": "http://x/s2"}
    ]


def test_exhaustive_two_pattern_join_shapes():
    """Deterministic sweep: every var-sharing shape of a 2-pattern BGP over
    a fixed 6-triple table agrees with the naive evaluator."""
    triples = [
        ("http://x/s0", "http://x/p0", "a"),
        ("http://x/s0", "http://x/p1", "b"),
        ("http://x/s1", "http://x/p0", "a"),
        ("http://x/s1", "http://x/p1", "http://x/s0"),
        ("http://x/s2", "http://x/p2", "b"),
        ("http://x/s2", "http://x/p0", "http://x/s1"),
    ]
    quads = _quads_table(triples)
    svars = [Var("a"), Var("b")]
    for s1, o1, s2, o2 in itertools.product(svars, repeat=4):
        pats = [
            TriplePattern(s1, Iri("http://x/p0"), o1),
            TriplePattern(s2, Iri("http://x/p1"), o2),
        ]
        var_names = sorted({t.name for p in pats for t in (p.s, p.o)})
        query, sel_vars = _to_sparql(pats)
        got = sparql_select(query, quads).to_pylist()
        expected = [
            {v: sol[v] for v in sel_vars}
            for sol in _naive_eval(triples, pats)
        ]
        key = lambda d: tuple(d[v] for v in sel_vars)  # noqa: E731
        assert sorted(got, key=key) == sorted(expected, key=key), pats


# ---------------------------------------------------------------------------
# property-path alternation ≡ UNION rewrite (round 4)
# ---------------------------------------------------------------------------

_triple = st.tuples(
    st.sampled_from(_SUBJECTS),
    st.sampled_from(_PREDICATES),
    st.sampled_from(_OBJECTS),
)


@given(
    st.lists(_triple, min_size=0, max_size=15),
    st.lists(st.sampled_from(_PREDICATES), min_size=2, max_size=3, unique=True),
)
@settings(max_examples=30, deadline=None)
def test_alternation_equals_union_rewrite(triples, preds):
    """`?s p1|p2|… ?o` (compiled as predicate IN-list) must return the same
    solution multiset as the manual UNION rewrite the parser recommends for
    unsupported forms — the alternation's semantic contract."""
    quads = _quads_table(triples)
    alt = "|".join(f"<{p}>" for p in preds)
    got = sparql_select(
        f"SELECT ?s ?o WHERE {{ ?s {alt} ?o }}", quads
    )
    union = " UNION ".join(f"{{ ?s <{p}> ?o }}" for p in preds)
    want = sparql_select(f"SELECT ?s ?o WHERE {{ {union} }}", quads)

    def norm(t: pa.Table) -> list:
        return sorted(
            zip(t.column("s").to_pylist(), t.column("o").to_pylist())
        )

    assert norm(got) == norm(want), (triples, preds)


# ---------------------------------------------------------------------------
# MINUS + HAVING (round 4)
# ---------------------------------------------------------------------------


def _minus_reference(
    triples, main_pats, minus_pats
) -> list[dict]:
    """SPARQL 1.1 §8.3 reference semantics over the naive evaluator:
    remove μ1 iff some μ2 of the MINUS group is compatible on the shared
    variables AND dom(μ1) ∩ dom(μ2) ≠ ∅."""
    main = _naive_eval(triples, main_pats)
    sub = _naive_eval(triples, minus_pats)
    out = []
    for m in main:
        removed = False
        for s2 in sub:
            shared = set(m) & set(s2)
            if shared and all(m[v] == s2[v] for v in shared):
                removed = True
                break
        if not removed:
            out.append(m)
    return out


@settings(max_examples=100, deadline=None)
@given(
    triples=_triples,
    main=st.lists(_pattern, min_size=1, max_size=2),
    minus=st.lists(_pattern, min_size=1, max_size=2),
)
def test_minus_matches_spec_reference(triples, main, minus):
    """Random BGPs on both sides of MINUS (shared-variable structure is
    random: 0, 1 or many shared vars) against the §8.3 reference over the
    naive evaluator — including the disjoint-domain keep-everything rule."""
    quads = _quads_table(triples)
    q_main, var_names = _to_sparql(main)
    assume(var_names)  # an all-constant minuend has no projectable vars
    body_main = q_main.split("WHERE { ")[1][:-2]

    def term(t):
        if isinstance(t, Var):
            return f"?{t.name}"
        if isinstance(t, Iri):
            return f"<{t.value}>"
        return f'"{t.value}"'

    body_minus = " . ".join(
        f"{term(p.s)} {term(p.p)} {term(p.o)}" for p in minus
    )
    sel = " ".join(f"?{v}" for v in var_names)
    query = (
        f"SELECT {sel} WHERE {{ {body_main} MINUS {{ {body_minus} }} }}"
    )
    got = sparql_select(query, quads)
    want = sorted(
        tuple(sol.get(v) for v in var_names)
        for sol in _minus_reference(triples, main, minus)
    )
    got_rows = sorted(
        tuple(r[v] for v in var_names) for r in got.to_pylist()
    )
    assert got_rows == want, (triples, query)


@settings(max_examples=60, deadline=None)
@given(
    triples=_triples,
    threshold=st.integers(min_value=1, max_value=4),
)
def test_having_equals_post_filter(triples, threshold):
    """GROUP BY + HAVING(COUNT > n) equals computing the ungated aggregate
    and filtering afterwards."""
    quads = _quads_table(triples)
    gated = sparql_select(
        "SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p "
        f"HAVING (COUNT(?s) > {threshold}) ORDER BY ?p",
        quads,
    )
    full = sparql_select(
        "SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p ORDER BY ?p",
        quads,
    )
    want = [
        (p, n)
        for p, n in zip(
            full.column("p").to_pylist(), full.column("n").to_pylist()
        )
        if int(n) > threshold
    ]
    got = list(
        zip(gated.column("p").to_pylist(), gated.column("n").to_pylist())
    )
    assert [(p, int(n)) for p, n in got] == [
        (p, int(n)) for p, n in want
    ], triples
