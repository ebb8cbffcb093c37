"""YARRRML-lite declarative mapping: spec dataclasses, YAML parser, and the
Arrow kernel compiler.

The spec grammar mirrors the reference's parser IR (``yarrrml_parser.py:25-71``
— ``Source``/``PredicateObject``/``SubjectMapping``/``TriplesMap``) and its
parse rules (``yarrrml_parser.py:88-480``): prefixes, base, authors, root
sources/targets, subject shortcuts (``subjects``/``subject``/``s``),
predicate-object long + short forms (``predicateobjects``/``po``,
``predicates``/``p``, ``objects``/``o``), cartesian predicates × objects,
``a``/``rdf:type`` type statements, ``~iri`` suffix and third-element
datatype / ``xx~lang`` modifiers, per-level ``graphs`` with precedence
po > mapping > subject (``rdf_star_etl_yarrrml.py:331-333,357-358``), quoted
RDF-star subjects with ``join(quoted=TM, equal(str1=$(a), str2=$(b)))``
(``yarrrml_parser.py:240-273``), inverse predicates, and named function calls.

Execution is where this diverges completely from the reference: instead of
row loops over ``df.to_dicts()`` (``rdf_star_etl_yarrrml.py:89,439``), a
mapping compiles ONCE on the driver into vectorized Arrow kernels — template
instantiation becomes ``pc.binary_join_element_wise`` over pre-split
constant/variable segments, sanitization becomes one
``pc.replace_substring_regex``, prefix expansion is resolved at compile time —
and runs inside ``map_batches(batch_format="pyarrow")`` with zero per-row
Python.

Faithful corner cases (SURVEY.md §7.5.5):
- sanitize ``[^\\w\\-.]`` → ``_``; null/empty template variable → ``"unknown"``
  (``rdf_star_etl_yarrrml.py:45-58``). NOTE: Arrow's RE2 ``\\w`` is ASCII
  while CPython's ``re`` is Unicode — identical on ASCII ids, documented
  deviation for non-ASCII.
- prefix expansion only when ``:`` present and value does not start with
  ``http`` (``rdf_star_etl_yarrrml.py:61-74``).
- IRI objects referencing a bare column pass ``http(s)://`` values through
  untouched (``rdf_star_etl_yarrrml.py:361-382``).
- literal properties with null/empty values are skipped
  (``rdf_star_etl_engine_dynamic.py:311``); IRI templates keep the row with
  ``"unknown"`` components.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .functions import get_function
from .schema import OBJ_IRI, OBJ_LITERAL

TEMPLATE_VAR_PATTERN = re.compile(r"\$\(([^)]+)\)")
URI_SANITIZE_RE2 = r"[^\w\-.]"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# ---------------------------------------------------------------------------
# Spec dataclasses (IR)
# ---------------------------------------------------------------------------


@dataclass
class SourceSpec:
    name: str
    path: str
    format: str = "csv"


@dataclass
class PredicateObjectSpec:
    predicate: str
    value: str
    object_type: str = OBJ_LITERAL  # "literal" | "iri"
    datatype: str | None = None
    language: str | None = None
    inverse_predicate: str | None = None
    graphs: list[str] = field(default_factory=list)
    function: str | None = None  # named function applied to the value column
    mapping_ref: str | None = None
    condition: dict | None = None  # row filter (equal), EXECUTED here


@dataclass
class SubjectSpec:
    template: str | None = None
    templates: list[str] = field(default_factory=list)
    is_quoted: bool = False
    quoted_ref: str | None = None
    quoted_non_asserted: bool = False
    join_left: str | None = None  # $(col) on the annotation side
    join_right: str | None = None  # $(col) on the quoted-map side
    graphs: list[str] = field(default_factory=list)


@dataclass
class TriplesMapSpec:
    name: str
    sources: list[SourceSpec] = field(default_factory=list)
    subject: SubjectSpec = field(default_factory=SubjectSpec)
    predicate_objects: list[PredicateObjectSpec] = field(default_factory=list)
    type_statements: list[str] = field(default_factory=list)
    graphs: list[str] = field(default_factory=list)
    condition: dict | None = None  # mapping-level row filter, EXECUTED here


@dataclass
class MappingSpec:
    prefixes: dict[str, str] = field(default_factory=dict)
    base: str | None = None
    authors: list[str] = field(default_factory=list)
    sources: dict[str, SourceSpec] = field(default_factory=dict)
    targets: dict[str, dict] = field(default_factory=dict)
    maps: dict[str, TriplesMapSpec] = field(default_factory=dict)

    def expand(self, uri: str) -> str:
        return expand_prefixed(uri, self.prefixes)


def expand_prefixed(uri: str, prefixes: dict[str, str]) -> str:
    """Prefix expansion with the reference's exact guard
    (``rdf_star_etl_yarrrml.py:61-74``)."""
    if ":" in uri and not uri.startswith("http"):
        prefix, local = uri.split(":", 1)
        if prefix in prefixes:
            return prefixes[prefix] + local
    return uri


# ---------------------------------------------------------------------------
# YAML parsing
# ---------------------------------------------------------------------------


def parse_yarrrml(text_or_dict) -> MappingSpec:
    import yaml

    raw = (
        yaml.safe_load(text_or_dict)
        if isinstance(text_or_dict, str)
        else text_or_dict
    )
    spec = MappingSpec()
    spec.base = raw.get("base")
    spec.prefixes = dict(raw.get("prefixes", {}))
    spec.authors = _parse_authors(raw.get("authors", raw.get("author")))
    for name, sdef in (raw.get("sources") or {}).items():
        spec.sources[name] = _parse_source(sdef, name)
    spec.targets = dict(raw.get("targets") or {})
    for name, mdef in (raw.get("mappings") or {}).items():
        spec.maps[name] = _parse_triples_map(name, mdef)
    return spec


def parse_yarrrml_file(path: str) -> MappingSpec:
    with open(path, encoding="utf-8") as f:
        return parse_yarrrml(f.read())


def _parse_authors(adef) -> list[str]:
    if adef is None:
        return []
    if isinstance(adef, str):
        return [adef]
    return [str(a) for a in adef]


def _parse_source(sdef, name: str) -> SourceSpec:
    if isinstance(sdef, str):
        path, fmt = (sdef.split("~", 1) + ["csv"])[:2] if "~" in sdef else (sdef, "csv")
        return SourceSpec(name=name, path=path, format=fmt)
    if isinstance(sdef, dict):
        return SourceSpec(
            name=name,
            path=sdef.get("access", name),
            format=sdef.get("referenceFormulation", "csv"),
        )
    if isinstance(sdef, list) and sdef:
        return _parse_source(sdef[0], name)
    return SourceSpec(name=name, path=name)


def _parse_sources_entry(sources_def) -> list[SourceSpec]:
    out: list[SourceSpec] = []
    if sources_def is None:
        return out
    if isinstance(sources_def, (str, dict)):
        sources_def = [sources_def]
    for sdef in sources_def:
        if isinstance(sdef, list) and sdef:
            out.append(_parse_source(sdef[0], str(sdef[0])))
        else:
            out.append(_parse_source(sdef, str(sdef)))
    return out


_JOIN_EQ = re.compile(r"equal\s*\(\s*str1=\$\(([^)]+)\)\s*,\s*str2=\$\(([^)]+)\)\s*\)")
_JOIN_QUOTED = re.compile(r"quoted(?:NonAsserted)?=(\w+)")


def _parse_subject(sdef) -> SubjectSpec:
    sm = SubjectSpec()
    if isinstance(sdef, str):
        sm.template = sdef
        sm.templates = [sdef]
        return sm
    if isinstance(sdef, dict):
        sdef = [sdef]
    if isinstance(sdef, list):
        for item in sdef:
            if isinstance(item, str):
                sm.templates.append(item)
            elif isinstance(item, dict):
                if "function" in item and "join(" in str(item["function"]):
                    fstr = str(item["function"])
                    sm.is_quoted = True
                    q = _JOIN_QUOTED.search(fstr)
                    if q:
                        sm.quoted_ref = q.group(1)
                    sm.quoted_non_asserted = "quotedNonAsserted=" in fstr
                    eq = _JOIN_EQ.search(fstr)
                    if eq:
                        # RML convention: str1 = child (this annotation map),
                        # str2 = parent (the quoted map)
                        sm.join_left, sm.join_right = eq.group(1), eq.group(2)
                elif "quoted" in item or "quotedNonAsserted" in item:
                    sm.is_quoted = True
                    sm.quoted_non_asserted = "quotedNonAsserted" in item
                    sm.quoted_ref = item.get("quoted", item.get("quotedNonAsserted"))
                    cond = item.get("condition")
                    if cond and "parameters" in cond:
                        # long-form equal condition: parameters [[str1,$(a)],[str2,$(b)]]
                        params = {p[0]: p[1] for p in cond["parameters"]}
                        right = TEMPLATE_VAR_PATTERN.findall(params.get("str1", ""))
                        left = TEMPLATE_VAR_PATTERN.findall(params.get("str2", ""))
                        sm.join_right = right[0] if right else None
                        sm.join_left = left[0] if left else None
                elif "value" in item:
                    sm.templates.append(item["value"])
                if "graphs" in item:
                    g = item["graphs"]
                    sm.graphs = [g] if isinstance(g, str) else list(g)
        if not sm.is_quoted and sm.templates:
            sm.template = sm.templates[0]
    return sm


def _parse_po_shorthand(po_def: list) -> tuple[list[PredicateObjectSpec], list[str]]:
    pos, types = [], []
    predicates = po_def[0] if isinstance(po_def[0], list) else [po_def[0]]
    objects = po_def[1] if isinstance(po_def[1], list) else [po_def[1]]
    modifier = po_def[2] if len(po_def) > 2 else None
    for predicate in predicates:
        for obj in objects:
            obj_type, datatype, language = OBJ_LITERAL, None, None
            value = obj
            if isinstance(value, str) and value.endswith("~iri"):
                obj_type, value = OBJ_IRI, value[:-4]
            if isinstance(modifier, str):
                if modifier == "iri":
                    obj_type = OBJ_IRI
                elif modifier.endswith("~lang"):
                    language = modifier[: -len("~lang")]
                else:
                    datatype = modifier
            if predicate in ("a", "rdf:type"):
                types.append(value)
            else:
                pos.append(
                    PredicateObjectSpec(
                        predicate=predicate,
                        value=str(value),
                        object_type=obj_type,
                        datatype=datatype,
                        language=language,
                    )
                )
    return pos, types


def _parse_po_long(po_def: dict) -> tuple[list[PredicateObjectSpec], list[str]]:
    pos, types = [], []
    predicates = po_def.get("predicates", po_def.get("predicate", po_def.get("p", [])))
    if not isinstance(predicates, list):
        predicates = [predicates]
    objects = po_def.get("objects", po_def.get("object", po_def.get("o", {})))
    if not isinstance(objects, list):
        objects = [objects]
    inverse = po_def.get(
        "inversepredicates", po_def.get("inversepredicate", po_def.get("i"))
    )
    if isinstance(inverse, list):
        inverse = inverse[0] if inverse else None
    graphs = po_def.get("graphs", [])
    graphs = [graphs] if isinstance(graphs, str) else list(graphs)
    for pred in predicates:
        for obj in objects:
            if isinstance(obj, dict):
                value = obj.get("value", obj.get("v", ""))
                obj_type = obj.get("type", OBJ_LITERAL)
                datatype = obj.get("datatype")
                language = obj.get("language")
                fn = obj.get("function", obj.get("fn", obj.get("f")))
                mapping_ref = obj.get("mapping")
                if mapping_ref:
                    obj_type = OBJ_IRI
                og = obj.get("graphs", [])
                og = [og] if isinstance(og, str) else list(og)
                graphs = graphs or og
            else:
                value, obj_type, datatype, language, fn, mapping_ref = (
                    str(obj),
                    OBJ_LITERAL,
                    None,
                    None,
                    None,
                    None,
                )
                if value.endswith("~iri"):
                    obj_type, value = OBJ_IRI, value[:-4]
            if pred in ("a", "rdf:type"):
                types.append(value)
                continue
            pos.append(
                PredicateObjectSpec(
                    predicate=pred,
                    value=value,
                    object_type=obj_type,
                    datatype=datatype,
                    language=language,
                    inverse_predicate=inverse,
                    graphs=graphs,
                    function=str(fn) if fn else None,
                    mapping_ref=mapping_ref,
                    condition=po_def.get("condition")
                    if isinstance(po_def.get("condition"), (dict, str))
                    else None,
                )
            )
    return pos, types


def _parse_triples_map(name: str, mdef: dict) -> TriplesMapSpec:
    tm = TriplesMapSpec(name=name)
    tm.sources = _parse_sources_entry(mdef.get("sources"))
    for key in ("subjects", "subject", "s"):
        if key in mdef:
            tm.subject = _parse_subject(mdef[key])
            break
    for key in ("predicateobjects", "po"):
        if key in mdef:
            for po_def in mdef[key]:
                if isinstance(po_def, list) and len(po_def) >= 2:
                    pos, types = _parse_po_shorthand(po_def)
                elif isinstance(po_def, dict):
                    pos, types = _parse_po_long(po_def)
                else:
                    continue
                tm.predicate_objects.extend(pos)
                tm.type_statements.extend(types)
            break
    g = mdef.get("graphs", [])
    tm.graphs = [g] if isinstance(g, str) else list(g)
    if isinstance(mdef.get("condition"), dict):
        tm.condition = mdef["condition"]
    return tm


# ---------------------------------------------------------------------------
# Kernel compiler
# ---------------------------------------------------------------------------


def split_template(template: str) -> list[tuple[str, str]]:
    """Split ``ex:turn/$(conv_id)_$(turn_idx)`` into constant/variable
    segments, resolved once at compile time."""
    segs: list[tuple[str, str]] = []
    pos = 0
    for m in TEMPLATE_VAR_PATTERN.finditer(template):
        if m.start() > pos:
            segs.append(("const", template[pos : m.start()]))
        segs.append(("var", m.group(1)))
        pos = m.end()
    if pos < len(template):
        segs.append(("const", template[pos:]))
    return segs


def _stringify(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return col
    if pa.types.is_timestamp(t):
        # Arrow's %S includes the fractional seconds of the unit (always 6
        # digits for us-precision); equals DuckDB strftime('...%S.%f')
        return pc.strftime(col, format="%Y-%m-%dT%H:%M:%S")
    return pc.cast(col, pa.string())


def sanitize_component(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """URI-component sanitize (``rdf_star_etl_yarrrml.py:45-58``):
    null/'' → "unknown", then ``[^\\w\\-.]`` → ``_`` (RE2, ASCII word class)."""
    s = _stringify(col)
    s = pc.fill_null(s, "unknown")
    s = pc.if_else(pc.equal(s, ""), pa.scalar("unknown"), s)
    return pc.replace_substring_regex(s, URI_SANITIZE_RE2, "_")


def _const_column(n: int, value: str | None) -> pa.Array:
    if value is None:
        return pa.nulls(n, pa.string())
    return pc.fill_null(pa.nulls(n, pa.string()), value)


def _to_np_bool(arr) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False).astype(bool)


def _nonempty_mask(vals, n: int) -> np.ndarray:
    if n == 0:
        return np.zeros(0, dtype=bool)
    return _to_np_bool(
        pc.and_(pc.is_valid(vals), pc.not_equal(pc.fill_null(vals, ""), ""))
    )


class CompiledTemplate:
    """A URI/literal template compiled to an Arrow concat plan."""

    def __init__(self, template: str, prefixes: dict[str, str], *, sanitize: bool):
        # expand prefix on the CONSTANT prefix segment at compile time, after
        # variable placeholders are substituted the reference expands the full
        # string; expanding the leading constant is equivalent because
        # variables are sanitized to [\w\-.] and cannot introduce ':'
        self.segments = split_template(template)
        self.sanitize = sanitize
        self.variables = [v for k, v in self.segments if k == "var"]
        if self.segments and self.segments[0][0] == "const":
            head = self.segments[0][1]
        else:
            head = ""
        if len(self.segments) == 1 and self.segments[0][0] == "const":
            self.segments = [("const", expand_prefixed(head, prefixes))]
        elif head:
            # expand e.g. "ex:dataset/" using the prefix dict: temporarily
            # complete the template with a sentinel to reuse the same rule
            expanded_full = expand_prefixed(template, prefixes)
            if expanded_full != template:
                # re-split with the expanded constant head
                prefix, local = template.split(":", 1)
                expanded_head = prefixes[prefix] + local[: len(head) - len(prefix) - 1]
                self.segments = [("const", expanded_head)] + self.segments[1:]

    def __call__(self, table: pa.Table) -> pa.Array:
        n = table.num_rows
        parts = []
        for kind, val in self.segments:
            if kind == "const":
                parts.append(_const_column(n, val))
            else:
                if val in table.column_names:
                    col = table.column(val)
                    parts.append(
                        sanitize_component(col) if self.sanitize else _stringify(col)
                    )
                else:
                    # missing column → "unknown" (sanitize) / null (literal),
                    # the reference's weak-schema contract
                    parts.append(
                        _const_column(n, "unknown" if self.sanitize else None)
                    )
        if len(parts) == 1:
            out = parts[0]
        else:
            out = pc.binary_join_element_wise(*parts, "")
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        return out


_COND_SHORT = re.compile(r"(\w+)\s*\(\s*(.*)\s*\)\s*$")


class CompiledCondition:
    """An executed YARRRML ``condition:`` — the reference parses these
    (``yarrrml_parser.py:608-612``) but never executes them; here an
    ``equal`` condition becomes a vectorized row mask. Sides are templates
    (``$(col)`` refs, constants, or mixes) evaluated without sanitizing;
    null on either side fails the comparison (SQL semantics)."""

    def __init__(self, cond: dict | str, prefixes: dict[str, str]):
        fn, params = "equal", {}
        if isinstance(cond, str):
            m = _COND_SHORT.match(cond.strip())
            if not m:
                raise ValueError(f"unparseable condition {cond!r}")
            fn = m.group(1)
            for part in m.group(2).split(","):
                if "=" in part:
                    k, v = part.split("=", 1)
                    params[k.strip()] = v.strip()
        else:
            fn = str(cond.get("function", "equal")).rsplit(":", 1)[-1]
            raw = cond.get("parameters", [])
            for p in raw:
                if isinstance(p, dict):
                    params[str(p.get("parameter"))] = str(p.get("value", ""))
                elif isinstance(p, (list, tuple)) and len(p) >= 2:
                    params[str(p[0])] = str(p[1])
        if fn not in ("equal", "notEqual", "idlab-fn:notEqual"):
            raise ValueError(f"unsupported condition function {fn!r} (equal/notEqual)")
        self.negate = "notEqual" in fn
        self.left = CompiledTemplate(params.get("str1", ""), prefixes, sanitize=False)
        self.right = CompiledTemplate(params.get("str2", ""), prefixes, sanitize=False)

    def mask(self, table: pa.Table) -> np.ndarray:
        lhs, rhs = self.left(table), self.right(table)
        eq = pc.fill_null(pc.equal(lhs, rhs), False)
        m = _to_np_bool(eq)
        return ~m if self.negate else m


class CompiledPO:
    """One predicate-object pair compiled against a prefix dict."""

    def __init__(self, po: PredicateObjectSpec, prefixes: dict[str, str]):
        self.predicate = expand_prefixed(po.predicate, prefixes)
        self.object_type = po.object_type
        self.datatype = expand_prefixed(po.datatype, prefixes) if po.datatype else None
        self.language = po.language
        self.graph = expand_prefixed(po.graphs[0], prefixes) if po.graphs else None
        self.inverse = (
            expand_prefixed(po.inverse_predicate, prefixes)
            if po.inverse_predicate
            else None
        )
        self.function = po.function
        segs = split_template(po.value)
        self.bare_var = (
            segs[0][1] if len(segs) == 1 and segs[0][0] == "var" else None
        )
        is_iri = po.object_type == OBJ_IRI
        self.template = CompiledTemplate(po.value, prefixes, sanitize=is_iri)
        self.condition = (
            CompiledCondition(po.condition, prefixes) if po.condition else None
        )

    def values(self, table: pa.Table) -> tuple[pa.Array, np.ndarray]:
        """(object_value array, keep mask). IRI-typed bare columns pass
        ``http(s)://`` values straight through; literals drop null/empty."""
        n = table.num_rows
        if self.bare_var is not None and self.bare_var in table.column_names:
            raw = table.column(self.bare_var)
            if self.object_type == OBJ_IRI:
                s = _stringify(raw)
                passthrough = pc.fill_null(
                    pc.starts_with(pc.fill_null(s, ""), "http"), False
                )
                templated = self.template(table)
                vals = pc.if_else(passthrough, s, templated)
                keep = np.ones(n, dtype=bool)
            else:
                vals = _stringify(raw)
                if self.function:
                    vals = get_function(self.function)(vals)
                keep = _nonempty_mask(vals, n)
        else:
            vals = self.template(table)
            if self.function:
                vals = get_function(self.function)(vals)
            if self.object_type == OBJ_IRI:
                keep = np.ones(n, dtype=bool)
            else:
                keep = _nonempty_mask(vals, n)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        if self.condition is not None:
            keep = keep & self.condition.mask(table)
        return vals, keep


class LiftKernel:
    """The compiled row→triples lift for one (non-quoted) triples map: a
    callable for ``map_batches(..., batch_format="pyarrow")``.

    The k-triples-per-row fan-out is built COLUMN-WISE: one sub-table per
    type-statement / predicate-object (constant predicate/type columns,
    vectorized subject + object arrays), concatenated per batch — a
    flat_map at batch granularity with no per-row Python (SURVEY.md §7.5.7).
    """

    def __init__(
        self,
        tm: TriplesMapSpec,
        prefixes: dict[str, str],
        *,
        carry_columns: tuple[str, ...] = (),
        include_map_name: bool = True,
        all_maps: dict[str, "TriplesMapSpec"] | None = None,
    ):
        if tm.subject.is_quoted:
            raise ValueError(f"{tm.name}: quoted maps compile via AnnotationKernel")
        if not tm.subject.template:
            raise ValueError(f"{tm.name}: subject template required")
        if all_maps:
            # mapping-to-mapping object references (parsed but never executed
            # by the reference engines, ``yarrrml_parser.py:433-437`` /
            # ``docs/YARRRML_COVERAGE_ANALYSIS.md``): for same-source refs the
            # RML semantics reduce to instantiating the referenced map's
            # subject template on the current row — executed here
            resolved = []
            for po in tm.predicate_objects:
                if po.mapping_ref and po.mapping_ref in all_maps:
                    ref_tpl = all_maps[po.mapping_ref].subject.template
                    if ref_tpl:
                        po = PredicateObjectSpec(
                            predicate=po.predicate,
                            value=ref_tpl,
                            object_type=OBJ_IRI,
                            graphs=po.graphs,
                            inverse_predicate=po.inverse_predicate,
                        )
                resolved.append(po)
            tm = TriplesMapSpec(
                name=tm.name,
                sources=tm.sources,
                subject=tm.subject,
                predicate_objects=resolved,
                type_statements=tm.type_statements,
                graphs=tm.graphs,
                condition=tm.condition,
            )
        self.name = tm.name
        self.carry = tuple(carry_columns)
        self.include_map_name = include_map_name
        self.subject_templates = [
            CompiledTemplate(t, prefixes, sanitize=True)
            for t in (tm.subject.templates or [tm.subject.template])
        ]
        mapping_graph = tm.graphs[0] if tm.graphs else None
        subject_graph = tm.subject.graphs[0] if tm.subject.graphs else None
        default_graph = mapping_graph or subject_graph  # precedence rule
        self.default_graph = (
            expand_prefixed(default_graph, prefixes) if default_graph else None
        )
        self.types = [expand_prefixed(t, prefixes) for t in tm.type_statements]
        self.pos = [CompiledPO(po, prefixes) for po in tm.predicate_objects]
        self.condition = (
            CompiledCondition(tm.condition, prefixes) if tm.condition else None
        )

    def _sub_table(
        self,
        table: pa.Table,
        subject: pa.Array,
        predicate: str,
        values: pa.Array,
        keep: np.ndarray | None,
        *,
        object_type: str,
        datatype: str | None,
        language: str | None,
        graph: str | None,
    ) -> pa.Table | None:
        n = table.num_rows
        cols = {
            "subject": subject,
            "predicate": _const_column(n, predicate),
            "object_value": values,
            "object_type": _const_column(n, object_type),
            "object_datatype": _const_column(n, datatype),
            "object_lang": _const_column(n, language),
            "graph": _const_column(n, graph or self.default_graph),
        }
        if self.include_map_name:
            cols["map_name"] = _const_column(n, self.name)
        for c in self.carry:
            if c in table.column_names:
                cols[c] = table.column(c)
            else:
                cols[c] = pa.nulls(n, pa.string())
        out = pa.table(cols)
        if keep is not None and not keep.all():
            out = out.filter(pa.array(keep))
        return out if out.num_rows else None

    def __call__(self, table: pa.Table) -> pa.Table:
        if self.condition is not None:
            # mapping-level condition: filter source rows before the lift
            table = table.filter(pa.array(self.condition.mask(table)))
        subs = [tpl(table) for tpl in self.subject_templates]
        parts: list[pa.Table] = []
        for subject in subs:
            for type_uri in self.types:
                st = self._sub_table(
                    table,
                    subject,
                    RDF_TYPE,
                    _const_column(table.num_rows, type_uri),
                    None,
                    object_type=OBJ_IRI,
                    datatype=None,
                    language=None,
                    graph=None,
                )
                if st is not None:
                    parts.append(st)
            for po in self.pos:
                vals, keep = po.values(table)
                st = self._sub_table(
                    table,
                    subject,
                    po.predicate,
                    vals,
                    keep,
                    object_type=po.object_type,
                    datatype=po.datatype,
                    language=po.language,
                    graph=po.graph,
                )
                if st is not None:
                    parts.append(st)
                if po.inverse and po.object_type == OBJ_IRI:
                    st = self._sub_table(
                        table,
                        vals,
                        po.inverse,
                        subject,
                        keep,
                        object_type=OBJ_IRI,
                        datatype=None,
                        language=None,
                        graph=po.graph,
                    )
                    if st is not None:
                        parts.append(st)
        if not parts:
            return self._sub_table(
                table.slice(0, 0),
                pa.array([], pa.string()),
                "",
                pa.array([], pa.string()),
                None,
                object_type=OBJ_LITERAL,
                datatype=None,
                language=None,
                graph=None,
            ) or pa.table({})
        return pa.concat_tables(parts)


def compile_lift(
    spec: MappingSpec,
    tm_name: str,
    *,
    carry_columns: tuple[str, ...] = (),
    include_map_name: bool = True,
) -> LiftKernel:
    return LiftKernel(
        spec.maps[tm_name],
        spec.prefixes,
        carry_columns=carry_columns,
        include_map_name=include_map_name,
        all_maps=spec.maps,
    )


def output_path_from_spec(spec: MappingSpec, default: str = "output.trig") -> str:
    """Output path from the mapping's ``targets:`` section or a derived
    default (reference: ``_determine_output_file``
    ``rdf_star_etl_yarrrml.py:184-200``; targets parse
    ``yarrrml_parser.py:117-120``)."""
    for target in spec.targets.values():
        if isinstance(target, dict) and target.get("access"):
            return target["access"]
        if isinstance(target, str):
            return target.split("~", 1)[0]
    return default
