"""Run-metadata injection: DCAT/DCT triples describing the ETL run itself.

Mirrors the reference's ``add_metadata`` (``rdf_star_etl_yarrrml.py:249-300``:
dcat:Dataset type, dct:title, dct:description naming the mapping file,
dct:created timestamp, one dct:creator per author) and the author-shortcut
parser (``yarrrml_parser.py:547-575``: ``"Name <email> (website)"`` / WebID).
The quads materialize as a tiny ``from_items`` dataset unioned into the lift
output — run lineage otherwise lives in the commit manifest."""

from __future__ import annotations

import re
from datetime import datetime, timezone

import ray.data as rd

from ..mapping import MappingSpec, expand_prefixed
from ..schema import OBJ_IRI, OBJ_LITERAL

_EMAIL = re.compile(r"<([^>]+)>")
_WEBSITE = re.compile(r"\(([^)]+)\)")


def parse_author(author_def) -> dict[str, str]:
    """``"Jane Doe <jane@x.org> (https://x.org)"`` → name/email/website;
    bare http(s) value → webid (reference semantics)."""
    if isinstance(author_def, dict):
        return dict(author_def)
    if not isinstance(author_def, str):
        return {}
    if author_def.startswith(("http://", "https://")):
        return {"webid": author_def}
    author: dict[str, str] = {}
    rest = author_def
    m = _EMAIL.search(rest)
    if m:
        author["email"] = m.group(1)
        rest = rest.replace(m.group(0), "").strip()
    m = _WEBSITE.search(rest)
    if m:
        author["website"] = m.group(1)
        rest = rest.replace(m.group(0), "").strip()
    if rest:
        author["name"] = rest
    return author


def run_metadata_rows(
    spec: MappingSpec, *, mapping_name: str = "mapping.yaml", now: str | None = None
) -> list[dict]:
    """Triple-record rows describing this run (same shape as the lift
    output; union them in or keep them manifest-side)."""
    prefixes = {
        "dcat": "http://www.w3.org/ns/dcat#",
        "dct": "http://purl.org/dc/terms/",
        "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
        "xsd": "http://www.w3.org/2001/XMLSchema#",
        **spec.prefixes,
    }
    base = spec.base or "http://example.org/"
    subject = f"{base}dataset/etl_import"
    now = now or datetime.now(timezone.utc).isoformat()

    def row(pred, value, *, otype=OBJ_LITERAL, dt=None):
        return {
            "subject": subject,
            "predicate": expand_prefixed(pred, prefixes),
            "object_value": value,
            "object_type": otype,
            "object_datatype": expand_prefixed(dt, prefixes) if dt else None,
            "object_lang": None,
            "graph": None,
            "map_name": "__run_metadata__",
        }

    rows = [
        row("rdf:type", expand_prefixed("dcat:Dataset", prefixes), otype=OBJ_IRI),
        row("dct:title", "ETL Pipeline Generated Dataset"),
        row("dct:description", f"Generated from YARRRML mapping: {mapping_name}"),
        row("dct:created", now, dt="xsd:dateTime"),
    ]
    for a in spec.authors:
        parsed = parse_author(a)
        rows.append(
            row("dct:creator", parsed.get("name", parsed.get("webid", "Unknown")))
        )
    return rows


def run_metadata_dataset(spec: MappingSpec, **kw) -> "rd.Dataset":
    return rd.from_items(run_metadata_rows(spec, **kw))
