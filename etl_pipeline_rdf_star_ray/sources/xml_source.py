"""XML connector: XPath element selection + attribute/child flattening.

Behavior mirrors the reference connector (``sources/xml_source.py``):
attributes become ``@attr`` keys (reference ``element_to_dict`` ``:27-69``),
text content ``#text``, repeated same-name children become lists; flattening
(reference ``flatten_xml_dict`` ``:72-92``) strips ``@``, renames ``#text``
→ ``text``, joins repeated string children with ``', '`` and keeps the first
element of mixed lists. XPath via ``ElementTree.findall`` (``//tag`` and
relative paths, reference ``extract_xpath`` ``:95-121``).

Execution: file list → ``map_batches`` parse tasks, like the JSON connector.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Any

import pyarrow as pa
import ray.data as rd

from . import register_source


def element_to_dict(element: ET.Element, include_attribs: bool = True):
    # Provenance: structurally mirrors the reference's element_to_dict
    # helper (reference sources/xml_source.py) on purpose — it pins the
    # exact XML→dict semantics users depend on (`@attr` keys, `#text`
    # collapse, repeated children promoted to lists), the canonical
    # recursive form of that converter.
    result: dict[str, Any] = {}
    if include_attribs and element.attrib:
        for key, value in element.attrib.items():
            result[f"@{key}"] = value
    if element.text and element.text.strip():
        result["#text"] = element.text.strip()
    for child in element:
        child_dict = element_to_dict(child, include_attribs)
        name = child.tag.split("}", 1)[1] if "}" in child.tag else child.tag
        if name in result:
            if not isinstance(result[name], list):
                result[name] = [result[name]]
            result[name].append(child_dict if child_dict else child.text)
        else:
            result[name] = child_dict if child_dict else child.text
    if len(result) == 1 and "#text" in result:
        return result["#text"]
    return result


def flatten_xml_dict(d: dict[str, Any], prefix: str = "") -> dict[str, Any]:
    flat: dict[str, Any] = {}
    for key, value in d.items():
        clean = key.lstrip("@").replace("#text", "text")
        new_key = f"{prefix}_{clean}" if prefix else clean
        if isinstance(value, dict):
            flat.update(flatten_xml_dict(value, new_key))
        elif isinstance(value, list):
            if all(isinstance(v, str) for v in value):
                flat[new_key] = ", ".join(str(v) for v in value)
            elif value:
                flat[new_key] = str(value[0])
        else:
            flat[new_key] = value
    return flat


def extract_xpath(root: ET.Element, xpath: str) -> list[ET.Element]:
    if xpath.startswith("//"):
        return root.findall(f".{xpath}")
    if xpath.startswith("/"):
        # absolute path: root tag then descend
        parts = [p for p in xpath.split("/") if p]
        if parts and parts[0] == root.tag:
            rel = "/".join(parts[1:])
            return root.findall(rel) if rel else [root]
        return root.findall("/".join(parts))
    return root.findall(xpath)


def records_from_xml_text(text: str, xpath: str) -> list[dict[str, Any]]:
    root = ET.fromstring(text)
    out = []
    for el in extract_xpath(root, xpath):
        d = element_to_dict(el)
        if isinstance(d, dict):
            out.append(flatten_xml_dict(d))
        else:
            out.append({"text": d})
    return out


def read_xml_records(paths: str | list[str], *, xpath: str) -> "rd.Dataset":
    if isinstance(paths, str):
        paths = [paths]

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict[str, Any]] = []
        for p in batch.column("path").to_pylist():
            with open(p, encoding="utf-8") as f:
                rows.extend(records_from_xml_text(f.read(), xpath))
        return pa.Table.from_pylist(rows)

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        parse, batch_format="pyarrow"
    )


@register_source("xml")
def _xml(config: dict) -> "rd.Dataset":
    return read_xml_records(
        config["path"], xpath=config.get("iterator", config.get("xpath", "//*"))
    )
