"""Nested-JSON connector: JSONPath record selection + flattening.

Behavior mirrors the reference connector (``sources/json_source.py``):

- ``flatten_json`` (reference ``:28-54``): nested dicts become
  underscore-joined columns (``user.name`` → ``user_name``); lists of
  primitives stay lists; lists of objects get indexed keys
  (``addr_0_city``).
- JSONPath record iterator (reference ``extract_jsonpath`` ``:57-97`` with
  ``_simple_jsonpath`` fallback ``:99-173``): ``$``, ``.key``, ``[*]``,
  ``[n]``; ``jsonpath_ng`` is used when importable, else the built-in
  subset — same import-try structure as the reference.

Execution is Ray-native: a (possibly long) list of files fans out with
``flat_map``-style ``map_batches`` so each task parses its own files; one
driver-side helper covers the single-small-file case.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa
import ray.data as rd

from . import register_source


def flatten_json(nested: dict[str, Any], prefix: str = "") -> dict[str, Any]:
    # Provenance: structurally mirrors the reference's flatten_json helper
    # (reference sources/json_source.py) on purpose — it pins the exact
    # flatten semantics users depend on (underscore-joined keys, scalar
    # lists kept whole, indexed keys for object lists), and this recursive
    # shape is the canonical way to write that flattener.
    flat: dict[str, Any] = {}
    for key, value in nested.items():
        new_key = f"{prefix}_{key}" if prefix else key
        if isinstance(value, dict):
            flat.update(flatten_json(value, new_key))
        elif isinstance(value, list):
            if all(not isinstance(v, (dict, list)) for v in value):
                flat[new_key] = value
            else:
                for i, item in enumerate(value):
                    if isinstance(item, dict):
                        flat.update(flatten_json(item, f"{new_key}_{i}"))
                    else:
                        flat[f"{new_key}_{i}"] = item
        else:
            flat[new_key] = value
    return flat


def _wrap(value: Any) -> list[dict[str, Any]]:
    if isinstance(value, dict):
        return [value]
    if isinstance(value, list):
        return [v if isinstance(v, dict) else {"value": v} for v in value]
    return [{"value": value}]


def simple_jsonpath(data: Any, path: str) -> list[dict[str, Any]]:
    """``$`` / ``.key`` / ``[*]`` / ``[n]`` subset (reference fallback)."""
    if not path or path == "$":
        return _wrap(data)
    if path.startswith("$"):
        path = path[1:]
    current: list[Any] = [data]
    token = ""
    tokens: list[str] = []
    i = 0
    while i < len(path):
        c = path[i]
        if c == ".":
            if token:
                tokens.append(token)
                token = ""
        elif c == "[":
            if token:
                tokens.append(token)
                token = ""
            j = path.index("]", i)
            tokens.append(path[i : j + 1])
            i = j
        else:
            token += c
        i += 1
    if token:
        tokens.append(token)

    for tok in tokens:
        nxt: list[Any] = []
        for node in current:
            if tok == "[*]":
                if isinstance(node, list):
                    nxt.extend(node)
            elif tok.startswith("[") and tok.endswith("]"):
                idx = int(tok[1:-1])
                if isinstance(node, list) and -len(node) <= idx < len(node):
                    nxt.append(node[idx])
            else:
                if isinstance(node, dict) and tok in node:
                    nxt.append(node[tok])
        current = nxt
    out: list[dict[str, Any]] = []
    for node in current:
        out.extend(_wrap(node))
    return out


def extract_jsonpath(data: Any, path: str) -> list[dict[str, Any]]:
    try:
        from jsonpath_ng import parse as jsonpath_parse  # optional, like the reference

        matches = jsonpath_parse(path).find(data)
        out: list[dict[str, Any]] = []
        for m in matches:
            out.extend(_wrap(m.value))
        return out
    except ImportError:
        return simple_jsonpath(data, path)


def records_from_json_text(text: str, record_path: str = "$") -> list[dict[str, Any]]:
    data = json.loads(text)
    return [flatten_json(r) for r in extract_jsonpath(data, record_path)]


def read_json_records(
    paths: str | list[str], *, record_path: str = "$"
) -> "rd.Dataset":
    """Distributed nested-JSON read: one task per file batch, each emitting
    its flattened record rows."""
    if isinstance(paths, str):
        paths = [paths]

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict[str, Any]] = []
        for p in batch.column("path").to_pylist():
            with open(p, encoding="utf-8") as f:
                rows.extend(records_from_json_text(f.read(), record_path))
        return pa.Table.from_pylist(rows)

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        parse, batch_format="pyarrow"
    )


@register_source("json_nested")
def _json_nested(config: dict) -> "rd.Dataset":
    return read_json_records(
        config["path"], record_path=config.get("iterator", config.get("jsonpath", "$"))
    )


def read_jsonl_records(
    paths: str | list[str], *, record_path: str = "$", flatten: bool = True
) -> "rd.Dataset":
    """Distributed JSONL read (round 5 — the reader counterpart of
    ``export.export_jsonl``, closing the training-corpus roundtrip): one
    task per file batch, one JSON object per line, blank lines skipped;
    each record optionally flattened with the same reference semantics as
    the nested-JSON connector. A shard directory (``dir/shard-*.jsonl``)
    or glob expands driver-side."""
    import glob as _glob
    import os

    if isinstance(paths, str):
        paths = [paths]
    expanded: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            expanded.extend(sorted(_glob.glob(os.path.join(p, "*.jsonl"))))
        elif any(ch in p for ch in "*?["):
            expanded.extend(sorted(_glob.glob(p)))
        else:
            expanded.append(p)

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict[str, Any]] = []
        for p in batch.column("path").to_pylist():
            with open(p, encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    for r in extract_jsonpath(json.loads(line), record_path):
                        rows.append(flatten_json(r) if flatten else r)
        return pa.Table.from_pylist(rows)

    return rd.from_items([{"path": p} for p in expanded]).map_batches(
        parse, batch_format="pyarrow"
    )


@register_source("jsonl")
def _jsonl(config: dict) -> "rd.Dataset":
    return read_jsonl_records(
        config["path"],
        record_path=config.get("iterator", config.get("jsonpath", "$")),
        flatten=bool(config.get("flatten", True)),
    )
