"""Source registry: named constructors returning ``ray.data.Dataset``.

Re-expresses the reference's source-plugin surface (reference:
``sources/__init__.py:239-277`` — ``@register_source("csv")`` decorator
registry + ``create_source(config)`` factory) on top of the native
``ray.data.read_*`` readers. A source kind is a callable
``(config: dict) -> ray.data.Dataset``; connectors that need drivers not
present in this environment (postgresql/mysql/http/sparql — reference
``sources/database/*.py``, ``sources/remote/*.py``) are registered as explicit
stubs that raise with a clear message, keeping the registry surface complete.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

import ray.data as rd

SourceFactory = Callable[[dict], "rd.Dataset"]

_REGISTRY: dict[str, SourceFactory] = {}

_ENV_PATTERN = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def interpolate_env_vars(value: str) -> str:
    """``${VAR}`` substitution (reference: ``sources/__init__.py:30-47``)."""
    return _ENV_PATTERN.sub(lambda m: os.environ.get(m.group(1), m.group(0)), value)


def interpolate_dict_env_vars(obj):
    """Recursive env interpolation over dicts/lists/strings (reference:
    ``sources/__init__.py:50-65``)."""
    if isinstance(obj, str):
        return interpolate_env_vars(obj)
    if isinstance(obj, dict):
        return {k: interpolate_dict_env_vars(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [interpolate_dict_env_vars(v) for v in obj]
    return obj


def register_source(kind: str) -> Callable[[SourceFactory], SourceFactory]:
    def deco(fn: SourceFactory) -> SourceFactory:
        _REGISTRY[kind] = fn
        return fn

    return deco


def source_kinds() -> list[str]:
    return sorted(_REGISTRY)


def create_source(config: dict) -> "rd.Dataset":
    """Dispatch on ``config['type']`` (reference: ``create_source``,
    ``sources/__init__.py:258-277``)."""
    config = interpolate_dict_env_vars(dict(config))
    kind = config.pop("type")
    try:
        factory = _REGISTRY[kind]
    except KeyError:
        raise KeyError(
            f"unknown source type {kind!r}; registered: {source_kinds()}"
        ) from None
    return factory(config)


# --- built-in readers -------------------------------------------------------


def read_parquet_clean(path: str, **kwargs) -> "rd.Dataset":
    """``rd.read_parquet`` with the file's key-value schema metadata
    stripped. Parquet written by pandas carries a ``b'pandas'`` metadata blob
    that makes ``pa.Schema`` unhashable, so every in-task block concat logs
    Ray's "Failed to hash the schemas (for deduplication)" warning
    (BENCH_r02 tail / round-2 verdict item 9). Passing an explicit
    metadata-free ``schema=`` fixes it at the read — column pruning via
    ``columns=`` still applies (Ray prunes the schema to the selection)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if "schema" not in kwargs:
        first = path
        if os.path.isdir(path):
            names = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )
            if names:
                first = os.path.join(path, names[0])
        schema = pq.read_schema(first).remove_metadata()
        cols = kwargs.get("columns")
        if cols is not None:
            flt = kwargs.get("filter")
            if flt is not None:
                # the scanner needs every filter-referenced column in its
                # schema; with an explicit pruned schema a filter on a
                # non-selected column raises ArrowInvalid. Detect via the
                # expression's string form and fall back to schema
                # inference for that read (block-concat warning possible,
                # correctness unaffected).
                import re as _re

                expr = str(flt)
                referenced = {
                    f
                    for f in schema.names
                    if _re.search(rf"\b{_re.escape(f)}\b", expr)
                }
                if not referenced <= set(cols):
                    return rd.read_parquet(path, **kwargs)
            # the explicit schema must match the pruned batches the
            # fragment reader emits
            schema = pa.schema([schema.field(c) for c in cols])
        kwargs["schema"] = schema
    return rd.read_parquet(path, **kwargs)


@register_source("parquet")
def _parquet(config: dict) -> "rd.Dataset":
    return read_parquet_clean(
        config["path"],
        columns=config.get("columns"),
        filter=config.get("filter"),
    )


@register_source("csv")
def _csv(config: dict) -> "rd.Dataset":
    from pyarrow import csv as pacsv

    delimiter = config.get("delimiter", ",")
    return rd.read_csv(
        config["path"],
        parse_options=pacsv.ParseOptions(delimiter=delimiter),
    )


@register_source("tsv")
def _tsv(config: dict) -> "rd.Dataset":
    return _csv({**config, "delimiter": "\t"})


@register_source("json")
def _json(config: dict) -> "rd.Dataset":
    return rd.read_json(config["path"])


@register_source("items")
def _items(config: dict) -> "rd.Dataset":
    return rd.from_items(config["items"])


def resolve_source_path(path: str, search_dirs: list[str] | None = None) -> str:
    """Resolve a relative source path across conventional data directories
    (reference: ``_resolve_source_path`` ``rdf_star_etl_yarrrml.py:202-229``,
    ``FileSource._resolve_path`` ``sources/__init__.py:175-195``)."""
    if os.path.isabs(path) and os.path.exists(path):
        return path
    for base in search_dirs or [".", "mappings", "data", "benchmark_data", "sample_data"]:
        cand = os.path.join(base, path)
        if os.path.exists(cand):
            return cand
    return path


@register_source("sqlite")
def _sqlite(config: dict) -> "rd.Dataset":
    """SQLite reader (reference: ``sources/database/sqlite.py:26-91``) via
    ``ray.data.read_sql`` with a read-only connection factory."""
    import sqlite3

    path, query = config["path"], config["query"]

    def connect():
        return sqlite3.connect(f"file:{path}?mode=ro", uri=True)

    return rd.read_sql(query, connect)


@register_source("rdf")
def _rdf(config: dict) -> "rd.Dataset":
    """RDF text import (N-Triples/N-Quads/Turtle/TriG subset) → triple
    records (``sources/rdf_text.py``; reference format-by-extension load,
    ``batch_manager.py:231-283``)."""
    from .rdf_text import read_rdf

    return read_rdf(config["path"], fmt=config.get("format"))


# auto-import self-registering connector modules (reference:
# ``sources/__init__.py:279-321`` auto-imports its connector modules)
from . import json_source as _json_source  # noqa: E402,F401
from . import remote as _remote  # noqa: E402,F401
from . import xml_source as _xml_source  # noqa: E402,F401
