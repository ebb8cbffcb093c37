"""Vectorized scalar-function library.

The reference implements its scalar functions ad hoc in row-level Python
(SURVEY.md §2.9: regex sanitize ``rdf_star_etl_yarrrml.py:45-58``, prefix
expansion ``:61-74``, template substitution ``:86-103``); YARRRML function
calls like ``ex:toLowerCase`` are parsed but never executed
(``yarrrml_parser.py:577-606``). Here every scalar function is a vectorized
Arrow kernel usable inside ``map_batches(batch_format="pyarrow")``, and the
mapping compiler resolves function names through :data:`FUNCTION_REGISTRY` at
compile time, so user functions are a first-class extension surface.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc


def _as_string(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    return pc.cast(arr, pa.string())


# name -> kernel(array, *args) -> array. Names mirror the YARRRML/GREL-style
# function names the reference parses (``yarrrml_parser.py:577-606``).
FUNCTION_REGISTRY: dict[str, Callable] = {
    "toLowerCase": lambda a: pc.utf8_lower(_as_string(a)),
    "toUpperCase": lambda a: pc.utf8_upper(_as_string(a)),
    "trim": lambda a: pc.utf8_trim_whitespace(_as_string(a)),
    "length": lambda a: pc.utf8_length(_as_string(a)),
    "replace": lambda a, old, new: pc.replace_substring(_as_string(a), old, new),
    "regexReplace": lambda a, pat, rep: pc.replace_substring_regex(
        _as_string(a), pat, rep
    ),
    "substring": lambda a, start, stop=None: pc.utf8_slice_codeunits(
        _as_string(a), int(start), None if stop is None else int(stop)
    ),
    "concat": lambda *arrays: pc.binary_join_element_wise(
        *[_as_string(x) for x in arrays], ""
    ),
}


def register_function(name: str, fn: Callable) -> Callable:
    """Register a named vectorized kernel for use in mapping specs."""
    FUNCTION_REGISTRY[name] = fn
    return fn


def get_function(name: str) -> Callable:
    # accept both bare and prefixed (``ex:toLowerCase``) spellings
    key = name.rsplit(":", 1)[-1].rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    if key in FUNCTION_REGISTRY:
        return FUNCTION_REGISTRY[key]
    raise KeyError(f"unknown mapping function: {name!r}")
