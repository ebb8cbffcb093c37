"""Driver contract for the Ray-Data CDC engine.

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()`` — flagship pipeline on sf0.001: events-derived transcript CDC
  changelog → 3 micro-batch exactly-once lake replay → snapshot Dataset.
- ``queries()`` — one callable per implemented operator/pipeline from
  SURVEY.md §2 (CDC core, mapping lift + annotation join, analytics,
  dedup family, text analysis, similarity search, multimodal plumbing).
- ``oracle_sql()`` — the DuckDB mirror for every SQL-expressible query;
  minhash/simhash/LSH-probe/decode are rows-only by nature.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from etl_pipeline_rdf_star_ray.queries import (
    build_oracles,
    build_queries,
    entry_pipeline,
)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return entry_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracles()
