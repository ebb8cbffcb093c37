"""Count-Min sketch: fixed-memory frequency estimation, mergeable.

Completes the mergeable-summaries family (HyperLogLog distinct counts
``functions/sketch.py``, Misra–Gries heavy hitters
``functions/heavy_hitters.py``, Bloom membership ``functions/bloom.py``,
equi-depth quantiles ``functions/qsketch.py``): the CM sketch answers POINT
frequency queries ("how many times did token/conv/tool X occur?") over
streams whose key cardinality dwarfs memory, with the one-sided guarantee

    true_count ≤ estimate ≤ true_count + ε·N   with prob ≥ 1 − δ

for a ``d = ⌈ln(1/δ)⌉`` × ``w = ⌈e/ε⌉`` counter matrix (Cormode &
Muthukrishnan 2005). Unlike Misra–Gries (which keeps only the ~m heaviest
items), CM answers queries for ANY key after the fact — the trade is
overestimation instead of omission.

Distributed contract: per-block partial sketches built with the SAME (w, d,
hash family) merge by ELEMENTWISE ADDITION into exactly the single-pass
sketch — bit-identical, not approximately (the standard-update sketch is a
linear transform of the input; the conservative-update variant estimates
tighter but does NOT merge, so it is deliberately not offered). Hashing
reuses the repo's stable 64-bit family (``hash64_column`` + odd-stride
double hashing, the :mod:`functions.bloom` scheme) so sketches are
process- and version-stable.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .hashing import hash64_column, splitmix64

_U64 = np.uint64

__all__ = [
    "CMSketch",
    "cms_params",
    "cms_build",
    "cms_merge",
    "cms_query",
    "cms_build_distributed",
]


@dataclass
class CMSketch:
    width: int
    depth: int
    counts: np.ndarray  # (depth, width) int64
    n: int  # total weight inserted (the N of the ε·N bound)


def cms_params(eps: float, delta: float) -> tuple[int, int]:
    """Optimal (width, depth) for additive error ≤ ``eps·N`` with
    probability ≥ ``1 − delta``: ``w = ⌈e/ε⌉``, ``d = ⌈ln(1/δ)⌉``."""
    if not (0 < eps < 1) or not (0 < delta < 1):
        raise ValueError("eps and delta must be in (0, 1)")
    return max(2, math.ceil(math.e / eps)), max(1, math.ceil(math.log(1 / delta)))


def _rows(values: pa.Array | pa.ChunkedArray, width: int, depth: int):
    """(depth, n) probe-column matrix via double hashing (odd stride)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    h1 = hash64_column(values.cast(pa.string()))
    h2 = splitmix64(h1) | _U64(1)
    i = np.arange(depth, dtype=_U64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + i * h2[None, :]) % _U64(width)).astype(np.int64)


def cms_build(
    values: pa.Array | pa.ChunkedArray,
    width: int,
    depth: int,
    *,
    weights: np.ndarray | None = None,
) -> CMSketch:
    """Sketch of a value column (optionally integer-weighted). Vectorized:
    one probe matrix + ``depth`` scatter-adds — no Python per row."""
    counts = np.zeros((depth, width), dtype=np.int64)
    n = 0
    if len(values):
        if weights is None:
            w = np.ones(len(values), np.int64)
        else:
            raw = np.asarray(weights)
            # reject non-integral weights instead of silently flooring them:
            # a floored weight undercounts, violating the sketch's one-sided
            # never-below-the-true-count guarantee (mirrors the negative check)
            if not np.issubdtype(raw.dtype, np.integer):
                if not np.all(np.isfinite(raw)) or not np.all(
                    raw == np.trunc(raw)
                ):
                    raise ValueError(
                        "weights must be integral (floats would be floored, "
                        "undercounting and breaking the one-sided guarantee)"
                    )
            w = raw.astype(np.int64)
        if (w < 0).any():
            raise ValueError("weights must be non-negative")
        idx = _rows(values, width, depth)
        for r in range(depth):
            np.add.at(counts[r], idx[r], w)
        n = int(w.sum())
    return CMSketch(width=width, depth=depth, counts=counts, n=n)


def cms_merge(*sketches: CMSketch) -> CMSketch:
    """Elementwise sum — associative/commutative; equals the single-pass
    sketch of the concatenated streams EXACTLY (linearity)."""
    first = sketches[0]
    for s in sketches[1:]:
        if (s.width, s.depth) != (first.width, first.depth):
            raise ValueError("sketches must share (width, depth)")
    return CMSketch(
        width=first.width,
        depth=first.depth,
        counts=np.sum([s.counts for s in sketches], axis=0),
        n=int(sum(s.n for s in sketches)),
    )


def cms_query(
    sketch: CMSketch, values: pa.Array | pa.ChunkedArray
) -> np.ndarray:
    """Estimated counts (int64, one per queried value): the row-minimum —
    never below the true count; above it by ≤ ε·N w.p. ≥ 1 − δ."""
    if len(values) == 0:
        return np.zeros(0, np.int64)
    idx = _rows(values, sketch.width, sketch.depth)
    est = sketch.counts[0][idx[0]]
    for r in range(1, sketch.depth):
        est = np.minimum(est, sketch.counts[r][idx[r]])
    return est.astype(np.int64)


def cms_build_distributed(
    ds, column: str, width: int, depth: int
) -> CMSketch:
    """Per-block partial sketches over a Dataset column, merged driver-side
    — the mergeable-summaries shape (each task returns a (depth, width)
    int64 matrix; the reduction is one elementwise sum). Column values are
    hashed as strings (cast), matching :func:`cms_build`."""
    import ray

    @ray.remote(num_cpus=1)
    def partial(tbl: pa.Table):
        sk = cms_build(tbl.column(column), width, depth)
        return sk.counts, sk.n

    parts = ray.get(
        [partial.remote(r) for r in ds.select_columns([column]).to_arrow_refs()]
    )
    if not parts:
        return CMSketch(width, depth, np.zeros((depth, width), np.int64), 0)
    counts = np.sum([c for c, _ in parts], axis=0)
    return CMSketch(
        width=width,
        depth=depth,
        counts=counts,
        n=int(sum(n for _, n in parts)),
    )
