"""Bloom-filter membership sketch — fixed-size broadcast set membership.

Why at 100 TB: the exact decontamination path (``dedup.decontaminate``)
broadcasts the eval set's full gram SET — fine for thousands of eval items,
linear in their text. When the exclusion side grows (all prior training
shards, a blocklist of billions of URLs), the broadcast must be a sketch:
a Bloom filter stores n items in ``n·log2(1/fp)/ln2`` BITS (~1.8 MB for a
million items at 1e-4) with ZERO false negatives — an excluded item is
always caught; the price is a bounded false-positive rate (a clean item
wrongly flagged with probability ≈ fp).

Mergeable: two filters with identical (m, k, seed) OR together — so each
input shard builds its partial filter in a ``map_batches`` pass and the
driver (or a tree) ORs #blocks small arrays, same shape as the HLL sketch
(``functions/sketch.py``).

Hashing: double hashing (Kirsch–Mitzenmacher) — probe ``i`` uses
``h1 + i·h2 mod m``, giving k independent-enough probes from two 64-bit
hashes; h1/h2 derive from one vectorized column hash + splitmix64 remix.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .hashing import hash64_column, splitmix64

_U64 = np.uint64


def bloom_params(n_items: int, fp_rate: float) -> tuple[int, int]:
    """Optimal (m bits, k probes) for ``n_items`` at ``fp_rate``."""
    n = max(1, n_items)
    m = max(8, int(math.ceil(-n * math.log(fp_rate) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _probe_hashes(values: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    h1 = hash64_column(values.cast(pa.string()))
    h2 = splitmix64(h1) | _U64(1)  # odd → full-period stride for any m
    return h1, h2


def bloom_build(
    values: pa.Array | pa.ChunkedArray, m: int, k: int
) -> np.ndarray:
    """Bit array (uint8, ceil(m/8) bytes) with every value's k probes set.
    Vectorized: one (n, k) probe-index matrix, one ``np.bitwise_or.at``."""
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    if len(values) == 0:
        return bits
    h1, h2 = _probe_hashes(values)
    i = np.arange(k, dtype=_U64)
    with np.errstate(over="ignore"):
        idx = (h1[:, None] + i[None, :] * h2[:, None]) % _U64(m)
    idx = idx.reshape(-1)
    np.bitwise_or.at(bits, (idx >> _U64(3)).astype(np.int64),
                     np.uint8(1) << (idx & _U64(7)).astype(np.uint8))
    return bits


def bloom_merge(*bit_arrays: np.ndarray) -> np.ndarray:
    """Associative + commutative: elementwise OR (same m, k, hash family)."""
    return np.bitwise_or.reduce(list(bit_arrays))


def bloom_contains(
    bits: np.ndarray, values: pa.Array | pa.ChunkedArray, m: int, k: int
) -> np.ndarray:
    """Boolean mask: True where ALL k probe bits are set (possible member —
    no false negatives; false positives at the configured rate)."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    h1, h2 = _probe_hashes(values)
    i = np.arange(k, dtype=_U64)
    with np.errstate(over="ignore"):
        idx = (h1[:, None] + i[None, :] * h2[:, None]) % _U64(m)
    probed = (
        bits[(idx >> _U64(3)).astype(np.int64)]
        >> (idx & _U64(7)).astype(np.uint8)
    ) & np.uint8(1)
    return probed.all(axis=1)
