"""Mergeable quantile sketch — equi-depth summaries with a provable rank
error bound, for UNBOUNDED/continuous domains.

The exact grouped quantiles (``analytics.grouped_quantiles``) work by
summing integer-cent histograms — exact, but only for bounded discrete
domains. This sketch handles any numeric column at any scale: each batch
collapses to ``B`` equally-spaced order statistics of its sorted values
(an equi-depth histogram: value ``v_i`` carries weight ``n_batch/B``), the
≤ B-row partials merge by concatenation, and a quantile is read off the
merged weighted CDF.

Rank-error bound (tested, not just claimed): within one batch summary the
true rank of any value is within ``n_batch/B`` of its summarized rank;
errors add across batches, so the merged estimate's rank error is at most
``Σ n_b / B = N/B`` — with B=512, every reported quantile is within 0.2 %
rank of exact, independent of value distribution (zipf/normal/uniform all
tested). Same partial/combine shape as the HLL and Misra–Gries sketches:
no shuffle, #blocks tiny partials to the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def batch_summary(values: np.ndarray, B: int) -> tuple[np.ndarray, np.ndarray]:
    """Equi-depth summary of one batch: ``min(B, n)`` (value, weight) pairs.
    Values are the order statistics at ranks ``(i + 0.5) · n/B`` (bar
    midpoints), each carrying weight ``n/B``."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    n = len(v)
    if n == 0:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    if n <= B:
        return np.sort(v), np.ones(n, np.float64)
    v = np.sort(v)
    ranks = ((np.arange(B) + 0.5) * n / B).astype(np.int64).clip(0, n - 1)
    return v[ranks], np.full(B, n / B, np.float64)


def merge_summaries(
    parts: list[tuple[np.ndarray, np.ndarray]]
) -> tuple[np.ndarray, np.ndarray]:
    """Concat + sort by value — the merged weighted CDF (associative,
    commutative; the per-part rank errors add, nothing else changes)."""
    if not parts:
        return np.empty(0, np.float64), np.empty(0, np.float64)
    vals = np.concatenate([p[0] for p in parts])
    wts = np.concatenate([p[1] for p in parts])
    order = np.argsort(vals, kind="mergesort")
    return vals[order], wts[order]


def summary_quantile(
    vals: np.ndarray, wts: np.ndarray, qs: list[float]
) -> np.ndarray:
    """Quantile estimates off the weighted CDF: the first value whose
    cumulative weight reaches ``q · total`` (the quantile_disc convention)."""
    if len(vals) == 0:
        return np.full(len(qs), np.nan)
    cw = np.cumsum(wts)
    total = cw[-1]
    idx = np.searchsorted(cw, np.asarray(qs) * total, side="left").clip(
        0, len(vals) - 1
    )
    return vals[idx]


def quantile_sketch(
    ds: "rd.Dataset",  # noqa: F821
    col: str,
    *,
    B: int = 512,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> pa.Table:
    """Distributed quantile estimation with rank error ≤ N/B: per-batch
    equi-depth summaries (one ``np.sort`` per batch, pure numpy), ≤ B-row
    partials to the driver, quantiles off the merged CDF. Returns
    ``(q, value)``."""

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(col), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        vals, wts = batch_summary(v, B)
        return pa.table(
            {
                "v": pa.array(vals, pa.float64()),
                "w": pa.array(wts, pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    vals, wts = merge_summaries(
        [(parts["v"].to_numpy(), parts["w"].to_numpy())]
    )
    est = summary_quantile(vals, wts, list(quantiles))
    return pa.table(
        {
            "q": pa.array(list(quantiles), pa.float64()),
            "value": pa.array(est, pa.float64()),
        }
    )


def grouped_quantile_sketch(
    ds: "rd.Dataset",  # noqa: F821
    group_col: str,
    col: str,
    *,
    B: int = 256,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
) -> pa.Table:
    """Per-group quantile estimation with rank error ≤ N_g/B per group:
    each batch emits one equi-depth summary per group it contains
    (``(group, v, w)`` rows, ≤ B per group per batch), the driver merges
    per group. Groups stay unshuffled — the partials are the only rows
    that move, ≤ B × groups × blocks. Returns ``(group, q, value)``."""
    def partial(batch: pa.Table) -> pa.Table:
        # split the null group in ARROW: pandas would float a null-bearing
        # int64 group column (corrupting identities >= 2^53) and a NaN key
        # can't convert back to the Arrow group type
        gcol = batch.column(group_col)
        nulls = pc.is_null(gcol)
        nn = batch.filter(pc.invert(nulls))
        nul = batch.filter(nulls)
        df = nn.select([group_col, col]).to_pandas()
        gs, vs, ws = [], [], []
        for g, sub in df.groupby(group_col, sort=False):
            v, w = batch_summary(
                sub[col].to_numpy(dtype=np.float64, na_value=np.nan), B
            )
            gs.extend([g] * len(v))
            vs.append(v)
            ws.append(w)
        if nul.num_rows:
            v, w = batch_summary(
                pc.cast(nul.column(col), pa.float64()).to_numpy(
                    zero_copy_only=False
                ),
                B,
            )
            gs.extend([None] * len(v))
            vs.append(v)
            ws.append(w)
        return pa.table(
            {
                group_col: pa.array(gs, gcol.type),
                "v": pa.array(
                    np.concatenate(vs) if vs else np.empty(0), pa.float64()
                ),
                "w": pa.array(
                    np.concatenate(ws) if ws else np.empty(0), pa.float64()
                ),
            }
        )

    parts_ds = ds.map_batches(partial, batch_format="pyarrow").materialize()
    import ray

    parts_tbl = pa.concat_tables(
        [ray.get(r) for r in parts_ds.to_arrow_refs()]
    )
    g_type = parts_tbl.schema.field(group_col).type
    null_mask = pc.is_null(parts_tbl.column(group_col))
    nn_tbl = parts_tbl.filter(pc.invert(null_mask))
    nul_tbl = parts_tbl.filter(null_mask)
    parts = nn_tbl.to_pandas()
    out_g, out_q, out_v = [], [], []
    for g, sub in parts.groupby(group_col, sort=True):
        vals, wts = merge_summaries(
            [(sub["v"].to_numpy(), sub["w"].to_numpy())]
        )
        est = summary_quantile(vals, wts, list(quantiles))
        out_g.extend([g] * len(quantiles))
        out_q.extend(quantiles)
        out_v.extend(est)
    if nul_tbl.num_rows:
        vals, wts = merge_summaries(
            [
                (
                    nul_tbl.column("v").to_numpy(zero_copy_only=False),
                    nul_tbl.column("w").to_numpy(zero_copy_only=False),
                )
            ]
        )
        est = summary_quantile(vals, wts, list(quantiles))
        out_g.extend([None] * len(quantiles))
        out_q.extend(quantiles)
        out_v.extend(est)
    return pa.table(
        {
            group_col: pa.array(out_g, g_type),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        }
    )
