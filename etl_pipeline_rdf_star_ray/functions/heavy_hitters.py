"""Misra–Gries heavy-hitters sketch — fixed-memory frequent-items at any
cardinality.

Why at 100 TB: exact vocabulary counting (``corpus.top_terms``) moves
O(distinct tokens) partial rows — fine under Heaps' law for natural
language, unbounded for adversarial/high-cardinality keys (URLs, user ids,
n-grams). A Misra–Gries summary is a HARD m-entry bound per batch and per
merge, with the mergeable-summaries guarantee (Agarwal et al., PODS'12):
after summarizing a stream of total weight N with m counters, every
reported count ``c_est`` satisfies ``c_true - N/(m+1) <= c_est <= c_true``,
and every item with true frequency > N/(m+1) is PRESENT in the summary.

Shape: each batch collapses to exact ``value_counts`` (pure Arrow) then
compresses to m entries; the ≤ m-row partials stream to the driver which
sums counters by item and compresses once more — the same
partial/combine shape as the HLL sketch (``functions/sketch.py``), no
shuffle at any point. Output counts are LOWER BOUNDS (the MG estimate);
pair with one exact counting pass over just the reported items when exact
tallies are needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def mg_compress(
    items: np.ndarray, counts: np.ndarray, m: int
) -> tuple[np.ndarray, np.ndarray]:
    """Compress exact (item, count) pairs to ≤ m Misra–Gries counters:
    subtract the (m+1)-th largest count from every counter and keep the
    positive ones (at most m are strictly larger than the (m+1)-th).
    Vectorized: one ``np.partition`` + one mask, no Python loop."""
    if len(items) <= m:
        return items, counts
    kth = np.partition(counts, len(counts) - (m + 1))[len(counts) - (m + 1)]
    keep = counts > kth
    return items[keep], counts[keep] - kth


def mg_merge(
    partials: list[tuple[np.ndarray, np.ndarray]], m: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge MG summaries: sum counters item-wise, then one compression.
    Associative/commutative up to the shared error bound (each input's
    undercount carries through; the final subtract adds ≤ N/(m+1) total)."""
    if not partials:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    s = pd.Series(
        np.concatenate([c for _, c in partials]),
        index=np.concatenate([i for i, _ in partials]),
    )
    # dropna=False: defensive — partials from heavy_hitters never carry a
    # null item (dropped at the source), but a caller-built summary might
    g = s.groupby(level=0, sort=False, dropna=False).sum()
    return mg_compress(g.index.to_numpy(), g.to_numpy(), m)


def heavy_hitters(
    ds: "rd.Dataset",  # noqa: F821
    col: str,
    *,
    m: int = 1024,
    k: int | None = None,
) -> pa.Table:
    """Approximate top-k over a column with a hard m-counter memory bound.
    Returns ``(item, count_lo)`` sorted by count desc, item asc — every item
    with true frequency > N/(m+1) is guaranteed present, each ``count_lo``
    is within N/(m+1) below the true count. ``k`` trims the final output
    (default: all surviving counters)."""

    def partial(batch: pa.Table) -> pa.Table:
        # drop nulls BEFORE counting: value_counts emits a null row whose
        # count the pandas driver merge would silently drop (groupby's
        # default dropna), wasting a counter and violating the presence
        # guarantee; the sketch is defined over non-null items
        vc = pc.value_counts(batch.column(col).drop_null())
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        items = vc.field("values").to_numpy(zero_copy_only=False)
        counts = pc.cast(vc.field("counts"), pa.int64()).to_numpy()
        items, counts = mg_compress(items, counts, m)
        return pa.table(
            {
                "item": pa.array(items, batch.column(col).type),
                "n": pa.array(counts, pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    items, counts = mg_merge(
        [(parts["item"].to_numpy(), parts["n"].to_numpy())], m
    )
    out = pd.DataFrame({"item": items, "count_lo": counts}).sort_values(
        ["count_lo", "item"], ascending=[False, True], kind="mergesort"
    )
    if k is not None:
        out = out.head(k)
    return pa.Table.from_pandas(
        out.reset_index(drop=True), preserve_index=False
    ).replace_schema_metadata(None)


def heavy_terms(
    docs: "rd.Dataset",  # noqa: F821
    *,
    text_col: str = "text",
    m: int = 1024,
    k: int | None = 50,
) -> pa.Table:
    """Heavy-hitter word tokens: the fixed-memory scale path promised in
    ``corpus.top_terms``'s docstring — same lowercase-alphanumeric
    tokenization, MG counters instead of exact vocabulary partials."""

    def tok(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_col)), "[^a-z0-9]+"
        )
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"token": flat})

    return heavy_hitters(
        docs.map_batches(tok, batch_format="pyarrow"), "token", m=m, k=k
    )
