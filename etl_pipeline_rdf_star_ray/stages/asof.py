"""As-of join: attach to each left row the latest right row with the same
key and ``right.on <= left.on`` (events × slowly-changing dimension history).

The reference engine has no as-of operator (its joins are the annotation
equality join, ``rdf_star_etl_yarrrml.py:451-530``); this is one of the
brief's named custom operators for large-scale pipelines, built two ways:

- :func:`asof_join_broadcast` — the common case: the right side is a
  dimension HISTORY (small by nature). Driver sorts it once by
  ``(by, on, tiebreak)``, de-duplicates to the last row per ``(by, on)``,
  ``ray.put``s the arrays ONCE; each ``map_batches`` task binary-searches
  per unique batch key (numpy ``searchsorted`` — no Python row loop, no
  shuffle, left side streams).
- :func:`asof_join_sharded` — both sides large: tag + union the two
  datasets into a common schema, hash-shard on the key, and run pandas
  ``merge_asof`` (C merge over sorted frames) once per shard — one task
  per shard regardless of key count, the same sharded-group shape as
  ``pipelines/dedup.sharded_groups``. Partitioning assumption: a single
  key's history + events fit one shard (keys are hash-spread; a skewed
  key needs salting upstream like the CDC path).

Tie semantics (both paths + the DuckDB oracle): the right side is first
reduced to ONE row per ``(by, on)`` — the row with the greatest
``tiebreak`` — so results are deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_column


def _dedupe_right(right: pa.Table, on: str, by: str, tiebreak: str) -> pa.Table:
    """Last row per (by, on) under tiebreak ordering — deterministic ties."""
    r = right.sort_by(
        [(by, "ascending"), (on, "ascending"), (tiebreak, "ascending")]
    )
    keys = r.column(by).to_numpy(zero_copy_only=False)
    ons = r.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
    last = np.ones(r.num_rows, dtype=bool)
    if r.num_rows > 1:
        last[:-1] = (keys[:-1] != keys[1:]) | (ons[:-1] != ons[1:])
    return r.filter(pa.array(last))


def asof_join_broadcast(
    left,  # rd.Dataset
    right: pa.Table,
    *,
    on: str,
    by: str,
    right_on: str | None = None,
    right_by: str | None = None,
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
):
    """Broadcast as-of join (right = small dimension history). Returns the
    left dataset with ``value_cols`` attached (null where no right row has
    ``right_on <= on`` for the key)."""
    import ray

    right_on = right_on or on
    right_by = right_by or by
    value_cols = value_cols or [
        c for c in right.column_names if c not in (right_on, right_by)
    ]
    tiebreak = tiebreak or value_cols[0]
    r = _dedupe_right(right, right_on, right_by, tiebreak)
    ref = ray.put(
        (
            r.column(right_by).to_numpy(zero_copy_only=False),
            r.column(right_on).cast(pa.int64()).to_numpy(zero_copy_only=False),
            r.select(value_cols),
        )
    )

    def stage(batch: pa.Table) -> pa.Table:
        keys, ons, vals = ray.get(ref)
        bk = batch.column(by).to_numpy(zero_copy_only=False)
        bt = batch.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        match = np.full(len(bk), -1, dtype=np.int64)
        for k in np.unique(bk):
            lo = np.searchsorted(keys, k, side="left")
            hi = np.searchsorted(keys, k, side="right")
            if lo == hi:
                continue
            sel = bk == k
            pos = lo + np.searchsorted(ons[lo:hi], bt[sel], side="right") - 1
            pos[pos < lo] = -1
            match[sel] = pos
        found = match >= 0
        take_idx = pa.array(np.where(found, match, 0), pa.int64())
        miss = pa.array(~found)
        out = batch
        for c in value_cols:
            col = vals.column(c).take(take_idx)
            col = pc.if_else(miss, pa.nulls(len(bk), col.type), col)
            out = out.append_column(c, col)
        return out

    return left.map_batches(stage, batch_format="pyarrow")


def asof_join_sharded(
    left,  # rd.Dataset
    right,  # rd.Dataset
    *,
    on: str,
    by: str,
    right_on: str | None = None,
    right_by: str | None = None,
    value_cols: list[str],
    tiebreak: str | None = None,
    num_shards: int = 64,
):
    """Sharded as-of join for a large right side: union the two sides into
    one tagged common-schema stream, hash-shard on the key, pandas
    ``merge_asof`` per shard (C-speed sorted merge; one task per shard)."""
    right_on = right_on or on
    right_by = right_by or by
    tiebreak = tiebreak or value_cols[0]

    l_schema = left.schema()
    r_schema = right.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    left_names = list(l_schema.names)
    # unified column order: left cols, then value cols, then tags
    vtypes = {c: r_types[c] for c in value_cols}

    def _shard_col(key_arr) -> pa.Array:
        h = hash64_column(key_arr.cast(pa.string()))
        return pa.array((h % num_shards).astype(np.int64), pa.int64())

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in left_names}
        for c in value_cols:
            cols[c] = pa.nulls(batch.num_rows, vtypes[c])
        cols["__shard"] = _shard_col(batch.column(by))
        cols["__side"] = pa.nulls(batch.num_rows, pa.int8()).fill_null(0)
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        renames = {right_by: by, right_on: on}
        src = {renames.get(c, c): batch.column(c) for c in batch.column_names}
        cols = {}
        for c in left_names:
            cols[c] = (
                src[c] if c in src else pa.nulls(batch.num_rows, l_types[c])
            )
        for c in value_cols:
            cols[c] = src[c]
        cols["__shard"] = _shard_col(src[by])
        cols["__side"] = pa.nulls(batch.num_rows, pa.int8()).fill_null(1)
        return pa.table(cols)

    unioned = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def join_shard(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["__side"] == 0].drop(columns=["__side", "__shard", *value_cols])
        rf = (
            g[g["__side"] == 1]
            .sort_values([by, on, tiebreak])
            .drop_duplicates([by, on], keep="last")[[by, on, *value_cols]]
        )
        lf = lf.sort_values(on, kind="mergesort")
        rf = rf.sort_values(on, kind="mergesort")
        return pd.merge_asof(
            lf, rf, on=on, by=by, direction="backward", allow_exact_matches=True
        )

    return unioned.groupby("__shard").map_groups(join_shard, batch_format="pandas")


# ---------------------------------------------------------------------------
# Range (interval) join — same broadcast binary-search family
# ---------------------------------------------------------------------------


def range_join_broadcast(
    left,  # rd.Dataset
    intervals: pa.Table,
    *,
    on: str,
    by: str | None,
    lo: str,
    hi: str,
    attach: list[str],
    inner: bool = True,
):
    """Interval-membership join: attach ``attach`` columns of the interval
    containing ``left.on`` (``lo <= on <= hi``), per key when ``by`` is
    given.

    Partitioning assumption (documented per the brief): intervals are
    NON-OVERLAPPING within a key — one binary search over the sorted
    ``lo`` endpoints finds the only candidate, so each batch does numpy
    ``searchsorted`` per unique key, no shuffle, interval table broadcast
    once via ``ray.put``. Overlapping intervals need the sharded variant
    of :func:`asof_join_sharded` with an explode step instead."""
    import ray

    sort_keys = ([(by, "ascending")] if by else []) + [(lo, "ascending")]
    iv = intervals.sort_by(sort_keys)
    iv_keys = (
        iv.column(by).to_numpy(zero_copy_only=False) if by else None
    )
    iv_lo = iv.column(lo).cast(pa.int64()).to_numpy(zero_copy_only=False)
    iv_hi = iv.column(hi).cast(pa.int64()).to_numpy(zero_copy_only=False)
    ref = ray.put((iv_keys, iv_lo, iv_hi, iv.select(attach)))

    def stage(batch: pa.Table) -> pa.Table:
        keys, los, his, vals = ray.get(ref)
        bt = batch.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        match = np.full(len(bt), -1, dtype=np.int64)
        if keys is None:
            pos = np.searchsorted(los, bt, side="right") - 1
            ok = (pos >= 0) & (bt <= his[np.clip(pos, 0, None)])
            match = np.where(ok, pos, -1)
        else:
            bk = batch.column(by).to_numpy(zero_copy_only=False)
            for k in np.unique(bk):
                klo = np.searchsorted(keys, k, side="left")
                khi = np.searchsorted(keys, k, side="right")
                if klo == khi:
                    continue
                sel = bk == k
                pos = klo + np.searchsorted(los[klo:khi], bt[sel], side="right") - 1
                ok = (pos >= klo) & (bt[sel] <= his[np.clip(pos, 0, None)])
                match[sel] = np.where(ok, pos, -1)
        found = match >= 0
        out = batch
        take_idx = pa.array(np.where(found, match, 0), pa.int64())
        miss = pa.array(~found)
        for c in attach:
            col = vals.column(c).take(take_idx)
            col = pc.if_else(miss, pa.nulls(len(bt), col.type), col)
            out = out.append_column(c, col)
        if inner:
            out = out.filter(pa.array(found))
        return out

    return left.map_batches(stage, batch_format="pyarrow")
