"""Generic analytic operators over the driver tables: grouped aggregates
with partial pre-aggregation, broadcast joins, top-k, windowed/sessionized
event analytics.

These demonstrate the engine's generic operator surface (SURVEY.md §2.6-2.7)
with the scale patterns applied: per-batch COMBINERS before the ``groupby``
shuffle (only partials move), broadcast of small dimension tables via
``ray.put``, column-pruned reads, and exact integer (cents) arithmetic for
money sums so results are order-independent and bit-identical with the SQL
oracle (float sums commute only approximately; int64 sums exactly)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum


def _cents(col) -> pa.Array:
    """double currency → exact int64 cents (values are 2-decimal by data
    contract; per-element round then int sums are order-independent)."""
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def pricing_summary(sf_dir: str, *, cutoff: str = "1996-01-01") -> pa.Table:
    """TPC-H Q1-shaped pricing summary with partial aggregation: each batch
    collapses to one row per (returnflag, linestatus) BEFORE the shuffle, so
    the groupby moves O(groups × blocks) rows instead of O(rows)."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
        filter=pc.field("l_shipdate") < pa.scalar(np.datetime64(cutoff, "us")),
    )

    def partial(batch: pa.Table) -> pa.Table:
        qty = pc.cast(batch.column("l_quantity"), pa.int64())
        price_c = _cents(batch.column("l_extendedprice"))
        disc_c = _cents(batch.column("l_discount"))
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": qty,
                "price_c": price_c,
                "disc_c": disc_c,
            }
        )
        df = t.to_pandas()
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(
                sum_qty=("qty", "sum"),
                sum_base_c=("price_c", "sum"),
                sum_disc_c=("disc_c", "sum"),
                n=("qty", "size"),
            )
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_c", alias_name="sum_base_c"),
            Sum("sum_disc_c", alias_name="sum_disc_c"),
            Sum("n", alias_name="count_order"),
        )
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    final["sum_base"] = final.pop("sum_base_c") / 100.0
    final["avg_disc"] = np.floor(
        final.pop("sum_disc_c") / final["count_order"] / 100.0 * 10000
    ) / 10000
    out = final[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base", "avg_disc", "count_order"]
    ]
    return pa.Table.from_pandas(out, preserve_index=False)


def top_customers_by_revenue(sf_dir: str, *, k: int = 10) -> pa.Table:
    """Revenue per customer with a broadcast dimension join: orders
    pre-aggregate per batch → small groupby → customer names looked up from
    a ``ray.put`` dict inside the final map (no shuffle join; customer is the
    small side)."""
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    ).to_pandas()
    lookup = ray.put(
        {
            int(k_): (n_, s_)
            for k_, n_, s_ in zip(
                cust["c_custkey"], cust["c_name"], cust["c_mktsegment"]
            )
        }
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "total_c": _cents(batch.column("o_totalprice")),
            }
        ).to_pandas()
        g = df.groupby("o_custkey", sort=False)["total_c"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("total_c", alias_name="total_c"))
    )

    def attach(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup)
        keys = batch.column("o_custkey").to_pylist()
        names = [lk.get(int(x), (None, None))[0] for x in keys]
        segs = [lk.get(int(x), (None, None))[1] for x in keys]
        return pa.table(
            {
                "c_custkey": batch.column("o_custkey"),
                "c_name": pa.array(names, pa.string()),
                "c_mktsegment": pa.array(segs, pa.string()),
                "revenue": pc.divide(
                    pc.cast(batch.column("total_c"), pa.float64()), 100.0
                ),
            }
        )

    top = (
        per_cust.map_batches(attach, batch_format="pyarrow")
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(k)
    )
    return pa.Table.from_pandas(top.to_pandas(), preserve_index=False)


def top_orders(sf_dir: str, *, k: int = 10) -> "rd.Dataset":
    """Global top-k by sort+limit (distributed sort, tiny result)."""
    return (
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
        )
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def event_type_counts(sf_dir: str) -> "rd.Dataset":
    """Distinct event types with counts (groupby-count over a pruned read)."""
    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
    )


def events_hourly(sf_dir: str) -> "rd.Dataset":
    """Tumbling-window aggregate: events per (event_type, hour) with distinct
    users — hour assignment is a vectorized ``floor_temporal`` per batch, the
    only shuffle is the final grouped aggregate."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "user_id", "value"]
    )

    def add_hour(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "hour", pc.floor_temporal(batch.column("ts"), unit="hour")
        )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "hour": [g["hour"].iloc[0]],
                "n": np.int64(len(g)),
                "n_users": np.int64(g["user_id"].nunique()),
                "sum_value_c": np.int64(
                    np.floor(g["value"] * 100).astype(np.int64).sum()
                ),
            }
        )

    return (
        ds.map_batches(add_hour, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .map_groups(agg, batch_format="pandas")
    )


def user_sessions(sf_dir: str, *, gap_minutes: int = 30) -> "rd.Dataset":
    """Sessionization: per user, count sessions split at >gap inactivity —
    the streaming-shaped workload pattern (Ray guide): partition by key,
    sort by time within the group, window logic in vectorized pandas."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        dt = g["ts"].diff()
        new_session = dt.isna() | (dt > gap)
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": np.int64(len(g)),
                "n_sessions": np.int64(new_session.sum()),
            }
        )

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def lineitem_filter_stats(sf_dir: str, *, returnflag: str = "R") -> pa.Table:
    """Filter+project with pushdown: row-group filter at the read, partial
    sums per batch, single-row result."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity"],
        filter=pc.field("l_returnflag") == returnflag,
    )

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "sum_qty": pa.array(
                    [pc.sum(pc.cast(batch.column("l_quantity"), pa.int64())).as_py() or 0],
                    pa.int64(),
                ),
            }
        )

    row = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sum_qty", alias_name="sum_qty")
    )
    return pa.table({"n": [row["n"]], "sum_qty": [row["sum_qty"]]})
