"""Relational operator demos over the TPC-H-ish test tables.

Each query exercises an operator family Ray-Data-first:

* q1  pricing summary  — map_batches partial aggregation (combiner)
                         before a small groupby shuffle; all arithmetic
                         in pyarrow.compute, zero Python row loops.
* q3  shipping join    — broadcast hash join (ray.put the small build
                         sides: customer, filtered orders) + streamed
                         probe over lineitem; top-k via local heads +
                         driver merge.
* q5  region revenue   — multi-way broadcast join chain.
* top-k orders         — sort/limit.
* distinct segments    — unique() on a low-cardinality column.
* events sessionize    — per-user ordered gap sessionization via
                         groupby(user_id).map_groups (the windowed/
                         stateful shape Ray Data lacks natively).
* events hourly        — timestamp truncation + partial agg.

All column names match the oracle SQL in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# -- q1: pricing summary (TPC-H Q1 shape) -----------------------------------

_Q1_KEYS = ["l_returnflag", "l_linestatus"]


def _q1_partial(batch: pa.Table) -> pa.Table:
    disc_price = pc.multiply(
        batch.column("l_extendedprice"),
        pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
    )
    batch = batch.append_column("disc_price", disc_price)
    return batch.group_by(_Q1_KEYS).aggregate(
        [
            ("l_quantity", "sum"),
            ("l_extendedprice", "sum"),
            ("disc_price", "sum"),
            ("l_discount", "sum"),
            ("l_quantity", "count"),
        ]
    )


def q1_pricing_summary(sf_dir: str) -> pa.Table:
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    )
    combined = (
        ds.map_batches(_q1_partial, batch_format="pyarrow")
        .groupby(_Q1_KEYS)
        .sum(
            # pyarrow group_by names partials as <col>_<agg>
            [
                "l_quantity_sum",
                "l_extendedprice_sum",
                "disc_price_sum",
                "l_discount_sum",
                "l_quantity_count",
            ]
        )
    )
    tbl = pa.Table.from_pylist(combined.take_all())
    n = pc.cast(tbl.column("sum(l_quantity_count)"), pa.float64())
    out = pa.Table.from_pydict(
        {
            "l_returnflag": tbl.column("l_returnflag"),
            "l_linestatus": tbl.column("l_linestatus"),
            "sum_qty": pc.round(tbl.column("sum(l_quantity_sum)"), 6),
            "sum_base_price": pc.round(tbl.column("sum(l_extendedprice_sum)"), 6),
            "sum_disc_price": pc.round(tbl.column("sum(disc_price_sum)"), 6),
            "avg_qty": pc.round(
                pc.divide(tbl.column("sum(l_quantity_sum)"), n), 6
            ),
            "avg_disc": pc.round(
                pc.divide(tbl.column("sum(l_discount_sum)"), n), 6
            ),
            "count_order": pc.cast(
                tbl.column("sum(l_quantity_count)"), pa.int64()
            ),
        }
    )
    return out.sort_by([("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


# -- q3: broadcast join + group + top-k --------------------------------------

def q3_shipping(sf_dir: str, segment: str = "BUILDING", k: int = 10) -> pa.Table:
    """Revenue of top-k orders for customers in a market segment.

    customer and orders are the small sides: filter + project, then
    ``ray.put`` a dict; lineitem streams and probes per batch.
    """
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust_keys = {
        r["c_custkey"]
        for r in cust.take_all()
        if r["c_mktsegment"] == segment
    }
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    order_rows = orders.take_all()
    order_map = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in order_rows
        if r["o_custkey"] in cust_keys
    }
    order_ref = ray.put(order_map)

    def probe(batch: pa.Table) -> pa.Table:
        omap = ray.get(order_ref)
        keys = batch.column("l_orderkey").to_pylist()
        mask = pa.array([key in omap for key in keys])
        hit = batch.filter(mask)
        if hit.num_rows == 0:
            return pa.Table.from_pydict(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue": pa.array([], pa.float64()),
                }
            )
        rev = pc.multiply(
            hit.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), hit.column("l_discount")),
        )
        part = pa.Table.from_pydict(
            {"l_orderkey": hit.column("l_orderkey"), "revenue": rev}
        )
        return part.group_by("l_orderkey").aggregate([("revenue", "sum")]).rename_columns(
            ["l_orderkey", "revenue"]
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    agg = (
        li.map_batches(probe, batch_format="pyarrow")
        .groupby("l_orderkey")
        .sum("revenue")
    )
    rows = agg.take_all()
    rows.sort(key=lambda r: (-r["sum(revenue)"], r["l_orderkey"]))
    top = rows[:k]
    return pa.Table.from_pydict(
        {
            "l_orderkey": pa.array([r["l_orderkey"] for r in top], pa.int64()),
            "revenue": pa.array(
                [round(r["sum(revenue)"], 6) for r in top], pa.float64()
            ),
        }
    )


# -- q5-style multi-way broadcast join ---------------------------------------

def q5_region_revenue(sf_dir: str) -> pa.Table:
    """Revenue per region: lineitem ⋈ supplier ⋈ nation ⋈ region with all
    small sides broadcast; partial agg per batch; tiny final groupby."""
    region = {r["r_regionkey"]: r["r_name"] for r in _read(sf_dir, "region").take_all()}
    nation = {
        r["n_nationkey"]: region[r["n_regionkey"]]
        for r in _read(sf_dir, "nation").take_all()
    }
    supp = {
        r["s_suppkey"]: nation[r["s_nationkey"]]
        for r in _read(sf_dir, "supplier").take_all()
    }
    supp_ref = ray.put(supp)

    def probe(batch: pa.Table) -> pa.Table:
        smap = ray.get(supp_ref)
        suppkeys = batch.column("l_suppkey").to_pylist()
        regions = [smap.get(s) for s in suppkeys]
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        t = pa.Table.from_pydict(
            {"r_name": pa.array(regions), "revenue": rev}
        )
        return (
            t.group_by("r_name")
            .aggregate([("revenue", "sum")])
            .rename_columns(["r_name", "revenue"])
        )

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
    agg = (
        li.map_batches(probe, batch_format="pyarrow").groupby("r_name").sum("revenue")
    )
    tbl = pa.Table.from_pylist(agg.take_all())
    out = pa.Table.from_pydict(
        {
            "r_name": tbl.column("r_name"),
            "revenue": pc.round(tbl.column("sum(revenue)"), 6),
        }
    )
    return out.sort_by([("r_name", "ascending")])


# -- sort / limit / distinct -------------------------------------------------

def topk_orders(sf_dir: str, k: int = 20) -> pa.Table:
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = ds.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(k)
    tbl = pa.Table.from_pylist(top.take_all())
    return tbl.select(["o_orderkey", "o_totalprice"])


def distinct_segments(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.Table.from_pydict({"c_mktsegment": pa.array(vals)})


def filter_project_lineitem(sf_dir: str, min_qty: float = 45.0) -> pa.Table:
    """Predicate pushdown demo: filtered scan with column pruning."""
    ds = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"]
    )

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch.column("l_quantity"), min_qty))

    rows = ds.map_batches(f, batch_format="pyarrow").take_all()
    tbl = pa.Table.from_pylist(rows) if rows else pa.Table.from_pydict(
        {
            "l_orderkey": pa.array([], pa.int64()),
            "l_linenumber": pa.array([], pa.int32()),
            "l_quantity": pa.array([], pa.float64()),
        }
    )
    return tbl.sort_by(
        [("l_orderkey", "ascending"), ("l_linenumber", "ascending")]
    )


# -- events: windowed / sessionized ------------------------------------------

def events_hourly(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        t = pa.Table.from_pydict(
            {
                "hour": hour,
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
            }
        )
        return (
            t.group_by(["hour", "event_type"])
            .aggregate([("value", "sum"), ("value", "count")])
            .rename_columns(["hour", "event_type", "sum_value", "n_events"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .sum(["sum_value", "n_events"])
    )
    tbl = pa.Table.from_pylist(agg.take_all())
    out = pa.Table.from_pydict(
        {
            "hour": tbl.column("hour"),
            "event_type": tbl.column("event_type"),
            "sum_value": pc.round(tbl.column("sum(sum_value)"), 6),
            "n_events": pc.cast(tbl.column("sum(n_events)"), pa.int64()),
        }
    )
    return out.sort_by([("hour", "ascending"), ("event_type", "ascending")])


def sessionize(sf_dir: str, gap_us: int = SESSION_GAP_US) -> pa.Table:
    """Per-user session count + last-session length, 30-min gap rule.

    groupby(user_id).map_groups: the canonical stateful-per-key window
    Ray Data lacks as a primitive (SURVEY.md custom-operator note).
    """
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def sess(group: pa.Table) -> pa.Table:
        ts = np.sort(
            np.asarray(
                pc.cast(group.column("ts"), pa.int64()).to_pylist(), dtype=np.int64
            )
        )
        gaps = np.diff(ts)
        n_sessions = 1 + int(np.sum(gaps > gap_us))
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(
                    [group.column("user_id")[0].as_py()], pa.int64()
                ),
                "n_events": pa.array([len(ts)], pa.int64()),
                "n_sessions": pa.array([n_sessions], pa.int64()),
            }
        )

    out = ds.groupby("user_id").map_groups(sess, batch_format="pyarrow")
    tbl = pa.Table.from_pylist(out.take_all())
    return tbl.sort_by([("user_id", "ascending")])
