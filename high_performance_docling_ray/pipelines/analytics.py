"""TPC-H-style relational widening + event-funnel analytics.

Extends ``relational.py`` with the remaining classic TPC-H shapes the
test schema can express, plus two event-analytics operators (funnel,
retention cohorts). Every query follows the house execution pattern:

* small build sides are read driver-direct with pyarrow
  (``_broadcast_parquet``), collapsed into dense numpy LUTs and
  ``ray.put`` once — zero-copy plasma reads in every probe task;
* the big probe side (lineitem / events) STREAMS through
  ``map_batches`` with fully vectorized numpy/pyarrow kernels;
* partial aggregates are key-only rows merged by ``_combine_partials``
  (one driver-side C++ group_by) under a row budget, with the Ray
  groupby shuffle as the any-cardinality fallback;
* money math is exact int64 cents (scale 1e2; products at 1e4), so
  every sum is order-independent and bit-stable vs the DuckDB oracle.

Scale notes per query live in each docstring. All output column names
match ``__ray_entry__.oracle_sql`` exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .relational import (
    DIM_BROADCAST_BUDGET,
    _broadcast_parquet,
    _cents,
    _combine_partials,
    _filter_matched,
    _read,
    _sorted_kv,
    _sorted_lookup,
    _sorted_member_mask,
    collect_arrow,
    collect_topk_candidates,
    limb_cols,
    limb_split,
    limb_values,
)

_DAY_US = 86_400_000_000


def _us(date: str) -> np.datetime64:
    return np.datetime64(date, "us")


def _ts_us(col) -> np.ndarray:
    """timestamp[us] column -> int64 microseconds (zero-copy)."""
    return col.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)


# -- q6: filtered scan + scalar aggregate ------------------------------------

def q6_forecast_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q6 shape: pure filtered-scan scalar aggregate.

    No build side at all — each batch reduces to ONE int64 partial
    (revenue at scale 1e4); the driver sums Python ints (arbitrary
    precision, safe at any corpus size). The cheapest possible query:
    demonstrates predicate + projection pushdown at the read.
    """
    lo, hi = _us("1996-01-01"), _us("1997-01-01")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        disc_c = _cents(batch.column("l_discount"))
        qty_c = _cents(batch.column("l_quantity"))
        mask = (
            (ship >= lo) & (ship < hi)
            & (disc_c >= 2) & (disc_c <= 4)
            & (qty_c < 2400)
        )
        base_c = _cents(batch.column("l_extendedprice"))[mask]
        rev = int(np.sum(base_c * disc_c[mask], dtype=np.int64))
        return pa.Table.from_pydict({"rev_e4": pa.array([rev], pa.int64())})

    ds = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    total = sum(int(r["rev_e4"]) for r in parts)
    return pa.Table.from_pydict(
        {"revenue": pa.array([total / 10000.0], pa.float64())}
    )


# -- q4: EXISTS semi-join + priority counts ----------------------------------

def _q4_distributed(sf_dir: str, lo, hi, combine_limit: int = 2_000_000) -> pa.Table:
    """q4's any-cardinality tier: per-order max-shipdate partials (the
    EXISTS collapses to ``max(ship) > o_orderdate``) shuffle once by
    orderkey, the windowed orders attach by ``cogroup_attach``, and the
    ≤|priorities| count partials combine on the driver. No driver-side
    read of orders."""
    from .joins import cogroup_attach

    lo_i = int(lo.astype("datetime64[us]").astype(np.int64))
    hi_i = int(hi.astype("datetime64[us]").astype(np.int64))

    def order_win(b: pa.Table) -> pa.Table:
        od = _ts_us(b.column("o_orderdate"))
        win = (od >= lo_i) & (od < hi_i)
        t = b.filter(pa.array(win))
        return pa.Table.from_pydict(
            {"l_orderkey": t.column("o_orderkey"),
             "odate_us": pa.array(od[win], pa.int64()),
             "o_prio": t.column("o_orderpriority")}
        )

    orders_win = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(order_win, batch_format="pyarrow")

    def li_partial(b: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {"l_orderkey": b.column("l_orderkey"),
             "ship_us": pa.array(_ts_us(b.column("l_shipdate")), pa.int64())}
        )
        return t.group_by("l_orderkey").aggregate(
            [("ship_us", "max")]
        ).rename_columns(["l_orderkey", "ship_us"])

    per_order = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .max("ship_us")
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["l_orderkey", "ship_us"])

    att = cogroup_attach(
        per_order.map_batches(rename, batch_format="pyarrow"), orders_win,
        key="l_orderkey",
        left_fields=[pa.field("l_orderkey", pa.int64()),
                     pa.field("ship_us", pa.int64())],
        payload_fields=[pa.field("odate_us", pa.int64()),
                        pa.field("o_prio", pa.string())],
    )

    def count_partial(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("odate_us").is_valid())
        ship = t.column("ship_us").to_numpy().astype(np.int64)
        od = t.column("odate_us").to_numpy().astype(np.int64)
        t = t.filter(pa.array(ship > od))
        out = pa.Table.from_pydict(
            {"o_orderpriority": t.column("o_prio"),
             "order_count": pa.array(np.ones(t.num_rows, np.int64))}
        )
        return out.group_by("o_orderpriority").aggregate(
            [("order_count", "sum")]
        ).rename_columns(["o_orderpriority", "order_count"])

    partials = att.map_batches(count_partial, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["o_orderpriority"], ["order_count"],
                            combine_limit)
    if tbl is None:  # 5 priorities x blocks can pass the budget at
        # extreme block counts: any-cardinality shuffle fallback
        tbl = pa.Table.from_pylist(
            partials.groupby("o_orderpriority").sum("order_count").take_all()
        )
    return pa.Table.from_pydict(
        {"o_orderpriority": tbl.column("o_orderpriority"),
         "order_count": tbl.column("sum(order_count)")}
    ).sort_by([("o_orderpriority", "ascending")])


def q4_order_priority(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    combine_limit: int = 2_000_000,
    build_budget: int = DIM_BROADCAST_BUDGET,
) -> pa.Table:
    """TPC-H Q4 shape (adapted: the schema has no commit/receipt dates,
    so the EXISTS predicate is "some lineitem shipped after the order
    date"): count orders per priority having such a lineitem.

    The build side is orders FILTERED to a 3-month window — tiny at any
    corpus scale — broadcast as parallel sorted arrays (orderkey,
    orderdate_us, priority id). lineitem streams; each batch emits the
    DISTINCT qualifying orderkeys it saw (block-distinct key rows, the
    column_profile trick), merged under the combine budget, Ray
    groupby fallback past it. The final priority count is a driver
    bincount over ≤|window orders| keys.
    """
    lo, hi = _us(date_lo), _us(date_hi)
    orders = _broadcast_parquet(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"],
        budget_rows=build_budget,
    )
    if orders is None:
        return _q4_distributed(sf_dir, lo, hi, combine_limit)
    odate = _ts_us(orders.column("o_orderdate"))
    win = (odate >= lo.astype("datetime64[us]").astype(np.int64)) & (
        odate < hi.astype("datetime64[us]").astype(np.int64)
    )
    okey = orders.column("o_orderkey").to_numpy().astype(np.int64)[win]
    odate = odate[win]
    prio = orders.column("o_orderpriority").to_numpy(zero_copy_only=False)[win]
    prio_names, prio_id = np.unique(prio, return_inverse=True)
    order_sort = np.argsort(okey, kind="stable")
    okey_s, odate_s, prio_s = okey[order_sort], odate[order_sort], prio_id[order_sort]
    build_ref = ray.put((okey_s, odate_s))

    def probe(batch: pa.Table) -> pa.Table:
        keys_s, dates_s = ray.get(build_ref)
        lkey = batch.column("l_orderkey").to_numpy().astype(np.int64)
        member = _sorted_member_mask(keys_s, lkey)
        if not member.any():
            return pa.Table.from_pydict(
                {"o_orderkey": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        lkey_m = lkey[member]
        ship = _ts_us(batch.column("l_shipdate"))[member]
        pos = np.searchsorted(keys_s, lkey_m)
        qual = ship > dates_s[pos]
        hits = np.unique(lkey_m[qual])
        return pa.Table.from_pydict(
            {"o_orderkey": pa.array(hits, pa.int64()),
             "n": pa.array(np.ones(len(hits), dtype=np.int64))}
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    partials = li.map_batches(probe, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["o_orderkey"], ["n"], combine_limit)
    if tbl is None:  # over budget: any-cardinality shuffle (hit set is
        # bounded by the already-budgeted |window orders| broadcast);
        # Arrow-native collect, no per-row Python dicts
        tbl = collect_arrow(partials.groupby("o_orderkey").sum("n"))
    hit_keys = (
        tbl.column("o_orderkey").to_numpy().astype(np.int64)
        if tbl.num_rows
        else np.array([], dtype=np.int64)
    )
    pos = np.searchsorted(okey_s, hit_keys)
    counts = np.bincount(prio_s[pos], minlength=len(prio_names))
    keep = counts > 0
    return pa.Table.from_pydict(
        {
            "o_orderpriority": pa.array(prio_names[keep]),
            "order_count": pa.array(counts[keep], pa.int64()),
        }
    ).sort_by([("o_orderpriority", "ascending")])


# -- q7: two-nation volume by year --------------------------------------------

def _nation_tag_of(sf_dir: str, nation_a: str, nation_b: str) -> np.ndarray:
    """Dense nationkey -> tag (0 = a, 1 = b, -1 = other). Nation is a
    FIXED-cardinality table (25 by construction), so the dense LUT is
    fine; every corpus-scaling domain below uses sorted-key lookups."""
    nation = _broadcast_parquet(sf_dir, "nation", ["n_nationkey", "n_name"])
    n_key = nation.column("n_nationkey").to_numpy().astype(np.int64)
    n_name = nation.column("n_name").to_numpy(zero_copy_only=False)
    tag_of = np.full(int(n_key.max()) + 1, -1, dtype=np.int64)
    tag_of[n_key[n_name == nation_a]] = 0
    tag_of[n_key[n_name == nation_b]] = 1
    return tag_of


def _q7_distributed_partials(
    sf_dir: str, tag_of: np.ndarray
) -> ray.data.Dataset:
    """q7's any-cardinality tier: customer tags attach to orders by
    custkey, order tags attach to per-row lineitem prep by orderkey,
    supplier tags attach by suppkey — three ``cogroup_attach`` passes,
    no driver-side read of any corpus-scaling table. Emits the same
    (dir_id, l_year, rev_e4) partials as the broadcast probe."""
    from .joins import cogroup_attach

    tag_ref = ray.put(tag_of)

    def cust_tags(b: pa.Table) -> pa.Table:
        tags = ray.get(tag_ref)
        cn = b.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ct = np.where((cn >= 0) & (cn < len(tags)),
                      tags[np.clip(cn, 0, max(len(tags) - 1, 0))], -1)
        keep = ct >= 0
        t = b.filter(pa.array(keep))
        return pa.Table.from_pydict(
            {"o_custkey": t.column("c_custkey"),
             "ctag": pa.array(ct[keep], pa.int64())}
        )

    ctag_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_tags, batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    o_att = cogroup_attach(
        orders, ctag_ds, key="o_custkey",
        left_fields=[pa.field("o_orderkey", pa.int64()),
                     pa.field("o_custkey", pa.int64())],
        payload_fields=[pa.field("ctag", pa.int64())],
    )

    def otag_rows(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("ctag").is_valid())
        return pa.Table.from_pydict(
            {"l_orderkey": t.column("o_orderkey"),
             "otag": t.column("ctag")}
        )

    otag_ds = o_att.map_batches(otag_rows, batch_format="pyarrow")

    def supp_tags(b: pa.Table) -> pa.Table:
        tags = ray.get(tag_ref)
        sn = b.column("s_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        st = np.where((sn >= 0) & (sn < len(tags)),
                      tags[np.clip(sn, 0, max(len(tags) - 1, 0))], -1)
        keep = st >= 0
        t = b.filter(pa.array(keep))
        return pa.Table.from_pydict(
            {"l_suppkey": t.column("s_suppkey"),
             "stag": pa.array(st[keep], pa.int64())}
        )

    stag_ds = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        supp_tags, batch_format="pyarrow"
    )

    def li_prep(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        year = ship.astype("datetime64[Y]").astype(np.int64) + 1970
        base_c = _cents(b.column("l_extendedprice"))
        disc_c = _cents(b.column("l_discount"))
        return pa.Table.from_pydict(
            {"l_orderkey": b.column("l_orderkey"),
             "l_suppkey": b.column("l_suppkey"),
             "l_year": pa.array(year, pa.int64()),
             "rev_e4": pa.array(base_c * (100 - disc_c), pa.int64())}
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")
    li_fields = [
        pa.field("l_orderkey", pa.int64()), pa.field("l_suppkey", pa.int64()),
        pa.field("l_year", pa.int64()), pa.field("rev_e4", pa.int64()),
    ]
    att1 = _filter_matched(
        cogroup_attach(li, otag_ds, key="l_orderkey", left_fields=li_fields,
                       payload_fields=[pa.field("otag", pa.int64())]),
        "otag", drop=False,
    )
    att2 = _filter_matched(
        cogroup_attach(
            att1, stag_ds, key="l_suppkey",
            left_fields=li_fields + [pa.field("otag", pa.int64())],
            payload_fields=[pa.field("stag", pa.int64())],
        ),
        "stag", drop=False,
    )

    def partial(b: pa.Table) -> pa.Table:
        stag = b.column("stag").to_numpy(zero_copy_only=False).astype(np.int64)
        otag = b.column("otag").to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.filter(pa.array(stag != otag))
        out = pa.Table.from_pydict(
            {"dir_id": t.column("stag"),
             "l_year": t.column("l_year"),
             "rev_e4": t.column("rev_e4")}
        )
        out = out.group_by(["dir_id", "l_year"]).aggregate(
            [("rev_e4", "sum")]
        ).rename_columns(["dir_id", "l_year", "rev_e4"])
        # limb-split: ~2 x n_years groups absorb the whole matched
        # volume — the cross-block merge wraps int64 long before
        # 10^12 rows; limbs cannot (VERDICT r4 #2)
        return limb_split(out, ["rev_e4"])

    return att2.map_batches(partial, batch_format="pyarrow")


def q7_nation_volume(
    sf_dir: str,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    combine_limit: int = 2_000_000,
    build_budget: int = DIM_BROADCAST_BUDGET,
) -> pa.Table:
    """TPC-H Q7 shape: shipping volume between two nations by year.

    Under ``build_budget`` the three build sides collapse into TWO
    sorted-key lookups on the driver — suppkey -> supplier-nation tag
    (0/1/-1) and orderkey -> customer-nation tag — broadcast once.
    lineitem streams; a batch reduces to at most 2 × n_years partial
    rows (direction id × ship-year). Past the budget (orders/customer
    grow with the corpus) the ``cogroup_attach`` tier
    (``_q7_distributed_partials``) runs — same partial-agg tail,
    hash-pinned via the q7_nation_volume_cogroup driver entry.
    """
    tag_of = _nation_tag_of(sf_dir, nation_a, nation_b)
    supp = _broadcast_parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"],
                              budget_rows=build_budget)
    cust = (
        _broadcast_parquet(sf_dir, "customer", ["c_custkey", "c_nationkey"],
                           budget_rows=build_budget)
        if supp is not None else None
    )
    orders = (
        _broadcast_parquet(sf_dir, "orders", ["o_orderkey", "o_custkey"],
                           budget_rows=build_budget)
        if cust is not None else None
    )
    if supp is None or cust is None or orders is None:
        partials = _q7_distributed_partials(sf_dir, tag_of)
    else:
        def tag_at(nat_keys: np.ndarray) -> np.ndarray:
            ok = (nat_keys >= 0) & (nat_keys < len(tag_of))
            return np.where(
                ok, tag_of[np.clip(nat_keys, 0, max(len(tag_of) - 1, 0))], -1
            )

        s_key = supp.column("s_suppkey").to_numpy().astype(np.int64)
        s_nat = supp.column("s_nationkey").to_numpy().astype(np.int64)
        s_sorted, s_tag = _sorted_kv(s_key, tag_at(s_nat))

        c_key = cust.column("c_custkey").to_numpy().astype(np.int64)
        c_nat = cust.column("c_nationkey").to_numpy().astype(np.int64)
        c_sorted, c_tag = _sorted_kv(c_key, tag_at(c_nat))

        o_key = orders.column("o_orderkey").to_numpy().astype(np.int64)
        o_cust = orders.column("o_custkey").to_numpy().astype(np.int64)
        # dangling o_custkey -> -1 (drops, like the oracle's inner join)
        o_sorted, o_tag = _sorted_kv(
            o_key, _sorted_lookup(c_sorted, c_tag, o_cust, -1)
        )
        lut_ref = ray.put((s_sorted, s_tag, o_sorted, o_tag))

        _EMPTY = pa.Table.from_pydict(
            {"dir_id": pa.array([], pa.int64()),
             "l_year": pa.array([], pa.int64()),
             **{c: pa.array([], pa.int64())
                for c in limb_cols(["rev_e4"])}}
        )

        def probe(batch: pa.Table) -> pa.Table:
            sk_s, st_s, ok_s, ot_s = ray.get(lut_ref)
            sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
            ok = batch.column("l_orderkey").to_numpy().astype(np.int64)
            stag = _sorted_lookup(sk_s, st_s, sk, -1)
            otag = _sorted_lookup(ok_s, ot_s, ok, -1)
            # cross-nation pairs only: (a-supplier, b-customer) or reverse
            mask = (stag >= 0) & (otag >= 0) & (stag != otag)
            if not mask.any():
                return _EMPTY
            dir_id = stag[mask]  # 0: a->b, 1: b->a
            ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)[mask]
            year = ship.astype("datetime64[Y]").astype(np.int64) + 1970
            base_c = _cents(batch.column("l_extendedprice"))[mask]
            disc_c = _cents(batch.column("l_discount"))[mask]
            t = pa.Table.from_pydict(
                {"dir_id": pa.array(dir_id, pa.int64()),
                 "l_year": pa.array(year, pa.int64()),
                 "rev_e4": pa.array(base_c * (100 - disc_c), pa.int64())}
            )
            t = t.group_by(["dir_id", "l_year"]).aggregate(
                [("rev_e4", "sum")]
            ).rename_columns(["dir_id", "l_year", "rev_e4"])
            return limb_split(t, ["rev_e4"])

        li = _read(
            sf_dir, "lineitem",
            ["l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        partials = li.map_batches(probe, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    rcols = limb_cols(["rev_e4"])
    tbl = _combine_partials(partials, ["dir_id", "l_year"], rcols,
                            combine_limit)
    if tbl is None:
        tbl = collect_arrow(
            partials.groupby(["dir_id", "l_year"]).sum(rcols)
        )
    dir_id = tbl.column("dir_id").to_numpy().astype(np.int64)
    names = np.array([nation_a, nation_b], dtype=object)
    out = pa.Table.from_pydict(
        {
            "supp_nation": pa.array(names[dir_id].tolist(), pa.string()),
            "cust_nation": pa.array(names[1 - dir_id].tolist(), pa.string()),
            "l_year": tbl.column("l_year"),
            "revenue": pa.array(
                [float(v) / 10000.0 for v in limb_values(tbl, "rev_e4")],
                pa.float64(),
            ),
        }
    )
    return out.sort_by(
        [("supp_nation", "ascending"), ("cust_nation", "ascending"),
         ("l_year", "ascending")]
    )


# -- q10: returned-item revenue per customer ----------------------------------

def q10_returned_items(
    sf_dir: str,
    date_lo: str = "1996-07-01",
    date_hi: str = "1996-10-01",
    k: int = 20,
    combine_limit: int = 2_000_000,
    build_budget: int = DIM_BROADCAST_BUDGET,
) -> pa.Table:
    """TPC-H Q10 shape: top-k customers by revenue lost to returns in a
    quarter. Under ``build_budget`` the build side is orders filtered
    to the window (orderkey -> custkey), broadcast sorted; probe =
    lineitem with l_returnflag='R'; partial agg per custkey; the
    customer attribute attach happens on the ≤k driver rows (never a
    distributed join). Past the budget the window-filtered orders
    attach by ``cogroup_attach`` and the ≤k customer rows are fetched
    with a streamed key-filter scan — no driver read of
    orders/customer (q10_returned_items_cogroup pins the tier).
    """
    lo, hi = _us(date_lo), _us(date_hi)
    lo_i, hi_i = int(lo.astype(np.int64)), int(hi.astype(np.int64))
    orders = _broadcast_parquet(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        budget_rows=build_budget,
    )
    if orders is not None:
        odate = _ts_us(orders.column("o_orderdate"))
        win = (odate >= lo_i) & (odate < hi_i)
        okey = orders.column("o_orderkey").to_numpy().astype(np.int64)[win]
        ocust = orders.column("o_custkey").to_numpy().astype(np.int64)[win]
        order_sort = np.argsort(okey, kind="stable")
        okey_s, ocust_s = okey[order_sort], ocust[order_sort]
        build_ref = ray.put((okey_s, ocust_s))

        _EMPTY = pa.Table.from_pydict(
            {"c_custkey": pa.array([], pa.int64()),
             "rev_e4": pa.array([], pa.int64())}
        )

        def probe(batch: pa.Table) -> pa.Table:
            keys_s, cust_s = ray.get(build_ref)
            flag = batch.column("l_returnflag").to_numpy(zero_copy_only=False)
            lkey = batch.column("l_orderkey").to_numpy().astype(np.int64)
            mask = (flag == "R") & _sorted_member_mask(keys_s, lkey)
            if not mask.any():
                return _EMPTY
            ck = cust_s[np.searchsorted(keys_s, lkey[mask])]
            base_c = _cents(batch.column("l_extendedprice"))[mask]
            disc_c = _cents(batch.column("l_discount"))[mask]
            t = pa.Table.from_pydict(
                {"c_custkey": pa.array(ck, pa.int64()),
                 "rev_e4": pa.array(base_c * (100 - disc_c), pa.int64())}
            )
            return t.group_by("c_custkey").aggregate(
                [("rev_e4", "sum")]
            ).rename_columns(["c_custkey", "rev_e4"])

        li = _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        )
        partials = li.map_batches(probe, batch_format="pyarrow")
    else:
        from .joins import cogroup_attach

        def order_win(b: pa.Table) -> pa.Table:
            od = _ts_us(b.column("o_orderdate"))
            w = (od >= lo_i) & (od < hi_i)
            t = b.filter(pa.array(w))
            return pa.Table.from_pydict(
                {"l_orderkey": t.column("o_orderkey"),
                 "o_custkey": t.column("o_custkey")}
            )

        orders_win = _read(
            sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
        ).map_batches(order_win, batch_format="pyarrow")

        def li_prep(b: pa.Table) -> pa.Table:
            flag = b.column("l_returnflag").to_numpy(zero_copy_only=False)
            t = b.filter(pa.array(flag == "R"))
            base_c = _cents(t.column("l_extendedprice"))
            disc_c = _cents(t.column("l_discount"))
            part = pa.Table.from_pydict(
                {"l_orderkey": t.column("l_orderkey"),
                 "rev_e4": pa.array(base_c * (100 - disc_c), pa.int64())}
            )
            return part.group_by("l_orderkey").aggregate(
                [("rev_e4", "sum")]
            ).rename_columns(["l_orderkey", "rev_e4"])

        li = _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        ).map_batches(li_prep, batch_format="pyarrow")
        att = _filter_matched(
            cogroup_attach(
                li, orders_win, key="l_orderkey",
                left_fields=[pa.field("l_orderkey", pa.int64()),
                             pa.field("rev_e4", pa.int64())],
                payload_fields=[pa.field("o_custkey", pa.int64())],
            ),
            "o_custkey", drop=False,
        )

        def per_cust(b: pa.Table) -> pa.Table:
            t = pa.Table.from_pydict(
                {"c_custkey": b.column("o_custkey").cast(pa.int64()),
                 "rev_e4": b.column("rev_e4")}
            )
            return t.group_by("c_custkey").aggregate(
                [("rev_e4", "sum")]
            ).rename_columns(["c_custkey", "rev_e4"])

        partials = att.map_batches(per_cust, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["c_custkey"], ["rev_e4"], combine_limit)
    if tbl is None:
        # over the combine budget: per-customer revenues stay
        # DISTRIBUTED; the driver only collects per-batch
        # top-k-with-ties candidates (q21's treatment, shared helper)
        tbl = collect_topk_candidates(
            partials.groupby("c_custkey").sum("rev_e4"), "sum(rev_e4)", k
        )
    idx = pc.sort_indices(
        tbl,
        sort_keys=[("sum(rev_e4)", "descending"), ("c_custkey", "ascending")],
    )[:k]
    head = tbl.take(idx)
    ck = head.column("c_custkey").to_numpy().astype(np.int64)
    rev = head.column("sum(rev_e4)").to_numpy().astype(np.int64)

    cust = _broadcast_parquet(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        budget_rows=build_budget,
    )
    if cust is None:
        # stream-filter the ≤k winner customers out of the big table
        # (winner keys broadcast; one scan, no shuffle)
        wk_ref = ray.put(np.sort(ck))

        def pick(b: pa.Table) -> pa.Table:
            keys = ray.get(wk_ref)
            probe_keys = b.column("c_custkey").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(_sorted_member_mask(keys, probe_keys)))

        parts = [
            t for t in ray.get(
                _read(sf_dir, "customer",
                      ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
                .map_batches(pick, batch_format="pyarrow")
                .materialize().to_arrow_refs()
            )
            if t.num_rows
        ]
        cust = (
            pa.concat_tables(parts) if parts
            else pa.Table.from_pydict(
                {"c_custkey": pa.array([], pa.int64()),
                 "c_name": pa.array([], pa.string()),
                 "c_acctbal": pa.array([], pa.float64()),
                 "c_nationkey": pa.array([], pa.int32())}
            )
        )
    nation = _broadcast_parquet(sf_dir, "nation", ["n_nationkey", "n_name"])
    all_ck = cust.column("c_custkey").to_numpy().astype(np.int64)
    pos = {int(c): i for i, c in enumerate(all_ck)}
    rows = [pos[int(c)] for c in ck]
    nname = nation.column("n_name").to_numpy(zero_copy_only=False)
    nkey = nation.column("n_nationkey").to_numpy().astype(np.int64)
    nlut = np.empty(int(nkey.max()) + 1, dtype=object)
    nlut[nkey] = nname
    cnat = cust.column("c_nationkey").to_numpy().astype(np.int64)[rows]
    return pa.Table.from_pydict(
        {
            "c_custkey": pa.array(ck, pa.int64()),
            "c_name": pa.array(
                cust.column("c_name").to_numpy(zero_copy_only=False)[rows].tolist()
            ),
            "revenue": pa.array(rev / 10000.0, pa.float64()),
            "c_acctbal": pa.array(
                cust.column("c_acctbal").to_numpy(zero_copy_only=False)[rows],
                pa.float64(),
            ),
            "n_name": pa.array(nlut[cnat].tolist(), pa.string()),
        }
    )


# -- q12: priority line counts per return flag --------------------------------

def q12_priority_lines(
    sf_dir: str, year: str = "1996", combine_limit: int = 2_000_000,
    build_budget: int = DIM_BROADCAST_BUDGET,
) -> pa.Table:
    """TPC-H Q12 shape (adapted: no l_shipmode column — the group key is
    l_returnflag): per flag, how many lines shipped that year belong to
    high-priority orders (1-URGENT / 2-HIGH) vs the rest. Build side =
    orderkey -> is_high sorted-key lookup under ``build_budget``; past
    it the year-filtered lineitem attaches the order flag by
    ``cogroup_attach`` (q12_priority_lines_cogroup pins the tier).
    Probe emits ≤|flags| partial rows either way.
    """
    lo = _us(f"{year}-01-01")
    hi = _us(f"{int(year) + 1}-01-01")
    orders = _broadcast_parquet(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority"],
        budget_rows=build_budget,
    )
    _EMPTY = pa.Table.from_pydict(
        {"l_returnflag": pa.array([], pa.string()),
         "high_line_count": pa.array([], pa.int64()),
         "low_line_count": pa.array([], pa.int64())}
    )
    if orders is not None:
        okey = orders.column("o_orderkey").to_numpy().astype(np.int64)
        oprio = orders.column("o_orderpriority").to_numpy(zero_copy_only=False)
        ok_s, high_s = _sorted_kv(
            okey, np.isin(oprio, ["1-URGENT", "2-HIGH"]).astype(np.int64)
        )
        lut_ref = ray.put((ok_s, high_s))

        def probe(batch: pa.Table) -> pa.Table:
            keys_s, high_v = ray.get(lut_ref)
            ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
            lkey = batch.column("l_orderkey").to_numpy().astype(np.int64)
            mask = (ship >= lo) & (ship < hi)
            if not mask.any():
                return _EMPTY
            h = _sorted_lookup(keys_s, high_v, lkey[mask], -1)
            known = h >= 0
            flag = batch.column("l_returnflag").to_numpy(zero_copy_only=False)[mask][known]
            h = h[known]
            t = pa.Table.from_pydict(
                {"l_returnflag": pa.array(flag.tolist(), pa.string()),
                 "high_line_count": pa.array(h, pa.int64()),
                 "low_line_count": pa.array(1 - h, pa.int64())}
            )
            return t.group_by("l_returnflag").aggregate(
                [("high_line_count", "sum"), ("low_line_count", "sum")]
            ).rename_columns(["l_returnflag", "high_line_count", "low_line_count"])

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_returnflag"])
        partials = li.map_batches(probe, batch_format="pyarrow")
    else:
        from .joins import cogroup_attach

        def order_flags(b: pa.Table) -> pa.Table:
            oprio = b.column("o_orderpriority").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {"l_orderkey": b.column("o_orderkey"),
                 "is_high": pa.array(
                     np.isin(oprio, ["1-URGENT", "2-HIGH"]).astype(np.int64),
                     pa.int64())}
            )

        flags_ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]
                         ).map_batches(order_flags, batch_format="pyarrow")

        def li_win(b: pa.Table) -> pa.Table:
            ship = b.column("l_shipdate").to_numpy(zero_copy_only=False)
            t = b.filter(pa.array((ship >= lo) & (ship < hi)))
            return pa.Table.from_pydict(
                {"l_orderkey": t.column("l_orderkey"),
                 "l_returnflag": t.column("l_returnflag")}
            )

        li = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_shipdate", "l_returnflag"]
                   ).map_batches(li_win, batch_format="pyarrow")
        att = _filter_matched(
            cogroup_attach(
                li, flags_ds, key="l_orderkey",
                left_fields=[pa.field("l_orderkey", pa.int64()),
                             pa.field("l_returnflag", pa.string())],
                payload_fields=[pa.field("is_high", pa.int64())],
            ),
            "is_high", drop=False,
        )

        def count_partial(b: pa.Table) -> pa.Table:
            h = b.column("is_high").to_numpy(zero_copy_only=False).astype(np.int64)
            t = pa.Table.from_pydict(
                {"l_returnflag": b.column("l_returnflag"),
                 "high_line_count": pa.array(h, pa.int64()),
                 "low_line_count": pa.array(1 - h, pa.int64())}
            )
            return t.group_by("l_returnflag").aggregate(
                [("high_line_count", "sum"), ("low_line_count", "sum")]
            ).rename_columns(
                ["l_returnflag", "high_line_count", "low_line_count"]
            )

        partials = att.map_batches(count_partial, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(
        partials, ["l_returnflag"], ["high_line_count", "low_line_count"],
        combine_limit,
    )
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby("l_returnflag")
            .sum(["high_line_count", "low_line_count"]).take_all()
        )
    out = pa.Table.from_pydict(
        {
            "l_returnflag": tbl.column("l_returnflag"),
            "high_line_count": tbl.column("sum(high_line_count)"),
            "low_line_count": tbl.column("sum(low_line_count)"),
        }
    )
    return out.sort_by([("l_returnflag", "ascending")])


# -- q14: promo revenue share --------------------------------------------------

def q14_promo_revenue(
    sf_dir: str, date_lo: str = "1996-09-01", date_hi: str = "1996-10-01",
    build_budget: int = DIM_BROADCAST_BUDGET,
) -> pa.Table:
    """TPC-H Q14 shape: share of one month's revenue from PROMO parts.
    Build side = partkey -> is_promo sorted-key lookup under
    ``build_budget``; past it (part grows with the corpus) the
    month-filtered lineitem attaches the flag by ``cogroup_attach``
    (q14_promo_revenue_cogroup pins the tier). Each batch reduces to
    two int64 partials (promo_e4, total_e4) summed as Python ints on
    the driver; ONE float divide at the very end (bit-stable vs the
    oracle's DOUBLE divide of two exact DECIMAL sums).
    """
    lo, hi = _us(date_lo), _us(date_hi)
    part = _broadcast_parquet(sf_dir, "part", ["p_partkey", "p_type"],
                              budget_rows=build_budget)
    if part is not None:
        pkey = part.column("p_partkey").to_numpy().astype(np.int64)
        ptype = part.column("p_type").to_numpy(zero_copy_only=False)
        pk_s, promo_s = _sorted_kv(pkey, (ptype == "PROMO").astype(np.int64))
        lut_ref = ray.put((pk_s, promo_s))

        def probe(batch: pa.Table) -> pa.Table:
            keys_s, promo_v = ray.get(lut_ref)
            ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
            pk = batch.column("l_partkey").to_numpy().astype(np.int64)
            mask = (ship >= lo) & (ship < hi)
            flag = np.where(mask, _sorted_lookup(keys_s, promo_v, pk, -1), -1)
            keep = flag >= 0
            base_c = _cents(batch.column("l_extendedprice"))[keep]
            disc_c = _cents(batch.column("l_discount"))[keep]
            rev = base_c * (100 - disc_c)
            return pa.Table.from_pydict(
                {
                    "promo_e4": pa.array(
                        [int(np.sum(rev[flag[keep] == 1], dtype=np.int64))], pa.int64()
                    ),
                    "total_e4": pa.array([int(np.sum(rev, dtype=np.int64))], pa.int64()),
                }
            )

        li = _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        partials_ds = li.map_batches(probe, batch_format="pyarrow")
    else:
        from .joins import cogroup_attach

        def part_flags(b: pa.Table) -> pa.Table:
            ptype = b.column("p_type").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {"l_partkey": b.column("p_partkey"),
                 "is_promo": pa.array((ptype == "PROMO").astype(np.int64),
                                      pa.int64())}
            )

        flags_ds = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
            part_flags, batch_format="pyarrow"
        )

        def li_win(b: pa.Table) -> pa.Table:
            ship = b.column("l_shipdate").to_numpy(zero_copy_only=False)
            t = b.filter(pa.array((ship >= lo) & (ship < hi)))
            base_c = _cents(t.column("l_extendedprice"))
            disc_c = _cents(t.column("l_discount"))
            return pa.Table.from_pydict(
                {"l_partkey": t.column("l_partkey"),
                 "rev_e4": pa.array(base_c * (100 - disc_c), pa.int64())}
            )

        li = _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        ).map_batches(li_win, batch_format="pyarrow")
        att = _filter_matched(
            cogroup_attach(
                li, flags_ds, key="l_partkey",
                left_fields=[pa.field("l_partkey", pa.int64()),
                             pa.field("rev_e4", pa.int64())],
                payload_fields=[pa.field("is_promo", pa.int64())],
            ),
            "is_promo", drop=False,
        )

        def scalar_partial(b: pa.Table) -> pa.Table:
            rev = b.column("rev_e4").to_numpy(zero_copy_only=False).astype(np.int64)
            promo = b.column("is_promo").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.Table.from_pydict(
                {"promo_e4": pa.array([int(np.sum(rev * (promo == 1)))], pa.int64()),
                 "total_e4": pa.array([int(np.sum(rev))], pa.int64())}
            )

        partials_ds = att.map_batches(scalar_partial, batch_format="pyarrow")
    parts = partials_ds.take_all()
    promo_sum = sum(int(r["promo_e4"]) for r in parts)
    total_sum = sum(int(r["total_e4"]) for r in parts)
    share = 100.0 * ((promo_sum / 10000.0) / (total_sum / 10000.0)) if total_sum else 0.0
    return pa.Table.from_pydict(
        {"promo_revenue": pa.array([share], pa.float64())}
    )


# -- rollup: multi-level aggregate ---------------------------------------------

def revenue_rollup(sf_dir: str, combine_limit: int = 2_000_000) -> pa.Table:
    """GROUP BY ROLLUP(r_name, n_name) supplier revenue.

    One streaming pass produces EXACT int64 partials at the FINEST
    grain (nation id); region subtotals and the grand total are derived
    on the driver from that ≤|nations|-row table — the rollup costs
    nothing beyond the base aggregate (the standard rollup-from-finest-
    grain identity, valid because sums are exact ints).
    Output: (r_name, n_name, revenue) with NULLs marking subtotal rows,
    exactly like SQL ROLLUP.
    """
    region = _broadcast_parquet(sf_dir, "region", ["r_regionkey", "r_name"])
    nation = _broadcast_parquet(
        sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]
    )
    supp = _broadcast_parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    r_keys = region.column("r_regionkey").to_numpy().astype(np.int64)
    r_names = region.column("r_name").to_numpy(zero_copy_only=False)
    rname_of = np.empty(int(r_keys.max()) + 1, dtype=object)
    rname_of[r_keys] = r_names
    n_key = nation.column("n_nationkey").to_numpy().astype(np.int64)
    n_name = nation.column("n_name").to_numpy(zero_copy_only=False)
    n_reg = nation.column("n_regionkey").to_numpy().astype(np.int64)
    s_key = supp.column("s_suppkey").to_numpy().astype(np.int64)
    s_nat = supp.column("s_nationkey").to_numpy().astype(np.int64)
    # suppkey -> dense nation index (position in the nation table);
    # the nation side stays dense (fixed 25 keys) but the supplier side
    # is a corpus-scaling domain -> sorted-key lookup
    nid_of_nkey = np.full(int(n_key.max()) + 1, -1, dtype=np.int64)
    nid_of_nkey[n_key] = np.arange(len(n_key))
    nat_ok = (s_nat >= 0) & (s_nat < len(nid_of_nkey))
    nid_vals = np.where(
        nat_ok, nid_of_nkey[np.clip(s_nat, 0, max(len(nid_of_nkey) - 1, 0))], -1
    )
    s_sorted, s_nid = _sorted_kv(s_key, nid_vals)
    lut_ref = ray.put((s_sorted, s_nid))
    n_nations = len(n_key)

    _EMPTY = pa.Table.from_pydict(
        {"nid": pa.array([], pa.int64()), "rev_e4": pa.array([], pa.int64())}
    )

    def probe(batch: pa.Table) -> pa.Table:
        keys_s, nid_s = ray.get(lut_ref)
        if len(keys_s) == 0 or batch.num_rows == 0:
            return _EMPTY
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        nid = _sorted_lookup(keys_s, nid_s, sk, -1)
        ok = nid >= 0
        base_c = _cents(batch.column("l_extendedprice"))[ok]
        disc_c = _cents(batch.column("l_discount"))[ok]
        sums = np.zeros(n_nations, dtype=np.int64)
        np.add.at(sums, nid[ok], base_c * (100 - disc_c))
        hit = np.zeros(n_nations, dtype=bool)
        hit[nid[ok]] = True
        return pa.Table.from_pydict(
            {"nid": pa.array(np.nonzero(hit)[0], pa.int64()),
             "rev_e4": pa.array(sums[hit], pa.int64())}
        )

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
    partials = li.map_batches(probe, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["nid"], ["rev_e4"], combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby("nid").sum("rev_e4").take_all()
        )

    nid = tbl.column("nid").to_numpy().astype(np.int64)
    rev = tbl.column("sum(rev_e4)").to_numpy().astype(np.int64)
    rows_r, rows_n, rows_v = [], [], []
    # finest grain
    for i, v in zip(nid, rev):
        rows_r.append(rname_of[n_reg[i]])
        rows_n.append(n_name[i])
        rows_v.append(int(v))
    # region subtotals
    reg_of_row = np.array([n_reg[i] for i in nid], dtype=np.int64)
    for rk in np.unique(reg_of_row):
        rows_r.append(rname_of[rk])
        rows_n.append(None)
        rows_v.append(int(rev[reg_of_row == rk].sum()))
    # grand total
    rows_r.append(None)
    rows_n.append(None)
    rows_v.append(int(rev.sum()))
    out = pa.Table.from_pydict(
        {
            "r_name": pa.array(rows_r, pa.string()),
            "n_name": pa.array(rows_n, pa.string()),
            "revenue": pa.array(np.array(rows_v, dtype=np.int64) / 10000.0,
                                pa.float64()),
        }
    )
    return out.sort_by(
        [("r_name", "ascending"), ("n_name", "ascending"), ("revenue", "ascending")]
    )


# -- funnel analysis ------------------------------------------------------------

_FUNNEL_STEPS = ["view", "click", "purchase"]


def funnel_analysis(
    sf_dir: str,
    steps: list[str] | None = None,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """Ordered event funnel: users whose first step-k event STRICTLY
    follows their first qualifying step-(k-1) event.

    Per-user ordered semantics force a co-located scan, so this is the
    groupby(user_id).map_groups shape (like sessionize) — each group
    does a fully vectorized min-chain over its sorted timestamps. The
    shuffle exchanges only (user_id, ts, event_type) key rows; counts
    combine via one tiny aggregate.
    """
    steps = steps or _FUNNEL_STEPS
    n_steps = len(steps)
    step_id = {s: i for i, s in enumerate(steps)}

    def prep(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        keep = np.isin(et, steps)
        kept = et[keep]
        sid = np.zeros(len(kept), dtype=np.int64)
        for i, s in enumerate(steps):  # |steps| vectorized passes, no row loop
            sid[kept == s] = i
        return pa.Table.from_pydict(
            {
                "user_id": batch.column("user_id").filter(pa.array(keep)),
                "ts_us": pa.array(_ts_us(batch.column("ts"))[keep], pa.int64()),
                "sid": pa.array(sid, pa.int64()),
            }
        )

    def depth(group: pa.Table) -> pa.Table:
        ts = group.column("ts_us").to_numpy()
        sid = group.column("sid").to_numpy()
        t = -1  # start: any first-step event qualifies (ts > -1 always)
        d = 0
        for k in range(n_steps):
            mask = (sid == k) & (ts > t)
            if not mask.any():
                break
            t = int(ts[mask].min())
            d = k + 1
        return pa.Table.from_pydict({"depth": pa.array([d], pa.int64())})

    def depth_hist(batch: pa.Table) -> pa.Table:
        # per-block depth histogram: the driver only ever sees
        # (n_steps+1)-row partials, never per-user rows
        d = batch.column("depth").to_numpy().astype(np.int64)
        hist = np.bincount(d, minlength=n_steps + 1)
        return pa.Table.from_pydict(
            {"depth": pa.array(np.arange(n_steps + 1), pa.int64()),
             "n": pa.array(hist, pa.int64())}
        )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    hists = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(depth, batch_format="pyarrow")
        .map_batches(depth_hist, batch_format="pyarrow")
    )
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    hists = hists.materialize()
    tbl = _combine_partials(hists, ["depth"], ["n"], combine_limit)
    if tbl is None:  # over budget (n_steps+1 keys — only under a forced 0)
        tbl = pa.Table.from_pylist(
            hists.groupby("depth").sum("n").take_all()
        )
    counts = np.zeros(n_steps, dtype=np.int64)
    if tbl.num_rows:
        dcol = tbl.column("depth").to_numpy().astype(np.int64)
        ncol = tbl.column("sum(n)").to_numpy().astype(np.int64)
        hist = np.zeros(n_steps + 1, dtype=np.int64)
        hist[dcol] = ncol
        # users reaching step k = sum of hist[d] for d >= k+1
        counts = np.cumsum(hist[::-1])[::-1][1:]
    return pa.Table.from_pydict(
        {
            "step": pa.array([f"{i + 1}_{s}" for i, s in enumerate(steps)]),
            "users": pa.array(counts, pa.int64()),
        }
    )


# -- retention cohorts -----------------------------------------------------------

def _emit_triples(
    cohort: np.ndarray, off: np.ndarray, users: np.ndarray
) -> pa.Table:
    """Block-distinct (cohort_day, day_offset, user_id, n=1) rows —
    the shared emission of both retention tiers."""
    trip = np.unique(np.stack([cohort, off, users], axis=1), axis=0)
    return pa.Table.from_pydict(
        {
            "cohort_day": pa.array(trip[:, 0], pa.int64()),
            "day_offset": pa.array(trip[:, 1], pa.int64()),
            "user_id": pa.array(trip[:, 2], pa.int64()),
            "n": pa.array(np.ones(len(trip), dtype=np.int64)),
        }
    )


def _distinct_triple_counts(
    trips: ray.data.Dataset, combine_limit: int
) -> pa.Table:
    """DISTINCT-user counts per (cohort_day, day_offset) from
    (cohort_day, day_offset, user_id, n) partial rows WITHOUT ever
    collecting the triples: the Ray groupby dedups triples (one row
    per distinct triple in its output), and because whole key groups
    land in single blocks, per-block (cohort, offset, row-count)
    partials are additive — the ngram_diversity row-count trick."""
    grouped = trips.groupby(["cohort_day", "day_offset", "user_id"]).sum("n")

    def block_counts(b: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {
                "cohort_day": b.column("cohort_day"),
                "day_offset": b.column("day_offset"),
                "users": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        return t.group_by(["cohort_day", "day_offset"]).aggregate(
            [("users", "sum")]
        ).rename_columns(["cohort_day", "day_offset", "users"])

    cparts = grouped.map_batches(block_counts, batch_format="pyarrow")
    counted = _combine_partials(
        cparts, ["cohort_day", "day_offset"], ["users"], combine_limit
    )
    if counted is None:  # (days x offsets) grid over budget: shuffle
        counted = collect_arrow(
            cparts.groupby(["cohort_day", "day_offset"]).sum("users")
        )
    return counted.rename_columns(["cohort_day", "day_offset", "users"])


def _retention_distributed(
    ds: ray.data.Dataset,
    first_partials: ray.data.Dataset,
    combine_limit: int,
) -> pa.Table:
    """retention_cohorts' any-cardinality tier: per-user first days
    stay a Dataset (Ray groupby-min over the block partials), attach
    to the event stream by ONE ``cogroup_attach`` on user_id, and the
    distinct (cohort, offset, user) triples reduce distributed — no
    per-user state ever lands on the driver or broadcasts."""
    from .joins import cogroup_attach

    firsts_ds = first_partials.groupby("user_id").min("day").map_batches(
        lambda b: b.rename_columns(["user_id", "day0"]),
        batch_format="pyarrow",
    )

    def ev_rows(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(
                    b.column("user_id").to_numpy().astype(np.int64),
                    pa.int64(),
                ),
                "day": pa.array(
                    _ts_us(b.column("ts")) // _DAY_US, pa.int64()
                ),
            }
        )

    att = cogroup_attach(
        ds.map_batches(ev_rows, batch_format="pyarrow"),
        firsts_ds,
        key="user_id",
        left_fields=[pa.field("user_id", pa.int64()),
                     pa.field("day", pa.int64())],
        payload_fields=[pa.field("day0", pa.int64())],
    )

    def triple_rows(b: pa.Table) -> pa.Table:
        # every event's user has a first day by construction; the
        # cogroup cannot produce null payloads here
        u = b.column("user_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        day = b.column("day").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        day0 = b.column("day0").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return _emit_triples(day0, day - day0, u)

    trips = att.map_batches(triple_rows, batch_format="pyarrow")
    counted = _distinct_triple_counts(trips, combine_limit)
    return _retention_format(counted)


def retention_cohorts(sf_dir: str, combine_limit: int = 2_000_000) -> pa.Table:
    """Classic cohort retention: users grouped by first-activity day;
    for each (cohort_day, day_offset) count DISTINCT active users.

    Two passes: (1) per-user first day via per-batch min partials +
    driver combine (key-only rows; Ray groupby fallback past the
    budget); cohort map broadcast sorted. (2) events stream again,
    each batch emits its DISTINCT (cohort_day, offset, user) triples
    (block-distinct rows), combined into exact distinct counts. The
    user id never leaves a key row, so the exchange stays narrow at any
    corpus size; past the broadcast budget the cohort attach becomes a
    cogroup_attach by user_id (documented deployment path).
    """
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def first_partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        day = _ts_us(batch.column("ts")) // _DAY_US
        t = pa.Table.from_pydict(
            {"user_id": pa.array(uid, pa.int64()),
             "day": pa.array(day, pa.int64())}
        )
        return t.group_by("user_id").aggregate([("day", "min")]).rename_columns(
            ["user_id", "day"]
        )

    partials = ds.map_batches(first_partial, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    firsts = _combine_partials(partials, ["user_id"], ["day"],
                               combine_limit, agg="min")
    if firsts is None:
        # any-cardinality tier: the per-user cohort map NEVER lands on
        # the driver — first-days attach to events by cogroup, and the
        # distinct-triple count reduces distributed (the documented
        # deployment path, now real)
        return _retention_distributed(ds, partials, combine_limit)
    uid = firsts.column("user_id").to_numpy().astype(np.int64)
    day0 = firsts.column("min(day)").to_numpy().astype(np.int64)
    order = np.argsort(uid, kind="stable")
    uid_s, day0_s = uid[order], day0[order]
    cohort_ref = ray.put((uid_s, day0_s))

    _EMPTY_TRIP = pa.Table.from_pydict(
        {"cohort_day": pa.array([], pa.int64()),
         "day_offset": pa.array([], pa.int64()),
         "user_id": pa.array([], pa.int64()),
         "n": pa.array([], pa.int64())}
    )

    def triple_partial(batch: pa.Table) -> pa.Table:
        users_s, days0_s = ray.get(cohort_ref)
        if len(users_s) == 0 or batch.num_rows == 0:
            return _EMPTY_TRIP
        u = batch.column("user_id").to_numpy().astype(np.int64)
        day = _ts_us(batch.column("ts")) // _DAY_US
        pos = np.minimum(np.searchsorted(users_s, u), len(users_s) - 1)
        ok = users_s[pos] == u
        cohort = days0_s[pos]
        off = day - cohort
        return _emit_triples(cohort[ok], off[ok], u[ok])

    trips = ds.map_batches(triple_partial, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    trips = trips.materialize()
    tbl = _combine_partials(
        trips, ["cohort_day", "day_offset", "user_id"], ["n"], combine_limit
    )
    if tbl is not None:
        counted = (
            tbl.select(["cohort_day", "day_offset"])
            .append_column(
                "users", pa.array(np.ones(tbl.num_rows, dtype=np.int64))
            )
            .group_by(["cohort_day", "day_offset"])
            .aggregate([("users", "sum")])
            .rename_columns(["cohort_day", "day_offset", "users"])
        )
    else:
        # distinct triples exceed the driver budget: dedup them in the
        # Ray groupby and fold per-block (cohort, offset, rows) counts
        # — the triple rows themselves never collect
        counted = _distinct_triple_counts(trips, combine_limit)
    return _retention_format(counted)


def _retention_format(counted: pa.Table) -> pa.Table:
    ep = np.datetime64("1970-01-01", "us")
    cd = counted.column("cohort_day").to_numpy().astype(np.int64)
    out = pa.Table.from_pydict(
        {
            "cohort_day": pa.array(ep + cd * _DAY_US, pa.timestamp("us")),
            "day_offset": counted.column("day_offset"),
            "users": pc.cast(counted.column("users"), pa.int64()),
        }
    )
    return out.sort_by(
        [("cohort_day", "ascending"), ("day_offset", "ascending")]
    )


# -- salted enrichment join: per-type first-seen attach ------------------------

def event_type_warmup(
    sf_dir: str,
    window_s: int = 86400,
    n_salts: int | None = None,
    salted: bool = True,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """Row-level enrichment join by a LOW-CARDINALITY key where EVERY
    key is hot: attach each event type's first-seen timestamp to every
    event and flag the ones inside the type's first ``window_s`` (one day).

    With ~5 event types, a plain hash-cogroup puts each type's ENTIRE
    probe mass into one partition — five busy buckets, the rest idle:
    the canonical skew straggler (``partition_skew_report`` measures
    exactly this). This query exercises the HOT-KEY-SALTED tier of
    ``joins.cogroup_attach``: probe rows spread round-robin over
    ``n_salts`` partitions per key, the 5-row build side replicated
    into each. (In-budget code would broadcast a 5-row dim, obviously —
    the query forces the cogroup path by design, like the forced
    ``extract_pdf_ocr_cogroup`` tier, because salting only matters once
    the build side outgrows a broadcast but the key stays skewed.)

    The comparison is exact int64 microseconds (no float threshold can
    flip a row), so the row-level output hash-matches the SQL oracle.
    """
    from .joins import cogroup_attach

    ev = _read(sf_dir, "events", ["event_id", "event_type", "ts"])

    _EMPTY = pa.Table.from_pydict(
        {"event_type": pa.array([], pa.string()),
         "first_ts": pa.array([], pa.int64())}
    )

    def first_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        t = pa.Table.from_pydict(
            {"event_type": batch.column("event_type"),
             "first_ts": pa.array(_ts_us(batch.column("ts")), pa.int64())}
        )
        return t.group_by("event_type").aggregate(
            [("first_ts", "min")]
        ).rename_columns(["event_type", "first_ts"])

    partials = ev.map_batches(first_partial, batch_format="pyarrow")
    # <=|event types| keys: always fits the driver combine
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    dim = _combine_partials(partials, ["event_type"], ["first_ts"],
                            combine_limit, agg="min")
    if dim is None:  # event-type partials scale with block count:
        # any-cardinality shuffle fallback
        dim = pa.Table.from_pylist(
            partials.groupby("event_type").min("first_ts").take_all()
        )
    dim = pa.Table.from_pydict(
        {"event_type": dim.column("event_type"),
         "first_ts": dim.column("min(first_ts)")}
    )
    hot = dim.column("event_type").to_pylist() if salted else None

    joined = cogroup_attach(
        ev,
        ray.data.from_arrow(dim),
        "event_type",
        left_fields=[
            pa.field("event_id", pa.int64()),
            pa.field("event_type", pa.string()),
            pa.field("ts", pa.timestamp("us")),
        ],
        payload_fields=[pa.field("first_ts", pa.int64())],
        hot_keys=hot,
        n_salts=n_salts,
    )
    win_us = int(window_s) * 1_000_000

    def flag(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch.column("ts"))
        first = batch.column("first_ts").to_numpy(zero_copy_only=False)
        first = np.asarray(first, dtype=np.int64)
        return pa.Table.from_pydict(
            {"event_id": batch.column("event_id"),
             "event_type": batch.column("event_type"),
             "is_early": pa.array(ts < first + win_us, pa.bool_())}
        )

    refs = ray.get(
        joined.map_batches(flag, batch_format="pyarrow")
        .materialize().to_arrow_refs()
    )
    # materialize() can emit 0-row 0-COLUMN blocks (NOTES_r3) — drop
    # them before concat or the schema union fails
    parts = [t for t in refs if t.num_rows > 0]
    if not parts:
        return pa.Table.from_pydict(
            {"event_id": pa.array([], pa.int64()),
             "event_type": pa.array([], pa.string()),
             "is_early": pa.array([], pa.bool_())}
        )
    return pa.concat_tables(parts).sort_by([("event_id", "ascending")])


# -- LAG window: day-over-day growth per event type ----------------------------

def events_dod_growth(
    sf_dir: str, combine_limit: int = 2_000_000
) -> pa.Table:
    """Per-type day-over-day growth — the LAG window shape. One
    streamed pass reduces events to (event_type, day) count partials
    (bounded by types x days, tiny at any corpus size since the day
    domain grows with TIME, not data volume); the LAG itself is a
    driver shift within lexsorted (type, day) segments over those few
    rows. ``prev_events`` is null on each type's first day, exactly
    like ``LAG(..) OVER (PARTITION BY type ORDER BY day)`` — over
    EXISTING days, so calendar gaps skip to the prior present day.
    ``growth`` divides the two exact int64 counts once, mirrored op
    order.
    """
    _EMPTY = pa.Table.from_pydict(
        {"event_type": pa.array([], pa.string()),
         "day_i": pa.array([], pa.int64()),
         "n": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        day_i = _ts_us(batch.column("ts")) // _DAY_US
        t = pa.Table.from_pydict(
            {"event_type": batch.column("event_type"),
             "day_i": pa.array(day_i, pa.int64()),
             "n": pa.array(np.ones(len(day_i), dtype=np.int64))}
        )
        return t.group_by(["event_type", "day_i"]).aggregate(
            [("n", "sum")]
        ).rename_columns(["event_type", "day_i", "n"])

    ev = _read(sf_dir, "events", ["event_type", "ts"])
    partials = ev.map_batches(partial, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["event_type", "day_i"], ["n"], combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby(["event_type", "day_i"]).sum("n").take_all()
        )
    et = np.asarray(tbl.column("event_type").to_numpy(zero_copy_only=False),
                    dtype=object)
    day_i = tbl.column("day_i").to_numpy().astype(np.int64)
    n = tbl.column("sum(n)").to_numpy().astype(np.int64)
    if len(n) == 0:  # empty events table: mirror the oracle's 0 rows
        return pa.Table.from_pydict(
            {"event_type": pa.array([], pa.string()),
             "day": pa.array([], pa.timestamp("us")),
             "n_events": pa.array([], pa.int64()),
             "prev_events": pa.array([], pa.int64()),
             "growth": pa.array([], pa.float64())}
        )
    order = np.lexsort((day_i, et))
    et, day_i, n = et[order], day_i[order], n[order]
    first = np.r_[True, et[1:] != et[:-1]]
    prev = np.empty(len(n), dtype=np.float64)
    prev[0] = np.nan
    prev[1:] = n[:-1]
    prev[first] = np.nan
    growth = n / prev  # nan where prev is nan (first day per type)
    ep = np.datetime64("1970-01-01", "us")
    return pa.Table.from_pydict(
        {"event_type": pa.array(et.tolist(), pa.string()),
         "day": pa.array(ep + day_i * _DAY_US, pa.timestamp("us")),
         "n_events": pa.array(n, pa.int64()),
         "prev_events": pa.array(
             np.where(np.isnan(prev), 0, prev).astype(np.int64),
             pa.int64(), mask=np.isnan(prev)),
         "growth": pa.array(growth, pa.float64())}
    )


# -- CUBE grouping sets from one finest-grain pass -----------------------------

def events_cube(sf_dir: str, combine_limit: int = 2_000_000) -> pa.Table:
    """GROUP BY CUBE(event_type, day-of-week) counts — all four
    grouping sets derived from ONE finest-grain streamed pass (the
    revenue_rollup identity extended to the full cube): the exchange
    only ever carries types x 7 partial rows; marginals and the grand
    total are exact integer folds on the driver. Rolled-up dimensions
    surface as nulls, exactly like SQL CUBE.
    """
    _EMPTY = pa.Table.from_pydict(
        {"event_type": pa.array([], pa.string()),
         "dow": pa.array([], pa.int64()),
         "n": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        # duckdb EXTRACT(dow): Sunday=0; epoch day 0 was a Thursday(=4)
        dow = (_ts_us(batch.column("ts")) // _DAY_US + 4) % 7
        t = pa.Table.from_pydict(
            {"event_type": batch.column("event_type"),
             "dow": pa.array(dow, pa.int64()),
             "n": pa.array(np.ones(len(dow), dtype=np.int64))}
        )
        return t.group_by(["event_type", "dow"]).aggregate(
            [("n", "sum")]
        ).rename_columns(["event_type", "dow", "n"])

    ev = _read(sf_dir, "events", ["event_type", "ts"])
    partials = ev.map_batches(partial, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["event_type", "dow"], ["n"], combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby(["event_type", "dow"]).sum("n").take_all()
        )
    et = np.asarray(tbl.column("event_type").to_numpy(zero_copy_only=False),
                    dtype=object)
    dow = tbl.column("dow").to_numpy().astype(np.int64)
    n = tbl.column("sum(n)").to_numpy().astype(np.int64)
    order = np.lexsort((dow, et))  # deterministic across tiers
    et, dow, n = et[order], dow[order], n[order]

    rows_et: list = []
    rows_dow: list = []
    rows_n: list = []
    # finest grain
    for i in range(len(n)):
        rows_et.append(et[i]); rows_dow.append(int(dow[i])); rows_n.append(int(n[i]))
    # by type (dow rolled up)
    for t_name in sorted(set(et.tolist())):
        rows_et.append(t_name); rows_dow.append(None)
        rows_n.append(int(n[et == t_name].sum()))
    # by dow (type rolled up)
    for d in sorted(set(dow.tolist())):
        rows_et.append(None); rows_dow.append(int(d))
        rows_n.append(int(n[dow == d].sum()))
    # grand total
    rows_et.append(None); rows_dow.append(None); rows_n.append(int(n.sum()))
    return pa.Table.from_pydict(
        {"event_type": pa.array(rows_et, pa.string()),
         "dow": pa.array(rows_dow, pa.int64()),
         "n_events": pa.array(rows_n, pa.int64())}
    )


# -- distribution windows: cume_dist / percent_rank per type -------------------

def events_value_ranks(
    sf_dir: str, combine_limit: int = 2_000_000
) -> pa.Table:
    """Row-level ``cume_dist`` + ``percent_rank`` of each event's value
    within its type — the distribution-window shape (tie-STABLE, unlike
    ntile, so the output is deterministic under any row order).

    Pass 1 reduces events to per-(type, value) count partials — the
    exact_quantiles value-count discipline, O(distinct values) on the
    wire. The driver turns them into per-type sorted cumulative arrays
    (broadcast once); pass 2 is a pure map: two searchsorted probes per
    row and the two mirrored float divides
    (``cume = n_le / n``, ``pct = n_lt / (n - 1)``).
    """
    _EMPTY = pa.Table.from_pydict(
        {"event_type": pa.array([], pa.string()),
         "value": pa.array([], pa.float64()),
         "n": pa.array([], pa.int64())}
    )

    def counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        t = pa.Table.from_pydict(
            {"event_type": batch.column("event_type"),
             "value": batch.column("value"),
             "n": pa.array(np.ones(batch.num_rows, dtype=np.int64))}
        )
        return t.group_by(["event_type", "value"]).aggregate(
            [("n", "sum")]
        ).rename_columns(["event_type", "value", "n"])

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    partials = ev.map_batches(counts, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["event_type", "value"], ["n"],
                            combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby(["event_type", "value"]).sum("n").take_all()
        )
    et = np.asarray(tbl.column("event_type").to_numpy(zero_copy_only=False),
                    dtype=object)
    val = tbl.column("value").to_numpy(zero_copy_only=False)
    cnt = tbl.column("sum(n)").to_numpy().astype(np.int64)
    cdfs: dict[str, tuple] = {}
    for t_name in sorted(set(et.tolist())):
        m = et == t_name
        v = val[m]
        c = cnt[m]
        o = np.argsort(v, kind="stable")
        v, c = v[o], c[o]
        cum = np.cumsum(c)
        cdfs[t_name] = (v, cum, int(cum[-1]))
    cdf_ref = ray.put(cdfs)

    def score(batch: pa.Table) -> pa.Table:
        lut = ray.get(cdf_ref)
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        vals = batch.column("value").to_numpy(zero_copy_only=False)
        cume = np.empty(len(vals), dtype=np.float64)
        pct = np.empty(len(vals), dtype=np.float64)
        for t_name in np.unique(types):
            m = types == t_name
            v, cum, n = lut[t_name]
            le = np.searchsorted(v, vals[m], side="right")
            lt = np.searchsorted(v, vals[m], side="left")
            n_le = np.where(le > 0, cum[np.maximum(le - 1, 0)], 0)
            n_lt = np.where(lt > 0, cum[np.maximum(lt - 1, 0)], 0)
            cume[m] = n_le / n
            pct[m] = n_lt / (n - 1) if n > 1 else 0.0
        return pa.Table.from_pydict(
            {"event_id": batch.column("event_id"),
             "cume_dist": pa.array(cume, pa.float64()),
             "percent_rank": pa.array(pct, pa.float64())}
        )

    parts = [
        t for t in ray.get(
            ev.map_batches(score, batch_format="pyarrow")
            .materialize().to_arrow_refs()
        )
        if t.num_rows > 0
    ]
    if not parts:
        return pa.Table.from_pydict(
            {"event_id": pa.array([], pa.int64()),
             "cume_dist": pa.array([], pa.float64()),
             "percent_rank": pa.array([], pa.float64())}
        )
    return pa.concat_tables(parts).sort_by([("event_id", "ascending")])


# -- LEAD window: per-user event-type transition counts ------------------------

def _user_partitioned(sf_dir: str) -> "ray.data.Dataset":
    """The shared coarse-partition prep for the per-user run-scan
    queries (event_transitions, user_event_paths): events key rows
    with a ``part = hash(user) % 2*CPU`` column — ONE place owns the
    partitioning scheme so the two consumers can never desynchronize."""
    num_parts = 2 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        part = (users.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            num_parts
        )
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    return ds.map_batches(prep, batch_format="pyarrow")


def event_transitions(sf_dir: str, combine_limit: int = 2_000_000) -> pa.Table:
    """Markov transition counts over per-user event sequences — the
    LEAD window shape (``LEAD(type) OVER (PARTITION BY user ORDER BY
    ts, event_id)``), on the sessionize coarse-partition + key-runs
    pattern: ONE hash(user)%P key-row exchange, then each partition
    lexsorts its rows once and pairs every event with its successor
    inside the same user run — no per-user Python call, no per-user
    groupby. Each partition reduces to <=|types|^2 count partials.
    The (ts, event_id) sort key makes ties deterministic on both
    sides.
    """
    _EMPTY = pa.Table.from_pydict(
        {"from_type": pa.array([], pa.string()),
         "to_type": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())}
    )

    def trans_part(group: pa.Table) -> pa.Table:
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        if not len(users):
            return _EMPTY
        ts = _ts_us(group.column("ts"))
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = group.column("event_type").to_numpy(zero_copy_only=False)
        names, code = np.unique(types, return_inverse=True)
        order = np.lexsort((eid, ts, users))
        u_s, c_s = users[order], code[order]
        same_user = u_s[1:] == u_s[:-1]
        frm = c_s[:-1][same_user]
        to = c_s[1:][same_user]
        if not len(frm):
            return _EMPTY
        pair = frm * len(names) + to
        uniq, cnt = np.unique(pair, return_counts=True)
        return pa.Table.from_pydict(
            {"from_type": pa.array(names[uniq // len(names)].tolist(),
                                   pa.string()),
             "to_type": pa.array(names[uniq % len(names)].tolist(),
                                 pa.string()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    partials = (
        _user_partitioned(sf_dir)
        .groupby("part")
        .map_groups(
            lambda g: trans_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["from_type", "to_type"], ["n"],
                            combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby(["from_type", "to_type"]).sum("n").take_all()
        )
    out = pa.Table.from_pydict(
        {"from_type": tbl.column("from_type"),
         "to_type": tbl.column("to_type"),
         "n": tbl.column("sum(n)")}
    )
    return out.sort_by([("from_type", "ascending"), ("to_type", "ascending")])


# -- ordered string aggregation: per-user event paths --------------------------

def user_event_paths(
    sf_dir: str, combine_limit: int = 2_000_000
) -> pa.Table:
    """Funnel-path analysis — the ordered STRING_AGG shape: each
    user's time-ordered event-type path (``view>click>...``), counted
    per distinct path. Same coarse-partition run-scan as
    event_transitions (one hash(user)%P key-row exchange, one lexsort
    per partition); the per-partition path build joins type codes per
    user RUN (work bounded by users, not events), and each partition
    reduces to (path, n) count partials before the bounded global
    merge. (ts, event_id) pins tie order on both sides.
    """
    _EMPTY = pa.Table.from_pydict(
        {"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )

    def paths_part(group: pa.Table) -> pa.Table:
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        if not len(users):
            return _EMPTY
        ts = _ts_us(group.column("ts"))
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        types = np.asarray(
            group.column("event_type").to_numpy(zero_copy_only=False),
            dtype=object,
        )
        order = np.lexsort((eid, ts, users))
        u_s, t_s = users[order], types[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        ends = np.r_[starts[1:], len(u_s)]
        paths = [">".join(t_s[s:e]) for s, e in zip(starts, ends)]
        t = pa.Table.from_pydict(
            {"path": pa.array(paths, pa.string()),
             "n": pa.array(np.ones(len(paths), dtype=np.int64))}
        )
        return t.group_by("path").aggregate([("n", "sum")]).rename_columns(
            ["path", "n"]
        )

    partials = (
        _user_partitioned(sf_dir)
        .groupby("part")
        .map_groups(
            lambda g: paths_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["path"], ["n"], combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(partials.groupby("path").sum("n").take_all())
    out = pa.Table.from_pydict(
        {"path": tbl.column("path"), "n_users": tbl.column("sum(n)")}
    )
    return out.sort_by([("path", "ascending")])


# -- mergeable-moment statistics: correlation + per-group OLS trend -----------

def price_qty_correlation(sf_dir: str) -> pa.Table:
    """Pearson correlation + covariance of (l_quantity,
    l_extendedprice) — the MERGEABLE-MOMENT pattern at query level:
    each batch reduces to six integer moments (n, Σx, Σy, Σxy, Σx²,
    Σy²) in exact cents; the driver folds Python ints (arbitrary
    precision) and evaluates the closed forms with ONE defined float
    op order, mirrored verbatim by the oracle (never DuckDB's own
    corr(), whose internal algorithm is numerically different):

        corr = (n·Σxy − Σx·Σy) / (sqrt(n·Σxx − Σx²)·sqrt(n·Σyy − Σy²))
        cov  = (n·Σxy − Σx·Σy) / (n·n)            (population, $²)
    """
    # a product like y_c² reaches 1e14 per row, so a whole-block
    # np.sum would wrap int64 past ~90k rows (Ray's default batch is
    # the WHOLE block) — chunk the vectorized partial sums and fold
    # exact Python ints between chunks
    def _exact_sum(arr: np.ndarray, chunk: int = 32_768) -> int:
        return sum(
            int(np.sum(arr[i: i + chunk], dtype=np.int64))
            for i in range(0, len(arr), chunk)
        )

    def moments(batch: pa.Table) -> pa.Table:
        x = _cents(batch.column("l_quantity"))
        y = _cents(batch.column("l_extendedprice"))
        # per-block partials ship as DECIMAL STRINGS: a whole-block
        # Σy² can itself exceed int64 (measured 2.2e19 at sf0.1), so
        # no fixed-width column is safe; one short string per block
        # costs nothing and the driver folds arbitrary-precision ints
        return pa.Table.from_pydict(
            {"n": pa.array([len(x)], pa.int64()),
             "sx": pa.array([str(_exact_sum(x))], pa.string()),
             "sy": pa.array([str(_exact_sum(y))], pa.string()),
             "sxy": pa.array([str(_exact_sum(x * y))], pa.string()),
             "sxx": pa.array([str(_exact_sum(x * x))], pa.string()),
             "syy": pa.array([str(_exact_sum(y * y))], pa.string())}
        )

    li = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    rows = li.map_batches(moments, batch_format="pyarrow").take_all()
    n = sum(int(r["n"]) for r in rows)
    if n == 0:  # mirror the oracle: aggregates over nothing are NULL
        return pa.Table.from_pydict(
            {"corr_qty_price": pa.array([None], pa.float64()),
             "cov_qty_price": pa.array([None], pa.float64())}
        )
    sx = sum(int(r["sx"]) for r in rows)
    sy = sum(int(r["sy"]) for r in rows)
    sxy = sum(int(r["sxy"]) for r in rows)
    sxx = sum(int(r["sxx"]) for r in rows)
    syy = sum(int(r["syy"]) for r in rows)
    num = float(n * sxy - sx * sy)
    corr = num / (
        np.sqrt(float(n * sxx - sx * sx)) * np.sqrt(float(n * syy - sy * sy))
    )
    cov = num / float(n) / float(n) / 10000.0  # cents² -> $²
    return pa.Table.from_pydict(
        {"corr_qty_price": pa.array([corr], pa.float64()),
         "cov_qty_price": pa.array([cov], pa.float64())}
    )


def events_trend(sf_dir: str, combine_limit: int = 2_000_000) -> pa.Table:
    """Per-event-type OLS trend of value over time (slope in value
    units per DAY + intercept at day 0) — grouped mergeable moments:
    each batch emits per-type integer moment partials over (day index,
    value cents); one bounded merge; the driver evaluates

        slope     = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)
        intercept = (Σy − slope·Σx) / n

    with the float op order mirrored by the oracle's integer-sum CTE.
    Day indexing from the epoch keeps x small enough that every
    product stays far inside int64 at block scale; the driver fold is
    arbitrary-precision Python ints.
    """
    _EMPTY = pa.Table.from_pydict(
        {"event_type": pa.array([], pa.string()),
         **{c: pa.array([], pa.int64())
            for c in ("n", "sx", "sy", "sxy", "sxx")}}
    )

    def moments(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        day = _ts_us(batch.column("ts")) // _DAY_US
        # events.value is NOT 2-decimal (NOTES_r3), so exact .5-cent
        # ties are possible: mirror DuckDB round() (half AWAY from
        # zero; values are non-negative here), not np.rint's
        # half-to-even
        v = batch.column("value").to_numpy(zero_copy_only=False)
        val_c = np.floor(v * 100 + 0.5).astype(np.int64)
        t = pa.Table.from_pydict(
            {"event_type": batch.column("event_type"),
             "n": pa.array(np.ones(len(day), dtype=np.int64)),
             "sx": pa.array(day, pa.int64()),
             "sy": pa.array(val_c, pa.int64()),
             "sxy": pa.array(day * val_c, pa.int64()),
             "sxx": pa.array(day * day, pa.int64())}
        )
        return t.group_by("event_type").aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx")]
        ).rename_columns(["event_type", "n", "sx", "sy", "sxy", "sxx"])

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])
    partials = ev.map_batches(moments, batch_format="pyarrow")
    cols = ["n", "sx", "sy", "sxy", "sxx"]
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["event_type"], cols, combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby("event_type").sum(cols).take_all()
        )
    et = tbl.column("event_type").to_pylist()
    n = tbl.column("sum(n)").to_numpy().astype(object)
    sx = tbl.column("sum(sx)").to_numpy().astype(object)
    sy = tbl.column("sum(sy)").to_numpy().astype(object)
    sxy = tbl.column("sum(sxy)").to_numpy().astype(object)
    sxx = tbl.column("sum(sxx)").to_numpy().astype(object)
    order = np.argsort(np.asarray(et, dtype=object), kind="stable")
    out_t, out_s, out_i = [], [], []
    for idx in order:
        num = float(n[idx] * sxy[idx] - sx[idx] * sy[idx])
        den = float(n[idx] * sxx[idx] - sx[idx] * sx[idx])
        out_t.append(et[idx])
        if den == 0.0:  # one distinct day: DuckDB x/0.0 is NULL
            out_s.append(None)
            out_i.append(None)
            continue
        slope = num / den / 100.0                      # cents/day -> $/day
        intercept = (float(sy[idx]) - (num / den) * float(sx[idx])) \
            / float(n[idx]) / 100.0
        out_s.append(slope)
        out_i.append(intercept)
    return pa.Table.from_pydict(
        {"event_type": pa.array(out_t, pa.string()),
         "slope_per_day": pa.array(out_s, pa.float64()),
         "intercept": pa.array(out_i, pa.float64())}
    )


# -- market-basket frequent pair mining ----------------------------------------

_FIP_EMPTY = pa.Table.from_pydict(
    {
        "part_a": pa.array([], pa.int64()),
        "part_b": pa.array([], pa.int64()),
        "support": pa.array([], pa.int64()),
    }
)


def frequent_item_pairs(
    sf_dir: str,
    min_support: int = 2,
    max_basket: int = 4096,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """Frequent part PAIRS across order baskets (the Apriori level-2
    candidate set / association-rule numerator): (part_a < part_b,
    support = orders containing both), support >= ``min_support``.

    The butterfly_count machinery pointed at baskets: an order's
    distinct parts co-locate in ONE hash(order)-bucketed exchange,
    pair emission is vectorized across basket runs (repeat/arange),
    mega-baskets past ``max_basket`` distinct parts drop WHOLE
    (mirrored by the oracle's HAVING; a d-item basket alone emits
    C(d,2) pairs). Packed pair counts pre-combine per group; under
    ``combine_limit`` the driver merges and thresholds, past it a Ray
    groupby(pk).sum merges and the threshold filters DISTRIBUTED — the
    driver only ever holds qualifying pairs (true output size), the
    ngram_jaccard contract.
    """
    from .io import read_parquet_clean
    from .joins import default_num_buckets, int_key_buckets

    num_parts = default_num_buckets()
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def local_distinct(batch: pa.Table) -> pa.Table:
        o = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        key = np.unique(np.stack([o, p], axis=1), axis=0)
        return pa.Table.from_pydict(
            {
                "o": pa.array(key[:, 0], pa.int64()),
                "p": pa.array(key[:, 1], pa.int64()),
                "bucket": pa.array(int_key_buckets(key[:, 0], num_parts)),
            }
        )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        o = group.column("o").to_numpy(zero_copy_only=False)
        p = group.column("p").to_numpy(zero_copy_only=False)
        key = np.unique(np.stack([o, p], axis=1), axis=0)
        o, p = key[:, 0], key[:, 1]
        if len(p) and ((p < 0).any() or (p >= 1 << 31).any()):
            raise ValueError(
                "frequent_item_pairs: partkey outside packable domain"
            )
        empty = pa.Table.from_pydict(
            {"pk": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        n = len(o)
        if not n:
            return empty
        new_run = np.concatenate(([True], o[1:] != o[:-1]))
        run_start_idx = np.nonzero(new_run)[0]
        run_len = np.diff(np.r_[run_start_idx, n])
        keep_run = (run_len >= 2) & (run_len <= max_basket)
        keep_row = np.repeat(keep_run, run_len)
        o, p = o[keep_row], p[keep_row]
        n = len(o)
        if not n:
            return empty
        new_run = np.concatenate(([True], o[1:] != o[:-1]))
        run_start_idx = np.nonzero(new_run)[0]
        run_id = np.cumsum(new_run) - 1
        starts = run_start_idx[run_id]
        pos = np.arange(n, dtype=np.int64) - starts
        total = int(pos.sum())
        if not total:
            return empty
        jj = np.repeat(np.arange(n, dtype=np.int64), pos)
        block_off = np.cumsum(pos) - pos
        ii = (
            np.arange(total, dtype=np.int64)
            - np.repeat(block_off, pos)
            + np.repeat(starts, pos)
        )
        u, v = p[ii], p[jj]  # p sorted within run -> u < v
        pk = (u << np.int64(32)) | v
        uniq, cnt = np.unique(pk, return_counts=True)
        return pa.Table.from_pydict(
            {
                "pk": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: pairs_in_bucket(
                g.sort_by([("o", "ascending"), ("p", "ascending")])
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def unpack(pk: np.ndarray, cnt: np.ndarray) -> pa.Table:
        keep = cnt >= min_support
        pk, cnt = pk[keep], cnt[keep]
        order = np.argsort(pk, kind="stable")  # (a, b) lexicographic
        pk, cnt = pk[order], cnt[order]
        return pa.Table.from_pydict(
            {
                "part_a": pa.array(pk >> np.int64(32), pa.int64()),
                "part_b": pa.array(pk & np.int64(0xFFFFFFFF), pa.int64()),
                "support": pa.array(cnt, pa.int64()),
            }
        )

    tbl = _combine_partials(
        partials, ["pk"], ["n"], combine_limit=combine_limit
    )
    if tbl is not None:
        return unpack(
            tbl.column("pk").to_numpy(zero_copy_only=False),
            tbl.column("sum(n)").to_numpy(zero_copy_only=False),
        )

    # over-budget: keyed merge + DISTRIBUTED threshold — only
    # qualifying pairs (true output size) reach the driver
    merged = partials.groupby("pk").sum("n")

    def thresh(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("sum(n)"), min_support)
        )

    parts = [
        t
        for t in ray.get(
            merged.map_batches(thresh, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return _FIP_EMPTY
    allq = pa.concat_tables(parts)
    return unpack(
        allq.column("pk").to_numpy(zero_copy_only=False),
        allq.column("sum(n)").to_numpy(zero_copy_only=False),
    )
