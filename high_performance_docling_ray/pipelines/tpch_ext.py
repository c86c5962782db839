"""Remaining TPC-H shapes the test schema can express (Q8, Q13, Q15,
Q17, Q19, Q21, Q22 — adapted where the schema lacks a column such as
``partsupp``/``c_phone``/``l_commitdate``; each docstring states the
adaptation).

Execution follows the house pattern established in ``relational.py`` /
``analytics.py``:

* small build sides are read driver-direct (``_broadcast_parquet``),
  collapsed to sorted numpy arrays or dense LUTs and ``ray.put`` once;
* the big side (lineitem / orders) STREAMS through ``map_batches``
  with vectorized numpy/pyarrow kernels, emitting key-only partial
  rows;
* partials merge via ``_combine_partials`` (one driver C++ group_by)
  under a row budget with the Ray groupby shuffle as the
  any-cardinality fallback (tier equality is test-pinned);
* money math is exact int64 cents (products at scale 1e4) so sums are
  order-independent and bit-stable vs the DuckDB oracle; ratio /
  average outputs divide the two exact integer sums with the SAME
  float op order as the SQL.

New distributed shapes covered here (beyond the r2 set):

* Q13 — outer-join count DISTRIBUTION (customers with zero matches
  materialize as the ``n_cust - matched`` bucket, never as rows);
* Q15 — global-argmax winner set over a streamed aggregate;
* Q17 — correlated per-key average as a two-pass broadcast (integer
  cross-multiplied predicate: ``qty*5*cnt < sum`` avoids floats);
* Q19 — disjunction-of-conjunctions predicate pushed into one scan;
* Q21 — big-table SELF-join resolved as a two-level aggregate
  ((order,supp) max-shipdate rows -> per-order strict-argmax winner),
  with a fully distributed ``map_groups`` tier past the budget;
* Q22 — scalar-subquery threshold + ANTI-join against a streamed
  "active since cutoff" key set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .relational import (
    _broadcast_parquet,
    _cents,
    _combine_partials,
    _read,
    _sorted_member_mask,
)


from .analytics import _ts_us  # noqa: E402  (shared us-int64 helper)


def _us(date: str) -> int:
    return int(np.datetime64(date, "us").astype(np.int64))


# -- q8: national market share -----------------------------------------------

def q8_market_share(
    sf_dir: str,
    region: str = "ASIA",
    nation: str = "NATION_7",
    year_lo: int = 1996,
    year_hi: int = 1998,
) -> pa.Table:
    """TPC-H Q8 shape (adapted: no partsupp/p_type join — every part
    qualifies): per order-year, the revenue share delivered by
    suppliers of one nation into one region's customer market.

    Build sides: orders filtered to the year window AND to customers
    of the region (customer->nation->region LUT chain applied on the
    driver BEFORE the broadcast, so the shipped arrays shrink to the
    qualifying window); supplier -> "is target nation" bool LUT.
    Probe lineitem emits two int64 partials per year (total_e4,
    nation_e4); the share division happens once on <=|years| rows.
    """
    lo, hi = _us(f"{year_lo}-01-01"), _us(f"{year_hi}-01-01")
    nat = _broadcast_parquet(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    reg = _broadcast_parquet(sf_dir, "region", ["r_regionkey", "r_name"])
    rkey = reg.column("r_regionkey").to_numpy().astype(np.int64)
    rname = reg.column("r_name").to_numpy(zero_copy_only=False)
    target_region = int(rkey[rname == region][0])
    nkey = nat.column("n_nationkey").to_numpy().astype(np.int64)
    nname = nat.column("n_name").to_numpy(zero_copy_only=False)
    nregion = nat.column("n_regionkey").to_numpy().astype(np.int64)
    region_nations = set(nkey[nregion == target_region].tolist())
    target_nation = int(nkey[nname == nation][0])

    cust = _broadcast_parquet(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    ckey = cust.column("c_custkey").to_numpy().astype(np.int64)
    cnat = cust.column("c_nationkey").to_numpy().astype(np.int64)
    in_region_cust = ckey[np.isin(cnat, list(region_nations))]
    in_region_cust.sort()

    orders = _broadcast_parquet(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    )
    odate = _ts_us(orders.column("o_orderdate"))
    okey = orders.column("o_orderkey").to_numpy().astype(np.int64)
    ocust = orders.column("o_custkey").to_numpy().astype(np.int64)
    win = (
        (odate >= lo)
        & (odate < hi)
        & _sorted_member_mask(in_region_cust, ocust)
    )
    okey, odate = okey[win], odate[win]
    oyear = odate.astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64) + 1970
    order_sort = np.argsort(okey, kind="stable")
    okey_s, oyear_s = okey[order_sort], oyear[order_sort]

    supp = _broadcast_parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    skey = supp.column("s_suppkey").to_numpy().astype(np.int64)
    snat = supp.column("s_nationkey").to_numpy().astype(np.int64)
    s_target = np.zeros(int(skey.max()) + 1, dtype=bool)
    s_target[skey[snat == target_nation]] = True
    build_ref = ray.put((okey_s, oyear_s, s_target))

    _EMPTY = pa.Table.from_pydict(
        {"o_year": pa.array([], pa.int64()),
         "total_e4": pa.array([], pa.int64()),
         "nation_e4": pa.array([], pa.int64())}
    )

    def probe(batch: pa.Table) -> pa.Table:
        keys_s, year_s, target = ray.get(build_ref)
        lkey = batch.column("l_orderkey").to_numpy().astype(np.int64)
        mask = _sorted_member_mask(keys_s, lkey)
        if not mask.any():
            return _EMPTY
        yr = year_s[np.searchsorted(keys_s, lkey[mask])]
        lsupp = batch.column("l_suppkey").to_numpy().astype(np.int64)[mask]
        base_c = _cents(batch.column("l_extendedprice"))[mask]
        disc_c = _cents(batch.column("l_discount"))[mask]
        rev = base_c * (100 - disc_c)
        is_t = (lsupp < len(target)) & target[np.minimum(lsupp, len(target) - 1)]
        t = pa.Table.from_pydict(
            {"o_year": pa.array(yr, pa.int64()),
             "total_e4": pa.array(rev, pa.int64()),
             "nation_e4": pa.array(np.where(is_t, rev, 0), pa.int64())}
        )
        return t.group_by("o_year").aggregate(
            [("total_e4", "sum"), ("nation_e4", "sum")]
        ).rename_columns(["o_year", "total_e4", "nation_e4"])

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    partials = li.map_batches(probe, batch_format="pyarrow")
    # <=|years| keys: always fits the driver combine
    tbl = _combine_partials(partials, ["o_year"], ["total_e4", "nation_e4"])
    yr = tbl.column("o_year").to_numpy().astype(np.int64)
    tot = tbl.column("sum(total_e4)").to_numpy().astype(np.int64)
    natv = tbl.column("sum(nation_e4)").to_numpy().astype(np.int64)
    order = np.argsort(yr, kind="stable")
    # same float op order as the oracle: DOUBLE-of-dollars division of
    # the two exact DECIMAL-scale-4 sums (the q14 discipline)
    share = (natv[order] / 10000.0) / (tot[order] / 10000.0)
    return pa.Table.from_pydict(
        {"o_year": pa.array(yr[order], pa.int64()),
         "mkt_share": pa.array(share, pa.float64())}
    )


# -- q13: customer order-count distribution -----------------------------------

def q13_customer_distribution(
    sf_dir: str,
    priority: str = "1-URGENT",
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """TPC-H Q13 shape (adapted: no o_comment — the join-side filter is
    ``o_orderpriority = priority``): the distribution of per-customer
    order counts INCLUDING customers with zero qualifying orders.

    The left-outer join never materializes: orders stream and emit
    (custkey, n) partials; the zero bucket is ``n_customers - matched``
    computed from the customer key array (membership-checked so a
    dangling o_custkey cannot inflate a bucket). The distribution
    itself is a driver bincount over <=n_customers counts.
    """
    cust = _broadcast_parquet(sf_dir, "customer", ["c_custkey"])
    ckey_s = np.sort(cust.column("c_custkey").to_numpy().astype(np.int64))
    ck_ref = ray.put(ckey_s)

    _EMPTY = pa.Table.from_pydict(
        {"c_custkey": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(ck_ref)
        prio = batch.column("o_orderpriority").to_numpy(zero_copy_only=False)
        ocust = batch.column("o_custkey").to_numpy().astype(np.int64)
        mask = (prio == priority) & _sorted_member_mask(keys, ocust)
        if not mask.any():
            return _EMPTY
        t = pa.Table.from_pydict(
            {"c_custkey": pa.array(ocust[mask], pa.int64()),
             "n": pa.array(np.ones(int(mask.sum()), dtype=np.int64))}
        )
        return t.group_by("c_custkey").aggregate([("n", "sum")]).rename_columns(
            ["c_custkey", "n"]
        )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    partials = orders.map_batches(partial, batch_format="pyarrow")
    tbl = _combine_partials(partials, ["c_custkey"], ["n"], combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(partials.groupby("c_custkey").sum("n").take_all())
    counts = tbl.column("sum(n)").to_numpy().astype(np.int64)
    matched = tbl.num_rows
    zero_bucket = len(ckey_s) - matched
    dist = np.bincount(counts) if len(counts) else np.zeros(1, dtype=np.int64)
    dist = dist.astype(np.int64)
    if len(dist) == 0:
        dist = np.zeros(1, dtype=np.int64)
    dist[0] = zero_bucket
    c_count = np.flatnonzero(dist > 0).astype(np.int64)
    custdist = dist[c_count]
    order = np.lexsort((-c_count, -custdist))
    return pa.Table.from_pydict(
        {"c_count": pa.array(c_count[order], pa.int64()),
         "custdist": pa.array(custdist[order], pa.int64())}
    )


# -- q15: top supplier by quarterly revenue -----------------------------------

def q15_top_supplier(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """TPC-H Q15 shape: supplier(s) whose quarter revenue equals the
    global maximum (the view + scalar-max subquery collapses to one
    streamed per-suppkey aggregate followed by a driver argmax over
    <=|suppliers| rows; ties all surface, exactly like the SQL).
    """
    lo, hi = _us(date_lo), _us(date_hi)

    _EMPTY = pa.Table.from_pydict(
        {"l_suppkey": pa.array([], pa.int64()),
         "rev_e4": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        ship = _ts_us(batch.column("l_shipdate"))
        mask = (ship >= lo) & (ship < hi)
        if not mask.any():
            return _EMPTY
        supp = batch.column("l_suppkey").to_numpy().astype(np.int64)[mask]
        base_c = _cents(batch.column("l_extendedprice"))[mask]
        disc_c = _cents(batch.column("l_discount"))[mask]
        t = pa.Table.from_pydict(
            {"l_suppkey": pa.array(supp, pa.int64()),
             "rev_e4": pa.array(base_c * (100 - disc_c), pa.int64())}
        )
        return t.group_by("l_suppkey").aggregate([("rev_e4", "sum")]).rename_columns(
            ["l_suppkey", "rev_e4"]
        )

    li = _read(
        sf_dir, "lineitem",
        ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    partials = li.map_batches(partial, batch_format="pyarrow")
    tbl = _combine_partials(partials, ["l_suppkey"], ["rev_e4"], combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby("l_suppkey").sum("rev_e4").take_all()
        )
    supp = tbl.column("l_suppkey").to_numpy().astype(np.int64)
    rev = tbl.column("sum(rev_e4)").to_numpy().astype(np.int64)
    if len(rev) == 0:
        return pa.Table.from_pydict(
            {"s_suppkey": pa.array([], pa.int64()),
             "s_name": pa.array([], pa.string()),
             "total_revenue": pa.array([], pa.float64())}
        )
    winners = rev == rev.max()
    wk, wr = supp[winners], rev[winners]
    order = np.argsort(wk, kind="stable")
    wk, wr = wk[order], wr[order]
    stbl = _broadcast_parquet(sf_dir, "supplier", ["s_suppkey", "s_name"])
    skey = stbl.column("s_suppkey").to_numpy().astype(np.int64)
    sname = stbl.column("s_name").to_numpy(zero_copy_only=False)
    pos = {int(k): i for i, k in enumerate(skey)}
    names = [str(sname[pos[int(k)]]) for k in wk]
    return pa.Table.from_pydict(
        {"s_suppkey": pa.array(wk, pa.int64()),
         "s_name": pa.array(names, pa.string()),
         "total_revenue": pa.array(wr / 10000.0, pa.float64())}
    )


# -- q17: small-quantity-order revenue ----------------------------------------

def q17_small_quantity_revenue(
    sf_dir: str,
    brand: str = "Brand#13",
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """TPC-H Q17 shape (adapted: no p_container — the part filter is
    brand only): yearly-average revenue lost if small-quantity orders
    (below 20% of the part's average quantity) were not taken.

    The correlated scalar subquery becomes TWO streamed passes over
    lineitem restricted to the brand's partkeys: pass 1 aggregates
    (sum_qty_cents, cnt) per partkey; pass 2 filters with the
    cross-multiplied integer predicate ``qty_c * 5 * cnt < sum_qty_c``
    (exactly ``qty < 0.2 * avg`` with zero float math — the oracle
    mirrors the same integers) and reduces to one scalar.
    """
    part = _broadcast_parquet(sf_dir, "part", ["p_partkey", "p_brand"])
    pkey = part.column("p_partkey").to_numpy().astype(np.int64)
    pbrand = part.column("p_brand").to_numpy(zero_copy_only=False)
    brand_keys = np.sort(pkey[pbrand == brand])
    bk_ref = ray.put(brand_keys)

    _EMPTY1 = pa.Table.from_pydict(
        {"l_partkey": pa.array([], pa.int64()),
         "sq": pa.array([], pa.int64()),
         "cnt": pa.array([], pa.int64())}
    )

    def pass1(batch: pa.Table) -> pa.Table:
        keys = ray.get(bk_ref)
        lpart = batch.column("l_partkey").to_numpy().astype(np.int64)
        mask = _sorted_member_mask(keys, lpart)
        if not mask.any():
            return _EMPTY1
        qty_c = _cents(batch.column("l_quantity"))[mask]
        t = pa.Table.from_pydict(
            {"l_partkey": pa.array(lpart[mask], pa.int64()),
             "sq": pa.array(qty_c, pa.int64()),
             "cnt": pa.array(np.ones(len(qty_c), dtype=np.int64))}
        )
        return t.group_by("l_partkey").aggregate(
            [("sq", "sum"), ("cnt", "sum")]
        ).rename_columns(["l_partkey", "sq", "cnt"])

    li_cols1 = ["l_partkey", "l_quantity"]
    partials = _read(sf_dir, "lineitem", li_cols1).map_batches(
        pass1, batch_format="pyarrow"
    )
    stats = _combine_partials(partials, ["l_partkey"], ["sq", "cnt"], combine_limit)
    if stats is None:
        stats = pa.Table.from_pylist(
            partials.groupby("l_partkey").sum(["sq", "cnt"]).take_all()
        )
    pk = stats.column("l_partkey").to_numpy().astype(np.int64)
    sq = stats.column("sum(sq)").to_numpy().astype(np.int64)
    cnt = stats.column("sum(cnt)").to_numpy().astype(np.int64)
    order = np.argsort(pk, kind="stable")
    stats_ref = ray.put((pk[order], sq[order], cnt[order]))

    def pass2(batch: pa.Table) -> pa.Table:
        pk_s, sq_s, cnt_s = ray.get(stats_ref)
        lpart = batch.column("l_partkey").to_numpy().astype(np.int64)
        mask = _sorted_member_mask(pk_s, lpart)
        if not mask.any():
            return pa.Table.from_pydict({"rev_c": pa.array([0], pa.int64())})
        pos = np.searchsorted(pk_s, lpart[mask])
        qty_c = _cents(batch.column("l_quantity"))[mask]
        small = qty_c * 5 * cnt_s[pos] < sq_s[pos]
        base_c = _cents(batch.column("l_extendedprice"))[mask][small]
        return pa.Table.from_pydict(
            {"rev_c": pa.array([int(base_c.sum())], pa.int64())}
        )

    li2 = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    parts = li2.map_batches(pass2, batch_format="pyarrow").take_all()
    total_c = sum(int(r["rev_c"]) for r in parts)
    return pa.Table.from_pydict(
        {"avg_yearly": pa.array([total_c / 100.0 / 7.0], pa.float64())}
    )


# -- q19: disjunctive brand/size/quantity revenue ------------------------------

_Q19_BRANCHES = (
    # (brand, size_lo, size_hi, qty_lo, qty_hi) — quantities in cents
    ("Brand#12", 1, 5, 100, 1100),
    ("Brand#14", 1, 10, 1000, 2000),
    ("Brand#16", 1, 15, 2000, 3000),
)


def q19_disjunctive_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19 shape (adapted: no shipmode/shipinstruct — branches
    filter on brand + size + quantity band only): revenue under a
    disjunction of three conjunctive part/line predicates, pushed into
    ONE lineitem scan. Part attributes come from two dense driver LUTs
    (brand id, size) so each branch is a pure vectorized mask.
    """
    part = _broadcast_parquet(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    pkey = part.column("p_partkey").to_numpy().astype(np.int64)
    pbrand = part.column("p_brand").to_numpy(zero_copy_only=False)
    psize = part.column("p_size").to_numpy().astype(np.int64)
    n = int(pkey.max()) + 1
    brand_names = sorted({b for b, *_ in _Q19_BRANCHES})
    bid = {b: i for i, b in enumerate(brand_names)}
    brand_lut = np.full(n, -1, dtype=np.int8)
    size_lut = np.zeros(n, dtype=np.int64)
    for name, i in bid.items():
        brand_lut[pkey[pbrand == name]] = i
    size_lut[pkey] = psize
    branches = [
        (bid[b], slo, shi, qlo, qhi) for b, slo, shi, qlo, qhi in _Q19_BRANCHES
    ]
    lut_ref = ray.put((brand_lut, size_lut, branches))

    def partial(batch: pa.Table) -> pa.Table:
        blut, slut, brs = ray.get(lut_ref)
        lpart = batch.column("l_partkey").to_numpy().astype(np.int64)
        ok = (lpart >= 0) & (lpart < len(blut))
        b = np.where(ok, blut[np.minimum(lpart, len(blut) - 1)], -1)
        s = np.where(ok, slut[np.minimum(lpart, len(slut) - 1)], 0)
        qty_c = _cents(batch.column("l_quantity"))
        mask = np.zeros(len(lpart), dtype=bool)
        for bi, slo, shi, qlo, qhi in brs:
            mask |= (b == bi) & (s >= slo) & (s <= shi) & (qty_c >= qlo) & (qty_c <= qhi)
        base_c = _cents(batch.column("l_extendedprice"))[mask]
        disc_c = _cents(batch.column("l_discount"))[mask]
        rev = int(np.sum(base_c * (100 - disc_c), dtype=np.int64))
        return pa.Table.from_pydict({"rev_e4": pa.array([rev], pa.int64())})

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    parts = li.map_batches(partial, batch_format="pyarrow").take_all()
    total = sum(int(r["rev_e4"]) for r in parts)
    return pa.Table.from_pydict(
        {"revenue": pa.array([total / 10000.0], pa.float64())}
    )


# -- q21: suppliers who shipped an order's last line --------------------------

def _q21_winners_from_arrays(
    okey: np.ndarray, supp: np.ndarray, ms: np.ndarray
) -> np.ndarray:
    """Per-order strict-argmax resolution over (orderkey, suppkey,
    max_shipdate) rows: the winner is the unique supplier holding the
    order's max shipdate, in orders with >=2 distinct suppliers.
    Returns the winner suppkey array (one per qualifying order)."""
    if len(okey) == 0:
        return np.empty(0, dtype=np.int64)
    order = np.lexsort((supp, okey))
    okey, supp, ms = okey[order], supp[order], ms[order]
    starts = np.flatnonzero(np.r_[True, okey[1:] != okey[:-1]])
    seg = np.cumsum(np.r_[True, okey[1:] != okey[:-1]]) - 1
    nsupp = np.diff(np.r_[starts, len(okey)])
    mx = np.maximum.reduceat(ms, starts)
    at_max = ms == mx[seg]
    n_at_max = np.add.reduceat(at_max.astype(np.int64), starts)
    win_rows = at_max & (n_at_max[seg] == 1) & (nsupp[seg] >= 2)
    return supp[win_rows]


def q21_waiting_suppliers(
    sf_dir: str,
    k: int = 10,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """TPC-H Q21 shape (adapted: no commit/receipt dates — "kept the
    order waiting" becomes "was the STRICTLY last supplier to ship a
    line of a finished multi-supplier order"): count such orders per
    supplier, top-k by (numwait desc, s_name).

    The big-table self-join collapses to a two-level aggregate: pass 1
    streams lineitem (restricted to status-'F' orders via a dense
    driver LUT) emitting (orderkey, suppkey, max_ship) partials; level
    2 resolves each order's strict argmax. In budget the resolution is
    one driver lexsort + segmented reduce; past it, the SAME kernel
    runs inside ``groupby(l_orderkey).map_groups`` — tier equality is
    test-pinned. The final per-supplier count is <=|suppliers| rows.
    """
    orders = _broadcast_parquet(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    okey = orders.column("o_orderkey").to_numpy().astype(np.int64)
    ostat = orders.column("o_orderstatus").to_numpy(zero_copy_only=False)
    f_lut = np.zeros(int(okey.max()) + 1, dtype=bool)
    f_lut[okey[ostat == "F"]] = True
    lut_ref = ray.put(f_lut)

    _EMPTY = pa.Table.from_pydict(
        {"l_orderkey": pa.array([], pa.int64()),
         "l_suppkey": pa.array([], pa.int64()),
         "ms": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        lkey = batch.column("l_orderkey").to_numpy().astype(np.int64)
        mask = (lkey >= 0) & (lkey < len(lut)) & lut[np.minimum(lkey, len(lut) - 1)]
        if not mask.any():
            return _EMPTY
        t = pa.Table.from_pydict(
            {"l_orderkey": pa.array(lkey[mask], pa.int64()),
             "l_suppkey": pa.array(
                 batch.column("l_suppkey").to_numpy().astype(np.int64)[mask],
                 pa.int64()),
             "ms": pa.array(_ts_us(batch.column("l_shipdate"))[mask], pa.int64())}
        )
        return t.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("ms", "max")]
        ).rename_columns(["l_orderkey", "l_suppkey", "ms"])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    partials = li.map_batches(partial, batch_format="pyarrow")
    tbl = _combine_partials(
        partials, ["l_orderkey", "l_suppkey"], ["ms"], combine_limit, agg="max"
    )
    if tbl is not None:
        winners = _q21_winners_from_arrays(
            tbl.column("l_orderkey").to_numpy().astype(np.int64),
            tbl.column("l_suppkey").to_numpy().astype(np.int64),
            tbl.column("max(ms)").to_numpy().astype(np.int64),
        )
        wk, wc = np.unique(winners, return_counts=True)
    else:
        per = partials.groupby(["l_orderkey", "l_suppkey"]).max("ms")
        # resolve per-order winners in BUCKETED groups (hash(order)%P):
        # a groupby(l_orderkey).map_groups would pay one Python call
        # per distinct order (millions when this tier triggers); the
        # winner kernel already handles multi-order input, so ~4*CPU
        # vectorized calls suffice — the _edges_dataset discipline
        from .joins import default_num_buckets, int_key_buckets

        nb = default_num_buckets()

        def add_bucket(batch: pa.Table) -> pa.Table:
            ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            return batch.append_column(
                "bucket",
                pa.array(int_key_buckets(ok.astype(np.int64), nb), pa.int32()),
            )

        def resolve(group: pa.Table) -> pa.Table:
            w = _q21_winners_from_arrays(
                group.column("l_orderkey").to_numpy().astype(np.int64),
                group.column("l_suppkey").to_numpy().astype(np.int64),
                group.column("max(ms)").to_numpy().astype(np.int64),
            )
            return pa.Table.from_pydict(
                {"l_suppkey": pa.array(w, pa.int64()),
                 "n": pa.array(np.ones(len(w), dtype=np.int64))}
            )

        wins = (
            per.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(
                lambda g: resolve(g.drop_columns(["bucket"])),
                batch_format="pyarrow",
            )
        )
        counts = _combine_partials(wins, ["l_suppkey"], ["n"])
        wk = counts.column("l_suppkey").to_numpy().astype(np.int64)
        wc = counts.column("sum(n)").to_numpy().astype(np.int64)

    stbl = _broadcast_parquet(sf_dir, "supplier", ["s_suppkey", "s_name"])
    skey = stbl.column("s_suppkey").to_numpy().astype(np.int64)
    sname = stbl.column("s_name").to_numpy(zero_copy_only=False)
    pos = {int(s): i for i, s in enumerate(skey)}
    names = np.array([str(sname[pos[int(s)]]) for s in wk], dtype=object)
    order = np.lexsort((names, -wc))[:k]
    return pa.Table.from_pydict(
        {"s_name": pa.array(names[order].tolist(), pa.string()),
         "numwait": pa.array(wc[order], pa.int64())}
    )


# -- q22: dormant high-balance customers --------------------------------------

def q22_dormant_customers(
    sf_dir: str,
    nations: tuple[str, ...] = ("NATION_2", "NATION_7", "NATION_12"),
    cutoff: str = "2001-01-01",
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """TPC-H Q22 shape (adapted: no c_phone — the "country code" group
    is the customer's nation, and "never ordered" becomes "no order
    since ``cutoff``" so the anti-join is non-trivially selective):
    per nation, count + total balance of customers whose balance
    exceeds the positive-balance average and who placed no recent
    order.

    The scalar average is resolved on the driver with the
    cross-multiplied integer predicate ``bal_c * n > sum_c`` (no float
    threshold). Orders stream and emit the DISTINCT candidate custkeys
    seen past the cutoff (block-distinct key rows); the anti-join is a
    sorted-membership mask over the candidate array.
    """
    cut = _us(cutoff)
    nat = _broadcast_parquet(sf_dir, "nation", ["n_nationkey", "n_name"])
    nkey = nat.column("n_nationkey").to_numpy().astype(np.int64)
    nname = nat.column("n_name").to_numpy(zero_copy_only=False)
    sel = np.isin(nname, list(nations))
    nat_keys = set(nkey[sel].tolist())
    name_of = {int(k): str(v) for k, v in zip(nkey[sel], nname[sel])}

    cust = _broadcast_parquet(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    )
    ckey = cust.column("c_custkey").to_numpy().astype(np.int64)
    cnat = cust.column("c_nationkey").to_numpy().astype(np.int64)
    bal_c = _cents(cust.column("c_acctbal"))
    in_set = np.isin(cnat, list(nat_keys))
    pos_mask = in_set & (bal_c > 0)
    sum_c = int(bal_c[pos_mask].sum())
    n_pos = int(pos_mask.sum())
    cand = in_set & (bal_c * n_pos > sum_c)
    cand_keys = ckey[cand]
    cand_sort = np.argsort(cand_keys, kind="stable")
    cand_s = cand_keys[cand_sort]
    cand_ref = ray.put(cand_s)

    _EMPTY = pa.Table.from_pydict(
        {"c_custkey": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )

    def seen_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(cand_ref)
        odate = _ts_us(batch.column("o_orderdate"))
        ocust = batch.column("o_custkey").to_numpy().astype(np.int64)
        mask = (odate >= cut) & _sorted_member_mask(keys, ocust)
        if not mask.any():
            return _EMPTY
        uniq = np.unique(ocust[mask])
        return pa.Table.from_pydict(
            {"c_custkey": pa.array(uniq, pa.int64()),
             "n": pa.array(np.ones(len(uniq), dtype=np.int64))}
        )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    partials = orders.map_batches(seen_partial, batch_format="pyarrow")
    tbl = _combine_partials(partials, ["c_custkey"], ["n"], combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(partials.groupby("c_custkey").sum("n").take_all())
    seen = np.sort(tbl.column("c_custkey").to_numpy().astype(np.int64))
    dormant = ~_sorted_member_mask(seen, cand_s)
    d_nat = cnat[cand][cand_sort][dormant]
    d_bal = bal_c[cand][cand_sort][dormant]
    out_keys = sorted(nat_keys)
    rows = []
    for k in out_keys:
        m = d_nat == k
        if not m.any():
            continue
        rows.append((name_of[k], int(m.sum()), int(d_bal[m].sum())))
    rows.sort(key=lambda r: r[0])
    return pa.Table.from_pydict(
        {"n_name": pa.array([r[0] for r in rows], pa.string()),
         "numcust": pa.array([r[1] for r in rows], pa.int64()),
         "totacctbal": pa.array([r[2] / 100.0 for r in rows], pa.float64())}
    )


# -- dense-rank top-k: highest distinct order values per priority --------------

def top_order_values_with_ties(
    sf_dir: str, k: int = 3, combine_limit: int = 2_000_000
) -> pa.Table:
    """Per-priority top-``k`` DISTINCT order totals, KEEPING TIES — the
    DENSE_RANK window shape (a row_number top-k silently drops tied
    orders; dense-rank keeps every order at a qualifying value).

    One streamed pass reduces orders to (priority, total_cents, n)
    value-count partials; the driver picks each group's k-th distinct
    value boundary (O(groups × distinct) rows) and a second streamed
    pass emits qualifying orders with their dense rank attached — a
    pure map against the broadcast boundary/value map.
    """
    _EMPTY = pa.Table.from_pydict(
        {"o_orderpriority": pa.array([], pa.string()),
         "value_c": pa.array([], pa.int64()),
         "n": pa.array([], pa.int64())}
    )

    def counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        t = pa.Table.from_pydict(
            {"o_orderpriority": batch.column("o_orderpriority"),
             "value_c": pa.array(_cents(batch.column("o_totalprice")),
                                 pa.int64()),
             "n": pa.array(np.ones(batch.num_rows, dtype=np.int64))}
        )
        return t.group_by(["o_orderpriority", "value_c"]).aggregate(
            [("n", "sum")]
        ).rename_columns(["o_orderpriority", "value_c", "n"])

    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    partials = orders.map_batches(counts, batch_format="pyarrow")
    tbl = _combine_partials(
        partials, ["o_orderpriority", "value_c"], ["n"], combine_limit
    )
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby(["o_orderpriority", "value_c"]).sum("n").take_all()
        )
    prio = np.asarray(
        tbl.column("o_orderpriority").to_numpy(zero_copy_only=False),
        dtype=object)
    vals = tbl.column("value_c").to_numpy().astype(np.int64)
    # per group: the top-k distinct values, rank 1 = highest
    rank_of: dict = {}
    for g in sorted(set(prio.tolist())):
        gv = np.unique(vals[prio == g])[::-1][:k]
        for r, v in enumerate(gv, start=1):
            rank_of[(g, int(v))] = r
    rk_ref = ray.put(rank_of)

    def qualify(batch: pa.Table) -> pa.Table:
        rk = ray.get(rk_ref)
        p = np.asarray(
            batch.column("o_orderpriority").to_numpy(zero_copy_only=False),
            dtype=object)
        v = _cents(batch.column("o_totalprice"))
        keep = np.fromiter(
            ((pp, int(vv)) in rk for pp, vv in zip(p, v)),
            bool, len(v))
        if not keep.any():
            return pa.Table.from_pydict(
                {"o_orderkey": pa.array([], pa.int64()),
                 "o_orderpriority": pa.array([], pa.string()),
                 "o_totalprice": pa.array([], pa.float64()),
                 "rnk": pa.array([], pa.int64())}
            )
        ranks = np.fromiter(
            (rk[(pp, int(vv))] for pp, vv in zip(p[keep], v[keep])),
            np.int64, int(keep.sum()))
        return pa.Table.from_pydict(
            {"o_orderkey": batch.column("o_orderkey").filter(pa.array(keep)),
             "o_orderpriority": batch.column("o_orderpriority")
             .filter(pa.array(keep)),
             "o_totalprice": batch.column("o_totalprice")
             .filter(pa.array(keep)),
             "rnk": pa.array(ranks, pa.int64())}
        )

    full = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )
    parts = [
        t for t in ray.get(
            full.map_batches(qualify, batch_format="pyarrow")
            .materialize().to_arrow_refs()
        )
        if t.num_rows > 0
    ]
    if not parts:
        return pa.Table.from_pydict(
            {"o_orderkey": pa.array([], pa.int64()),
             "o_orderpriority": pa.array([], pa.string()),
             "o_totalprice": pa.array([], pa.float64()),
             "rnk": pa.array([], pa.int64())}
        )
    return pa.concat_tables(parts).sort_by(
        [("o_orderpriority", "ascending"), ("rnk", "ascending"),
         ("o_orderkey", "ascending")]
    )
