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

int64 headroom bound for the grouped money partials (rev_e4 /
amount_e4 / total_e4): one scale-1e4 line revenue is < 1e9, so a
single group's int64 sum stays exact below ~9e9 rows PER GROUP.
Every grouped aggregate here keys on a bounded domain (year,
returnflag, priority, nation, supplier, (order, supp) pair) where
per-group row counts at 10^12 lineitem rows stay orders of magnitude
under that, EXCEPT per-orderkey sums (q3/q18 shapes in
relational.py), which are bounded by lines-per-order (~7). Global
single-scalar reductions (q17/q19) cross the bound first; they
already accumulate the final total in Python ints (arbitrary
precision) on the driver — the same discipline
price_qty_correlation's decimal-string partials follow. If a new
query ever groups 1e10+ rows into one key, switch its partial to the
decimal-string pattern.

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
        if counts is None:  # winner rows (one per qualifying order) can
            # exceed the combine budget at scale: Ray groupby fallback
            counts = pa.Table.from_pylist(
                wins.groupby("l_suppkey").sum("n").take_all()
            )
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

    # qualifying VALUES across all groups: a tiny sorted array, so the
    # full scan prefilters vectorized and only the handful of
    # survivors touch the (group, value) -> rank dict
    qual_vals = np.sort(np.array(
        sorted({v for (_g, v) in rank_of}), dtype=np.int64))

    def qualify(batch: pa.Table) -> pa.Table:
        rk = ray.get(rk_ref)
        v = _cents(batch.column("o_totalprice"))
        pre = _sorted_member_mask(qual_vals, v)
        if not pre.any():
            return pa.Table.from_pydict(
                {"o_orderkey": pa.array([], pa.int64()),
                 "o_orderpriority": pa.array([], pa.string()),
                 "o_totalprice": pa.array([], pa.float64()),
                 "rnk": pa.array([], pa.int64())}
            )
        p = np.asarray(
            batch.column("o_orderpriority").to_numpy(zero_copy_only=False),
            dtype=object)
        keep = pre.copy()
        hit_idx = np.flatnonzero(pre)
        for i in hit_idx:  # survivors only — bounded by qualifying rows
            if (p[i], int(v[i])) not in rk:
                keep[i] = False
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


# -- derived partsupp: the five remaining TPC-H shapes -------------------------
#
# The test schema has no partsupp table, so the classic Q2/Q9/Q11/Q16/
# Q20 shapes derive one DETERMINISTICALLY from lineitem: a partsupp
# row per DISTINCT (l_partkey, l_suppkey) pair with
#   ps_availqty   = count(*)                       (pair frequency)
#   ps_cost_c     = (pk*31 + sk*17) % 90000 + 10000  (cents, pure fn)
# Both sides compute the identical integers (the oracle carries the
# same CTE), so every query below is exactly SQL-mirrorable. The cost
# being a pure FUNCTION of the keys matters at scale: Q9 needs no
# join at all (cost evaluates inline per lineitem row), and the pair
# exchange only runs where availqty is genuinely needed.

def _ps_cost_c(pk: np.ndarray, sk: np.ndarray) -> np.ndarray:
    return (pk * 31 + sk * 17) % 90000 + 10000


def _partsupp_pairs(
    sf_dir: str,
    num_parts: int | None = None,
    qty_window: tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """(ps_partkey, ps_suppkey, ps_availqty[, qty_win_c]) — distinct
    pair aggregation in ONE bucketed exchange (the _edges_dataset
    discipline: per-batch np.unique combiner, hash(pk,sk)%P buckets,
    vectorized per-bucket reduceat — never a per-pair Python call).
    ``qty_window`` additionally sums l_quantity cents shipped inside
    [lo_us, hi_us) per pair (for the Q20 shape).
    """
    from .joins import default_num_buckets, int_key_buckets

    if num_parts is None:
        num_parts = default_num_buckets()
    cols = ["l_partkey", "l_suppkey"]
    if qty_window is not None:
        cols += ["l_quantity", "l_shipdate"]

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty block: np.r_[True, ...] would
            out = {               # fabricate a phantom run
                "ps_partkey": pa.array([], pa.int64()),
                "ps_suppkey": pa.array([], pa.int64()),
                "ps_availqty": pa.array([], pa.int64()),
            }
            if qty_window is not None:
                out["qty_win_c"] = pa.array([], pa.int64())
            out["bucket"] = pa.array([], pa.int32())
            return pa.Table.from_pydict(out)
        pk = batch.column("l_partkey").to_numpy().astype(np.int64)
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        # lexsort on the pair itself — collision-free at ANY key range
        # (a packed pk*C+sk composite is only injective while sk < C,
        # a silent-merge hazard at corpus-scale id domains)
        order = np.lexsort((sk, pk))
        pk_s, sk_s = pk[order], sk[order]
        starts = np.flatnonzero(
            np.r_[True, (pk_s[1:] != pk_s[:-1]) | (sk_s[1:] != sk_s[:-1])]
        )
        cnt = np.diff(np.r_[starts, len(pk_s)])
        out = {
            "ps_partkey": pa.array(pk[order][starts], pa.int64()),
            "ps_suppkey": pa.array(sk[order][starts], pa.int64()),
            "ps_availqty": pa.array(cnt.astype(np.int64), pa.int64()),
        }
        if qty_window is not None:
            lo, hi = qty_window
            ship = _ts_us(batch.column("l_shipdate"))[order]
            qty_c = _cents(batch.column("l_quantity"))[order]
            win = ((ship >= lo) & (ship < hi)).astype(np.int64)
            out["qty_win_c"] = pa.array(
                np.add.reduceat(qty_c * win, starts), pa.int64()
            )
        mixed = (
            pk[order][starts].astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
            + sk[order][starts].astype(np.uint64)
        )
        out["bucket"] = pa.array(
            int_key_buckets(mixed.view(np.int64), num_parts), pa.int32()
        )
        return pa.Table.from_pydict(out)

    def merge_bucket(group: pa.Table) -> pa.Table:
        pk = group.column("ps_partkey").to_numpy().astype(np.int64)
        sk = group.column("ps_suppkey").to_numpy().astype(np.int64)
        n = group.column("ps_availqty").to_numpy().astype(np.int64)
        order = np.lexsort((sk, pk))
        pk_s, sk_s = pk[order], sk[order]
        starts = np.flatnonzero(
            np.r_[True, (pk_s[1:] != pk_s[:-1]) | (sk_s[1:] != sk_s[:-1])]
        )
        out = {
            "ps_partkey": pa.array(pk[order][starts], pa.int64()),
            "ps_suppkey": pa.array(sk[order][starts], pa.int64()),
            "ps_availqty": pa.array(
                np.add.reduceat(n[order], starts), pa.int64()),
        }
        if "qty_win_c" in group.column_names:
            q = group.column("qty_win_c").to_numpy().astype(np.int64)
            out["qty_win_c"] = pa.array(
                np.add.reduceat(q[order], starts), pa.int64())
        return pa.Table.from_pydict(out)

    ds = _read(sf_dir, "lineitem", cols)
    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: merge_bucket(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
    )


def q9_nation_profit(sf_dir: str, combine_limit: int = 2_000_000) -> pa.Table:
    """TPC-H Q9 shape: profit (revenue minus supply cost) by supplier
    nation and order-year. Because the derived supply cost is a pure
    function of (partkey, suppkey), it evaluates INLINE per lineitem
    row — the whole query is one streamed pass with (nation, year)
    int64-cents partials and ZERO joins (the supplier-nation LUT is
    the only broadcast).
    """
    supp = _broadcast_parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nat = _broadcast_parquet(sf_dir, "nation", ["n_nationkey", "n_name"])
    skey = supp.column("s_suppkey").to_numpy().astype(np.int64)
    snat = supp.column("s_nationkey").to_numpy().astype(np.int64)
    nkey = nat.column("n_nationkey").to_numpy().astype(np.int64)
    nname = np.asarray(nat.column("n_name").to_numpy(zero_copy_only=False),
                       dtype=object)
    nlut = np.empty(int(nkey.max()) + 1, dtype=object)
    nlut[nkey] = nname
    s2n = np.full(int(skey.max()) + 1, -1, dtype=np.int64)
    s2n[skey] = snat
    lut_ref = ray.put((s2n, nlut))

    _EMPTY = pa.Table.from_pydict(
        {"nation": pa.array([], pa.string()),
         "o_year": pa.array([], pa.int64()),
         "amount_e4": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        s2n_l, nlut_l = ray.get(lut_ref)
        pk = batch.column("l_partkey").to_numpy().astype(np.int64)
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        ok = (sk >= 0) & (sk < len(s2n_l))
        # drop suppkeys absent from supplier (the -1 sentinel) exactly
        # like the oracle's inner join — nlut[-1] would silently credit
        # the last nation otherwise
        ok &= s2n_l[np.minimum(np.maximum(sk, 0), len(s2n_l) - 1)] >= 0
        if not ok.any():
            return _EMPTY
        base_c = _cents(batch.column("l_extendedprice"))[ok]
        disc_c = _cents(batch.column("l_discount"))[ok]
        qty_c = _cents(batch.column("l_quantity"))[ok]
        cost_c = _ps_cost_c(pk[ok], sk[ok])
        amount = base_c * (100 - disc_c) - cost_c * qty_c
        year = (
            _ts_us(batch.column("l_shipdate"))[ok]
            .astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64) + 1970
        )
        nid = s2n_l[sk[ok]]
        t = pa.Table.from_pydict(
            {"nation": pa.array(
                np.asarray(nlut_l[nid], dtype=object).tolist(), pa.string()),
             "o_year": pa.array(year, pa.int64()),
             "amount_e4": pa.array(amount, pa.int64())}
        )
        return t.group_by(["nation", "o_year"]).aggregate(
            [("amount_e4", "sum")]
        ).rename_columns(["nation", "o_year", "amount_e4"])

    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
         "l_quantity", "l_shipdate"],
    )
    partials = li.map_batches(partial, batch_format="pyarrow")
    tbl = _combine_partials(
        partials, ["nation", "o_year"], ["amount_e4"], combine_limit
    )
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby(["nation", "o_year"]).sum("amount_e4").take_all()
        )
    amt = tbl.column("sum(amount_e4)").to_numpy().astype(np.float64) / 10000.0
    out = pa.Table.from_pydict(
        {"nation": tbl.column("nation"),
         "o_year": tbl.column("o_year"),
         "sum_profit": pa.array(amt, pa.float64())}
    )
    return out.sort_by(
        [("nation", "ascending"), ("o_year", "descending")]
    )


def q2_min_cost_supplier(
    sf_dir: str,
    region: str = "EUROPE",
    size: int = 15,
    k: int = 100,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """TPC-H Q2 shape: for every size-``size`` part, the region
    supplier(s) offering the MINIMUM derived supply cost (correlated
    min subquery -> per-part argmin). The pair exchange streams;
    per-part min-cost partials merge under the budget (groupby
    fallback); winners (cost == per-part min, ties kept like the SQL
    join) collect attrs from driver LUTs; classic output order
    (s_acctbal desc, n_name, s_name, p_partkey) with top-``k``.
    """
    part = _broadcast_parquet(sf_dir, "part", ["p_partkey", "p_size"])
    pkey = part.column("p_partkey").to_numpy().astype(np.int64)
    psize = part.column("p_size").to_numpy().astype(np.int64)
    size_keys = np.sort(pkey[psize == size])

    nat = _broadcast_parquet(sf_dir, "nation",
                             ["n_nationkey", "n_name", "n_regionkey"])
    reg = _broadcast_parquet(sf_dir, "region", ["r_regionkey", "r_name"])
    rk = reg.column("r_regionkey").to_numpy().astype(np.int64)
    rn = reg.column("r_name").to_numpy(zero_copy_only=False)
    target_region = int(rk[rn == region][0])
    nkey = nat.column("n_nationkey").to_numpy().astype(np.int64)
    nreg = nat.column("n_regionkey").to_numpy().astype(np.int64)
    nname = np.asarray(nat.column("n_name").to_numpy(zero_copy_only=False),
                       dtype=object)
    region_nations = set(nkey[nreg == target_region].tolist())

    supp = _broadcast_parquet(
        sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    )
    skey = supp.column("s_suppkey").to_numpy().astype(np.int64)
    snat = supp.column("s_nationkey").to_numpy().astype(np.int64)
    in_region_supp = np.zeros(int(skey.max()) + 1, dtype=bool)
    in_region_supp[skey[np.isin(snat, list(region_nations))]] = True
    filt_ref = ray.put((size_keys, in_region_supp))

    _EMPTY = pa.Table.from_pydict(
        {"ps_partkey": pa.array([], pa.int64()),
         "min_cost": pa.array([], pa.int64())}
    )

    def min_partial(batch: pa.Table) -> pa.Table:
        sizes, srs = ray.get(filt_ref)
        pk = batch.column("ps_partkey").to_numpy().astype(np.int64)
        sk = batch.column("ps_suppkey").to_numpy().astype(np.int64)
        keep = (
            _sorted_member_mask(sizes, pk)
            & (sk < len(srs)) & srs[np.minimum(sk, len(srs) - 1)]
        )
        if not keep.any():
            return _EMPTY
        cost = _ps_cost_c(pk[keep], sk[keep])
        t = pa.Table.from_pydict(
            {"ps_partkey": pa.array(pk[keep], pa.int64()),
             "min_cost": pa.array(cost, pa.int64())}
        )
        return t.group_by("ps_partkey").aggregate(
            [("min_cost", "min")]
        ).rename_columns(["ps_partkey", "min_cost"])

    pairs = _partsupp_pairs(sf_dir).materialize()
    partials = pairs.map_batches(min_partial, batch_format="pyarrow")
    tbl = _combine_partials(
        partials, ["ps_partkey"], ["min_cost"], combine_limit, agg="min"
    )
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby("ps_partkey").min("min_cost").take_all()
        )
    mp = tbl.column("ps_partkey").to_numpy().astype(np.int64)
    mc = tbl.column("min(min_cost)").to_numpy().astype(np.int64)
    order = np.argsort(mp, kind="stable")
    min_ref = ray.put((mp[order], mc[order]))

    def winners(batch: pa.Table) -> pa.Table:
        sizes, srs = ray.get(filt_ref)
        mps, mcs = ray.get(min_ref)
        pk = batch.column("ps_partkey").to_numpy().astype(np.int64)
        sk = batch.column("ps_suppkey").to_numpy().astype(np.int64)
        keep = (
            _sorted_member_mask(sizes, pk)
            & (sk < len(srs)) & srs[np.minimum(sk, len(srs) - 1)]
            & _sorted_member_mask(mps, pk)
        )
        if not keep.any():
            return pa.Table.from_pydict(
                {"p_partkey": pa.array([], pa.int64()),
                 "s_suppkey": pa.array([], pa.int64())}
            )
        pos = np.searchsorted(mps, pk[keep])
        win = _ps_cost_c(pk[keep], sk[keep]) == mcs[pos]
        return pa.Table.from_pydict(
            {"p_partkey": pa.array(pk[keep][win], pa.int64()),
             "s_suppkey": pa.array(sk[keep][win], pa.int64())}
        )

    win_parts = [
        t for t in ray.get(
            pairs.map_batches(winners, batch_format="pyarrow")
            .materialize().to_arrow_refs()
        )
        if t.num_rows > 0
    ]
    if not win_parts:
        return pa.Table.from_pydict(
            {"s_acctbal": pa.array([], pa.float64()),
             "s_name": pa.array([], pa.string()),
             "n_name": pa.array([], pa.string()),
             "p_partkey": pa.array([], pa.int64())}
        )
    w = pa.concat_tables(win_parts)
    wp = w.column("p_partkey").to_numpy().astype(np.int64)
    wsup = w.column("s_suppkey").to_numpy().astype(np.int64)
    sname = np.asarray(supp.column("s_name").to_numpy(zero_copy_only=False),
                       dtype=object)
    sbal = supp.column("s_acctbal").to_numpy(zero_copy_only=False)
    spos = {int(s): i for i, s in enumerate(skey)}
    rows = [spos[int(s)] for s in wsup]
    nlut = np.empty(int(nkey.max()) + 1, dtype=object)
    nlut[nkey] = nname
    bal = np.asarray([float(sbal[i]) for i in rows])
    names = np.asarray([str(sname[i]) for i in rows], dtype=object)
    nats = np.asarray([str(nlut[int(snat[i])]) for i in rows], dtype=object)
    order = np.lexsort((wp, names, nats, -bal))[:k]
    return pa.Table.from_pydict(
        {"s_acctbal": pa.array(bal[order], pa.float64()),
         "s_name": pa.array(names[order].tolist(), pa.string()),
         "n_name": pa.array(nats[order].tolist(), pa.string()),
         "p_partkey": pa.array(wp[order], pa.int64())}
    )


def q11_important_stock(
    sf_dir: str,
    nation: str = "NATION_3",
    fraction_e4: int = 10,  # part share > fraction_e4 / 10^4 of total
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """TPC-H Q11 shape: parts whose stock value at one nation's
    suppliers exceeds a fraction of the total — the scalar-subquery
    threshold over a grouped aggregate. Pair rows stream once with a
    supplier-nation mask; per-part value partials (cost·availqty,
    exact ints) merge under the budget; the threshold compare is the
    cross-multiplied integer rule ``value·10^4 > total·fraction_e4``.
    """
    nat = _broadcast_parquet(sf_dir, "nation", ["n_nationkey", "n_name"])
    nkey = nat.column("n_nationkey").to_numpy().astype(np.int64)
    nname = nat.column("n_name").to_numpy(zero_copy_only=False)
    target = int(nkey[nname == nation][0])
    supp = _broadcast_parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    skey = supp.column("s_suppkey").to_numpy().astype(np.int64)
    snat = supp.column("s_nationkey").to_numpy().astype(np.int64)
    in_nation = np.zeros(int(skey.max()) + 1, dtype=bool)
    in_nation[skey[snat == target]] = True
    lut_ref = ray.put(in_nation)

    _EMPTY = pa.Table.from_pydict(
        {"ps_partkey": pa.array([], pa.int64()),
         "value_c": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        pk = batch.column("ps_partkey").to_numpy().astype(np.int64)
        sk = batch.column("ps_suppkey").to_numpy().astype(np.int64)
        keep = (sk < len(lut)) & lut[np.minimum(sk, len(lut) - 1)]
        if not keep.any():
            return _EMPTY
        avail = batch.column("ps_availqty").to_numpy().astype(np.int64)[keep]
        val = _ps_cost_c(pk[keep], sk[keep]) * avail
        t = pa.Table.from_pydict(
            {"ps_partkey": pa.array(pk[keep], pa.int64()),
             "value_c": pa.array(val, pa.int64())}
        )
        return t.group_by("ps_partkey").aggregate(
            [("value_c", "sum")]
        ).rename_columns(["ps_partkey", "value_c"])

    partials = _partsupp_pairs(sf_dir).map_batches(
        partial, batch_format="pyarrow"
    )
    tbl = _combine_partials(partials, ["ps_partkey"], ["value_c"], combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby("ps_partkey").sum("value_c").take_all()
        )
    pk = tbl.column("ps_partkey").to_numpy().astype(np.int64)
    val = tbl.column("sum(value_c)").to_numpy().astype(np.int64)
    total = int(sum(int(v) for v in val))
    keep = val * 10_000 > total * fraction_e4
    order = np.lexsort((pk[keep], -val[keep]))
    return pa.Table.from_pydict(
        {"ps_partkey": pa.array(pk[keep][order], pa.int64()),
         "value": pa.array(val[keep][order] / 100.0, pa.float64())}
    )


def q16_supplier_part_counts(
    sf_dir: str,
    exclude_brand: str = "Brand#1",
    sizes: tuple[int, ...] = (5, 10, 15, 20, 25, 30, 35, 40),
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """TPC-H Q16 shape (adapted: "customer complaints" suppliers are
    those with negative account balance): how many DISTINCT suppliers
    can deliver each (brand, size) bucket, excluding one brand, a size
    set, and the complaint suppliers. Distinct pair rows stream once
    against three driver LUTs; block-distinct (brand, size, supplier)
    triples merge under the budget; the count collapses per group.
    """
    part = _broadcast_parquet(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    pkey = part.column("p_partkey").to_numpy().astype(np.int64)
    pbrand = np.asarray(part.column("p_brand").to_numpy(zero_copy_only=False),
                        dtype=object)
    psize = part.column("p_size").to_numpy().astype(np.int64)
    n = int(pkey.max()) + 1
    blut = np.empty(n, dtype=object)
    blut[pkey] = pbrand
    slut = np.zeros(n, dtype=np.int64)
    slut[pkey] = psize
    supp = _broadcast_parquet(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    skey = supp.column("s_suppkey").to_numpy().astype(np.int64)
    sbal = supp.column("s_acctbal").to_numpy(zero_copy_only=False)
    bad = np.zeros(int(skey.max()) + 1, dtype=bool)
    bad[skey[sbal < 0]] = True
    size_set = np.array(sorted(sizes), dtype=np.int64)
    lut_ref = ray.put((blut, slut, bad, size_set))

    _EMPTY = pa.Table.from_pydict(
        {"p_brand": pa.array([], pa.string()),
         "p_size": pa.array([], pa.int64()),
         "ps_suppkey": pa.array([], pa.int64()),
         "n": pa.array([], pa.int64())}
    )

    def triples(batch: pa.Table) -> pa.Table:
        blut_l, slut_l, bad_l, sset = ray.get(lut_ref)
        pk = batch.column("ps_partkey").to_numpy().astype(np.int64)
        sk = batch.column("ps_suppkey").to_numpy().astype(np.int64)
        ok = (pk < len(slut_l)) & (sk < len(bad_l))
        brand = np.asarray(blut_l[np.minimum(pk, len(blut_l) - 1)],
                           dtype=object)
        size = slut_l[np.minimum(pk, len(slut_l) - 1)]
        keep = (
            ok
            & (brand != exclude_brand)
            & _sorted_member_mask(sset, size)
            & ~bad_l[np.minimum(sk, len(bad_l) - 1)]
        )
        if not keep.any():
            return _EMPTY
        return pa.Table.from_pydict(
            {"p_brand": pa.array(brand[keep].tolist(), pa.string()),
             "p_size": pa.array(size[keep], pa.int64()),
             "ps_suppkey": pa.array(sk[keep], pa.int64()),
             "n": pa.array(np.ones(int(keep.sum()), dtype=np.int64))}
        )

    partials = _partsupp_pairs(sf_dir).map_batches(
        triples, batch_format="pyarrow"
    )
    tbl = _combine_partials(
        partials, ["p_brand", "p_size", "ps_suppkey"], ["n"], combine_limit
    )
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby(["p_brand", "p_size", "ps_suppkey"])
            .sum("n").take_all()
        )
    counted = (
        tbl.select(["p_brand", "p_size"])
        .append_column("supplier_cnt",
                       pa.array(np.ones(tbl.num_rows, dtype=np.int64)))
        .group_by(["p_brand", "p_size"])
        .aggregate([("supplier_cnt", "sum")])
        .rename_columns(["p_brand", "p_size", "supplier_cnt"])
    )
    idx = pc.sort_indices(
        counted,
        sort_keys=[("supplier_cnt", "descending"), ("p_brand", "ascending"),
                   ("p_size", "ascending")],
    )
    return counted.take(idx)


def q20_promotion_suppliers(
    sf_dir: str,
    nation: str = "NATION_3",
    year: str = "1996",
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """TPC-H Q20 shape: suppliers in one nation holding EXCESS stock of
    some part relative to what they shipped in a year —
    ``ps_availqty > 0.5 * qty_shipped_in_year``, the correlated
    half-of-shipments subquery, as the integer rule
    ``200·avail > qty_year_c``. One pair exchange computes BOTH
    aggregates (all-time pair count + in-window quantity cents) in the
    same pass; the qualifying-supplier DISTINCT set is tiny and
    resolves on the driver.
    """
    lo = _us(f"{year}-01-01")
    hi = _us(f"{int(year) + 1}-01-01")
    nat = _broadcast_parquet(sf_dir, "nation", ["n_nationkey", "n_name"])
    nkey = nat.column("n_nationkey").to_numpy().astype(np.int64)
    nname = nat.column("n_name").to_numpy(zero_copy_only=False)
    target = int(nkey[nname == nation][0])
    supp = _broadcast_parquet(
        sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]
    )
    skey = supp.column("s_suppkey").to_numpy().astype(np.int64)
    snat = supp.column("s_nationkey").to_numpy().astype(np.int64)
    in_nation = np.zeros(int(skey.max()) + 1, dtype=bool)
    in_nation[skey[snat == target]] = True
    lut_ref = ray.put(in_nation)

    _EMPTY = pa.Table.from_pydict(
        {"ps_suppkey": pa.array([], pa.int64()),
         "n": pa.array([], pa.int64())}
    )

    def qualifying(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        sk = batch.column("ps_suppkey").to_numpy().astype(np.int64)
        avail = batch.column("ps_availqty").to_numpy().astype(np.int64)
        qty_win = batch.column("qty_win_c").to_numpy().astype(np.int64)
        keep = (
            (sk < len(lut)) & lut[np.minimum(sk, len(lut) - 1)]
            & (qty_win > 0)
            & (200 * avail > qty_win)
        )
        if not keep.any():
            return _EMPTY
        uniq = np.unique(sk[keep])
        return pa.Table.from_pydict(
            {"ps_suppkey": pa.array(uniq, pa.int64()),
             "n": pa.array(np.ones(len(uniq), dtype=np.int64))}
        )

    pairs = _partsupp_pairs(sf_dir, qty_window=(lo, hi))
    partials = pairs.map_batches(qualifying, batch_format="pyarrow")
    tbl = _combine_partials(partials, ["ps_suppkey"], ["n"], combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby("ps_suppkey").sum("n").take_all()
        )
    wk = np.sort(tbl.column("ps_suppkey").to_numpy().astype(np.int64))
    sname = np.asarray(supp.column("s_name").to_numpy(zero_copy_only=False),
                       dtype=object)
    pos = {int(s): i for i, s in enumerate(skey)}
    names = sorted(str(sname[pos[int(s)]]) for s in wk)
    return pa.Table.from_pydict({"s_name": pa.array(names, pa.string())})
