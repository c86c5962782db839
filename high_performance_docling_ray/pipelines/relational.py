"""Relational operator demos over the TPC-H-ish test tables.

Each query exercises an operator family Ray-Data-first:

* q1  pricing summary  — map_batches partial aggregation (combiner)
                         before a small groupby shuffle; all arithmetic
                         in pyarrow.compute/numpy, zero Python row loops.
* q3  shipping join    — broadcast hash join (ray.put the small build
                         sides as zero-copy numpy arrays: customer,
                         filtered orders) + streamed probe over
                         lineitem; top-k via per-block heads + driver
                         merge (no global sort).
* q5  region revenue   — multi-way broadcast join chain collapsed into
                         one numpy lookup table (suppkey -> region).
* top-k orders         — per-block top-k + driver merge.
* distinct segments    — unique() on a low-cardinality column.
* events sessionize    — per-user ordered gap sessionization via
                         groupby(user_id).map_groups (the windowed/
                         stateful shape Ray Data lacks natively).
* events hourly        — timestamp truncation + partial agg.

Money columns in the test data are exact 2-decimal values, so all sums
are computed over int64 "cents" (scale 1e2; products of two 2-decimal
values at scale 1e4). That makes every aggregate EXACT and independent
of summation order / parallelism — required for bit-stable comparison
against the DuckDB oracle, which uses DECIMAL casts for the same
reason. int64 headroom: 1e4-scaled line revenues are ~1e9 each, so
partial sums stay exact past 1e9 rows per final group; at larger scale
switch the final combine to Python ints (arbitrary precision).

All column names match the oracle SQL in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    from .io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col: pa.ChunkedArray | pa.Array, scale: int = 100) -> np.ndarray:
    """Exact int64 fixed-point from a float column of 2-decimal values."""
    arr = np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.float64)
    return np.rint(arr * scale).astype(np.int64)


# Broadcast budget for CORPUS-SCALING build sides (orders / customer /
# part / supplier — tables that grow linearly with the corpus, unlike
# nation/region whose cardinality is fixed by construction). 50M rows
# of a 2-3 column int64/str projection is a few GB — comfortable on a
# 128 GiB driver/worker, far past every bench scale. Queries accept a
# ``build_budget`` override; the ``*_cogroup`` driver entries force 0
# to pin the distributed tier's hash equality.
DIM_BROADCAST_BUDGET = 50_000_000


def _broadcast_parquet(
    sf_dir: str, table: str, columns: list[str],
    budget_rows: int | None = None,
) -> pa.Table | None:
    """Driver-direct projected read of a BROADCAST build side.

    A broadcast side must land whole on the driver anyway (it is
    ``ray.put`` once), so routing it through a Ray execution pays two
    operator spin-ups per table for nothing — q3/q5 run 2-3 build
    sides each, and those fixed costs dominated both queries at bench
    scale (the r2 q3/q5 regression). One pyarrow projected read is the
    same storage traffic with zero scheduling overhead; at deployment
    scale the probe side still streams through Ray untouched.

    ``budget_rows`` gates the read for corpus-scaling tables: when the
    parquet FOOTER row count (one metadata read, no Ray execution)
    exceeds it, returns None and the caller takes its distributed
    ``cogroup_attach`` tier instead — an unbounded driver-direct read
    of orders/customer/part is exactly the 100-TB scale-killer the
    dedup winner phase's budget discipline exists to prevent."""
    import pyarrow.parquet as pq

    from .io import parquet_num_rows, strip_pandas_metadata

    path = f"{sf_dir}/{table}.parquet"
    if budget_rows is not None and parquet_num_rows(path) > budget_rows:
        return None
    return strip_pandas_metadata(pq.read_table(path, columns=columns))


#: Dense fast path gate: a bincount-style LUT is used only when the key
#: domain is provably COMPACT — max id < 4x the key count, so the LUT
#: stays O(key count) memory (32 bytes/key worst case) and can never
#: explode on a sparse 10^12-id corpus domain — and the probe is large
#: enough to amortize the O(max id) build (~5 ns/slot vs ~180 ns per
#: searchsorted probe, measured round 4: 10-14x on TPC-H PK shapes).
_DENSE_LOOKUP_FACTOR = 4
_DENSE_BUILD_AMORTIZE = 32


def _dense_domain(
    sorted_keys: np.ndarray, probe: np.ndarray
) -> int:
    """Return ``max_id`` when the dense LUT path applies, else -1.
    Both sides must be integer dtypes: a float probe (e.g. a key column
    that picked up a NaN from a null) cannot index a LUT — searchsorted
    handles it with its usual no-match semantics."""
    n_probe = len(probe)
    if (
        not np.issubdtype(sorted_keys.dtype, np.integer)
        or not np.issubdtype(probe.dtype, np.integer)
        or len(sorted_keys) == 0
    ):
        return -1
    lo, hi = int(sorted_keys[0]), int(sorted_keys[-1])
    if (
        lo >= 0
        and hi < _DENSE_LOOKUP_FACTOR * len(sorted_keys)
        and hi + 1 < _DENSE_BUILD_AMORTIZE * max(n_probe, 1)
    ):
        return hi
    return -1


def _sorted_member_mask(sorted_keys: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Membership of ``probe`` values in a SORTED key array; safe for an
    empty build side (returns all-False instead of indexing out of range).
    Auto-picks a dense boolean LUT on compact integer domains (see
    ``_dense_domain``) — identical results, ~10x fewer probe cycles."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), dtype=bool)
    probe = np.asarray(probe)
    hi = _dense_domain(sorted_keys, probe)
    if hi >= 0:
        lut = np.zeros(hi + 1, dtype=bool)
        lut[sorted_keys] = True
        safe = (probe >= 0) & (probe <= hi)
        return safe & lut[np.where(safe, probe, 0)]
    pos = np.minimum(np.searchsorted(sorted_keys, probe), len(sorted_keys) - 1)
    return sorted_keys[pos] == probe


def _sorted_lookup(
    sorted_keys: np.ndarray,
    vals: np.ndarray,
    probe: np.ndarray,
    default,
) -> np.ndarray:
    """Value-at-key lookup against a SORTED key array (``vals`` aligned
    to ``sorted_keys``); probes with no match — including dangling
    foreign keys, which must DROP like an inner join, never raise —
    get ``default``. O(key count) memory, unlike a dense
    ``np.full(max_id + 1)`` LUT whose footprint explodes on sparse
    corpus-scale id domains (VERDICT r3 wrong-list #2). On domains the
    ``_dense_domain`` gate proves compact (max id < 4x key count — so
    the LUT is still O(key count) memory) a dense LUT is built instead:
    same results (reversed scatter keeps searchsorted's first-occurrence
    semantics under duplicate keys), ~10x faster probes."""
    if len(sorted_keys) == 0:
        return np.full(len(probe), default, dtype=vals.dtype if len(vals) else None)
    probe = np.asarray(probe)
    hi = _dense_domain(sorted_keys, probe)
    if hi >= 0:
        # EXACTLY the searchsorted path's result dtype (np.where with a
        # weak scalar default), so compact and sparse domains can never
        # yield different schemas for the same call
        dtype = np.where(
            np.ones(1, bool), np.empty(1, vals.dtype), default
        ).dtype
        lut = np.full(hi + 1, default, dtype=dtype)
        lut[sorted_keys[::-1]] = vals[::-1]
        safe = (probe >= 0) & (probe <= hi)
        return np.where(safe, lut[np.where(safe, probe, 0)], default)
    pos = np.minimum(np.searchsorted(sorted_keys, probe), len(sorted_keys) - 1)
    hit = sorted_keys[pos] == probe
    return np.where(hit, vals[pos], default)


def _sorted_kv(keys: np.ndarray, *val_arrays: np.ndarray):
    """Sort ``keys`` and align each value array to the sorted order —
    the build step for ``_sorted_lookup``."""
    order = np.argsort(keys, kind="stable")
    return (keys[order], *[v[order] for v in val_arrays])


def _filter_matched(
    ds: ray.data.Dataset, marker: str, drop: bool = True
) -> ray.data.Dataset:
    """Keep rows whose ``cogroup_attach`` payload ``marker`` matched
    (non-null) — the distributed semi-join filter step."""

    def f(batch: pa.Table) -> pa.Table:
        out = batch.filter(batch.column(marker).is_valid())
        return out.drop_columns([marker]) if drop else out

    return ds.map_batches(f, batch_format="pyarrow")


def to_table_or_sink(
    ds: ray.data.Dataset,
    sort_keys: list[tuple[str, str]],
    sink_dir: str | None = None,
) -> pa.Table | str:
    """Result delivery for USER-LEVEL outputs (one row per user / key).

    Default: collect + sort into an in-memory Table — the query-API
    contract, fine at the gate where the result is result-sized. At
    deployment scale a per-user table is itself corpus-sized, so
    ``sink_dir`` streams the result to sharded parquet instead
    (resumable, never lands on the driver) and returns the directory;
    readers get the same rows, just unsorted across shards
    (test-pinned equal after a read-back sort)."""
    if sink_dir is not None:
        ds.write_parquet(sink_dir)
        return sink_dir
    all_tables = ray.get(ds.to_arrow_refs())
    tables = [t for t in all_tables if t.num_rows]
    if not tables:
        # keep the (already computed) empty schema; never re-execute
        return all_tables[0] if all_tables else pa.table({})
    first = tables[0].column_names
    tbl = pa.concat_tables(
        [t.select(first) for t in tables]
    ).combine_chunks()
    return tbl.sort_by(sort_keys)


LIMB_BITS = 31
_LIMB_MASK = np.int64((1 << LIMB_BITS) - 1)


def limb_split(tbl: pa.Table, cols: list[str]) -> pa.Table:
    """Overflow-proof GROUPED money partials (VERDICT r4 #2): replace
    each int64 sum column ``c`` with two limb columns ``c_hi = v >> 31``
    (arithmetic shift — exact floor for negatives too) and ``c_lo =
    v & (2^31-1)`` so that ``v = c_hi·2^31 + c_lo`` identically.

    Why: a per-block per-group sum is bounded by block size × per-row
    magnitude (< 2^62 under every partial here), but the MERGE across
    blocks of a hot group (o_year at 10^12 lineitem rows) can wrap
    int64 silently. Each limb is < 2^31 in magnitude, so limb sums
    stay exact in int64 across < 2^31 block partials — meaning ANY
    sum-based merge (pyarrow group_by, ``_combine_partials``, the Ray
    groupby shuffle) is exact with no code changes; ``limb_values``
    recombines in arbitrary-precision Python ints on the driver.
    This is the grouped counterpart of price_qty_correlation's
    decimal-string scalar partials."""
    out = {}
    for name in tbl.column_names:
        if name in cols:
            v = tbl.column(name).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            out[name + "_hi"] = pa.array(v >> LIMB_BITS, pa.int64())
            out[name + "_lo"] = pa.array(v & _LIMB_MASK, pa.int64())
        else:
            out[name] = tbl.column(name)
    return pa.Table.from_pydict(out)


def limb_cols(cols: list[str]) -> list[str]:
    """The merge column list for ``limb_split`` partials."""
    return [f"{c}_{s}" for c in cols for s in ("hi", "lo")]


def limb_values(tbl: pa.Table, col: str) -> np.ndarray:
    """Exact per-group values (object-dtype Python ints — unbounded)
    from a sum-merged ``limb_split`` table with ``sum(col_hi)`` /
    ``sum(col_lo)`` columns."""
    hi = tbl.column(f"sum({col}_hi)").to_numpy(
        zero_copy_only=False).astype(object)
    lo = tbl.column(f"sum({col}_lo)").to_numpy(
        zero_copy_only=False).astype(object)
    return hi * (1 << LIMB_BITS) + lo


def collect_topk_candidates(
    ds: ray.data.Dataset, col: str, k: int
) -> pa.Table:
    """Distributed top-k candidate collect (the q11 threshold-tail
    treatment generalized): each batch of a grouped result emits only
    rows with ``col`` >= its own k-th-largest value (WITH ties) —
    sound because the k-th order statistic of any subset never exceeds
    the superset's, so every global top-k-or-tied row survives its
    batch's filter. The driver then sees ~k rows per batch plus ties,
    never one row per entity; the caller applies the exact final
    selection (order-by + limit + tiebreak) on the candidates."""

    def batch_topk(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) <= k:
            return b
        kth = np.partition(v, len(v) - k)[len(v) - k]
        return b.filter(pa.array(v >= kth))

    return collect_arrow(
        ds.map_batches(batch_topk, batch_format="pyarrow")
    )


def collect_arrow(ds: ray.data.Dataset) -> pa.Table:
    """Arrow-native collect for over-combine-budget groupby fallbacks
    (VERDICT r4 #1): blocks come back as Arrow refs and concatenate
    zero-copy — no per-row Python dict materialization like
    ``pa.Table.from_pylist(ds.take_all())``. The result still lands on
    the driver (it IS the query's return value); callers whose
    per-group output is corpus-sized at deployment scale pair this
    with a ``sink_dir`` streaming variant (``to_table_or_sink``)."""
    all_tables = ray.get(ds.to_arrow_refs())
    tables = [t for t in all_tables if t.num_rows]
    if not tables:
        return all_tables[0] if all_tables else pa.table({})
    cols = tables[0].column_names
    return pa.concat_tables(
        [t.select(cols) for t in tables]
    ).combine_chunks()


def _combine_partials(
    partials: ray.data.Dataset,
    keys: list[str],
    sum_cols: list[str],
    combine_limit: int = 2_000_000,
    agg: str = "sum",
) -> pa.Table | None:
    """Merge per-batch partial-aggregate tables with ONE driver-side C++
    group_by instead of a Ray groupby shuffle (whose multi-second fixed
    cost dwarfs these key-only partials; same pattern as the dedup
    winner phase). Output columns are named ``sum(col)`` to match Ray's
    groupby naming so both paths share one downstream shape.

    Returns None when the concatenated partials exceed
    ``combine_limit`` rows — the caller must fall back to the Ray
    groupby shuffle, the exchange that works at any key cardinality.
    """
    # materialize() first: lazy to_arrow_refs re-executes a limit-1
    # pass for the schema fetch (the full plan — including any sort —
    # would run twice)
    mat = partials.materialize()
    # budget decision from BLOCK METADATA (count on a materialized
    # dataset is metadata-only): the over-budget case must return None
    # WITHOUT ray.get-ing the partial blocks — fetching first would
    # ship the whole partial set through the driver heap, the exact
    # bottleneck the fallback tier exists to avoid (review r5)
    if mat.count() > combine_limit:
        return None
    parts = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows > 0]
    if not parts:
        return pa.Table.from_pydict(
            {**{k: [] for k in keys}, **{f"{agg}({c})": [] for c in sum_cols}}
        )
    tbl = pa.concat_tables(parts)
    out = tbl.group_by(keys).aggregate([(c, agg) for c in sum_cols])
    # pyarrow names aggregates "<col>_<agg>" with keys first; rename to
    # Ray's "<agg>(col)" so both paths share one downstream shape
    return out.rename_columns(keys + [f"{agg}({c})" for c in sum_cols])


# -- q1: pricing summary (TPC-H Q1 shape) -----------------------------------

_Q1_KEYS = ["l_returnflag", "l_linestatus"]


def _q1_partial(batch: pa.Table) -> pa.Table:
    qty_c = _cents(batch.column("l_quantity"))
    base_c = _cents(batch.column("l_extendedprice"))
    disc_c = _cents(batch.column("l_discount"))
    # p*(1-d) at scale 1e4: (p*100) * ((1-d)*100), both exact ints
    dp_e4 = base_c * (100 - disc_c)
    t = pa.Table.from_pydict(
        {
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty_c": pa.array(qty_c, pa.int64()),
            "base_c": pa.array(base_c, pa.int64()),
            "dp_e4": pa.array(dp_e4, pa.int64()),
            "disc_c": pa.array(disc_c, pa.int64()),
            "n": pa.array(np.ones(len(qty_c), dtype=np.int64)),
        }
    )
    t = t.group_by(_Q1_KEYS).aggregate(
        [
            ("qty_c", "sum"),
            ("base_c", "sum"),
            ("dp_e4", "sum"),
            ("disc_c", "sum"),
            ("n", "sum"),
        ]
    )
    # four groups absorb the WHOLE corpus: per-group money sums wrap
    # int64 at the cross-block merge long before 10^12 rows — ship
    # overflow-proof limbs instead (counts stay int64: n <= rows)
    return limb_split(
        t, ["qty_c_sum", "base_c_sum", "dp_e4_sum", "disc_c_sum"]
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
    money = ["qty_c_sum", "base_c_sum", "dp_e4_sum", "disc_c_sum"]
    sums = limb_cols(money) + ["n_sum"]
    partials = ds.map_batches(_q1_partial, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, _Q1_KEYS, sums)
    if tbl is None:  # partials over the combine budget: shuffle path
        tbl = collect_arrow(partials.groupby(_Q1_KEYS).sum(sums))
    qty = limb_values(tbl, "qty_c_sum")  # exact ints, any magnitude
    base = limb_values(tbl, "base_c_sum")
    dp = limb_values(tbl, "dp_e4_sum")
    disc = limb_values(tbl, "disc_c_sum")
    n = tbl.column("sum(n_sum)").to_numpy().astype(np.int64)
    _f = lambda vals, d: pa.array(
        [float(v) / d for v in vals], pa.float64()
    )
    out = pa.Table.from_pydict(
        {
            "l_returnflag": tbl.column("l_returnflag"),
            "l_linestatus": tbl.column("l_linestatus"),
            "sum_qty": _f(qty, 100.0),
            "sum_base_price": _f(base, 100.0),
            "sum_disc_price": _f(dp, 10000.0),
            "avg_qty": pa.array(
                [(float(q) / 100.0) / nn for q, nn in zip(qty, n)],
                pa.float64(),
            ),
            "avg_disc": pa.array(
                [(float(dd) / 100.0) / nn for dd, nn in zip(disc, n)],
                pa.float64(),
            ),
            "count_order": pa.array(n, pa.int64()),
        }
    )
    return out.sort_by([("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


# -- q3: broadcast join + group + distributed top-k ---------------------------

def _topk_merge(ds: ray.data.Dataset, key: str, k: int,
                tiebreak: str) -> list[dict]:
    """Per-block top-k inside map_batches, then a tiny driver merge.

    Scale note: ships only k rows per block to the driver instead of a
    global sort shuffle — the standard distributed top-k pattern.
    """

    def local_top(batch: pa.Table) -> pa.Table:
        order = [(key, "descending"), (tiebreak, "ascending")]
        idx = pc.sort_indices(batch, sort_keys=order)[:k]
        return batch.take(idx)

    heads = ds.map_batches(local_top, batch_format="pyarrow").take_all()
    heads.sort(key=lambda r: (-r[key], r[tiebreak]))
    return heads[:k]


def _q3_distributed_partials(
    sf_dir: str, segment: str
) -> ray.data.Dataset:
    """The any-cardinality q3 tier: two ``cogroup_attach`` semi-joins
    (orders ⋉ segment-customers by custkey, then per-batch lineitem
    revenue partials ⋉ qualifying orders by orderkey) — zero
    driver-side reads of the corpus-scaling sides. The dedup winner
    phase's over-budget shape applied to the TPC-H join chain."""
    from .joins import cogroup_attach

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def seg_keys(b: pa.Table) -> pa.Table:
        m = pc.fill_null(pc.equal(b.column("c_mktsegment"), segment), False)
        t = b.filter(m)
        return pa.Table.from_pydict(
            {"o_custkey": t.column("c_custkey"),
             "seg_ok": pa.array(np.ones(t.num_rows, np.int8), pa.int8())}
        )

    seg = cust.map_batches(seg_keys, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    marked = cogroup_attach(
        orders, seg, key="o_custkey",
        left_fields=[pa.field("o_orderkey", pa.int64()),
                     pa.field("o_custkey", pa.int64())],
        payload_fields=[pa.field("seg_ok", pa.int8())],
    )

    def to_marker(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("seg_ok").is_valid())
        return pa.Table.from_pydict(
            {"l_orderkey": t.column("o_orderkey"),
             "ord_ok": pa.array(np.ones(t.num_rows, np.int8), pa.int8())}
        )

    building = marked.map_batches(to_marker, batch_format="pyarrow")

    def li_prep(b: pa.Table) -> pa.Table:
        base_c = _cents(b.column("l_extendedprice"))
        disc_c = _cents(b.column("l_discount"))
        part = pa.Table.from_pydict(
            {"l_orderkey": b.column("l_orderkey"),
             "rev_e4": pa.array(base_c * (100 - disc_c), pa.int64())}
        )
        return part.group_by("l_orderkey").aggregate(
            [("rev_e4", "sum")]
        ).rename_columns(["l_orderkey", "rev_e4"])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    attached = cogroup_attach(
        li.map_batches(li_prep, batch_format="pyarrow"), building,
        key="l_orderkey",
        left_fields=[pa.field("l_orderkey", pa.int64()),
                     pa.field("rev_e4", pa.int64())],
        payload_fields=[pa.field("ord_ok", pa.int8())],
    )
    return _filter_matched(attached, "ord_ok")


def q3_shipping(
    sf_dir: str, segment: str = "BUILDING", k: int = 10,
    build_budget: int = DIM_BROADCAST_BUDGET,
) -> pa.Table:
    """Revenue of top-k orders for customers in a market segment.

    Under ``build_budget`` (parquet-footer row probe) customer and
    orders are broadcast build sides: filtered + projected to a sorted
    numpy key array, ``ray.put`` once (zero-copy plasma reads in every
    probe task); lineitem streams and probes with searchsorted. Past
    the budget — orders/customer grow linearly with the corpus — the
    fully distributed ``cogroup_attach`` tier runs instead
    (``_q3_distributed_partials``); both tiers share the top-k tail
    and are hash-pinned equal via the ``q3_top_orders_cogroup`` driver
    entry (build_budget=0).
    """
    cust = _broadcast_parquet(
        sf_dir, "customer", ["c_custkey", "c_mktsegment"],
        budget_rows=build_budget,
    )
    orders = (
        _broadcast_parquet(sf_dir, "orders", ["o_orderkey", "o_custkey"],
                           budget_rows=build_budget)
        if cust is not None else None
    )
    if cust is None or orders is None:
        partials = _q3_distributed_partials(sf_dir, segment)
    else:
        ckeys = cust.filter(
            pc.equal(cust.column("c_mktsegment"), segment)
        ).column("c_custkey").to_numpy()
        ckeys = np.sort(ckeys.astype(np.int64))

        okey = orders.column("o_orderkey").to_numpy().astype(np.int64)
        ocust = orders.column("o_custkey").to_numpy().astype(np.int64)
        building_orders = np.sort(okey[_sorted_member_mask(ckeys, ocust)])
        orders_ref = ray.put(building_orders)

        def probe(batch: pa.Table) -> pa.Table:
            keys_sorted = ray.get(orders_ref)  # zero-copy numpy from plasma
            lkeys = batch.column("l_orderkey").to_numpy().astype(np.int64)
            mask = _sorted_member_mask(keys_sorted, lkeys)
            lkeys = lkeys[mask]
            if lkeys.size == 0:
                return pa.Table.from_pydict(
                    {"l_orderkey": pa.array([], pa.int64()),
                     "rev_e4": pa.array([], pa.int64())}
                )
            base_c = _cents(batch.column("l_extendedprice"))[mask]
            disc_c = _cents(batch.column("l_discount"))[mask]
            part = pa.Table.from_pydict(
                {"l_orderkey": pa.array(lkeys, pa.int64()),
                 "rev_e4": pa.array(base_c * (100 - disc_c), pa.int64())}
            )
            return part.group_by("l_orderkey").aggregate(
                [("rev_e4", "sum")]
            ).rename_columns(["l_orderkey", "rev_e4"])

        li = _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount"],
        )
        partials = li.map_batches(probe, batch_format="pyarrow")
    merged = _combine_partials(partials, ["l_orderkey"], ["rev_e4"])
    if merged is not None:
        # driver-side top-k over the combined (small) per-order table
        idx = pc.sort_indices(
            merged,
            sort_keys=[("sum(rev_e4)", "descending"), ("l_orderkey", "ascending")],
        )[:k]
        head = merged.take(idx)
        okeys = head.column("l_orderkey").to_numpy().astype(np.int64)
        revs = head.column("sum(rev_e4)").to_numpy().astype(np.int64)
        top = [
            {"l_orderkey": int(o), "rev_e4": int(r)}
            for o, r in zip(okeys, revs)
        ]
    else:  # over the combine budget: Ray groupby shuffle + block top-k
        agg = partials.groupby("l_orderkey").sum("rev_e4")
        renamed = agg.map_batches(
            lambda b: b.rename_columns(["l_orderkey", "rev_e4"]),
            batch_format="pyarrow",
        )
        top = _topk_merge(renamed, "rev_e4", k, "l_orderkey")
    return pa.Table.from_pydict(
        {
            "l_orderkey": pa.array([r["l_orderkey"] for r in top], pa.int64()),
            "revenue": pa.array([r["rev_e4"] / 10000.0 for r in top], pa.float64()),
        }
    )


# -- q5-style multi-way broadcast join ---------------------------------------

def q5_region_revenue(sf_dir: str) -> pa.Table:
    """Revenue per region: lineitem ⋈ supplier ⋈ nation ⋈ region with the
    three small sides pre-joined on the driver into ONE dense numpy
    lookup (suppkey -> region id), broadcast via ray.put; partial agg
    per batch (np.bincount over region ids); tiny final groupby."""
    region = _broadcast_parquet(sf_dir, "region", ["r_regionkey", "r_name"])
    nation = _broadcast_parquet(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    supp = _broadcast_parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    r_names = region.column("r_name").to_pylist()
    r_keys = region.column("r_regionkey").to_numpy().astype(np.int64)
    rid_of = {int(k): i for i, k in enumerate(r_keys)}
    n_key = nation.column("n_nationkey").to_numpy().astype(np.int64)
    n_reg = nation.column("n_regionkey").to_numpy().astype(np.int64)
    nation_rid = np.full(int(n_key.max()) + 1, -1, dtype=np.int64)
    nation_rid[n_key] = [rid_of[int(r)] for r in n_reg]
    s_key = supp.column("s_suppkey").to_numpy().astype(np.int64)
    s_nat = supp.column("s_nationkey").to_numpy().astype(np.int64)
    # sorted-key lookup, NOT a dense max-id LUT: supplier ids are a
    # corpus-scaling sparse domain (VERDICT r3 wrong-list #2). A
    # dangling s_nationkey maps to -1 (drops, like the inner join).
    nat_ok = (s_nat >= 0) & (s_nat < len(nation_rid))
    rid_vals = np.where(
        nat_ok,
        nation_rid[np.clip(s_nat, 0, max(len(nation_rid) - 1, 0))],
        -1,
    )
    s_sorted, s_rid = _sorted_kv(s_key, rid_vals)
    lut_ref = ray.put((s_sorted, s_rid))
    n_regions = len(r_names)

    _EMPTY_Q5 = pa.Table.from_pydict(
        {"rid": pa.array([], pa.int64()),
         **{c: pa.array([], pa.int64()) for c in limb_cols(["rev_e4"])}}
    )

    def probe(batch: pa.Table) -> pa.Table:
        keys_s, rid_s = ray.get(lut_ref)  # zero-copy numpy
        if len(keys_s) == 0 or batch.num_rows == 0:
            return _EMPTY_Q5
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        # inner-join semantics: unknown suppkeys / no-region nations
        # (-1) contribute nothing (and never wrap into sums[-1])
        rid = _sorted_lookup(keys_s, rid_s, sk, -1)
        ok = rid >= 0
        base_c = _cents(batch.column("l_extendedprice"))[ok]
        disc_c = _cents(batch.column("l_discount"))[ok]
        rid = rid[ok]
        sums = np.zeros(n_regions, dtype=np.int64)
        np.add.at(sums, rid, base_c * (100 - disc_c))
        hit = np.zeros(n_regions, dtype=bool)
        hit[rid] = True  # emit only regions with activity (inner join)
        # five region groups absorb the whole corpus: limb-split so
        # the cross-block merge can never wrap int64
        return limb_split(
            pa.Table.from_pydict(
                {"rid": pa.array(np.nonzero(hit)[0], pa.int64()),
                 "rev_e4": pa.array(sums[hit], pa.int64())}
            ),
            ["rev_e4"],
        )

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
    partials = li.map_batches(probe, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    rcols = limb_cols(["rev_e4"])
    tbl = _combine_partials(partials, ["rid"], rcols)
    if tbl is None:  # over the combine budget: Ray groupby shuffle
        tbl = collect_arrow(partials.groupby("rid").sum(rcols))
    if tbl.num_rows == 0:
        return pa.Table.from_pydict(
            {"r_name": pa.array([], pa.string()),
             "revenue": pa.array([], pa.float64())}
        )
    rid = tbl.column("rid").to_numpy().astype(np.int64)
    rev = limb_values(tbl, "rev_e4")  # exact ints, any magnitude
    out = pa.Table.from_pydict(
        {
            "r_name": pa.array([r_names[i] for i in rid]),
            "revenue": pa.array(
                [float(v) / 10000.0 for v in rev], pa.float64()
            ),
        }
    )
    return out.sort_by([("r_name", "ascending")])


# -- sort / limit / distinct -------------------------------------------------

def topk_orders(sf_dir: str, k: int = 20) -> pa.Table:
    """Top-k by price: per-block top-k + driver merge (no global sort)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    top = _topk_merge(ds, "o_totalprice", k, "o_orderkey")
    return pa.Table.from_pydict(
        {
            "o_orderkey": pa.array([r["o_orderkey"] for r in top], pa.int64()),
            "o_totalprice": pa.array(
                [r["o_totalprice"] for r in top], pa.float64()
            ),
        }
    )


def topk_events_per_type(sf_dir: str, k: int = 5) -> pa.Table:
    """GROUPED top-k: per event_type, the k highest-value events (ties
    by event_id ascending) — the "top documents per domain" shape of
    training-data curation.

    Composition: each batch emits its own per-key top-k (vectorized
    lexsort + run heads — a combiner, so at most k*keys rows per block
    cross the wire), then one driver-side merge takes the global per-key
    top-k. No shuffle at any size: partials are bounded by k * #keys *
    #blocks, and #keys is small by construction for a grouped-top-k to
    make sense (salt the key otherwise).
    """
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def local_topk(batch: pa.Table) -> pa.Table:
        types = np.asarray(batch.column("event_type").to_pylist(), dtype=object)
        vals = batch.column("value").to_numpy(zero_copy_only=False)
        ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -vals, types))
        types_s, keep_rows = types[order], []
        new_run = np.concatenate(([True], types_s[1:] != types_s[:-1]))
        run_id = np.cumsum(new_run) - 1
        starts = np.nonzero(new_run)[0][run_id]
        pos = np.arange(len(types_s)) - starts
        keep_rows = order[pos < k]
        return batch.take(pa.array(np.sort(keep_rows)))

    parts = [
        t
        for t in ray.get(
            ds.map_batches(local_topk, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.Table.from_pydict(
            {
                "event_type": pa.array([], pa.string()),
                "event_id": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
            }
        )
    merged = pa.concat_tables(parts)
    final = local_topk(merged)
    out = final.select(["event_type", "event_id", "value"])
    return out.sort_by(
        [("event_type", "ascending"), ("value", "descending"),
         ("event_id", "ascending")]
    )


def distinct_segments(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.Table.from_pydict({"c_mktsegment": pa.array(vals)})


def _sorted_value_counts(
    sf_dir: str, table: str, column: str
) -> tuple[np.ndarray, np.ndarray]:
    """The shared exact-quantile primitive: (sorted distinct values,
    counts) of a numeric column via per-block np.unique combiners +
    one key-only merge (budgeted driver combine, Ray groupby
    fallback). O(distinct) on the wire, never O(rows), and no global
    sort of the data ever happens."""
    ds = _read(sf_dir, table, [column])

    def local_counts(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.Table.from_pydict(
            {
                "value": pa.array(uniq.astype(np.float64), pa.float64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = ds.map_batches(local_counts, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    merged = _combine_partials(partials, keys=["value"], sum_cols=["cnt"])
    if merged is None:
        # over-limit distinct set: Ray groupby shuffle, then the final
        # (now per-distinct-value) result lands for the cum-scan
        shuffled = partials.groupby("value").sum("cnt")
        merged = pa.concat_tables(
            [t for t in ray.get(shuffled.materialize().to_arrow_refs())
             if t.num_rows]
        )
    vals = merged.column("value").to_numpy(zero_copy_only=False)
    cnts = merged.column("sum(cnt)").to_numpy(zero_copy_only=False)
    order = np.argsort(vals, kind="stable")
    return vals[order], cnts[order]


def exact_quantiles(
    sf_dir: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    table: str = "lineitem",
    column: str = "l_quantity",
) -> pa.Table:
    """EXACT discrete quantiles of a numeric column, computed as a
    value-count aggregate instead of a global sort: each batch emits
    its (value, cnt) histogram (np.unique combiner), one groupby
    merges them, and the driver takes the quantile from the sorted
    cumulative counts — ``index = max(0, ceil(q*n) - 1)``, matching
    DuckDB ``quantile_disc``.

    Scale shape: the exchange carries one row per DISTINCT value per
    block — for bounded-cardinality columns (quantities, sizes,
    scores at fixed precision) that is O(distinct), never O(rows), and
    no sort of the data ever happens. For genuinely continuous
    columns, bucket first (fixed-width bins) and refine the one
    boundary bin with a second pass — same primitive, two rounds.
    """
    vals, cnts = _sorted_value_counts(sf_dir, table, column)
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return pa.Table.from_pydict(
            {"q": pa.array([], pa.float64()),
             "value": pa.array([], pa.float64())}
        )
    out_q, out_v = [], []
    for q in qs:
        idx = max(0, int(np.ceil(q * n)) - 1)
        pos = int(np.searchsorted(cum, idx + 1))
        out_q.append(round(float(q), 6))
        out_v.append(float(vals[pos]))
    return pa.Table.from_pydict(
        {
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        }
    )


def exact_quantiles_cont(
    sf_dir: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    table: str = "lineitem",
    column: str = "l_quantity",
) -> pa.Table:
    """EXACT continuous (interpolated) quantiles — the
    ``quantile_cont`` / PERCENTILE_CONT sibling of ``exact_quantiles``:
    same O(distinct) value-count exchange, but the driver interpolates
    between the two adjacent order statistics at rank ``h = q*(n-1)``
    (``v_lo + (v_hi - v_lo) * (h - floor(h))``, the standard linear
    rule) instead of snapping to one. No sort of the data; two
    searchsorted probes per requested quantile.
    """
    vals, cnts = _sorted_value_counts(sf_dir, table, column)
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return pa.Table.from_pydict(
            {"q": pa.array([], pa.float64()),
             "value": pa.array([], pa.float64())}
        )

    def order_stat(i: int) -> float:
        return float(vals[int(np.searchsorted(cum, i + 1))])

    out_q, out_v = [], []
    for q in qs:
        h = q * (n - 1)
        lo = int(np.floor(h))
        hi = min(lo + 1, n - 1)
        v_lo, v_hi = order_stat(lo), order_stat(hi)
        out_q.append(round(float(q), 6))
        out_v.append(v_lo + (v_hi - v_lo) * (h - lo))
    return pa.Table.from_pydict(
        {"q": pa.array(out_q, pa.float64()),
         "value": pa.array(out_v, pa.float64())}
    )


def anti_join_customers(
    sf_dir: str,
    min_price: float = 300_000.0,
    build_broadcast_budget: int = 2_000_000,
) -> pa.Table | ray.data.Dataset:
    """Customers with NO order above ``min_price`` — the distributed
    ANTI-JOIN primitive (the complement of the semi-join used by
    dedup's winner filter).

    Tiers, same discipline as every join in this repo: the build side
    is first reduced to DISTINCT keys (a key-only groupby count — the
    only thing that ever shuffles); under
    ``build_broadcast_budget`` those keys broadcast and the probe side
    streams through a vectorized sorted-membership mask; past the
    budget, ``cogroup_attach`` marks matches and a null-filter keeps
    the anti rows — fully distributed at any key cardinality.
    """
    from .joins import cogroup_attach

    customers = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def high_value(batch: pa.Table) -> pa.Table:
        mask = pc.greater(batch.column("o_totalprice"), min_price)
        return batch.filter(pc.fill_null(mask, False)).select(["o_custkey"])

    okeys = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(high_value, batch_format="pyarrow")
        .groupby("o_custkey")
        .count()
    )

    from .dedup import _collect_within_budget

    keys_tbl = _collect_within_budget(
        okeys.select_columns(["o_custkey"]), build_broadcast_budget
    )
    if keys_tbl is not None:
        have = np.sort(
            keys_tbl.column("o_custkey").to_numpy(zero_copy_only=False)
        ) if keys_tbl.num_rows else np.empty(0, np.int64)
        have_ref = ray.put(have)

        def anti(batch: pa.Table) -> pa.Table:
            keys = ray.get(have_ref)
            probe = batch.column("c_custkey").to_numpy(zero_copy_only=False)
            mask = _sorted_member_mask(keys, probe)
            return batch.filter(pa.array(~mask))

        out = customers.map_batches(anti, batch_format="pyarrow")
        parts = [
            t for t in ray.get(out.materialize().to_arrow_refs())
            if t.num_rows
        ]
        if not parts:
            return pa.Table.from_pydict(
                {"c_custkey": pa.array([], pa.int64()),
                 "c_name": pa.array([], pa.string())}
            )
        return pa.concat_tables(parts).sort_by(
            [("c_custkey", "ascending")]
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "c_custkey": batch.column("o_custkey"),
                "hit": pa.array(
                    np.ones(batch.num_rows, np.int8), pa.int8()
                ),
            }
        )

    joined = cogroup_attach(
        customers,
        okeys.map_batches(rename, batch_format="pyarrow"),
        key="c_custkey",
        left_fields=[
            pa.field("c_custkey", pa.int64()),
            pa.field("c_name", pa.string()),
        ],
        payload_fields=[pa.field("hit", pa.int8())],
    )

    def keep_anti(batch: pa.Table) -> pa.Table:
        return batch.filter(
            batch.column("hit").is_null()
        ).drop_columns(["hit"])

    return joined.map_batches(keep_anti, batch_format="pyarrow")


def filter_project_lineitem(
    sf_dir: str, min_qty: float = 45.0, driver_sort_budget: int = 2_000_000
) -> pa.Table:
    """Predicate pushdown demo: the row filter is pushed into
    ``read_parquet`` itself (parquet row-group statistics prune at the
    scan — only qualifying row groups leave storage) on top of column
    pruning.

    The query contract returns a sorted in-memory table, so some
    driver landing is inherent; the SORT only runs on the driver while
    the filtered result is under ``driver_sort_budget`` rows — past it,
    Ray's distributed range-partition sort orders the blocks and the
    driver just concatenates them in block order (VERDICT r1 item 7).
    """
    import pyarrow.dataset as pads

    from .io import strip_pandas_metadata

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
        filter=pads.field("l_quantity") >= min_qty,
    ).map_batches(strip_pandas_metadata, batch_format="pyarrow")

    mat = ds.materialize()
    if mat.count() > driver_sort_budget:
        mat = mat.sort(["l_orderkey", "l_linenumber"]).materialize()
        parts = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
        return pa.concat_tables(parts)
    parts = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(parts) if parts else pa.table(
        {"l_orderkey": [], "l_linenumber": [], "l_quantity": []}
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
                "value_c": pa.array(_cents(batch.column("value")), pa.int64()),
                "n": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )
        return (
            t.group_by(["hour", "event_type"])
            .aggregate([("value_c", "sum"), ("n", "sum")])
            .rename_columns(["hour", "event_type", "value_c", "n"])
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["hour", "event_type"], ["value_c", "n"])
    if tbl is None:  # over the combine budget: Ray groupby shuffle,
        # collected as Arrow blocks (no per-row Python dicts)
        agg = partials.groupby(["hour", "event_type"]).sum(["value_c", "n"])
        tbl = collect_arrow(agg)
    out = pa.Table.from_pydict(
        {
            "hour": tbl.column("hour"),
            "event_type": tbl.column("event_type"),
            "sum_value": pa.array(
                tbl.column("sum(value_c)").to_numpy().astype(np.int64) / 100.0,
                pa.float64(),
            ),
            "n_events": pc.cast(tbl.column("sum(n)"), pa.int64()),
        }
    )
    return out.sort_by([("hour", "ascending"), ("event_type", "ascending")])


def sessionize(
    sf_dir: str, gap_us: int = SESSION_GAP_US,
    sink_dir: str | None = None,
) -> pa.Table | str:
    """Per-user session count, 30-min gap rule.

    The stateful-per-key window Ray Data lacks as a primitive
    (SURVEY.md custom-operator note), on the repo's coarse-partition +
    key-runs pattern (see pipelines/dedup.py): group on
    ``hash(user_id) % P`` — every user lands wholly in one partition —
    then one vectorized pass over the sorted partition handles ALL its
    users (run boundaries + a prefix-sum of gap flags), instead of
    paying Ray's per-distinct-key Python call that a raw
    ``groupby(user_id).map_groups`` costs at corpus-scale key counts.
    """
    num_parts = 2 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        part = (users.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            num_parts
        )
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    def sess_part(group: pa.Table) -> pa.Table:
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        if not len(users):
            return pa.Table.from_pydict(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((ts, users))
        users, ts = users[order], ts[order]
        starts = np.concatenate(
            ([0], np.nonzero(users[1:] != users[:-1])[0] + 1)
        )
        ends = np.concatenate((starts[1:], [len(users)]))
        # prefix sum of gap flags; run-interior gaps are cs[e-1]-cs[s]
        new_sess = np.concatenate(
            ([0], (np.diff(ts) > gap_us).astype(np.int64))
        )
        cs = np.cumsum(new_sess)
        n_sessions = 1 + (cs[ends - 1] - cs[starts])
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(users[starts], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "n_sessions": pa.array(n_sessions, pa.int64()),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: sess_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return to_table_or_sink(out, [("user_id", "ascending")], sink_dir)


def range_join_events(
    sf_dir: str,
    window_min: int = 60,
    left_type: str = "purchase",
    right_type: str = "click",
    sink_dir: str | None = None,
) -> pa.Table | str:
    """RANGE (interval) join: every ``right_type`` event of the same
    user within ``[ts - window, ts]`` of each ``left_type`` event.

    Ray Data has no range-join primitive; same composition as the
    as-of join (custom-operator rule a): one scan filters both sides,
    a coarse ``hash(user_id) % P`` partition co-locates each user, and
    inside the group a sorted-merge finds each purchase's click window
    with TWO searchsorted calls per user run — pairs then materialize
    with the vectorized repeat/arange block trick (no per-row loop).
    Output column names match the DuckDB range-join oracle.
    """
    window_us = window_min * 60 * 1_000_000
    num_parts = 2 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch.column("event_type"),
            value_set=pa.array([left_type, right_type]),
        )
        t = batch.filter(mask)
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        part = (users.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            num_parts
        )
        return t.append_column("part", pa.array(part.astype(np.int32)))

    def range_group(group: pa.Table) -> pa.Table:
        et = group.column("event_type").to_pylist()
        is_left = np.array([e == left_type for e in et], dtype=bool)
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        ev = group.column("event_id").to_numpy(zero_copy_only=False)

        lu, lt_, le = users[is_left], ts[is_left], ev[is_left]
        ru, rt, re_ = users[~is_left], ts[~is_left], ev[~is_left]
        lo_ix = np.lexsort((lt_, lu))
        ro_ix = np.lexsort((rt, ru))
        lu, lt_, le = lu[lo_ix], lt_[lo_ix], le[lo_ix]
        ru, rt, re_ = ru[ro_ix], rt[ro_ix], re_[ro_ix]

        lo = np.zeros(len(lu), dtype=np.int64)
        hi = np.zeros(len(lu), dtype=np.int64)
        if len(ru) and len(lu):
            r_starts = np.concatenate(([0], np.nonzero(ru[1:] != ru[:-1])[0] + 1))
            r_users = ru[r_starts]
            r_ends = np.concatenate((r_starts[1:], [len(ru)]))
            run_of = {int(u): k for k, u in enumerate(r_users)}
            l_starts = np.concatenate(([0], np.nonzero(lu[1:] != lu[:-1])[0] + 1))
            l_ends = np.concatenate((l_starts[1:], [len(lu)]))
            for s, e in zip(l_starts, l_ends):
                k = run_of.get(int(lu[s]))
                if k is None:
                    continue
                rs, rend = int(r_starts[k]), int(r_ends[k])
                seg = rt[rs:rend]
                lo[s:e] = rs + np.searchsorted(seg, lt_[s:e] - window_us, "left")
                hi[s:e] = rs + np.searchsorted(seg, lt_[s:e], "right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return pa.Table.from_pydict(
                {
                    "event_id": pa.array([], pa.int64()),
                    "click_event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "click_ts": pa.array([], pa.timestamp("us")),
                }
            )
        li = np.repeat(np.arange(len(lu), dtype=np.int64), counts)
        block_off = np.cumsum(counts) - counts
        ri = (
            np.arange(total, dtype=np.int64)
            - np.repeat(block_off, counts)
            + np.repeat(lo, counts)
        )
        return pa.Table.from_pydict(
            {
                "event_id": pa.array(le[li], pa.int64()),
                "click_event_id": pa.array(re_[ri], pa.int64()),
                "user_id": pa.array(lu[li], pa.int64()),
                "ts": pa.array(lt_[li].astype("datetime64[us]")),
                "click_ts": pa.array(rt[ri].astype("datetime64[us]")),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: range_group(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    res = to_table_or_sink(
        out, [("event_id", "ascending"), ("click_event_id", "ascending")],
        sink_dir,
    )
    if isinstance(res, str):
        return res
    if res.num_rows == 0:
        return range_group(
            pa.Table.from_pydict(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "event_type": pa.array([], pa.string()),
                }
            )
        )
    return res


# -- as-of join: the canonical "operator Ray Data lacks" -----------------------

def asof_join_events(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "click",
                     sink_dir: str | None = None) -> pa.Table | str:
    """For each ``left_type`` event, the latest ``right_type`` event of
    the same user at or before it (ASOF LEFT JOIN semantics).

    Ray Data has no asof/range join primitive; this composes one from
    the repo's standard parts (SURVEY.md custom-operator rule a):
    filter both sides in ONE scan, co-partition by a coarse
    crc32(user_id) bucket (each user entirely in one group), and run a
    vectorized sorted-merge inside the group: sort each side by
    (user, ts), then one searchsorted per user run finds the
    predecessor click for all of that user's purchases at once.
    Output column names match the DuckDB ASOF JOIN oracle.
    """
    num_parts = 2 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch.column("event_type"),
            value_set=pa.array([left_type, right_type]),
        )
        t = batch.filter(mask)
        users = t.column("user_id").to_numpy(zero_copy_only=False)
        part = (users.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            num_parts
        )
        return t.append_column("part", pa.array(part.astype(np.int32)))

    def asof_group(group: pa.Table) -> pa.Table:
        et = group.column("event_type").to_pylist()
        is_left = np.array([e == left_type for e in et], dtype=bool)
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        ev = group.column("event_id").to_numpy(zero_copy_only=False)

        lu, lt_, le = users[is_left], ts[is_left], ev[is_left]
        ru, rt = users[~is_left], ts[~is_left]
        # sort both sides by (user, ts) — the merge invariant
        lo = np.lexsort((lt_, lu))
        ro = np.lexsort((rt, ru))
        lu, lt_, le = lu[lo], lt_[lo], le[lo]
        ru, rt = ru[ro], rt[ro]

        match_ts = np.full(len(lu), np.iinfo(np.int64).min, dtype=np.int64)
        if len(ru) and len(lu):
            # user-run boundaries on both sides; ONE searchsorted per
            # left user run, vectorized over that user's purchases
            r_starts = np.concatenate(([0], np.nonzero(ru[1:] != ru[:-1])[0] + 1))
            r_users = ru[r_starts]
            r_ends = np.concatenate((r_starts[1:], [len(ru)]))
            run_of = {int(u): k for k, u in enumerate(r_users)}
            l_starts = np.concatenate(([0], np.nonzero(lu[1:] != lu[:-1])[0] + 1))
            l_ends = np.concatenate((l_starts[1:], [len(lu)]))
            for s, e in zip(l_starts, l_ends):
                k = run_of.get(int(lu[s]))
                if k is None:
                    continue
                rs, re_ = int(r_starts[k]), int(r_ends[k])
                # rightmost right-ts <= left-ts, for the whole run at once
                j = np.searchsorted(rt[rs:re_], lt_[s:e], side="right")
                hit = j > 0
                match_ts[s:e][hit] = rt[rs + j[hit] - 1]
        has = match_ts != np.iinfo(np.int64).min
        return pa.Table.from_pydict(
            {
                "event_id": pa.array(le, pa.int64()),
                "user_id": pa.array(lu, pa.int64()),
                "ts": pa.array(lt_.astype("datetime64[us]")),
                "click_ts": pa.array(
                    np.where(has, match_ts, 0).astype("datetime64[us]"),
                    mask=~has,
                ),
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: asof_group(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return to_table_or_sink(out, [("event_id", "ascending")], sink_dir)


# -- sliding-window aggregate -------------------------------------------------

def events_sliding_window(
    sf_dir: str, window_min: int = 60, slide_min: int = 15
) -> pa.Table:
    """Sliding-window aggregate: per (window_start, event_type), the
    event count and exact value sum over [window_start, window_start +
    window) for windows aligned to the slide interval.

    Ray Data has no window primitive; the standard composition is
    window-assignment expansion (each event belongs to window/slide
    windows — vectorized np.repeat, no Python row loop) followed by
    the same partial-aggregate + small-groupby shape as every other
    aggregate here. Value sums use int64 cents so the result is
    bit-stable against the DuckDB oracle.
    """
    assert window_min % slide_min == 0
    k = window_min // slide_min
    slide_us = slide_min * 60 * 1_000_000
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        vc = _cents(batch.column("value"))
        types = batch.column("event_type")
        bucket0 = (ts // slide_us) * slide_us
        n = len(ts)
        # windows bucket0 - j*slide for j in 0..k-1 (vectorized repeat)
        starts = np.repeat(bucket0, k) - np.tile(
            np.arange(k, dtype=np.int64) * slide_us, n
        )
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        t = pa.Table.from_pydict(
            {
                "window_start": pa.array(starts.astype("datetime64[us]")),
                "event_type": types.take(pa.array(idx)),
                "value_c": pa.array(vc[idx], pa.int64()),
                "n": pa.array(np.ones(n * k, dtype=np.int64)),
            }
        )
        return (
            t.group_by(["window_start", "event_type"])
            .aggregate([("value_c", "sum"), ("n", "sum")])
            .rename_columns(["window_start", "event_type", "value_c", "n"])
        )

    partials = ds.map_batches(expand, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(
        partials, ["window_start", "event_type"], ["value_c", "n"]
    )
    if tbl is None:  # over the combine budget: Ray groupby shuffle,
        # collected as Arrow blocks (no per-row Python dicts)
        agg = partials.groupby(["window_start", "event_type"]).sum(
            ["value_c", "n"]
        )
        tbl = collect_arrow(agg)
    out = pa.Table.from_pydict(
        {
            "window_start": tbl.column("window_start"),
            "event_type": tbl.column("event_type"),
            "sum_value": pa.array(
                tbl.column("sum(value_c)").to_numpy().astype(np.int64) / 100.0,
                pa.float64(),
            ),
            "n_events": pc.cast(tbl.column("sum(n)"), pa.int64()),
        }
    )
    return out.sort_by(
        [("window_start", "ascending"), ("event_type", "ascending")]
    )


def events_moving_avg(
    sf_dir: str,
    window_rows: int = 3,
    sink_dir: str | None = None,
    driver_budget: int = 2_000_000,
) -> pa.Table | str:
    """Per-key ROWS-frame moving average — ``AVG(value) OVER
    (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN w-1
    PRECEDING AND CURRENT ROW)`` — the per-row-output window shape Ray
    Data lacks (``events_sliding_window`` covers the per-WINDOW
    aggregate; this one keeps one output row per input row).

    Same coarse-partition + key-runs composition as ``sessionize``:
    one ``hash(user_id) % P`` exchange co-locates each user, then a
    single vectorized pass over the lexsorted partition computes ALL
    users' windows with ``window_rows - 1`` shifted adds (run
    boundaries masked) — no cumsum (so no accumulator overflow at any
    partition length) and no per-key Python call. Float op order is
    the left-assoc ``v + lag1 + ... + lag_{w-1}`` mirrored verbatim by
    the oracle's COALESCE(LAG(...)) chain, so the result is
    bit-identical, not just 6dp-close.

    Scale: output is row-per-event and never lands on the driver when
    ``sink_dir`` is given (streamed sharded parquet); the default
    in-memory Table return is the query-API contract for the gate.
    """
    from .io import parquet_num_rows

    num_parts = 2 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        part = (users.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            num_parts
        )
        return batch.append_column("part", pa.array(part.astype(np.int32)))

    _EMPTY = pa.Table.from_pydict(
        {"event_id": pa.array([], pa.int64()),
         "mov_avg": pa.array([], pa.float64()),
         "n_window": pa.array([], pa.int64())}
    )

    def window_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if not n:
            return _EMPTY
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        eids = group.column("event_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(np.int64)
        vals = group.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        order = np.lexsort((eids, ts, users))
        users, eids, vals = users[order], eids[order], vals[order]
        # left-assoc add of the j-back value wherever the run reaches
        # back j rows (users[i-j] == users[i]); same-op-order as the
        # oracle's value + COALESCE(LAG(value, j), 0) chain
        s = vals.copy()
        cnt = np.ones(n, dtype=np.int64)
        reach = np.ones(n, dtype=bool)  # run extends j rows back
        for j in range(1, window_rows):
            reach[j:] &= users[j:] == users[:-j]
            reach[:j] = False
            s[j:] = np.where(reach[j:], s[j:] + vals[:-j], s[j:])
            cnt[j:] += reach[j:]
        return pa.Table.from_pydict(
            {"event_id": pa.array(eids, pa.int64()),
             "mov_avg": pa.array(s / cnt, pa.float64()),
             "n_window": pa.array(cnt, pa.int64())}
        )

    # footer-probe budget gate (the house tier convention): within
    # budget ONE driver pass over the concatenated blocks replaces the
    # Ray groupby exchange, whose fixed cost dwarfs a <=2M-row window;
    # past it (or when sinking) the hash(user) partition runs at any
    # cardinality. Tier equality is pytest-pinned and the forced
    # grouped tier is its own driver entry.
    if (
        sink_dir is None
        and driver_budget
        and parquet_num_rows(f"{sf_dir}/events.parquet") <= driver_budget
    ):
        tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        whole = (
            pa.concat_tables(tables).combine_chunks()
            if tables
            else pa.Table.from_pydict(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "ts": pa.array([], pa.timestamp("us")),
                 "value": pa.array([], pa.float64())}
            )
        )
        return window_part(whole).sort_by([("event_id", "ascending")])
    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: window_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return to_table_or_sink(out, [("event_id", "ascending")], sink_dir)


def bloom_semi_join(
    sf_dir: str,
    priority: str = "1-URGENT",
    use_bloom: bool = True,
    bloom_bits_per_key: int = 16,
    bloom_max_bits: int = 1 << 27,
    combine_limit: int = 2_000_000,
    verify_budget: int = DIM_BROADCAST_BUDGET,
) -> pa.Table:
    """Semi-join-aggregate with BLOOM-FILTER PUSHDOWN — per
    linestatus totals of lineitems whose order is ``priority``.

    The classic big-join pre-filter at 100 TB: the probe side is never
    broadcast-joined and never ships non-matching rows into the
    exchange. Three stages, all bounded:

    1. **Build**: urgent orderkeys reduce per block to a bit-packed
       Bloom bitmap (``joins.int_bloom_build``, mergeable by OR);
       partials fold in a log-depth ``ray.remote`` OR tree (OR is the
       one register merge a Dataset aggregation can't express). The
       bitmap is sized from the orders parquet FOOTER row count (no
       execution) at ``bloom_bits_per_key`` bits/key, capped at
       ``bloom_max_bits`` (16 MiB packed) — past the cap the fill
       fraction rises and the filter passes more false positives, but
       NEVER breaks correctness (no false negatives + exact verify),
       so the cap degrades throughput gracefully instead of gating.
    2. **Probe**: one pure map over lineitem keeps bloom-passing rows
       and pre-aggregates them to (l_orderkey, l_linestatus) partial
       rows — the exchange that follows carries true matches plus a
       ``fill**k`` sliver of false positives, pre-combined.
    3. **Verify + final**: an exact key-only ``cogroup_attach``
       against the urgent keys drops the false positives (orderkeys
       are unique per order, the cogroup contract), then the usual
       bounded combine (Ray-groupby fallback past ``combine_limit``)
       folds to the few linestatus rows.

    ``use_bloom=False`` runs the identical DAG minus the prefilter —
    the tier-equality pin and the honest baseline for measuring the
    filter's exchange savings. When the orders FOOTER row count fits
    ``verify_budget`` the verify is instead an exact broadcast
    (sorted-key searchsorted membership inside the probe map — zero
    exchanges, the small-dim fast path; the bloom adds nothing there
    and is skipped); ``verify_budget=0`` forces the bloom+cogroup tier
    that works at any build-side cardinality.
    """
    from .io import parquet_num_rows
    from .joins import bloom_or_reduce, cogroup_attach, int_bloom_build, int_bloom_query

    urgent = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def keys_only(batch: pa.Table) -> pa.Table:
        mask = pc.equal(
            pc.fill_null(batch.column("o_orderpriority"), ""), priority
        )
        return batch.filter(mask).select(["o_orderkey"])

    key_ds = urgent.map_batches(keys_only, batch_format="pyarrow")
    # one build-side scan serves both the bloom build and the verify
    key_ds = key_ds.materialize()
    n_upper = max(1, parquet_num_rows(f"{sf_dir}/orders.parquet"))
    broadcast_tier = bool(verify_budget) and n_upper <= verify_budget

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus", "l_quantity"])

    keys_ref = None
    bits_ref = None
    if broadcast_tier:
        key_tables = [t for t in ray.get(key_ds.to_arrow_refs()) if t.num_rows]
        sorted_keys = np.sort(
            np.concatenate(
                [t.column("o_orderkey").to_numpy(zero_copy_only=False)
                 for t in key_tables]
            )
            if key_tables
            else np.empty(0, np.int64)
        )
        keys_ref = ray.put(sorted_keys)
    elif use_bloom:
        m = 1 << min(
            int(bloom_max_bits).bit_length() - 1,
            max(10, (bloom_bits_per_key * n_upper - 1).bit_length()),
        )

        def bloom_partial(batch: pa.Table) -> pa.Table:
            keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {"bits": pa.array([int_bloom_build(keys, m).tobytes()])}
            )

        bitmap = bloom_or_reduce(
            key_ds.map_batches(bloom_partial, batch_format="pyarrow"), m
        )
        bits_ref = ray.put(bitmap)

    def probe(batch: pa.Table) -> pa.Table:
        keys = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        if keys_ref is not None:  # broadcast tier: exact membership
            mask = _sorted_member_mask(ray.get(keys_ref), keys)
            batch = batch.filter(pa.array(mask))
        elif bits_ref is not None:  # distributed tier: bloom prefilter
            mask = int_bloom_query(ray.get(bits_ref), keys)
            batch = batch.filter(pa.array(mask))
        qty_c = _cents(batch.column("l_quantity"))
        t = pa.Table.from_pydict(
            {"l_orderkey": batch.column("l_orderkey"),
             "l_linestatus": batch.column("l_linestatus"),
             "qty_c": pa.array(qty_c, pa.int64()),
             "n": pa.array(np.ones(batch.num_rows, dtype=np.int64))}
        )
        return t.group_by(["l_orderkey", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("n", "sum")]
        ).rename_columns(["l_orderkey", "l_linestatus", "qty_c", "n"])

    survivors = li.map_batches(probe, batch_format="pyarrow")
    if broadcast_tier:
        # already exact; drop the key and fold straight to linestatus
        verified_partials = survivors.map_batches(
            lambda b: b.drop_columns(["l_orderkey"])
            .group_by(["l_linestatus"])
            .aggregate([("qty_c", "sum"), ("n", "sum")])
            .rename_columns(["l_linestatus", "qty_c", "n"]),
            batch_format="pyarrow",
        )
    else:
        flagged = key_ds.map_batches(
            lambda b: pa.Table.from_pydict(
                {"l_orderkey": b.column("o_orderkey"),
                 "flag": pa.array(np.ones(b.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow",
        )
        verified = cogroup_attach(
            survivors,
            flagged,
            key="l_orderkey",
            left_fields=[
                pa.field("l_orderkey", pa.int64()),
                pa.field("l_linestatus", pa.string()),
                pa.field("qty_c", pa.int64()),
                pa.field("n", pa.int64()),
            ],
            payload_fields=[pa.field("flag", pa.int64())],
        )

        def keep_matched(batch: pa.Table) -> pa.Table:
            mask = pc.equal(pc.fill_null(batch.column("flag"), 0), 1)
            kept = batch.filter(mask)
            t = pa.Table.from_pydict(
                {"l_linestatus": kept.column("l_linestatus"),
                 "qty_c": kept.column("qty_c"),
                 "n": kept.column("n")}
            )
            return t.group_by(["l_linestatus"]).aggregate(
                [("qty_c", "sum"), ("n", "sum")]
            ).rename_columns(["l_linestatus", "qty_c", "n"])

        verified_partials = verified.map_batches(
            keep_matched, batch_format="pyarrow"
        )
    partials = verified_partials
    partials = partials.materialize()
    tbl = _combine_partials(
        partials, ["l_linestatus"], ["qty_c", "n"], combine_limit
    )
    if tbl is None:  # over the combine budget: Ray groupby shuffle
        tbl = pa.Table.from_pylist(
            partials.groupby("l_linestatus").sum(["qty_c", "n"]).take_all()
        )
    out = pa.Table.from_pydict(
        {"l_linestatus": tbl.column("l_linestatus"),
         "sum_qty": pa.array(
             tbl.column("sum(qty_c)").to_numpy().astype(np.int64) / 100.0,
             pa.float64(),
         ),
         "n_items": pc.cast(tbl.column("sum(n)"), pa.int64())}
    )
    return out.sort_by([("l_linestatus", "ascending")])


def _skyline_kernel(
    keys: np.ndarray, dates: np.ndarray, prices: np.ndarray
) -> np.ndarray:
    """Indices of the 2-D PARETO FRONT maximizing (date, price):
    a row is dominated iff some other row is STRICTLY greater in both.
    One lexsort (date desc) + a run-wise cummax: a row survives iff no
    strictly-later date carries a strictly higher price. Date ties
    share a run, so equal-date rows never dominate each other and
    exact (date, price) duplicates all survive — mirroring the
    NOT EXISTS (b.price > a.price AND b.date > a.date) oracle."""
    n = len(keys)
    if n == 0:
        return np.empty(0, np.int64)
    order = np.lexsort((keys, -prices, -dates))
    d, p = dates[order], prices[order]
    starts = np.r_[True, d[1:] != d[:-1]]
    run_id = np.cumsum(starts) - 1
    run_max = np.maximum.reduceat(p, np.flatnonzero(starts))
    best_before = np.concatenate(
        ([-np.inf], np.maximum.accumulate(run_max)[:-1].astype(np.float64))
    )
    keep = p >= best_before[run_id]
    return order[keep]


def pareto_orders(
    sf_dir: str, merge_budget: int = 2_000_000, max_passes: int = 4
) -> pa.Table:
    """Skyline query: the Pareto front of orders maximizing
    (o_orderdate, o_totalprice) — no other order is strictly later AND
    strictly more expensive.

    The skyline operator has the ideal distributed algebra: a LOCAL
    skyline pass only ever removes dominated rows and can never remove
    a global skyline member, so ``skyline(union of local skylines) ==
    skyline(all)`` — partials are mergeable and idempotent, exactly
    like sketch registers. Shape: one ``map_batches`` local pass (on
    random data a block's skyline is ~O(log n) rows), then the driver
    merges the surviving rows with the same kernel. Adversarial
    (perfectly anti-correlated) data can make partials large, so the
    merge is budget-gated: past ``merge_budget`` the survivors
    repartition to fewer blocks and take another LOCAL pass (each pass
    strictly shrinks unless the true skyline itself exceeds the
    budget, in which case the answer is legitimately that large and
    lands after ``max_passes``).
    """
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

    def local(batch: pa.Table) -> pa.Table:
        keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        dates = (
            batch.column("o_orderdate")
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        prices = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        idx = _skyline_kernel(keys, dates, prices)
        return batch.take(pa.array(idx, pa.int64()))

    surv = ds.map_batches(local, batch_format="pyarrow").materialize()
    passes = 0
    while surv.count() > merge_budget and passes < max_passes:
        nblocks = max(1, surv.num_blocks() // 4)
        surv = (
            surv.repartition(nblocks)
            .map_batches(local, batch_format="pyarrow")
            .materialize()
        )
        passes += 1
    tbl = pa.Table.from_pylist(surv.take_all())
    if tbl.num_rows == 0:
        return pa.Table.from_pydict(
            {"o_orderkey": pa.array([], pa.int64()),
             "o_orderdate": pa.array([], pa.timestamp("us")),
             "o_totalprice": pa.array([], pa.float64())}
        )
    tbl = tbl.select(["o_orderkey", "o_orderdate", "o_totalprice"])
    keys = tbl.column("o_orderkey").to_numpy(zero_copy_only=False)
    dates = (
        tbl.column("o_orderdate").to_numpy().astype("datetime64[us]").astype(np.int64)
    )
    prices = tbl.column("o_totalprice").to_numpy(zero_copy_only=False)
    idx = _skyline_kernel(keys, dates, prices)
    return tbl.take(pa.array(np.sort(idx), pa.int64())).sort_by(
        [("o_orderdate", "ascending"), ("o_orderkey", "ascending")]
    )


def props_extract(sf_dir: str) -> pa.Table:
    """Semi-structured extraction: pull the numeric ``k`` field out of
    the JSON ``props`` string column with ONE vectorized regex
    (``pc.extract_regex`` — no per-row json.loads), then the standard
    partial-agg shape per event_type. The pattern is RE2 on both sides
    (pyarrow and DuckDB), so extraction agrees byte-for-byte.

    Output: (event_type, n, sum_k, avg_k)."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        props = batch.column("props")
        if isinstance(props, pa.ChunkedArray):
            props = props.combine_chunks()
        ext = pc.extract_regex(props, r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(
            pc.fill_null(pc.struct_field(ext, "k"), "0"), pa.int64()
        )
        valid = pc.cast(pc.is_valid(pc.struct_field(ext, "k")), pa.int64())
        t = pa.Table.from_pydict(
            {
                "event_type": batch.column("event_type"),
                "sum_k": k,
                "n": valid,
            }
        )
        return (
            t.group_by("event_type")
            .aggregate([("sum_k", "sum"), ("n", "sum")])
            .rename_columns(["event_type", "sum_k", "n"])
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["event_type"], ["sum_k", "n"])
    if tbl is None:  # over the combine budget: Ray groupby shuffle,
        # collected as Arrow blocks (no per-row Python dicts)
        agg = partials.groupby("event_type").sum(["sum_k", "n"])
        tbl = collect_arrow(agg)
    n = (
        tbl.column("sum(n)").to_numpy(zero_copy_only=False).astype(np.float64)
    )
    sk = tbl.column("sum(sum_k)").to_numpy(zero_copy_only=False)
    return pa.Table.from_pydict(
        {
            "event_type": tbl.column("event_type"),
            "n": pc.cast(tbl.column("sum(n)"), pa.int64()),
            "sum_k": pc.cast(tbl.column("sum(sum_k)"), pa.int64()),
            "avg_k": pa.array(
                np.round(sk / np.where(n > 0, n, 1.0), 6), pa.float64()
            ),
        }
    )


# -- q18-style large-volume customers -----------------------------------------

def q18_big_orders(
    sf_dir: str, threshold: int = 200, k: int = 20,
    combine_limit: int = 2_000_000,
    build_budget: int = DIM_BROADCAST_BUDGET,
) -> pa.Table:
    """TPC-H q18 shape: orders whose total lineitem quantity exceeds
    ``threshold``, joined to orders + customer, top-k by price.

    The interesting plan property: the HAVING filter collapses the
    probe-side aggregate to a SMALL winner set before any join — the
    same key-only-winner discipline as the dedup family. lineitem
    streams once (per-batch int64-cents partials -> one driver C++
    combine, Ray groupby fallback past the budget); orders/customer
    are broadcast build sides read driver-direct
    (``_broadcast_parquet``, the q3/q5 lesson).
    """
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        part = pa.Table.from_pydict(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "qty_c": pa.array(
                    _cents(batch.column("l_quantity")), pa.int64()
                ),
            }
        )
        return part.group_by("l_orderkey").aggregate(
            [("qty_c", "sum")]
        ).rename_columns(["l_orderkey", "qty_c"])

    partials = li.map_batches(partial, batch_format="pyarrow")
    merged = _combine_partials(
        partials, ["l_orderkey"], ["qty_c"], combine_limit=combine_limit
    )
    if merged is not None:
        okey = merged.column("l_orderkey").to_numpy().astype(np.int64)
        qty = merged.column("sum(qty_c)").to_numpy().astype(np.int64)
    else:  # over the combine budget: Ray groupby shuffle, then the
        # HAVING-filtered winners (tiny) collect
        agg = partials.groupby("l_orderkey").sum("qty_c")

        def keep_big(b: pa.Table) -> pa.Table:
            q = b.column("sum(qty_c)").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(q > threshold * 100))

        rows = agg.map_batches(keep_big, batch_format="pyarrow").take_all()
        okey = np.array([r["l_orderkey"] for r in rows], np.int64)
        qty = np.array([r["sum(qty_c)"] for r in rows], np.int64)
    big = qty > threshold * 100
    okey, qty = okey[big], qty[big]
    order_sort = np.argsort(okey, kind="stable")
    okey, qty = okey[order_sort], qty[order_sort]

    orders = _broadcast_parquet(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        budget_rows=build_budget,
    )
    cust = (
        _broadcast_parquet(sf_dir, "customer", ["c_custkey", "c_name"],
                           budget_rows=build_budget)
        if orders is not None else None
    )
    if orders is None or cust is None:
        # Distributed tier: the winner key set (HAVING-filtered, small)
        # broadcasts into a streamed orders filter+attach map; c_name
        # attaches by cogroup — no driver-direct read of either
        # corpus-scaling table. Hash-pinned vs the broadcast tier via
        # the q18_big_orders_cogroup driver entry.
        from .joins import cogroup_attach

        win_ref = ray.put((okey, qty))

        def pick_orders(b: pa.Table) -> pa.Table:
            wk, wq = ray.get(win_ref)
            ok = b.column("o_orderkey").to_numpy().astype(np.int64)
            hit = _sorted_member_mask(wk, ok)
            t = b.filter(pa.array(hit))
            sq = wq[np.searchsorted(wk, ok[hit])] / 100.0
            return t.append_column("sum_qty", pa.array(sq, pa.float64()))

        picked = _read(
            sf_dir, "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        ).map_batches(pick_orders, batch_format="pyarrow")

        def cust_rename(b: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"o_custkey": b.column("c_custkey"),
                 "c_name": b.column("c_name")}
            )

        joined = cogroup_attach(
            picked,
            _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
                cust_rename, batch_format="pyarrow"
            ),
            key="o_custkey",
            left_fields=[
                pa.field("o_orderkey", pa.int64()),
                pa.field("o_custkey", pa.int64()),
                pa.field("o_orderdate", pa.timestamp("us")),
                pa.field("o_totalprice", pa.float64()),
                pa.field("sum_qty", pa.float64()),
            ],
            payload_fields=[pa.field("c_name", pa.string())],
        )
        parts = [
            t for t in ray.get(joined.materialize().to_arrow_refs())
            if t.num_rows
        ]
        full = (
            pa.concat_tables(parts) if parts
            else pa.Table.from_pydict(
                {"o_orderkey": pa.array([], pa.int64()),
                 "o_custkey": pa.array([], pa.int64()),
                 "o_orderdate": pa.array([], pa.timestamp("us")),
                 "o_totalprice": pa.array([], pa.float64()),
                 "sum_qty": pa.array([], pa.float64()),
                 "c_name": pa.array([], pa.string())}
            )
        )
    else:
        ok = orders.column("o_orderkey").to_numpy().astype(np.int64)
        hit = _sorted_member_mask(okey, ok)
        orders = orders.filter(pa.array(hit))
        ok = ok[hit]
        sum_qty = qty[np.searchsorted(okey, ok)] / 100.0

        ck = cust.column("c_custkey").to_numpy().astype(np.int64)
        cn = cust.column("c_name").to_pylist()
        corder = np.argsort(ck, kind="stable")
        ck_sorted = ck[corder]
        oc = orders.column("o_custkey").to_numpy().astype(np.int64)
        cpos = corder[np.searchsorted(ck_sorted, oc)]
        names = pa.array([cn[i] for i in cpos], pa.string())

        full = orders.append_column("sum_qty", pa.array(sum_qty, pa.float64()))
        full = full.append_column("c_name", names)
    idx = pc.sort_indices(
        full,
        sort_keys=[
            ("o_totalprice", "descending"),
            ("o_orderkey", "ascending"),
        ],
    )[:k]
    return full.take(idx).select(
        [
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        ]
    )


# -- watermark / late-data accounting ------------------------------------------

LATE_SHIFT = 1000
LATE_ALLOWED_US = 3600 * 1_000_000


def late_event_stats(
    sf_dir: str,
    allowed_us: int = LATE_ALLOWED_US,
) -> pa.Table:
    """Event-time watermark accounting — the late-data statistic a
    streaming ingest needs before choosing its allowed-lateness bound.
    The events fixture arrives in timestamp order, so out-of-order
    ARRIVAL is planted closed-form (mirrored in SQL): events with
    ``event_id % 17 == 3`` arrive 1000 sequence slots late
    (``arrival_key = event_id + 1000``); everyone else arrives at
    ``event_id``.

    Watermark semantics (per user): before each event, the running max
    event-time of all PREVIOUSLY ARRIVED events of that user; an event
    is late when its own time is more than ``allowed_us`` behind that
    high-water mark. First arrival per user is never late.

    Shape: the sessionize coarse-partition + key-runs pattern — one
    hash(user) % P exchange of (user, event_id, ts) key rows, then a
    single vectorized pass per partition (lexsort + segmented running
    max via the run-offset trick). Output: (user_id, n_events,
    n_late) per user.
    """
    num_parts = 2 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        part = (users.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            num_parts
        )
        return pa.Table.from_pydict(
            {
                "user_id": batch.column("user_id"),
                "event_id": batch.column("event_id"),
                "ts": batch.column("ts"),
                "part": pa.array(part.astype(np.int32)),
            }
        )

    def late_part(group: pa.Table) -> pa.Table:
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        if not len(users):
            return pa.Table.from_pydict(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_late": pa.array([], pa.int64()),
                }
            )
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        ts = (
            group.column("ts")
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        arrival = eid + np.where(eid % 17 == 3, LATE_SHIFT, 0)
        order = np.lexsort((eid, arrival, users))
        u, t = users[order], ts[order]
        is_start = np.concatenate([[True], u[1:] != u[:-1]])
        run_id = np.cumsum(is_start) - 1
        # segmented running max via the offset trick (exact: int64
        # headroom checked — ts spans << 2^63 / n_runs)
        t0 = t - t.min()
        span = int(t0.max()) + 1
        assert span * (int(run_id[-1]) + 1) < (1 << 62)
        cm = np.maximum.accumulate(t0 + run_id * span) - run_id * span
        # high-water mark BEFORE each event: shift within run
        hwm = np.concatenate([[0], cm[:-1]])
        late = (~is_start) & (t0 < hwm - allowed_us)
        starts = np.flatnonzero(is_start)
        ends = np.concatenate([starts[1:], [len(u)]])
        n_events = ends - starts
        n_late = np.add.reduceat(late.astype(np.int64), starts)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "n_events": pa.array(n_events.astype(np.int64), pa.int64()),
                "n_late": pa.array(n_late, pa.int64()),
            }
        )

    rows = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: late_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
        .take_all()
    )
    rows.sort(key=lambda r: r["user_id"])
    return pa.Table.from_pydict(
        {
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
            "n_late": pa.array([r["n_late"] for r in rows], pa.int64()),
        }
    )


def events_gap_fill(sf_dir: str) -> pa.Table:
    """Per-user hourly event counts with ZERO-FILLED gaps between each
    user's first and last active hour — the resample/gap-fill step a
    time-series feature pipeline runs before windowed models (a
    missing hour must be an explicit 0, not an absent row).

    Shape: (user, hour) KEY rows only; the sessionize coarse-partition
    pattern (hash(user) % P, every user whole in one partition), then
    one vectorized pass per partition: lexsort, per-run min/max hour,
    ``np.bincount`` over the dense hour range. Emitted rows are
    bounded by sum of user spans — the operator's contract, same as
    SQL's generate-series join.

    Output: (user_id, hour, n_events) sorted by (user_id, hour).
    """
    num_parts = 2 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    hour_us = 3_600_000_000

    def prep(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        part = (users.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
            num_parts
        )
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        return pa.Table.from_pydict(
            {
                "user_id": batch.column("user_id"),
                "hour": hour,
                "part": pa.array(part.astype(np.int32)),
            }
        )

    def fill_part(group: pa.Table) -> pa.Table:
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        if not len(users):
            return pa.Table.from_pydict(
                {
                    "user_id": pa.array([], pa.int64()),
                    "hour": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        h = (
            group.column("hour")
            .to_numpy()
            .astype("datetime64[us]")
            .astype(np.int64)
        ) // hour_us
        order = np.lexsort((h, users))
        u, hh = users[order], h[order]
        starts = np.flatnonzero(
            np.concatenate([[True], u[1:] != u[:-1]])
        )
        ends = np.concatenate([starts[1:], [len(u)]])
        out_u, out_h, out_n = [], [], []
        for s, e in zip(starts, ends):
            span = hh[s:e]
            h0, h1 = int(span[0]), int(span[-1])
            counts = np.bincount(span - h0, minlength=h1 - h0 + 1)
            hours = np.arange(h0, h1 + 1, dtype=np.int64)
            out_u.append(np.full(len(hours), u[s], np.int64))
            out_h.append(hours * hour_us)
            out_n.append(counts.astype(np.int64))
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(np.concatenate(out_u), pa.int64()),
                "hour": pa.array(np.concatenate(out_h)).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(prep, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda g: fill_part(g.drop_columns(["part"])),
                batch_format="pyarrow",
            )
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    tbl = pa.concat_tables(parts)
    return tbl.sort_by(
        [("user_id", "ascending"), ("hour", "ascending")]
    )


def trimmed_stats(
    sf_dir: str,
    alpha: float = 0.05,
    table: str = "lineitem",
    column: str = "l_extendedprice",
) -> pa.Table:
    """EXACT robust aggregates — trimmed and winsorized mean of a money
    column, without any global sort: per-block (cents, count) value
    partials (the exact_quantiles discipline at int64-cents precision,
    so every sum is order-independent), one key-only merge, then the
    driver trims ``k = floor(alpha*n)`` rows off each tail of the
    cumulative array with exact integer arithmetic (boundary values
    partially included by count). One mirrored double divide per
    statistic at the very end.
    """
    if not (0.0 <= alpha < 0.5):  # alpha >= 0.5 trims everything: m = 0
        raise ValueError(f"alpha must be in [0, 0.5), got {alpha}")
    vals, cnts = _cents_value_counts(_read(sf_dir, table, [column]), column)
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return pa.Table.from_pydict(
            {"trimmed_mean": pa.array([], pa.float64()),
             "winsorized_mean": pa.array([], pa.float64())}
        )
    k = int(np.floor(alpha * n))
    m = n - 2 * k

    def exact_dot(v: np.ndarray, c: np.ndarray) -> int:
        """Exact sum(v*c). int64 fast path when the elementwise product
        provably cannot overflow (max|v| * max(c) bound); arbitrary-
        precision object math only when a hot value's count pushes a
        single product past int64 — correctness without paying the
        object-dtype tax on every call."""
        if len(v) == 0:
            return 0
        vmax = int(np.abs(v).max())
        cmax = int(c.max())
        # |sum| <= len * vmax * cmax: demand that worst case < 2^62
        if vmax == 0 or (cmax and vmax * cmax * len(v) < 2**62):
            return int(np.sum(v * c, dtype=np.int64))
        return int(np.sum(v.astype(object) * c.astype(object)))

    def tail_sums(kk: int) -> tuple[int, int]:
        """(sum of the kk smallest, sum of the kk largest) — exact ints
        with boundary values partially counted."""
        if kk == 0:
            return 0, 0
        lo_idx = int(np.searchsorted(cum, kk))          # first value whose cum >= kk
        below = int(cum[lo_idx - 1]) if lo_idx else 0
        lo_sum = exact_dot(vals[:lo_idx], cnts[:lo_idx])
        lo_sum += int(vals[lo_idx]) * (kk - below)
        rcum = np.cumsum(cnts[::-1])
        hi_idx = int(np.searchsorted(rcum, kk))
        rabove = int(rcum[hi_idx - 1]) if hi_idx else 0
        hi_vals, hi_cnts = vals[::-1], cnts[::-1]
        hi_sum = exact_dot(hi_vals[:hi_idx], hi_cnts[:hi_idx])
        hi_sum += int(hi_vals[hi_idx]) * (kk - rabove)
        return lo_sum, hi_sum

    total = exact_dot(vals, cnts)
    lo_sum, hi_sum = tail_sums(k)
    mid_sum = total - lo_sum - hi_sum
    # winsorize: the k trimmed rows on each side are REPLACED by the
    # boundary order statistics (the k-th smallest / largest kept value)
    lo_bound = int(vals[int(np.searchsorted(cum, k + 1))])
    hi_bound = int(vals[len(vals) - 1 - int(np.searchsorted(np.cumsum(cnts[::-1]), k + 1))])
    win_sum = mid_sum + k * lo_bound + k * hi_bound
    return pa.Table.from_pydict(
        {"trimmed_mean": pa.array([mid_sum / m / 100.0], pa.float64()),
         "winsorized_mean": pa.array([win_sum / n / 100.0], pa.float64())}
    )


def _cents_value_counts(
    ds: ray.data.Dataset,
    column: str,
    combine_limit: int = 2_000_000,
    transform=None,
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted distinct int64 cents, counts) — the exact-quantile
    primitive at fixed-point precision (see _sorted_value_counts).
    ``transform`` optionally maps the cents array before counting
    (e.g. MAD deviations), so every value-count consumer shares ONE
    merge/fallback path."""
    def local_counts(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(column))
        if transform is not None:
            c = transform(c)
        uniq, cnt = np.unique(c, return_counts=True)
        return pa.Table.from_pydict(
            {"value_c": pa.array(uniq, pa.int64()),
             "cnt": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    partials = ds.map_batches(local_counts, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    merged = _combine_partials(partials, ["value_c"], ["cnt"], combine_limit)
    if merged is None:
        shuffled = partials.groupby("value_c").sum("cnt")
        merged = pa.concat_tables(
            [t for t in ray.get(shuffled.materialize().to_arrow_refs())
             if t.num_rows]
        )
    vals = merged.column("value_c").to_numpy().astype(np.int64)
    cnts = merged.column("sum(cnt)").to_numpy().astype(np.int64)
    order = np.argsort(vals, kind="stable")
    return vals[order], cnts[order]


def _interp_median2(vals: np.ndarray, cnts: np.ndarray) -> int:
    """TWICE the interpolated median of a sorted value-count table, as
    an exact integer (the half-unit trick: v_lo + v_hi where the two
    ranks are the standard quantile_cont(0.5) order statistics)."""
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    lo_rank = (n + 1) // 2       # 1-based
    hi_rank = n // 2 + 1
    v_lo = int(vals[int(np.searchsorted(cum, lo_rank))])
    v_hi = int(vals[int(np.searchsorted(cum, hi_rank))])
    return v_lo + v_hi


def mad_stats(
    sf_dir: str,
    table: str = "lineitem",
    column: str = "l_extendedprice",
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """EXACT median + median absolute deviation of a money column —
    the two-pass robust-scale statistic, with NO float math until the
    final divides: pass 1 builds the cents value-count table and takes
    the interpolated median at HALF-CENT precision (the integer
    ``v_lo + v_hi`` trick); pass 2 streams again, folding
    ``|2·x_c − m2|`` half-cent deviations into a second value-count
    table whose interpolated median (quarter-cent integer) becomes the
    MAD. Both passes are the O(distinct) exact-quantile exchange.
    """
    ds = _read(sf_dir, table, [column])
    vals, cnts = _cents_value_counts(ds, column, combine_limit)
    if len(vals) == 0:
        return pa.Table.from_pydict(
            {"median": pa.array([], pa.float64()),
             "mad": pa.array([], pa.float64())}
        )
    m2 = _interp_median2(vals, cnts)

    dvals, dcnts = _cents_value_counts(
        _read(sf_dir, table, [column]), column, combine_limit,
        transform=lambda c: np.abs(2 * c - m2),
    )
    d2 = _interp_median2(dvals, dcnts)
    return pa.Table.from_pydict(
        {"median": pa.array([m2 / 2.0 / 100.0], pa.float64()),
         "mad": pa.array([d2 / 2.0 / 2.0 / 100.0], pa.float64())}
    )


def selfjoin_size_estimate(
    sf_dir: str,
    table: str = "lineitem",
    column: str = "l_partkey",
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """Join-cardinality estimation — the query-planning primitive:
    the SELF-join size on a key (= the second frequency moment
    F2 = Σ_k c_k², what a planner needs before committing to a
    shuffle) estimated from a count-min sketch WITHOUT the O(distinct)
    exchange, alongside the exact value for calibration.

    CMS is LINEAR, so each batch folds its local key counts into a
    (depth×width) register block and the driver merges by plain
    summation — constant state per block, any data volume. The
    estimate is min_j Σ_w reg[j,w]² (the CMS inner-product upper
    bound, here sketch·itself). The exact column reuses the
    value-count exchange. Both numbers are bit-reproducible in SQL
    (the cms_token_estimates register-rebuild idiom).
    """
    from ..kernels.sketch import CMS_DEPTH, CMS_WIDTH, cms_add

    ds = _read(sf_dir, table, [column])

    def batch_regs(batch: pa.Table) -> pa.Table:
        keys = batch.column(column).to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(keys.astype(np.int64), return_counts=True)
        cms = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        cms_add(cms, [str(int(k)) for k in uniq], cnt.astype(np.int64))
        return pa.Table.from_pydict(
            {"regs": pa.array([cms.tobytes()], pa.binary())}
        )

    reg_rows = ds.map_batches(batch_regs, batch_format="pyarrow").take_all()
    cms = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    for r in reg_rows:
        cms += np.frombuffer(r["regs"], dtype=np.int64).reshape(
            CMS_DEPTH, CMS_WIDTH
        )
    # estimate: min over rows of the self inner product (python ints —
    # squares can exceed int64 at corpus scale)
    est = min(
        sum(int(v) * int(v) for v in cms[j]) for j in range(CMS_DEPTH)
    )

    # exact F2 via the value-count exchange
    def local_counts(batch: pa.Table) -> pa.Table:
        keys = batch.column(column).to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(keys.astype(np.int64), return_counts=True)
        return pa.Table.from_pydict(
            {"key": pa.array(uniq, pa.int64()),
             "cnt": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    partials = _read(sf_dir, table, [column]).map_batches(
        local_counts, batch_format="pyarrow"
    )
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    merged = _combine_partials(partials, ["key"], ["cnt"], combine_limit)
    if merged is None:
        merged = pa.concat_tables(
            [t for t in ray.get(
                partials.groupby("key").sum("cnt")
                .materialize().to_arrow_refs())
             if t.num_rows]
        )
    cnts = merged.column("sum(cnt)").to_numpy().astype(np.int64)
    exact = int(sum(int(c) * int(c) for c in cnts))
    return pa.Table.from_pydict(
        {"exact_size": pa.array([exact], pa.int64()),
         "cms_estimate": pa.array([est], pa.int64())}
    )


def gini_coefficient(
    sf_dir: str,
    table: str = "orders",
    column: str = "o_totalprice",
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """EXACT Gini inequality coefficient of a money column — the
    mean-difference identity ``G = Σ (2·rn − n − 1)·x / (n·Σx)`` over
    row_number ranks, which is TIE-INVARIANT (equal values contribute
    a fixed total regardless of rank assignment within the tie), so it
    evaluates from the O(distinct) value-count exchange: a tie group
    spanning ranks a..b contributes ``v·((a+b)·cnt − (n+1)·cnt)`` by
    the arithmetic series — all exact integers folded as Python ints;
    ONE mirrored double divide at the end.
    """
    ds = _read(sf_dir, table, [column])
    vals, cnts = _cents_value_counts(ds, column, combine_limit)
    if len(vals) == 0:
        return pa.Table.from_pydict({"gini": pa.array([], pa.float64())})
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    total = sum(int(v) * int(c) for v, c in zip(vals, cnts))
    num = 0
    prev = 0
    for v, c, e in zip(vals.tolist(), cnts.tolist(), cum.tolist()):
        a, b = prev + 1, int(e)          # 1-based rank span of the tie
        num += int(v) * ((a + b) * int(c) - (n + 1) * int(c))
        prev = int(e)
    gini = float(num) / (float(n) * float(total))
    return pa.Table.from_pydict({"gini": pa.array([gini], pa.float64())})


def lang_median_mad(
    sf_dir: str, combine_limit: int = 2_000_000
) -> pa.Table:
    """GROUPED exact median + MAD (documents.n_chars per lang) — the
    two-pass robust statistic with a group key: pass 1 merges
    (lang, value, cnt) partials (O(langs × distinct) key rows) and
    takes each group's interpolated median at half-unit integer
    precision; pass 2 re-streams with the per-group m2 map broadcast
    (bounded by |groups|) and folds |2·x − m2| deviations into a
    second grouped value-count table. No float until the final
    divides; both medians use the `_interp_median2` rank rule.
    """
    from .io import read_parquet_clean

    def counts_of(col_expr):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.Table.from_pydict(
                    {"lang": pa.array([], pa.string()),
                     "value_c": pa.array([], pa.int64()),
                     "cnt": pa.array([], pa.int64())}
                )
            v = col_expr(batch)
            t = pa.Table.from_pydict(
                {"lang": batch.column("lang"),
                 "value_c": pa.array(v, pa.int64()),
                 "cnt": pa.array(np.ones(len(v), dtype=np.int64))}
            )
            return t.group_by(["lang", "value_c"]).aggregate(
                [("cnt", "sum")]
            ).rename_columns(["lang", "value_c", "cnt"])

        return f

    def merged_counts(fn) -> pa.Table:
        ds = read_parquet_clean(
            f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
        )
        partials = ds.map_batches(fn, batch_format="pyarrow")
        # materialize once: the None fallback's groupby then reuses
        # these blocks instead of re-running the upstream DAG
        partials = partials.materialize()
        tbl = _combine_partials(
            partials, ["lang", "value_c"], ["cnt"], combine_limit
        )
        if tbl is None:
            tbl = pa.Table.from_pylist(
                partials.groupby(["lang", "value_c"]).sum("cnt").take_all()
            )
        return tbl

    def per_group_median2(tbl: pa.Table) -> dict:
        langs = np.asarray(tbl.column("lang").to_numpy(zero_copy_only=False),
                           dtype=object)
        vals = tbl.column("value_c").to_numpy().astype(np.int64)
        cnts = tbl.column("sum(cnt)").to_numpy().astype(np.int64)
        out = {}
        for g in sorted({x for x in langs.tolist()}, key=lambda x: (x is None, x)):
            m = langs == g
            order = np.argsort(vals[m], kind="stable")
            out[g] = _interp_median2(vals[m][order], cnts[m][order])
        return out

    m2_by_lang = per_group_median2(merged_counts(
        counts_of(lambda b: b.column("n_chars").to_numpy().astype(np.int64))
    ))
    m2_ref = ray.put(m2_by_lang)

    def dev_expr(batch: pa.Table) -> np.ndarray:
        m2 = ray.get(m2_ref)
        langs = np.asarray(batch.column("lang").to_numpy(zero_copy_only=False),
                           dtype=object)
        x = batch.column("n_chars").to_numpy().astype(np.int64)
        m2v = np.fromiter((m2[g] for g in langs.tolist()), np.int64, len(x))
        return np.abs(2 * x - m2v)

    d2_by_lang = per_group_median2(merged_counts(counts_of(dev_expr)))
    out_l = sorted(m2_by_lang, key=lambda x: (x is None, x))
    return pa.Table.from_pydict(
        {"lang": pa.array(out_l, pa.string()),
         "median_chars": pa.array(
             [m2_by_lang[g] / 2.0 for g in out_l], pa.float64()),
         "mad_chars": pa.array(
             [d2_by_lang[g] / 2.0 / 2.0 for g in out_l], pa.float64())}
    )


def weighted_median_qty(
    sf_dir: str, combine_limit: int = 2_000_000
) -> pa.Table:
    """EXACT weighted median — the quantity at which half the revenue
    mass sits at or below (lower weighted median: the smallest value v
    with ``2·cumweight(v) >= total``, an integer rule with no float
    compare). One streamed pass reduces lineitem to (qty_cents,
    weight_cents) partials — O(distinct quantities) on the wire — and
    the driver scans the cumulative weights once.
    """
    _EMPTY = pa.Table.from_pydict(
        {"value_c": pa.array([], pa.int64()),
         "w": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY
        q = _cents(batch.column("l_quantity"))
        w = _cents(batch.column("l_extendedprice"))
        t = pa.Table.from_pydict(
            {"value_c": pa.array(q, pa.int64()),
             "w": pa.array(w, pa.int64())}
        )
        return t.group_by("value_c").aggregate([("w", "sum")]).rename_columns(
            ["value_c", "w"]
        )

    li = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])
    partials = li.map_batches(partial, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["value_c"], ["w"], combine_limit)
    if tbl is None:
        tbl = pa.Table.from_pylist(
            partials.groupby("value_c").sum("w").take_all()
        )
    vals = tbl.column("value_c").to_numpy().astype(np.int64)
    ws = tbl.column("sum(w)").to_numpy().astype(np.int64)
    order = np.argsort(vals, kind="stable")
    vals, ws = vals[order], ws[order]
    if len(vals) == 0:
        return pa.Table.from_pydict(
            {"weighted_median_qty": pa.array([], pa.float64())}
        )
    total = int(sum(int(x) for x in ws))
    cumw = 0
    med = int(vals[-1])
    for v, w in zip(vals.tolist(), ws.tolist()):
        cumw += int(w)
        if 2 * cumw >= total:
            med = int(v)
            break
    return pa.Table.from_pydict(
        {"weighted_median_qty": pa.array([med / 100.0], pa.float64())}
    )


# -- wide conditional aggregation (SQL PIVOT shape) ---------------------------

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")
_PIVOT_COLS = [f"n_{t}" for t in _PIVOT_TYPES] + ["n_total"]


def _pivot_rows(
    sf_dir: str, combine_limit: int
) -> pa.Table | ray.data.Dataset:
    """Per-user pivot rows WITHOUT the driver collect: the merged
    table when the combine budget holds, else the still-distributed
    groupby-sum Dataset — so downstream folds (``feature_correlations``)
    can reduce the over-budget tier without landing per-user rows on
    the driver."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def pivot_partial(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        types = np.asarray(
            batch.column("event_type").to_numpy(zero_copy_only=False),
            dtype=object,
        )
        uu, inv = np.unique(users, return_inverse=True)
        cols = {"user_id": pa.array(uu.astype(np.int64), pa.int64())}
        for t in _PIVOT_TYPES:
            cols[f"n_{t}"] = pa.array(
                np.bincount(
                    inv, weights=(types == t).astype(np.float64),
                    minlength=len(uu),
                ).astype(np.int64),
                pa.int64(),
            )
        cols["n_total"] = pa.array(
            np.bincount(inv, minlength=len(uu)).astype(np.int64),
            pa.int64(),
        )
        return pa.Table.from_pydict(cols)

    partials = ds.map_batches(
        pivot_partial, batch_format="pyarrow"
    ).materialize()
    merged = _combine_partials(
        partials, ["user_id"], _PIVOT_COLS, combine_limit
    )
    if merged is not None:
        return merged.rename_columns(["user_id"] + _PIVOT_COLS)
    return (
        partials.groupby("user_id")
        .sum(_PIVOT_COLS)
        .map_batches(
            lambda b: b.rename_columns(["user_id"] + _PIVOT_COLS),
            batch_format="pyarrow",
        )
    )


def user_type_pivot(
    sf_dir: str, combine_limit: int = 2_000_000,
    sink_dir: str | None = None,
) -> pa.Table | ray.data.Dataset | str:
    """Per-user event counts PIVOTED wide — one row per user, one
    column per event type plus the total (the SQL ``PIVOT`` /
    conditional-aggregation shape the long-format family lacks; the
    standard feature-vector layout ML feature stores export). The
    pivot column set is schema, fixed in advance by definition — types
    outside it still count toward ``n_total`` on both sides.

    One pass, no wide shuffle in the fast path: per-batch (user,
    6 counts) partials via unique+bincount (one row per distinct user
    per block), merged under the standard combine budget; past it the
    Ray groupby-sum exchange runs at any user cardinality
    (``user_type_pivot_grouped`` forces it; sink variant streams the
    per-user rows to parquet at deployment scale)."""
    piv = _pivot_rows(sf_dir, combine_limit)
    if isinstance(piv, pa.Table):
        return piv.sort_by([("user_id", "ascending")])
    return to_table_or_sink(piv, [("user_id", "ascending")], sink_dir)


def feature_correlations(
    sf_dir: str, combine_limit: int = 2_000_000
) -> pa.Table:
    """Pearson correlation matrix over the per-user pivot features
    (all 15 unordered pairs of the five type counts + total) — the
    feature-redundancy screen an ML feature store runs before
    training (|r| ~ 1 columns are dropped or merged).

    Composition: the ``user_type_pivot`` stage supplies complete
    per-user rows (its own two tiers decide the exchange); this stage
    folds them to one (Σx, Σx², Σxy) moment row per block — ALL
    INTEGER and exact, so both engines round identically at the
    single final divide. Overflow safety (ADVICE r4): each block's
    matmul takes the int64 fast path only under the provable bound
    ``rows × max(count)² < 2^62``; a hot-user block past it computes
    in Python-int object dtype (exact, and only the pathological
    block pays), and partials ship as DECIMAL STRINGS merged in
    unbounded Python ints on the driver — no silent wraparound at any
    count. Zero variance ⇒ NULL, mirrored by the SQL CASE."""
    feats = _PIVOT_COLS  # n_click .. n_view, n_total
    piv = _pivot_rows(sf_dir, combine_limit)
    k = len(feats)

    def moments_of(tbl: pa.Table) -> list[int]:
        cols = np.stack(
            [
                tbl.column(c).to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
                for c in feats
            ],
            axis=1,
        )
        n_rows = cols.shape[0]
        if n_rows == 0:
            return [0] * (1 + k + k * k)
        mx = int(np.abs(cols).max())
        if n_rows * mx * mx < 2**62:
            s = cols.sum(axis=0)
            ss = cols.T @ cols
        else:  # hot-user block: exact object math, no wraparound
            o = cols.astype(object)
            s = o.sum(axis=0)
            ss = o.T @ o
        return (
            [int(n_rows)]
            + [int(v) for v in s]
            + [int(v) for v in ss.ravel()]
        )

    if isinstance(piv, pa.Table):
        total = moments_of(piv)
    else:
        def moment_partial(batch: pa.Table) -> pa.Table:
            return pa.Table.from_pydict(
                {"m": pa.array(
                    [[str(v) for v in moments_of(batch)]],
                    pa.list_(pa.string()),
                )}
            )

        parts = [
            t
            for t in ray.get(
                piv.map_batches(moment_partial, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        total = [0] * (1 + k + k * k)
        for t in parts:
            for rowvals in t.column("m").to_pylist():
                total = [a + int(b) for a, b in zip(total, rowvals)]
    n = float(total[0])
    if n == 0:
        # no users -> the oracle's pair join over an empty pivot is
        # empty too
        return pa.Table.from_pydict(
            {
                "feat_a": pa.array([], pa.string()),
                "feat_b": pa.array([], pa.string()),
                "n_users": pa.array([], pa.int64()),
                "corr": pa.array([], pa.float64()),
            }
        )
    s = np.array(total[1: 1 + k], np.float64)
    ss = np.array(total[1 + k:], np.float64).reshape(k, k)
    ia, ib, corr = [], [], []
    for a in range(k):
        for b in range(a + 1, k):
            dx = n * ss[a, a] - s[a] * s[a]
            dy = n * ss[b, b] - s[b] * s[b]
            num = n * ss[a, b] - s[a] * s[b]
            ia.append(feats[a])
            ib.append(feats[b])
            corr.append(
                round(num / math.sqrt(dx * dy), 6)
                if dx > 0 and dy > 0
                else None
            )
    return pa.Table.from_pydict(
        {
            "feat_a": pa.array(ia, pa.string()),
            "feat_b": pa.array(ib, pa.string()),
            "n_users": pa.array([int(n)] * len(ia), pa.int64()),
            "corr": pa.array(corr, pa.float64()),
        }
    )
