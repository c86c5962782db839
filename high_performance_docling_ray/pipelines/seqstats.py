"""Per-key sequence & distribution statistics over the events/orders
tables — the ordered-window / per-entity-profile shapes a training-data
pipeline runs next to dedup (per-user behavior profiling, global
quantile tiling for stratified exports, coverage-interval accounting).

Every operator follows the house tier convention (NOTES_r4): a
driver/combine fast path gated by a parquet-FOOTER row probe or the
standard ``combine_limit`` partial budget, and a distributed fallback
(coarse ``hash(key) % P`` co-partition + one vectorized pass per
partition — never a per-distinct-key Python call) registered as its own
forced ``*_grouped`` driver entry sharing the base oracle.

- ``ntile_orders``      — global NTILE(k) over (o_totalprice,
  o_orderkey) via order-preserving float-bit buckets + a two-level
  prefix sum (the ``shuffle_ranks`` shape generalized to doubles);
  only the <= k-1 tile-BOUNDARY buckets ever need per-row ranks.
- ``mode_event_type``   — per-user modal event_type (tie -> smallest),
  over mergeable (user, event_type, n) count partials.
- ``event_entropy``     — per-user Shannon entropy of the event_type
  distribution, same partials.
- ``interval_merge``    — per-user union of overlapping time intervals
  (gaps-and-islands; segmented running max inside one sorted pass).
- ``lag1_autocorr``     — per-user lag-1 Pearson autocorrelation of
  ``value`` in (ts, event_id) order, from per-run pair sums.
- ``user_drawdown``     — per-user maximum drawdown / peak / final of
  the running ``value`` balance in (ts, event_id) order — the scan
  statistic pair (max-prefix, max drop-from-peak) in exact int64
  cents; one segmented cumsum+cummax pass per co-partition.
- ``rolling_distinct_users`` — EXACT sliding-window distinct counts
  via per-user coverage islands reduced to ±1 delta rows.
- ``user_value_deciles`` — NTILE over a DERIVED per-user aggregate
  (contribution/LTV deciles) on the shared ``_ntile_cents`` core.
- ``spearman_user_metrics`` — exact Spearman (average-rank ties)
  between two per-user metrics with no global sort; rank vectors
  reduce to six sums inside the bucket pass and never materialize.
- ``user_value_trend``  — per-user OLS regression of ``value`` on the
  event's per-user time rank (slope / intercept / r²): the drift
  detector for per-entity metric series. x is the rank 1..n, so
  Σx and Σx² close EXACTLY from n alone (n(n+1)/2, n(n+1)(2n+1)/6);
  only the three y-carrying sums are float reduceat segments.

Reference anchor: the reference engine's per-document ordered passes
(reading_order assembly, page_seq sorts) are the same
co-partition-then-scan shape; these operators lift it to corpus-scale
entity keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .relational import _cents, _combine_partials, _read, to_table_or_sink

__all__ = [
    "ntile_orders",
    "mode_event_type",
    "event_entropy",
    "interval_merge",
    "lag1_autocorr",
    "activity_streaks",
    "user_drawdown",
    "rolling_distinct_users",
    "user_value_deciles",
    "spearman_user_metrics",
    "kendall_user_metrics",
    "user_value_trend",
    "theil_sen_trend",
    "user_burstiness",
]


def _num_parts() -> int:
    return 2 * max(1, int(ray.cluster_resources().get("CPU", 8)))


def _user_part(users: np.ndarray, num_parts: int) -> np.ndarray:
    part = (users.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
        num_parts
    )
    return part.astype(np.int32)


def _stamp_user_part(batch: pa.Table, num_parts: int) -> pa.Table:
    """Append the coarse ``hash(user_id) % P`` co-partition column —
    the one partition stamp every per-user exchange in this module
    shares."""
    users = batch.column("user_id").to_numpy(zero_copy_only=False)
    return batch.append_column(
        "part", pa.array(_user_part(users, num_parts))
    )


# -- global NTILE over a double column ---------------------------------------


def _monotone_bits(vals: np.ndarray) -> np.ndarray:
    """IEEE-754 total-order transform: uint64 keys whose unsigned order
    equals the doubles' numeric order (negatives flipped, positives
    offset past them). No NaN handling — parquet reads are null-clean."""
    u = np.ascontiguousarray(vals, dtype=np.float64).view(np.uint64)
    neg = (u >> np.uint64(63)).astype(bool)
    return np.where(neg, ~u, u | np.uint64(1 << 63))


def _tile_of(ranks: np.ndarray, n: int, k: int) -> np.ndarray:
    """0-based NTILE bucket for 0-based global ranks: the first
    ``n % k`` tiles take ``n // k + 1`` rows, the rest ``n // k`` —
    exactly SQL NTILE's row distribution."""
    size, rem = divmod(int(n), int(k))
    cut = rem * (size + 1)
    lo = ranks // (size + 1)
    hi = rem + (ranks - cut) // max(size, 1)
    return np.where(ranks < cut, lo, hi).astype(np.int64)


_NTILE_SCHEMA = {
    "tile": pa.int64(),
    "n_orders": pa.int64(),
    "sum_price": pa.float64(),
    "min_price": pa.float64(),
    "max_price": pa.float64(),
}


def _ntile_fold(
    tiles: np.ndarray,
    n: np.ndarray,
    cents: np.ndarray,
    cmin: np.ndarray,
    cmax: np.ndarray,
) -> pa.Table:
    """Final per-tile fold of (tile, n, Σcents, min-cents, max-cents)
    partial rows (tiny: <= k whole-bucket rows + <= k boundary rows per
    tile); cent columns divide back to value units on output."""
    order = np.argsort(tiles, kind="stable")
    tiles, n, cents = tiles[order], n[order], cents[order]
    cmin, cmax = cmin[order], cmax[order]
    starts = np.concatenate(([0], np.nonzero(tiles[1:] != tiles[:-1])[0] + 1))
    out_n = np.add.reduceat(n, starts)
    out_c = np.add.reduceat(cents, starts)
    out_min = np.minimum.reduceat(cmin, starts)
    out_max = np.maximum.reduceat(cmax, starts)
    return pa.Table.from_pydict(
        {
            "tile": pa.array(tiles[starts] + 1, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
            "sum_val": pa.array(out_c / 100.0, pa.float64()),
            "min_val": pa.array(out_min / 100.0, pa.float64()),
            "max_val": pa.array(out_max / 100.0, pa.float64()),
        }
    ).sort_by([("tile", "ascending")])


def ntile_orders(
    sf_dir: str,
    tiles: int = 10,
    bucket_bits: int = 20,
    driver_budget: int = 2_000_000,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """Per-NTILE aggregates of orders by ``(o_totalprice, o_orderkey)``
    — ``NTILE(tiles) OVER (ORDER BY price, key)`` folded to one row per
    tile (count, exact-cents sum, min, max).

    A global NTILE normally needs a global sort; here the
    ORDER-PRESERVING top ``bucket_bits`` bits of the price's IEEE
    total-order key give a coarse range partition for free (the
    ``shuffle_ranks`` two-level prefix-sum shape, generalized from
    uniform hash keys to doubles): per-block per-bucket (n, cents,
    min, max) partials -> one bounded combine (<= 2^bucket_bits rows;
    Ray groupby fallback past ``combine_limit``) -> driver cumsum gives
    every bucket's global rank span. A bucket whose span lies inside
    one tile folds straight from its stage-1 aggregate; only the
    <= tiles-1 buckets STRADDLING a tile boundary are re-read for
    per-row ranks (one filtered scan, <= tiles-1 groups). Heavy ties
    at a boundary price concentrate that bucket's re-rank in one group
    — the documented skew cost; every other row is never ranked.

    Under ``driver_budget`` (orders FOOTER row count) the whole rank
    pass runs as ONE driver lexsort instead — the house fast tier;
    ``ntile_orders_grouped`` forces the distributed path.
    """
    from .io import parquet_num_rows

    if tiles < 1:
        raise ValueError("tiles must be >= 1")
    total = parquet_num_rows(f"{sf_dir}/orders.parquet")
    if total == 0:
        return pa.Table.from_pydict(
            {c: pa.array([], t) for c, t in _NTILE_SCHEMA.items()}
        )
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    if driver_budget and total <= driver_budget:
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        whole = pa.concat_tables(parts).combine_chunks()
        price = whole.column("o_totalprice").to_numpy(zero_copy_only=False)
        okey = whole.column("o_orderkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, price))
        price = price[order]
        t = _tile_of(np.arange(len(price), dtype=np.int64), len(price), tiles)
        starts = np.concatenate(([0], np.nonzero(t[1:] != t[:-1])[0] + 1))
        ends = np.concatenate((starts[1:], [len(t)]))
        cents = _cents(whole.column("o_totalprice"))[order]
        return pa.Table.from_pydict(
            {
                "tile": pa.array(t[starts] + 1, pa.int64()),
                "n_orders": pa.array(ends - starts, pa.int64()),
                "sum_price": pa.array(
                    np.add.reduceat(cents, starts) / 100.0, pa.float64()
                ),
                "min_price": pa.array(price[starts], pa.float64()),
                "max_price": pa.array(price[ends - 1], pa.float64()),
            }
        )

    def to_pairs(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "k": batch.column("o_orderkey").cast(pa.int64()),
                "c": pa.array(_cents(batch.column("o_totalprice")), pa.int64()),
            }
        )

    folded = _ntile_cents(
        ds.map_batches(to_pairs, batch_format="pyarrow"),
        tiles, bucket_bits, combine_limit,
    )
    return folded.rename_columns(list(_NTILE_SCHEMA))


def _ntile_cents(
    pairs: ray.data.Dataset, tiles: int, bucket_bits: int,
    combine_limit: int,
) -> pa.Table:
    """Distributed NTILE fold over a (k: int64 id, c: int64 cents)
    dataset — the shared two-level prefix-sum core: order-preserving
    float-bit buckets of c (int64 cents are exact in float64 below
    2^53), per-block per-bucket (n, Σc, min, max) partials, ONE bounded
    combine (Ray groupby(Sum/Min/Max) fallback past ``combine_limit``),
    driver cumsum for bucket rank spans, and a per-row re-rank of ONLY
    the ≤ tiles−1 tile-boundary buckets (ties in c share a bucket, so
    the (c, k) order is total within each group). Output columns
    (tile, n, sum_val, min_val, max_val) with the cent sums/extrema
    already divided back to value units."""
    shift = np.uint64(64 - bucket_bits)

    def _buckets_of(cents: np.ndarray) -> np.ndarray:
        return (
            _monotone_bits(cents.astype(np.float64)) >> shift
        ).astype(np.int64)

    def bucket_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        t = pa.Table.from_pydict(
            {
                "bucket": pa.array(_buckets_of(c), pa.int64()),
                "n": pa.array(np.ones(len(c), dtype=np.int64)),
                "c": pa.array(c, pa.int64()),
                "p": pa.array(c, pa.int64()),
                "q": pa.array(c, pa.int64()),
            }
        )
        out = t.group_by("bucket").aggregate(
            [("n", "sum"), ("c", "sum"), ("p", "min"), ("q", "max")]
        )
        return out.rename_columns(["bucket", "n", "c", "pmin", "pmax"])

    # rebind: the over-budget fallback groupby must reuse these blocks,
    # not re-run the read (NOTES_r4 materialize sharp edge); pairs is
    # also scanned again for the boundary re-rank
    pairs = pairs.materialize()
    partials = pairs.map_batches(
        bucket_partial, batch_format="pyarrow"
    ).materialize()
    refs = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    cat = pa.concat_tables(refs) if refs else None
    if cat is None:
        return pa.Table.from_pydict(
            {
                "tile": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sum_val": pa.array([], pa.float64()),
                "min_val": pa.array([], pa.float64()),
                "max_val": pa.array([], pa.float64()),
            }
        )
    if cat.num_rows <= combine_limit:
        merged = (
            cat.group_by("bucket")
            .aggregate(
                [("n", "sum"), ("c", "sum"), ("pmin", "min"), ("pmax", "max")]
            )
            .rename_columns(["bucket", "n", "c", "pmin", "pmax"])
        )
    else:
        # the exchange that works at any block count x bucket count
        from ray.data.aggregate import Max, Min, Sum

        grouped = partials.groupby("bucket").aggregate(
            Sum("n"), Sum("c"), Min("pmin"), Max("pmax")
        )
        rows = [t for t in ray.get(grouped.to_arrow_refs()) if t.num_rows]
        merged = (
            pa.concat_tables(rows)
            .rename_columns(["bucket", "n", "c", "pmin", "pmax"])
        )
    merged = merged.sort_by([("bucket", "ascending")])
    b = merged.column("bucket").to_numpy(zero_copy_only=False)
    cnt = merged.column("n").to_numpy(zero_copy_only=False)
    cents = merged.column("c").to_numpy(zero_copy_only=False)
    pmin = merged.column("pmin").to_numpy(zero_copy_only=False)
    pmax = merged.column("pmax").to_numpy(zero_copy_only=False)
    offs = np.cumsum(cnt) - cnt
    n_total = int(cnt.sum())
    t_lo = _tile_of(offs, n_total, tiles)
    t_hi = _tile_of(offs + cnt - 1, n_total, tiles)
    whole_mask = t_lo == t_hi

    acc = [
        (t_lo[whole_mask], cnt[whole_mask], cents[whole_mask],
         pmin[whole_mask], pmax[whole_mask])
    ]
    bd = ~whole_mask
    if bd.any():
        bd_buckets = np.sort(b[bd])
        off_map = dict(zip(b[bd].tolist(), offs[bd].tolist()))

        def keep_boundary(batch: pa.Table) -> pa.Table:
            c = batch.column("c").to_numpy(zero_copy_only=False)
            bucket = _buckets_of(c)
            ix = np.searchsorted(bd_buckets, bucket)
            ix[ix == len(bd_buckets)] = 0
            mask = bd_buckets[ix] == bucket
            out = batch.filter(pa.array(mask))
            return out.append_column(
                "bucket", pa.array(bucket[mask], pa.int64())
            )

        def rank_bucket(group: pa.Table) -> pa.Table:
            c = group.column("c").to_numpy(zero_copy_only=False)
            k = group.column("k").to_numpy(zero_copy_only=False)
            off = off_map[int(group.column("bucket")[0].as_py())]
            order = np.lexsort((k, c))
            c = c[order]
            ranks = off + np.arange(len(c), dtype=np.int64)
            tl = _tile_of(ranks, n_total, tiles)
            starts = np.concatenate(
                ([0], np.nonzero(tl[1:] != tl[:-1])[0] + 1)
            )
            ends = np.concatenate((starts[1:], [len(tl)]))
            return pa.Table.from_pydict(
                {
                    "tile0": pa.array(tl[starts], pa.int64()),
                    "n": pa.array(ends - starts, pa.int64()),
                    "c": pa.array(np.add.reduceat(c, starts), pa.int64()),
                    "pmin": pa.array(c[starts], pa.int64()),
                    "pmax": pa.array(c[ends - 1], pa.int64()),
                }
            )

        bd_rows = [
            t
            for t in ray.get(
                pairs.map_batches(keep_boundary, batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(rank_bucket, batch_format="pyarrow")
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        if bd_rows:
            bt = pa.concat_tables(bd_rows)
            acc.append(
                tuple(
                    bt.column(c).to_numpy(zero_copy_only=False)
                    for c in ["tile0", "n", "c", "pmin", "pmax"]
                )
            )
    return _ntile_fold(
        np.concatenate([a[0] for a in acc]),
        np.concatenate([a[1] for a in acc]),
        np.concatenate([a[2] for a in acc]),
        np.concatenate([a[3].astype(np.int64) for a in acc]),
        np.concatenate([a[4].astype(np.int64) for a in acc]),
    )


# -- per-user event_type count partials (shared by mode + entropy) -----------


def _type_count_partial(batch: pa.Table) -> pa.Table:
    t = pa.Table.from_pydict(
        {
            "user_id": batch.column("user_id"),
            "event_type": batch.column("event_type"),
            "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        }
    )
    return (
        t.group_by(["user_id", "event_type"])
        .aggregate([("n", "sum")])
        .rename_columns(["user_id", "event_type", "n"])
    )


def _merged_runs(group: pa.Table):
    """Merge duplicate (user, event_type) partial rows and return
    ``(users, codes, uniq_types, counts, user_run_starts, run_ends)``
    with rows sorted by (user, event_type-lex)."""
    users = group.column("user_id").to_numpy(zero_copy_only=False)
    types = group.column("event_type").to_numpy(zero_copy_only=False)
    n = group.column("n").to_numpy(zero_copy_only=False)
    uniq, codes = np.unique(types, return_inverse=True)
    order = np.lexsort((codes, users))
    users, codes, n = users[order], codes[order], n[order]
    change = np.concatenate(
        (
            [True],
            (users[1:] != users[:-1]) | (codes[1:] != codes[:-1]),
        )
    )
    starts = np.nonzero(change)[0]
    m_users = users[starts]
    m_codes = codes[starts]
    m_n = np.add.reduceat(n, starts)
    u_starts = np.concatenate(
        ([0], np.nonzero(m_users[1:] != m_users[:-1])[0] + 1)
    )
    u_ends = np.concatenate((u_starts[1:], [len(m_users)]))
    return m_users, m_codes, uniq, m_n, u_starts, u_ends


_MODE_EMPTY = pa.Table.from_pydict(
    {
        "user_id": pa.array([], pa.int64()),
        "mode_event": pa.array([], pa.string()),
        "n_mode": pa.array([], pa.int64()),
    }
)


def _mode_kernel(group: pa.Table) -> pa.Table:
    if not group.num_rows:
        return _MODE_EMPTY
    users, codes, uniq, n, u_starts, _ = _merged_runs(group)
    order = np.lexsort((codes, -n, users))
    su = users[order]
    firsts = np.concatenate(([0], np.nonzero(su[1:] != su[:-1])[0] + 1))
    pick = order[firsts]
    return pa.Table.from_pydict(
        {
            "user_id": pa.array(users[pick], pa.int64()),
            "mode_event": pa.array(uniq[codes[pick]]),
            "n_mode": pa.array(n[pick], pa.int64()),
        }
    )


_ENTROPY_EMPTY = pa.Table.from_pydict(
    {
        "user_id": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "entropy": pa.array([], pa.float64()),
    }
)


def _entropy_kernel(group: pa.Table) -> pa.Table:
    if not group.num_rows:
        return _ENTROPY_EMPTY
    users, _codes, _uniq, n, u_starts, u_ends = _merged_runs(group)
    totals = np.add.reduceat(n, u_starts)
    rep = np.repeat(totals, u_ends - u_starts)
    p = n / rep
    terms = -p * np.log(p)
    # reduceat, NOT a prefix-sum difference: each user's sum must be
    # computed over ONLY its own rows so the float result is identical
    # whatever other users share the partition (tier-equality pin)
    ent = np.add.reduceat(terms, u_starts)
    return pa.Table.from_pydict(
        {
            "user_id": pa.array(users[u_starts], pa.int64()),
            "n_events": pa.array(totals, pa.int64()),
            "entropy": pa.array(ent, pa.float64()),
        }
    )


def _per_user_from_counts(
    sf_dir: str, kernel, empty: pa.Table, combine_limit: int,
    sink_dir: str | None = None,
) -> pa.Table | str:
    """Shared driver for mode/entropy: mergeable (user, event_type, n)
    count partials -> bounded driver combine (house ``combine_limit``
    gate) -> vectorized kernel; past the budget ONE coarse
    ``hash(user) % P`` exchange of the count partials (already reduced
    to distinct (user, type) pairs per block — never raw events) runs
    the same kernel per partition at any user cardinality. Per-user
    output is itself corpus-sized at deployment scale, so ``sink_dir``
    streams it to sharded parquet (forces the distributed tier)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    partials = ds.map_batches(_type_count_partial, batch_format="pyarrow")
    partials = partials.materialize()
    if sink_dir is None:
        tbl = _combine_partials(
            partials, ["user_id", "event_type"], ["n"], combine_limit
        )
        if tbl is not None:
            if not tbl.num_rows:
                return empty
            merged = tbl.rename_columns(["user_id", "event_type", "n"])
            return kernel(merged).sort_by([("user_id", "ascending")])
    num_parts = _num_parts()

    out = (
        partials.map_batches(
            lambda b: _stamp_user_part(b, num_parts),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: kernel(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    res = to_table_or_sink(out, [("user_id", "ascending")], sink_dir)
    if isinstance(res, str):
        return res
    return res if res.num_rows else empty


def mode_event_type(
    sf_dir: str, combine_limit: int = 2_000_000,
    sink_dir: str | None = None,
) -> pa.Table | str:
    """Per-user modal event_type (ties -> lexicographically smallest
    type), with its count. Exact at any scale: the (user, event_type)
    count partial is mergeable, so raw events reduce inside the scan
    and only distinct pairs ride any exchange."""
    return _per_user_from_counts(
        sf_dir, _mode_kernel, _MODE_EMPTY, combine_limit, sink_dir
    )


def event_entropy(
    sf_dir: str, combine_limit: int = 2_000_000,
    sink_dir: str | None = None,
) -> pa.Table | str:
    """Per-user Shannon entropy (nats) of the event_type distribution
    — the per-entity behavioral-diversity signal (same partial exchange
    as ``mode_event_type``)."""
    return _per_user_from_counts(
        sf_dir, _entropy_kernel, _ENTROPY_EMPTY, combine_limit, sink_dir
    )


# -- per-user interval union (gaps-and-islands) -------------------------------

_IV_EMPTY = pa.Table.from_pydict(
    {
        "user_id": pa.array([], pa.int64()),
        "n_intervals": pa.array([], pa.int64()),
        "covered_us": pa.array([], pa.int64()),
    }
)


def interval_merge(
    sf_dir: str, dur_mod: int = 3600, driver_budget: int = 2_000_000,
    sink_dir: str | None = None,
) -> pa.Table | str:
    """Per-user UNION of overlapping/touching time intervals — each
    event spans ``[ts, ts + (event_id % dur_mod + 1) sec]`` (a
    deterministic pure-integer duration) — returning the merged
    interval count and total covered microseconds per user. The
    classic coverage/gaps-and-islands operator (session coverage,
    crawl-window accounting).

    One sorted pass per co-partition: lexsort by (user, start, end),
    segmented running max of ``end`` (pandas groupby.cummax — C-speed,
    no per-key Python), island starts where ``start > max(prev ends)``,
    then pure-int64 reduceat folds islands to users. Driver fast tier
    under the events FOOTER row probe; ``interval_merge_grouped``
    forces the ``hash(user) % P`` exchange.
    """
    from .io import parquet_num_rows

    num_parts = _num_parts()
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def merge_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if not n:
            return _IV_EMPTY
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        eids = group.column("event_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        s = ts
        e = ts + (eids % dur_mod + 1) * 1_000_000
        order = np.lexsort((e, s, users))
        users, s, e = users[order], s[order], e[order]
        run_start = np.concatenate(([True], users[1:] != users[:-1]))
        run_id = np.cumsum(run_start) - 1
        cm = (
            pd.Series(e).groupby(run_id).cummax().to_numpy()
        )  # segmented running max, C-speed
        prev_cm = np.empty(n, dtype=np.int64)
        prev_cm[0] = 0
        prev_cm[1:] = cm[:-1]
        new_island = run_start | (s > prev_cm)
        isl_starts = np.nonzero(new_island)[0]
        isl_ends = np.concatenate((isl_starts[1:], [n])) - 1
        isl_user = users[isl_starts]
        covered = cm[isl_ends] - s[isl_starts]
        u_starts = np.concatenate(
            ([0], np.nonzero(isl_user[1:] != isl_user[:-1])[0] + 1)
        )
        u_ends = np.concatenate((u_starts[1:], [len(isl_user)]))
        cs = np.concatenate(([0], np.cumsum(covered)))
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(isl_user[u_starts], pa.int64()),
                "n_intervals": pa.array(u_ends - u_starts, pa.int64()),
                "covered_us": pa.array(
                    cs[u_ends] - cs[u_starts], pa.int64()
                ),
            }
        )

    if (
        sink_dir is None
        and driver_budget
        and parquet_num_rows(f"{sf_dir}/events.parquet") <= driver_budget
    ):
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not parts:
            return _IV_EMPTY
        whole = pa.concat_tables(parts).combine_chunks()
        return merge_part(whole).sort_by([("user_id", "ascending")])

    out = (
        ds.map_batches(
            lambda b: _stamp_user_part(b, num_parts),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: merge_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return to_table_or_sink(out, [("user_id", "ascending")], sink_dir)


# -- per-user running-balance scan statistics ---------------------------------

_DD_EMPTY = pa.Table.from_pydict(
    {
        "user_id": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "final_cents": pa.array([], pa.int64()),
        "peak_cents": pa.array([], pa.int64()),
        "max_drawdown_cents": pa.array([], pa.int64()),
    }
)


def user_drawdown(
    sf_dir: str, driver_budget: int = 2_000_000,
    sink_dir: str | None = None,
) -> pa.Table | str:
    """Per-user maximum DRAWDOWN of the running ``value`` balance in
    (ts, event_id) order, plus the peak prefix and final balance — the
    CUSUM-family scan statistics (max prefix, max drop-from-peak) that
    profile a per-entity value stream for anomaly screens and
    burn-down accounting.

    All three outputs are EXACT int64 cents (no float anywhere):
    drawdown_i = max_prefix_i − run_i, so ties and rounding can never
    flip the max. One pass per co-partition: lexsort by
    (user, ts, event_id), segmented cumsum + cummax (pandas
    groupby.cummax — C-speed, the ``interval_merge`` idiom), int64
    reduceat folds per user. Headroom: a user's |running balance|
    stays < 2^63 cents (~9e16 dollars) — documented bound, far past
    any event stream.

    Driver fast tier under the events FOOTER row probe;
    ``user_drawdown_grouped`` forces the ``hash(user) % P`` exchange.
    """
    from .io import parquet_num_rows

    num_parts = _num_parts()
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def dd_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if not n:
            return _DD_EMPTY
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        eids = group.column("event_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy().astype(
            "datetime64[us]"
        ).astype(np.int64)
        c = _cents(group.column("value"))
        order = np.lexsort((eids, ts, users))
        users, c = users[order], c[order]
        run_start = np.concatenate(([True], users[1:] != users[:-1]))
        run_id = np.cumsum(run_start) - 1
        g = pd.Series(c).groupby(run_id)
        run = g.cumsum().to_numpy()       # per-user running balance
        peak = (
            pd.Series(run).groupby(run_id).cummax().to_numpy()
        )                                  # per-user running max
        dd = peak - run
        starts = np.nonzero(run_start)[0]
        ends = np.concatenate((starts[1:], [n])) - 1
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(users[starts], pa.int64()),
                "n_events": pa.array(
                    np.concatenate((starts[1:], [n])) - starts, pa.int64()
                ),
                "final_cents": pa.array(run[ends], pa.int64()),
                "peak_cents": pa.array(
                    np.maximum.reduceat(run, starts), pa.int64()
                ),
                "max_drawdown_cents": pa.array(
                    np.maximum.reduceat(dd, starts), pa.int64()
                ),
            }
        )

    if (
        sink_dir is None
        and driver_budget
        and parquet_num_rows(f"{sf_dir}/events.parquet") <= driver_budget
    ):
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not parts:
            return _DD_EMPTY
        whole = pa.concat_tables(parts).combine_chunks()
        return dd_part(whole).sort_by([("user_id", "ascending")])

    out = (
        ds.map_batches(
            lambda b: _stamp_user_part(b, num_parts),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: dd_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return to_table_or_sink(out, [("user_id", "ascending")], sink_dir)


# -- per-user activity streaks -------------------------------------------------

_ST_EMPTY = pa.Table.from_pydict(
    {
        "user_id": pa.array([], pa.int64()),
        "n_active_days": pa.array([], pa.int64()),
        "longest_streak": pa.array([], pa.int64()),
    }
)


def activity_streaks(
    sf_dir: str, driver_budget: int = 2_000_000,
    sink_dir: str | None = None,
) -> pa.Table | str:
    """Per-user activity streaks — distinct active DAYS and the
    longest run of CONSECUTIVE days (the engagement/retention profile
    read next to ``sessionize`` and the cohort matrix; the classic
    gaps-and-islands over the day grid instead of raw timestamps).

    All-integer composition (epoch-day = ts // 86_400_000_000 µs):
    per co-partition, one lexsort over (user, day), vectorized
    distinct, island starts where the day step ≠ 1, run lengths by
    boundary differencing, per-user max via int64 reduceat — exact by
    construction, no float anywhere. Driver fast tier under the
    events FOOTER probe; ``activity_streaks_grouped`` forces the
    ``hash(user) % P`` exchange (a user's rows co-locate, so within-
    group distinct IS global distinct).
    """
    from .io import parquet_num_rows

    num_parts = _num_parts()
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def streak_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if not n:
            return _ST_EMPTY
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        day = (
            group.column("ts").to_numpy().astype("datetime64[us]")
            .astype(np.int64) // 86_400_000_000
        )
        pair = np.stack([users, day], axis=1)
        pair = np.unique(pair, axis=0)  # sorted by (user, day)
        users, day = pair[:, 0], pair[:, 1]
        m = len(users)
        user_start = np.concatenate(([True], users[1:] != users[:-1]))
        run_start = user_start | np.concatenate(
            ([True], (day[1:] - day[:-1]) != 1)
        )
        run_idx = np.flatnonzero(run_start)
        run_len = np.diff(np.concatenate((run_idx, [m])))
        run_user_start = user_start[run_idx]
        u_starts = np.flatnonzero(run_user_start)
        seg_starts = np.flatnonzero(user_start)
        seg_lens = np.diff(np.concatenate((seg_starts, [m])))
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(users[seg_starts], pa.int64()),
                "n_active_days": pa.array(seg_lens, pa.int64()),
                "longest_streak": pa.array(
                    np.maximum.reduceat(run_len, u_starts), pa.int64()
                ),
            }
        )

    if (
        sink_dir is None
        and driver_budget
        and parquet_num_rows(f"{sf_dir}/events.parquet") <= driver_budget
    ):
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not parts:
            return _ST_EMPTY
        whole = pa.concat_tables(parts).combine_chunks()
        return streak_part(whole).sort_by([("user_id", "ascending")])

    out = (
        ds.map_batches(
            lambda b: _stamp_user_part(b, num_parts),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: streak_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return to_table_or_sink(out, [("user_id", "ascending")], sink_dir)


# -- per-user lag-1 autocorrelation -------------------------------------------

_AC_EMPTY = pa.Table.from_pydict(
    {
        "user_id": pa.array([], pa.int64()),
        "n_pairs": pa.array([], pa.int64()),
        "lag1_corr": pa.array([], pa.float64()),
    }
)


def lag1_autocorr(
    sf_dir: str, driver_budget: int = 2_000_000,
    sink_dir: str | None = None,
) -> pa.Table | str:
    """Per-user lag-1 Pearson autocorrelation of ``value`` in
    (ts, event_id) order — corr(v_t, v_{t-1}) over each user's
    consecutive pairs; NULL (NaN) when either pair variance is zero
    (single pair, constant values) exactly like the SQL CASE guard.

    Per co-partition: one lexsort, drop each run's first row to form
    the (prev, cur) pair arrays, then per-user sums of x, y, x², y²,
    xy via prefix-sum differences — corr closes in five reductions, no
    per-key Python. Driver fast tier under the events FOOTER probe;
    ``lag1_autocorr_grouped`` forces the exchange.
    """
    from .io import parquet_num_rows

    num_parts = _num_parts()
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def corr_part(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if not n:
            return _AC_EMPTY
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        eids = group.column("event_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        vals = group.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        order = np.lexsort((eids, ts, users))
        users, vals = users[order], vals[order]
        run_start = np.concatenate(([True], users[1:] != users[:-1]))
        starts = np.nonzero(run_start)[0]
        ends = np.concatenate((starts[1:], [n]))
        # pair rows: every non-run-start position i pairs (v[i-1], v[i])
        pair_mask = ~run_start
        x = vals[np.nonzero(pair_mask)[0] - 1]
        y = vals[pair_mask]
        # per-user pair-segment bounds in the packed pair arrays
        m = ends - starts - 1  # pairs per user
        p_starts = np.cumsum(m) - m
        has = m > 0

        def seg_sum(a: np.ndarray) -> np.ndarray:
            # reduceat over ONLY pair-having users: each user's sum is
            # computed over its own rows alone, so the float result is
            # tier-independent (empty segments would make reduceat
            # return a neighbor's element instead of 0)
            out = np.zeros(len(m), dtype=np.float64)
            if len(a):
                out[has] = np.add.reduceat(a, p_starts[has])
            return out

        sx, sy = seg_sum(x), seg_sum(y)
        sxx, syy, sxy = seg_sum(x * x), seg_sum(y * y), seg_sum(x * y)
        mf = m.astype(np.float64)
        vx = mf * sxx - sx * sx
        vy = mf * syy - sy * sy
        valid = (m > 0) & (vx > 0) & (vy > 0)
        corr = np.full(len(m), np.nan)
        corr[valid] = (mf * sxy - sx * sy)[valid] / np.sqrt(
            (vx * vy)[valid]
        )
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(users[starts], pa.int64()),
                "n_pairs": pa.array(m, pa.int64()),
                "lag1_corr": pa.array(corr, pa.float64()),
            }
        )

    if (
        sink_dir is None
        and driver_budget
        and parquet_num_rows(f"{sf_dir}/events.parquet") <= driver_budget
    ):
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not parts:
            return _AC_EMPTY
        whole = pa.concat_tables(parts).combine_chunks()
        return corr_part(whole).sort_by([("user_id", "ascending")])

    out = (
        ds.map_batches(
            lambda b: _stamp_user_part(b, num_parts),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: corr_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return to_table_or_sink(out, [("user_id", "ascending")], sink_dir)


# -- per-user OLS trend (value vs time rank) -----------------------------------

_TR_EMPTY = pa.Table.from_pydict(
    {
        "user_id": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "slope": pa.array([], pa.float64()),
        "intercept": pa.array([], pa.float64()),
        "r2": pa.array([], pa.float64()),
    }
)


def user_value_trend(
    sf_dir: str, driver_budget: int = 2_000_000,
    sink_dir: str | None = None,
) -> pa.Table | str:
    """Per-user OLS regression of ``value`` on the event's per-user
    rank in (ts, event_id) order — the per-entity drift detector
    (is this user's metric trending up or down, and how linearly).

    x = rank 1..n is exact by construction: Σx = n(n+1)/2 and
    Σx² = n(n+1)(2n+1)/6 close in integer math from n alone, so the
    x-side variance has ZERO cancellation error at any n. Only Σy,
    Σy², Σxy are float — each a per-user reduceat segment sum
    (tier-independent; see the NOTES_r4 prefix-sum-differences edge).
    slope/intercept need n >= 2 (x-variance > 0 exactly then); r²
    additionally needs y-variance > 0, mirrored by the SQL CASE.

    Driver fast tier under the events FOOTER probe;
    ``user_value_trend_grouped`` forces the co-partition exchange.
    """
    from .io import parquet_num_rows

    num_parts = _num_parts()
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def trend_part(group: pa.Table) -> pa.Table:
        n_rows = group.num_rows
        if not n_rows:
            return _TR_EMPTY
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        eids = group.column("event_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        vals = group.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        order = np.lexsort((eids, ts, users))
        users, vals = users[order], vals[order]
        run_start = np.concatenate(([True], users[1:] != users[:-1]))
        starts = np.nonzero(run_start)[0]
        ends = np.concatenate((starts[1:], [n_rows]))
        m = ends - starts  # events per user (>= 1 by construction)
        # per-row rank within its user's run: 1..m
        ranks = (np.arange(n_rows) - np.repeat(starts, m) + 1).astype(
            np.float64
        )

        def seg_sum(a: np.ndarray) -> np.ndarray:
            # every segment is non-empty here (m >= 1), so plain
            # reduceat is safe and each user's sum is computed over
            # its own rows alone (tier-independent float order)
            return np.add.reduceat(a, starts)

        sy = seg_sum(vals)
        syy = seg_sum(vals * vals)
        sxy = seg_sum(ranks * vals)
        mf = m.astype(np.float64)
        sx = mf * (mf + 1.0) / 2.0
        sxx = mf * (mf + 1.0) * (2.0 * mf + 1.0) / 6.0
        dx = mf * sxx - sx * sx  # > 0 exactly iff m >= 2
        dy = mf * syy - sy * sy
        num = mf * sxy - sx * sy
        slope = np.full(len(m), np.nan)
        intercept = np.full(len(m), np.nan)
        r2 = np.full(len(m), np.nan)
        fit = m >= 2
        slope[fit] = num[fit] / dx[fit]
        intercept[fit] = (sy[fit] - slope[fit] * sx[fit]) / mf[fit]
        rok = fit & (dy > 0)
        r2[rok] = (num[rok] * num[rok]) / (dx[rok] * dy[rok])
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(users[starts], pa.int64()),
                "n_events": pa.array(m, pa.int64()),
                "slope": pa.array(slope, pa.float64()),
                "intercept": pa.array(intercept, pa.float64()),
                "r2": pa.array(r2, pa.float64()),
            }
        )

    if (
        sink_dir is None
        and driver_budget
        and parquet_num_rows(f"{sf_dir}/events.parquet") <= driver_budget
    ):
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not parts:
            return _TR_EMPTY
        whole = pa.concat_tables(parts).combine_chunks()
        return trend_part(whole).sort_by([("user_id", "ascending")])

    out = (
        ds.map_batches(
            lambda b: _stamp_user_part(b, num_parts),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: trend_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return to_table_or_sink(out, [("user_id", "ascending")], sink_dir)


# -- exact sliding-window distinct count --------------------------------------

_RD_EMPTY = pa.Table.from_pydict(
    {
        "hour": pa.array([], pa.timestamp("us")),
        "n_users": pa.array([], pa.int64()),
    }
)

_HOUR_US = 3_600_000_000


def rolling_distinct_users(
    sf_dir: str,
    window_hours: int = 24,
    driver_budget: int = 2_000_000,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """EXACT rolling distinct: for every hour with >= 1 event, the
    number of DISTINCT users active in the trailing ``window_hours``
    window — the sliding-window cardinality a naive plan computes with
    an |hours| x window x users self-join and HLL only approximates.

    Linear-work exact composition: a user active at hour ``h``
    contributes to windows ``[h, h + W - 1]``, so each user's
    contribution is the UNION of those ranges — per-user interval
    islands (the ``interval_merge`` kernel on the discrete hour axis:
    merge while the gap between active hours is <= W). Each island
    becomes TWO delta rows ``(start, +1), (end + 1, -1)``; summed
    deltas prefix-scan to the exact distinct count at EVERY hour with
    no distinct-aggregation anywhere. ONE scan of events serves both
    the islands and the active-hour set (the hour-presence flag rides
    the same delta exchange). Stages, all bounded:

    1. per-block distinct (user, hour) pairs (pure map, pre-combined);
    2. ONE ``hash(user) % P`` co-partition; per partition one lexsort
       merges duplicates, forms islands, and pre-sums
       (hour, delta, hour-present) rows — <= 2 islands per user,
       pre-aggregated to <= |hour domain| rows;
    3. the rows combine under the house ``combine_limit`` gate (Ray
       ``groupby(hour).sum`` fallback), then ONE driver cumsum over the
       hour domain — bounded by the TIME RANGE (a decade is ~9e4
       hours), not the corpus size — evaluates the scan at the active
       hours. Under ``driver_budget`` (events FOOTER row count) the
       whole pass runs on the driver; ``rolling_distinct_users_grouped``
       forces the exchange.
    """
    from .io import parquet_num_rows

    num_parts = _num_parts()
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    w = int(window_hours)
    if w < 1:
        raise ValueError("window_hours must be >= 1")

    def pairs(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        hours = (
            batch.column("ts").to_numpy().astype("datetime64[us]").astype(
                np.int64
            )
            // _HOUR_US
        )
        order = np.lexsort((hours, users))
        users, hours = users[order], hours[order]
        keep = np.concatenate(
            ([True], (users[1:] != users[:-1]) | (hours[1:] != hours[:-1]))
        )
        users, hours = users[keep], hours[keep]
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(users, pa.int64()),
                "hour": pa.array(hours, pa.int64()),
                "part": pa.array(_user_part(users, num_parts)),
            }
        )

    _D_EMPTY = pa.Table.from_pydict(
        {
            "h": pa.array([], pa.int64()),
            "d": pa.array([], pa.int64()),
            "f": pa.array([], pa.int64()),
        }
    )

    def deltas(group: pa.Table) -> pa.Table:
        """(user, hour) rows -> summed (h, d, f): d = island coverage
        deltas, f = hour-presence flags (f > 0 after the global sum
        marks an hour with >= 1 event)."""
        if not group.num_rows:
            return _D_EMPTY
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        hours = group.column("hour").to_numpy(zero_copy_only=False)
        order = np.lexsort((hours, users))
        users, hours = users[order], hours[order]
        keep = np.concatenate(
            ([True], (users[1:] != users[:-1]) | (hours[1:] != hours[:-1]))
        )
        users, hours = users[keep], hours[keep]
        same_user = np.concatenate(([False], users[1:] == users[:-1]))
        # a new island when the previous active hour's window no longer
        # reaches this one: hours[i] > hours[i-1] + w  (coverage ranges
        # [h, h+w-1] overlap or touch while the gap is <= w)
        new_island = ~same_user | (
            np.concatenate(([0], np.diff(hours))) > w
        )
        isl_starts = np.nonzero(new_island)[0]
        isl_ends = np.concatenate((isl_starts[1:], [len(hours)])) - 1
        start_h = hours[isl_starts]
        end_h = hours[isl_ends] + w  # first hour PAST the coverage
        h = np.concatenate((start_h, end_h, hours))
        d = np.concatenate(
            (
                np.ones(len(start_h), dtype=np.int64),
                -np.ones(len(end_h), dtype=np.int64),
                np.zeros(len(hours), dtype=np.int64),
            )
        )
        f = np.concatenate(
            (
                np.zeros(len(start_h) + len(end_h), dtype=np.int64),
                np.ones(len(hours), dtype=np.int64),
            )
        )
        t = pa.Table.from_pydict(
            {
                "h": pa.array(h, pa.int64()),
                "d": pa.array(d, pa.int64()),
                "f": pa.array(f, pa.int64()),
            }
        )
        return (
            t.group_by("h").aggregate([("d", "sum"), ("f", "sum")])
            .rename_columns(["h", "d", "f"])
        )

    if (
        driver_budget
        and parquet_num_rows(f"{sf_dir}/events.parquet") <= driver_budget
    ):
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not parts:
            return _RD_EMPTY
        whole = pa.concat_tables(parts).combine_chunks()
        hours = (
            whole.column("ts").to_numpy().astype("datetime64[us]").astype(
                np.int64
            )
            // _HOUR_US
        )
        raw = pa.Table.from_pydict(
            {
                "user_id": whole.column("user_id").cast(pa.int64()),
                "hour": pa.array(hours, pa.int64()),
            }
        )
        merged = deltas(raw)
    else:
        delta_ds = (
            ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda g: deltas(g.drop_columns(["part"])),
                batch_format="pyarrow",
            )
        )
        delta_ds = delta_ds.materialize()
        merged = _combine_partials(delta_ds, ["h"], ["d", "f"], combine_limit)
        if merged is None:
            rows = [
                t
                for t in ray.get(
                    delta_ds.groupby("h").sum(["d", "f"]).to_arrow_refs()
                )
                if t.num_rows
            ]
            merged = pa.concat_tables(rows)
        merged = merged.rename_columns(["h", "d", "f"])
    if not merged.num_rows:
        return _RD_EMPTY
    merged = merged.sort_by([("h", "ascending")])
    dh = merged.column("h").to_numpy(zero_copy_only=False)
    counts = np.cumsum(merged.column("d").to_numpy(zero_copy_only=False))
    present = merged.column("f").to_numpy(zero_copy_only=False) > 0
    active = dh[present]
    # scan value at hour h = cumsum at the last delta hour <= h; every
    # active hour IS a delta hour (an island starts or continues there)
    ix = np.searchsorted(dh, active, side="right") - 1
    n_users = counts[ix]
    return pa.Table.from_pydict(
        {
            "hour": pa.array(
                (active * _HOUR_US).astype("datetime64[us]")
            ),
            "n_users": pa.array(n_users, pa.int64()),
        }
    )


# -- NTILE over a DERIVED per-user aggregate -----------------------------------

_UVD_SCHEMA = ["tile", "n_users", "sum_total", "min_total", "max_total"]


def user_value_deciles(
    sf_dir: str,
    tiles: int = 10,
    bucket_bits: int = 20,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """Contribution deciles: per-user total ``value`` -> global
    NTILE(tiles) of USERS by (total, user_id) -> per-tile count /
    exact-cents sum / min / max of the totals. The LTV-decile shape —
    the rank input is itself the output of a distributed aggregation,
    so there is no parquet footer to probe; the budget gates live on
    the aggregate instead.

    Two stages, both bounded: mergeable (user, Σcents) partials (raw
    events reduce inside the scan) with the house combine gate (Ray
    ``groupby(user).sum`` past ``combine_limit``), then the shared
    ``_ntile_cents`` two-level prefix-sum core over the derived
    (user, cents) pairs — under the budget the whole fold runs as one
    driver lexsort; past it only tile-boundary buckets are ranked.
    """
    if tiles < 1:
        raise ValueError("tiles must be >= 1")
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def total_partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {
                "k": batch.column("user_id").cast(pa.int64()),
                "c": pa.array(_cents(batch.column("value")), pa.int64()),
            }
        )
        return (
            t.group_by("k").aggregate([("c", "sum")])
            .rename_columns(["k", "c"])
        )

    partials = ds.map_batches(
        total_partial, batch_format="pyarrow"
    ).materialize()
    tbl = _combine_partials(partials, ["k"], ["c"], combine_limit)
    if tbl is not None:
        if not tbl.num_rows:
            return pa.Table.from_pydict(
                {
                    "tile": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                    "sum_total": pa.array([], pa.float64()),
                    "min_total": pa.array([], pa.float64()),
                    "max_total": pa.array([], pa.float64()),
                }
            )
        users = tbl.column("k").to_numpy(zero_copy_only=False)
        cents = tbl.column("sum(c)").to_numpy(zero_copy_only=False)
        order = np.lexsort((users, cents))
        cents = cents[order]
        t = _tile_of(
            np.arange(len(cents), dtype=np.int64), len(cents), tiles
        )
        starts = np.concatenate(([0], np.nonzero(t[1:] != t[:-1])[0] + 1))
        ends = np.concatenate((starts[1:], [len(t)]))
        return pa.Table.from_pydict(
            {
                "tile": pa.array(t[starts] + 1, pa.int64()),
                "n_users": pa.array(ends - starts, pa.int64()),
                "sum_total": pa.array(
                    np.add.reduceat(cents, starts) / 100.0, pa.float64()
                ),
                "min_total": pa.array(cents[starts] / 100.0, pa.float64()),
                "max_total": pa.array(
                    cents[ends - 1] / 100.0, pa.float64()
                ),
            }
        )
    # over budget: the per-user totals stay distributed end-to-end
    pair_rows = [
        t
        for t in ray.get(
            partials.groupby("k").sum("c").to_arrow_refs()
        )
        if t.num_rows
    ]
    pairs = ray.data.from_arrow(
        [t.rename_columns(["k", "c"]) for t in pair_rows]
        or [pa.Table.from_pydict(
            {"k": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
        )]
    )
    folded = _ntile_cents(pairs, tiles, bucket_bits, combine_limit)
    return folded.rename_columns(_UVD_SCHEMA)


# -- exact Spearman rank correlation at corpus key cardinality ----------------


def spearman_user_metrics(
    sf_dir: str,
    bucket_bits: int = 20,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """EXACT Spearman rank correlation (average-rank ties) between two
    per-user metrics — activity (event count) vs monetary total
    (Σ value) — across ALL users, with no global sort: the
    does-activity-track-spend question at 10^9-entity scale.

    Composition (every stage bounded):

    1. mergeable (user, n, Σcents) partials reduce raw events inside
       the scan; under the house combine gate the per-user table is
       already on the driver and TWO argsorts close rho immediately
       (the driver fast tier — no further exchange); past the budget
       the Ray ``groupby(user)`` fallback feeds stages 2-4.
    2. x-ranks (event counts): DISTINCT count values are provably few
       — the distinct values of a count metric satisfy
       ``n_d (n_d + 1) / 2 <= total events`` (each distinct value v
       needs at least v events), so ``n_d <= sqrt(2 N)`` — ~1.4M at
       10^12 events. A (x, freq) count exchange + one driver cumsum
       gives the average-rank map ``avg_rank(x) = (#smaller) +
       (freq+1)/2``, broadcast once (combine gate on the exchange).
    3. y-ranks (cent totals): the ``shuffle_ranks`` two-level shape on
       the order-preserving float-bit buckets of c — per-bucket counts
       cumsum to global offsets; ONE ``groupby(bucket)`` pass assigns
       every user's average rank locally (ties in c share a bucket, so
       a tie run never straddles groups) and immediately reduces to
       the six Spearman sums (Σra, Σrb, Σra², Σrb², Σra·rb, n) — rank
       VECTORS never land anywhere.
    4. rho closes from the six sums; zero rank variance -> NULL,
       mirrored by the oracle's CASE.
    """
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def um_partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {
                "k": batch.column("user_id").cast(pa.int64()),
                "n": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
                "c": pa.array(_cents(batch.column("value")), pa.int64()),
            }
        )
        return (
            t.group_by("k").aggregate([("n", "sum"), ("c", "sum")])
            .rename_columns(["k", "n", "c"])
        )

    _EMPTY = pa.Table.from_pydict(
        {
            "n_users": pa.array([], pa.int64()),
            "spearman_rho": pa.array([], pa.float64()),
        }
    )

    def _rho_row(m, sra, srb, sraa, srbb, srab) -> pa.Table:
        va = m * sraa - sra * sra
        vb = m * srbb - srb * srb
        rho = (
            (m * srab - sra * srb) / np.sqrt(va * vb)
            if va > 0 and vb > 0
            else float("nan")
        )
        return pa.Table.from_pydict(
            {
                "n_users": pa.array([int(m)], pa.int64()),
                "spearman_rho": pa.array([rho], pa.float64()),
            }
        )

    partials = ds.map_batches(
        um_partial, batch_format="pyarrow"
    ).materialize()
    merged = _combine_partials(partials, ["k"], ["n", "c"], combine_limit)
    if merged is not None:
        # driver fast tier: the per-user table is already here — two
        # argsorts close rho without any further exchange (Ray groupby
        # fixed cost dwarfs a <=2M-row rank pass, the house rule)
        if not merged.num_rows:
            return _EMPTY

        def _avg_ranks(v: np.ndarray) -> np.ndarray:
            order = np.argsort(v, kind="stable")
            sv = v[order]
            starts = np.concatenate(
                ([0], np.nonzero(sv[1:] != sv[:-1])[0] + 1)
            )
            run_len = np.diff(np.concatenate((starts, [len(sv)])))
            run_avg = starts + (run_len + 1) / 2.0  # 1-based
            r = np.empty(len(v), dtype=np.float64)
            r[order] = np.repeat(run_avg, run_len)
            return r

        ra = _avg_ranks(
            merged.column("sum(n)").to_numpy(zero_copy_only=False)
        )
        rb = _avg_ranks(
            merged.column("sum(c)").to_numpy(zero_copy_only=False)
        )
        return _rho_row(
            len(ra), ra.sum(), rb.sum(), (ra * ra).sum(),
            (rb * rb).sum(), (ra * rb).sum(),
        )
    rows = [
        t
        for t in ray.get(
            partials.groupby("k").sum(["n", "c"]).to_arrow_refs()
        )
        if t.num_rows
    ]
    pairs = ray.data.from_arrow(
        [t.rename_columns(["k", "n", "c"]) for t in rows]
        or [pa.Table.from_pydict(
            {"k": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64()),
             "c": pa.array([], pa.int64())}
        )]
    )
    pairs = pairs.materialize()

    # -- stage 2: average-rank map for x = event count ------------------
    def x_counts(batch: pa.Table) -> pa.Table:
        x, f = np.unique(
            batch.column("n").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.Table.from_pydict(
            {
                "x": pa.array(x, pa.int64()),
                "f": pa.array(f.astype(np.int64), pa.int64()),
            }
        )

    xc_partials = pairs.map_batches(
        x_counts, batch_format="pyarrow"
    ).materialize()
    xc = _combine_partials(xc_partials, ["x"], ["f"], combine_limit)
    if xc is None:
        rows = [
            t
            for t in ray.get(
                xc_partials.groupby("x").sum("f").to_arrow_refs()
            )
            if t.num_rows
        ]
        xc = pa.concat_tables(rows).rename_columns(["x", "sum(f)"])
    if not xc.num_rows:
        return _EMPTY
    xc = xc.sort_by([("x", "ascending")])
    xv = xc.column("x").to_numpy(zero_copy_only=False)
    xf = xc.column("sum(f)").to_numpy(zero_copy_only=False)
    n_total = int(xf.sum())
    smaller = np.cumsum(xf) - xf
    x_rank = smaller + (xf + 1) / 2.0  # 1-based average ranks
    x_map_ref = ray.put((xv, x_rank))

    # -- stage 3: bucket offsets for y = cent totals ---------------------
    shift = np.uint64(64 - bucket_bits)

    def add_bucket(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        bucket = (
            _monotone_bits(c.astype(np.float64)) >> shift
        ).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    keyed = pairs.map_batches(add_bucket, batch_format="pyarrow")
    keyed = keyed.materialize()

    def bucket_counts(batch: pa.Table) -> pa.Table:
        b, f = np.unique(
            batch.column("bucket").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(b, pa.int64()),
                "f": pa.array(f.astype(np.int64), pa.int64()),
            }
        )

    bc_partials = keyed.map_batches(
        bucket_counts, batch_format="pyarrow"
    ).materialize()
    bc = _combine_partials(bc_partials, ["bucket"], ["f"], combine_limit)
    if bc is None:
        rows = [
            t
            for t in ray.get(
                bc_partials.groupby("bucket").sum("f").to_arrow_refs()
            )
            if t.num_rows
        ]
        bc = pa.concat_tables(rows).rename_columns(["bucket", "sum(f)"])
    bc = bc.sort_by([("bucket", "ascending")])
    bb = bc.column("bucket").to_numpy(zero_copy_only=False)
    bf = bc.column("sum(f)").to_numpy(zero_copy_only=False)
    boffs = np.cumsum(bf) - bf
    off_ref = ray.put(dict(zip(bb.tolist(), boffs.tolist())))

    def sums_bucket(group: pa.Table) -> pa.Table:
        c = group.column("c").to_numpy(zero_copy_only=False)
        x = group.column("n").to_numpy(zero_copy_only=False)
        off = ray.get(off_ref)[int(group.column("bucket")[0].as_py())]
        order = np.argsort(c, kind="stable")
        c, x = c[order], x[order]
        m = len(c)
        # average ranks within the tie runs of c (global, 1-based)
        starts = np.concatenate(([0], np.nonzero(c[1:] != c[:-1])[0] + 1))
        run_len = np.diff(np.concatenate((starts, [m])))
        run_avg = off + starts + (run_len + 1) / 2.0  # off+starts is 0-based
        rb = np.repeat(run_avg, run_len)
        xv_b, xr_b = ray.get(x_map_ref)
        ra = xr_b[np.searchsorted(xv_b, x)]
        return pa.Table.from_pydict(
            {
                "sra": pa.array([float(ra.sum())]),
                "srb": pa.array([float(rb.sum())]),
                "sraa": pa.array([float((ra * ra).sum())]),
                "srbb": pa.array([float((rb * rb).sum())]),
                "srab": pa.array([float((ra * rb).sum())]),
                "m": pa.array([int(m)], pa.int64()),
            }
        )

    sum_rows = [
        t
        for t in ray.get(
            keyed.groupby("bucket")
            .map_groups(sums_bucket, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    st = pa.concat_tables(sum_rows)
    sra = float(np.sum(st.column("sra").to_numpy(zero_copy_only=False)))
    srb = float(np.sum(st.column("srb").to_numpy(zero_copy_only=False)))
    sraa = float(np.sum(st.column("sraa").to_numpy(zero_copy_only=False)))
    srbb = float(np.sum(st.column("srbb").to_numpy(zero_copy_only=False)))
    srab = float(np.sum(st.column("srab").to_numpy(zero_copy_only=False)))
    m = int(np.sum(st.column("m").to_numpy(zero_copy_only=False)))
    assert m == n_total
    return _rho_row(m, sra, srb, sraa, srbb, srab)


# -- exact Kendall tau-b at corpus key cardinality -----------------------------


def _strict_inversions(x: np.ndarray, y: np.ndarray) -> int:
    """EXACT count of pairs with ``x_i < x_j AND y_i > y_j`` — the
    discordant-pair count — in O(n log^2 n) with NO per-run Python:
    lexsort by (x, y) (equal-x pairs then sit y-ascending and can never
    count; equal-y pairs fail the strict >), then bottom-up merge
    passes where every pass counts ALL run pairs at once via the
    pair-offset trick: values offset by ``pair_id * (n+1)`` keep each
    pair's left half a contiguous sorted window of one global array, so
    one ``searchsorted`` answers every right element's
    greater-than-count simultaneously."""
    n = len(x)
    if n < 2:
        return 0
    order = np.lexsort((y, x))
    seq = y[order]
    cur = np.unique(seq, return_inverse=True)[1].astype(np.int64)
    if n >= (1 << 31):  # pair_id * (n+1) must fit int64
        raise ValueError("per-partition inversion count limited to 2^31 rows")
    total = 0
    idx = np.arange(n, dtype=np.int64)
    big = np.int64(n + 1)
    run = 1
    while run < n:
        pair_id = idx // (2 * run)
        is_right = (idx % (2 * run)) >= run
        off = pair_id * big
        left_vals = cur[~is_right] + off[~is_right]
        right_vals = cur[is_right] + off[is_right]
        if len(right_vals):
            # (#left <= v) globally, then strip earlier pairs' lefts
            cnt_le = np.searchsorted(left_vals, right_vals, side="right")
            left_counts = np.bincount(
                pair_id[~is_right], minlength=int(pair_id[-1]) + 1
            )
            left_prefix = np.cumsum(left_counts) - left_counts
            rp = pair_id[is_right]
            gt = left_counts[rp] - (cnt_le - left_prefix[rp])
            total += int(gt.sum())
        # merge each 2*run block: offsets dominate, so one global sort
        # of (offset + value) sorts every block in place
        cur = np.sort(cur + off, kind="stable") - off
        run *= 2
    return total


def _tie_pair_count(vals: np.ndarray) -> int:
    """Sum over distinct values of f*(f-1)/2 — the tie-pair count."""
    _, f = np.unique(vals, return_counts=True)
    f = f.astype(object)
    return int((f * (f - 1) // 2).sum()) if len(f) else 0


def _joint_tie_pair_count(x: np.ndarray, y: np.ndarray) -> int:
    order = np.lexsort((y, x))
    xs, ys = x[order], y[order]
    change = np.concatenate(
        ([True], (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1]))
    )
    starts = np.nonzero(change)[0]
    f = np.diff(np.concatenate((starts, [len(xs)]))).astype(object)
    return int((f * (f - 1) // 2).sum()) if len(f) else 0


def kendall_user_metrics(
    sf_dir: str,
    grid_bits: int = 10,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """EXACT Kendall tau-b (tie-corrected) between per-user activity
    (event count) and monetary total (Σ value) — the O(n²)-pairs rank
    statistic, computed at corpus key cardinality with NO pair
    enumeration and NO global sort.

    Every unordered user pair is discordant, concordant, or tied;
    tau-b needs the discordant count Q and the tie counts. Q
    decomposes EXACTLY over an order-preserving 2-D grid (the
    float-bit bucket transform on both metrics, ``grid_bits`` per
    axis; ties never straddle a bucket):

    - both buckets differ → the grid-count MATRIX answers in bulk:
      ``Q_cross = Σ g[bx1,by1]·g[bx2,by2]`` over ``bx1<bx2, by1>by2``,
      one suffix-prefix sweep over ≤ 2^(2·grid_bits) cells;
    - same x-bucket → counted exactly inside ONE ``groupby(bx)`` pass
      (vectorized merge-pass inversion counter, O(m log² m) per
      partition) — which also yields the x-tie and joint-tie counts
      (ties live wholly inside one bucket);
    - same y-bucket, different x-bucket → ONE ``groupby(by)`` pass:
      (all-pairs local count) − (same-bx local count via the
      segment-offset variant) — plus the y-tie count.

    The driver fast tier (per-user partials under ``combine_limit``)
    runs the counter once on the driver; ``kendall_user_metrics_grouped``
    forces the grid + two-exchange decomposition. Tie/pair totals use
    exact integer math (object dtype past int64); the final ratio is
    the only float.
    """
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def um_partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {
                "k": batch.column("user_id").cast(pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "c": pa.array(_cents(batch.column("value")), pa.int64()),
            }
        )
        return (
            t.group_by("k").aggregate([("n", "sum"), ("c", "sum")])
            .rename_columns(["k", "n", "c"])
        )

    _EMPTY = pa.Table.from_pydict(
        {
            "n_users": pa.array([], pa.int64()),
            "kendall_tau": pa.array([], pa.float64()),
        }
    )

    def _tau_row(m: int, q: int, n1: int, n2: int, n3: int) -> pa.Table:
        n0 = m * (m - 1) // 2  # Python ints: exact at any m
        p = n0 - n1 - n2 + n3 - q
        da, db = n0 - n1, n0 - n2
        tau = (
            float(p - q) / float(np.sqrt(float(da) * float(db)))
            if da > 0 and db > 0
            else float("nan")
        )
        return pa.Table.from_pydict(
            {
                "n_users": pa.array([m], pa.int64()),
                "kendall_tau": pa.array([tau], pa.float64()),
            }
        )

    partials = ds.map_batches(
        um_partial, batch_format="pyarrow"
    ).materialize()
    merged = _combine_partials(partials, ["k"], ["n", "c"], combine_limit)
    if merged is not None:
        if not merged.num_rows:
            return _EMPTY
        x = merged.column("sum(n)").to_numpy(zero_copy_only=False)
        y = merged.column("sum(c)").to_numpy(zero_copy_only=False)
        return _tau_row(
            len(x),
            _strict_inversions(x, y),
            _tie_pair_count(x),
            _tie_pair_count(y),
            _joint_tie_pair_count(x, y),
        )

    rows = [
        t
        for t in ray.get(partials.groupby("k").sum(["n", "c"]).to_arrow_refs())
        if t.num_rows
    ]
    if not rows:
        return _EMPTY
    pairs = ray.data.from_arrow(
        [t.rename_columns(["k", "n", "c"]) for t in rows]
    ).materialize()

    # RANGE-SCALED buckets, not raw top bits: both metrics occupy a
    # narrow band of the IEEE key space (event counts share one
    # exponent octave), where top-bits bucketing collapses to a single
    # bucket and degenerates pass A into one giant partition. A
    # min/max pre-pass scales the occupied key range across 2^grid_bits
    # buckets; float rounding of a monotone map stays monotone, and
    # equal values still share a bucket (the tie-locality invariant).
    def key_range(batch: pa.Table) -> pa.Table:
        kx = _monotone_bits(
            batch.column("n").to_numpy(zero_copy_only=False).astype(
                np.float64
            )
        )
        ky = _monotone_bits(
            batch.column("c").to_numpy(zero_copy_only=False).astype(
                np.float64
            )
        )
        return pa.Table.from_pydict(
            {
                "xlo": pa.array([int(kx.min())], pa.uint64()),
                "xhi": pa.array([int(kx.max())], pa.uint64()),
                "ylo": pa.array([int(ky.min())], pa.uint64()),
                "yhi": pa.array([int(ky.max())], pa.uint64()),
            }
        )

    rng_rows = [
        t
        for t in ray.get(
            pairs.map_batches(key_range, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    rt = pa.concat_tables(rng_rows)
    xlo = int(pc.min(rt.column("xlo")).as_py())
    xhi = int(pc.max(rt.column("xhi")).as_py())
    ylo = int(pc.min(rt.column("ylo")).as_py())
    yhi = int(pc.max(rt.column("yhi")).as_py())
    n_buckets = 1 << grid_bits

    def _range_bucket(keys: np.ndarray, lo: int, hi: int) -> np.ndarray:
        if hi == lo:
            return np.zeros(len(keys), dtype=np.int64)
        scaled = (keys - np.uint64(lo)).astype(np.float64) * (
            float(n_buckets) / float(hi - lo + 1)
        )
        return np.minimum(
            scaled.astype(np.int64), np.int64(n_buckets - 1)
        )

    def add_grid(batch: pa.Table) -> pa.Table:
        xv = batch.column("n").to_numpy(zero_copy_only=False)
        cv = batch.column("c").to_numpy(zero_copy_only=False)
        bx = _range_bucket(
            _monotone_bits(xv.astype(np.float64)), xlo, xhi
        )
        by = _range_bucket(
            _monotone_bits(cv.astype(np.float64)), ylo, yhi
        )
        return pa.Table.from_pydict(
            {
                "n": pa.array(xv, pa.int64()),
                "c": pa.array(cv, pa.int64()),
                "bx": pa.array(bx, pa.int64()),
                "by": pa.array(by, pa.int64()),
            }
        )

    gridded = pairs.map_batches(add_grid, batch_format="pyarrow")
    gridded = gridded.materialize()

    # grid-count matrix (≤ 2^(2·grid_bits) cells, mergeable partials)
    def cell_counts(batch: pa.Table) -> pa.Table:
        bx = batch.column("bx").to_numpy(zero_copy_only=False)
        by = batch.column("by").to_numpy(zero_copy_only=False)
        key = (bx << np.int64(grid_bits + 1)) | by
        uk, f = np.unique(key, return_counts=True)
        return pa.Table.from_pydict(
            {
                "cell": pa.array(uk, pa.int64()),
                "f": pa.array(f.astype(np.int64), pa.int64()),
            }
        )

    cc_partials = gridded.map_batches(
        cell_counts, batch_format="pyarrow"
    ).materialize()
    cc = _combine_partials(cc_partials, ["cell"], ["f"], combine_limit)
    if cc is None:
        crows = [
            t
            for t in ray.get(
                cc_partials.groupby("cell").sum("f").to_arrow_refs()
            )
            if t.num_rows
        ]
        cc = pa.concat_tables(crows).rename_columns(["cell", "sum(f)"])
    cells = cc.column("cell").to_numpy(zero_copy_only=False)
    cf = cc.column("sum(f)").to_numpy(zero_copy_only=False)
    bx_c = cells >> np.int64(grid_bits + 1)
    by_c = cells & np.int64((1 << (grid_bits + 1)) - 1)
    ux, ix = np.unique(bx_c, return_inverse=True)
    uy, iy = np.unique(by_c, return_inverse=True)
    m_total = int(cf.sum())
    # int64 cell products are exact while n < 3e9 (g1*suffix ≤ n²);
    # past that float64 still holds tau to far better than 6dp
    gdt = np.int64 if m_total < (1 << 31) else np.float64
    G = np.zeros((len(ux), len(uy)), dtype=gdt)
    G[ix, iy] = cf
    # S[i, j] = Σ_{i' > i, j' < j} G[i', j']  (strictly later x-bucket,
    # strictly earlier y-bucket) — suffix over rows, prefix over cols
    row_suffix = np.cumsum(G[::-1, :], axis=0)[::-1, :]
    later = np.zeros_like(G)
    later[:-1, :] = row_suffix[1:, :]
    S = np.zeros_like(G)
    S[:, 1:] = np.cumsum(later, axis=1)[:, :-1]
    q_cross = int((G.astype(object) * S.astype(object)).sum())

    _PART_EMPTY = pa.Table.from_pydict(
        {
            "q": pa.array([], pa.int64()),
            "n1": pa.array([], pa.int64()),
            "n3": pa.array([], pa.int64()),
        }
    )

    def pass_a(group: pa.Table) -> pa.Table:
        if not group.num_rows:
            return _PART_EMPTY
        x = group.column("n").to_numpy(zero_copy_only=False)
        y = group.column("c").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "q": pa.array([_strict_inversions(x, y)], pa.int64()),
                "n1": pa.array([_tie_pair_count(x)], pa.int64()),
                "n3": pa.array([_joint_tie_pair_count(x, y)], pa.int64()),
            }
        )

    def pass_b(group: pa.Table) -> pa.Table:
        if not group.num_rows:
            return pa.Table.from_pydict(
                {"q": pa.array([], pa.int64()), "n2": pa.array([], pa.int64())}
            )
        x = group.column("n").to_numpy(zero_copy_only=False)
        y = group.column("c").to_numpy(zero_copy_only=False)
        bx = group.column("bx").to_numpy(zero_copy_only=False)
        q_all = _strict_inversions(x, y)
        # same-bx pairs only: dense-rank x and y, offset both by the
        # bx segment so cross-segment pairs can never sort adjacent as
        # (x <) nor count as (y >)
        n = len(x)
        xr = np.unique(x, return_inverse=True)[1].astype(np.int64)
        yr = np.unique(y, return_inverse=True)[1].astype(np.int64)
        br = np.unique(bx, return_inverse=True)[1].astype(np.int64)
        big = np.int64(n + 1)
        q_same = _strict_inversions(br * big + xr, br * big + yr)
        return pa.Table.from_pydict(
            {
                "q": pa.array([q_all - q_same], pa.int64()),
                "n2": pa.array([_tie_pair_count(y)], pa.int64()),
            }
        )

    a_rows = [
        t
        for t in ray.get(
            gridded.groupby("bx")
            .map_groups(pass_a, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    b_rows = [
        t
        for t in ray.get(
            gridded.groupby("by")
            .map_groups(pass_b, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    at = pa.concat_tables(a_rows) if a_rows else _PART_EMPTY
    bt = (
        pa.concat_tables(b_rows)
        if b_rows
        else pa.Table.from_pydict(
            {"q": pa.array([], pa.int64()), "n2": pa.array([], pa.int64())}
        )
    )

    def _isum(tbl: pa.Table, col: str) -> int:
        arr = tbl.column(col).to_numpy(zero_copy_only=False)
        return int(arr.astype(object).sum()) if len(arr) else 0

    q = q_cross + _isum(at, "q") + _isum(bt, "q")
    return _tau_row(
        m_total, q, _isum(at, "n1"), _isum(bt, "n2"), _isum(at, "n3")
    )


# -- Theil–Sen robust trend ---------------------------------------------------

_TS_EMPTY = pa.Table.from_pydict(
    {
        "user_id": pa.array([], pa.int64()),
        "n_pairs": pa.array([], pa.int64()),
        "slope_per_hour": pa.array([], pa.float64()),
    }
)

_US_PER_HOUR = 3_600_000_000.0


def theil_sen_trend(
    sf_dir: str, driver_budget: int = 2_000_000,
    hot_pair_cap: int = 20_000_000,
    sink_dir: str | None = None,
    hot_sample: int | None = None,
) -> pa.Table | str:
    """Per-user Theil–Sen slope of ``value`` over time — the MEDIAN of
    all pairwise slopes ``(v_j - v_i) / Δhours`` across event pairs
    with strictly increasing ``ts``. The robust complement to
    ``user_value_trend``'s OLS: a single outlier event moves OLS
    arbitrarily but shifts the pairwise-slope median by at most one
    order statistic (breakdown point ~29%).

    Pair enumeration is O(k²) per user but fully vectorized across
    ALL users in a partition (no per-key Python): each row at local
    position l in its user run is the RIGHT element of exactly l
    pairs, so ``np.repeat`` of the row index by l plus one global
    ramp materializes every (i, j) index pair in two allocations.
    Same-``ts`` pairs are excluded AFTER enumeration (they carry no
    slope and the SQL mirror's ``e2.ts > e1.ts`` join drops them).
    The slope is computed exactly as the oracle does —
    ``(v_j - v_i) / ((us_j - us_i) / US_PER_HOUR)`` with the int64
    microsecond difference taken first — so the doubles are
    bit-identical and the per-user median (sorted segment middle,
    even-count midpoint average == SQL ``quantile_cont(0.5)``) picks
    identical elements.

    Scale: pair volume is Σ m_u(m_u-1)/2 — quadratic in the HOT
    user's event count, so each partition pass refuses past
    ``hot_pair_cap`` emitted pairs with remediation (subsample the
    hot entity upstream or raise the cap) rather than silently
    OOMing; for the benchmark event table m_u is O(100). Driver fast
    tier under the events FOOTER probe; ``theil_sen_trend_grouped``
    forces the co-partition exchange.

    Opt-in hot-entity subsample tier (VERDICT r4 #5): with
    ``hot_sample=N``, any user holding MORE than N events is first
    reduced to its N events with the smallest multiplicative hash of
    ``event_id`` — deterministic, partition-independent, and
    order-free (no dependence on block layout) — BEFORE the cap
    check, and the output gains a ``sampled`` bool column recording
    which users were estimated from a subsample. The slope for a
    sampled user is the Theil–Sen estimate over a uniform-like
    pseudo-random N-subset (the estimator's breakdown robustness is
    exactly why subsampling is statistically sound here). Default
    ``hot_sample=None`` keeps the hard refusal and the
    oracle-matched schema.
    """
    from .io import parquet_num_rows

    if hot_sample is not None and hot_sample < 1:
        raise ValueError("theil_sen_trend: hot_sample must be >= 1")
    num_parts = _num_parts()
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    _empty = (
        _TS_EMPTY
        if hot_sample is None
        else _TS_EMPTY.append_column(
            "sampled", pa.array([], pa.bool_())
        )
    )

    def sen_part(group: pa.Table) -> pa.Table:
        n_rows = group.num_rows
        if not n_rows:
            return _empty
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        eids = group.column("event_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        vals = group.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        order = np.lexsort((eids, ts, users))
        users, ts, vals = users[order], ts[order], vals[order]
        eids_s = eids[order]
        from .fuzzy import _run_pairs

        run_start = np.concatenate(([True], users[1:] != users[:-1]))
        starts = np.nonzero(run_start)[0]
        m = np.diff(np.append(starts, n_rows))
        hot_users = np.array([], dtype=users.dtype)
        if hot_sample is not None and (m > hot_sample).any():
            # deterministic per-user subsample: keep each hot user's
            # `hot_sample` events with the smallest event_id hash
            # (multiplicative hash — global, partition-independent)
            hot_users = users[starts[m > hot_sample]]
            h = eids_s.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            horder = np.lexsort((h, users))
            u_h = users[horder]
            hs = np.nonzero(
                np.concatenate(([True], u_h[1:] != u_h[:-1]))
            )[0]
            local = np.arange(n_rows) - np.repeat(
                hs, np.diff(np.append(hs, n_rows))
            )
            keep_rows = np.empty(n_rows, dtype=bool)
            keep_rows[horder] = local < hot_sample
            users, ts, vals = (
                users[keep_rows], ts[keep_rows], vals[keep_rows]
            )
            n_rows = len(users)
            if not n_rows:
                return _empty
            run_start = np.concatenate(
                ([True], users[1:] != users[:-1])
            )
            starts = np.nonzero(run_start)[0]
            m = np.diff(np.append(starts, n_rows))
        total_pairs = int((m * (m - 1) // 2).sum())
        if total_pairs > hot_pair_cap:
            raise ValueError(
                "theil_sen_trend: pairwise-slope emission "
                f"({total_pairs}) exceeds hot_pair_cap ({hot_pair_cap}); "
                "pass hot_sample=N for the deterministic subsample "
                "tier, or raise the cap"
            )
        if not total_pairs:
            return _empty
        # shared repeat+ramp within-run pair enumeration (runs tile the
        # sorted partition, so local indices ARE global indices)
        i_idx, j_idx = _run_pairs(m)
        dus = ts[j_idx] - ts[i_idx]
        keep = dus > 0  # strictly increasing ts, like the SQL join
        if not keep.any():
            return _empty
        i_idx, j_idx, dus = i_idx[keep], j_idx[keep], dus[keep]
        slopes = (vals[j_idx] - vals[i_idx]) / (
            dus.astype(np.float64) / _US_PER_HOUR
        )
        pu = users[j_idx]
        sorder = np.lexsort((slopes, pu))
        pu, slopes = pu[sorder], slopes[sorder]
        p_start = np.concatenate(([True], pu[1:] != pu[:-1]))
        offs = np.nonzero(p_start)[0]
        cnt = np.diff(np.append(offs, len(pu)))
        mid = offs + cnt // 2
        med = np.where(
            cnt % 2 == 1,
            slopes[mid],
            (slopes[np.maximum(mid - 1, 0)] + slopes[mid]) / 2.0,
        )
        out = {
            "user_id": pa.array(pu[offs], pa.int64()),
            "n_pairs": pa.array(cnt, pa.int64()),
            "slope_per_hour": pa.array(med, pa.float64()),
        }
        if hot_sample is not None:
            # record which users were estimated from a subsample
            out["sampled"] = pa.array(
                np.isin(pu[offs], hot_users), pa.bool_()
            )
        return pa.Table.from_pydict(out)

    if (
        sink_dir is None
        and driver_budget
        and parquet_num_rows(f"{sf_dir}/events.parquet") <= driver_budget
    ):
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not parts:
            return _empty
        whole = pa.concat_tables(parts).combine_chunks()
        return sen_part(whole).sort_by([("user_id", "ascending")])

    out = (
        ds.map_batches(
            lambda b: _stamp_user_part(b, num_parts),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: sen_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return to_table_or_sink(out, [("user_id", "ascending")], sink_dir)


# -- inter-arrival burstiness --------------------------------------------------

_BU_EMPTY = pa.Table.from_pydict(
    {
        "user_id": pa.array([], pa.int64()),
        "n_gaps": pa.array([], pa.int64()),
        "mean_gap_hours": pa.array([], pa.float64()),
        "std_gap_hours": pa.array([], pa.float64()),
        "burstiness": pa.array([], pa.float64()),
    }
)


def user_burstiness(
    sf_dir: str, driver_budget: int = 2_000_000,
    sink_dir: str | None = None,
) -> pa.Table | str:
    """Per-user inter-arrival burstiness of the event stream: gaps
    between consecutive events (hours, in (ts, event_id) order), their
    mean and population std, and Goh–Barabási burstiness
    ``B = (σ − μ) / (σ + μ)`` — B→−1 periodic, 0 Poisson, →1 bursty.
    The temporal-regularity profile bots/scrapers fail (B ≈ −1) and
    humans don't; runs next to ``lag1_autocorr`` in the per-entity
    profile family.

    Gaps are exact int64 µs differences divided once by 3.6e9
    (bit-identical to the oracle's ``epoch_us`` LAG arithmetic); the
    per-user Σg and Σg² fold with reduceat (segment-independent float
    order, the NOTES_r4 edge); σ = sqrt(max(Σg²/n − μ², 0)) with the
    clamp mirrored by GREATEST; an all-zero-gap user has σ + μ = 0
    and yields NULL burstiness exactly like DuckDB's x/0. Users with
    one event drop (no gap), mirroring the WHERE gap IS NOT NULL.
    Driver fast tier under the events FOOTER probe;
    ``user_burstiness_grouped`` forces the co-partition exchange."""
    from .io import parquet_num_rows

    num_parts = _num_parts()
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def burst_part(group: pa.Table) -> pa.Table:
        n_rows = group.num_rows
        if not n_rows:
            return _BU_EMPTY
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        eids = group.column("event_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        order = np.lexsort((eids, ts, users))
        users, ts = users[order], ts[order]
        run_start = np.concatenate(([True], users[1:] != users[:-1]))
        starts = np.nonzero(run_start)[0]
        m = np.diff(np.append(starts, n_rows))
        keep_u = m >= 2
        if not keep_u.any():
            return _BU_EMPTY
        # consecutive gaps within runs: diff of the sorted ts, with the
        # cross-user seams masked out
        d = np.diff(ts).astype(np.float64) / _US_PER_HOUR
        seam = np.zeros(n_rows - 1, bool)
        seam[starts[1:] - 1] = True
        gstarts = starts[keep_u] - np.searchsorted(
            starts, starts[keep_u]
        )  # gap-array offset: each earlier run start removes one slot
        gaps = d[~seam]
        n = (m[keep_u] - 1).astype(np.int64)
        s = np.add.reduceat(gaps, gstarts)
        ss = np.add.reduceat(gaps * gaps, gstarts)
        nf = n.astype(np.float64)
        mean = s / nf
        var = ss / nf - mean * mean
        std = np.sqrt(np.maximum(var, 0.0))
        denom = std + mean
        with np.errstate(divide="ignore", invalid="ignore"):
            burst = np.where(denom == 0.0, np.nan, (std - mean) / denom)
        return pa.Table.from_pydict(
            {
                "user_id": pa.array(users[starts[keep_u]], pa.int64()),
                "n_gaps": pa.array(n, pa.int64()),
                "mean_gap_hours": pa.array(mean, pa.float64()),
                "std_gap_hours": pa.array(std, pa.float64()),
                "burstiness": pa.array(burst, pa.float64()),
            }
        )

    if (
        sink_dir is None
        and driver_budget
        and parquet_num_rows(f"{sf_dir}/events.parquet") <= driver_budget
    ):
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not parts:
            return _BU_EMPTY
        whole = pa.concat_tables(parts).combine_chunks()
        return burst_part(whole).sort_by([("user_id", "ascending")])

    out = (
        ds.map_batches(
            lambda b: _stamp_user_part(b, num_parts),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: burst_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return to_table_or_sink(out, [("user_id", "ascending")], sink_dir)


def value_concentration(
    sf_dir: str, combine_limit: int = 2_000_000
) -> pa.Table:
    """Contribution concentration: the share of total event ``value``
    held by the top 1% and top 10% of users (NTILE(100) percentile
    semantics over (total, user_id)) — the whale-detection readout
    next to ``gini_coefficient``; skewed corpora mean a handful of
    entities dominate a metric and sampling must stratify.

    Pure composition: ``user_value_deciles(tiles=100)`` supplies the
    per-percentile (n, Σ) rows through its own two tiers (combine
    budget + the shared ``_ntile_cents`` distributed core); this fold
    is 100 driver rows. NTILE tie/remainder semantics are therefore
    identical to the oracle's by construction; an under-populated
    percentile grid (< 100 users) leaves missing tiles and the
    corresponding share NULL, mirroring SUM(...) FILTER over no rows.
    """
    cent = user_value_deciles(
        sf_dir, tiles=100, combine_limit=combine_limit
    )
    tiles = cent.column("tile").to_numpy(zero_copy_only=False)
    n = cent.column("n_users").to_numpy(zero_copy_only=False)
    s = cent.column("sum_total").to_numpy(zero_copy_only=False)
    total = float(s.sum()) if len(s) else 0.0
    top1 = tiles == 100
    top10 = tiles > 90
    return pa.Table.from_pydict(
        {
            "n_users": pa.array([int(n.sum())], pa.int64()),
            "top1_users": pa.array([int(n[top1].sum())], pa.int64()),
            "top1_share": pa.array(
                [
                    round(float(s[top1].sum()) / total, 6)
                    if top1.any() and total != 0.0
                    else None
                ],
                pa.float64(),
            ),
            "top10_share": pa.array(
                [
                    round(float(s[top10].sum()) / total, 6)
                    if top10.any() and total != 0.0
                    else None
                ],
                pa.float64(),
            ),
        }
    )


# -- stream throttle / debounce -----------------------------------------------

_TH_EMPTY = pa.Table.from_pydict(
    {
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us")),
    }
)


def event_throttle(
    sf_dir: str, min_gap_minutes: int = 30,
    driver_budget: int = 2_000_000,
    sink_dir: str | None = None,
) -> pa.Table | ray.data.Dataset | str:
    """Stream throttle (debounce): keep an event iff it is the FIRST
    of its (user, event_type) stream or arrived >= ``min_gap_minutes``
    after the PREVIOUS event of that stream (LAG semantics — the
    deterministic, partition-algebra-friendly variant; previous-KEPT
    debouncing is a sequential recurrence and intentionally out of
    contract) — the duplicate-fire suppressor every event-ingest
    pipeline runs before sessionization.

    Per-(user, type) runs sort by (ts, event_id); gaps are exact int64
    µs diffs; the first row of each run keeps (NULL LAG). Driver fast
    tier under the events FOOTER probe; ``event_throttle_grouped``
    forces the hash(user) co-partition (type runs nest inside user
    partitions, so the exchange key stays the module's shared user
    stamp); sink variant streams kept rows at deployment scale."""
    from .io import parquet_num_rows

    num_parts = _num_parts()
    ds = _read(
        sf_dir, "events", ["event_id", "user_id", "event_type", "ts"]
    )
    gap_us = np.int64(min_gap_minutes) * 60_000_000

    def throttle_part(group: pa.Table) -> pa.Table:
        n_rows = group.num_rows
        if not n_rows:
            return _TH_EMPTY
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        eids = group.column("event_id").to_numpy(zero_copy_only=False)
        types = np.asarray(
            group.column("event_type").to_numpy(zero_copy_only=False),
            dtype=object,
        )
        ts = group.column("ts").to_numpy().astype("datetime64[us]").astype(
            np.int64
        )
        order = np.lexsort((eids, ts, types, users))
        su, st, sty, se = users[order], ts[order], types[order], eids[order]
        new_run = np.concatenate(
            ([True], (su[1:] != su[:-1]) | (sty[1:] != sty[:-1]))
        )
        gap = np.empty(n_rows, np.int64)
        gap[0] = 0
        gap[1:] = st[1:] - st[:-1]
        keep = new_run | (gap >= gap_us)
        sel = np.sort(order[keep])  # original-order stability
        return group.take(pa.array(sel)).select(
            ["event_id", "user_id", "event_type", "ts"]
        )

    if (
        sink_dir is None
        and driver_budget
        and parquet_num_rows(f"{sf_dir}/events.parquet") <= driver_budget
    ):
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not parts:
            return _TH_EMPTY
        whole = pa.concat_tables(parts).combine_chunks()
        return throttle_part(whole).sort_by([("event_id", "ascending")])

    out = (
        ds.map_batches(
            lambda b: _stamp_user_part(b, num_parts),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(
            lambda g: throttle_part(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    return to_table_or_sink(out, [("event_id", "ascending")], sink_dir)
