"""Distributed keyed join, composed for an engine without a native one.

Ray Data has no two-sided join/cogroup primitive (SURVEY.md §2.4: the
reference needs none, but corpus-scale verify phases do once their
build side outgrows a broadcast). The composition is the standard
UNION-COGROUP idiom:

    project both sides to one wide schema (null-padded) and tag them
    -> union -> coarse hash(key) % P partition -> groupby(part) ->
    inside each group, split by tag, sort the right side's keys, and
    attach payloads to left rows with one vectorized searchsorted

One all-to-all exchange, vectorized per partition, works at any key
cardinality — the over-budget fallback for every broadcast join in
this repo.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def string_key_buckets(col: pa.ChunkedArray | pa.Array, num_parts: int) -> np.ndarray:
    """Vectorized coarse shuffle key for a STRING column:
    ``hash(key) % P`` as int32, computed by pandas' Cython
    ``hash_array`` (deterministic across processes; nulls hash to a
    fixed value). ``categorize=True`` hashes each distinct string once
    — LSH band keys and urls repeat heavily. The bucket value only
    routes rows (all rows of a key share a bucket); it never reaches
    output, so the hash function choice is free.
    """
    import pandas as pd

    vals = col.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(vals, dtype=object), categorize=True)
    return (h % np.uint64(num_parts)).astype(np.int32)


def int_key_buckets(vals: np.ndarray, num_parts: int) -> np.ndarray:
    """Vectorized coarse shuffle key for INT64 key arrays:
    Fibonacci-multiplicative hash then ``% num_parts`` as int32. Like
    ``string_key_buckets``, the bucket only routes rows (all rows of a
    key share a bucket) so a groupby can key on ~4*CPU buckets and the
    per-group work stays vectorized — never one Python call per key."""
    h = vals.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(33)) % np.uint64(num_parts)).astype(np.int32)


def default_num_buckets() -> int:
    """~4 groups per CPU: enough for balance, few enough that per-group
    Python overhead is negligible."""
    return 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))


def cogroup_attach(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_fields: list[pa.Field],
    payload_fields: list[pa.Field],
    num_parts: int | None = None,
    hot_keys: list | None = None,
    n_salts: int | None = None,
) -> ray.data.Dataset:
    """LEFT JOIN ``right`` onto ``left`` by the int64 OR string column
    ``key``.

    ``left_fields``: left's columns (including ``key``);
    ``payload_fields``: right's non-key columns to attach (right must
    be unique per key). Unmatched left rows — including null-key rows —
    get null payloads. Fields are passed explicitly so the wide union
    schema needs no plan execution to discover.

    **Hot-key salting** (``hot_keys``): a key holding a large fraction
    of the probe mass lands its ENTIRE group in one ``__part`` bucket —
    the classic straggler. Passing its value(s) spreads the left side's
    hot rows round-robin over ``n_salts`` consecutive partitions while
    the right side's matching row (unique per key by contract, so
    replication cannot duplicate output) is REPLICATED into each of
    those partitions. Join semantics are unchanged — each left row
    still meets exactly one copy of its payload — but the hot group's
    work parallelizes ``n_salts``-ways. Callers discover candidates
    with ``profiling.partition_skew_report`` (the planning side of the
    same coin). ``n_salts`` defaults to ``min(16, num_parts)`` and is
    clamped to ``num_parts`` so two replicas of one key can never share
    a partition (which would break per-partition key uniqueness).
    """
    if num_parts is None:
        num_parts = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    hot_arr = None  # typed after the wide schema is known (below)
    left_names = [f.name for f in left_fields]
    payload_names = [f.name for f in payload_fields]
    wide = {f.name: f.type for f in list(left_fields) + list(payload_fields)}
    str_key = pa.types.is_string(wide[key]) or pa.types.is_large_string(
        wide[key]
    )
    if hot_keys:
        n_salts = min(n_salts or 16, num_parts)
        hot_arr = pa.array(list(hot_keys), type=wide[key])
    else:
        n_salts = 1

    def widen(side: int):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols: dict[str, pa.Array] = {}
            for name, typ in wide.items():
                if name in batch.column_names:
                    cols[name] = batch.column(name)
                else:
                    cols[name] = pa.nulls(n, typ)
            if str_key:
                part = string_key_buckets(batch.column(key), num_parts)
            else:
                keys = batch.column(key).to_numpy(zero_copy_only=False)
                part = (
                    (keys.astype(np.uint64) * np.uint64(2654435761))
                    % np.uint64(num_parts)
                ).astype(np.int32)
            if hot_arr is not None:
                hot = np.asarray(
                    pc.fill_null(
                        pc.is_in(batch.column(key), value_set=hot_arr), False
                    ).to_numpy(zero_copy_only=False),
                    dtype=bool,
                )
                if side == 0 and hot.any():
                    # spread probe rows round-robin over the salt range
                    idx = np.flatnonzero(hot)
                    part = part.copy()
                    part[idx] = (
                        part[idx] + (np.arange(len(idx)) % n_salts)
                    ).astype(np.int32) % num_parts
                elif side == 1 and hot.any():
                    # replicate each (unique-per-key) build row into
                    # every salt partition its probes may land in
                    base = pa.Table.from_pydict(
                        {**cols,
                         "__part": pa.array(part, pa.int32()),
                         "__side": pa.array(np.full(n, side, np.int8))}
                    )
                    extras = []
                    hot_tbl = base.filter(pa.array(hot))
                    hot_part = part[hot]
                    for s in range(1, n_salts):
                        shifted = ((hot_part + s) % num_parts).astype(np.int32)
                        extras.append(
                            hot_tbl.set_column(
                                hot_tbl.schema.get_field_index("__part"),
                                "__part",
                                pa.array(shifted, pa.int32()),
                            )
                        )
                    return pa.concat_tables([base] + extras)
            cols["__part"] = pa.array(part, pa.int32())
            cols["__side"] = pa.array(np.full(n, side, np.int8))
            return pa.Table.from_pydict(cols)

        return f

    tagged = left.map_batches(widen(0), batch_format="pyarrow").union(
        right.map_batches(widen(1), batch_format="pyarrow")
    )

    def join_part(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        l_tbl = group.filter(pa.array(side == 0))
        r_tbl = group.filter(pa.array(side == 1))
        out: dict[str, pa.Array] = {c: l_tbl.column(c) for c in left_names}
        if l_tbl.num_rows == 0 or r_tbl.num_rows == 0:
            for c in payload_names:
                out[c] = pa.nulls(l_tbl.num_rows, wide[c])
            return pa.Table.from_pydict(out)
        if str_key:
            # vectorized hash join via pandas reindex (handles null
            # keys: None maps to no match -> null payload)
            import pandas as pd

            r_keys = r_tbl.column(key).to_numpy(zero_copy_only=False)
            l_keys = l_tbl.column(key).to_numpy(zero_copy_only=False)
            mapping = pd.Series(
                np.arange(len(r_keys), dtype=np.int64),
                index=pd.Index(r_keys, dtype=object),
            )
            got = pd.Series(l_keys, dtype=object).map(mapping).to_numpy()
            matched = ~pd.isna(got)
            take = np.where(matched, got, 0).astype(np.int64)
        else:
            r_keys = (
                r_tbl.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            order = np.argsort(r_keys, kind="stable")
            r_sorted = r_keys[order]
            l_keys = (
                l_tbl.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            pos = np.minimum(np.searchsorted(r_sorted, l_keys), len(r_sorted) - 1)
            matched = r_sorted[pos] == l_keys
            take = np.where(matched, order[pos], 0)
        idx = pa.array(take.astype(np.int64), type=pa.int64(), mask=~matched)
        for c in payload_names:
            out[c] = r_tbl.column(c).take(idx)
        return pa.Table.from_pydict(out)

    return tagged.groupby("__part").map_groups(
        lambda g: join_part(g.drop_columns(["__part"])),
        batch_format="pyarrow",
    )


# -- int-key Bloom filter (semi-join pushdown) ------------------------------
#
# The classic 100-TB join optimization: build a bit-packed Bloom filter
# over the (filtered) dim keys, broadcast the ~MB bitmap instead of the
# key list, and pre-filter the fact side in a pure map BEFORE the
# key-only exchange — the exchange then carries only true matches plus
# a fill**k sliver of false positives, which an exact cogroup verify
# removes. Correctness never depends on the filter (no false
# negatives + exact verify), so sizing is purely a perf knob.
#
# Hashing is multiplicative high-bit mixing straight on the int64 key
# (the `cms_buckets` scheme minus the md5 — these bits never reach
# output or oracle, so the hash choice is free and stays fully
# vectorized).

_BLOOM_INT_MULTS = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0xD6E8FEB86659FD93,
)


def _int_bloom_positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(k, n) bit positions for int64 keys; ``m`` must be a power of
    two. High-bit mixing keeps the k rows pairwise-decorrelated."""
    shift = np.uint64(64 - (int(m) - 1).bit_length())
    h = keys.astype(np.uint64)
    return np.stack(
        [((h * np.uint64(_BLOOM_INT_MULTS[j])) >> shift) for j in range(k)]
    )


def int_bloom_build(keys: np.ndarray, m: int, k: int = 4) -> np.ndarray:
    """Bit-packed (uint64[m/64]) Bloom bitmap of ``keys`` — mergeable
    by bitwise OR (union of partials == partial of the union)."""
    bits = np.zeros(m >> 6, dtype=np.uint64)
    if len(keys):
        pos = _int_bloom_positions(keys, m, k)
        np.bitwise_or.at(
            bits, (pos >> 6).ravel(),
            np.uint64(1) << (pos.ravel() & np.uint64(63)),
        )
    return bits


def int_bloom_query(bits: np.ndarray, keys: np.ndarray, k: int = 4) -> np.ndarray:
    """Membership mask: True iff ALL k positions are set. No false
    negatives; false positives ~= fill_fraction**k."""
    if len(keys) == 0:
        return np.empty(0, dtype=bool)
    pos = _int_bloom_positions(keys, len(bits) << 6, k)
    got = (bits[pos >> 6] >> (pos & np.uint64(63))) & np.uint64(1)
    return got.all(axis=0)


def bloom_or_reduce(ds: ray.data.Dataset, m: int) -> np.ndarray:
    """OR-merge per-block bitmap partials (one binary row per block)
    into the final bitmap WITHOUT landing every partial on the driver:
    a fan-in tree of small ``ray.remote`` OR tasks (the one register
    merge Dataset aggregation can't express — OR is not a sum), depth
    log_F(blocks), so the driver holds O(F) bitmaps at any moment."""
    fan = 32

    @ray.remote
    def _or(*tbls) -> pa.Table:
        acc = np.zeros(m >> 6, dtype=np.uint64)
        for t in tbls:
            for buf in t.column("bits"):
                acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
        return pa.Table.from_pydict({"bits": pa.array([acc.tobytes()])})

    refs = [r for r in ds.to_arrow_refs()]
    while len(refs) > 1:
        refs = [
            _or.remote(*refs[i: i + fan]) for i in range(0, len(refs), fan)
        ]
    acc = np.zeros(m >> 6, dtype=np.uint64)
    if refs:
        t = ray.get(refs[0])
        for buf in t.column("bits"):
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    return acc
