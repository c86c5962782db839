"""Distributed table profiling — the ANALYZE-TABLE step a 100 TB
curation run fires before planning (skew checks, dictionary-encoding
decisions, partition-key selection).

One row per profiled column: row count, null count, EXACT distinct
count, min/max (computed on the NATIVE type, then stringified — the
same rule as SQL ``CAST(min(col) AS VARCHAR)``), and the mean rendered
length of non-null values.

Shape at scale:
  - counts / null counts / min / max / length sums are per-batch
    PARTIALS (one tiny row per column per block) combined on the
    driver — bounded by #columns x #blocks, never by data size.
  - distinct counts exchange ONLY (col, hash64(value)) key rows,
    pre-deduplicated per block, bucketed by ``hash % P`` so no single
    group ever holds a whole column's distinct set (the hot-key shape
    a plain ``groupby(col)`` would create on a high-cardinality
    column). hash64 is the md5-derived 64-bit key the dedup family
    already treats as collision-free (kernels/sketch.py:hash64).

The reference has no corpus-level profiling (SURVEY.md §2.5: its only
aggregations are in-page); this operator comes from the north-rule's
training-data-pipeline mandate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..kernels.sketch import hash64_strings
from .joins import default_num_buckets, int_key_buckets


def _as_strings(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Render a column as strings the way DuckDB ``CAST(x AS
    VARCHAR)`` does (identity for strings, decimal repr for ints)."""
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return col
    return pc.cast(col, pa.string())


def _partial_stats(columns: list[str]):
    """Per-batch combiner: one stats row per column per block."""

    def f(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "col_name": [],
            "n": [],
            "n_null": [],
            "min_str": [],
            "max_str": [],
            "sum_len": [],
        }
        for name in columns:
            col = batch.column(name)
            n = len(col)
            n_null = col.null_count
            if n - n_null > 0:
                mm = pc.min_max(col).as_py()
                rendered = _as_strings(col)
                sum_len = pc.sum(pc.utf8_length(rendered)).as_py() or 0
                lo, hi = mm["min"], mm["max"]
                min_s, max_s = str(lo), str(hi)
            else:
                min_s = max_s = None
                sum_len = 0
            out["col_name"].append(name)
            out["n"].append(n)
            out["n_null"].append(n_null)
            out["min_str"].append(min_s)
            out["max_str"].append(max_s)
            out["sum_len"].append(int(sum_len))
        return pa.Table.from_pydict(
            {
                "col_name": pa.array(out["col_name"], pa.string()),
                "n": pa.array(out["n"], pa.int64()),
                "n_null": pa.array(out["n_null"], pa.int64()),
                "min_str": pa.array(out["min_str"], pa.string()),
                "max_str": pa.array(out["max_str"], pa.string()),
                "sum_len": pa.array(out["sum_len"], pa.int64()),
            }
        )

    return f


def _distinct_key_rows(columns: list[str], num_parts: int):
    """Per-batch: block-distinct (col_idx, h, bucket) key rows, nulls
    excluded (SQL ``count(DISTINCT col)`` ignores nulls)."""

    def f(batch: pa.Table) -> pa.Table:
        cols: list[np.ndarray] = []
        hs: list[np.ndarray] = []
        for idx, name in enumerate(columns):
            col = batch.column(name)
            valid = col.combine_chunks().drop_null()
            if len(valid) == 0:
                continue
            h = hash64_strings(_as_strings(pa.chunked_array([valid])))
            h = np.unique(h.astype(np.int64))
            cols.append(np.full(len(h), idx, np.int32))
            hs.append(h)
        if not cols:
            return pa.Table.from_pydict(
                {
                    "col_idx": pa.array([], pa.int32()),
                    "h": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        col_arr = np.concatenate(cols)
        h_arr = np.concatenate(hs)
        return pa.Table.from_pydict(
            {
                "col_idx": pa.array(col_arr, pa.int32()),
                "h": pa.array(h_arr, pa.int64()),
                "bucket": pa.array(
                    int_key_buckets(h_arr, num_parts), pa.int32()
                ),
            }
        )

    return f


def column_profile(
    sf_dir: str,
    table: str = "documents",
    columns: tuple[str, ...] = ("doc_id", "text", "lang", "source", "n_chars"),
) -> pa.Table:
    """Profile ``columns`` of ``{sf_dir}/{table}.parquet``.

    Returns (col_name, n_rows, n_null, n_distinct, min_str, max_str,
    avg_len) sorted by col_name; avg_len is the mean rendered length
    of NON-NULL values rounded to 6 (SQL ``avg(length(CAST(col AS
    VARCHAR)))``).
    """
    import pyarrow.parquet as pq

    from .io import read_parquet_clean

    cols = list(columns)
    path = f"{sf_dir}/{table}.parquet"
    schema = pq.ParquetFile(path).schema_arrow
    numeric_cols = {
        f.name
        for f in schema
        if pa.types.is_integer(f.type) or pa.types.is_floating(f.type)
    }
    ds = read_parquet_clean(path, columns=cols)

    # pass 1: tiny per-block partials, combined on the driver
    partials = pa.concat_tables(
        t
        for t in ray.get(
            ds.map_batches(_partial_stats(cols), batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    )

    # pass 2: exact distinct via block-distinct key rows + bucketed
    # groupby (key-only exchange)
    num_parts = default_num_buckets()
    keys = ds.map_batches(
        _distinct_key_rows(cols, num_parts), batch_format="pyarrow"
    )

    def bucket_counts(group: pa.Table) -> pa.Table:
        # one (bucket, col_idx) group at a time: distinct = unique h
        h = group.column("h").to_numpy(zero_copy_only=False)
        ci = group.column("col_idx")[0].as_py()
        return pa.Table.from_pydict(
            {
                "col_idx": pa.array([ci], pa.int32()),
                "nd": pa.array([len(np.unique(h))], pa.int64()),
            }
        )

    nd_rows = (
        keys.groupby(["bucket", "col_idx"])
        .map_groups(bucket_counts, batch_format="pyarrow")
        .take_all()
    )
    n_distinct = {c: 0 for c in cols}
    for r in nd_rows:
        n_distinct[cols[r["col_idx"]]] += int(r["nd"])

    # driver combine of pass-1 partials
    pdf = partials.to_pandas()
    out = {
        "col_name": [],
        "n_rows": [],
        "n_null": [],
        "n_distinct": [],
        "min_str": [],
        "max_str": [],
        "avg_len": [],
    }
    for name in sorted(cols):
        g = pdf[pdf["col_name"] == name]
        n = int(g["n"].sum())
        n_null = int(g["n_null"].sum())
        mins = g["min_str"].dropna()
        maxs = g["max_str"].dropna()
        # numeric partials must combine numerically, not lexically
        numeric = name in numeric_cols
        if len(mins):
            if numeric:
                # compare numerically, keep the partial's native
                # rendering (no float round-trip of the string)
                min_s = min(mins, key=float)
                max_s = max(maxs, key=float)
            else:
                min_s = min(mins)
                max_s = max(maxs)
        else:
            min_s = max_s = None
        n_valid = n - n_null
        avg_len = (
            round(float(g["sum_len"].sum()) / n_valid, 6) if n_valid else None
        )
        out["col_name"].append(name)
        out["n_rows"].append(n)
        out["n_null"].append(n_null)
        out["n_distinct"].append(n_distinct[name])
        out["min_str"].append(min_s)
        out["max_str"].append(max_s)
        out["avg_len"].append(avg_len)
    return pa.Table.from_pydict(
        {
            "col_name": pa.array(out["col_name"], pa.string()),
            "n_rows": pa.array(out["n_rows"], pa.int64()),
            "n_null": pa.array(out["n_null"], pa.int64()),
            "n_distinct": pa.array(out["n_distinct"], pa.int64()),
            "min_str": pa.array(out["min_str"], pa.string()),
            "max_str": pa.array(out["max_str"], pa.string()),
            "avg_len": pa.array(out["avg_len"], pa.float64()),
        }
    )


# -- Merkle dataset fingerprint ------------------------------------------------

def dataset_fingerprint(
    sf_dir: str, num_shards: int = 16
) -> pa.Table:
    """Merkle-style dataset fingerprint — the versioning primitive an
    incremental 100 TB pipeline diffs two runs with: per-shard content
    hashes roll up to one root, so two datasets compare root-first and
    only mismatching shards are re-examined (the same reason
    incremental_extract keys its snapshot store by page hash).

    Leaf = ``md5`` of the shard's per-doc ``md5(text)`` digests
    concatenated in doc_id order; root = ``md5`` of the leaf digests
    in shard order. Only (shard, doc_id, md5) KEY rows ever move —
    one bounded groupby(shard), root on the driver over ``num_shards``
    rows.

    Returns ``num_shards`` leaf rows + one root row (shard = -1).
    """
    import hashlib as _hashlib

    from ..kernels.text_stats import batch_md5
    from .io import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def key_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        hs = batch_md5(batch.column("text").to_pylist())
        return pa.Table.from_pydict(
            {
                "shard": pa.array(
                    (ids % num_shards).astype(np.int64), pa.int64()
                ),
                "doc_id": batch.column("doc_id"),
                "h": pa.array(hs, pa.string()),
            }
        )

    def leaf(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        hs = group.column("h").to_pylist()
        order = np.argsort(ids, kind="stable")
        digest = _hashlib.md5(
            "".join(hs[i] for i in order).encode()
        ).hexdigest()
        return pa.Table.from_pydict(
            {
                "shard": pa.array(
                    [int(group.column("shard")[0].as_py())], pa.int64()
                ),
                "node_md5": pa.array([digest], pa.string()),
                "n_docs": pa.array([group.num_rows], pa.int64()),
            }
        )

    leaves = (
        ds.map_batches(key_rows, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(leaf, batch_format="pyarrow")
        .take_all()
    )
    leaves.sort(key=lambda r: r["shard"])
    root = _hashlib.md5(
        "".join(r["node_md5"] for r in leaves).encode()
    ).hexdigest()
    return pa.Table.from_pydict(
        {
            "shard": pa.array(
                [r["shard"] for r in leaves] + [-1], pa.int64()
            ),
            "node_md5": pa.array(
                [r["node_md5"] for r in leaves] + [root], pa.string()
            ),
            "n_docs": pa.array(
                [r["n_docs"] for r in leaves]
                + [sum(r["n_docs"] for r in leaves)],
                pa.int64(),
            ),
        }
    )


# -- partition-skew report -------------------------------------------------------

SKEW_BUCKETS = 64


def partition_skew_report(
    sf_dir: str,
    keys: tuple[str, ...] = ("doc_id", "lang", "source"),
    num_buckets: int = SKEW_BUCKETS,
) -> pa.Table:
    """Would-be shuffle balance per CANDIDATE partition key — the
    planning statistic behind "pick ONE partitioning key and reuse it"
    (a key whose hash buckets are 10x imbalanced makes every groupby
    on it a straggler). Buckets use the repo's md5 hash64 (== DuckDB
    ``md5_number_upper``), so the report is the actual placement the
    engine's bucketed exchanges would produce.

    Per key: fixed ``num_buckets`` bincount partials per block, driver
    combine (bounded by keys x buckets x blocks) — a pure map, no
    exchange at all.

    Output per key: (part_key, n_buckets_used, max_rows, avg_rows,
    skew_ratio = max / (n / num_buckets), rounded 6).
    """
    from ..kernels.sketch import hash64_strings
    from .io import read_parquet_clean

    cols = list(keys)
    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=cols)

    def partial(batch: pa.Table) -> pa.Table:
        names, vecs = [], []
        for name in cols:
            col = _as_strings(batch.column(name).combine_chunks())
            h = hash64_strings(col)
            b = (h % np.uint64(num_buckets)).astype(np.int64)
            names.append(name)
            vecs.append(np.bincount(b, minlength=num_buckets))
        return pa.Table.from_pydict(
            {
                "part_key": pa.array(names, pa.string()),
                "counts": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.int64())
                ),
            }
        )

    parts = [
        t
        for t in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if t.num_rows
    ]
    acc = {k: np.zeros(num_buckets, np.int64) for k in cols}
    for t in parts:
        ks = t.column("part_key").to_pylist()
        cl = t.column("counts").combine_chunks()
        flat = cl.flatten().to_numpy(zero_copy_only=False)
        mat = flat.reshape(len(ks), num_buckets)
        for i, k in enumerate(ks):
            acc[k] += mat[i]
    out = {
        "part_key": [],
        "n_buckets_used": [],
        "max_rows": [],
        "avg_rows": [],
        "skew_ratio": [],
    }
    for k in cols:
        counts = acc[k]
        n = int(counts.sum())
        avg = n / num_buckets
        out["part_key"].append(k)
        out["n_buckets_used"].append(int((counts > 0).sum()))
        out["max_rows"].append(int(counts.max()))
        out["avg_rows"].append(round(avg, 6))
        out["skew_ratio"].append(
            round(float(counts.max()) / avg, 6) if n else 0.0
        )
    return pa.Table.from_pydict(
        {
            "part_key": pa.array(out["part_key"], pa.string()),
            "n_buckets_used": pa.array(out["n_buckets_used"], pa.int64()),
            "max_rows": pa.array(out["max_rows"], pa.int64()),
            "avg_rows": pa.array(out["avg_rows"], pa.float64()),
            "skew_ratio": pa.array(out["skew_ratio"], pa.float64()),
        }
    )


# -- Z-order layout planning ---------------------------------------------------

ZORDER_BITS = 8          # quantization bits per dimension
ZORDER_PART_SHIFT = 10   # z >> shift = partition (64 parts at 8 bits)


def _interleave_bits(xq: np.ndarray, yq: np.ndarray, bits: int) -> np.ndarray:
    """Morton / Z-order interleave: bit j of xq lands at 2j, of yq at
    2j+1 — the same closed form the oracle SQL spells out term by
    term, so both sides compute identical z values."""
    z = np.zeros(len(xq), np.int64)
    for j in range(bits):
        z |= ((xq >> j) & 1) << (2 * j)
        z |= ((yq >> j) & 1) << (2 * j + 1)
    return z


def zorder_layout(
    sf_dir: str,
    bits: int = ZORDER_BITS,
    part_shift: int = ZORDER_PART_SHIFT,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """Z-ORDER (Morton-curve) layout plan over events(user_id, value)
    — the multi-dimensional data-clustering statistic behind
    Delta/Iceberg ``OPTIMIZE ZORDER BY``: quantize both columns to
    ``bits``-bit range buckets, interleave to a Morton key, and report
    per-partition (z >> part_shift) row counts and min/max envelopes
    of BOTH source columns. Tight per-partition envelopes are exactly
    what lets a 100-TB scan prune row groups on EITHER predicate
    column after re-clustering; at deployment the layout itself is
    one ``write_parquet(partition_cols=["zpart"])`` over the stamped
    rows — this query ships the planning report the rewrite is judged
    by.

    Exactness: quantization is integer floor division over the
    occupied [min, max] band (one min/max pre-pass, the range-scaling
    discipline of the ntile/Mann-Whitney family), the interleave is
    pure bit algebra, and every reported stat is an int64 MIN/MAX/SUM
    — nothing floats. Headroom: (x − min_x) · 2^bits must stay below
    2^63 (range < 2^55 at 8 bits) — far past any id/cents domain.

    Tiers: per-batch (zpart, n, min/max) partials (bounded by 2^(2·
    bits − part_shift) rows per block) close with ONE mixed-agg
    driver ``group_by`` under ``combine_limit``; past it (forced by
    the ``_grouped`` entry) a Ray ``groupby(zpart).aggregate(Sum,
    Min, Min, Max, Max)`` runs at any cardinality.
    """
    from .relational import _cents, _read

    ds = _read(sf_dir, "events", ["user_id", "value"])

    # pass 1: global min/max of both axes (4 scalars per block)
    def mm_partial(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.Table.from_pydict(
                {k: pa.array([], pa.int64())
                 for k in ("minx", "maxx", "miny", "maxy")}
            )
        x = batch.column("user_id").to_numpy(zero_copy_only=False)
        y = _cents(batch.column("value"))
        return pa.Table.from_pydict(
            {
                "minx": pa.array([int(x.min())], pa.int64()),
                "maxx": pa.array([int(x.max())], pa.int64()),
                "miny": pa.array([int(y.min())], pa.int64()),
                "maxy": pa.array([int(y.max())], pa.int64()),
            }
        )

    mm = [
        t
        for t in ray.get(
            ds.map_batches(mm_partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    empty = pa.Table.from_pydict(
        {
            "zpart": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
            "min_user": pa.array([], pa.int64()),
            "max_user": pa.array([], pa.int64()),
            "min_cents": pa.array([], pa.int64()),
            "max_cents": pa.array([], pa.int64()),
        }
    )
    if not mm:
        return empty
    mm_t = pa.concat_tables(mm)
    minx = int(pc.min(mm_t.column("minx")).as_py())
    maxx = int(pc.max(mm_t.column("maxx")).as_py())
    miny = int(pc.min(mm_t.column("miny")).as_py())
    maxy = int(pc.max(mm_t.column("maxy")).as_py())
    nb = 1 << bits

    def z_partial(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return empty.rename_columns(
                ["zpart", "n", "mnx", "mxx", "mny", "mxy"]
            )
        x = batch.column("user_id").to_numpy(zero_copy_only=False)
        y = _cents(batch.column("value"))
        xq = (x - minx) * nb // (maxx - minx + 1)
        yq = (y - miny) * nb // (maxy - miny + 1)
        zpart = _interleave_bits(xq, yq, bits) >> part_shift
        order = np.argsort(zpart, kind="stable")
        zs, xs, ys = zpart[order], x[order], y[order]
        starts = np.flatnonzero(
            np.concatenate([[True], zs[1:] != zs[:-1]])
        )
        ends = np.concatenate([starts[1:], [len(zs)]])
        return pa.Table.from_pydict(
            {
                "zpart": pa.array(zs[starts], pa.int64()),
                "n": pa.array(ends - starts, pa.int64()),
                "mnx": pa.array(
                    np.minimum.reduceat(xs, starts), pa.int64()
                ),
                "mxx": pa.array(
                    np.maximum.reduceat(xs, starts), pa.int64()
                ),
                "mny": pa.array(
                    np.minimum.reduceat(ys, starts), pa.int64()
                ),
                "mxy": pa.array(
                    np.maximum.reduceat(ys, starts), pa.int64()
                ),
            }
        )

    partials = ds.map_batches(
        z_partial, batch_format="pyarrow"
    ).materialize()

    out_names = [
        "zpart", "n_rows", "min_user", "max_user", "min_cents",
        "max_cents",
    ]
    refs = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    if refs and sum(t.num_rows for t in refs) <= combine_limit:
        tbl = pa.concat_tables(refs)
        agg = tbl.group_by(["zpart"]).aggregate(
            [("n", "sum"), ("mnx", "min"), ("mxx", "max"),
             ("mny", "min"), ("mxy", "max")]
        )
        # pyarrow names "<col>_<agg>", keys first
        agg = agg.rename_columns(
            ["zpart", "n_rows", "min_user", "max_user", "min_cents",
             "max_cents"]
        )
        return agg.sort_by([("zpart", "ascending")])
    if not refs:
        return empty

    from ray.data.aggregate import Max, Min, Sum

    grouped = partials.groupby("zpart").aggregate(
        Sum("n"), Min("mnx"), Max("mxx"), Min("mny"), Max("mxy")
    )
    rows = [t for t in ray.get(grouped.to_arrow_refs()) if t.num_rows]
    if not rows:
        return empty
    return (
        pa.concat_tables(rows)
        .rename_columns(out_names)
        .sort_by([("zpart", "ascending")])
    )


# -- Benford first-digit audit -------------------------------------------------

_BF_EMPTY = pa.Table.from_pydict(
    {
        "digit": pa.array([], pa.int64()),
        "n_orders": pa.array([], pa.int64()),
        "observed_p": pa.array([], pa.float64()),
        "benford_p": pa.array([], pa.float64()),
    }
)


def benford_digits(
    sf_dir: str, combine_limit: int = 2_000_000
) -> pa.Table:
    """Benford first-significant-digit audit over ``o_totalprice`` —
    the fraud/synthetic-data smell test a corpus-ingest QA pass runs
    on every money-like column (natural multiplicative data follows
    P(d) = log10(1 + 1/d); fabricated or truncated feeds don't).

    Exactness: prices become exact int64 cents (the house `_cents`
    fixed-point, identical to the oracle's ``round(x·100)`` on
    2-decimal data); the leading digit falls out of a vectorized
    divide-by-10 loop (≤ 12 iterations, no string round-trip); zero
    cents drop on both sides. The exchange is ≤ 9 count rows per
    block, merged under the standard combine budget with the Ray
    groupby fallback; ``benford_digits_grouped`` forces that tier.
    """
    from .relational import _cents, _combine_partials, _read

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def digit_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("o_totalprice"))
        cents = cents[cents > 0]
        d = cents.copy()
        while (d >= 10).any():
            big = d >= 10
            d[big] //= 10
        cnt = np.bincount(d, minlength=10)[1:10]
        nz = np.nonzero(cnt)[0]
        return pa.Table.from_pydict(
            {
                "digit": pa.array((nz + 1).astype(np.int64), pa.int64()),
                "f": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    partials = ds.map_batches(
        digit_partial, batch_format="pyarrow"
    ).materialize()
    cells = _combine_partials(partials, ["digit"], ["f"], combine_limit)
    if cells is None:
        rows = [
            t
            for t in ray.get(
                partials.groupby("digit").sum("f").to_arrow_refs()
            )
            if t.num_rows
        ]
        cells = pa.concat_tables(rows).rename_columns(["digit", "sum(f)"])
    if not cells.num_rows:
        return _BF_EMPTY
    dig = cells.column("digit").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    f = cells.column("sum(f)").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    order = np.argsort(dig, kind="stable")
    dig, f = dig[order], f[order]
    total = float(f.sum())
    return pa.Table.from_pydict(
        {
            "digit": pa.array(dig, pa.int64()),
            "n_orders": pa.array(f, pa.int64()),
            "observed_p": pa.array(f / total, pa.float64()),
            "benford_p": pa.array(
                np.log10(1.0 + 1.0 / dig.astype(np.float64)), pa.float64()
            ),
        }
    )
