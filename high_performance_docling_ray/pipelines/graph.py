"""Iterative graph analytics over relational edge sets.

The web-corpus shape this models: a link graph extracted from crawled
pages (url -> href edges) ranked by PageRank to prioritise crawl /
curation. The driver's oracle tables have no url->url edges, so the
hash-verified query runs over the bipartite supplier<->part graph
implied by ``lineitem`` (distinct (l_suppkey, l_partkey) pairs,
symmetrised) — same math, reproducible in SQL.

Scale notes (the part that matters at 10^12 edges):

- The EDGE set is the big side and never leaves its partitions; each
  iteration is one ``map_batches`` over edges + one key-only
  ``groupby(dst).sum`` exchange of (dst, contrib) partials that are
  pre-combined per batch (``np.bincount`` on the batch's local dst
  set), so the shuffle carries at most |distinct dst per block| rows.
- The RANK vector is O(nodes). Under ``rank_broadcast_budget`` rows it
  rides ``ray.put`` as two sorted numpy arrays (one object-store copy,
  zero-copy reads in every map task). Past the budget the rank attach
  flips to the ``cogroup_attach`` tier (the repo-standard union-cogroup
  join by ``src``) — both tiers are pinned equal in
  tests/test_graph.py.
- Symmetrised edges mean every node has out-degree >= 1: no dangling
  mass term, and the groupby(dst) covers every node, so one exchange
  per iteration produces the complete next rank vector.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

DAMPING = 0.85
ITERATIONS = 3


def _edges_dataset(sf_dir: str) -> ray.data.Dataset:
    """Distinct symmetrised edges from lineitem: suppliers at node id
    2*s, parts at 2*p+1. Per-batch distinct combiner before the
    global distinct groupby (the standard partial-agg discipline)."""
    from .io import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )

    def pair_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        src = np.concatenate([2 * s, 2 * p + 1])
        dst = np.concatenate([2 * p + 1, 2 * s])
        # local distinct: most (supp, part) pairs repeat within an order
        key = np.stack([src, dst], axis=1)
        key = np.unique(key, axis=0)
        return pa.Table.from_pydict(
            {
                "src": pa.array(key[:, 0], pa.int64()),
                "dst": pa.array(key[:, 1], pa.int64()),
            }
        )

    # global distinct: bucket the composite key so the exchange keys
    # on ~4*CPU buckets and each group dedups VECTORIZED (a
    # groupby(src,dst).map_groups would make one Python call per
    # distinct edge — 240k calls at sf0.1; this makes P)
    from .joins import default_num_buckets, int_key_buckets

    num_parts = default_num_buckets()

    def add_bucket(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        mixed = s.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F) + d.astype(
            np.uint64
        )
        return batch.append_column(
            "bucket",
            pa.array(int_key_buckets(mixed.view(np.int64), num_parts)),
        )

    def distinct_in_bucket(group: pa.Table) -> pa.Table:
        s = group.column("src").to_numpy(zero_copy_only=False)
        d = group.column("dst").to_numpy(zero_copy_only=False)
        key = np.unique(np.stack([s, d], axis=1), axis=0)
        return pa.Table.from_pydict(
            {
                "src": pa.array(key[:, 0], pa.int64()),
                "dst": pa.array(key[:, 1], pa.int64()),
            }
        )

    return (
        ds.map_batches(pair_rows, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct_in_bucket, batch_format="pyarrow")
    )


def _degree_table(edges: ray.data.Dataset) -> pa.Table:
    """(node, deg) for every node: per-block degree partials combined
    on the DRIVER — no AllToAll; the driver work is O(distinct src per
    block x blocks), the same budget class as the rank vector."""

    def partial(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(src, return_counts=True)
        return pa.Table.from_pydict(
            {
                "src": pa.array(uniq, pa.int64()),
                "count()": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            edges.map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.Table.from_pydict(
            {
                "src": pa.array([], pa.int64()),
                "count()": pa.array([], pa.int64()),
            }
        )
    tbl = pa.concat_tables(parts)
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    cnt = tbl.column("count()").to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(src, return_inverse=True)
    degs = np.bincount(inv, weights=cnt).astype(np.int64)
    return pa.Table.from_pydict(
        {
            "src": pa.array(nodes, pa.int64()),
            "count()": pa.array(degs, pa.int64()),
        }
    )


def pagerank(
    sf_dir: str,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    rank_broadcast_budget: int = 2_000_000,
) -> pa.Table:
    """PageRank after ``iterations`` synchronous sweeps, returned as
    (node, pagerank round6). Node ids: 2*l_suppkey (suppliers),
    2*l_partkey+1 (parts).

    r_{t+1}(v) = (1-d)/N + d * sum_{u->v} r_t(u) / deg(u)
    """
    edges = _edges_dataset(sf_dir).materialize()
    deg_tbl = _degree_table(edges)
    nodes = deg_tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    degs = deg_tbl.column("count()").to_numpy(zero_copy_only=False).astype(np.float64)
    n_nodes = len(nodes)
    if n_nodes == 0:
        return pa.Table.from_pydict(
            {"node": pa.array([], pa.int64()), "pagerank": pa.array([], pa.float64())}
        )

    ranks = np.full(n_nodes, 1.0 / n_nodes, np.float64)
    base = (1.0 - damping) / n_nodes
    use_broadcast = n_nodes <= rank_broadcast_budget

    for _ in range(iterations):
        if use_broadcast:
            new_tbl = _sweep_broadcast(edges, nodes, ranks / degs, base, damping)
        else:
            new_tbl = _sweep_cogroup(edges, nodes, ranks / degs, base, damping)
        # align the fresh (dst, rank) rows back onto the sorted node axis
        order = pc.sort_indices(new_tbl, sort_keys=[("dst", "ascending")])
        new_tbl = new_tbl.take(order)
        got = new_tbl.column("dst").to_numpy(zero_copy_only=False)
        vals = new_tbl.column("rank").to_numpy(zero_copy_only=False)
        ranks = np.full(n_nodes, base, np.float64)
        ranks[np.searchsorted(nodes, got)] = vals

    return pa.Table.from_pydict(
        {
            "node": pa.array(nodes, pa.int64()),
            "pagerank": pa.array(np.round(ranks, 6), pa.float64()),
        }
    )


def _contrib_partial(src, dst, node_arr, share_arr):
    """Per-batch combiner: sum rank-shares into the batch's local dst
    set (np.bincount over the batch-local dst codes)."""
    share = share_arr[np.searchsorted(node_arr, src)]
    uniq, inv = np.unique(dst, return_inverse=True)
    sums = np.bincount(inv, weights=share)
    return pa.Table.from_pydict(
        {
            "dst": pa.array(uniq, pa.int64()),
            "contrib": pa.array(sums, pa.float64()),
        }
    )


def _finish(base: float, damping: float):
    def f(batch: pa.Table) -> pa.Table:
        s = batch.column("sum(contrib)").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "dst": batch.column("dst"),
                "rank": pa.array(base + damping * s, pa.float64()),
            }
        )

    return f


def _collect(ds: ray.data.Dataset) -> pa.Table:
    parts = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.Table.from_pydict(
            {"dst": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
        )
    return pa.concat_tables(parts)


def _sweep_broadcast(edges, nodes, shares, base, damping) -> pa.Table:
    """In-budget sweep: per-block SPARSE register partials (dst,
    contrib) combined on the DRIVER with one searchsorted + np.add.at
    per block — no AllToAll per iteration (the kmeans register
    pattern). Driver work is O(distinct dst per block x blocks),
    bounded by the same rank_broadcast_budget that gates this tier;
    past it, ``_sweep_cogroup`` keeps the keyed groupby."""
    nodes_ref = ray.put(nodes)
    shares_ref = ray.put(shares)

    def partial(batch: pa.Table) -> pa.Table:
        node_arr = ray.get(nodes_ref)
        share_arr = ray.get(shares_ref)
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        return _contrib_partial(src, dst, node_arr, share_arr)

    parts = [
        t
        for t in ray.get(
            edges.map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    sums = np.zeros(len(nodes), np.float64)
    for t in parts:
        d = t.column("dst").to_numpy(zero_copy_only=False)
        c = t.column("contrib").to_numpy(zero_copy_only=False)
        np.add.at(sums, np.searchsorted(nodes, d), c)
    return pa.Table.from_pydict(
        {
            "dst": pa.array(nodes, pa.int64()),
            "rank": pa.array(base + damping * sums, pa.float64()),
        }
    )


def _sweep_cogroup(edges, nodes, shares, base, damping) -> pa.Table:
    """Over-budget tier: rank shares ride the union-cogroup join by
    ``src`` instead of a driver broadcast — O(nodes) never pins the
    driver; only (node, share) float rows join the edge partitions."""
    from .joins import cogroup_attach

    share_ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "src": pa.array(nodes, pa.int64()),
                "share": pa.array(shares, pa.float64()),
            }
        )
    )
    attached = cogroup_attach(
        edges,
        share_ds,
        "src",
        left_fields=[pa.field("src", pa.int64()), pa.field("dst", pa.int64())],
        payload_fields=[pa.field("share", pa.float64())],
    )

    def partial(batch: pa.Table) -> pa.Table:
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        share = pc.fill_null(batch.column("share"), 0.0).to_numpy(
            zero_copy_only=False
        )
        uniq, inv = np.unique(dst, return_inverse=True)
        sums = np.bincount(inv, weights=share)
        return pa.Table.from_pydict(
            {
                "dst": pa.array(uniq, pa.int64()),
                "contrib": pa.array(sums, pa.float64()),
            }
        )

    summed = (
        attached.map_batches(partial, batch_format="pyarrow")
        .groupby("dst")
        .sum("contrib")
        .map_batches(_finish(base, damping), batch_format="pyarrow")
    )
    return _collect(summed)


def degree_stats(sf_dir: str) -> pa.Table:
    """Degree distribution of the symmetrised bipartite graph:
    (deg, n_nodes) — the skew report a partitioner reads before
    choosing a salt factor for hot keys."""
    edges = _edges_dataset(sf_dir)
    deg = edges.groupby("src").count()

    def hist_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("count()").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.Table.from_pydict(
            {
                "deg": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    out = (
        deg.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("deg")
        .sum("n")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "deg": batch.column("deg"),
                "n_nodes": pc.cast(batch.column("sum(n)"), pa.int64()),
            }
        )

    return out.map_batches(rename, batch_format="pyarrow")
