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

import math

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


# -- triangle counting ---------------------------------------------------------

TRI_MOD = 40


def _tri_edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct UNDIRECTED edges (u < v) of the mod-contracted
    supplier/part graph: u = l_suppkey % 40, v = l_partkey % 40,
    self-loops dropped. Suppliers and parts share the 0..39 id space
    ON PURPOSE: the contraction creates odd cycles, so the graph
    actually contains triangles (the raw bipartite graph has none)."""
    from .io import read_parquet_clean
    from .joins import default_num_buckets, int_key_buckets

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )

    def pair_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False) % TRI_MOD
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False) % TRI_MOD
        u = np.minimum(s, p)
        v = np.maximum(s, p)
        keep = u != v
        key = np.unique(np.stack([u[keep], v[keep]], axis=1), axis=0)
        return pa.Table.from_pydict(
            {
                "u": pa.array(key[:, 0], pa.int64()),
                "v": pa.array(key[:, 1], pa.int64()),
            }
        )

    num_parts = default_num_buckets()

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        mixed = u.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F) + v.astype(
            np.uint64
        )
        return batch.append_column(
            "bucket",
            pa.array(int_key_buckets(mixed.view(np.int64), num_parts)),
        )

    def distinct_in_bucket(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        key = np.unique(np.stack([u, v], axis=1), axis=0)
        return pa.Table.from_pydict(
            {
                "u": pa.array(key[:, 0], pa.int64()),
                "v": pa.array(key[:, 1], pa.int64()),
            }
        )

    return (
        ds.map_batches(pair_rows, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct_in_bucket, batch_format="pyarrow")
    )


def _orient(u, v, deg):
    """Degree-ordered orientation: every edge points from its
    (deg, id)-smaller endpoint to the larger. The resulting DAG has
    out-degrees O(sqrt(2m)), which bounds wedge generation — the
    classic compact-forward guarantee."""
    du, dv = deg[u], deg[v]
    u_first = (du < dv) | ((du == dv) & (u < v))
    a = np.where(u_first, u, v)
    b = np.where(u_first, v, u)
    return a, b


def triangle_count(
    sf_dir: str, adj_broadcast_budget: int = 50_000_000
) -> pa.Table:
    """Exact triangle count — the graph-quality statistic crawl
    analyses use for community density (and the canonical "hard"
    all-to-all of graph analytics).

    Orientation by (degree, id) gives each edge a canonical direction;
    a triangle is counted exactly once, at its minimal vertex.

    - IN-BUDGET (edge count under ``adj_broadcast_budget``): the
      oriented adjacency rides ``ray.put`` as CSR arrays; one
      map_batches over oriented-edge blocks intersects sorted
      out-neighbor lists (vectorized searchsorted membership) — zero
      further exchange.
    - DISTRIBUTED (forced by budget=0 in tests): wedge rows
      (w1, w2) are emitted per source from its sorted out-neighbors
      (bounded by the orientation), unioned with edge rows, bucketed
      by the pair key, and closed with one vectorized membership scan
      per bucket — all key-only exchanges; degrees attach to edges by
      TWO ``cogroup_attach`` joins instead of a broadcast.

    Returns one row: (n_nodes, n_edges, n_triangles).
    """
    edges = _tri_edges(sf_dir).materialize()
    deg_tbl = _tri_degree(edges)
    nodes = deg_tbl.column("node").to_numpy(zero_copy_only=False)
    degs = deg_tbl.column("deg").to_numpy(zero_copy_only=False)
    n_nodes = len(nodes)
    n_edges = edges.count()

    if n_edges <= adj_broadcast_budget:
        # dense node-id space: deg lookup by position
        deg_lut = np.zeros(int(nodes.max()) + 1 if n_nodes else 1, np.int64)
        deg_lut[nodes] = degs
        # build oriented CSR on the driver (edge list is in budget)
        parts = [
            t for t in ray.get(edges.to_arrow_refs()) if t.num_rows
        ]
        et = pa.concat_tables(parts)
        u = et.column("u").to_numpy(zero_copy_only=False)
        v = et.column("v").to_numpy(zero_copy_only=False)
        a, b = _orient(u, v, deg_lut)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.searchsorted(a, np.arange(len(deg_lut)))
        ends = np.searchsorted(a, np.arange(len(deg_lut)) + 1)
        dag_keys = np.sort(a * np.int64(1 << 32) + b)
        csr_ref = ray.put((starts, ends, b, dag_keys, deg_lut))

        def tri_block(batch: pa.Table) -> pa.Table:
            starts_, ends_, nbrs, keys, lut = ray.get(csr_ref)
            ua = batch.column("u").to_numpy(zero_copy_only=False)
            va = batch.column("v").to_numpy(zero_copy_only=False)
            aa, bb = _orient(ua, va, lut)
            # fully vectorized edge-iterator: for every oriented edge
            # (a,b), count a's out-neighbors x with (b,x) in the DAG
            la = ends_[aa] - starts_[aa]
            total_len = int(la.sum())
            if total_len == 0:
                return pa.Table.from_pydict({"t": pa.array([0], pa.int64())})
            base = np.repeat(starts_[aa], la)
            local = np.arange(total_len) - np.repeat(
                np.cumsum(la) - la, la
            )
            nx = nbrs[base + local]
            q = np.repeat(bb, la) * np.int64(1 << 32) + nx
            pos = np.minimum(np.searchsorted(keys, q), len(keys) - 1)
            total = int((keys[pos] == q).sum())
            return pa.Table.from_pydict(
                {"t": pa.array([total], pa.int64())}
            )

        tri_parts = edges.map_batches(
            tri_block, batch_format="pyarrow"
        ).take_all()
        n_tri = sum(r["t"] for r in tri_parts)
    else:
        n_tri = _triangles_distributed(edges, deg_tbl)

    return pa.Table.from_pydict(
        {
            "n_nodes": pa.array([n_nodes], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_triangles": pa.array([int(n_tri)], pa.int64()),
        }
    )


def _tri_degree(edges: ray.data.Dataset) -> pa.Table:
    """Undirected degree per node: per-batch bincount partials,
    driver combine (O(nodes) rows)."""
    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        both = np.concatenate([u, v])
        node, cnt = np.unique(both, return_counts=True)
        return pa.Table.from_pydict(
            {
                "node": pa.array(node, pa.int64()),
                "deg": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        t
        for t in edges.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    tbl = pa.concat_tables(parts)
    node = tbl.column("node").to_numpy(zero_copy_only=False)
    deg = tbl.column("deg").to_numpy(zero_copy_only=False)
    uniq, inv = np.unique(node, return_inverse=True)
    sums = np.zeros(len(uniq), np.int64)
    np.add.at(sums, inv, deg)
    return pa.Table.from_pydict(
        {
            "node": pa.array(uniq, pa.int64()),
            "deg": pa.array(sums, pa.int64()),
        }
    )


def _triangles_distributed(
    edges: ray.data.Dataset, deg_tbl: pa.Table
) -> int:
    """Wedge-and-close without any broadcast: degrees attach via two
    key-only cogroups, wedges generate per source inside a bucketed
    groupby (orientation bounds out-degrees), closure is one more
    bucketed key-only exchange."""
    from .joins import cogroup_attach, default_num_buckets, int_key_buckets

    deg_ds = ray.data.from_arrow(deg_tbl)

    def rename_for(key: str, out: str):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns([key, out])

        return f

    with_du = cogroup_attach(
        edges,
        deg_ds.map_batches(rename_for("u", "du"), batch_format="pyarrow"),
        key="u",
        left_fields=[pa.field("u", pa.int64()), pa.field("v", pa.int64())],
        payload_fields=[pa.field("du", pa.int64())],
    )
    with_both = cogroup_attach(
        with_du,
        deg_ds.map_batches(rename_for("v", "dv"), batch_format="pyarrow"),
        key="v",
        left_fields=[
            pa.field("u", pa.int64()),
            pa.field("v", pa.int64()),
            pa.field("du", pa.int64()),
        ],
        payload_fields=[pa.field("dv", pa.int64())],
    )

    num_parts = default_num_buckets()

    def oriented(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        du = pc.fill_null(batch.column("du"), 0).to_numpy(
            zero_copy_only=False
        )
        dv = pc.fill_null(batch.column("dv"), 0).to_numpy(
            zero_copy_only=False
        )
        u_first = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_first, u, v)
        b = np.where(u_first, v, u)
        return pa.Table.from_pydict(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "bucket": pa.array(
                    int_key_buckets(a, num_parts), pa.int32()
                ),
            }
        )

    dag = with_both.map_batches(oriented, batch_format="pyarrow")

    def wedges(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        # neighbor pairs per source: runs of equal a
        starts = np.flatnonzero(
            np.concatenate([[True], a[1:] != a[:-1]])
        )
        ends = np.concatenate([starts[1:], [len(a)]])
        w1, w2 = [], []
        for s, e in zip(starts, ends):
            nb = b[s:e]
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            w1.append(nb[i])
            w2.append(nb[j])
        if not w1:
            return pa.Table.from_pydict(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "is_edge": pa.array([], pa.int8()),
                }
            )
        x = np.concatenate(w1)
        y = np.concatenate(w2)
        # canonical pair key: plain (min, max) — the closing edge is
        # stored undirected, so id order is the shared convention
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        return pa.Table.from_pydict(
            {
                "a": pa.array(lo, pa.int64()),
                "b": pa.array(hi, pa.int64()),
                "is_edge": pa.array(
                    np.zeros(len(lo), np.int8), pa.int8()
                ),
            }
        )

    wedge_rows = dag.groupby("bucket").map_groups(
        lambda g: wedges(g.drop_columns(["bucket"])),
        batch_format="pyarrow",
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "a": batch.column("u"),
                "b": batch.column("v"),
                "is_edge": pa.array(
                    np.ones(batch.num_rows, np.int8), pa.int8()
                ),
            }
        )

    tagged = wedge_rows.union(
        edges.map_batches(edge_rows, batch_format="pyarrow")
    )

    def close_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket",
            pa.array(
                int_key_buckets(
                    (
                        a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                        + b.astype(np.uint64)
                    ).view(np.int64),
                    num_parts,
                ),
                pa.int32(),
            ),
        )

    def count_closed(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        tag = group.column("is_edge").to_numpy(zero_copy_only=False)
        key = a.astype(np.int64) * np.int64(1 << 32) + b
        ek = np.unique(key[tag == 1])
        wk = key[tag == 0]
        if len(ek) == 0 or len(wk) == 0:
            n = 0
        else:
            pos = np.minimum(np.searchsorted(ek, wk), len(ek) - 1)
            n = int((ek[pos] == wk).sum())
        return pa.Table.from_pydict({"t": pa.array([n], pa.int64())})

    parts = (
        tagged.map_batches(close_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: count_closed(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
        .take_all()
    )
    return sum(r["t"] for r in parts)


def clustering_coefficient(
    sf_dir: str, adj_broadcast_budget: int = 50_000_000
) -> pa.Table:
    """Per-node LOCAL clustering coefficient — triangles_at(v) /
    C(deg(v), 2) — the community-density profile crawl analyses read
    next to the global ``triangle_count`` (Watts-Strogatz 1998's local
    metric; a spam-farm clique scores ~1, a hub ~0).

    Same compact-forward machinery as ``triangle_count`` with the
    count ATTRIBUTED to all three corners of every found triangle
    (integer bincounts — exact by construction):

    - IN-BUDGET: oriented CSR rides ``ray.put``; each edge block's
      matched wedges emit (corner, 1) bincount partials — O(distinct
      nodes per block) rows, driver-combined (the per-node output is
      the query's contract anyway).
    - DISTRIBUTED (forced by budget=0): the wedge rows additionally
      CARRY their apex through the closure exchange; a closed wedge
      credits apex + both endpoints, per-bucket (node, t) partials
      close with one ``groupby(node).sum``. Degrees attach by the
      same two ``cogroup_attach`` joins.

    coeff = 2·t / (deg·(deg−1)) closes in the oracle's float op order;
    deg < 2 → NULL (no pair to close).
    """
    edges = _tri_edges(sf_dir).materialize()
    deg_tbl = _tri_degree(edges)
    nodes = deg_tbl.column("node").to_numpy(zero_copy_only=False)
    degs = deg_tbl.column("deg").to_numpy(zero_copy_only=False)
    n_edges = edges.count()

    if n_edges <= adj_broadcast_budget:
        deg_lut = np.zeros(int(nodes.max()) + 1 if len(nodes) else 1,
                           np.int64)
        deg_lut[nodes] = degs
        parts = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
        et = pa.concat_tables(parts)
        u = et.column("u").to_numpy(zero_copy_only=False)
        v = et.column("v").to_numpy(zero_copy_only=False)
        a, b = _orient(u, v, deg_lut)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.searchsorted(a, np.arange(len(deg_lut)))
        ends = np.searchsorted(a, np.arange(len(deg_lut)) + 1)
        dag_keys = np.sort(a * np.int64(1 << 32) + b)
        csr_ref = ray.put((starts, ends, b, dag_keys, deg_lut))

        def tri_corners(batch: pa.Table) -> pa.Table:
            starts_, ends_, nbrs, keys, lut = ray.get(csr_ref)
            ua = batch.column("u").to_numpy(zero_copy_only=False)
            va = batch.column("v").to_numpy(zero_copy_only=False)
            aa, bb = _orient(ua, va, lut)
            la = ends_[aa] - starts_[aa]
            total_len = int(la.sum())
            empty = pa.Table.from_pydict(
                {"node": pa.array([], pa.int64()),
                 "t": pa.array([], pa.int64())}
            )
            if total_len == 0:
                return empty
            base = np.repeat(starts_[aa], la)
            local = np.arange(total_len) - np.repeat(
                np.cumsum(la) - la, la
            )
            nx = nbrs[base + local]
            q = np.repeat(bb, la) * np.int64(1 << 32) + nx
            pos = np.minimum(np.searchsorted(keys, q), len(keys) - 1)
            hit = keys[pos] == q
            if not hit.any():
                return empty
            corners = np.concatenate(
                [np.repeat(aa, la)[hit], np.repeat(bb, la)[hit], nx[hit]]
            )
            un, cnt = np.unique(corners, return_counts=True)
            return pa.Table.from_pydict(
                {
                    "node": pa.array(un, pa.int64()),
                    "t": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

        tparts = [
            t
            for t in ray.get(
                edges.map_batches(tri_corners, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        tri_n: dict[int, int] = {}
        if tparts:
            tt = pa.concat_tables(tparts)
            nn = tt.column("node").to_numpy(zero_copy_only=False)
            tc = tt.column("t").to_numpy(zero_copy_only=False)
            un, inv = np.unique(nn, return_inverse=True)
            sums = np.zeros(len(un), np.int64)
            np.add.at(sums, inv, tc)
            tri_n = dict(zip(un.tolist(), sums.tolist()))
    else:
        tri_n = _per_node_triangles_distributed(edges, deg_tbl)

    order = np.argsort(nodes, kind="stable")
    nodes_s, degs_s = nodes[order], degs[order]
    tri_arr = np.array(
        [tri_n.get(int(n), 0) for n in nodes_s], dtype=np.int64
    )
    coeff = [
        round(2.0 * float(t) / (float(d) * (d - 1.0)), 6)
        if d >= 2
        else None
        for t, d in zip(tri_arr.tolist(), degs_s.tolist())
    ]
    return pa.Table.from_pydict(
        {
            "node": pa.array(nodes_s, pa.int64()),
            "deg": pa.array(degs_s, pa.int64()),
            "n_triangles": pa.array(tri_arr, pa.int64()),
            "clustering_coeff": pa.array(coeff, pa.float64()),
        }
    )


def degree_assortativity(sf_dir: str) -> pa.Table:
    """Degree assortativity coefficient (Newman 2002) — the Pearson
    correlation of endpoint degrees over every edge, counted in BOTH
    directions (the standard undirected convention). Web graphs are
    famously DISassortative (hubs link to leaves); this one scalar is
    the crawl-analysis summary of that structure.

    Exact-integer composition: degrees attach to edges via the driver
    deg table (O(nodes), the ``_tri_degree`` product) broadcast as a
    sorted-key lookup; each edge block reduces to five int64 moment
    partials (Σx, Σy, Σxy, Σx², Σy² over both orientations — y sums
    equal x sums by symmetry but are carried explicitly so the oracle
    expression mirrors term for term), plus the pair count. The
    Pearson close (n·Σxy − Σx·Σy) / sqrt((n·Σx²−Σx²)·(n·Σy²−Σy²))
    runs in float64 with the oracle's op order. Headroom: Σx² over 2m
    edge-ends needs m·d_max² < 2^63 — documented bound (object-int
    escape past it, never hit by a real degree sequence below ~10^9
    max-degree-squared edges).
    """
    edges = _tri_edges(sf_dir).materialize()
    deg_tbl = _tri_degree(edges)
    nodes = deg_tbl.column("node").to_numpy(zero_copy_only=False)
    degs = deg_tbl.column("deg").to_numpy(zero_copy_only=False)
    deg_ref = ray.put((np.sort(nodes), degs[np.argsort(nodes,
                                                       kind="stable")]))

    def moment_partial(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(deg_ref)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        du = vals[np.searchsorted(keys, u)]
        dv = vals[np.searchsorted(keys, v)]
        # both orientations: x over (du,dv) then (dv,du)
        sx = int(du.sum() + dv.sum())
        sxy = 2 * int((du * dv).sum())
        sxx = int((du * du).sum() + (dv * dv).sum())
        return pa.Table.from_pydict(
            {
                "n": pa.array([2 * batch.num_rows], pa.int64()),
                "sx": pa.array([sx], pa.int64()),
                "sy": pa.array([sx], pa.int64()),
                "sxy": pa.array([sxy], pa.int64()),
                "sxx": pa.array([sxx], pa.int64()),
                "syy": pa.array([sxx], pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            edges.map_batches(moment_partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.Table.from_pydict(
            {
                "n_edge_ends": pa.array([0], pa.int64()),
                "assortativity": pa.array([None], pa.float64()),
            }
        )
    tt = pa.concat_tables(parts)
    n = int(pc.sum(tt.column("n")).as_py())
    sx = int(pc.sum(tt.column("sx")).as_py())
    sy = int(pc.sum(tt.column("sy")).as_py())
    sxy = int(pc.sum(tt.column("sxy")).as_py())
    sxx = int(pc.sum(tt.column("sxx")).as_py())
    syy = int(pc.sum(tt.column("syy")).as_py())
    num = float(n * sxy - sx * sy)
    denx = float(n * sxx - sx * sx)
    deny = float(n * syy - sy * sy)
    r = None
    if denx > 0 and deny > 0:
        r = round(num / math.sqrt(denx * deny), 6)
    return pa.Table.from_pydict(
        {
            "n_edge_ends": pa.array([n], pa.int64()),
            "assortativity": pa.array([r], pa.float64()),
        }
    )


def _per_node_triangles_distributed(
    edges: ray.data.Dataset, deg_tbl: pa.Table
) -> dict[int, int]:
    """Per-corner triangle counts without any broadcast: the
    ``_triangles_distributed`` wedge-and-close shape, with the apex
    carried through the closure exchange so a closed wedge credits
    all three corners; (node, t) partials close with one
    ``groupby(node).sum``."""
    from .joins import cogroup_attach, default_num_buckets, int_key_buckets

    deg_ds = ray.data.from_arrow(deg_tbl)

    def rename_for(key: str, out: str):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns([key, out])

        return f

    with_du = cogroup_attach(
        edges,
        deg_ds.map_batches(rename_for("u", "du"), batch_format="pyarrow"),
        key="u",
        left_fields=[pa.field("u", pa.int64()), pa.field("v", pa.int64())],
        payload_fields=[pa.field("du", pa.int64())],
    )
    with_both = cogroup_attach(
        with_du,
        deg_ds.map_batches(rename_for("v", "dv"), batch_format="pyarrow"),
        key="v",
        left_fields=[
            pa.field("u", pa.int64()),
            pa.field("v", pa.int64()),
            pa.field("du", pa.int64()),
        ],
        payload_fields=[pa.field("dv", pa.int64())],
    )

    num_parts = default_num_buckets()

    def oriented(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        du = pc.fill_null(batch.column("du"), 0).to_numpy(
            zero_copy_only=False
        )
        dv = pc.fill_null(batch.column("dv"), 0).to_numpy(
            zero_copy_only=False
        )
        u_first = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_first, u, v)
        b = np.where(u_first, v, u)
        return pa.Table.from_pydict(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "bucket": pa.array(
                    int_key_buckets(a, num_parts), pa.int32()
                ),
            }
        )

    dag = with_both.map_batches(oriented, batch_format="pyarrow")

    def wedges_with_apex(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(
            np.concatenate([[True], a[1:] != a[:-1]])
        )
        ends = np.concatenate([starts[1:], [len(a)]])
        w1, w2, apx = [], [], []
        for s, e in zip(starts, ends):
            nb = b[s:e]
            if len(nb) < 2:
                continue
            i, j = np.triu_indices(len(nb), k=1)
            w1.append(nb[i])
            w2.append(nb[j])
            apx.append(np.full(len(i), a[s], np.int64))
        if not w1:
            return pa.Table.from_pydict(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "apex": pa.array([], pa.int64()),
                    "is_edge": pa.array([], pa.int8()),
                }
            )
        x = np.concatenate(w1)
        y = np.concatenate(w2)
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        return pa.Table.from_pydict(
            {
                "a": pa.array(lo, pa.int64()),
                "b": pa.array(hi, pa.int64()),
                "apex": pa.array(np.concatenate(apx), pa.int64()),
                "is_edge": pa.array(
                    np.zeros(len(lo), np.int8), pa.int8()
                ),
            }
        )

    wedge_rows = dag.groupby("bucket").map_groups(
        lambda g: wedges_with_apex(g.drop_columns(["bucket"])),
        batch_format="pyarrow",
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "a": batch.column("u"),
                "b": batch.column("v"),
                "apex": pa.array(
                    np.full(batch.num_rows, -1, np.int64), pa.int64()
                ),
                "is_edge": pa.array(
                    np.ones(batch.num_rows, np.int8), pa.int8()
                ),
            }
        )

    tagged = wedge_rows.union(
        edges.map_batches(edge_rows, batch_format="pyarrow")
    )

    def close_bucket(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket",
            pa.array(
                int_key_buckets(
                    (
                        a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                        + b.astype(np.uint64)
                    ).view(np.int64),
                    num_parts,
                ),
                pa.int32(),
            ),
        )

    def corner_partials(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        apex = group.column("apex").to_numpy(zero_copy_only=False)
        tag = group.column("is_edge").to_numpy(zero_copy_only=False)
        key = a.astype(np.int64) * np.int64(1 << 32) + b
        ek = np.unique(key[tag == 1])
        wmask = tag == 0
        empty = pa.Table.from_pydict(
            {"node": pa.array([], pa.int64()),
             "t": pa.array([], pa.int64())}
        )
        if len(ek) == 0 or not wmask.any():
            return empty
        wk = key[wmask]
        pos = np.minimum(np.searchsorted(ek, wk), len(ek) - 1)
        hit = ek[pos] == wk
        if not hit.any():
            return empty
        corners = np.concatenate(
            [apex[wmask][hit], a[wmask][hit], b[wmask][hit]]
        )
        un, cnt = np.unique(corners, return_counts=True)
        return pa.Table.from_pydict(
            {
                "node": pa.array(un, pa.int64()),
                "t": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    counted = (
        tagged.map_batches(close_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: corner_partials(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
        .groupby("node")
        .sum("t")
    )
    rows = [t for t in ray.get(counted.to_arrow_refs()) if t.num_rows]
    if not rows:
        return {}
    tt = pa.concat_tables(rows)
    return dict(
        zip(
            tt.column("node").to_numpy(zero_copy_only=False).tolist(),
            tt.column("sum(t)").to_numpy(zero_copy_only=False).tolist(),
        )
    )


def bfs_distances(
    sf_dir: str,
    seed_nation: int = 3,
    max_hops: int = 4,
    node_budget: int = 2_000_000,
) -> pa.Table:
    """EXACT BFS hop distances from a seed set (suppliers of one
    nation; default 3 — present at every SF) over the symmetrised bipartite graph — the bounded-depth
    reachability primitive (crawl radius, contamination spread,
    citation distance).

    In budget, the node-side state (frontier + labeled set — O(nodes),
    always far below O(edges)) lives in numpy on the driver and each
    hop is ONE streamed pass over edges emitting block-distinct
    frontier-neighbor rows (key-only). Past ``node_budget`` the SAME
    distances come from unit-weight Bellman-Ford sweeps on (node,
    dist) key rows: per hop, one ``cogroup_attach`` of current dists
    onto edges by src + one groupby(node).min — after k sweeps every
    node within k hops holds its true distance, entirely
    key-only-distributed (the neardup_components min-label shape with
    +1 per hop). Tier equality is test-pinned; the oracle is a
    bounded-depth recursive CTE.
    """
    from .relational import _broadcast_parquet, _combine_partials

    supp = _broadcast_parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    skey = supp.column("s_suppkey").to_numpy().astype(np.int64)
    snat = supp.column("s_nationkey").to_numpy().astype(np.int64)
    seeds = np.sort(2 * skey[snat == seed_nation])
    edges = _edges_dataset(sf_dir).materialize()

    # node-count probe for the tier choice: degree table is O(nodes)
    n_nodes = _degree_table(edges).num_rows
    if n_nodes <= node_budget:
        from .relational import _sorted_member_mask

        lab_nodes = np.sort(seeds)                      # labeled, sorted
        lab_dists = np.zeros(len(lab_nodes), dtype=np.int64)
        frontier = seeds
        for h in range(1, max_hops + 1):
            if len(frontier) == 0:
                break
            f_ref = ray.put(np.sort(frontier))

            def neigh(batch: pa.Table) -> pa.Table:
                f = ray.get(f_ref)
                src = batch.column("src").to_numpy(zero_copy_only=False)
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                pos = np.minimum(np.searchsorted(f, src), len(f) - 1)
                uniq = np.unique(dst[f[pos] == src])
                return pa.Table.from_pydict(
                    {"node": pa.array(uniq, pa.int64()),
                     "n": pa.array(np.ones(len(uniq), dtype=np.int64))}
                )

            partials = edges.map_batches(neigh, batch_format="pyarrow")
            # materialize once: the None fallback's groupby then reuses
            # these blocks instead of re-running the upstream DAG
            partials = partials.materialize()
            tbl = _combine_partials(partials, ["node"], ["n"])
            if tbl is None:  # block-distinct partials over the budget
                tbl = pa.Table.from_pylist(
                    partials.groupby("node").sum("n").take_all()
                )
            cand = (
                tbl.column("node").to_numpy().astype(np.int64)
                if tbl.num_rows else np.array([], dtype=np.int64)
            )
            new = cand[~_sorted_member_mask(lab_nodes, cand)]
            order = np.argsort(np.r_[lab_nodes, new], kind="stable")
            lab_dists = np.r_[lab_dists, np.full(len(new), h, np.int64)][order]
            lab_nodes = np.r_[lab_nodes, new][order]
            frontier = new
        return pa.Table.from_pydict(
            {"node": pa.array(lab_nodes, pa.int64()),
             "dist": pa.array(lab_dists, pa.int64())}
        )

    # over-budget tier: Bellman-Ford sweeps on key-only (node, dist)
    from .joins import cogroup_attach

    labeled = ray.data.from_arrow(pa.Table.from_pydict(
        {"node": pa.array(seeds, pa.int64()),
         "dist": pa.array(np.zeros(len(seeds), dtype=np.int64))}
    ))
    for _h in range(1, max_hops + 1):
        srcd = labeled.map_batches(
            lambda t: t.rename_columns(["src", "sdist"]),
            batch_format="pyarrow",
        )
        cand = cogroup_attach(
            edges, srcd, "src",
            [pa.field("src", pa.int64()), pa.field("dst", pa.int64())],
            [pa.field("sdist", pa.int64())],
        )

        def relax(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.is_valid(batch.column("sdist")))
            # fill_null BEFORE to_numpy: nullable int64 silently
            # promotes to float64 otherwise (NOTES_r3)
            d = np.asarray(pc.fill_null(t.column("sdist"), 0)
                           .to_numpy(zero_copy_only=False), dtype=np.int64)
            return pa.Table.from_pydict(
                {"node": t.column("dst"),
                 "dist": pa.array(d + 1, pa.int64())}
            )

        cand_rows = cand.map_batches(relax, batch_format="pyarrow")
        labeled = labeled.union(cand_rows).groupby("node").min("dist")
        labeled = labeled.map_batches(
            lambda t: t.rename_columns(["node", "dist"]),
            batch_format="pyarrow",
        ).materialize()
    parts = [
        t for t in ray.get(labeled.to_arrow_refs()) if t.num_rows
    ]
    out = pa.concat_tables(parts)
    return out.sort_by([("node", "ascending")])


# -- k-core decomposition (iterative peeling) ----------------------------------

_KC_EMPTY = pa.Table.from_pydict(
    {"node": pa.array([], pa.int64()), "core_deg": pa.array([], pa.int64())}
)


def kcore_nodes(
    sf_dir: str,
    k: int = 10,
    node_broadcast_budget: int = 2_000_000,
    max_rounds: int = 64,
    edges: ray.data.Dataset | None = None,
) -> pa.Table:
    """Nodes of the k-core of the symmetrised bipartite link graph
    (same edge derivation as :func:`pagerank`), with each survivor's
    degree INSIDE the core — the spam/quality prune a crawl frontier
    runs before ranking (low-core pages are link-farm leaves; the
    dense core is where PageRank mass concentrates).

    Iterative peeling to the exact fixpoint: each round recomputes
    degrees over the edges whose BOTH endpoints are still alive, then
    drops nodes under ``k``. Rounds are driver-sequenced but all the
    edge work is distributed:

    - **in budget** (node count under ``node_broadcast_budget``): the
      alive set rides ``ray.put`` as ONE sorted int64 array; each
      round is one map over edge blocks (membership via two
      searchsorteds, sparse (src, n) degree partials) combined on the
      driver with np.add.at — the pagerank register-sweep shape, no
      AllToAll per round.
    - **past it**: the alive set stays a Dataset; membership is two
      key-only ``cogroup_attach`` semi-joins (src then dst) and the
      degree close is a pre-combined ``groupby(src).sum`` — O(nodes)
      never pins the driver. Fixpoint detection compares materialized
      counts (metadata, no extra pass).

    Both tiers stop only at the true fixpoint (new set == old set);
    ``max_rounds`` is a convergence certificate — exceeding it raises
    instead of returning a half-peeled set. A k-core peel removes >= 1
    node per non-final round, so the bound only trips on a bug.
    """
    if edges is None:
        edges = _edges_dataset(sf_dir).materialize()
    deg_tbl = _degree_table(edges)
    nodes = deg_tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(nodes) == 0:
        return _KC_EMPTY
    degs = deg_tbl.column("count()").to_numpy(zero_copy_only=False).astype(
        np.int64
    )

    if len(nodes) <= node_broadcast_budget:
        alive = nodes[degs >= k]
        for _ in range(max_rounds):
            if len(alive) == 0:
                return _KC_EMPTY
            alive_ref = ray.put(alive)

            def partial(batch: pa.Table) -> pa.Table:
                a = ray.get(alive_ref)
                src = batch.column("src").to_numpy(zero_copy_only=False)
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                si = np.searchsorted(a, src)
                di = np.searchsorted(a, dst)
                m = (
                    (si < len(a)) & (di < len(a))
                )
                m[m] &= (a[si[m]] == src[m]) & (a[di[m]] == dst[m])
                uniq, cnt = np.unique(src[m], return_counts=True)
                return pa.Table.from_pydict(
                    {
                        "src": pa.array(uniq, pa.int64()),
                        "n": pa.array(cnt.astype(np.int64), pa.int64()),
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
            deg = np.zeros(len(alive), np.int64)
            for t in parts:
                s = t.column("src").to_numpy(zero_copy_only=False)
                c = t.column("n").to_numpy(zero_copy_only=False)
                np.add.at(deg, np.searchsorted(alive, s), c)
            keep = deg >= k
            if keep.all():
                return pa.Table.from_pydict(
                    {
                        "node": pa.array(alive, pa.int64()),
                        "core_deg": pa.array(deg, pa.int64()),
                    }
                )
            alive = alive[keep]
        raise RuntimeError(
            f"kcore_nodes: no fixpoint after {max_rounds} rounds"
        )

    # -- over-budget tier: the alive set never touches the driver --------
    from .joins import cogroup_attach

    def deg_partial(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(src, return_counts=True)
        return pa.Table.from_pydict(
            {
                "src": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def close_degrees(eds: ray.data.Dataset) -> ray.data.Dataset:
        return (
            eds.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("src")
            .sum("n")
            .map_batches(
                lambda t: t.rename_columns(["src", "n"]),
                batch_format="pyarrow",
            )
        )

    def keep_at_least_k(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch.column("n"), k))
        return t.select(["src"])

    alive_ds = (
        close_degrees(edges)
        .map_batches(keep_at_least_k, batch_format="pyarrow")
        .materialize()
    )
    n_alive = alive_ds.count()
    cur_edges = edges
    for _ in range(max_rounds):
        if n_alive == 0:
            return _KC_EMPTY
        flag = alive_ds.map_batches(
            lambda t: t.append_column(
                "m", pa.array(np.ones(t.num_rows, np.int8), pa.int8())
            ),
            batch_format="pyarrow",
        )
        half = cogroup_attach(
            cur_edges,
            flag,
            "src",
            [pa.field("src", pa.int64()), pa.field("dst", pa.int64())],
            [pa.field("m", pa.int8())],
        ).map_batches(
            lambda t: t.filter(pc.is_valid(t.column("m"))).select(
                ["src", "dst"]
            ),
            batch_format="pyarrow",
        )
        flag_dst = flag.map_batches(
            lambda t: t.rename_columns(["dst", "m"]), batch_format="pyarrow"
        )
        filtered = cogroup_attach(
            half,
            flag_dst,
            "dst",
            [pa.field("src", pa.int64()), pa.field("dst", pa.int64())],
            [pa.field("m", pa.int8())],
        ).map_batches(
            lambda t: t.filter(pc.is_valid(t.column("m"))).select(
                ["src", "dst"]
            ),
            batch_format="pyarrow",
        ).materialize()
        deg_ds = close_degrees(filtered).materialize()
        next_alive = deg_ds.map_batches(
            keep_at_least_k, batch_format="pyarrow"
        ).materialize()
        n_next = next_alive.count()
        if n_next == n_alive:
            parts = [
                t
                for t in ray.get(deg_ds.to_arrow_refs())
                if t.num_rows
            ]
            if not parts:
                return _KC_EMPTY
            out = pa.concat_tables(parts).rename_columns(
                ["node", "core_deg"]
            )
            return out.sort_by([("node", "ascending")])
        alive_ds, n_alive, cur_edges = next_alive, n_next, filtered
    raise RuntimeError(f"kcore_nodes: no fixpoint after {max_rounds} rounds")


# -- weighted single-source shortest paths (bounded Bellman-Ford) --------------


def _weighted_edges_dataset(sf_dir: str) -> ray.data.Dataset:
    """Distinct symmetrised edges with an int64 weight = MIN(l_quantity)
    over the pair's lineitem occurrences. Same node ids as
    :func:`_edges_dataset`; per-batch local min partials combine under
    one bucketed groupby (the _edges_dataset distinct discipline with
    a min carried through)."""
    from .io import read_parquet_clean
    from .joins import default_num_buckets, int_key_buckets

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_partkey", "l_quantity"],
    )
    num_parts = default_num_buckets()

    def pair_min(batch: pa.Table) -> pa.Table:
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        src, dst = 2 * s, 2 * p + 1
        key = np.stack([src, dst], axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        mins = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, inv, q)
        mixed = uniq[:, 0].astype(np.uint64) * np.uint64(
            0xC2B2AE3D27D4EB4F
        ) + uniq[:, 1].astype(np.uint64)
        return pa.Table.from_pydict(
            {
                "src": pa.array(uniq[:, 0], pa.int64()),
                "dst": pa.array(uniq[:, 1], pa.int64()),
                "w": pa.array(mins, pa.int64()),
                "bucket": pa.array(
                    int_key_buckets(mixed.view(np.int64), num_parts)
                ),
            }
        )

    def min_in_bucket(group: pa.Table) -> pa.Table:
        s = group.column("src").to_numpy(zero_copy_only=False)
        d = group.column("dst").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        key = np.stack([s, d], axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        mins = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mins, inv, w)
        # symmetrise here: both orientations share the pair's min
        return pa.Table.from_pydict(
            {
                "src": pa.array(
                    np.concatenate([uniq[:, 0], uniq[:, 1]]), pa.int64()
                ),
                "dst": pa.array(
                    np.concatenate([uniq[:, 1], uniq[:, 0]]), pa.int64()
                ),
                "w": pa.array(np.concatenate([mins, mins]), pa.int64()),
            }
        )

    return (
        ds.map_batches(pair_min, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(min_in_bucket, batch_format="pyarrow")
    )


def weighted_sssp(
    sf_dir: str,
    seed_nation: int = 3,
    max_sweeps: int = 4,
    node_budget: int = 2_000_000,
    edges: ray.data.Dataset | None = None,
) -> pa.Table:
    """Bounded-sweep Bellman-Ford over the MIN(l_quantity)-weighted
    symmetrised graph: after ``max_sweeps`` synchronous relaxation
    sweeps every node holds the exact cheapest distance among paths of
    <= max_sweeps edges from the seed set (suppliers of
    ``seed_nation``) — the weighted generalization of
    :func:`bfs_distances` (crawl cost radius, toll-weighted citation
    distance). dist_{i+1}(v) = min(dist_i(v), min_{(u,v,w)} dist_i(u)+w),
    all int64 — exact, no float order anywhere.

    In budget the labeled (node, dist) state lives on the driver and a
    sweep is ONE streamed pass over weighted edge blocks emitting
    block-local (dst, min cand) register partials (lexsort-free
    np.minimum.at on batch-local codes) combined driver-side with one
    np.minimum.at. Past ``node_budget`` the SAME sweeps run as the
    bfs cogroup tier with the weight carried: cogroup_attach of dists
    by src + relax + groupby(node).min. Tier equality is test-pinned;
    the oracle is the recursive-CTE relaxation with the identical
    sweep bound.
    """
    from .relational import _broadcast_parquet

    supp = _broadcast_parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    skey = supp.column("s_suppkey").to_numpy().astype(np.int64)
    snat = supp.column("s_nationkey").to_numpy().astype(np.int64)
    seeds = np.sort(2 * skey[snat == seed_nation])
    if edges is None:
        edges = _weighted_edges_dataset(sf_dir).materialize()

    n_nodes = _degree_table(edges).num_rows
    if n_nodes <= node_budget:
        lab_nodes = seeds.copy()
        lab_dists = np.zeros(len(lab_nodes), dtype=np.int64)
        for _ in range(max_sweeps):
            ref = ray.put((lab_nodes, lab_dists))

            def relax_partial(batch: pa.Table) -> pa.Table:
                nodes_a, dists_a = ray.get(ref)
                src = batch.column("src").to_numpy(zero_copy_only=False)
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                w = batch.column("w").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(nodes_a, src)
                m = pos < len(nodes_a)
                m[m] &= nodes_a[pos[m]] == src[m]
                cand_d = dists_a[pos[m]] + w[m]
                uniq, inv = np.unique(dst[m], return_inverse=True)
                mins = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
                np.minimum.at(mins, inv, cand_d)
                return pa.Table.from_pydict(
                    {
                        "node": pa.array(uniq, pa.int64()),
                        "d": pa.array(mins, pa.int64()),
                    }
                )

            parts = [
                t
                for t in ray.get(
                    edges.map_batches(relax_partial, batch_format="pyarrow")
                    .materialize()
                    .to_arrow_refs()
                )
                if t.num_rows
            ]
            if parts:
                cand = pa.concat_tables(parts)
                cn = cand.column("node").to_numpy(zero_copy_only=False)
                cd = cand.column("d").to_numpy(zero_copy_only=False)
            else:
                cn = np.array([], np.int64)
                cd = np.array([], np.int64)
            merged = np.union1d(lab_nodes, cn)
            dists = np.full(len(merged), np.iinfo(np.int64).max, np.int64)
            dists[np.searchsorted(merged, lab_nodes)] = lab_dists
            np.minimum.at(dists, np.searchsorted(merged, cn), cd)
            if np.array_equal(merged, lab_nodes) and np.array_equal(
                dists, lab_dists
            ):
                break  # fixpoint before the sweep bound — sweeps are no-ops now
            lab_nodes, lab_dists = merged, dists
        return pa.Table.from_pydict(
            {
                "node": pa.array(lab_nodes, pa.int64()),
                "dist": pa.array(lab_dists, pa.int64()),
            }
        )

    # over-budget tier: the bfs cogroup sweeps with the weight carried
    from .joins import cogroup_attach

    labeled = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "node": pa.array(seeds, pa.int64()),
                "dist": pa.array(np.zeros(len(seeds), dtype=np.int64)),
            }
        )
    )
    for _ in range(max_sweeps):
        srcd = labeled.map_batches(
            lambda t: t.rename_columns(["src", "sdist"]),
            batch_format="pyarrow",
        )
        cand = cogroup_attach(
            edges,
            srcd,
            "src",
            [
                pa.field("src", pa.int64()),
                pa.field("dst", pa.int64()),
                pa.field("w", pa.int64()),
            ],
            [pa.field("sdist", pa.int64())],
        )

        def relax(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.is_valid(batch.column("sdist")))
            d = np.asarray(
                pc.fill_null(t.column("sdist"), 0).to_numpy(
                    zero_copy_only=False
                ),
                dtype=np.int64,
            )
            w = t.column("w").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {
                    "node": t.column("dst"),
                    "dist": pa.array(d + w, pa.int64()),
                }
            )

        cand_rows = cand.map_batches(relax, batch_format="pyarrow")
        labeled = labeled.union(cand_rows).groupby("node").min("dist")
        labeled = labeled.map_batches(
            lambda t: t.rename_columns(["node", "dist"]),
            batch_format="pyarrow",
        ).materialize()
    parts = [t for t in ray.get(labeled.to_arrow_refs()) if t.num_rows]
    out = pa.concat_tables(parts)
    return out.sort_by([("node", "ascending")])


# -- butterfly counting (bipartite 4-cycles) -----------------------------------

_BF_SCHEMA = {
    "n_parts": pa.int64(),
    "n_copairs": pa.int64(),
    "n_butterflies": pa.int64(),
}


def butterfly_count(
    sf_dir: str,
    max_part_degree: int = 4096,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """Exact butterfly (2x2 biclique / 4-cycle) count of the bipartite
    supplier-part graph — THE bipartite density primitive (bipartite
    graphs have no triangles, so clustering structure lives in
    butterflies): n_butterflies = Σ_pairs C(codeg(u,v), 2) where
    codeg(u, v) = parts shared by suppliers u < v.

    Scale shape: a part's supplier set is co-located by ONE
    hash(part)-bucketed exchange of the distinct (s, p) rows, pair
    emission is vectorized ACROSS part runs (the repeat/arange block
    trick, no per-part Python), bounded by C(part_degree, 2); hub
    parts past ``max_part_degree`` distinct suppliers drop WHOLE (the
    cocitation hub-guard contract, mirrored by the oracle's HAVING —
    at web scale a vocabulary-hub part would alone emit ~d²/2 pairs).
    Pair counts pre-combine per group as packed u*2^32+v keys (domain
    asserted) and close under the house combine gate — past
    ``combine_limit`` a Ray groupby(pk).sum merges and the three
    output scalars reduce from per-block partials, so NOTHING
    unbounded lands on the driver. All-int64 exact (headroom: codeg
    ≤ |parts|, so c(c-1)/2 < 2^63 needs |parts| < 4.3e9 — documented).
    Kept-part counts ride the same exchange as sentinel pk = -1 rows
    (the frequent_ngrams trick).
    """
    from .io import read_parquet_clean
    from .joins import default_num_buckets, int_key_buckets
    from .relational import _combine_partials

    num_parts = default_num_buckets()
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    )

    def local_distinct(batch: pa.Table) -> pa.Table:
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        key = np.unique(np.stack([p, s], axis=1), axis=0)
        return pa.Table.from_pydict(
            {
                "p": pa.array(key[:, 0], pa.int64()),
                "s": pa.array(key[:, 1], pa.int64()),
                "bucket": pa.array(int_key_buckets(key[:, 0], num_parts)),
            }
        )

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        p = group.column("p").to_numpy(zero_copy_only=False)
        s = group.column("s").to_numpy(zero_copy_only=False)
        key = np.unique(np.stack([p, s], axis=1), axis=0)  # global distinct
        p, s = key[:, 0], key[:, 1]
        if (s < 0).any() or (s >= 1 << 31).any():
            raise ValueError("butterfly_count: suppkey outside packable domain")
        new_run = np.concatenate(([True], p[1:] != p[:-1]))
        run_start_idx = np.nonzero(new_run)[0]
        run_len = np.diff(np.r_[run_start_idx, len(p)])
        keep_run = (run_len >= 2) & (run_len <= max_part_degree)
        n_kept_parts = int(keep_run.sum())
        # drop hub/singleton parts WHOLE before emission
        keep_row = np.repeat(keep_run, run_len)
        p, s = p[keep_row], s[keep_row]
        out_pk = [np.array([-1], np.int64)]
        out_n = [np.array([n_kept_parts], np.int64)]
        n = len(p)
        if n:
            new_run = np.concatenate(([True], p[1:] != p[:-1]))
            run_start_idx = np.nonzero(new_run)[0]
            run_id = np.cumsum(new_run) - 1
            starts = run_start_idx[run_id]
            pos = np.arange(n, dtype=np.int64) - starts
            total = int(pos.sum())
            if total:
                jj = np.repeat(np.arange(n, dtype=np.int64), pos)
                block_off = np.cumsum(pos) - pos
                ii = (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(block_off, pos)
                    + np.repeat(starts, pos)
                )
                u, v = s[ii], s[jj]  # s sorted within run -> u < v
                pk = (u << np.int64(32)) | v
                uniq, cnt = np.unique(pk, return_counts=True)
                out_pk.append(uniq)
                out_n.append(cnt.astype(np.int64))
        return pa.Table.from_pydict(
            {
                "pk": pa.array(np.concatenate(out_pk), pa.int64()),
                "n": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    partials = (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: pairs_in_bucket(g.sort_by([("p", "ascending"),
                                                 ("s", "ascending")])),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def close(pk: np.ndarray, cnt: np.ndarray) -> pa.Table:
        sent = pk == -1
        c = cnt[~sent]
        return pa.Table.from_pydict(
            {
                "n_parts": pa.array([int(cnt[sent].sum())], pa.int64()),
                "n_copairs": pa.array([int((~sent).sum())], pa.int64()),
                "n_butterflies": pa.array(
                    [int((c * (c - 1) // 2).sum())], pa.int64()
                ),
            }
        )

    tbl = _combine_partials(partials, ["pk"], ["n"], combine_limit=combine_limit)
    if tbl is not None:
        return close(
            tbl.column("pk").to_numpy(zero_copy_only=False),
            tbl.column("sum(n)").to_numpy(zero_copy_only=False),
        )

    # over-budget: keyed merge + per-block scalar partials — three
    # int64s to the driver, never the pair table
    merged = partials.groupby("pk").sum("n").materialize()

    def stats_partial(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        cnt = batch.column("sum(n)").to_numpy(zero_copy_only=False)
        return close(pk, cnt)

    parts = [
        t
        for t in ray.get(
            merged.map_batches(stats_partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.Table.from_pydict(
            {k: pa.array([0], t) for k, t in _BF_SCHEMA.items()}
        )
    allp = pa.concat_tables(parts)
    return pa.Table.from_pydict(
        {
            k: pa.array(
                [int(allp.column(k).to_numpy(zero_copy_only=False).sum())],
                pa.int64(),
            )
            for k in _BF_SCHEMA
        }
    )
