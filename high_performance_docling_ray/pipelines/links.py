"""Outlink extraction + link graph over raw HTML pages.

The web-curation sibling of the boilerplate-strip pipeline: harvest
every ``href`` from each page (the Common-Crawl operation behind
seed-list growth, spam-domain scoring and host-level PageRank), with
RFC-3986 resolution of relative links against the page url.

* ``extract_links`` — pure map: per page, one compiled-RE2 scan of the
  decoded HTML + stdlib ``urljoin`` per hit. Per-row work is inherent
  (HTML is a per-doc payload, same budget class as the boilerplate
  tokenizer in kernels/html_extract.py); the stage is stateless, so at
  10^12 pages it streams with zero exchanges.
* ``link_domain_graph`` — the (src_domain -> dst_domain) edge
  aggregate: vectorized domain parse of the resolved links
  (``pc.extract_regex``), a per-batch pandas combiner, then ONE small
  groupby sum whose exchange is O(distinct domain pairs) per block —
  never O(links).

Input is ``sources/pages.py:pages_with_links`` — deterministic HTML
whose planted link structure is a closed form of doc_id, so the
driver-gate oracle reconstructs expected edges in SQL while the Ray
side genuinely parses the markup (same verification style as the
extract_pages family).
"""

from __future__ import annotations

import re
import urllib.parse

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.pages import pages_with_links

_HREF = re.compile(r'href="([^"]*)"')
_ANCHOR = re.compile(r'<a href="([^"]*)"[^>]*>([^<]*)</a>')
_DOMAIN = re.compile(r"^https://(?P<dom>[^/]+)")


def extract_links(sf_dir: str) -> ray.data.Dataset:
    """(url, href, resolved, pos): every href on every page, in
    document order (pos is the 1-based occurrence index), with the
    raw attribute value AND its absolute resolution."""
    ds = pages_with_links(sf_dir)

    def harvest(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        src: list[str] = []
        href: list[str] = []
        resolved: list[str] = []
        pos: list[int] = []
        for u, h in zip(urls, htmls):
            if h is None or u is None:
                continue
            body = h.decode("utf-8", "replace")
            for i, m in enumerate(_HREF.finditer(body), 1):
                raw = m.group(1)
                src.append(u)
                href.append(raw)
                resolved.append(urllib.parse.urljoin(u, raw))
                pos.append(i)
        return pa.Table.from_pydict(
            {
                "url": pa.array(src, pa.string()),
                "href": pa.array(href, pa.string()),
                "resolved": pa.array(resolved, pa.string()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return ds.map_batches(harvest, batch_format="pyarrow")


def link_domain_graph(sf_dir: str) -> ray.data.Dataset:
    """(src_domain, dst_domain, n_links): the domain-level edge
    aggregate of ``extract_links``. Links whose resolution is not an
    https url (none in the planted corpus, but real crawls have
    mailto:/javascript:) are dropped before aggregation."""
    links = extract_links(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        src = pc.extract_regex(
            batch.column("url").combine_chunks(), _DOMAIN.pattern
        )
        dst = pc.extract_regex(
            batch.column("resolved").combine_chunks(), _DOMAIN.pattern
        )
        df = pd.DataFrame(
            {
                "src_domain": src.field("dom").to_numpy(zero_copy_only=False),
                "dst_domain": dst.field("dom").to_numpy(zero_copy_only=False),
            }
        ).dropna()
        g = (
            df.groupby(["src_domain", "dst_domain"], sort=False)
            .size()
            .reset_index(name="n_links")
        )
        return pa.Table.from_pydict(
            {
                "src_domain": pa.array(g["src_domain"].tolist(), pa.string()),
                "dst_domain": pa.array(g["dst_domain"].tolist(), pa.string()),
                "n_links": pa.array(
                    g["n_links"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        links.map_batches(partial, batch_format="pyarrow")
        .groupby(["src_domain", "dst_domain"])
        .sum("n_links")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "src_domain": batch.column("src_domain"),
                "dst_domain": batch.column("dst_domain"),
                "n_links": pc.cast(batch.column("sum(n_links)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_COCIT_EMPTY = pa.Table.from_pydict(
    {
        "target_a": pa.array([], pa.string()),
        "target_b": pa.array([], pa.string()),
        "n_shared": pa.array([], pa.int64()),
    }
)


def cocitation_pairs(
    sf_dir: str,
    min_shared: int = 2,
    max_out_degree: int = 64,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """CO-CITATION pairs over the page link graph: pairs of resolved
    target urls cited together by at least ``min_shared`` source pages
    — the classic related-pages / seed-expansion signal (Small 1973;
    the link-based sibling of the content-based near-dup family).

    Scale shape: a page is a ROW, so its distinct targets are already
    co-located — pair emission is per page with NO exchange, bounded
    by C(out_degree, 2). Hub pages past ``max_out_degree`` distinct
    targets are dropped whole (the standard co-citation hub guard —
    a 10^4-link portal page would emit 10^8 pairs and its co-citations
    are navigational noise anyway; the oracle mirrors the cap). Pair
    counts are mergeable (ta, tb, n) partials: per-batch Counter
    pre-combine, then the house combine gate — driver merge under
    ``combine_limit`` partial rows, Ray ``groupby(pair).sum`` past it
    (``cocitation_pairs_grouped`` forces the exchange). The
    ``min_shared`` filter runs BEFORE any collect, so the driver only
    ever holds true co-citation pairs.
    """
    from collections import Counter

    from .relational import _combine_partials

    ds = pages_with_links(sf_dir)

    def pair_partial(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        counts: Counter = Counter()
        for u, h in zip(urls, htmls):
            if h is None or u is None:
                continue
            body = h.decode("utf-8", "replace")
            targets = sorted(
                {
                    urllib.parse.urljoin(u, m.group(1))
                    for m in _HREF.finditer(body)
                }
            )
            k = len(targets)
            if k < 2 or k > max_out_degree:
                continue
            for i in range(k - 1):
                for j in range(i + 1, k):
                    counts[(targets[i], targets[j])] += 1
        if not counts:
            return _COCIT_EMPTY.rename_columns(["ta", "tb", "n"])
        items = list(counts.items())
        return pa.Table.from_pydict(
            {
                "ta": pa.array([p[0] for p, _ in items], pa.string()),
                "tb": pa.array([p[1] for p, _ in items], pa.string()),
                "n": pa.array([c for _, c in items], pa.int64()),
            }
        )

    partials = ds.map_batches(
        pair_partial, batch_format="pyarrow"
    ).materialize()
    merged = _combine_partials(partials, ["ta", "tb"], ["n"], combine_limit)
    if merged is not None:
        if not merged.num_rows:
            return _COCIT_EMPTY
        n = merged.column("sum(n)")
        keep = pc.greater_equal(n, min_shared)
        out = merged.filter(keep).rename_columns(["ta", "tb", "n"])
        return pa.Table.from_pydict(
            {
                "target_a": out.column("ta"),
                "target_b": out.column("tb"),
                "n_shared": pc.cast(out.column("n"), pa.int64()),
            }
        ).sort_by([("target_a", "ascending"), ("target_b", "ascending")])

    grouped = partials.groupby(["ta", "tb"]).sum("n")

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch.column("sum(n)"), min_shared)
        out = batch.filter(keep)
        return pa.Table.from_pydict(
            {
                "target_a": out.column("ta"),
                "target_b": out.column("tb"),
                "n_shared": pc.cast(out.column("sum(n)"), pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            grouped.map_batches(finish, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return _COCIT_EMPTY
    return pa.concat_tables(parts).sort_by(
        [("target_a", "ascending"), ("target_b", "ascending")]
    )


def domain_pagerank(
    sf_dir: str, iterations: int = 3, damping: float = 0.85
) -> pa.Table:
    """Host-level PageRank over the EXTRACTED link graph — the crawl-
    prioritization signal, weighted by link multiplicity and with the
    full dangling-node treatment (link-graph sinks like pure-content
    hosts have no outlinks; their mass redistributes uniformly each
    sweep):

        r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)·w(u,v)/outw(u) + dang/N)

    Scale shape: the DISTRIBUTED work is ``link_domain_graph`` —
    collapsing O(total links) into the O(distinct domain-pair) edge
    aggregate via per-block combiners; the power iteration then runs
    on that aggregate driver-side (domains number ~10^8 against 10^12
    pages — the aggregate is the small side by five orders of
    magnitude; past driver memory, swap the iteration for the
    ``graph.pagerank`` cogroup tier over the same aggregate).
    Deterministic: nodes sorted lexicographically, float64 both sides,
    round 6 on output only.
    """
    edges = link_domain_graph(sf_dir)
    parts = [
        t
        for t in ray.get(edges.materialize().to_arrow_refs())
        if t.num_rows
    ]
    if not parts:
        return pa.Table.from_pydict(
            {
                "domain": pa.array([], pa.string()),
                "pagerank": pa.array([], pa.float64()),
            }
        )
    e = pa.concat_tables(parts)
    src = np.asarray(e.column("src_domain").to_pylist(), object)
    dst = np.asarray(e.column("dst_domain").to_pylist(), object)
    w = e.column("n_links").to_numpy(zero_copy_only=False).astype(np.float64)
    nodes = np.unique(np.concatenate([src, dst]))  # sorted
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    n = len(nodes)
    outw = np.zeros(n, np.float64)
    np.add.at(outw, si, w)
    dangling = outw == 0.0

    r = np.full(n, 1.0 / n, np.float64)
    base = (1.0 - damping) / n
    for _ in range(iterations):
        inflow = np.zeros(n, np.float64)
        np.add.at(inflow, di, r[si] * w / outw[si])
        dang = r[dangling].sum()
        r = base + damping * (inflow + dang / n)

    return pa.Table.from_pydict(
        {
            "domain": pa.array(nodes.tolist(), pa.string()),
            "pagerank": pa.array(np.round(r, 6), pa.float64()),
        }
    )


def domain_hits(sf_dir: str, iterations: int = 3) -> pa.Table:
    """HITS hubs-and-authorities (Kleinberg 1999) over the extracted
    domain link graph — the complementary centrality pair to
    ``domain_pagerank``: a directory/portal host scores as a HUB (its
    outlinks point at good content), a content host as an AUTHORITY
    (good hubs point at it). Weighted by link multiplicity; L1
    normalization each half-sweep keeps the iteration deterministic.

        a'(v) = Σ_{u→v} h(u)·w(u,v)   then  a ← a / Σa
        h'(u) = Σ_{u→v} a(v)·w(u,v)   then  h ← h / Σh

    Scale shape: identical to ``domain_pagerank`` — the DISTRIBUTED
    work is the ``link_domain_graph`` collapse of O(total links) into
    the O(distinct domain-pair) aggregate; the power iteration runs
    driver-side on that aggregate (domains ~10^8 vs 10^12 pages; past
    driver memory the sweep swaps for the graph.pagerank cogroup tier
    over the same aggregate). Deterministic: nodes sorted
    lexicographically, float64 both sides, round 6 on output only.
    """
    edges = link_domain_graph(sf_dir)
    parts = [
        t
        for t in ray.get(edges.materialize().to_arrow_refs())
        if t.num_rows
    ]
    empty = pa.Table.from_pydict(
        {
            "domain": pa.array([], pa.string()),
            "hub": pa.array([], pa.float64()),
            "authority": pa.array([], pa.float64()),
        }
    )
    if not parts:
        return empty
    e = pa.concat_tables(parts)
    src = np.asarray(e.column("src_domain").to_pylist(), object)
    dst = np.asarray(e.column("dst_domain").to_pylist(), object)
    w = e.column("n_links").to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    nodes = np.unique(np.concatenate([src, dst]))  # sorted
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    n = len(nodes)

    h = np.full(n, 1.0 / n, np.float64)
    a = np.zeros(n, np.float64)
    for _ in range(iterations):
        a = np.zeros(n, np.float64)
        np.add.at(a, di, h[si] * w)
        ta = a.sum()
        if ta > 0:
            a = a / ta
        h = np.zeros(n, np.float64)
        np.add.at(h, si, a[di] * w)
        th = h.sum()
        if th > 0:
            h = h / th

    return pa.Table.from_pydict(
        {
            "domain": pa.array(nodes.tolist(), pa.string()),
            "hub": pa.array(np.round(h, 6), pa.float64()),
            "authority": pa.array(np.round(a, 6), pa.float64()),
        }
    )


def anchor_text_stats(sf_dir: str) -> ray.data.Dataset:
    """(dst_domain, anchor, n): how each destination domain is
    described by the pages that link to it — anchor text is the
    classic weak-label / query-synthesis signal mined from crawls.
    Same shape as ``link_domain_graph``: per-page RE2 anchor scan
    (pure map), urljoin resolve, vectorized domain parse, per-batch
    combiner, ONE (domain, anchor)-keyed groupby sum."""
    ds = pages_with_links(sf_dir)

    def harvest(batch: pa.Table) -> pa.Table:
        import pandas as pd

        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        doms: list[str] = []
        anchors: list[str] = []
        for u, h in zip(urls, htmls):
            if h is None or u is None:
                continue
            body = h.decode("utf-8", "replace")
            for m in _ANCHOR.finditer(body):
                resolved = urllib.parse.urljoin(u, m.group(1))
                dm = _DOMAIN.match(resolved)
                if dm is None:
                    continue
                doms.append(dm.group("dom"))
                anchors.append(m.group(2))
        g = (
            pd.DataFrame({"dst_domain": doms, "anchor": anchors})
            .groupby(["dst_domain", "anchor"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pydict(
            {
                "dst_domain": pa.array(g["dst_domain"].tolist(), pa.string()),
                "anchor": pa.array(g["anchor"].tolist(), pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(harvest, batch_format="pyarrow")
        .groupby(["dst_domain", "anchor"])
        .sum("n")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "dst_domain": batch.column("dst_domain"),
                "anchor": batch.column("anchor"),
                "n": pc.cast(batch.column("sum(n)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def crawl_frontier(
    sf_dir: str, build_broadcast_budget: int = 2_000_000
):
    """(url, n_inlinks): distinct link targets NOT yet crawled, with
    their in-link counts — the seed list for the next crawl wave,
    ordered by demand. The distributed ANTI-JOIN over web data:

    - probe side: ``extract_links`` collapsed to distinct targets via
      a per-batch combiner + ONE key-only groupby sum (the exchange
      carries (url, count) pairs, never link rows);
    - build side: the crawled url set, reduced to distinct keys. Under
      ``build_broadcast_budget`` it broadcasts once via ``ray.put``
      and the probe stream filters with exact vectorized ``pc.is_in``;
      past it, ``joins.cogroup_attach`` marks matches on the url key
      and a null-filter keeps the anti rows (same tier discipline as
      ``relational.anti_join_customers``).
    """
    links = extract_links(sf_dir)

    def target_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        g = (
            pd.DataFrame(
                {
                    "url": batch.column("resolved").to_numpy(
                        zero_copy_only=False
                    )
                }
            )
            .groupby("url", sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.Table.from_pydict(
            {
                "url": pa.array(g["url"].tolist(), pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    targets = (
        links.map_batches(target_partial, batch_format="pyarrow")
        .groupby("url")
        .sum("n")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "url": batch.column("url"),
                "n_inlinks": pc.cast(batch.column("sum(n)"), pa.int64()),
            }
        )

    targets = targets.map_batches(finish, batch_format="pyarrow")

    crawled_keys = pages_with_links(sf_dir).select_columns(["url"])
    from .dedup import _collect_within_budget

    keys_tbl = _collect_within_budget(crawled_keys, build_broadcast_budget)
    if keys_tbl is not None:
        crawled = keys_tbl.column("url").combine_chunks().unique()
        crawled_ref = ray.put(crawled)

        def anti(batch: pa.Table) -> pa.Table:
            have = ray.get(crawled_ref)
            mask = pc.is_in(batch.column("url").combine_chunks(), value_set=have)
            return batch.filter(pc.invert(mask))

        return targets.map_batches(anti, batch_format="pyarrow")

    # over-budget tier: distributed key-only anti-join
    from .joins import cogroup_attach

    marked = cogroup_attach(
        targets,
        crawled_keys.map_batches(
            lambda b: pa.Table.from_pydict(
                {
                    "url": b.column("url"),
                    "crawled": pa.array(
                        np.ones(b.num_rows, np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        key="url",
        left_fields=[
            pa.field("url", pa.string()),
            pa.field("n_inlinks", pa.int64()),
        ],
        payload_fields=[pa.field("crawled", pa.int64())],
    )

    def keep_anti(batch: pa.Table) -> pa.Table:
        mask = pc.is_null(batch.column("crawled"))
        return batch.filter(mask).select(["url", "n_inlinks"])

    return marked.map_batches(keep_anti, batch_format="pyarrow")


def frontier_prioritized(sf_dir: str, topk: int = 100) -> pa.Table:
    """Crawl scheduling: the frontier ranked by the PageRank of each
    target's domain — crawl demand (in-links) breaks ties within a
    domain, url asc breaks exact ties. Returns the global top-k
    (url, domain, n_inlinks, domain_rank, priority_rank).

    Composition shape: ``domain_pagerank`` is a driver-held table by
    construction (see its docstring), so attaching scores to the
    frontier stream is a broadcast lookup (sorted searchsorted per
    batch), never a shuffle; the global top-k is a per-block
    combiner + one tiny driver merge (rank = lexsort on the merged
    <= k x blocks rows).
    """
    pr = domain_pagerank(sf_dir)
    pr_nodes = np.asarray(pr.column("domain").to_pylist(), object)
    pr_vals = pr.column("pagerank").to_numpy(zero_copy_only=False)
    pr_ref = ray.put((pr_nodes, pr_vals))

    frontier = crawl_frontier(sf_dir)

    def local_k(batch: pa.Table) -> pa.Table:
        nodes, vals = ray.get(pr_ref)
        urls = np.asarray(batch.column("url").to_pylist(), object)
        inl = batch.column("n_inlinks").to_numpy(zero_copy_only=False)
        doms = np.empty(len(urls), object)
        for i, u in enumerate(urls):
            m = _DOMAIN.match(u)
            doms[i] = m.group("dom") if m else ""
        idx = np.searchsorted(nodes, doms)
        idx = np.clip(idx, 0, len(nodes) - 1)
        rank = np.where(nodes[idx] == doms, vals[idx], 0.0)
        order = np.lexsort((urls, -inl, -rank))[:topk]
        return pa.Table.from_pydict(
            {
                "url": pa.array(urls[order].tolist(), pa.string()),
                "domain": pa.array(doms[order].tolist(), pa.string()),
                "n_inlinks": pa.array(
                    inl[order].astype(np.int64), pa.int64()
                ),
                "domain_rank": pa.array(rank[order], pa.float64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            frontier.map_batches(local_k, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.Table.from_pydict(
            {
                "url": pa.array([], pa.string()),
                "domain": pa.array([], pa.string()),
                "n_inlinks": pa.array([], pa.int64()),
                "domain_rank": pa.array([], pa.float64()),
                "priority_rank": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(parts)
    urls = np.asarray(merged.column("url").to_pylist(), object)
    inl = merged.column("n_inlinks").to_numpy(zero_copy_only=False)
    rank = merged.column("domain_rank").to_numpy(zero_copy_only=False)
    order = np.lexsort((urls, -inl, -rank))[:topk]
    out = merged.take(pa.array(np.sort(order)))
    # global priority rank in the same (rank desc, inlinks desc, url)
    urls2 = np.asarray(out.column("url").to_pylist(), object)
    inl2 = out.column("n_inlinks").to_numpy(zero_copy_only=False)
    rank2 = out.column("domain_rank").to_numpy(zero_copy_only=False)
    pos = np.empty(len(urls2), np.int64)
    pos[np.lexsort((urls2, -inl2, -rank2))] = np.arange(1, len(urls2) + 1)
    return out.append_column(
        "priority_rank", pa.array(pos, pa.int64())
    )


def cdx_index(sf_dir: str) -> ray.data.Dataset:
    """CDX-style capture index: every crawled page keyed by its SURT
    (Sort-friendly URI Reordering Transform — host labels reversed and
    comma-joined, then the path: ``example,site0)/d/123``) with the
    capture timestamp and the page's GLOBAL position in SURT order.
    The sorted index is what makes a 10^12-capture crawl archive
    binary-searchable; rank is the lookup offset.

    Scale shape: the SURT transform is a pure map that reverses each
    DISTINCT host once (dictionary-encode + scatter — hosts repeat
    heavily in a crawl); the global order comes from Ray Data's own
    distributed range-partition ``sort`` (the one operator here that
    IS an all-to-all, used deliberately: a binary-searchable index
    cannot avoid a global sort); ranks are then assigned per sorted
    block from a driver cumsum of block row-counts — raw Ray tasks,
    because the Dataset API exposes no ordered block index. SURTs are
    unique in a deduped crawl (url is the dedup key), so the order is
    total and reproducible.
    """
    import ray

    pages = pages_with_links(sf_dir).select_columns(["url", "warc_ts"])

    def to_surt(batch: pa.Table) -> pa.Table:
        col = batch.column("url").combine_chunks()
        parts = pc.extract_regex(
            col, r"^https://(?P<dom>[^/]+)(?P<path>/.*)$"
        )
        doms = parts.field("dom")
        paths = parts.field("path")
        enc = doms.dictionary_encode()
        rev = [
            ",".join(reversed(h.split("."))) if h is not None else None
            for h in enc.dictionary.to_pylist()
        ]
        rev_col = pc.take(pa.array(rev, pa.string()), enc.indices)
        surt_col = pc.binary_join_element_wise(rev_col, paths, ")")
        return pa.Table.from_pydict(
            {
                "surt": surt_col,
                "url": batch.column("url"),
                "warc_ts": batch.column("warc_ts"),
            }
        )

    keyed = pages.map_batches(to_surt, batch_format="pyarrow")
    sorted_ds = keyed.sort("surt").materialize()
    refs = sorted_ds.to_arrow_refs()  # blocks in global sorted order

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    @ray.remote
    def _add_rank(t: pa.Table, off: int) -> pa.Table:
        return t.append_column(
            "rank", pa.array(off + np.arange(t.num_rows, dtype=np.int64))
        )

    ranked = [
        _add_rank.remote(r, int(o)) for r, o in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(ranked)


# Planted robots.txt policy (a real pipeline fetches robots.txt per
# host and broadcasts the compiled rule set, exactly like the UT1
# blocklist constant in web_curation.py): odd-numbered site hosts
# disallow /d/, every site host disallows /contact, ext hosts with
# residue % 3 == 0 disallow everything, docs.example allows all.
_ROBOTS_DISALLOW = {
    "site_odd": "/d/",
    "site_all": "/contact",
    "ext_mod3": "/",
}


def robots_filter(sf_dir: str) -> ray.data.Dataset:
    """(url, n_inlinks): the crawl frontier with robots.txt policy
    applied — the politeness gate between frontier construction and
    fetch scheduling. Pure vectorized map over the frontier stream
    (domain regex + path prefix tests against the broadcast rule
    constants); no additional exchange beyond ``crawl_frontier``'s."""
    frontier = crawl_frontier(sf_dir)

    def allowed(batch: pa.Table) -> pa.Table:
        col = batch.column("url").combine_chunks()
        parts = pc.extract_regex(
            col, r"^https://(?P<dom>[^/]+)(?P<path>/.*)$"
        )
        doms = np.asarray(parts.field("dom").to_pylist(), object)
        paths = np.asarray(parts.field("path").to_pylist(), object)
        n = len(doms)
        deny = np.zeros(n, bool)
        for i in range(n):
            d, p = doms[i], paths[i]
            if d is None or p is None:
                deny[i] = True
                continue
            if d.startswith("site") and d.endswith(".example"):
                k = d[len("site"):-len(".example")]
                if k.isdigit() and int(k) % 2 == 1 and p.startswith(
                    _ROBOTS_DISALLOW["site_odd"]
                ):
                    deny[i] = True
                if p.startswith(_ROBOTS_DISALLOW["site_all"]):
                    deny[i] = True
            elif d.startswith("ext") and d.endswith(".example"):
                m = d[len("ext"):-len(".example")]
                if m.isdigit() and int(m) % 3 == 0:
                    deny[i] = True
        return batch.filter(pa.array(~deny))

    return frontier.map_batches(allowed, batch_format="pyarrow")
