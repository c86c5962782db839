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
