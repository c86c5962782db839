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
