"""Outlink extraction + domain link graph (pipelines/links.py) —
driver-gate hash evidence exists at sf0.01; these pins cover the
per-page parse order, RFC-3986 resolution, and graph/edge accounting.
"""

import sys

import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.links import (  # noqa: E402
    extract_links,
    link_domain_graph,
)

SF = "/root/testdata/sf0.001"


def _n_docs() -> int:
    return pq.read_metadata(f"{SF}/documents.parquet").num_rows


def test_extract_links_six_per_page_in_document_order():
    out = extract_links(SF).to_pandas()
    n = _n_docs()
    assert len(out) == 6 * n
    d0 = (
        out[out["url"] == "https://site0.example/d/0"]
        .sort_values("pos")
        .reset_index(drop=True)
    )
    assert list(d0["href"]) == [
        "/n0",
        "/n1",
        "https://docs.example/17",
        "/d/3",
        "https://ext0.example/p/0",
        "/contact",
    ]
    assert d0["resolved"].iloc[3] == "https://site0.example/d/3"
    # relative links resolve against the page host, absolute pass through
    assert list(d0["resolved"])[:2] == [
        "https://site0.example/n0",
        "https://site0.example/n1",
    ]
    assert d0["resolved"].iloc[5] == "https://site0.example/contact"
    assert (d0["pos"] == range(1, 7)).all()


def test_link_domain_graph_accounts_for_every_link():
    n = _n_docs()
    g = link_domain_graph(SF).to_pandas()
    assert g["n_links"].sum() == 6 * n
    # each site host emits exactly 4 self-links per page it serves
    self_edges = g[g["src_domain"] == g["dst_domain"]]
    assert (self_edges["n_links"] % 4 == 0).all()
    docs_in = g[g["dst_domain"] == "docs.example"]["n_links"].sum()
    assert docs_in == n
    # determinism
    g2 = link_domain_graph(SF).to_pandas()
    key = ["src_domain", "dst_domain"]
    assert g.sort_values(key).reset_index(drop=True).equals(
        g2.sort_values(key).reset_index(drop=True)
    )


def test_domain_pagerank_conserves_mass_and_ranks_sinks_high():
    import numpy as np

    from high_performance_docling_ray.pipelines.links import domain_pagerank

    out = domain_pagerank(SF).to_pandas()
    # probability mass conserved through dangling redistribution
    assert abs(out["pagerank"].sum() - 1.0) < 1e-4
    # docs.example receives 1 link from EVERY page; each ext host only
    # from ~1/7 of pages — docs.example must outrank every ext host
    docs = out[out["domain"] == "docs.example"]["pagerank"].iloc[0]
    exts = out[out["domain"].str.startswith("ext")]["pagerank"]
    assert (docs > exts).all()
    # determinism
    out2 = domain_pagerank(SF).to_pandas()
    assert out.equals(out2)


def test_anchor_text_stats_counts_planted_anchors():
    from high_performance_docling_ray.pipelines.links import anchor_text_stats

    n = _n_docs()
    out = anchor_text_stats(SF).to_pandas()
    assert out["n"].sum() == 6 * n
    docs = out[out["dst_domain"] == "docs.example"]
    assert len(docs) == 1 and docs["anchor"].iloc[0] == "ref one"
    assert docs["n"].iloc[0] == n
    # every site host is described by exactly 4 anchor strings
    site0 = out[out["dst_domain"] == "site0.example"]
    assert sorted(site0["anchor"]) == ["about", "contact", "home", "ref two"]


def test_crawl_frontier_tiers_agree_and_exclude_crawled():
    from high_performance_docling_ray.pipelines.links import crawl_frontier

    key = ["url", "n_inlinks"]
    broad = (
        crawl_frontier(SF).to_pandas().sort_values(key).reset_index(drop=True)
    )
    cogrp = (
        crawl_frontier(SF, build_broadcast_budget=0)
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert broad.equals(cogrp)  # tier pin
    # no crawled url may appear in the frontier
    crawled = {
        f"https://site{d % 5}.example/d/{d}" for d in range(_n_docs())
    }
    assert not (set(broad["url"]) & crawled)
    # at least one /d/ link IS crawled (anti-join bites) and at least
    # one dangles (frontier keeps it)
    d_links = {
        f"https://site{d % 5}.example/d/{(d * 7 + 3) % 97}"
        for d in range(_n_docs())
    }
    assert d_links & crawled and (d_links - crawled) <= set(broad["url"])


def test_frontier_prioritized_orders_by_domain_rank_then_demand():
    from high_performance_docling_ray.pipelines.links import (
        domain_pagerank,
        frontier_prioritized,
    )

    out = frontier_prioritized(SF).to_pandas()
    assert len(out) == 100
    assert list(out.sort_values("priority_rank")["priority_rank"]) == list(
        range(1, 101)
    )
    ordered = out.sort_values("priority_rank").reset_index(drop=True)
    # non-increasing (rank, inlinks) along the priority order
    for i in range(1, len(ordered)):
        a, b = ordered.iloc[i - 1], ordered.iloc[i]
        assert (a["domain_rank"], a["n_inlinks"], ) >= (
            b["domain_rank"],
            b["n_inlinks"],
        ) or a["domain_rank"] > b["domain_rank"]
    # domain_rank values come from the pagerank table
    pr = domain_pagerank(SF).to_pandas().set_index("domain")["pagerank"]
    for _, row in ordered.head(20).iterrows():
        assert row["domain_rank"] == pr[row["domain"]]


def test_cdx_index_rank_is_global_surt_order():
    import numpy as np

    from high_performance_docling_ray.pipelines.links import cdx_index

    out = cdx_index(SF).to_pandas().sort_values("rank").reset_index(drop=True)
    n = _n_docs()
    assert len(out) == n
    assert list(out["rank"]) == list(range(n))
    # rank order IS lexicographic surt order
    assert list(out["surt"]) == sorted(out["surt"])
    # SURT shape: reversed host labels, ')' before the path
    r0 = out[out["url"] == "https://site3.example/d/3"].iloc[0]
    assert r0["surt"] == "example,site3)/d/3"
    # determinism across runs (block layout must not leak into ranks)
    out2 = (
        cdx_index(SF).to_pandas().sort_values("rank").reset_index(drop=True)
    )
    assert out.equals(out2)
    _ = np


def test_robots_filter_enforces_each_planted_rule():
    from high_performance_docling_ray.pipelines.links import (
        crawl_frontier,
        robots_filter,
    )

    allowed = set(robots_filter(SF).to_pandas()["url"])
    frontier = set(crawl_frontier(SF).to_pandas()["url"])
    assert allowed < frontier  # the gate removes something
    for u in allowed:
        assert "/contact" not in u
        host = u.split("/")[2]
        if host.startswith("site") and "/d/" in u:
            assert int(host[4:].split(".")[0]) % 2 == 0
        if host.startswith("ext"):
            assert int(host[3:].split(".")[0]) % 3 != 0
    # every rule actually removed at least one url
    removed = frontier - allowed
    assert any("/contact" in u for u in removed)
    assert any("/d/" in u and u.split("/")[2].startswith("site") for u in removed)
    assert any(u.split("/")[2].startswith("ext") for u in removed)


def test_cocitation_pairs_planted_structure_and_tiers():
    """Every pair respects binary target order and min_shared; the
    always-together trio (/n0, /n1, /contact) of each site co-cites
    exactly site_page_count times; tiers agree exactly."""
    from high_performance_docling_ray.pipelines.links import (
        cocitation_pairs,
    )

    base = cocitation_pairs(SF)
    df = base.to_pandas()
    assert (df["target_a"] < df["target_b"]).all()
    assert (df["n_shared"] >= 2).all()
    import pyarrow.parquet as _pq

    n_docs = _pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    # site0 pages are doc_id % 5 == 0
    site0_pages = sum(1 for d in range(n_docs) if d % 5 == 0)
    host = "https://site0.example"
    trio = df[
        (df["target_a"] == host + "/contact")
        & (df["target_b"] == host + "/n0")
    ]
    assert trio["n_shared"].tolist() == [site0_pages]
    # forced distributed tier is exactly equal
    grouped = cocitation_pairs(SF, combine_limit=0)
    assert base.equals(grouped)


def test_cocitation_hub_cap_drops_pages_whole():
    """max_out_degree below the planted 6 distinct targets drops every
    page, so no pairs survive — the hub guard is all-or-nothing per
    page (mirrored by the oracle's HAVING BETWEEN)."""
    from high_performance_docling_ray.pipelines.links import (
        cocitation_pairs,
    )

    out = cocitation_pairs(SF, max_out_degree=5)
    assert out.num_rows == 0


def test_domain_hits_hub_authority_split():
    """Pure-sink domains (docs.example, ext*) have hub exactly 0 (no
    outlinks) but positive authority; site domains have positive hubs;
    both vectors are L1-normalized after the final sweep."""
    from high_performance_docling_ray.pipelines.links import domain_hits

    t = domain_hits(SF).to_pandas().set_index("domain")
    assert abs(t["hub"].sum() - 1.0) < 1e-5
    assert abs(t["authority"].sum() - 1.0) < 1e-5
    sinks = [d for d in t.index if d.startswith(("docs.", "ext"))]
    sites = [d for d in t.index if d.startswith("site")]
    assert sinks and sites
    assert (t.loc[sinks, "hub"] == 0.0).all()
    assert (t.loc[sinks, "authority"] > 0).all()
    assert (t.loc[sites, "hub"] > 0).all()
    # deterministic: a second run is bit-identical
    assert domain_hits(SF).to_pandas().set_index("domain").equals(t)
