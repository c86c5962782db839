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
        "https://docs.example/34",
        "https://ext0.example/p/0",
        "/contact",
    ]
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
    # each site host emits exactly 3 self-links per page it serves
    self_edges = g[g["src_domain"] == g["dst_domain"]]
    assert (self_edges["n_links"] % 3 == 0).all()
    docs_in = g[g["dst_domain"] == "docs.example"]["n_links"].sum()
    assert docs_in == 2 * n
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
    # docs.example receives 2 links from every page and links nowhere:
    # it must outrank every site host
    docs = out[out["domain"] == "docs.example"]["pagerank"].iloc[0]
    sites = out[out["domain"].str.startswith("site")]["pagerank"]
    assert (docs > sites).all()
    # determinism
    out2 = domain_pagerank(SF).to_pandas()
    assert out.equals(out2)
