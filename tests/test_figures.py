"""Figure extraction pipeline (M25): figures flow from layout through
assembly to crops + features with captions attached."""

import ray.data

from high_performance_docling_ray.pipelines.extract import extract_pipeline
from high_performance_docling_ray.pipelines.figures import figure_features
from high_performance_docling_ray.sources.pages import synth_pages_table


def test_figures_extracted_with_captions_and_features():
    corpus = synth_pages_table(120, seed=42)
    ds = ray.data.from_arrow(corpus.select(["url", "warc_ts", "html", "lang"]))
    result = extract_pipeline(ds, dedup=False, explode_giant=False)
    rows = figure_features(result, concurrency=(1, 2)).take_all()
    assert rows, "fixture corpus produced no figures"
    for r in rows:
        assert r["decode_ok"]
        assert r["height"] > 0 and r["width"] > 0
        assert len(r["rgb_feature"]) == 3
        assert r["url"].startswith("https://synth.example/")
        # media payload column must NOT survive the feature stage
        assert "media" not in r
    # at least some figures carry their mapped caption text
    assert any(r["caption"].startswith("Figure ") for r in rows)


def test_figure_ids_globally_unique_and_deterministic():
    corpus = synth_pages_table(120, seed=42)
    ds1 = ray.data.from_arrow(corpus.select(["url", "warc_ts", "html", "lang"]))
    ds2 = ray.data.from_arrow(corpus.select(["url", "warc_ts", "html", "lang"]))
    a = figure_features(
        extract_pipeline(ds1, dedup=False), concurrency=(1, 2)
    ).take_all()
    b = figure_features(
        extract_pipeline(ds2, dedup=False), concurrency=(1, 2)
    ).take_all()
    ids_a = sorted(r["media_id"] for r in a)
    ids_b = sorted(r["media_id"] for r in b)
    assert ids_a == ids_b
    assert len(ids_a) == len(set(ids_a))


def test_debug_overlay_sink(tmp_path):
    """S7 debug sink: one deterministic SVG per PDF page, with cluster
    boxes split into left (regular) / right (form/kv/picture) panes."""
    import os

    import ray.data as rd

    from high_performance_docling_ray.pipelines.debug import (
        page_overlay_svg, write_debug_overlays,
    )
    from high_performance_docling_ray.sources.pages import synth_pages_table

    tbl = synth_pages_table(60, seed=42).select(["url", "warc_ts", "html", "lang"])
    out = str(tmp_path / "overlays")
    idx = write_debug_overlays(rd.from_arrow(tbl), out).take_all()
    assert idx, "no PDF pages rendered"
    for row in idx:
        assert os.path.exists(row["path"]) and row["svg_bytes"] > 0
        svg = open(row["path"]).read()
        assert svg.startswith("<svg") and svg.endswith("</svg>")
        assert row["n_clusters"] == svg.count('<text ')
    # deterministic: re-render one page equals the file byte-for-byte
    import json as _json

    from high_performance_docling_ray.kernels.document import PDF_MAGIC, sniff_format

    row0 = idx[0]
    payload = next(
        r["html"] for r in tbl.to_pylist()
        if r["url"] == row0["url"] and sniff_format(r["html"] or b"") == "pdf"
    )
    page = _json.loads(payload[len(PDF_MAGIC):])["pages"][row0["page_no"]]
    assert page_overlay_svg(page) == open(row0["path"]).read()
