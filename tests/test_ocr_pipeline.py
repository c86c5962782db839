"""Distributed OCR stage == inline OCR kernel, task for task."""

import json

import ray.data

from high_performance_docling_ray.kernels.document import (
    PDF_MAGIC,
    ExtractOptions,
    page_clusters,
    sniff_format,
)
from high_performance_docling_ray.kernels.ocr import run_ocr
from high_performance_docling_ray.pipelines.ocr import ocr_pipeline
from high_performance_docling_ray.sources.pages import synth_pages_table


def _inline_expected(corpus):
    opts = ExtractOptions(do_ocr=True)
    expected = {}
    for row in corpus.to_pylist():
        payload = row["html"]
        if sniff_format(payload or b"") != "pdf":
            continue
        doc = json.loads(payload[len(PDF_MAGIC):])
        for page in doc["pages"]:
            clusters, _ = page_clusters(page, opts)
            for cid, text in run_ocr(clusters, page["page_no"]).items():
                expected[(row["url"], page["page_no"], cid)] = text
    return expected


def test_distributed_ocr_matches_inline_kernel():
    corpus = synth_pages_table(80, seed=5)
    expected = _inline_expected(corpus)
    assert expected, "fixture corpus produced no OCR regions"

    ds = ray.data.from_arrow(corpus.select(["url", "warc_ts", "html", "lang"]))
    got = {
        (r["url"], r["page_no"], r["cluster_id"]): r["ocr_text"]
        for r in ocr_pipeline(ds, concurrency=(1, 2)).take_all()
    }
    assert got == expected


def test_distributed_ocr_byte_identical_to_inline():
    """extract_with_distributed_ocr must equal the inline do_ocr path
    byte-for-byte on every output column (J6 join-back, VERDICT r1)."""
    import ray.data as rd

    from high_performance_docling_ray.kernels.document import ExtractOptions
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.pipelines.ocr import (
        extract_with_distributed_ocr,
    )
    from high_performance_docling_ray.sources.pages import synth_pages_table

    opts = ExtractOptions(do_ocr=True, do_code_enrichment=True)
    tbl = synth_pages_table(120, seed=42)

    inline = (
        extract_pipeline(
            rd.from_arrow(tbl), options=opts, dedup=True, explode_giant=False
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    dist = (
        extract_with_distributed_ocr(
            lambda: rd.from_arrow(tbl), opts, dedup=True, explode_giant=False
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # at least one doc must actually carry recognized OCR text (the
    # stub emits "[ocr <hash>]"), or the identity check is vacuous
    assert any("[ocr " in t for t in inline.extracted_text)
    assert inline.equals(dist)


def test_distributed_ocr_tiers_and_exploded_branch_byte_identical():
    """All four distributed-OCR join-back shapes must equal the inline
    do_ocr path byte-for-byte: broadcast ref x (doc-at-once,
    page-exploded) and the over-budget ocr_json column attach x both —
    exercised by forcing giant_bytes=0 (every doc explodes) and
    ocr_broadcast_budget=0 (broadcast impossible)."""
    import ray.data as rd

    from high_performance_docling_ray.kernels.document import ExtractOptions
    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.pipelines.ocr import (
        extract_with_distributed_ocr,
    )
    from high_performance_docling_ray.sources.pages import synth_pages_table

    opts = ExtractOptions(do_ocr=True)
    tbl = synth_pages_table(60, seed=42)

    def canon(ds):
        return ds.to_pandas().sort_values("url").reset_index(drop=True)

    inline = canon(
        extract_pipeline(
            rd.from_arrow(tbl), options=opts, dedup=True, explode_giant=False
        )
    )
    assert any("[ocr " in t for t in inline.extracted_text)
    for giant_bytes in (None, 0):  # doc-at-once vs every-doc-exploded
        for budget in (2_000_000, 0):  # broadcast tier vs column attach
            kwargs = dict(dedup=True)
            if giant_bytes is None:
                kwargs["explode_giant"] = False
            else:
                kwargs["explode_giant"] = True
                kwargs["giant_bytes"] = giant_bytes
            got = canon(
                extract_with_distributed_ocr(
                    lambda: rd.from_arrow(tbl),
                    opts,
                    ocr_broadcast_budget=budget,
                    **kwargs,
                )
            )
            assert inline.equals(got), (giant_bytes, budget)
