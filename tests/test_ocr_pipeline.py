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
