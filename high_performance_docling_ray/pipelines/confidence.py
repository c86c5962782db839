"""Doc-level ConfidenceReport pipeline (reference base_models.py:397-459).

The reference attaches a ConfidenceReport to every converted document:
per-page scores (layout = mean cluster confidence, ocr = mean
confidence of OCR-sourced cells; parse/table never set) roll up to a
doc mean_score (nanmean of page means), low_score (nanmean of page 5 %
nanquantiles) and grade buckets. Here the same report is one streaming
``map_batches`` over the pages table — per-doc work only (no shuffle),
so it scales like any pure map stage.

Grades are bucketed from the 6-dp-rounded scores: the driver compares
floats at 6 dp, and grading the rounded value keeps the bucket
deterministic across numpy/DuckDB float summation orders. Rounding is
HALF-AWAY-FROM-ZERO (std::round, what DuckDB's ROUND does) — the score
grid here lands on exact 5e-7 midpoints structurally, where Python's
banker's rounding would diverge from the oracle.
"""

from __future__ import annotations

import json
import math

import pyarrow as pa

import ray.data

from ..kernels.document import (
    DEFAULT_OPTIONS,
    PDF_MAGIC,
    ExtractOptions,
    page_clusters,
    sniff_format,
)
from ..kernels.layout_rules import doc_confidence, grade_score, layout_confidence

REPORT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_pages", pa.int32()),
        ("mean_score", pa.float64()),
        ("low_score", pa.float64()),
        ("mean_grade", pa.string()),
        ("low_grade", pa.string()),
    ]
)


def _round6_half_away(x: float) -> float:
    """round(x, 6) with half-away-from-zero midpoints (DuckDB ROUND)."""
    if math.isnan(x):
        return x
    return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)


def confidence_rows(
    batch: pa.Table, options: ExtractOptions = DEFAULT_OPTIONS
) -> pa.Table:
    """Pages batch -> one ConfidenceReport row per document."""
    out: dict[str, list] = {name: [] for name in REPORT_SCHEMA.names}
    for row in batch.to_pylist():
        payload = row["html"] or b""
        page_scores: list[dict[str, float]] = []
        if sniff_format(payload) == "pdf":
            try:
                doc = json.loads(payload[len(PDF_MAGIC):])
                for page in doc["pages"]:
                    clusters, cells = page_clusters(page, options)
                    page_scores.append(layout_confidence(clusters, cells))
            except Exception:
                page_scores = []  # malformed: empty report (all NaN)
        report = doc_confidence(page_scores)
        mean6 = _round6_half_away(report["mean_score"])
        low6 = _round6_half_away(report["low_score"])
        out["url"].append(row["url"])
        out["n_pages"].append(len(page_scores))
        out["mean_score"].append(mean6)
        out["low_score"].append(low6)
        out["mean_grade"].append(grade_score(mean6))
        out["low_grade"].append(grade_score(low6))
    return pa.Table.from_pydict(out, schema=REPORT_SCHEMA)


def confidence_pipeline(
    pages_ds: ray.data.Dataset, options: ExtractOptions = DEFAULT_OPTIONS
) -> ray.data.Dataset:
    return pages_ds.map_batches(
        lambda b: confidence_rows(b, options), batch_format="pyarrow"
    )


def extract_confidence(sf_dir: str) -> ray.data.Dataset:
    """Driver query: ConfidenceReports over the closed-form SYNTHPDF
    wrap with ``ocr_cells=True`` (from_ocr metadata varies by
    (doc_id + cell_index), so layout AND ocr page scores — hence the
    nanmean/nanquantile/grade math — are all SQL-reproducible)."""
    from ..sources.pages import pdf_pages_from_documents

    return confidence_pipeline(pdf_pages_from_documents(sf_dir, ocr_cells=True))
