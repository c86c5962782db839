"""Per-document extraction driver: payload bytes -> extracted text.

This is the single deterministic function both the Ray ``map_batches``
stage and the serial pytest oracle execute, so the distributed output
is byte-identical to the serial output by construction (SURVEY.md §5).

Flow per document (mirrors the reference's three phases, main.py:53-93):
  1. format sniff by magic bytes (base_models.py:88-124)
  2. HTML -> block segmentation + boilerplate strip (north-star path)
     PDF  -> parsed pages -> layout postprocess (layout_rules) ->
             word-index table-token lookup + OTSL table build
             (table_rules) -> page assembly (textnorm)
  3. document assembly: reading order + captions/merges -> text
     (reading_order)
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

from . import labels as L
from .html_extract import extract_elements
from .layout_rules import CellArrays, layout_confidence, postprocess_page
from .reading_order import assemble_document, export_markdown
from .table_rules import build_table
from .textnorm import cells_to_text
from .word_index import WordIndex

PDF_MAGIC = b"%SYNTHPDF"

TABLE_TOKEN_IOS = 0.8  # word-index query threshold (page_word_index.py:80)


@dataclass(frozen=True)
class ExtractOptions:
    """Pipeline options (reference PdfPipelineOptions / LayoutOptions /
    TableStructureOptions surface, SURVEY.md §2.9)."""

    do_ocr: bool = False                 # main.py:47 default False
    do_table_structure: bool = True      # main.py:48
    keep_empty_clusters: bool = False    # layout_postprocessor.py:429
    create_orphan_clusters: bool = True  # layout_postprocessor.py:437
    do_code_enrichment: bool = False     # phase 4, gpu_processor.py:184-202

DEFAULT_OPTIONS = ExtractOptions()


def sniff_format(payload: bytes) -> str:
    """Magic-byte format detection (base_models.py:88-124 equivalent)."""
    if payload.startswith(PDF_MAGIC) or payload.startswith(b"%PDF"):
        return "pdf"
    return "html"


# --------------------------------------------------------------------------
# HTML path
# --------------------------------------------------------------------------

def html_to_elements(html: str) -> list[dict]:
    """HTML blocks -> assembly elements (same element schema as the PDF
    path so both share reading-order/assembly)."""
    blocks = extract_elements(html)
    elements: list[dict] = []
    open_table: dict | None = None

    def flush_table() -> None:
        nonlocal open_table
        if open_table is None:
            return
        cells = open_table["cells"]
        num_rows = max((c["start_row"] for c in cells), default=-1) + 1
        num_cols = max((c["start_col"] for c in cells), default=-1) + 1
        elements.append(
            {
                "page_no": 0,
                "cluster_id": len(elements),
                "label": L.TABLE,
                "kind": "table",
                "bbox": (0.0, float(len(elements)), 1.0, float(len(elements)) + 1.0),
                "text": "",
                "table": {
                    "num_rows": num_rows,
                    "num_cols": num_cols,
                    "otsl_seq": [],
                    "cells": cells,
                },
            }
        )
        open_table = None

    for blk in blocks:
        if blk["table_id"] >= 0 and blk["row"] >= 0:
            if open_table is None or open_table["table_id"] != blk["table_id"]:
                flush_table()
                open_table = {"table_id": blk["table_id"], "cells": []}
            open_table["cells"].append(
                {
                    "cell_id": len(open_table["cells"]),
                    "start_row": blk["row"],
                    "end_row": blk["row"] + 1,
                    "start_col": blk["col"],
                    "end_col": blk["col"] + 1,
                    "row_span": 1,
                    "col_span": 1,
                    "col_header": blk["label"] == "table_header",
                    "row_header": False,
                    "row_section": False,
                    "empty": not blk["text"],
                    "text": blk["text"],
                    "bbox": None,
                }
            )
            continue
        flush_table()
        label = blk["label"] if blk["label"] in L.TEXT_ELEM_LABELS else L.TEXT
        elements.append(
            {
                "page_no": 0,
                "cluster_id": len(elements),
                "label": label,
                "kind": "text",
                "bbox": (0.0, float(len(elements)), 1.0, float(len(elements)) + 1.0),
                "text": blk["text"],
                "table": None,
            }
        )
    flush_table()
    return elements


# --------------------------------------------------------------------------
# PDF-like path
# --------------------------------------------------------------------------

def assemble_page(
    clusters: list[dict],
    cells: CellArrays,
    table_map: dict[int, dict],
    page_no: int,
    ocr_texts: dict[int, str] | None = None,
) -> list[dict]:
    """Clusters -> typed elements (page_assemble_model.py:69-158).

    ``ocr_texts`` carries recognized text for clusters that had no
    cells; the OCR cell is the cluster's only line (J6 apply,
    gpu_processor.py:279-285).
    """
    elements: list[dict] = []
    ocr_texts = ocr_texts or {}
    for cl in clusters:
        label = cl["label"]
        bbox = tuple(cl["bbox"])
        base = {
            "page_no": page_no,
            "cluster_id": cl["id"],
            "label": label,
            "bbox": bbox,
            "table": None,
        }
        if label in L.TEXT_ELEM_LABELS:
            lines = [cells.text[i] for i in cl["cells"]]
            if not lines and cl["id"] in ocr_texts:
                lines = [ocr_texts[cl["id"]]]
            text = cells_to_text(lines)
            elements.append({**base, "kind": "text", "text": text})
        elif label in L.TABLE_LABELS:
            tbl = table_map.get(cl["id"])
            elements.append({**base, "kind": "table", "text": "", "table": tbl})
        elif label == L.FIGURE_LABEL:
            elements.append({**base, "kind": "figure", "text": ""})
        elif label in L.CONTAINER_LABELS:
            elements.append({**base, "kind": "container", "text": ""})
    return elements


def page_clusters(
    page: dict[str, Any], options: ExtractOptions = DEFAULT_OPTIONS
) -> tuple[list[dict], CellArrays]:
    """One parsed page -> finalized layout clusters + cell arrays.

    The single shared entry for cluster derivation (inline extraction,
    the distributed OCR identify stage, and tests all call this, so
    their cluster sets cannot diverge). Empty clusters are kept when
    OCR is on — they are the OCR task regions (gpu_processor.py:204-234).
    """
    cells = CellArrays(page["cells"])
    raw = [
        {
            "id": int(c["id"]),
            "label": c["label"],
            "bbox": (float(c["l"]), float(c["t"]), float(c["r"]), float(c["b"])),
            "confidence": float(c["confidence"]),
        }
        for c in page["raw_clusters"]
    ]
    final_clusters = postprocess_page(
        raw,
        cells,
        float(page["width"]),
        float(page["height"]),
        keep_empty_clusters=options.keep_empty_clusters or options.do_ocr,
        create_orphan_clusters=options.create_orphan_clusters,
    )
    return final_clusters, cells


def process_pdf_page(
    page: dict[str, Any],
    options: ExtractOptions = DEFAULT_OPTIONS,
    ocr_texts_override: dict[int, str] | None = None,
) -> tuple[list[dict], dict[str, float]]:
    """One parsed page -> assembled elements + confidence scores."""
    final_clusters, cells = page_clusters(page, options)
    scores = layout_confidence(final_clusters, cells)

    ocr_texts: dict[int, str] = {}
    if options.do_ocr:
        if ocr_texts_override is not None:
            # distributed OCR join-back (J6): recognized text arrives
            # keyed by cluster_id from the separate OCR stage
            # (pipelines/ocr.py) instead of an inline model call —
            # reference apply-back gpu_processor.py:260-288
            ocr_texts = ocr_texts_override
        else:
            from .ocr import run_ocr

            ocr_texts = run_ocr(final_clusters, page["page_no"])

    # Table structure: word-index lookup per table cluster with
    # cross-table token dedup (table_structure_model.py:172-224, O7).
    widx = WordIndex.from_cells(
        page["words"], float(page["width"]), float(page["height"])
    )
    preds_by_cluster = {t["cluster_id"]: t for t in page.get("raw_tables", [])}
    table_map: dict[int, dict] = {}
    seen_token_ids: set[int] = set()
    if not options.do_table_structure:
        preds_by_cluster = {}
    for cl in final_clusters:
        if cl["label"] not in L.TABLE_LABELS:
            continue
        pred = preds_by_cluster.get(cl["id"])
        if pred is None:
            continue
        l, t, r, b = cl["bbox"]
        tokens = [
            tk
            for tk in widx.query_tokens(l, t, r, b, ios=TABLE_TOKEN_IOS)
            if tk["id"] not in seen_token_ids
        ]
        for tk in tokens:
            seen_token_ids.add(tk["id"])
        table_map[cl["id"]] = build_table(
            pred["otsl_seq"], pred.get("cell_bboxes"), tokens
        )

    elements = assemble_page(
        final_clusters, cells, table_map, page["page_no"], ocr_texts
    )
    return elements, scores


# --------------------------------------------------------------------------
# Entry
# --------------------------------------------------------------------------

def extract_document(
    payload: bytes,
    options: ExtractOptions = DEFAULT_OPTIONS,
    ocr_lookup: dict[int, dict[int, str]] | None = None,
) -> dict[str, Any]:
    """Document payload -> extraction result row (pure, deterministic).

    Returns {extracted_text, markdown, elements_json, n_pages,
    n_elements, n_tables, doc_kind, layout_score}.

    ``ocr_lookup``: distributed-OCR results for THIS document, keyed
    ``{page_no: {cluster_id: text}}``; when given (and do_ocr), pages
    consume it instead of running the inline recognizer.
    """
    kind = sniff_format(payload)
    if kind == "html":
        elements = html_to_elements(payload.decode("utf-8", errors="replace"))
        n_pages = 1
        layout_score = float("nan")
    else:
        doc = json.loads(payload[len(PDF_MAGIC):])
        elements = []
        page_scores: list[float] = []
        for page in doc["pages"]:
            override = (
                ocr_lookup.get(int(page["page_no"]), {})
                if ocr_lookup is not None
                else None
            )
            els, scores = process_pdf_page(page, options, override)
            elements.extend(els)
            page_scores.append(scores["layout_score"])
        n_pages = len(doc["pages"])
        valid = [s for s in page_scores if s == s]
        layout_score = sum(valid) / len(valid) if valid else float("nan")

    assembled = assemble_document(elements)
    items = assembled["items"]
    extracted_text = assembled["extracted_text"]
    if options.do_code_enrichment:
        from .formula import enrich_elements
        from .reading_order import export_text

        items = enrich_elements(items)
        extracted_text = export_text(items)
    from .reading_order import canonical_items

    canon_items = canonical_items(items)
    return {
        "extracted_text": extracted_text,
        "markdown": export_markdown(items),
        "elements_json": json.dumps(canon_items, ensure_ascii=False),
        "n_pages": n_pages,
        "n_elements": len(items),
        "n_tables": sum(1 for it in items if it["kind"] == "table"),
        "doc_kind": kind,
        "layout_score": layout_score,
    }
