"""Document assembly: reading order, caption/footnote/merge mapping,
final text export.

Mirrors the wiring of the reference's ReadingOrderModel
(`/root/reference/readingorder_model.py:355-381`): predict order ->
captions -> footnotes -> merges -> build the ordered document ->
export text. The reference delegates order prediction to the external
``docling_ibm_models`` rule-based predictor; this kernel implements a
deterministic rule-based equivalent from scratch (page-major order,
within-page assembly order, nearest-neighbour caption/footnote
attachment, cross-element text merges with the reference's charspan
bookkeeping semantics, readingorder_model.py:336-353).

Element dicts: {page_no:int, cluster_id:int, label:str, kind:str,
bbox:(l,t,r,b) TOPLEFT, text:str, table:dict|None}.
``kind`` in {text, table, figure, container} (page_assemble_model.py:82-152).
"""

from __future__ import annotations

from typing import Any

from . import labels as L
from .listmarker import process_list_item
from .table_rules import table_to_text

Element = dict[str, Any]

CAPTION_MAX_DISTANCE = 72.0  # pts: caption must touch its target vertically


def order_elements(elements: list[Element]) -> list[Element]:
    """Reading order: page-major, then the assembly order within a page.

    Page assembly already ordered clusters by
    (first_cell_index, top, left) — the PDF-native print order
    (layout_postprocessor.py:1053-1065) — so within-page order is the
    element's position in its page list; the sort is stable on that.
    """
    keyed = sorted(enumerate(elements), key=lambda p: (p[1]["page_no"], p[0]))
    return [e for _, e in keyed]


def _vertical_gap(a: Element, b: Element) -> float:
    """Vertical distance between two boxes (0 when overlapping)."""
    at, ab = a["bbox"][1], a["bbox"][3]
    bt, bb = b["bbox"][1], b["bbox"][3]
    if ab < bt:
        return bt - ab
    if bb < at:
        return at - bb
    return 0.0


def map_captions(ordered: list[Element]) -> dict[int, list[int]]:
    """caption element -> nearest same-page table/picture target.

    Returns {target_pos: [caption_pos, ...]} over positions in
    ``ordered`` (the reference's cid space, readingorder_model.py:363-365).
    """
    out: dict[int, list[int]] = {}
    targets = [
        i
        for i, e in enumerate(ordered)
        if e["kind"] in ("table", "figure")
    ]
    for i, el in enumerate(ordered):
        if el["label"] != L.CAPTION:
            continue
        best = -1
        best_gap = CAPTION_MAX_DISTANCE
        for j in targets:
            if ordered[j]["page_no"] != el["page_no"]:
                continue
            gap = _vertical_gap(el, ordered[j])
            if gap < best_gap or (gap == best_gap and best == -1):
                best_gap = gap
                best = j
        if best >= 0:
            out.setdefault(best, []).append(i)
    return out


def map_footnotes(ordered: list[Element]) -> dict[int, list[int]]:
    """footnote -> nearest same-page table/picture strictly above it."""
    out: dict[int, list[int]] = {}
    targets = [
        i for i, e in enumerate(ordered) if e["kind"] in ("table", "figure")
    ]
    for i, el in enumerate(ordered):
        if el["label"] != L.FOOTNOTE:
            continue
        best = -1
        best_gap = CAPTION_MAX_DISTANCE
        for j in targets:
            t = ordered[j]
            if t["page_no"] != el["page_no"]:
                continue
            if t["bbox"][3] > el["bbox"][1]:  # target must end above footnote top
                continue
            gap = _vertical_gap(el, t)
            if gap < best_gap or (gap == best_gap and best == -1):
                best_gap = gap
                best = j
        if best >= 0:
            out.setdefault(best, []).append(i)
    return out


def map_merges(ordered: list[Element]) -> dict[int, list[int]]:
    """Cross-page paragraph continuation merges.

    A TEXT element at the top of page p+1 merges into the last TEXT
    element of page p when the earlier text does not end a sentence and
    the continuation starts lowercase — the deterministic equivalent of
    the reference predictor's merge proposals.
    """
    out: dict[int, list[int]] = {}
    consumed: set[int] = set()
    last_text_on_page: dict[int, int] = {}
    first_text_on_page: dict[int, int] = {}
    for i, el in enumerate(ordered):
        if el["label"] != L.TEXT or not el["text"]:
            continue
        page = el["page_no"]
        last_text_on_page[page] = i
        first_text_on_page.setdefault(page, i)
    for page, head in sorted(first_text_on_page.items()):
        prev = last_text_on_page.get(page - 1)
        if prev is None or prev in consumed or head in consumed:
            continue
        a, b = ordered[prev]["text"], ordered[head]["text"]
        if not a or not b:
            continue
        if a[-1] not in ".!?:;”\"'" and (b[0].islower() or a.endswith(",")):
            out.setdefault(prev, []).append(head)
            consumed.add(head)
    return out


def assemble_document(elements: list[Element]) -> dict[str, Any]:
    """Elements -> ordered document items + final extracted_text.

    Follows readingorder_model.py:106-334: captions/footnotes/merged
    elements become skippable and attach to their targets; page
    headers/footers land in the furniture layer and are excluded from
    the body text; tables render as tab/newline grids; list items keep
    their text; merges append ``" " + text`` (charspan bookkeeping
    semantics of readingorder_model.py:336-353).
    """
    ordered = order_elements(elements)
    captions = map_captions(ordered)
    footnotes = map_footnotes(ordered)
    merges = map_merges(ordered)
    skippable = {
        cid
        for mapping in (captions, footnotes, merges)
        for lst in mapping.values()
        for cid in lst
    }

    items: list[dict] = []
    for i, el in enumerate(ordered):
        if i in skippable:
            continue
        kind = el["kind"]
        label = el["label"]
        furniture = label in L.PAGE_HEADER_LABELS
        text = el.get("text") or ""
        if kind == "table" and el.get("table"):
            text = table_to_text(el["table"])
        if i in merges:
            for mcid in merges[i]:
                text += " " + (ordered[mcid].get("text") or "")
        marker, enumerated = "", False
        if label == L.LIST_ITEM:
            # ListItemMarkerProcessor semantics (M24): the reference
            # normalizes every created list item
            # (readingorder_model.py:100,309) — marker out of the text,
            # enumeration flagged
            marker, text, enumerated = process_list_item(text)
        item = {
            "kind": kind,
            "label": label,
            "page_no": el["page_no"],
            "cluster_id": el.get("cluster_id", -1),
            "bbox": tuple(el["bbox"]),
            "text": text,
            "furniture": furniture,
            "marker": marker,
            "enumerated": enumerated,
            "captions": [ordered[c]["text"] for c in captions.get(i, [])],
            "footnotes": [ordered[c]["text"] for c in footnotes.get(i, [])],
        }
        items.append(item)

    return {"items": items, "extracted_text": export_text(items)}


def export_text(items: list[dict]) -> str:
    """Body-text projection of assembled items. Split out so phase-4
    enrichment (kernels/formula.py) can rewrite item texts and
    re-export, matching the reference order: assemble -> enrich ->
    export (gpu_processor.py:184-202 runs before main.py:93)."""
    body_parts: list[str] = []
    for item in items:
        if item["furniture"]:
            continue
        if item["kind"] == "figure":
            for cap in item["captions"]:
                body_parts.append(cap)
            continue
        if item["text"]:
            body_parts.append(item["text"])
        for cap in item["captions"]:
            body_parts.append(cap)
        for fn in item["footnotes"]:
            body_parts.append(fn)
    return "\n".join(body_parts)


def canonical_items(items: list[dict]) -> list[dict]:
    """Assembled items -> the canonical serialization stored in the
    ``elements_json`` result column (rounded bboxes, stable field set;
    the regression-canonicalization idea of table_regression_runner.py:53-84)."""
    return [
        {
            "label": it["label"],
            "kind": it["kind"],
            "page_no": it["page_no"],
            "bbox": [round(v, 2) for v in it["bbox"]],
            "text": it["text"],
            "captions": it.get("captions", []),
            "footnotes": it.get("footnotes", []),
            # marker fields only where they exist (list items), so the
            # serialization of marker-free documents is unchanged
            **(
                {
                    "marker": it["marker"],
                    "enumerated": it["enumerated"],
                }
                if it.get("marker")
                else {}
            ),
        }
        for it in items
    ]


def export_markdown(items: list[dict]) -> str:
    """Markdown projection of assembled items (main.py:93 equivalent)."""
    parts: list[str] = []
    for item in items:
        if item["furniture"]:
            continue
        label = item["label"]
        text = item["text"]
        if label == L.SECTION_HEADER:
            parts.append(f"## {text}")
        elif label == L.LIST_ITEM:
            # normalized marker: enumerated items keep their detected
            # marker, bullets render canonically as "- " (the doubled
            # "- - item" of unnormalized text can no longer happen)
            if item.get("enumerated") and item.get("marker"):
                parts.append(f"{item['marker']} {text}")
            else:
                parts.append(f"- {text}")
        elif item["kind"] == "table":
            rows = text.split("\n") if text else []
            md_rows = ["| " + " | ".join(r.split("\t")) + " |" for r in rows]
            if md_rows:
                header_sep = "|" + "---|" * (rows[0].count("\t") + 1)
                md_rows.insert(1, header_sep)
            parts.extend(md_rows)
        elif item["kind"] == "figure":
            for cap in item["captions"]:
                parts.append(f"*{cap}*")
            continue
        elif text:
            parts.append(text)
        for cap in item["captions"]:
            if item["kind"] != "figure" and cap:
                parts.append(f"*{cap}*")
    return "\n\n".join(p for p in parts if p)
