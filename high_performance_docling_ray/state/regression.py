"""Tolerant golden-output regression harness for table predictions.

Re-implements the semantics of the reference's regression runner
(`/root/reference/table_regression_runner.py`): canonical per-table
JSON with rounded bboxes and sorted cells (:52-84), a content hash
(:86-97) and a structural stable id (:99-112), two-stage matching —
exact stable-id, then greedy grid-Jaccard >= 0.98 (:153-219) — and a
tolerant field diff (bbox IoU >= 0.98 OR abs <= 1px OR rel <= 1%,
text exact by default, :33-47 / :223-258).

This complements the repo's strict byte-equality gate: byte equality
proves parallelism-invariance against our own serial oracle; this
harness measures HOW CLOSE a changed pipeline (e.g. a real model
swapped in for a stub) lands against a stored golden, the way the
reference does after every GPU pass (gpu_processor.py:370-385).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from typing import Any


@dataclass
class Tolerances:
    bbox_abs: float = 1.0      # pixels
    bbox_rel: float = 0.01     # 1% relative
    iou_min: float = 0.98      # accept bbox if IoU >= this
    text_case_insensitive: bool = False


def _bbox_iou(a, b) -> float:
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    area_a = max(0.0, ax2 - ax1) * max(0.0, ay2 - ay1)
    area_b = max(0.0, bx2 - bx1) * max(0.0, by2 - by1)
    denom = area_a + area_b - inter
    return inter / denom if denom > 0 else 0.0


def _bbox_close(a, b, tol: Tolerances) -> bool:
    """Reference tolerance rule (:33-47): IoU pass, else per-coordinate
    abs <= 1px or rel <= 1%."""
    if _bbox_iou(a, b) >= tol.iou_min:
        return True
    for v, w in zip(a, b):
        if abs(v - w) <= tol.bbox_abs:
            continue
        if abs(v - w) / max(1.0, abs(w)) <= tol.bbox_rel:
            continue
        return False
    return True


def _norm_text(t, ci: bool) -> str:
    if not t:
        return ""
    t = t.strip()
    return t.lower() if ci else t


def canon_table(tbl: dict[str, Any], page_no: int, table_id) -> dict[str, Any]:
    """Canonical compact dict over this repo's table shape
    (kernels/table_rules.py build_table output): rounded bboxes,
    cells sorted by (sr, sc, er, ec) — reference _canon_table."""
    cells = []
    for c in tbl.get("cells", []):
        bb = c.get("bbox")
        cells.append(
            {
                "sr": int(c["start_row"]),
                "er": int(c["end_row"]),
                "sc": int(c["start_col"]),
                "ec": int(c["end_col"]),
                "row_span": int(c.get("row_span", c["end_row"] - c["start_row"])),
                "col_span": int(c.get("col_span", c["end_col"] - c["start_col"])),
                "col_header": bool(c.get("col_header", False)),
                "row_header": bool(c.get("row_header", False)),
                "row_section": bool(c.get("row_section", False)),
                "bbox": (
                    [round(float(v), 2) for v in bb] if bb is not None else None
                ),
                "token": c.get("text") or None,
            }
        )
    cells.sort(key=lambda z: (z["sr"], z["sc"], z["er"], z["ec"]))
    return {
        "id": table_id,
        "page_no": int(page_no),
        "num_rows": int(tbl.get("num_rows", 0)),
        "num_cols": int(tbl.get("num_cols", 0)),
        "otsl_seq": list(tbl.get("otsl_seq", [])),
        "cells": cells,
    }


def hash_table(canon: dict[str, Any]) -> str:
    h = hashlib.sha256()
    h.update(str(canon["page_no"]).encode())
    h.update(str(canon["num_rows"]).encode())
    h.update(str(canon["num_cols"]).encode())
    for cell in canon["cells"]:
        h.update(
            f'{cell["sr"]},{cell["sc"]},{cell["er"]},{cell["ec"]},'
            f'{cell["row_span"]},{cell["col_span"]},{int(cell["col_header"])},'
            f'{int(cell["row_header"])},{int(cell["row_section"])}'.encode()
        )
        if cell["bbox"]:
            h.update(",".join(str(v) for v in cell["bbox"]).encode())
        if cell.get("token"):
            h.update(cell["token"].encode(errors="ignore"))
    return h.hexdigest()[:16]


def stable_table_id(canon: dict[str, Any]) -> str:
    """Content-derived id, independent of detection order (:99-112)."""
    h = hashlib.sha256()
    h.update(str(canon["page_no"]).encode())
    h.update(str(canon["num_rows"]).encode())
    h.update(str(canon["num_cols"]).encode())
    for sig in sorted(
        f'{c["sr"]},{c["sc"]},{c["er"]},{c["ec"]}' for c in canon["cells"]
    ):
        h.update(sig.encode())
    return h.hexdigest()[:8]


def table_similarity(a: dict[str, Any], b: dict[str, Any]) -> float:
    """Grid Jaccard on (sr, sc, er, ec) keys; 0 unless same page and
    dimensions (:114-131)."""
    if a["page_no"] != b["page_no"]:
        return 0.0
    if a["num_rows"] != b["num_rows"] or a["num_cols"] != b["num_cols"]:
        return 0.0
    a_cells = {(c["sr"], c["sc"], c["er"], c["ec"]) for c in a["cells"]}
    b_cells = {(c["sr"], c["sc"], c["er"], c["ec"]) for c in b["cells"]}
    if not a_cells or not b_cells:
        return 1.0 if a_cells == b_cells else 0.0
    inter = len(a_cells & b_cells)
    union = len(a_cells | b_cells)
    return inter / union if union else 0.0


def make_entry(tbl: dict[str, Any], page_no: int, table_id) -> dict[str, Any]:
    canon = canon_table(tbl, page_no, table_id)
    return {
        "page_no": canon["page_no"],
        "table_id": table_id,
        "stable_id": stable_table_id(canon),
        "hash": hash_table(canon),
        "table": canon,
    }


def match_tables(
    baseline: list[dict], current: list[dict]
) -> tuple[list[tuple[dict, dict]], list[dict], list[dict]]:
    """Two-stage per-page matching (:153-219): exact stable_id, then
    greedy grid-similarity >= 0.98."""
    pages = sorted(
        {e["page_no"] for e in baseline} | {e["page_no"] for e in current}
    )
    pairs: list[tuple[dict, dict]] = []
    removed: list[dict] = []
    added: list[dict] = []
    for page_no in pages:
        b_tables = [e for e in baseline if e["page_no"] == page_no]
        c_tables = [e for e in current if e["page_no"] == page_no]
        b_by_stable = {e["stable_id"]: e for e in b_tables}
        c_by_stable = {e["stable_id"]: e for e in c_tables}
        b_unused = list(b_tables)
        c_unused = list(c_tables)
        for sid in sorted(set(b_by_stable) & set(c_by_stable)):
            pairs.append((b_by_stable[sid], c_by_stable[sid]))
            b_unused.remove(b_by_stable[sid])
            c_unused.remove(c_by_stable[sid])
        while b_unused and c_unused:
            best_pair = None
            best_score = 0.0
            for b in b_unused:
                for c in c_unused:
                    score = table_similarity(b["table"], c["table"])
                    if score > best_score and score >= 0.98:
                        best_score = score
                        best_pair = (b, c)
            if best_pair is None:
                break
            pairs.append(best_pair)
            b_unused.remove(best_pair[0])
            c_unused.remove(best_pair[1])
        removed.extend(b_unused)
        added.extend(c_unused)
    return pairs, removed, added


def compare_tables(
    base: dict[str, Any], curr: dict[str, Any], tol: Tolerances | None = None
) -> list[str]:
    """Tolerant field diff of one matched pair (:223-258)."""
    tol = tol or Tolerances()
    msgs: list[str] = []
    if base["num_rows"] != curr["num_rows"]:
        msgs.append(f'num_rows {base["num_rows"]} -> {curr["num_rows"]}')
    if base["num_cols"] != curr["num_cols"]:
        msgs.append(f'num_cols {base["num_cols"]} -> {curr["num_cols"]}')
    if base.get("otsl_seq") != curr.get("otsl_seq"):
        msgs.append("otsl_seq changed")
    bmap = {(c["sr"], c["sc"], c["er"], c["ec"]): c for c in base["cells"]}
    cmap = {(c["sr"], c["sc"], c["er"], c["ec"]): c for c in curr["cells"]}
    for k in sorted(set(bmap) | set(cmap)):
        b, c = bmap.get(k), cmap.get(k)
        if b is None:
            msgs.append(f"cell added at {k}")
            continue
        if c is None:
            msgs.append(f"cell removed at {k}")
            continue
        for fld in ("row_span", "col_span", "col_header", "row_header",
                    "row_section"):
            if b[fld] != c[fld]:
                msgs.append(f"cell {k}: {fld} {b[fld]} -> {c[fld]}")
        bb, cb = b["bbox"], c["bbox"]
        if bb and cb:
            if not _bbox_close(tuple(bb), tuple(cb), tol):
                msgs.append(f"cell {k}: bbox {bb} -> {cb}")
        elif (bb is None) != (cb is None):
            msgs.append(f"cell {k}: bbox presence changed")
        if _norm_text(b.get("token"), tol.text_case_insensitive) != _norm_text(
            c.get("token"), tol.text_case_insensitive
        ):
            msgs.append(f"cell {k}: token text changed")
    return msgs


def write_baseline(path: str, doc_id: str, entries: list[dict]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"doc_id": doc_id, "tables": entries}, f, sort_keys=True)


def run_regression(
    baseline_path: str,
    current_entries: list[dict],
    tol: Tolerances | None = None,
) -> dict[str, Any]:
    """Compare current tables against a stored golden; returns
    {matched, removed, added, diffs: {pair label: [msg]}, clean}."""
    with open(baseline_path) as f:
        golden = json.load(f)
    pairs, removed, added = match_tables(golden["tables"], current_entries)
    diffs: dict[str, list[str]] = {}
    for b, c in pairs:
        msgs = compare_tables(b["table"], c["table"], tol)
        if msgs:
            diffs[f'p{b["page_no"]}/{b["stable_id"]}'] = msgs
    return {
        "matched": len(pairs),
        "removed": [e["stable_id"] for e in removed],
        "added": [e["stable_id"] for e in added],
        "diffs": diffs,
        "clean": not diffs and not removed and not added,
    }
