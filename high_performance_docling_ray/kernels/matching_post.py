"""Table cell-matching post-processor: the reference's 9-step heuristic.

Fresh data-oriented re-implementation of the semantics of
`/root/reference/fork/table/matching_post_processor.py` (process(),
:1128-1404) and the vectorized IOPDF matcher
(`fork/table/tf_cell_matcher.py:444-497`). Runs entirely inside one
table (in-row kernel, SURVEY.md §2.4 J8 / §2.5 G2-G4 / §2.6 O8).

Data shapes (reference wire format):
* table_cells: {cell_id, row_id, column_id, bbox:[l,t,r,b], label,
  cell_class:int, optional rowspan_val/colspan_val}
* pdf_cells:   {id:int, text:str, bbox:[l,t,r,b]}
* matches:     {str(pdf_cell_id): [{"table_cell_id": int,
                "iou"|"iopdf"|"post": float}, ...]}

Steps (process() comment block, :1155-1200):
 -1. no initial matches -> generate IOPDF matches
  0. minimal grid dimension
  1. good/bad cells per structural column (good = has a match and
     cell_class > 1)
  2. column alignment (min spread of left/middle/right edges)
  3. column medians (x by alignment, width, height; spans and empty
     cells excluded)
  4. move bad cells to the column's median position (no rescale)
  5. re-run IOPDF matching on the fixed cells
  7. de-duplicate adjacent columns whose pdf-cell sets overlap > 60%,
     keeping the higher-scoring column
  8. final assignment: per pdf cell keep the max-IOPDF match;
  8a. align table-cell bboxes to their matched pdf cells (skipped
      above 300 pdf cells, like the reference)
  9. orphan pickup via row/column banding; append to existing cell at
     (row, col) or create a new one
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

IOPDF_THRESHOLD = 0.01          # tf_cell_matcher.py:484
COLUMN_DUP_OVERLAP = 0.6        # matching_post_processor.py:648
ALIGN_MAX_PDF_CELLS = 300       # :1338, :1367

TableCell = dict[str, Any]
Matches = dict[str, list[dict]]


def clear_pdf_cells(pdf_cells: list[dict]) -> list[dict]:
    """Drop pdf cells with empty text (:1108-1126)."""
    return [p for p in pdf_cells if p["text"] != ""]


def intersection_over_pdf_match(
    table_cells: list[TableCell], pdf_cells: list[dict]
) -> Matches:
    """Per pdf cell: argmax intersection-over-pdf-area table cell,
    threshold 0.01 (tf_cell_matcher.py:444-497). String keys."""
    if not table_cells or not pdf_cells:
        return {}
    # float32 throughout, like the reference matcher — scores must be
    # bit-identical to tf_cell_matcher's (verified by the differential
    # test in tests/test_differential_reference.py)
    tb = np.asarray([t["bbox"] for t in table_cells], dtype=np.float32)
    pb = np.asarray([p["bbox"] for p in pdf_cells], dtype=np.float32)
    iw = np.clip(
        np.minimum(tb[:, None, 2], pb[None, :, 2])
        - np.maximum(tb[:, None, 0], pb[None, :, 0]),
        0, None,
    )
    ih = np.clip(
        np.minimum(tb[:, None, 3], pb[None, :, 3])
        - np.maximum(tb[:, None, 1], pb[None, :, 1]),
        0, None,
    )
    inter = iw * ih
    areas = (pb[:, 2] - pb[:, 0]) * (pb[:, 3] - pb[:, 1])
    areas = np.where(areas == 0, np.float32(1e-6), areas)
    iopdf = inter / areas[None, :]
    best = np.argmax(iopdf, axis=0)
    scores = iopdf[best, np.arange(len(pdf_cells))]
    out: Matches = {}
    for j in np.nonzero(scores > IOPDF_THRESHOLD)[0]:
        out[str(pdf_cells[int(j)]["id"])] = [
            {
                "table_cell_id": table_cells[int(best[j])]["cell_id"],
                "iopdf": float(scores[j]),
            }
        ]
    return out


def table_dimension(table_cells: list[TableCell]) -> tuple[int, int, int]:
    """(columns, rows, max_cell_id), minimum 1x1 (:32-60)."""
    columns = rows = 1
    max_cell_id = 0
    for c in table_cells:
        columns = max(columns, c["column_id"])
        rows = max(rows, c["row_id"])
        max_cell_id = max(max_cell_id, c["cell_id"])
    return columns + 1, rows + 1, max_cell_id


def _matched_ids(matches: Matches) -> set[int]:
    return {
        m["table_cell_id"] for lst in matches.values() for m in lst
    }


def good_bad_in_column(
    table_cells: list[TableCell], column: int, matches: Matches
) -> tuple[list[TableCell], list[TableCell]]:
    """Step 1 (:62-114): good = matched and cell_class > 1.

    Mirrors the reference's per-match-occurrence append
    (matching_post_processor.py:94-110): a cell with k match entries
    across all pdf cells appears k times in the good list (same dict
    object each time), so the step-3 medians see the reference's
    weighted multiset and downstream lists carry the same duplicates.
    """
    counts: dict[int, int] = {}
    for lst in matches.values():
        for m in lst:
            tid = m["table_cell_id"]
            counts[tid] = counts.get(tid, 0) + 1
    good, bad = [], []
    for cell in table_cells:
        if cell["column_id"] != column:
            continue
        k = counts.get(cell["cell_id"], 0) if cell.get("cell_class", 2) > 1 else 0
        if k:
            good.extend([cell] * k)
        else:
            bad.append(cell)
    return good, bad


def find_alignment(cells: list[TableCell]) -> str:
    """Step 2 (:150-190): smallest min-max spread of left/middle/right."""
    if not cells:
        return "left"
    lefts = [c["bbox"][0] for c in cells]
    rights = [c["bbox"][2] for c in cells]
    middles = [(lo + hi) / 2 for lo, hi in zip(lefts, rights)]
    deltas = [
        max(lefts) - min(lefts),
        max(middles) - min(middles),
        max(rights) - min(rights),
    ]
    return ("left", "middle", "right")[deltas.index(min(deltas))]


def median_pos_size(
    cells: list[TableCell], alignment: str
) -> tuple[float, float, float, float]:
    """Step 3 (:192-267): medians over non-span, non-empty cells."""
    xs, ys, ws, hs = [], [], [], []
    for cell in cells:
        if "rowspan_val" in cell or "colspan_val" in cell:
            continue
        if cell.get("cell_class", 2) <= 1:
            continue
        lo, top, hi, bot = cell["bbox"]
        x = lo
        if alignment == "middle":
            x = (lo + hi) / 2
        elif alignment == "right":
            x = hi
        xs.append(x)
        ys.append(top)
        ws.append(hi - lo)
        hs.append(bot - top)
    return (
        _median(xs) if xs else 0.0,
        _median(ys) if ys else 0.0,
        _median(ws) if ws else 1.0,
        _median(hs) if hs else 1.0,
    )


def _median(vals: list[float]) -> float:
    """np.median for a small list of finite floats, without numpy's
    per-call array-construction overhead. Identical IEEE result: odd n
    takes the middle element; even n averages the two middles ((a+b)/2
    and (a+b)*0.5 are the same double)."""
    s = sorted(vals)
    n = len(s)
    m = n >> 1
    if n & 1:
        return float(s[m])
    return (s[m - 1] + s[m]) * 0.5


def move_cells_to_median(
    cells: list[TableCell],
    median_x: float,
    rescale: bool,
    median_width: float,
    median_height: float,
    alignment: str,
) -> list[TableCell]:
    """Step 4 (:269-357): slide bad cells to the column's median edge."""
    out: list[TableCell] = []
    for cell in cells:
        x1, y1, x2, y2 = cell["bbox"]
        w = x2 - x1
        nx1, ny1, nx2, ny2 = median_x, y1, median_x + w, y2
        if rescale:
            nx2 = median_x + median_width
            ny2 = y1 + median_height
        if alignment == "middle":
            nx1 = median_x - w / 2
            nx2 = nx1 + w
            if rescale:
                nx1 = median_x - median_width / 2
                nx2 = median_x + median_width / 2
        elif alignment == "right":
            nx1, nx2 = median_x - w, median_x
            if rescale:
                nx1 = median_x - median_width
        new_cell = {
            "bbox": [nx1, ny1, nx2, ny2],
            "cell_id": cell["cell_id"],
            "column_id": cell["column_id"],
            "label": cell["label"],
            "row_id": cell["row_id"],
            "cell_class": cell.get("cell_class", 0),
        }
        for key in ("rowspan_val", "colspan_val"):
            if key in cell:
                new_cell[key] = cell[key]
        out.append(new_cell)
    return out


def deduplicate_columns(
    tab_columns: int,
    table_cells: list[TableCell],
    iou_matches: Matches,
    ioc_matches: Matches,
) -> tuple[list[TableCell], Matches, int]:
    """Step 7 (:541-681): drop the lower-scoring of adjacent columns
    whose matched pdf-cell sets overlap more than 60%."""
    col_pdf: list[list[int]] = []
    col_score: list[float] = []
    for col in range(tab_columns):
        ids = {
            c["cell_id"] for c in table_cells if c["column_id"] == col
        }
        score = 0.0
        pdf_iou: list[str] = []
        pdf_ioc: list[str] = []
        for key, lst in iou_matches.items():
            for m in lst:
                if m["table_cell_id"] in ids:
                    score += m.get("iou", m.get("iopdf", 0.0))
                    pdf_iou.append(key)
        for key, lst in ioc_matches.items():
            for m in lst:
                if m["table_cell_id"] in ids:
                    score += m["iopdf"]
                    pdf_ioc.append(key)
        merged = pdf_iou + list(set(pdf_ioc) - set(pdf_iou))
        col_pdf.append(sorted({int(x) for x in merged}))
        col_score.append(score)

    drop: list[int] = []
    for cl in range(tab_columns - 1):
        a, b = col_pdf[cl], col_pdf[cl + 1]
        inter = set(a) & set(b)
        prc = len(inter) / len(a) if a else 0.0
        if prc > COLUMN_DUP_OVERLAP:
            if col_score[cl] >= col_score[cl + 1]:
                drop.append(cl + 1)
            else:
                drop.append(cl)

    removed_ids: set[int] = set()
    new_cells: list[TableCell] = []
    for cell in table_cells:
        if cell["column_id"] in drop:
            removed_ids.add(cell["cell_id"])
        else:
            new_cells.append(cell)
    new_matches: Matches = {}
    for key, lst in ioc_matches.items():
        kept = [m for m in lst if m["table_cell_id"] not in removed_ids]
        if kept:
            new_matches[key] = kept
    return new_cells, new_matches, tab_columns - len(drop)


def final_assignment(ioc_matches: Matches) -> Matches:
    """Step 8 (:682-717): keep the single max-IOPDF match per pdf cell."""
    return {
        key: [max(lst, key=lambda m: m["iopdf"])]
        for key, lst in ioc_matches.items()
    }


def align_cells_to_pdf(
    table_cells: list[TableCell], pdf_cells: list[dict], matches: Matches
) -> list[TableCell]:
    """Step 8a (:474-539): matched cells take (the union of) their pdf
    cells' bboxes; unmatched cells are dropped."""
    pdf_bbox = {p["id"]: p["bbox"] for p in pdf_cells}
    by_id = {c["cell_id"]: c for c in table_cells}
    drafts: list[TableCell] = []
    for key, lst in matches.items():
        bb = pdf_bbox.get(int(key))
        if not bb:
            continue
        for cell_id in {int(m["table_cell_id"]) for m in lst}:
            cell = by_id.get(cell_id)
            if cell is None:
                continue
            new_cell = dict(cell)
            new_cell["bbox"] = list(bb)
            new_cell.setdefault("cell_class", 2)
            drafts.append(new_cell)

    boxes: dict[int, list[list[float]]] = {}
    for cell in drafts:
        boxes.setdefault(cell["cell_id"], []).append(cell["bbox"])
    out: list[TableCell] = []
    seen: set[int] = set()
    for cell in drafts:
        cid = cell["cell_id"]
        if cid in seen:
            continue
        seen.add(cid)
        bbs = boxes[cid]
        if len(bbs) > 1:
            cell["bbox"] = [
                min(b[0] for b in bbs),
                min(b[1] for b in bbs),
                max(b[2] for b in bbs),
                max(b[3] for b in bbs),
            ]
        out.append(cell)
    return out


def _merge_bbox(a: list[float], b: list[float]) -> list[float]:
    return [min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3])]


def _band_orphans(
    n_bands: int,
    table_cells: list[TableCell],
    pdf_cells: list[dict],
    matches: Matches,
    axis: str,
) -> tuple[list[list[str]], list[list[int]], list[list[list[float]]], list[str], list[int]]:
    """Steps 9a/9b (:789-1010): per row (axis='row') or column band,
    collect unmatched pdf cells intersecting the band; a pdf cell in
    several bands keeps the one with the smaller centroid distance."""
    if axis == "row":
        id_key, span_key, lo_ix, hi_ix = "row_id", "rowspan_val", 1, 3
    else:
        id_key, span_key, lo_ix, hi_ix = "column_id", "colspan_val", 0, 2

    bands: list[list[str]] = []
    depths: list[list[int]] = []
    bboxes: list[list[list[float]]] = []
    used_ids: list[str] = []
    used_band: list[int] = []

    for band in range(n_bands):
        los = [
            c["bbox"][lo_ix]
            for c in table_cells
            if c[id_key] == band
            and span_key not in c
            and c.get("cell_class", 2) > 1
        ]
        his = [
            c["bbox"][hi_ix]
            for c in table_cells
            if c[id_key] == band
            and span_key not in c
            and c.get("cell_class", 2) > 1
        ]
        band_lo = min(los) if los else -1
        band_hi = max(his) if his else -1
        in_band: list[str] = []
        in_depth: list[int] = []
        in_bbox: list[list[float]] = []

        for pdf_cell in pdf_cells:
            sid = str(pdf_cell["id"])
            if sid in matches:
                continue
            p_lo = pdf_cell["bbox"][lo_ix]
            p_hi = pdf_cell["bbox"][hi_ix]
            centroid_band = (band_hi + band_lo) / 2
            centroid_cell = (p_hi + p_lo) / 2
            within = (
                (band_lo <= p_lo <= band_hi)
                or (band_lo <= p_hi <= band_hi)
                or (p_lo <= band_lo and p_hi >= band_hi)
            )
            if not within:
                continue
            depth = round(abs(centroid_band - centroid_cell))
            if sid not in used_ids:
                used_ids.append(sid)
                used_band.append(band)
                in_band.append(sid)
                in_depth.append(depth)
                in_bbox.append(pdf_cell["bbox"])
                continue
            # duplicate: keep the band with smaller centroid distance
            used_ix = used_ids.index(sid)
            prev_band = used_band[used_ix]
            if len(bands) <= prev_band:
                continue
            prev_ix = bands[prev_band].index(sid)
            if depth < depths[prev_band][prev_ix]:
                bands[prev_band].pop(prev_ix)
                depths[prev_band].pop(prev_ix)
                bboxes[prev_band].pop(prev_ix)
                used_ids.pop(used_ix)
                used_band.pop(used_ix)
                used_ids.append(sid)
                used_band.append(band)
                in_band.append(sid)
                in_depth.append(depth)
                in_bbox.append(pdf_cell["bbox"])

        bands.append(in_band)
        depths.append(in_depth)
        bboxes.append(in_bbox)
    return bands, depths, bboxes, used_ids, used_band


def pick_orphan_cells(
    tab_rows: int,
    tab_cols: int,
    max_cell_id: int,
    table_cells: list[TableCell],
    pdf_cells: list[dict],
    matches: Matches,
) -> tuple[Matches, list[TableCell], int]:
    """Step 9 (:742-1106): band the table, place orphans by (row, col),
    merging into the existing structural cell or creating a new one."""
    new_matches = dict(matches)
    new_cells = list(table_cells)

    orphan_rows, row_depths, _row_bb, _, _ = _band_orphans(
        tab_rows, table_cells, pdf_cells, matches, "row"
    )
    orphan_cols, col_depths, col_bb, used_col_ids, used_col_band = _band_orphans(
        tab_cols, table_cells, pdf_cells, matches, "col"
    )
    del row_depths

    row_of: dict[int, int] = {}
    orphan_ids: list[int] = []
    for row_id, ids in enumerate(orphan_rows):
        for sid in ids:
            row_of[int(sid)] = row_id
            orphan_ids.append(int(sid))
    orphan_ids.sort()  # c++-parity order (:1040-1052)

    for pdf_id in orphan_ids:
        sid = str(pdf_id)
        if sid not in used_col_ids:
            continue
        new_col = used_col_band[used_col_ids.index(sid)]
        new_row = row_of[pdf_id]
        depth_ix = orphan_cols[new_col].index(sid)
        confidence = col_depths[new_col][depth_ix]
        pdf_bbox = col_bb[new_col][depth_ix]

        # search the EVOLVING list (the reference's new_table_cells is an
        # alias of table_cells, so cells created for earlier orphans are
        # visible to later ones — two orphans in one empty (row, col)
        # slot must share a cell, :1063-1100)
        existing = [
            c
            for c in new_cells
            if c["row_id"] == new_row and c["column_id"] == new_col
        ]
        if existing:
            cell_id = existing[0]["cell_id"]
            for cell in new_cells:
                if cell["cell_id"] == cell_id:
                    cell["bbox"] = _merge_bbox(cell["bbox"], pdf_bbox)
        else:
            max_cell_id += 1
            cell_id = max_cell_id
            new_cells.append(
                {
                    "bbox": list(pdf_bbox),
                    "cell_id": cell_id,
                    "column_id": new_col,
                    "label": "body",
                    "row_id": new_row,
                    "cell_class": 2,
                }
            )
        new_matches[sid] = [{"post": confidence, "table_cell_id": cell_id}]
    return new_matches, new_cells, max_cell_id


def resolve_overlaps(table_cells: list[TableCell]) -> list[TableCell]:
    """Optional last step (:390-472): push apart overlapping bboxes
    along the smaller-overlap axis."""
    for i in range(len(table_cells)):
        for j in range(i + 1, len(table_cells)):
            # the reference compares whole cell dicts (:463), not bboxes:
            # two distinct cells sharing one bbox (common after step-8a
            # alignment to the same pdf cell) are still pushed apart;
            # only true duplicates (same dict contents) are skipped
            if table_cells[i] == table_cells[j]:
                continue
            b1, b2 = table_cells[i]["bbox"], table_cells[j]["bbox"]
            ox = min(b1[2], b2[2]) - max(b1[0], b2[0])
            oy = min(b1[3], b2[3]) - max(b1[1], b2[1])
            if ox <= 0 or oy <= 0:
                continue
            if ox < oy:
                if b1[0] < b2[0]:
                    b1[2] -= math.ceil(ox / 2) + 2
                    b2[0] += math.floor(ox / 2)
                else:
                    b2[2] -= math.ceil(ox / 2) + 2
                    b1[0] += math.floor(ox / 2)
            else:
                if b1[1] < b2[1]:
                    b1[3] -= math.ceil(oy / 2) + 2
                    b2[1] += math.floor(oy / 2)
                else:
                    b2[3] -= math.ceil(oy / 2) + 2
                    b1[1] += math.floor(oy / 2)
            for bb in (b1, b2):
                bb[:] = [
                    min(bb[0], bb[2]), min(bb[1], bb[3]),
                    max(bb[0], bb[2]), max(bb[1], bb[3]),
                ]
    return table_cells


def process_matches(
    table_cells: list[TableCell],
    pdf_cells: list[dict],
    matches: Matches | None = None,
    correct_overlapping_cells: bool = False,
    min_free_cell_id: int = 0,
) -> tuple[list[TableCell], Matches]:
    """Full 9-step post-process (process(), :1128-1404).

    Returns (table_cells, matches) with final per-pdf-cell assignment.
    ``min_free_cell_id``: ids below this are reserved by the caller
    (e.g. structural cells excluded from matching for having no bbox),
    so orphan-created cells never collide with them.
    """
    pdf_cells = clear_pdf_cells(pdf_cells)
    if not matches:
        matches = intersection_over_pdf_match(table_cells, pdf_cells)

    tab_cols, tab_rows, max_cell_id = table_dimension(table_cells)
    max_cell_id = max(max_cell_id, min_free_cell_id - 1)

    fixed: list[TableCell] = []
    for col in range(tab_cols):
        good, bad = good_bad_in_column(table_cells, col, matches)
        alignment = find_alignment(good)
        median_x, _my, median_w, median_h = median_pos_size(good, alignment)
        fixed.extend(good)
        fixed.extend(
            move_cells_to_median(
                bad, median_x, False, median_w, median_h, alignment
            )
        )
    fixed.sort(key=lambda c: c["cell_id"])

    ioc_matches = intersection_over_pdf_match(fixed, pdf_cells)
    dedup_cells, dedup_matches, _n_cols = deduplicate_columns(
        tab_cols, fixed, matches, ioc_matches
    )
    final = final_assignment(dedup_matches)

    dedup_sorted = sorted(dedup_cells, key=lambda c: c["cell_id"])
    if len(pdf_cells) > ALIGN_MAX_PDF_CELLS:
        aligned = dedup_sorted
    else:
        aligned = align_cells_to_pdf(dedup_sorted, pdf_cells, final)

    final, cells, max_cell_id = pick_orphan_cells(
        tab_rows, tab_cols, max_cell_id, aligned, pdf_cells, final
    )
    if correct_overlapping_cells and len(cells) <= ALIGN_MAX_PDF_CELLS:
        cells = resolve_overlaps(cells)
    return cells, final
