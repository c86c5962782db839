"""Table-structure rules: OTSL grids, cell matching, index compaction.

Re-implements the table-side semantics of the reference
(`/root/reference/fork/table/tf_predictor.py`,
`fork/table/tf_cell_matcher.py`) on plain data:

* OTSL tag sequences (``fcel ecel ched rhed srow lcel ucel xcel nl``)
  are parsed into a span-aware cell grid; square check per
  tf_predictor.py:51-85.
* OTSL -> HTML tag conversion (tf_predictor.py:1107-1115).
* bbox/tag desync repair (tf_predictor.py:237-279).
* pdf-token -> table-cell matching: argmax intersection-over-pdf-area,
  threshold 0.01 (tf_cell_matcher.py:444-497).
* start_row/col compaction to contiguous 0..K-1 (tf_predictor.py:584-623).

The OTSL grammar itself is public (Lysak et al., "Optimized Table
Tokenization for Table Structure Recognition", 2023).
"""

from __future__ import annotations

from itertools import groupby
from typing import Any

import numpy as np

CELL_TAGS = ("fcel", "ecel", "ched", "rhed", "srow")  # origin tokens w/ bbox
SPAN_TAGS = ("lcel", "ucel", "xcel")
MATCH_IOPDF_THRESHOLD = 0.01  # tf_cell_matcher.py:444-497

TableCell = dict[str, Any]


def otsl_is_square(otsl_seq: list[str]) -> bool:
    """All rows same length (tf_predictor.py:51-85 otsl_sqr_chk)."""
    rows = [list(g) for k, g in groupby(otsl_seq, lambda x: x == "nl") if not k]
    if not rows:
        return True
    width = len(rows[0])
    return all(len(r) == width for r in rows)


def otsl_to_html(otsl_seq: list[str]) -> list[str]:
    """OTSL -> html tag sequence.

    Cell-origin tags become ``<td>``; horizontally/vertically spanned
    positions fold into their origin's colspan/rowspan attributes,
    which the reference emits as attribute fragments ending in ``>``
    (tf_predictor.py:237-279 counts ``<td>`` and ``>`` as cells).
    """
    cells = parse_otsl(otsl_seq)
    grid_rows = _otsl_rows(otsl_seq)
    html: list[str] = ["<table>"]
    by_origin = {(c["start_row"], c["start_col"]): c for c in cells}
    for r, row in enumerate(grid_rows):
        html.append("<tr>")
        for c, tag in enumerate(row):
            cell = by_origin.get((r, c))
            if cell is None:
                continue  # spanned position
            if cell["row_span"] > 1 or cell["col_span"] > 1:
                frag = "<td"
                if cell["row_span"] > 1:
                    frag += f' rowspan="{cell["row_span"]}"'
                if cell["col_span"] > 1:
                    frag += f' colspan="{cell["col_span"]}"'
                html.append(frag)
                html.append(">")
            else:
                html.append("<td>")
            html.append("</td>")
        html.append("</tr>")
    html.append("</table>")
    return html


def _otsl_rows(otsl_seq: list[str]) -> list[list[str]]:
    rows: list[list[str]] = []
    cur: list[str] = []
    for tag in otsl_seq:
        if tag == "nl":
            rows.append(cur)
            cur = []
        else:
            cur.append(tag)
    if cur:
        rows.append(cur)
    return rows


def parse_otsl(otsl_seq: list[str]) -> list[TableCell]:
    """OTSL tags -> span-aware cells.

    Returns cells ordered by origin-token sequence order, each with
    start/end row/col (end exclusive), spans and header flags — the
    same cell schema the reference carries in ``tf_responses``
    (tf_predictor.py:981-1076).
    """
    rows = _otsl_rows(otsl_seq)
    cells: list[TableCell] = []
    cell_id = 0
    for r, row in enumerate(rows):
        for c, tag in enumerate(row):
            if tag not in CELL_TAGS:
                continue
            # colspan: consecutive lcel/xcel to the right on this row
            col_span = 1
            cc = c + 1
            while cc < len(row) and row[cc] in ("lcel", "xcel"):
                col_span += 1
                cc += 1
            # rowspan: ucel/xcel below in this column
            row_span = 1
            rr = r + 1
            while rr < len(rows) and c < len(rows[rr]) and rows[rr][c] in (
                "ucel",
                "xcel",
            ):
                row_span += 1
                rr += 1
            cells.append(
                {
                    "cell_id": cell_id,
                    "start_row": r,
                    "end_row": r + row_span,
                    "start_col": c,
                    "end_col": c + col_span,
                    "row_span": row_span,
                    "col_span": col_span,
                    "col_header": tag == "ched",
                    "row_header": tag == "rhed",
                    "row_section": tag == "srow",
                    "empty": tag == "ecel",
                }
            )
            cell_id += 1
    return cells


def sync_bboxes(otsl_seq: list[str], bboxes: list) -> tuple[bool, list]:
    """Tag/bbox desync check (tf_predictor.py:237-279).

    One bbox is expected per cell-origin token; surplus bboxes are
    dropped from the tail, deficits pad with None so downstream
    matching skips them.
    """
    expected = sum(1 for t in otsl_seq if t in CELL_TAGS)
    if len(bboxes) == expected:
        return True, list(bboxes)
    if len(bboxes) > expected:
        return False, list(bboxes)[:expected]
    return False, list(bboxes) + [None] * (expected - len(bboxes))


def match_tokens_to_cells(
    cell_boxes: np.ndarray,
    token_boxes: np.ndarray,
    threshold: float = MATCH_IOPDF_THRESHOLD,
) -> list[int]:
    """Per pdf-token argmax intersection-over-pdf-area join
    (tf_cell_matcher.py:444-497).

    cell_boxes: (T,4), token_boxes: (P,4), both TOPLEFT page coords.
    Returns, per token, the matched cell index or -1.
    """
    if len(token_boxes) == 0 or len(cell_boxes) == 0:
        return [-1] * len(token_boxes)
    tb = np.asarray(token_boxes, np.float64)
    cb = np.asarray(cell_boxes, np.float64)
    iw = np.maximum(
        0.0,
        np.minimum(tb[:, None, 2], cb[None, :, 2])
        - np.maximum(tb[:, None, 0], cb[None, :, 0]),
    )
    ih = np.maximum(
        0.0,
        np.minimum(tb[:, None, 3], cb[None, :, 3])
        - np.maximum(tb[:, None, 1], cb[None, :, 1]),
    )
    inter = iw * ih
    tok_area = np.maximum(
        (tb[:, 2] - tb[:, 0]) * (tb[:, 3] - tb[:, 1]), 1e-6
    )
    iopdf = inter / tok_area[:, None]
    best = np.argmax(iopdf, axis=1)
    best_val = iopdf[np.arange(len(tb)), best]
    return np.where(best_val >= threshold, best, -1).astype(int).tolist()


def compact_indexes(cells: list[TableCell]) -> tuple[int, int]:
    """Remap start_row/col to contiguous 0..K-1 in place; return
    (num_rows, num_cols) (tf_predictor.py:584-623)."""
    start_cols = sorted({c["start_col"] for c in cells})
    start_rows = sorted({c["start_row"] for c in cells})
    col_map = {v: i for i, v in enumerate(start_cols)}
    row_map = {v: i for i, v in enumerate(start_rows)}
    max_c = 0
    max_r = 0
    for c in cells:
        c["start_col"] = col_map[c["start_col"]]
        c["end_col"] = c["start_col"] + c["col_span"]
        max_c = max(max_c, c["end_col"])
        c["start_row"] = row_map[c["start_row"]]
        c["end_row"] = c["start_row"] + c["row_span"]
        max_r = max(max_r, c["end_row"])
    return max_r, max_c


def build_table(
    otsl_seq: list[str],
    cell_bboxes: list | None,
    tokens: list[dict],
    compact: bool = True,
    matcher: str = "postprocess",
) -> dict[str, Any]:
    """Full table build: OTSL parse + bbox sync + token match + text.

    ``tokens``: word dicts {id, text, bbox:{l,t,r,b}} from the word
    index (reference wire format, table_structure_model.py:190-214).
    Matched tokens are attached to cells sorted by token id; each
    cell's text is the space-join of its token texts (response
    generation, tf_predictor.py:981-1076 / 379-435).

    matcher="postprocess" (default, the reference's actual path) runs
    the 9-step matching post-processor (kernels/matching_post.py);
    "argmax" is the plain one-shot IOPDF argmax join (J3 only).
    """
    cells = parse_otsl(otsl_seq)
    bboxes: list = [None] * len(cells)
    if cell_bboxes is not None:
        _, bboxes = sync_bboxes(otsl_seq, cell_bboxes)

    if matcher == "postprocess":
        return _build_with_postprocess(otsl_seq, cells, bboxes, tokens, compact)

    cell_boxes = np.array(
        [bb if bb is not None else (0.0, 0.0, 0.0, 0.0) for bb in bboxes],
        dtype=np.float64,
    ).reshape(len(cells), 4) if cells else np.zeros((0, 4))
    matchable = np.array(
        [bb is not None for bb in bboxes], dtype=bool
    ) if cells else np.zeros((0,), bool)

    token_boxes = np.array(
        [
            (tk["bbox"]["l"], tk["bbox"]["t"], tk["bbox"]["r"], tk["bbox"]["b"])
            for tk in tokens
        ],
        dtype=np.float64,
    ).reshape(len(tokens), 4)

    assign = match_tokens_to_cells(cell_boxes, token_boxes)
    per_cell: dict[int, list[dict]] = {}
    for tk, cell_ix in zip(tokens, assign):
        if cell_ix < 0 or not matchable[cell_ix]:
            continue
        per_cell.setdefault(cell_ix, []).append(tk)

    for ix, cell in enumerate(cells):
        toks = sorted(per_cell.get(ix, []), key=lambda t: t["id"])
        cell["text"] = " ".join(t["text"] for t in toks)
        bb = bboxes[ix]
        cell["bbox"] = tuple(float(v) for v in bb) if bb is not None else None

    return _finish_table(otsl_seq, cells, compact)


def _finish_table(
    otsl_seq: list[str], cells: list[TableCell], compact: bool
) -> dict[str, Any]:
    if compact:
        num_rows, num_cols = compact_indexes(cells)
    else:
        rows = _otsl_rows(otsl_seq)
        num_rows = len(rows)
        num_cols = len(rows[0]) if rows else 0
    return {
        "num_rows": num_rows,
        "num_cols": num_cols,
        "otsl_seq": list(otsl_seq),
        "cells": cells,
    }


def _build_with_postprocess(
    otsl_seq: list[str],
    cells: list[TableCell],
    bboxes: list,
    tokens: list[dict],
    compact: bool,
) -> dict[str, Any]:
    """Reference path: CellMatcher + 9-step MatchingPostProcessor
    (tf_predictor.py:467-630 drive loop)."""
    from .matching_post import process_matches

    # reference wire format (matching_details): structural table cells
    # carry (cell_id, row_id, column_id, bbox, cell_class, span vals)
    table_cells = []
    for cell, bb in zip(cells, bboxes):
        if bb is None:
            continue
        tc = {
            "cell_id": cell["cell_id"],
            "row_id": cell["start_row"],
            "column_id": cell["start_col"],
            "bbox": [float(v) for v in bb],
            "label": "body",
            "cell_class": 1 if cell["empty"] else 2,
        }
        if cell["row_span"] > 1:
            tc["rowspan_val"] = cell["row_span"]
        if cell["col_span"] > 1:
            tc["colspan_val"] = cell["col_span"]
        table_cells.append(tc)

    pdf_cells = [
        {
            "id": tk["id"],
            "text": tk["text"],
            "bbox": [
                float(tk["bbox"]["l"]),
                float(tk["bbox"]["t"]),
                float(tk["bbox"]["r"]),
                float(tk["bbox"]["b"]),
            ],
        }
        for tk in tokens
    ]

    # orphan-created ids must not collide with ANY parsed cell id —
    # including cells excluded from matching for having no bbox
    next_free = max((c["cell_id"] for c in cells), default=-1) + 1
    out_cells, matches = process_matches(
        table_cells, pdf_cells, min_free_cell_id=next_free
    )

    # tokens per final table cell, joined in token-id order
    tok_by_id = {tk["id"]: tk for tk in tokens}
    per_cell: dict[int, list[dict]] = {}
    for pdf_key, lst in matches.items():
        tk = tok_by_id.get(int(pdf_key))
        if tk is None:
            continue
        for m in lst:
            per_cell.setdefault(int(m["table_cell_id"]), []).append(tk)

    by_parse_id = {c["cell_id"]: c for c in cells}
    final_cells: list[TableCell] = []
    # structural cells without a bbox (sync deficit) never entered the
    # matcher but stay in the grid with empty text — same contract as
    # the argmax path; without this the surviving columns shift left
    matched_ids = {c["cell_id"] for c in out_cells}
    for cell, bb in zip(cells, bboxes):
        if bb is None and cell["cell_id"] not in matched_ids:
            kept = dict(cell)
            kept["text"] = ""
            kept["bbox"] = None
            final_cells.append(kept)
    for tc in sorted(out_cells, key=lambda c: c["cell_id"]):  # O4 order
        base = by_parse_id.get(tc["cell_id"])
        if base is None:
            # orphan-created structural cell (step 9c)
            base = {
                "cell_id": tc["cell_id"],
                "start_row": tc["row_id"],
                "end_row": tc["row_id"] + 1,
                "start_col": tc["column_id"],
                "end_col": tc["column_id"] + 1,
                "row_span": 1,
                "col_span": 1,
                "col_header": False,
                "row_header": False,
                "row_section": False,
                "empty": False,
            }
        toks = sorted(
            per_cell.get(tc["cell_id"], []), key=lambda t: t["id"]
        )
        base["text"] = " ".join(t["text"] for t in toks)
        base["bbox"] = tuple(float(v) for v in tc["bbox"])
        final_cells.append(base)

    final_cells.sort(key=lambda c: c["cell_id"])  # O4 order overall
    return _finish_table(otsl_seq, final_cells, compact)


def table_to_text(table: dict[str, Any]) -> str:
    """Table -> text lines: rows joined by newline, cells by tab,
    spanned cells emitted once at their origin."""
    grid: dict[int, dict[int, str]] = {}
    for cell in table["cells"]:
        grid.setdefault(cell["start_row"], {})[cell["start_col"]] = cell.get(
            "text", ""
        )
    lines: list[str] = []
    for r in range(table["num_rows"]):
        row = grid.get(r, {})
        lines.append("\t".join(row[c] for c in sorted(row)))
    return "\n".join(lines)
