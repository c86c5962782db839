"""Unit tests for the 9-step table matching post-processor
(kernels/matching_post.py vs reference matching_post_processor.py)."""

import numpy as np

from high_performance_docling_ray.kernels.matching_post import (
    align_cells_to_pdf,
    deduplicate_columns,
    final_assignment,
    find_alignment,
    good_bad_in_column,
    intersection_over_pdf_match,
    median_pos_size,
    move_cells_to_median,
    pick_orphan_cells,
    process_matches,
    resolve_overlaps,
    table_dimension,
)


def _cell(cid, row, col, bbox, cls=2, **kw):
    out = {
        "cell_id": cid, "row_id": row, "column_id": col,
        "bbox": list(bbox), "label": "body", "cell_class": cls,
    }
    out.update(kw)
    return out


def _pdf(pid, bbox, text="w"):
    return {"id": pid, "bbox": list(bbox), "text": text}


def test_table_dimension():
    cells = [_cell(0, 0, 0, (0, 0, 1, 1)), _cell(7, 2, 3, (0, 0, 1, 1))]
    assert table_dimension(cells) == (4, 3, 7)
    assert table_dimension([]) == (2, 2, 0)  # min 1x1 -> +1 each


def test_intersection_match_argmax_threshold():
    cells = [
        _cell(0, 0, 0, (0, 0, 10, 10)),
        _cell(1, 0, 1, (10, 0, 20, 10)),
    ]
    pdfs = [
        _pdf(5, (1, 1, 9, 9)),       # inside cell 0
        _pdf(6, (11, 1, 19, 9)),     # inside cell 1
        _pdf(7, (100, 100, 101, 101)),  # no overlap
    ]
    m = intersection_over_pdf_match(cells, pdfs)
    assert m["5"][0]["table_cell_id"] == 0
    assert m["6"][0]["table_cell_id"] == 1
    assert "7" not in m
    assert abs(m["5"][0]["iopdf"] - 1.0) < 1e-9


def test_good_bad_and_alignment_and_median():
    cells = [
        _cell(0, 0, 0, (10, 0, 30, 10)),
        _cell(1, 1, 0, (10, 20, 28, 30)),
        _cell(2, 2, 0, (50, 40, 60, 50)),  # stray right cell, no match
        _cell(3, 0, 1, (100, 0, 120, 10)),
    ]
    matches = {"1": [{"table_cell_id": 0, "iopdf": 0.9}],
               "2": [{"table_cell_id": 1, "iopdf": 0.8}]}
    good, bad = good_bad_in_column(cells, 0, matches)
    assert [c["cell_id"] for c in good] == [0, 1]
    assert [c["cell_id"] for c in bad] == [2]
    # lefts are 10,10 -> delta 0 -> left alignment
    assert find_alignment(good) == "left"
    mx, _my, mw, mh = median_pos_size(good, "left")
    assert mx == 10.0
    assert mw == np.median([20, 18])
    moved = move_cells_to_median(bad, mx, False, mw, mh, "left")
    assert moved[0]["bbox"][0] == 10.0  # slid to the median left edge
    assert moved[0]["bbox"][2] == 20.0  # width preserved (no rescale)


def test_empty_and_span_cells_excluded_from_median():
    cells = [
        _cell(0, 0, 0, (10, 0, 30, 10)),
        _cell(1, 1, 0, (0, 20, 100, 30), colspan_val=3),  # span: excluded
        _cell(2, 2, 0, (90, 40, 95, 50), cls=1),          # empty: excluded
    ]
    mx, _, mw, _ = median_pos_size(cells, "left")
    assert mx == 10.0 and mw == 20.0


def test_deduplicate_adjacent_columns():
    # two columns whose matches point at the same pdf cells -> drop the
    # lower-scoring one
    cells = [
        _cell(0, 0, 0, (0, 0, 10, 10)),
        _cell(1, 0, 1, (1, 0, 11, 10)),
        _cell(2, 0, 2, (20, 0, 30, 10)),
    ]
    ioc = {
        "5": [{"table_cell_id": 0, "iopdf": 0.9},
              {"table_cell_id": 1, "iopdf": 0.4}],
        "6": [{"table_cell_id": 2, "iopdf": 0.8}],
    }
    new_cells, new_matches, n_cols = deduplicate_columns(3, cells, {}, ioc)
    kept = {c["cell_id"] for c in new_cells}
    assert kept == {0, 2}       # column 1 (score 0.4) eliminated
    assert n_cols == 2
    assert all(
        m["table_cell_id"] != 1 for lst in new_matches.values() for m in lst
    )


def test_final_assignment_keeps_max():
    ioc = {"9": [{"table_cell_id": 1, "iopdf": 0.2},
                 {"table_cell_id": 2, "iopdf": 0.7}]}
    out = final_assignment(ioc)
    assert out["9"] == [{"table_cell_id": 2, "iopdf": 0.7}]


def test_align_cells_to_pdf_merges_and_drops():
    cells = [
        _cell(0, 0, 0, (0, 0, 50, 10)),
        _cell(1, 0, 1, (60, 0, 90, 10)),  # unmatched -> dropped
    ]
    pdfs = [_pdf(5, (2, 1, 20, 9)), _pdf(6, (25, 1, 45, 9))]
    matches = {"5": [{"table_cell_id": 0, "iopdf": 1.0}],
               "6": [{"table_cell_id": 0, "iopdf": 1.0}]}
    out = align_cells_to_pdf(cells, pdfs, matches)
    assert len(out) == 1
    assert out[0]["cell_id"] == 0
    assert out[0]["bbox"] == [2, 1, 45, 9]  # union of matched pdf boxes


def test_orphan_pickup_creates_cell():
    cells = [
        _cell(0, 0, 0, (0, 0, 20, 10)),
        _cell(1, 1, 0, (0, 20, 20, 30)),
        _cell(2, 0, 1, (30, 0, 50, 10)),
        # (row 1, col 1) intentionally missing
    ]
    pdfs = [_pdf(9, (32, 21, 48, 29), text="orphan")]
    matches = {}
    new_matches, new_cells, max_id = pick_orphan_cells(
        2, 2, 2, cells, pdfs, matches
    )
    assert max_id == 3
    created = [c for c in new_cells if c["cell_id"] == 3]
    assert created and created[0]["row_id"] == 1 and created[0]["column_id"] == 1
    assert new_matches["9"][0]["table_cell_id"] == 3


def test_orphan_merges_into_existing_cell():
    cells = [
        _cell(0, 0, 0, (0, 0, 20, 10)),
        _cell(1, 1, 0, (0, 20, 20, 30)),
    ]
    pdfs = [_pdf(4, (2, 21, 25, 29), text="x")]
    new_matches, new_cells, _ = pick_orphan_cells(2, 1, 1, cells, pdfs, {})
    target = [c for c in new_cells if c["cell_id"] == 1][0]
    assert target["bbox"] == [0, 20, 25, 30]  # merged with orphan bbox
    assert new_matches["4"][0]["table_cell_id"] == 1


def test_resolve_overlaps_pushes_apart():
    cells = [
        _cell(0, 0, 0, [0, 0, 12, 10]),
        _cell(1, 0, 1, [8, 0, 20, 10]),
    ]
    out = resolve_overlaps(cells)
    b0, b1 = out[0]["bbox"], out[1]["bbox"]
    assert b0[2] <= b1[0]  # no horizontal overlap remains


def test_process_end_to_end_deterministic():
    cells = [
        _cell(0, 0, 0, (0, 0, 20, 10)),
        _cell(1, 0, 1, (30, 0, 50, 10)),
        _cell(2, 1, 0, (0, 20, 20, 30)),
        _cell(3, 1, 1, (30, 20, 50, 30)),
    ]
    pdfs = [
        _pdf(0, (1, 1, 19, 9), "a"),
        _pdf(1, (31, 1, 49, 9), "b"),
        _pdf(2, (1, 21, 19, 29), "c"),
        _pdf(3, (31, 21, 49, 29), "d"),
    ]
    c1, m1 = process_matches([dict(c) for c in cells], list(pdfs))
    c2, m2 = process_matches([dict(c) for c in cells], list(pdfs))
    assert c1 == c2 and m1 == m2
    # every pdf cell assigned to exactly one table cell
    assert {int(k) for k in m1} == {0, 1, 2, 3}
    assert all(len(v) == 1 for v in m1.values())


def test_good_cells_weighted_per_match_occurrence():
    # reference (_get_good_bad_cells_in_column :94-110) appends a good
    # cell once PER match entry, so a 3-match cell weights the step-3
    # medians 3x (ADVICE r1 scenario: ref medians (0,0,10,10))
    cells = [
        _cell(1, 0, 0, (0.0, 0.0, 10.0, 10.0)),
        _cell(2, 1, 0, (4.0, 18.0, 28.0, 26.0)),
    ]
    matches = {
        "10": [{"table_cell_id": 1, "iopdf": 0.9}],
        "11": [{"table_cell_id": 1, "iopdf": 0.8}],
        "12": [{"table_cell_id": 1, "iopdf": 0.7}],
        "13": [{"table_cell_id": 2, "iopdf": 0.9}],
    }
    good, bad = good_bad_in_column(cells, 0, matches)
    assert [c["cell_id"] for c in good] == [1, 1, 1, 2]
    assert bad == []
    assert good[0] is good[1] is good[2]  # same dict object, like the ref
    al = find_alignment(good)
    assert median_pos_size(good, al) == (0.0, 0.0, 10.0, 10.0)


def test_resolve_overlaps_distinct_cells_sharing_bbox():
    # two DISTINCT cells that share one bbox (after step-8a alignment
    # to the same pdf cell) must still be pushed apart — the reference
    # compares whole cell dicts (:463), not bboxes
    a = _cell(0, 0, 0, (0, 0, 10, 10))
    b = _cell(1, 0, 1, (0, 0, 10, 10))
    out = resolve_overlaps([a, b])
    assert out[0]["bbox"] != out[1]["bbox"]
    # true duplicates (equal dicts) are skipped untouched
    c = _cell(2, 0, 0, (0, 0, 10, 10))
    d = _cell(2, 0, 0, (0, 0, 10, 10))
    out2 = resolve_overlaps([c, d])
    assert out2[0]["bbox"] == [0, 0, 10, 10] == out2[1]["bbox"]
