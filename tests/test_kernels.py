"""Unit tests: bbox algebra, layout rules, table rules, word index."""

import numpy as np

from high_performance_docling_ray.kernels import labels as L
from high_performance_docling_ray.kernels.bbox import (
    clip_to_page,
    cxcywh_to_xyxy,
    iou_matrix,
    overlap_pair,
    xyxy_to_cxcywh,
)
from high_performance_docling_ray.kernels.layout_rules import (
    CellArrays,
    postprocess_page,
)
from high_performance_docling_ray.kernels.table_rules import (
    build_table,
    compact_indexes,
    match_tokens_to_cells,
    otsl_is_square,
    otsl_to_html,
    parse_otsl,
    sync_bboxes,
    table_to_text,
)
from high_performance_docling_ray.kernels.word_index import WordIndex


def _cell(i, text, l, t, r, b, conf=1.0):
    return {"index": i, "text": text, "l": l, "t": t, "r": r, "b": b,
            "from_ocr": False, "confidence": conf}


def _cluster(cid, label, l, t, r, b, conf):
    return {"id": cid, "label": label, "bbox": (l, t, r, b), "confidence": conf}


# -- bbox ------------------------------------------------------------------

def test_bbox_roundtrip():
    boxes = np.array([[10.0, 20.0, 30.0, 60.0]])
    assert np.allclose(cxcywh_to_xyxy(xyxy_to_cxcywh(boxes)), boxes)


def test_iou_matrix():
    a = np.array([[0.0, 0.0, 2.0, 2.0]])
    b = np.array([[1.0, 1.0, 3.0, 3.0], [10.0, 10.0, 11.0, 11.0]])
    m = iou_matrix(a, b)
    assert abs(m[0, 0] - 1.0 / 7.0) < 1e-9
    assert m[0, 1] == 0.0


def test_overlap_pair_containment():
    outer = (0.0, 0.0, 10.0, 10.0)
    inner = (1.0, 1.0, 4.0, 4.0)  # fully contained -> containment 1.0
    assert overlap_pair(outer, inner, 0.8, 0.8)
    far = (20.0, 20.0, 30.0, 30.0)
    assert not overlap_pair(outer, far, 0.8, 0.8)


def test_clip_to_page():
    out = clip_to_page(np.array([[-5.0, -1.0, 700.0, 800.0]]), 612.0, 792.0)
    assert out.tolist() == [[0.0, 0.0, 612.0, 792.0]]


# -- layout postprocess ----------------------------------------------------

def test_confidence_filter_and_remap():
    cells = CellArrays([_cell(0, "hello world", 10, 10, 100, 20)])
    clusters = [
        _cluster(0, "title", 5, 5, 105, 25, 0.85),       # above 0.45 -> kept+remapped
        _cluster(1, "text", 5, 5, 105, 25, 0.2),          # below 0.5 -> dropped
    ]
    out = postprocess_page(clusters, cells, 612, 792)
    assert len(out) == 1
    assert out[0]["label"] == L.SECTION_HEADER
    assert out[0]["cells"] == [0]


def test_orphan_promotion():
    cells = CellArrays(
        [_cell(0, "covered", 10, 10, 100, 20), _cell(1, "orphan", 300, 300, 380, 312)]
    )
    clusters = [_cluster(0, "text", 5, 5, 105, 25, 0.9)]
    out = postprocess_page(clusters, cells, 612, 792)
    labels = [(c["label"], c["cells"]) for c in out]
    assert ("text", [0]) in labels
    orphans = [c for c in out if c["cells"] == [1]]
    assert len(orphans) == 1 and orphans[0]["label"] == L.TEXT
    assert orphans[0]["id"] == 1  # max(id)+1


def test_empty_cluster_dropped_formula_kept():
    cells = CellArrays([_cell(0, "x", 10, 10, 20, 20)])
    clusters = [
        _cluster(0, "text", 200, 200, 300, 300, 0.9),    # empty -> dropped
        _cluster(1, "formula", 400, 400, 500, 500, 0.9),  # empty formula -> kept
    ]
    out = postprocess_page(clusters, cells, 612, 792, create_orphan_clusters=False)
    assert [c["label"] for c in out] == [L.FORMULA]


def test_overlap_merge():
    cells = CellArrays([_cell(0, "a b c", 10, 10, 100, 20)])
    clusters = [
        _cluster(0, "text", 9, 9, 101, 21, 0.9),
        _cluster(1, "text", 10, 10, 100, 20, 0.6),  # near-identical -> merged
    ]
    out = postprocess_page(clusters, cells, 612, 792)
    assert len(out) == 1
    assert out[0]["cells"] == [0]


def test_full_page_picture_dropped():
    cells = CellArrays([])
    clusters = [
        _cluster(0, "picture", 0, 0, 600, 780, 0.95),  # >90% page -> dropped
        _cluster(1, "picture", 10, 10, 110, 110, 0.95),
    ]
    out = postprocess_page(clusters, cells, 612, 792)
    assert [c["id"] for c in out] == [1]


def test_wrapper_children_and_containment_removal():
    cells = CellArrays(
        [_cell(0, "k", 12, 12, 40, 20), _cell(1, "v", 50, 12, 90, 20)]
    )
    clusters = [
        _cluster(0, "text", 11, 11, 41, 21, 0.9),
        _cluster(1, "text", 49, 11, 91, 21, 0.9),
        _cluster(2, "key_value_region", 5, 5, 120, 30, 0.8),
    ]
    out = postprocess_page(clusters, cells, 612, 792)
    # the two regular clusters become children of the wrapper and leave
    # the top level (layout_postprocessor.py:379-388)
    assert len(out) == 1
    kv = out[0]
    assert kv["label"] == L.KEY_VALUE_REGION
    assert [c["id"] for c in kv["children"]] == [0, 1]
    assert kv["cells"] == [0, 1]
    # FORM/KV wrapper bbox refits to children extent (:516-523) — the
    # children's bboxes were already shrunk to their cells by the
    # regular path (:1009-1047), so the refit uses the shrunk extents.
    assert kv["bbox"] == (12.0, 12.0, 90.0, 20.0)


def test_cross_type_wrapper_vs_table():
    cells = CellArrays([_cell(0, "t", 12, 12, 90, 20)])
    clusters = [
        _cluster(0, "table", 10, 10, 100, 30, 0.9),
        _cluster(1, "key_value_region", 10, 10, 100, 30, 0.85),  # dup of table -> dropped
    ]
    out = postprocess_page(clusters, cells, 612, 792)
    assert [c["label"] for c in out] == [L.TABLE]


# -- table rules -----------------------------------------------------------

def test_otsl_square():
    assert otsl_is_square(["fcel", "fcel", "nl", "fcel", "fcel", "nl"])
    assert not otsl_is_square(["fcel", "fcel", "nl", "fcel", "nl"])


def test_parse_otsl_spans():
    # 2x3: header row; second row has a cell spanning cols 1-2
    seq = ["ched", "ched", "ched", "nl", "fcel", "fcel", "lcel", "nl"]
    cells = parse_otsl(seq)
    assert len(cells) == 5
    span = cells[-1]
    assert span["col_span"] == 2 and span["start_col"] == 1 and span["end_col"] == 3
    assert cells[0]["col_header"] and not cells[3]["col_header"]


def test_parse_otsl_rowspan():
    seq = ["fcel", "fcel", "nl", "ucel", "fcel", "nl"]
    cells = parse_otsl(seq)
    assert cells[0]["row_span"] == 2 and cells[0]["end_row"] == 2
    assert len(cells) == 3


def test_otsl_to_html_counts():
    seq = ["ched", "ched", "nl", "fcel", "lcel", "nl"]
    html = otsl_to_html(seq)
    # 3 cells total: two plain <td>, one with colspan attr + ">"
    assert html.count("<td>") == 2
    assert html.count(">") >= 1


def test_sync_bboxes():
    seq = ["fcel", "fcel", "nl"]
    ok, bb = sync_bboxes(seq, [[0, 0, 1, 1], [1, 0, 2, 1]])
    assert ok and len(bb) == 2
    ok, bb = sync_bboxes(seq, [[0, 0, 1, 1], [1, 0, 2, 1], [9, 9, 9, 9]])
    assert not ok and len(bb) == 2  # surplus dropped
    ok, bb = sync_bboxes(seq, [[0, 0, 1, 1]])
    assert not ok and bb[1] is None  # deficit padded


def test_match_tokens_argmax():
    cells = np.array([[0, 0, 10, 10], [10, 0, 20, 10]], float)
    toks = np.array([[1, 1, 5, 5], [11, 2, 18, 8], [100, 100, 105, 105]], float)
    assert match_tokens_to_cells(cells, toks) == [0, 1, -1]


def test_compact_indexes():
    cells = [
        {"start_row": 0, "end_row": 1, "start_col": 2, "end_col": 3,
         "row_span": 1, "col_span": 1},
        {"start_row": 5, "end_row": 6, "start_col": 7, "end_col": 8,
         "row_span": 1, "col_span": 1},
    ]
    nr, nc = compact_indexes(cells)
    assert (nr, nc) == (2, 2)
    assert cells[1]["start_row"] == 1 and cells[1]["start_col"] == 1


def test_build_table_text():
    seq = ["ched", "ched", "nl", "fcel", "fcel", "nl"]
    bboxes = [[0, 0, 10, 10], [10, 0, 20, 10], [0, 10, 10, 20], [10, 10, 20, 20]]
    tokens = [
        {"id": 0, "text": "h1", "bbox": {"l": 1, "t": 1, "r": 5, "b": 5}},
        {"id": 1, "text": "h2", "bbox": {"l": 11, "t": 1, "r": 15, "b": 5}},
        {"id": 2, "text": "a", "bbox": {"l": 1, "t": 11, "r": 5, "b": 15}},
        {"id": 3, "text": "b", "bbox": {"l": 11, "t": 11, "r": 15, "b": 15}},
    ]
    tbl = build_table(seq, bboxes, tokens)
    assert tbl["num_rows"] == 2 and tbl["num_cols"] == 2
    assert table_to_text(tbl) == "h1\th2\na\tb"


# -- word index ------------------------------------------------------------

def test_word_index_query():
    words = [
        _cell(0, "in", 10, 10, 20, 20),
        _cell(1, "out", 200, 200, 220, 210),
        _cell(2, "  ", 12, 12, 18, 18),  # whitespace-only: dropped at pack
    ]
    idx = WordIndex.from_cells(words, 612, 792)
    toks = idx.query_tokens(5, 5, 30, 30)
    assert [t["text"] for t in toks] == ["in"]
    assert toks[0]["id"] == 0


# -- vectorized merge predicate / fast median (bit-identity pins) ----------

def test_overlap_merge_matrix_matches_scalar():
    from high_performance_docling_ray.kernels.bbox import (
        overlap_merge_matrix,
        overlap_pair,
    )

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 24))
        boxes = rng.uniform(0, 100, size=(n, 4))
        # mix in degenerate/empty boxes (r<l, b<t, zero-area)
        flip = rng.random(n) < 0.3
        boxes[flip, 2] = boxes[flip, 0] - rng.uniform(0, 5, flip.sum())
        if n > 1:
            boxes[0, 2] = boxes[0, 0]  # zero width
        for eps in (0.0, 1e-3):
            mat = overlap_merge_matrix(boxes, 0.8, 0.8, eps)
            for i in range(n):
                for j in range(n):
                    expected = overlap_pair(
                        tuple(boxes[i]), tuple(boxes[j]), 0.8, 0.8, eps
                    )
                    assert mat[i, j] == expected, (trial, i, j, eps)


def test_fast_median_matches_numpy():
    from high_performance_docling_ray.kernels.matching_post import _median

    rng = np.random.default_rng(11)
    for n in range(1, 12):
        for _ in range(20):
            vals = list(rng.uniform(-1e4, 1e4, n))
            assert _median(vals) == float(np.median(vals)), (n, vals)
    assert _median([3.0]) == 3.0
    assert _median([1.0, 2.0]) == 1.5


def test_doc_confidence_matches_reference_math():
    """doc_confidence must reproduce the reference ConfidenceReport
    (base_models.py:397-459): page mean = nanmean of the 4 scores, page
    low = 5% nanquantile, doc mean/low = nanmean over pages, grade
    buckets <0.5/<0.8/<0.9/>=0.9 with NaN -> unspecified."""
    import warnings

    from high_performance_docling_ray.kernels.layout_rules import (
        doc_confidence,
        grade_score,
    )

    nan = float("nan")
    rng = np.random.default_rng(7)
    for _ in range(50):
        pages = []
        for _p in range(int(rng.integers(1, 5))):
            s = {}
            if rng.random() < 0.9:
                s["layout_score"] = float(rng.uniform(0.3, 1.0))
            if rng.random() < 0.7:
                s["ocr_score"] = float(rng.uniform(0.3, 1.0))
            pages.append(s)
        rep = doc_confidence(pages)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            means = [
                np.nanmean(
                    [
                        p.get("ocr_score", nan), nan,
                        p.get("layout_score", nan), nan,
                    ]
                )
                for p in pages
            ]
            lows = [
                np.nanquantile(
                    [
                        p.get("ocr_score", nan), nan,
                        p.get("layout_score", nan), nan,
                    ],
                    q=0.05,
                )
                for p in pages
            ]
            exp_mean = float(np.nanmean(means))
            exp_low = float(np.nanmean(lows))
        assert (rep["mean_score"] == exp_mean) or (
            np.isnan(rep["mean_score"]) and np.isnan(exp_mean)
        )
        assert (rep["low_score"] == exp_low) or (
            np.isnan(rep["low_score"]) and np.isnan(exp_low)
        )
    # grade buckets, incl. the NaN -> unspecified fall-through
    assert grade_score(0.49) == "poor"
    assert grade_score(0.5) == "fair"
    assert grade_score(0.79) == "fair"
    assert grade_score(0.8) == "good"
    assert grade_score(0.89) == "good"
    assert grade_score(0.9) == "excellent"
    assert grade_score(float("nan")) == "unspecified"
    # all-NaN pages and the empty doc produce unspecified grades
    assert doc_confidence([{}])["mean_grade"] == "unspecified"
    assert doc_confidence([])["low_grade"] == "unspecified"


def test_list_marker_normalization():
    """ListItemMarkerProcessor semantics (M24): bullets and enumerations
    strip into the marker field; non-markers and bare markers pass
    through untouched."""
    from high_performance_docling_ray.kernels.listmarker import (
        process_list_item,
    )

    assert process_list_item("- item one") == ("-", "item one", False)
    assert process_list_item("• bullet") == ("•", "bullet", False)
    assert process_list_item("*  spaced") == ("*", "spaced", False)
    assert process_list_item("1. first") == ("1.", "first", True)
    assert process_list_item("12) twelfth") == ("12)", "twelfth", True)
    assert process_list_item("(3) third") == ("(3)", "third", True)
    assert process_list_item("a. letter") == ("a.", "letter", True)
    assert process_list_item("(b) letter") == ("(b)", "letter", True)
    assert process_list_item("iv. roman") == ("iv.", "roman", True)
    assert process_list_item("(xii) roman") == ("(xii)", "roman", True)
    # no marker / degenerate cases stay untouched
    assert process_list_item("plain text") == ("", "plain text", False)
    assert process_list_item("-no space") == ("", "-no space", False)
    assert process_list_item("- ") == ("", "- ", False)
    assert process_list_item("1776 was a year") == (
        "", "1776 was a year", False,
    )
    assert process_list_item("") == ("", "", False)
