"""Layout post-processing rules: the reference's cluster-cleanup engine.

Re-implements the semantics of
`/root/reference/fork/layout/layout_postprocessor.py` (LayoutPostprocessor)
on plain data: cells are a struct-of-arrays batch, clusters are dicts.
All joins here are *within one page* (reference has no distributed
joins — SURVEY.md §2.4), so this kernel runs inside ``map_batches``.

Pipeline per page (layout_postprocessor.py:368-406):
  regular clusters:  confidence filter -> label remap -> cell assignment
                     (IoS > 0.2 spatial join) -> empty filter -> orphan
                     promotion -> iterative refine (bbox shrink + union-
                     find overlap merge, <=3 rounds)
  special clusters:  confidence filter -> cross-type overlap removal ->
                     full-page picture filter -> child containment
                     (IoS > 0.8) -> per-class overlap merge
  finalize:          drop regulars swallowed by wrappers, stable sort by
                     (first_cell_index, top, left), cells sorted by index
"""

from __future__ import annotations

import sys
from collections import defaultdict
from typing import Any

import numpy as np

from . import labels as L
from .bbox import overlap_merge_matrix, overlap_pair

Cluster = dict[str, Any]  # {id,label,bbox:(l,t,r,b),confidence,cells:[int],children:[Cluster]}

MIN_CELL_OVERLAP = 0.2          # layout_postprocessor.py:900
CHILD_CONTAINMENT = 0.8         # :508
FULL_PAGE_PICTURE_AREA = 0.90   # :499
CROSS_TYPE_OVERLAP = 0.9        # :571
CROSS_TYPE_CONF_DIFF = 0.1      # :571
MERGE_OVERLAP_THRESHOLD = 0.8   # :657-659
MERGE_CONTAINMENT_THRESHOLD = 0.8


class CellArrays:
    """Struct-of-arrays view over a page's text cells."""

    __slots__ = ("index", "text", "l", "t", "r", "b", "confidence",
                 "from_ocr", "valid", "area", "n")

    def __init__(self, cells: list[dict]) -> None:
        n = len(cells)
        self.n = n
        self.index = np.fromiter((c["index"] for c in cells), np.int64, n)
        self.text = [c["text"] for c in cells]
        self.l = np.fromiter((c["l"] for c in cells), np.float64, n)
        self.t = np.fromiter((c["t"] for c in cells), np.float64, n)
        self.r = np.fromiter((c["r"] for c in cells), np.float64, n)
        self.b = np.fromiter((c["b"] for c in cells), np.float64, n)
        self.confidence = np.fromiter(
            (c.get("confidence", 1.0) for c in cells), np.float64, n
        )
        self.from_ocr = np.fromiter(
            (bool(c.get("from_ocr", False)) for c in cells), np.bool_, n
        )
        self.area = np.maximum(0.0, self.r - self.l) * np.maximum(
            0.0, self.b - self.t
        )
        # A cell participates when it has text and positive area
        # (layout_postprocessor.py:349-357).
        has_text = np.fromiter(
            (bool(tx and tx.strip()) for tx in self.text), np.bool_, n
        )
        self.valid = has_text & (self.area > 0.0)


def _bbox_area(bb: tuple[float, float, float, float]) -> float:
    return max(0.0, bb[2] - bb[0]) * max(0.0, bb[3] - bb[1])


def _ios(inner: tuple, outer: tuple) -> float:
    iw = min(inner[2], outer[2]) - max(inner[0], outer[0])
    ih = min(inner[3], outer[3]) - max(inner[1], outer[1])
    if iw <= 0.0 or ih <= 0.0:
        return 0.0
    a = _bbox_area(inner)
    return (iw * ih) / a if a > 0.0 else 0.0


def _first_cell_index(cluster: Cluster, cells: CellArrays) -> int:
    """STICKY first-cell index, like the reference's Cluster private
    attr (base_models.py:153, layout_postprocessor.py:905-985): set
    once at initial cell ASSIGNMENT and never updated — orphan and
    special clusters keep sys.maxsize even though they carry cells, so
    they sort after assigned clusters in every mode="id" sort
    (pinned by tests/test_differential_reference.py)."""
    _ = cells
    return cluster.get("_fci", sys.maxsize)


def _dedup_cell_rows(rows: list[int], cells: CellArrays) -> list[int]:
    """Unique by cell.index, first occurrence wins (layout_postprocessor.py:876-897)."""
    seen: set[int] = set()
    out: list[int] = []
    for i in rows:
        key = int(cells.index[i])
        if key not in seen:
            seen.add(key)
            out.append(i)
    return out


def _sort_cell_rows(rows: list[int], cells: CellArrays) -> list[int]:
    """Native reading order: by cell.index (layout_postprocessor.py:1049-1051)."""
    return sorted(rows, key=lambda i: int(cells.index[i]))


def _grid_ranges(lo: float, hi: float, bin_sz: float, n: int) -> range:
    """GridIndex._ix_range/_iy_range (layout_postprocessor.py:186-198)."""
    i0 = int(lo / bin_sz)
    i1 = int(max(hi - 1e-9, lo) / bin_sz)
    i0 = max(0, min(i0, n - 1))
    i1 = max(0, min(i1, n - 1))
    return range(i0, i1 + 1)


def assign_cells_to_clusters(
    clusters: list[Cluster],
    cells: CellArrays,
    min_overlap: float = MIN_CELL_OVERLAP,
    page_w: float | None = None,
    page_h: float | None = None,
) -> None:
    """Spatial join: each valid cell -> best-overlap cluster (IoS > 0.2).

    Faithful port of the reference scan (layout_postprocessor.py:899-993)
    INCLUDING its two behavior-relevant quirks, pinned by
    tests/test_differential_reference.py:

    * candidates accumulate into a python SET from the GridIndex bins,
      and the scan takes the FIRST candidate in set-iteration order
      that reaches overlap >= 0.95 (early break) — when two clusters
      both cover a cell, which one wins depends on that order, so the
      grid build (median bin sizing, insert order) mirrors the
      reference exactly;
    * otherwise strictly-greater overlap wins, ties keep the earlier
      candidate.
    """
    for cl in clusters:
        cl["cells"] = []
        cl.pop("_fci", None)  # reference resets to maxsize (:906)
    if not clusters or cells.n == 0:
        return
    valid = np.nonzero(cells.valid)[0]
    if valid.size == 0:
        return

    boxes = {cl["id"]: tuple(map(float, cl["bbox"])) for cl in clusters}
    by_id = {cl["id"]: cl for cl in clusters}

    if page_w is None or page_h is None:  # fallback to cluster extents (:925-932)
        page_w = max(r for (_, _, r, _) in boxes.values()) - min(
            l for (l, _, _, _) in boxes.values()
        )
        page_h = max(b for (_, _, _, b) in boxes.values()) - min(
            t for (_, t, _, _) in boxes.values()
        )

    ws = sorted((r - l) for (l, t, r, b) in boxes.values() if r > l)
    hs = sorted((b - t) for (l, t, r, b) in boxes.values() if b > t)
    med_w = ws[len(ws) // 2] if ws else max(1.0, page_w / 12.0)
    med_h = hs[len(hs) // 2] if hs else max(1.0, page_h / 24.0)
    bin_w = max(max(page_w / 60.0, 1.5 * med_w), 1e-6)
    bin_h = max(max(page_h / 60.0, 1.5 * med_h), 1e-6)
    nx = max(1, int(page_w / bin_w))
    ny = max(1, int(page_h / bin_h))

    grid: dict[tuple[int, int], list[int]] = defaultdict(list)
    for cl in clusters:  # insert order = cluster list order (:944-946)
        l, t, r, b = boxes[cl["id"]]
        if r <= l or b <= t:
            continue
        for ix in _grid_ranges(l, r, bin_w, nx):
            for iy in _grid_ranges(t, b, bin_h, ny):
                if cl["id"] not in grid[(ix, iy)]:
                    grid[(ix, iy)].append(cl["id"])

    # vectorized bin ranges per cell (int() truncation == astype for
    # the nonnegative coords here), python-float views for the scan
    vl, vt = cells.l[valid], cells.t[valid]
    vr, vb = cells.r[valid], cells.b[valid]
    ix0s = np.clip((vl / bin_w).astype(np.int64), 0, nx - 1).tolist()
    ix1s = np.clip(
        (np.maximum(vr - 1e-9, vl) / bin_w).astype(np.int64), 0, nx - 1
    ).tolist()
    iy0s = np.clip((vt / bin_h).astype(np.int64), 0, ny - 1).tolist()
    iy1s = np.clip(
        (np.maximum(vb - 1e-9, vt) / bin_h).astype(np.int64), 0, ny - 1
    ).tolist()
    lxs, tys = vl.tolist(), vt.tolist()
    rxs, bys = vr.tolist(), vb.tolist()
    areas = cells.area[valid].tolist()
    grid_get = grid.get

    for k, row in enumerate(valid.tolist()):
        lx, ty, rx, by = lxs[k], tys[k], rxs[k], bys[k]
        ix0, ix1, iy0, iy1 = ix0s[k], ix1s[k], iy0s[k], iy1s[k]
        if ix0 == ix1 and iy0 == iy1:
            bin_ids = grid_get((ix0, iy0), ())
            # membership must stay set-exact (iteration order is
            # behavior-relevant), but a single bin needs no union
            cands = set(bin_ids)
        else:
            cands = set()
            for ix in range(ix0, ix1 + 1):
                for iy in range(iy0, iy1 + 1):
                    ids = grid_get((ix, iy))
                    if ids:
                        cands.update(ids)
        if not cands:
            continue
        cell_area = areas[k]
        if cell_area < 1e-6:
            cell_area = 1e-6  # kernels/bbox.py EPS
        best_overlap = min_overlap
        best_id = None
        for cid in cands:  # SET iteration order, like the reference
            l2, t2, r2, b2 = boxes[cid]
            if l2 >= rx or r2 <= lx or t2 >= by or b2 <= ty:
                continue
            iw = (rx if rx < r2 else r2) - (lx if lx > l2 else l2)
            ih = (by if by < b2 else b2) - (ty if ty > t2 else t2)
            overlap = (iw * ih) / cell_area if (iw > 0.0 and ih > 0.0) else 0.0
            if overlap > best_overlap:
                best_overlap = overlap
                best_id = cid
                if best_overlap >= 0.95:  # reference fast break (:979-981)
                    break
        if best_id is not None:
            by_id[best_id]["cells"].append(row)

    for cl in clusters:
        cl["cells"] = _dedup_cell_rows(cl["cells"], cells)
        # assignment-time first cell index (sticky; see _first_cell_index)
        if cl["cells"]:
            cl["_fci"] = int(min(cells.index[i] for i in cl["cells"]))


def adjust_cluster_bboxes(clusters: list[Cluster], cells: CellArrays) -> bool:
    """Shrink cluster bbox to its cells; TABLE unions with original
    (layout_postprocessor.py:1009-1047). Returns True when any moved."""
    changed = False
    for cl in clusters:
        rows = cl["cells"]
        if not rows:
            continue
        idx = np.asarray(rows, dtype=np.int64)
        nl = float(cells.l[idx].min())
        nt = float(cells.t[idx].min())
        nr = float(cells.r[idx].max())
        nb = float(cells.b[idx].max())
        if cl["label"] == L.TABLE:
            ol, ot, orr, ob = cl["bbox"]
            nl, nt = min(nl, ol), min(nt, ot)
            nr, nb = max(nr, orr), max(nb, ob)
        if (nl, nt, nr, nb) != tuple(cl["bbox"]):
            cl["bbox"] = (nl, nt, nr, nb)
            changed = True
    return changed


def _should_prefer(candidate: Cluster, other: Cluster, params: dict) -> bool:
    """Best-cluster preference rules (layout_postprocessor.py:585-619)."""
    if candidate["label"] == L.LIST_ITEM and other["label"] == L.TEXT:
        oa = _bbox_area(other["bbox"])
        if oa > 0.0 and abs(1 - _bbox_area(candidate["bbox"]) / oa) < 0.2:
            return True
    if candidate["label"] == L.CODE:
        if _ios(other["bbox"], candidate["bbox"]) > 0.8:
            return True
    oa = _bbox_area(other["bbox"])
    area_ratio = _bbox_area(candidate["bbox"]) / oa if oa > 0.0 else float("inf")
    conf_diff = other["confidence"] - candidate["confidence"]
    if area_ratio <= params["area_threshold"] and conf_diff > params["conf_threshold"]:
        return False
    return True


def _select_best(group: list[Cluster], params: dict) -> Cluster:
    """(layout_postprocessor.py:621-652)."""
    best: Cluster | None = None
    for cand in group:
        if any(
            other is not cand and not _should_prefer(cand, other, params)
            for other in group
        ):
            continue
        if best is None:
            best = cand
        elif (
            _bbox_area(cand["bbox"]) > _bbox_area(best["bbox"])
            and best["confidence"] - cand["confidence"] <= params["conf_threshold"]
        ):
            best = cand
    return best if best is not None else group[0]


class _UnionFind:
    def __init__(self, keys) -> None:
        self.parent = {k: k for k in keys}

    def find(self, x):
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra

    def groups(self) -> dict:
        out = defaultdict(list)
        for k in self.parent:
            out[self.find(k)].append(k)
        return out


def remove_overlapping_clusters(
    clusters: list[Cluster],
    cluster_class: str,
    cells: CellArrays,
    epsilon: float = 0.0,
) -> tuple[list[Cluster], bool]:
    """Union-find merge of overlapping clusters (layout_postprocessor.py:654-844).

    Pairs merge on IoU >= 0.8 or either-way containment >= 0.8; each
    group keeps the best cluster per the preference rules, absorbing the
    others' cells (dedup + index sort).
    """
    if not clusters:
        return [], False
    params = L.OVERLAP_PARAMS[cluster_class]
    order = {id(c): k for k, c in enumerate(clusters)}
    uf = _UnionFind([c["id"] for c in clusters])
    by_id = {c["id"]: c for c in clusters}
    n = len(clusters)
    if n > 6:
        # Vectorized pairwise predicate — bit-identical to overlap_pair
        # (see bbox.overlap_merge_matrix); wins from ~a handful of boxes.
        boxes = np.array([c["bbox"] for c in clusters], dtype=np.float64)
        mat = overlap_merge_matrix(
            boxes, MERGE_OVERLAP_THRESHOLD, MERGE_CONTAINMENT_THRESHOLD, epsilon
        )
        ids = [c["id"] for c in clusters]
        for i, j in zip(*np.nonzero(np.triu(mat, 1))):
            uf.union(ids[i], ids[j])
    else:
        items = [(c["id"], tuple(c["bbox"])) for c in clusters]
        for i in range(n):
            cid, bi = items[i]
            for j in range(i + 1, n):
                oid, bj = items[j]
                if overlap_pair(
                    bi, bj, MERGE_OVERLAP_THRESHOLD, MERGE_CONTAINMENT_THRESHOLD, epsilon
                ):
                    uf.union(cid, oid)

    result: list[Cluster] = []
    merged = False
    for group_ids in uf.groups().values():
        if len(group_ids) == 1:
            result.append(by_id[group_ids[0]])
            continue
        merged = True
        group = sorted(
            (by_id[g] for g in group_ids), key=lambda c: order[id(c)]
        )
        best = _select_best(group, params)
        for cl in group:
            if cl is not best:
                best["cells"].extend(cl["cells"])
        best["cells"] = _sort_cell_rows(
            _dedup_cell_rows(best["cells"], cells), cells
        )
        result.append(best)
    result.sort(key=lambda c: order[id(c)])
    return result, merged


def postprocess_page(
    raw_clusters: list[Cluster],
    cells: CellArrays,
    page_w: float,
    page_h: float,
    keep_empty_clusters: bool = False,
    create_orphan_clusters: bool = True,
    epsilon: float = 0.0,
) -> list[Cluster]:
    """Full page-level layout postprocess (layout_postprocessor.py:368-475).

    Input clusters need {id,label,bbox,confidence}; returns finalized
    clusters with assigned cell rows and children.
    """
    for cl in raw_clusters:
        cl.setdefault("cells", [])
        cl.setdefault("children", [])

    regular = [c for c in raw_clusters if c["label"] not in L.SPECIAL_TYPES]
    special = [c for c in raw_clusters if c["label"] in L.SPECIAL_TYPES]

    # --- regular path (:408-475) ---
    clusters = [
        c for c in regular if c["confidence"] >= L.CONFIDENCE_THRESHOLDS[c["label"]]
    ]
    for c in clusters:
        c["label"] = L.LABEL_REMAPPING.get(c["label"], c["label"])

    assign_cells_to_clusters(clusters, cells, page_w=page_w, page_h=page_h)

    if not keep_empty_clusters:
        clusters = [c for c in clusters if c["cells"] or c["label"] == L.FORMULA]

    if create_orphan_clusters:
        assigned = {row for c in clusters for row in c["cells"]}
        unassigned = [
            i for i in np.nonzero(cells.valid)[0].tolist() if i not in assigned
        ]
        if unassigned:
            next_id = max((c["id"] for c in raw_clusters), default=0) + 1
            for k, row in enumerate(unassigned):
                clusters.append(
                    {
                        "id": next_id + k,
                        "label": L.TEXT,
                        "bbox": (
                            float(cells.l[row]),
                            float(cells.t[row]),
                            float(cells.r[row]),
                            float(cells.b[row]),
                        ),
                        "confidence": float(cells.confidence[row]),
                        "cells": [row],
                        "children": [],
                    }
                )

    prev_count = len(clusters) + 1
    for _ in range(3):
        if prev_count == len(clusters):
            break
        prev_count = len(clusters)
        moved = adjust_cluster_bboxes(clusters, cells)
        clusters, merged = remove_overlapping_clusters(
            clusters, "regular", cells, epsilon
        )
        if not moved and not merged:
            break
    regular_final = clusters

    # --- special path (:477-548) ---
    # NOTE: the reference runs this AFTER the regular path and reads the
    # *processed* regular clusters (self.regular_clusters reassigned at
    # :372-376) — shrunk bboxes, orphans included, merges applied.
    specials = [
        c for c in special if c["confidence"] >= L.CONFIDENCE_THRESHOLDS[c["label"]]
    ]

    # Cross-type: wrapper ~ TABLE duplicate removal (:550-583). Regular
    # clusters can never carry the TABLE label (TABLE is special), so
    # this matches the reference's (vacuous) guard exactly.
    drop: set[int] = set()
    for wrapper in specials:
        if wrapper["label"] not in L.WRAPPER_TYPES:
            continue
        for reg in regular_final:
            if reg["label"] == L.TABLE:
                overlap = _ios(wrapper["bbox"], reg["bbox"])
                conf_diff = wrapper["confidence"] - reg["confidence"]
                if overlap > CROSS_TYPE_OVERLAP and conf_diff < CROSS_TYPE_CONF_DIFF:
                    drop.add(wrapper["id"])
                    break
    specials = [c for c in specials if c["id"] not in drop]

    # Full-page pictures (:488-501)
    page_area = page_w * page_h
    if page_area > 0:
        specials = [
            c
            for c in specials
            if not (
                c["label"] == L.PICTURE
                and _bbox_area(c["bbox"]) / page_area > FULL_PAGE_PICTURE_AREA
            )
        ]

    # Child containment against the processed regular set (:503-530)
    for sp in specials:
        contained = [
            c
            for c in regular_final
            if _ios(c["bbox"], sp["bbox"]) > CHILD_CONTAINMENT
        ]
        if not contained:
            continue
        contained.sort(
            key=lambda c: (
                _first_cell_index(c, cells),
                c["bbox"][1],
                c["bbox"][0],
            )
        )
        sp["children"] = contained
        if sp["label"] in (L.FORM, L.KEY_VALUE_REGION):
            sp["bbox"] = (
                min(c["bbox"][0] for c in contained),
                min(c["bbox"][1] for c in contained),
                max(c["bbox"][2] for c in contained),
                max(c["bbox"][3] for c in contained),
            )
        all_cells: list[int] = []
        for child in contained:
            all_cells.extend(child["cells"])
        sp["cells"] = _sort_cell_rows(_dedup_cell_rows(all_cells, cells), cells)

    pictures = [c for c in specials if c["label"] == L.PICTURE]
    pictures, _ = remove_overlapping_clusters(pictures, "picture", cells, epsilon)
    wrappers = [c for c in specials if c["label"] in L.WRAPPER_TYPES]
    wrappers, _ = remove_overlapping_clusters(wrappers, "wrapper", cells, epsilon)
    special_final = pictures + wrappers

    # Drop regulars swallowed by wrappers (:379-388)
    contained_ids = {
        child["id"] for w in special_final for child in w["children"]
    }
    regular_final = [c for c in regular_final if c["id"] not in contained_ids]

    final = sorted(
        regular_final + special_final,
        key=lambda c: (_first_cell_index(c, cells), c["bbox"][1], c["bbox"][0]),
    )
    for cl in final:
        cl["cells"] = _sort_cell_rows(cl["cells"], cells)
        for child in cl["children"]:
            child["cells"] = _sort_cell_rows(child["cells"], cells)
    return final


def grade_score(score: float) -> str:
    """Score -> quality grade bucket (base_models.py:384-395): <0.5
    poor, <0.8 fair, <0.9 good, >=0.9 excellent; NaN falls through
    every comparison -> unspecified."""
    if score < 0.5:
        return "poor"
    elif score < 0.8:
        return "fair"
    elif score < 0.9:
        return "good"
    elif score >= 0.9:
        return "excellent"
    return "unspecified"


def doc_confidence(page_scores: list[dict[str, float]]) -> dict[str, float]:
    """Doc-level ConfidenceReport (base_models.py:397-459).

    Per page the four scores are [ocr, table, layout, parse] (table and
    parse stay NaN in this engine, exactly as the reference never sets
    them — layout_model.py:243-248 assigns only layout/ocr); page
    mean_score = nanmean, page low_score = 5 % nanquantile. Doc level:
    mean_score = nanmean of page means, low_score = nanMEAN of page
    lows (the reference's ConfidenceReport overrides low_score with a
    mean over pages, base_models.py:450-459).
    """
    import warnings

    means: list[float] = []
    lows: list[float] = []
    for s in page_scores:
        vals = [
            s.get("ocr_score", float("nan")),
            s.get("table_score", float("nan")),
            s.get("layout_score", float("nan")),
            s.get("parse_score", float("nan")),
        ]
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            means.append(float(np.nanmean(vals)))
            lows.append(float(np.nanquantile(vals, q=0.05)))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        mean_score = float(np.nanmean(means)) if means else float("nan")
        low_score = float(np.nanmean(lows)) if lows else float("nan")
    return {
        "mean_score": mean_score,
        "low_score": low_score,
        "mean_grade": grade_score(mean_score),
        "low_grade": grade_score(low_score),
    }


def layout_confidence(clusters: list[Cluster], cells: CellArrays) -> dict[str, float]:
    """Page-level scores (fork/layout/layout_model.py:235-249):
    layout_score = mean cluster confidence, ocr_score = mean confidence
    of OCR-sourced cells. NaN when empty."""
    confs = np.array([c["confidence"] for c in clusters], dtype=np.float64)
    layout_score = float(np.mean(confs)) if confs.size else float("nan")
    ocr_rows = np.nonzero(cells.from_ocr & cells.valid)[0]
    ocr_score = (
        float(np.mean(cells.confidence[ocr_rows])) if ocr_rows.size else float("nan")
    )
    return {"layout_score": layout_score, "ocr_score": ocr_score}
