"""Bounding-box algebra (vectorized numpy + scalar forms).

Semantics follow the reference's bbox helpers: intersection-over-union
/ intersection-over-self (`/root/reference/fork/layout/layout_postprocessor.py:98-122`),
TOPLEFT<->BOTTOMLEFT origin flips (`page_word_index.py:30-40`,
`readingorder_model.py:56`), and cxcywh<->xyxy conversion
(`fork/table/tablemodel04_rs.py:277-303`).

Boxes are ``(l, t, r, b)`` in TOPLEFT origin unless noted. Vectorized
forms take float arrays of shape (N, 4) or separate component arrays.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-6


def area(boxes: np.ndarray) -> np.ndarray:
    """Axis-aligned area; negative extents clamp to 0. boxes: (N,4)."""
    w = np.maximum(0.0, boxes[:, 2] - boxes[:, 0])
    h = np.maximum(0.0, boxes[:, 3] - boxes[:, 1])
    return w * h


def intersection(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise intersection areas for broadcastable (…,4) boxes."""
    iw = np.maximum(
        0.0, np.minimum(a[..., 2], b[..., 2]) - np.maximum(a[..., 0], b[..., 0])
    )
    ih = np.maximum(
        0.0, np.minimum(a[..., 3], b[..., 3]) - np.maximum(a[..., 1], b[..., 1])
    )
    return iw * ih


def iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    inter = intersection(a, b)
    union = area(np.atleast_2d(a)) + area(np.atleast_2d(b)) - inter
    return inter / np.maximum(union, EPS)


def intersection_over_self(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """How much of ``a`` lies inside ``b`` (containment of a in b)."""
    inter = intersection(a, b)
    return inter / np.maximum(area(np.atleast_2d(a)), EPS)


def ios_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,M) matrix of intersection-over-self(a_i, b_j). a:(N,4) b:(M,4)."""
    inter = intersection(a[:, None, :], b[None, :, :])
    return inter / np.maximum(area(a), EPS)[:, None]


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,M) IoU matrix."""
    inter = intersection(a[:, None, :], b[None, :, :])
    union = area(a)[:, None] + area(b)[None, :] - inter
    return inter / np.maximum(union, EPS)


def overlap_pair(
    a: tuple[float, float, float, float],
    b: tuple[float, float, float, float],
    overlap_threshold: float,
    containment_threshold: float,
    epsilon: float = 0.0,
) -> bool:
    """Scalar merge predicate (layout_postprocessor.py:98-122, 685-697):

    merge when IoU >= overlap_threshold - eps, or either box is
    contained in the other by >= containment_threshold - eps.
    """
    l1, t1, r1, b1 = a
    l2, t2, r2, b2 = b
    aa = max(0.0, r1 - l1) * max(0.0, b1 - t1)
    ab = max(0.0, r2 - l2) * max(0.0, b2 - t2)
    if aa <= 0.0 or ab <= 0.0:
        return False
    iw = min(r1, r2) - max(l1, l2)
    ih = min(b1, b2) - max(t1, t2)
    if iw <= 0.0 or ih <= 0.0:
        return False
    inter = iw * ih
    cont_thr = containment_threshold - epsilon
    if inter / aa >= cont_thr or inter / ab >= cont_thr:
        return True
    denom = aa + ab - inter
    return denom > 0.0 and inter / denom >= (overlap_threshold - epsilon)


def overlap_merge_matrix(
    boxes: np.ndarray,
    overlap_threshold: float,
    containment_threshold: float,
    epsilon: float = 0.0,
) -> np.ndarray:
    """(N,N) boolean matrix of ``overlap_pair`` over all box pairs.

    Performs exactly the scalar predicate's IEEE-double operations
    (same max/min/products/divisions), so ``out[i, j] ==
    overlap_pair(boxes[i], boxes[j], ...)`` bit-for-bit — it only
    replaces the O(N^2) Python loop with numpy broadcasting.
    """
    b = np.asarray(boxes, dtype=np.float64)
    ar = np.maximum(0.0, b[:, 2] - b[:, 0]) * np.maximum(0.0, b[:, 3] - b[:, 1])
    iw = np.minimum(b[:, None, 2], b[None, :, 2]) - np.maximum(
        b[:, None, 0], b[None, :, 0]
    )
    ih = np.minimum(b[:, None, 3], b[None, :, 3]) - np.maximum(
        b[:, None, 1], b[None, :, 1]
    )
    valid = (ar[:, None] > 0.0) & (ar[None, :] > 0.0) & (iw > 0.0) & (ih > 0.0)
    inter = iw * ih
    cont_thr = containment_threshold - epsilon
    with np.errstate(divide="ignore", invalid="ignore"):
        cont = (inter / ar[:, None] >= cont_thr) | (inter / ar[None, :] >= cont_thr)
        denom = ar[:, None] + ar[None, :] - inter
        iou_ok = (denom > 0.0) & (inter / denom >= (overlap_threshold - epsilon))
    return valid & (cont | iou_ok)


def to_bottom_left(boxes: np.ndarray, page_height: float) -> np.ndarray:
    """TOPLEFT (l,t,r,b) -> BOTTOMLEFT (l,b',r,t') flip (readingorder_model.py:56).

    In BOTTOMLEFT origin y grows upward: new_t = H - t, new_b = H - b,
    and we keep the (l, t, r, b) slot convention where t >= b.
    """
    out = boxes.astype(np.float64).copy()
    out[:, 1] = page_height - boxes[:, 1]  # top edge measured from bottom
    out[:, 3] = page_height - boxes[:, 3]  # bottom edge measured from bottom
    return out


def quad_to_aabb(
    xs: np.ndarray, ys: np.ndarray, page_height: float, bottomleft: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """4-point quads -> TOPLEFT AABBs (page_word_index.py:28-40).

    xs, ys: (N,4) quad corner coordinates.
    """
    lx = xs.min(axis=1)
    rx = xs.max(axis=1)
    if bottomleft:
        ty = page_height - ys.max(axis=1)
        by = page_height - ys.min(axis=1)
    else:
        ty = ys.min(axis=1)
        by = ys.max(axis=1)
    return lx, ty, rx, by


def cxcywh_to_xyxy(boxes: np.ndarray) -> np.ndarray:
    """(cx,cy,w,h) -> (x1,y1,x2,y2) (tablemodel04_rs.py:277-303)."""
    cx, cy, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    return np.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=1
    )


def xyxy_to_cxcywh(boxes: np.ndarray) -> np.ndarray:
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    return np.stack(
        [(x1 + x2) / 2.0, (y1 + y2) / 2.0, x2 - x1, y2 - y1], axis=1
    )


def clip_to_page(boxes: np.ndarray, width: float, height: float) -> np.ndarray:
    """Clamp boxes to [0,w]x[0,h] (layout_predictor_gpu.py:309-312)."""
    out = boxes.copy()
    out[:, 0] = np.clip(out[:, 0], 0.0, width)
    out[:, 2] = np.clip(out[:, 2], 0.0, width)
    out[:, 1] = np.clip(out[:, 1], 0.0, height)
    out[:, 3] = np.clip(out[:, 3], 0.0, height)
    return out
