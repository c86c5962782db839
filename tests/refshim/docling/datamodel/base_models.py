"""BoundingBox / Page stand-ins.

BoundingBox DELEGATES its overlap algebra to this repo's
kernels/bbox.py so the differential test isolates the reference's
RULE FLOW (thresholds, iteration, selection) from bbox arithmetic —
both engines share one algebra, and any behavioral difference that
the test surfaces is a rule-system difference, which is what we are
verifying (VERDICT r1 item 4)."""

from types import SimpleNamespace

import numpy as np

from high_performance_docling_ray.kernels import bbox as _bb


class BoundingBox:
    __slots__ = ("l", "t", "r", "b")

    def __init__(self, l: float, t: float, r: float, b: float) -> None:
        self.l = float(l)
        self.t = float(t)
        self.r = float(r)
        self.b = float(b)

    def as_tuple(self):
        return (self.l, self.t, self.r, self.b)

    def _row(self) -> np.ndarray:
        return np.array([[self.l, self.t, self.r, self.b]], dtype=np.float64)

    def area(self) -> float:
        return float(_bb.area(self._row())[0])

    def intersection_over_union(self, other: "BoundingBox") -> float:
        return float(_bb.iou(self._row(), other._row())[0])

    def intersection_over_self(self, other: "BoundingBox") -> float:
        return float(_bb.intersection_over_self(self._row(), other._row())[0])


class Page(SimpleNamespace):
    """Attribute bag: .cells, .size(.width/.height), .parsed_page."""
