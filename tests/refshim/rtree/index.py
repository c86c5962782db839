"""Brute-force stand-in for rtree.index.

The reference uses the R-tree ONLY as a candidate prefilter (every hit
is re-checked with exact thresholds), so an over-inclusive linear scan
is behavior-identical: libspatialindex counts touching boxes as
intersecting, and so does the <=/>= test here."""


class Property:
    def __init__(self) -> None:
        self.dimension = 2


class Index:
    def __init__(self, properties=None) -> None:
        self._boxes: dict[int, tuple] = {}

    def insert(self, id: int, coords) -> None:
        self._boxes[int(id)] = tuple(coords)

    def delete(self, id: int, coords) -> None:
        self._boxes.pop(int(id), None)

    def intersection(self, coords):
        l, t, r, b = coords
        return [
            i
            for i, (bl, bt, br, bb) in self._boxes.items()
            if not (br < l or r < bl or bb < t or b < bt)
        ]
