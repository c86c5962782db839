"""Shadows /root/reference/base_models.py for the shim import path:
the layout postprocessor needs only Cluster (a pydantic model there;
a plain attribute class here, with the same fields/defaults incl. the
_first_cell_index private attr)."""

import sys


class Cluster:
    def __init__(self, id: int, label, bbox, confidence: float = 1.0,
                 cells=None, children=None) -> None:
        self.id = id
        self.label = label
        self.bbox = bbox
        self.confidence = confidence
        self.cells = list(cells) if cells else []
        self.children = list(children) if children else []
        self._first_cell_index = sys.maxsize
