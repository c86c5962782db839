"""TextCell/rect stand-ins with the attribute surface the reference
layout postprocessor touches: .index, .text, .confidence, .from_ocr,
.rect.to_bounding_box(), .to_bounding_box()."""

from docling.datamodel.base_models import BoundingBox


class _Rect:
    def __init__(self, l: float, t: float, r: float, b: float) -> None:
        self._bb = BoundingBox(l=l, t=t, r=r, b=b)

    def to_bounding_box(self) -> BoundingBox:
        return self._bb


class TextCell:
    def __init__(self, index: int, text: str, l: float, t: float,
                 r: float, b: float, confidence: float = 1.0,
                 from_ocr: bool = False) -> None:
        self.index = index
        self.text = text
        self.rect = _Rect(l, t, r, b)
        self.confidence = confidence
        self.from_ocr = from_ocr

    def to_bounding_box(self) -> BoundingBox:
        return self.rect.to_bounding_box()


class SegmentedPdfPage:  # attribute bag for parsed_page finalization
    def __init__(self) -> None:
        self.textline_cells = []
        self.has_lines = False


class TextCellUnit:
    LINE = "line"
    WORD = "word"
