"""List-item marker normalization (SURVEY.md §2 M24).

The reference's ReadingOrderModel runs
``docling_ibm_models.list_item_normalizer.list_marker_processor.
ListItemMarkerProcessor.process_list_item`` on every list item it
creates (readingorder_model.py:46,100,309): a leading bullet or
enumeration marker is detected in the item text, moved OUT of the text
into the item's ``marker`` field, and enumeration markers flag the
item ``enumerated`` — so serializers render exactly one marker instead
of doubling it. That package is not installed in this container; the
semantics below implement its public behavior (bullet glyphs; ``1.``
``1)`` ``(1)`` digit markers; ``a.`` ``a)`` ``(a)`` letter markers;
roman-numeral variants), applied only when a marker is followed by
whitespace and real content.
"""

from __future__ import annotations

import re

BULLET_CHARS = "-*+•◦▪▫‣⁃∙·○●"

_BULLET_RE = re.compile(
    rf"^([{re.escape(BULLET_CHARS)}])\s+(\S.*)$", re.DOTALL
)
_NUMBERED_RE = re.compile(
    r"^("
    r"\(\d{1,3}\)|\d{1,3}[.)]"          # (1)  1.  1)
    r"|\([a-zA-Z]\)|[a-zA-Z][.)]"       # (a)  a.  a)
    r"|\([ivxlcdm]{1,7}\)|[ivxlcdm]{1,7}[.)]"   # (iv)  iv.  iv)
    r"|\([IVXLCDM]{1,7}\)|[IVXLCDM]{1,7}[.)]"
    r")\s+(\S.*)$",
    re.DOTALL,
)


def process_list_item(text: str) -> tuple[str, str, bool]:
    """Detect and strip a leading list marker.

    Returns ``(marker, stripped_text, enumerated)``; no marker (or a
    marker with nothing after it) leaves the text untouched as
    ``("", text, False)``.
    """
    m = _BULLET_RE.match(text)
    if m:
        return m.group(1), m.group(2), False
    m = _NUMBERED_RE.match(text)
    if m:
        return m.group(1), m.group(2), True
    return "", text, False
