"""Layout label taxonomy + per-label rules.

String-valued labels mirroring the reference's DocItemLabel usage
(`/root/reference/fork/layout/layout_model.py:38-56`,
`fork/layout/layout_postprocessor.py:284-321`). Arrow carries these as
dictionary-encoded string columns.
"""

from __future__ import annotations

TEXT = "text"
FOOTNOTE = "footnote"
CAPTION = "caption"
CHECKBOX_UNSELECTED = "checkbox_unselected"
CHECKBOX_SELECTED = "checkbox_selected"
SECTION_HEADER = "section_header"
PAGE_HEADER = "page_header"
PAGE_FOOTER = "page_footer"
CODE = "code"
LIST_ITEM = "list_item"
FORMULA = "formula"
TABLE = "table"
DOCUMENT_INDEX = "document_index"
PICTURE = "picture"
FORM = "form"
KEY_VALUE_REGION = "key_value_region"
TITLE = "title"

# Assembly partition (fork/layout/layout_model.py:38-56)
TEXT_ELEM_LABELS = frozenset(
    {
        TEXT, FOOTNOTE, CAPTION, CHECKBOX_UNSELECTED, CHECKBOX_SELECTED,
        SECTION_HEADER, PAGE_HEADER, PAGE_FOOTER, CODE, LIST_ITEM, FORMULA,
    }
)
PAGE_HEADER_LABELS = frozenset({PAGE_HEADER, PAGE_FOOTER})
TABLE_LABELS = frozenset({TABLE, DOCUMENT_INDEX})
FIGURE_LABEL = PICTURE
CONTAINER_LABELS = frozenset({FORM, KEY_VALUE_REGION})

# Postprocessor partition (layout_postprocessor.py:290-296)
WRAPPER_TYPES = frozenset({FORM, KEY_VALUE_REGION, TABLE, DOCUMENT_INDEX})
SPECIAL_TYPES = WRAPPER_TYPES | {PICTURE}

# Per-label confidence thresholds (layout_postprocessor.py:298-316)
CONFIDENCE_THRESHOLDS: dict[str, float] = {
    CAPTION: 0.5,
    FOOTNOTE: 0.5,
    FORMULA: 0.5,
    LIST_ITEM: 0.5,
    PAGE_FOOTER: 0.5,
    PAGE_HEADER: 0.5,
    PICTURE: 0.5,
    SECTION_HEADER: 0.45,
    TABLE: 0.5,
    TEXT: 0.5,
    TITLE: 0.45,
    CODE: 0.45,
    CHECKBOX_SELECTED: 0.45,
    CHECKBOX_UNSELECTED: 0.45,
    FORM: 0.45,
    KEY_VALUE_REGION: 0.45,
    DOCUMENT_INDEX: 0.45,
}

# TITLE -> SECTION_HEADER (layout_postprocessor.py:318-321)
LABEL_REMAPPING: dict[str, str] = {TITLE: SECTION_HEADER}

# Overlap-resolution parameters per cluster class
# (layout_postprocessor.py:284-288)
OVERLAP_PARAMS: dict[str, dict[str, float]] = {
    "regular": {"area_threshold": 1.3, "conf_threshold": 0.05},
    "picture": {"area_threshold": 2.0, "conf_threshold": 0.3},
    "wrapper": {"area_threshold": 2.0, "conf_threshold": 0.2},
}


def normalize_label(raw: str) -> str:
    """Model-output label string -> canonical (fork/layout/layout_model.py:209-211)."""
    return raw.lower().replace(" ", "_").replace("-", "_")
