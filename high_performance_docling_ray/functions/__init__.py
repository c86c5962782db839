"""Scalar function library: the flat, user-facing API over the kernel
modules (string / math / array helpers — SURVEY.md §2.7).

Everything here is pure and deterministic; use directly inside
``map_batches`` bodies or driver-side code.
"""

from ..kernels.bbox import (
    area,
    clip_to_page,
    cxcywh_to_xyxy,
    intersection_over_self,
    iou,
    to_bottom_left,
    xyxy_to_cxcywh,
)
from ..kernels.dedup import MinHasher, hamming64, simhash64
from ..kernels.formula import extract_code_language
from ..kernels.text_stats import (
    bpe_token_count,
    detect_language,
    jaccard,
    md5_fingerprint,
    ngram_set,
    quality_score,
    rolling_fingerprint,
    token_count,
)
from ..kernels.textnorm import (
    cells_to_text,
    clean_cell_text,
    normalize_punct,
    safe_id,
    sanitize_text,
)

__all__ = [
    "area", "clip_to_page", "cxcywh_to_xyxy", "intersection_over_self",
    "iou", "to_bottom_left", "xyxy_to_cxcywh",
    "MinHasher", "hamming64", "simhash64",
    "extract_code_language",
    "bpe_token_count", "detect_language", "jaccard", "md5_fingerprint",
    "ngram_set", "quality_score", "rolling_fingerprint", "token_count",
    "cells_to_text", "clean_cell_text", "normalize_punct", "safe_id",
    "sanitize_text",
]
