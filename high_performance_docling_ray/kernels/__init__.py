"""Pure, deterministic, dependency-light kernels.

Every byte-identity-relevant decision (text normalization, ordering
tie-breaks, threshold comparisons) lives here exactly once, so the Ray
pipeline and the serial oracle cannot diverge.
"""
