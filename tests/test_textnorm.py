"""Unit tests for the byte-identity text kernel.

Expected values hand-derived from the reference semantics
(page_assemble_model.py:36-67) — including a literal trace of its
in-place list mutation — NOT from running our implementation.
"""

from high_performance_docling_ray.kernels.textnorm import (
    cells_to_text,
    clean_cell_text,
    safe_id,
    sanitize_text,
)


def test_empty_and_single():
    assert sanitize_text([]) == ""
    assert sanitize_text(["hello "]) == "hello "  # single line: no strip (len<=1 path)


def test_plain_join():
    assert sanitize_text(["one two", "three"]) == "one two three"


def test_dehyphenation():
    # "inter-" + "national" -> joined without hyphen
    assert sanitize_text(["the inter-", "national act"]) == "the international act"


def test_dehyphenation_checks_regex_words_not_adjacency():
    # The reference checks the LAST regex word of the previous line
    # ("3" here, alnum) — not the char adjacent to the hyphen — so the
    # hyphen is stripped even after "3,-".
    assert sanitize_text(["value 3,-", "next line"]) == "value 3,next line"


def test_hyphen_kept_nonalnum_next():
    # first regex word of the next line is "_x" (isalnum False):
    # hyphen kept AND no space inserted.
    assert sanitize_text(["well-", "_x y"]) == "well-_x y"


def test_unicode_normalization():
    assert sanitize_text(["a“b”c", "d’e‘f g⁄h •i"]) == 'a"b"c d\'e\'f g/h ·i'


def test_strip_applied_multiline_only():
    assert sanitize_text(["  lead", "trail  "]) == "lead trail"


def test_control_char_cell():
    assert clean_cell_text("soft\x02wrap  ") == "soft-wrap"


def test_cells_to_text_drops_blank():
    assert cells_to_text(["a", "   ", "b"]) == "a b"


def test_underscore_word_blocks_dehyphenation():
    # \w includes underscore; "foo_" is a regex word but isalnum() False
    assert sanitize_text(["x foo_-", "bar"]) == "x foo_-bar"


def test_safe_id():
    assert safe_id("https://a.b/c?d=1") == "https_a.b_c_d_1"
