"""Property-style invariants (SURVEY.md §5): hypothesis over the
byte-identity kernels and structural algorithms."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from high_performance_docling_ray.kernels.bbox import (
    cxcywh_to_xyxy,
    to_bottom_left,
    xyxy_to_cxcywh,
)
from high_performance_docling_ray.kernels.dedup import MinHasher, simhash64
from high_performance_docling_ray.kernels.table_rules import (
    compact_indexes,
    otsl_is_square,
    parse_otsl,
)
from high_performance_docling_ray.kernels.textnorm import (
    normalize_punct,
    safe_id,
    sanitize_text,
)

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)


@given(_text)
@settings(max_examples=200, deadline=None)
def test_normalize_punct_idempotent(s):
    once = normalize_punct(s)
    assert normalize_punct(once) == once


@given(_text)
@settings(max_examples=200, deadline=None)
def test_safe_id_is_safe_and_idempotent(s):
    out = safe_id(s)
    assert safe_id(out) == out
    assert all(c.isalnum() or c in "._-" for c in out)


@given(st.lists(_text, max_size=8))
@settings(max_examples=200, deadline=None)
def test_sanitize_deterministic_and_stripped(lines):
    a = sanitize_text(list(lines))
    b = sanitize_text(list(lines))
    assert a == b
    if len(lines) > 1:
        assert a == a.strip()


@given(
    st.lists(
        st.tuples(
            st.floats(0, 1000, allow_nan=False),
            st.floats(0, 1000, allow_nan=False),
            st.floats(0.1, 500, allow_nan=False),
            st.floats(0.1, 500, allow_nan=False),
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=100, deadline=None)
def test_cxcywh_roundtrip(boxes):
    arr = np.array(boxes, dtype=np.float64)
    back = xyxy_to_cxcywh(cxcywh_to_xyxy(arr))
    assert np.allclose(back, arr, atol=1e-9)


@given(
    st.lists(
        st.tuples(
            st.floats(0, 500, allow_nan=False),
            st.floats(0, 500, allow_nan=False),
        ),
        min_size=1,
        max_size=16,
    ),
    st.floats(500, 1000, allow_nan=False),
)
@settings(max_examples=100, deadline=None)
def test_bottom_left_flip_involution(points, page_h):
    lt = np.array([[x, y, x + 10, y + 10] for x, y in points])
    flipped = to_bottom_left(to_bottom_left(lt, page_h), page_h)
    assert np.allclose(flipped, lt, atol=1e-9)


_otsl_row = st.lists(
    st.sampled_from(["fcel", "ecel", "ched", "lcel"]), min_size=1, max_size=5
)


@given(st.lists(_otsl_row, min_size=1, max_size=5))
@settings(max_examples=150, deadline=None)
def test_otsl_parse_and_compaction_invariants(rows):
    # make the grid square so spans are well formed
    width = len(rows[0])
    grid = [r[:width] + ["fcel"] * (width - len(r)) for r in rows]
    # lcel in column 0 has no origin to its left; replace
    for r in grid:
        if r[0] == "lcel":
            r[0] = "fcel"
    seq = [t for r in grid for t in (*r, "nl")]
    assert otsl_is_square(seq)
    cells = parse_otsl(seq)
    # each origin cell's span is >= 1 and end > start
    for c in cells:
        assert c["end_row"] > c["start_row"]
        assert c["end_col"] > c["start_col"]
    if cells:
        nr, nc = compact_indexes(cells)
        rows_used = sorted({c["start_row"] for c in cells})
        cols_used = sorted({c["start_col"] for c in cells})
        # compacted indexes are contiguous from zero (SURVEY §5 invariant)
        assert rows_used == list(range(len(rows_used)))
        assert cols_used == list(range(len(cols_used)))
        assert nr >= len(rows_used) and nc >= len(cols_used)


@given(st.text(max_size=200), st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_minhash_similarity_symmetry(a, b):
    h = MinHasher(num_perm=32)
    sa, sb = h.signature(a), h.signature(b)
    assert MinHasher.estimate_jaccard(sa, sb) == MinHasher.estimate_jaccard(sb, sa)
    assert MinHasher.estimate_jaccard(sa, sa) == 1.0


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_simhash_deterministic(s):
    assert simhash64(s) == simhash64(s)
    assert 0 <= simhash64(s) < (1 << 64)
