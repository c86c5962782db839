"""Text sanitization kernel — the byte-identity-critical text path.

Semantics match the reference's line joiner / normalizer
(``/root/reference/page_assemble_model.py:36-67`` ``sanitize_text`` and
the ``\\x02`` control-char replacement at
``page_assemble_model.py:88-93`` / ``readingorder_model.py:88``):

* consecutive lines where the previous line ends with ``-`` and both
  the last word of the previous line and the first word of the next
  line are alphanumeric are de-hyphenated (the trailing ``-`` is
  removed and the lines are joined with no space);
* a previous line ending with ``-`` that fails the word check is
  joined with no space (hyphen kept);
* all other consecutive lines are joined with a single space;
* unicode punctuation is normalized (fraction slash, curly quotes,
  bullet) and the result is stripped.

Implemented from scratch over original line values (the reference
mutates its list in place while iterating a copy, which is equivalent
to deciding each join from the original values — see trace in tests).
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"\b[\w]+\b")

# Unicode normalization table (page_assemble_model.py:60-65).
_REPLACEMENTS = (
    ("⁄", "/"),   # fraction slash
    ("’", "'"),   # right single curly quote
    ("‘", "'"),   # left single curly quote
    ("“", '"'),   # left double curly quote
    ("”", '"'),   # right double curly quote
    ("•", "·"),  # bullet -> middle dot
)


def normalize_punct(text: str) -> str:
    """Apply the unicode punctuation normalization table."""
    for src, dst in _REPLACEMENTS:
        if src in text:
            text = text.replace(src, dst)
    return text


def _dehyphenate_join(prev: str, nxt: str) -> bool:
    """True when ``prev`` (ending with '-') should merge into ``nxt``."""
    prev_words = _WORD_RE.findall(prev)
    next_words = _WORD_RE.findall(nxt)
    return bool(
        prev_words
        and next_words
        and prev_words[-1].isalnum()
        and next_words[0].isalnum()
    )


def sanitize_text(lines: list[str]) -> str:
    """Join text lines with de-hyphenation + unicode normalization.

    Reference semantics: page_assemble_model.py:36-67.
    """
    if len(lines) <= 1:
        return " ".join(lines)

    parts: list[str] = []
    for i, line in enumerate(lines):
        if i == len(lines) - 1:
            parts.append(line)
            break
        nxt = lines[i + 1]
        if line.endswith("-"):
            if _dehyphenate_join(line, nxt):
                parts.append(line[:-1])
            else:
                parts.append(line)
        else:
            parts.append(line + " ")

    return normalize_punct("".join(parts)).strip()


def clean_cell_text(text: str) -> str:
    """Per-cell cleanup applied before line joining.

    ``\\x02`` (the PDF soft-hyphen placeholder used by the reference)
    becomes ``-`` and surrounding whitespace is stripped
    (page_assemble_model.py:90).
    """
    return text.replace("\x02", "-").strip()


def cells_to_text(cell_texts: list[str]) -> str:
    """Cluster cells -> sanitized element text (page_assemble_model.py:88-94)."""
    lines = [clean_cell_text(t) for t in cell_texts]
    lines = [ln for ln in lines if ln]
    return sanitize_text(lines)


def join_child_text(cell_texts: list[str]) -> str:
    """Child-cluster text join (readingorder_model.py:86-92): plain spaces."""
    return " ".join(
        clean_cell_text(t) for t in cell_texts if clean_cell_text(t)
    )


_SAFE_ID_RE = re.compile(r"[^A-Za-z0-9._-]+")


def safe_id(value: str) -> str:
    """Filesystem/url-safe identifier (gpu_processor.py:365-368)."""
    return _SAFE_ID_RE.sub("_", value)
