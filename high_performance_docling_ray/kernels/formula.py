"""Code/formula enrichment (reference M26/M27/A4).

Semantics from `/root/reference/fork/formula/code_formula_model.py` and
`gpu_processor.py:184-202`:

* processable elements are CODE items and FORMULA-labelled text items
  (``code_formula_model.py:129-152``); the pipeline iterates document
  items, crops each element's image with most-frequent-edge-color
  padding, and batches crops 5 at a time through the CodeFormula
  vision model (``code_formula_model.py:69``, ``gpu_processor.py:187-197``).
* model output for code starts with a language tag; the tag is split
  off with the regex ``^<_([^_>]+)_>\\s(.*)`` and coerced to a known
  language enum (``code_formula_model.py:154-204``).

The vision model itself needs torch weights — STUBBED here with a
deterministic predictor (hash-derived language + normalized text);
everything around it (processable filter, batch-of-5 chunking, tag
parsing, element rewrite) is real and tested. A real deployment
replaces ``CodeFormulaPredictorStub`` inside the actor.
"""

from __future__ import annotations

import hashlib
import re

from . import labels as L

BATCH_SIZE = 5           # code_formula_model.py:69
IMAGES_SCALE = 1.66      # code_formula_model.py:70-71 (~120 dpi)

_LANG_PATTERN = re.compile(r"^<_([^_>]+)_>\s(.*)", re.DOTALL)

# code_formula_model.py coerces to docling's CodeLanguageLabel enum;
# unknown tags fall back to "unknown".
KNOWN_LANGUAGES = frozenset(
    {
        "ada", "awk", "bash", "bc", "c", "c#", "c++", "css", "cobol",
        "dc", "fortran", "html", "java", "javascript", "julia", "kotlin",
        "lisp", "lua", "matlab", "mysql", "objectivec", "ocaml", "octave",
        "pascal", "perl", "php", "postgresql", "powershell", "prolog",
        "python", "r", "ruby", "rust", "sml", "sql", "scala", "scheme",
        "swift", "typescript", "unknown", "visualbasic", "xml", "yaml",
    }
)


def is_processable(element: dict) -> bool:
    """CodeItem, or TextItem labelled FORMULA (code_formula_model.py:129-152)."""
    return element.get("kind") == "text" and element.get("label") in (
        L.CODE,
        L.FORMULA,
    )


def extract_code_language(text: str) -> tuple[str, str]:
    """Split the leading ``<_lang_> `` tag (code_formula_model.py:154-185).

    Returns (remainder, language); language is "unknown" when the tag
    is absent or not a known enum value.
    """
    m = _LANG_PATTERN.match(text)
    if not m:
        return text, "unknown"
    lang = m.group(1).lower()
    rest = m.group(2)
    if lang not in KNOWN_LANGUAGES:
        return rest, "unknown"
    return rest, lang


class CodeFormulaPredictorStub:
    """Deterministic stand-in for the CodeFormula vision model.

    For CODE elements it emits ``<_<lang>_> <text>`` (the tagged shape
    the real model produces); for FORMULA it emits a normalized latex-ish
    string. Replace with the torch predictor inside the actor to go
    live — the enrichment plumbing is unchanged.
    """

    _STUB_LANGS = ("python", "c++", "java", "sql")

    def predict(self, elements: list[dict]) -> list[str]:
        out = []
        for el in elements:
            text = el.get("text", "")
            # md5 so the DuckDB oracle reproduces the stub:
            # hex head = substr(md5(text), 1, 8), lang pick = first byte
            digest = hashlib.md5(text.encode("utf-8")).digest()[:4]
            if el.get("label") == L.CODE:
                lang = self._STUB_LANGS[digest[0] % len(self._STUB_LANGS)]
                out.append(f"<_{lang}_> {text}")
            else:
                out.append(f"\\mathrm{{{digest.hex()}}} {text}".strip())
        return out


def enrich_elements(
    elements: list[dict], predictor: CodeFormulaPredictorStub | None = None
) -> list[dict]:
    """Run code/formula enrichment over one document's elements.

    Processable elements are chunked BATCH_SIZE at a time (the
    reference's chunkify drive loop, gpu_processor.py:187-197); code
    predictions are split into (text, code_language); formula
    predictions replace the element text.
    """
    predictor = predictor or CodeFormulaPredictorStub()
    todo = [el for el in elements if is_processable(el)]
    for i in range(0, len(todo), BATCH_SIZE):
        chunk = todo[i : i + BATCH_SIZE]
        for el, pred in zip(chunk, predictor.predict(chunk)):
            if el.get("label") == L.CODE:
                text, lang = extract_code_language(pred)
                el["text"] = text
                el["code_language"] = lang
            else:
                el["text"] = pred
    return elements
