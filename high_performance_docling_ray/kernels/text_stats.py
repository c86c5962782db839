"""Text analysis kernels: language ID, quality scoring, token counting,
document fingerprinting.

Vectorized over lists of strings (called from ``map_batches`` with
Arrow string columns). All deterministic; the duckdb oracle SQL in
``__ray_entry__.oracle_sql`` mirrors the SQL-expressible ones exactly
(same regexes / same hash functions) so value-hashes match.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WS_RE = re.compile(r"\s+")
# BPE-ish word/number/punct splitter for subword-flavored token counts.
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")
_PUNCT_RE = re.compile(r"[^\w\s]")

# Tiny stopword inventories for n-gram-free heuristic language ID.
_LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the a of and to in is it you that he was for on are".split()),
    "de": frozenset("der die das und ist ich nicht sie mit ein zu den von".split()),
    "fr": frozenset("le la les de et un une est je pas pour que dans".split()),
    "es": frozenset("el la los las de y un una es en no que por para".split()),
    "it": frozenset("il lo la gli le di e un una è che non per con".split()),
}


def ws_tokens(text: str) -> list[str]:
    """Whitespace tokenization; '' -> []. Matches duckdb
    regexp_split_to_array(trim(x), '\\s+') for non-empty trimmed text."""
    t = text.strip()
    return _WS_RE.split(t) if t else []


def token_count(text: str) -> int:
    return len(ws_tokens(text))


def bpe_token_count(text: str) -> int:
    """Count of BPE-ish sub-tokens: letter runs, single digits, punct."""
    return len(_BPE_RE.findall(text))


def quality_features(text: str) -> dict[str, float]:
    """Length / punctuation / stopword-ratio quality features.

    Mirrors the shape of heuristic web-text quality filters (Gopher /
    C4-style rules) as deterministic ratios.
    """
    toks = ws_tokens(text)
    n_tok = len(toks)
    n_char = len(text)
    n_punct = len(_PUNCT_RE.findall(text))
    lower = text.lower()
    stop_hits = sum(1 for t in lower.split() if t in _LANG_STOPWORDS["en"])
    mean_word_len = (
        sum(len(t) for t in toks) / n_tok if n_tok else 0.0
    )
    return {
        "n_chars": float(n_char),
        "n_tokens": float(n_tok),
        "mean_word_len": mean_word_len,
        "punct_ratio": n_punct / n_char if n_char else 0.0,
        "stopword_ratio": stop_hits / n_tok if n_tok else 0.0,
    }


def quality_score(text: str) -> float:
    """Scalar quality in [0,1]: blends length, word-shape and stopword
    signals. Deterministic; monotone in each feature band."""
    f = quality_features(text)
    length_term = min(1.0, f["n_tokens"] / 50.0)
    word_shape = 1.0 if 3.0 <= f["mean_word_len"] <= 10.0 else 0.5
    stop_term = min(1.0, f["stopword_ratio"] * 5.0)
    punct_pen = 1.0 - min(1.0, max(0.0, f["punct_ratio"] - 0.2) * 2.0)
    return round(0.4 * length_term + 0.2 * word_shape + 0.2 * stop_term
                 + 0.2 * punct_pen, 6)


def detect_language(text: str) -> str:
    """Stopword-overlap heuristic language ID; 'und' when undecidable."""
    words = set(text.lower().split())
    if not words:
        return "und"
    best_lang = "und"
    best_hits = 0
    for lang in sorted(_LANG_STOPWORDS):
        hits = len(words & _LANG_STOPWORDS[lang])
        if hits > best_hits:
            best_hits = hits
            best_lang = lang
    return best_lang if best_hits > 0 else "und"


def md5_fingerprint(text: str) -> str:
    """Exact-content fingerprint; matches duckdb md5()."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def rolling_fingerprint(text: str, window: int = 16, mod: int = 1 << 61) -> int:
    """Rolling polynomial hash fingerprint over the whole document:
    min of window hashes (a winnowing-style signature)."""
    data = text.encode("utf-8")
    if len(data) < window:
        h = 0
        for ch in data:
            h = (h * 257 + ch) % mod
        return h
    base = 257
    basew = pow(base, window - 1, mod)
    h = 0
    for ch in data[:window]:
        h = (h * base + ch) % mod
    best = h
    for i in range(window, len(data)):
        h = ((h - data[i - window] * basew) * base + data[i]) % mod
        if h < best:
            best = h
    return best


def ngram_set(text: str, n: int = 3) -> set[str]:
    """Word n-gram shingles (lowercased whitespace tokens)."""
    toks = [t.lower() for t in ws_tokens(text)]
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def batch_md5(texts: list[str]) -> list[str]:
    return [md5_fingerprint(t) for t in texts]


def batch_token_count(texts: list[str]) -> np.ndarray:
    return np.fromiter((token_count(t) for t in texts), np.int64, len(texts))


def cdc_boundaries(
    data: bytes, window: int = 16, div: int = 64, mod: int = 1 << 61
) -> list[int]:
    """Content-defined chunk boundaries (Rabin-style): a cut AFTER
    byte position ``p`` (1-based, p >= window) whenever the base-257
    rolling hash of the window ending at ``p`` is divisible by
    ``div`` — the same recurrence as ``rolling_fingerprint``, so the
    SQL oracle reuses the proven recursive-CTE form. Insertions shift
    only neighboring chunks (the storage-dedup property); production
    CDC adds min/max clamps, which are deliberately omitted here to
    keep the closed form."""
    n = len(data)
    if n < window:
        return []
    base = 257
    basew = pow(base, window - 1, mod)
    h = 0
    bounds: list[int] = []
    for i in range(n):
        ch = data[i]
        if i < window:
            h = (h * base + ch) % mod
            if i == window - 1 and h % div == 0:
                bounds.append(i + 1)
        else:
            h = ((h - data[i - window] * basew) * base + ch) % mod
            if h % div == 0:
                bounds.append(i + 1)
    return bounds
