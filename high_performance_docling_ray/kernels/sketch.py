"""HyperLogLog distinct-count sketch (Flajolet et al. 2007).

The mergeable-sketch shape for distributed distinct counts: each batch
builds a partial register array, partials merge with an elementwise
max (associative + commutative — safe under any Ray execution order),
and the driver finalizes. 2^p registers of one byte each, so a
p=12 sketch is 4 KiB regardless of cardinality — the thing a
groupby-distinct at 10^12 rows cannot be.

Standard bias corrections: linear counting for small range, the
1/(2^32) correction for the large range.
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_P = 12  # 4096 registers -> ~1.6% standard error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes of arbitrary values (stringified):
    first 8 md5 bytes little-endian == DuckDB ``md5_number_upper``, so
    the HLL oracle SQL can rebuild identical registers."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        digest = hashlib.md5(str(v).encode("utf-8")).digest()
        out[i] = int.from_bytes(digest[:8], "little")
    return out


def hash64_strings(col) -> np.ndarray:
    """``hash64`` of a pyarrow STRING array, md5-ing each DISTINCT
    value once (dictionary-encode, hash the dictionary, scatter by
    code). Token columns repeat their vocabulary heavily, so this cuts
    the per-value md5 loop by 10-100x while producing byte-identical
    hashes to ``hash64(col.to_pylist())``."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.empty(0, np.uint64)
    if col.null_count:  # null codes would float-promote; rare path
        return hash64(col.to_pylist())
    enc = col.dictionary_encode()
    dict_hashes = hash64(enc.dictionary.to_pylist())
    codes = enc.indices.to_numpy(zero_copy_only=False)
    return dict_hashes[codes.astype(np.int64)]


def empty_registers(p: int = DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def add_hashed(registers: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold a batch of 64-bit hashes into the register array (vectorized)."""
    if len(hashes) == 0:
        return registers
    p = int(np.log2(len(registers)))
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = (hashes << np.uint64(p)) | np.uint64((1 << p) - 1)
    # rank = leading zeros of the remaining bits + 1
    # via bit-length: rank = 64 - p ... computed from the float2 exponent
    # trick is unsafe at 64 bits; use a loop-free log2 on the high bits
    # rank = 64 - bit_length(rest) + 1. bit_length computed exactly via
    # frexp on 32-bit halves (float64 is exact for ints < 2^53).
    hi = (rest >> np.uint64(32)).astype(np.float64)
    lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.float64)
    _, e_hi = np.frexp(hi)
    _, e_lo = np.frexp(np.maximum(lo, 1.0))
    bl = np.where(hi != 0.0, 32 + e_hi, e_lo).astype(np.int64)
    ranks = (64 - bl + 1).astype(np.uint8)  # rest!=0 always (low bits set)
    np.maximum.at(registers, idx, ranks)
    return registers


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Sketch union: elementwise register max."""
    return np.maximum(a, b)


def estimate(registers: np.ndarray) -> float:
    """Cardinality estimate with small/large-range corrections.

    The 2^-reg sum is computed as an EXACT integer numerator over 2^53
    (register values never exceed 53 here), then converted to float in
    one rounding step — bit-identical regardless of summation order,
    and reproducible by the DuckDB oracle SQL's HUGEINT sum."""
    m = len(registers)
    counts = np.bincount(registers.astype(np.int64))
    # kmax >= every rank so no register's 2^-reg term is dropped (a
    # p<12 sketch has ranks up to 65-p); kmax=53 whenever possible so
    # the numerator and the p=12 oracle SQL stay bit-identical
    kmax = max(53, len(counts) - 1)
    num = sum(int(c) << (kmax - k) for k, c in enumerate(counts) if c)
    inv_sum = float(num) / float(1 << kmax)  # exact power-of-two scale
    raw = _alpha(m) * m * m / inv_sum
    if raw <= 2.5 * m:
        zeros = int((registers == 0).sum())
        if zeros:
            return m * np.log(m / zeros)
    if raw > (1 << 32) / 30.0:
        return -(1 << 32) * np.log(1.0 - raw / (1 << 32))
    return float(raw)


# -- count-min sketch -------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024
# odd constants < 2^62 so the SQL rebuild's HUGEINT product
# (< 2^64 * 2^62 = 2^126) stays inside the 128-bit signed range
CMS_MULTS = (
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
    0x2545F4914F6CDD1D,
    0x1B873593CC9E2D51,
)


def cms_buckets(tokens, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """(depth, n) bucket indices for ``tokens``: ONE md5 per token (the
    HLL ``hash64``), then per-row multiplicative mixing taking the
    HIGH bits — ``((h * M_j) mod 2^64) >> (64 - log2(width))`` — so
    rows stay pairwise-decorrelated (low-bit modulo would make every
    row the same function of ``h mod width``) and everything after the
    digest is vectorized. Bit-exact reproducible in DuckDB:
    ``((CAST(md5_number_upper(t) AS HUGEINT) * M_j)
    % 2^64) // 2^(64 - log2(width))``."""
    if width & (width - 1):
        raise ValueError("CMS width must be a power of two")
    if depth > len(CMS_MULTS):
        raise ValueError(f"depth > {len(CMS_MULTS)} needs more CMS_MULTS")
    shift = np.uint64(64 - int(width).bit_length() + 1)
    h = hash64(tokens)
    out = np.empty((depth, len(tokens)), dtype=np.int64)
    for j in range(depth):
        out[j] = ((h * np.uint64(CMS_MULTS[j])) >> shift).astype(np.int64)
    return out


def cms_add(cms: np.ndarray, tokens, counts: np.ndarray) -> np.ndarray:
    """Fold weighted token counts into a (depth, width) CMS, vectorized
    per row with ``np.add.at``."""
    if len(tokens) == 0:
        return cms
    buckets = cms_buckets(tokens, cms.shape[0], cms.shape[1])
    for j in range(cms.shape[0]):
        np.add.at(cms[j], buckets[j], counts)
    return cms


def cms_query(cms: np.ndarray, tokens) -> np.ndarray:
    """Point estimates: min over rows of the bucket counters (the CMS
    guarantee: est >= true, overshoot bounded by collisions)."""
    if len(tokens) == 0:
        return np.empty(0, dtype=np.int64)
    buckets = cms_buckets(tokens, cms.shape[0], cms.shape[1])
    ests = np.stack(
        [cms[j][buckets[j]] for j in range(cms.shape[0])], axis=0
    )
    return ests.min(axis=0).astype(np.int64)


# -- Bloom filter -----------------------------------------------------------

BLOOM_K = 4
BLOOM_M = 8192


def bloom_positions(
    tokens, k: int = BLOOM_K, m: int = BLOOM_M
) -> np.ndarray:
    """(k, n) bit positions for ``tokens`` — exactly the CMS bucket
    scheme (one md5 per token, per-row multiplicative high-bit mixing),
    so the same DuckDB expression reproduces it bit-exactly. ``k`` is
    bounded by ``len(CMS_MULTS)``."""
    return cms_buckets(tokens, k, m)


def bloom_add(bits: np.ndarray, tokens) -> np.ndarray:
    """Set the ``k`` positions of every token in a boolean bit array
    of length ``m``. Register-style mergeable: union of partials ==
    partial of the union."""
    if len(tokens):
        bits[bloom_positions(tokens, k=BLOOM_K, m=len(bits)).ravel()] = True
    return bits


def bloom_query(bits: np.ndarray, tokens) -> np.ndarray:
    """Membership probe: True iff ALL k positions are set (no false
    negatives; false-positive rate ~= fill_fraction**k)."""
    if len(tokens) == 0:
        return np.empty(0, dtype=bool)
    pos = bloom_positions(tokens, k=BLOOM_K, m=len(bits))
    return bits[pos].all(axis=0)
