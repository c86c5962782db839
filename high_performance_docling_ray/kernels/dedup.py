"""Near-duplicate signatures: MinHash, SimHash, LSH banding.

Vectorized numpy kernels used by the dedup pipelines
(``pipelines/dedup.py``). Signatures are computed per batch inside
``map_batches``; the only shuffle is the groupby on band/bucket keys.

MinHash/LSH per Broder (1997) / Leskovec-Rajaraman-Ullman ch.3;
SimHash per Charikar (2002).
"""

from __future__ import annotations

import hashlib

import numpy as np

from .text_stats import ngram_set

_MERSENNE = (1 << 61) - 1


def _hash64(token: str) -> int:
    """64-bit token hash: first 8 md5 bytes, little-endian — exactly
    DuckDB's ``md5_number_upper``, so the MinHash/SimHash oracles in
    ``__ray_entry__.oracle_sql`` can reproduce signatures in SQL."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "little")


class MinHasher:
    """num_perm universal-hash MinHash over word-shingle sets.

    Deterministic: permutation parameters derive from ``seed``.
    Stateful setup (parameter arrays) happens once per actor in the
    stage's ``__init__``.
    """

    # Permutation family: x -> a*x + b (mod 2^64) with a ODD is a
    # BIJECTION of the 64-bit universe (Dietzfelbinger multiply-shift
    # hashing), which is exactly what min-wise hashing needs. The
    # wraparound is the point: a modulus the products never reach
    # (e.g. a*h+b < p) would make every "permutation" order-preserving
    # — identical min for all perms — and a modulus the products
    # overflow PAST 64 bits would corrupt the family. uint64 arithmetic
    # in numpy wraps mod 2^64 by construction.

    def __init__(self, num_perm: int = 64, ngram: int = 3, seed: int = 7) -> None:
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.ngram = ngram
        half = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
        self.a = half * np.uint64(2) + np.uint64(1)  # odd multipliers
        self.b = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        shingles = ngram_set(text, self.ngram)
        if not shingles:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, np.uint64)
        hv = np.fromiter(
            (_hash64(s) for s in sorted(shingles)), np.uint64, len(shingles)
        )
        # (P, S) permuted hashes -> per-permutation min; uint64 wraps
        ph = self.a[:, None] * hv[None, :] + self.b[:, None]
        return ph.min(axis=1)

    def signatures(self, texts: list[str]) -> np.ndarray:
        return np.stack([self.signature(t) for t in texts]) if texts else np.zeros(
            (0, self.num_perm), np.uint64
        )

    def band_keys(self, sig: np.ndarray, bands: int = 16) -> list[str]:
        """LSH band bucket keys: hash of each band's slice of the signature."""
        rows = self.num_perm // bands
        keys = []
        for b in range(bands):
            chunk = sig[b * rows : (b + 1) * rows].tobytes()
            digest = hashlib.blake2b(chunk, digest_size=8).hexdigest()
            keys.append(f"{b}:{digest}")
        return keys

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float(np.mean(sig_a == sig_b))


def simhash64(text: str, ngram: int = 3) -> int:
    """64-bit SimHash over word shingles."""
    shingles = ngram_set(text, ngram)
    if not shingles:
        return 0
    hv = np.fromiter(
        (_hash64(s) for s in sorted(shingles)), np.uint64, len(shingles)
    )
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    counts = bits.sum(axis=0)
    vote = counts * 2 - len(hv)
    out = 0
    for bit in np.nonzero(vote > 0)[0]:
        out |= 1 << int(bit)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_bucket_keys(h: int, blocks: int = 4) -> list[str]:
    """Split the 64-bit simhash into ``blocks`` segments; near-dups
    within Hamming distance blocks-1 share at least one segment key."""
    width = 64 // blocks
    mask = (1 << width) - 1
    return [f"{i}:{(h >> (i * width)) & mask:x}" for i in range(blocks)]
