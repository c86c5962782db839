"""Algebraic proof: incremental KV-cache attention == full attention.

The reference ships this as a torch unit proof
(`/root/reference/test_kv_cache_math.py:12-159`) to justify its batched
autoregressive decoder's caching. Our engine stubs the transformer, but
the decoding SEMANTICS the stub stands in for are documented by the
same algebraic identity, proved here in numpy: decoding step-by-step
with cached keys/values produces the same outputs as recomputing full
attention over the whole prefix at every step.
"""

import numpy as np


def _softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def full_causal_attention(q, k, v):
    """(T,D) causal self-attention, recomputed from scratch."""
    t, d = q.shape
    scores = (q @ k.T) / np.sqrt(d)
    mask = np.triu(np.ones((t, t), dtype=bool), k=1)
    scores = np.where(mask, -np.inf, scores)
    return _softmax(scores, axis=-1) @ v


def kv_cache_attention(q, k, v):
    """Same computation, one query row at a time with cached K/V."""
    t, d = q.shape
    outs = []
    k_cache = np.zeros((0, d))
    v_cache = np.zeros((0, d))
    for step in range(t):
        k_cache = np.vstack([k_cache, k[step : step + 1]])
        v_cache = np.vstack([v_cache, v[step : step + 1]])
        scores = (q[step : step + 1] @ k_cache.T) / np.sqrt(d)
        outs.append(_softmax(scores, axis=-1) @ v_cache)
    return np.vstack(outs)


def test_kv_cache_equals_full_attention():
    rng = np.random.RandomState(0)
    for t, d in ((1, 8), (5, 16), (32, 32)):
        q = rng.randn(t, d)
        k = rng.randn(t, d)
        v = rng.randn(t, d)
        full = full_causal_attention(q, k, v)
        cached = kv_cache_attention(q, k, v)
        assert np.max(np.abs(full - cached)) < 1e-12


def test_kv_cache_batched_consistency():
    """Batched decode (several sequences at once) equals per-sequence
    decode — the property the reference's batched_decoder relies on."""
    rng = np.random.RandomState(1)
    seqs = [(rng.randn(7, 16), rng.randn(7, 16), rng.randn(7, 16))
            for _ in range(4)]
    individual = [kv_cache_attention(q, k, v) for q, k, v in seqs]
    # "batched": same math over a stacked batch axis
    qb = np.stack([s[0] for s in seqs])
    kb = np.stack([s[1] for s in seqs])
    vb = np.stack([s[2] for s in seqs])
    t, d = qb.shape[1], qb.shape[2]
    outs = np.zeros_like(qb)
    for step in range(t):
        kc = kb[:, : step + 1]
        vc = vb[:, : step + 1]
        scores = np.einsum("bd,bsd->bs", qb[:, step], kc) / np.sqrt(d)
        w = _softmax(scores, axis=-1)
        outs[:, step] = np.einsum("bs,bsd->bd", w, vc)
    for b, ind in enumerate(individual):
        assert np.max(np.abs(outs[b] - ind)) < 1e-12
