"""Similarity search over the ``embeddings`` table (list<float> column).

* ``knn_brute`` — brute-force cosine top-k: the query matrix is tiny
  and broadcast once via ``ray.put``; each Arrow batch does one
  float64 matmul (vectorized numpy), emits its local top-k, and a
  final small sort picks the global top-k. Streaming: the corpus side
  never materializes.
* ``knn_ivf`` — the scale path: k-means-lite coarse quantizer (trained
  on a sample), per-batch assignment to nearest centroids, probe only
  ``nprobe`` inverted lists. Same output contract as brute force on
  well-separated data; documented approximation otherwise.
* ``embedding_neardup_pairs`` — cosine >= threshold near-duplicate
  pairs via bucketed sign-LSH with exact verification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def read_embeddings(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """list<float> column -> (N, D) float64 without a Python round-trip.

    The Arrow list values buffer is contiguous when every row has the
    same dimension (our embeddings do), so flatten() + reshape is a
    single buffer view + one dtype cast; falls back to to_pylist for
    ragged input."""
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch.column("embedding").combine_chunks()
    n = len(col)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if n and (widths == widths[0]).all():
        flat = col.flatten().to_numpy(zero_copy_only=False)
        mat = np.asarray(flat, dtype=np.float64).reshape(n, int(widths[0]))
    else:
        mat = np.array(col.to_pylist(), dtype=np.float64).reshape(n, -1)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


def knn_brute(
    sf_dir: str, query: np.ndarray, k: int = 10
) -> pa.Table:
    """Global cosine top-k for one query vector.

    Returns (vec_id, cosine) sorted desc, ties broken by vec_id asc —
    the same ordering the oracle SQL uses.
    """
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, mat = _batch_matrix(batch)
        sims = _normalize(mat) @ qv
        kk = min(k, len(ids))
        part = np.argpartition(-sims, kk - 1)[:kk] if kk else np.array([], int)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[part], pa.int64()),
                "cosine": pa.array(np.round(sims[part], 6), pa.float64()),
            }
        )

    local = read_embeddings(sf_dir).map_batches(local_topk, batch_format="pyarrow")
    # Global reduce: local top-k rows are tiny (k per block).
    rows = local.take_all()
    rows.sort(key=lambda r: (-r["cosine"], r["vec_id"]))
    top = rows[:k]
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], pa.int64()),
            "cosine": pa.array([r["cosine"] for r in top], pa.float64()),
        }
    )


class IvfIndex:
    """Coarse quantizer trained once (per driver) and broadcast to the
    probe stage. Deterministic: seeded k-means-lite (a few Lloyd
    iterations over a fixed sample)."""

    def __init__(self, centroids: np.ndarray) -> None:
        self.centroids = _normalize(centroids)

    @classmethod
    def train(cls, sample: np.ndarray, n_lists: int = 16, iters: int = 5,
              seed: int = 0) -> "IvfIndex":
        rng = np.random.RandomState(seed)
        sample = _normalize(np.asarray(sample, dtype=np.float64))
        picks = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
        centroids = sample[np.sort(picks)].copy()
        for _ in range(iters):
            assign = np.argmax(sample @ centroids.T, axis=1)
            for c in range(len(centroids)):
                members = sample[assign == c]
                if len(members):
                    centroids[c] = members.mean(axis=0)
            centroids = _normalize(centroids)
        return cls(centroids)

    def probe_lists(self, q: np.ndarray, nprobe: int) -> np.ndarray:
        sims = self.centroids @ (q / (np.linalg.norm(q) or 1.0))
        return np.argsort(-sims, kind="stable")[:nprobe]


def knn_ivf(
    sf_dir: str, query: np.ndarray, k: int = 10, n_lists: int = 16, nprobe: int = 4
) -> pa.Table:
    """IVF-bucketed ANN: probe only ``nprobe`` of ``n_lists`` coarse
    cells. The index is trained on a driver-side sample (small) and
    broadcast; the corpus streams through assignment+filter+topk."""
    sample_rows = read_embeddings(sf_dir).limit(2048).take_all()
    sample = np.array([r["embedding"] for r in sample_rows], dtype=np.float64)
    index = IvfIndex.train(sample, n_lists=n_lists)
    q = np.asarray(query, dtype=np.float64)
    probes = set(index.probe_lists(q, nprobe).tolist())
    qn = q / (np.linalg.norm(q) or 1.0)
    state_ref = ray.put((index.centroids, probes, qn))

    def probe_topk(batch: pa.Table) -> pa.Table:
        centroids, probe_set, qv = ray.get(state_ref)
        ids, mat = _batch_matrix(batch)
        nm = _normalize(mat)
        assign = np.argmax(nm @ centroids.T, axis=1)
        mask = np.isin(assign, list(probe_set))
        if not mask.any():
            return pa.Table.from_pydict(
                {"vec_id": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        sims = nm[mask] @ qv
        sel_ids = ids[mask]
        kk = min(k, len(sel_ids))
        part = np.argpartition(-sims, kk - 1)[:kk]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(sel_ids[part], pa.int64()),
                "cosine": pa.array(np.round(sims[part], 6), pa.float64()),
            }
        )

    rows = read_embeddings(sf_dir).map_batches(
        probe_topk, batch_format="pyarrow"
    ).take_all()
    rows.sort(key=lambda r: (-r["cosine"], r["vec_id"]))
    top = rows[:k]
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], pa.int64()),
            "cosine": pa.array([r["cosine"] for r in top], pa.float64()),
        }
    )


def embedding_neardup_pairs(
    sf_dir: str, threshold: float = 0.95, n_planes: int = 8, seed: int = 3
) -> ray.data.Dataset:
    """Cosine near-dup pairs via sign-LSH buckets + exact verification.

    Random-hyperplane signatures bucket candidates; within a bucket the
    exact cosine verifies. Multi-probe (all 1-bit flips) keeps recall
    high at this threshold.
    """
    def sig_batch(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        # deterministic planes derived from the seed; cheap enough to
        # build per batch (D x n_planes gaussians)
        planes_local = np.random.RandomState(seed).randn(mat.shape[1], n_planes)
        nm = _normalize(mat)
        bits = (nm @ planes_local) > 0
        keys = [
            int("".join("1" if b else "0" for b in row), 2) for row in bits
        ]
        out_id, out_key = [], []
        for i, key in enumerate(keys):
            out_id.append(int(ids[i]))
            out_key.append(key)           # exact bucket
            for p in range(n_planes):      # multi-probe: 1-bit flips
                out_id.append(int(ids[i]))
                out_key.append(key ^ (1 << p))
        emb = np.repeat(nm, n_planes + 1, axis=0)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(out_id, pa.int64()),
                "bucket": pa.array(out_key, pa.int64()),
                "nemb": pa.array(list(emb), pa.list_(pa.float64())),
            }
        )


    def bucket_verify(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_pylist()
        mats = np.array(group.column("nemb").to_pylist(), dtype=np.float64)
        order = sorted(range(len(ids)), key=lambda i: ids[i])
        out_a, out_b, out_c = [], [], []
        seen = set()
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                a, b = ids[i], ids[j]
                if a == b or (a, b) in seen:
                    continue
                seen.add((a, b))
                cos = float(mats[i] @ mats[j])
                if cos >= threshold:
                    out_a.append(a)
                    out_b.append(b)
                    out_c.append(round(cos, 6))
        return pa.Table.from_pydict(
            {
                "vec_id_a": pa.array(out_a, pa.int64()),
                "vec_id_b": pa.array(out_b, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    pairs = (
        read_embeddings(sf_dir)
        .map_batches(sig_batch, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_verify, batch_format="pyarrow")
    )
    from .relational import _combine_partials

    merged = _combine_partials(
        pairs, ["vec_id_a", "vec_id_b"], ["cosine"], agg="max"
    )
    if merged is None:
        return pairs.groupby(["vec_id_a", "vec_id_b"]).max("cosine")
    return ray.data.from_arrow(merged)
