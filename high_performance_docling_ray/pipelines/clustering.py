"""Distributed k-means over the embedding corpus.

The corpus-curation use: cluster document embeddings to stratify /
cap / rebalance a pretraining mix (SemDeDup-style pruning starts
exactly here). Reference scope never needed it; a 100-TB pipeline
does.

Scale shape (the same register discipline as ``label_centroids``):

- Centroids are (k x D) — a constructor constant, broadcast via
  ``ray.put`` unconditionally (independent of corpus size).
- Each Lloyd sweep is ONE ``map_batches`` pass emitting per-batch
  (cluster, count, vector-sum) register partials — at most k rows per
  block regardless of block size — merged on the driver. Vectors
  never ride an exchange; there is no groupby at all.
- Deterministic: init is the k lowest vec_ids (reproducible in SQL),
  assignment ties break to the lowest cluster index (``np.argmin``
  == SQL ``row_number() ORDER BY d2, cl``), empty clusters keep their
  previous centroid on both sides.

At 10^12 vectors one sweep is one full read; ``iters`` stays small
(mini-batch k-means over a hash sample is the cheaper refinement —
``build_ivf_index`` already trains that way; this is the exact
full-corpus variant with a driver-gate oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from .similarity import _batch_matrix, read_embeddings


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    """The k lowest vec_ids, read driver-direct with pyarrow (small
    side; no Ray operator spin-up — the q3/q5 lesson)."""
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    import pyarrow.compute as pc

    tbl = tbl.filter(pc.less(tbl.column("vec_id"), k))
    tbl = tbl.sort_by("vec_id")
    return np.array(tbl.column("embedding").to_pylist(), np.float64)


def _sq_dists(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """(n x k) squared euclidean distances, computed per-cluster as a
    direct sum of squares (matches the SQL oracle's dim-join SUM to
    float64 rounding, unlike the |x|^2 - 2xC expansion)."""
    n, k = len(mat), len(cents)
    d2 = np.empty((n, k), np.float64)
    for c in range(k):
        diff = mat - cents[c]
        d2[:, c] = np.einsum("ij,ij->i", diff, diff)
    return d2


def kmeans_assign(
    sf_dir: str, k: int = 8, iters: int = 2, carry_embedding: bool = False
) -> ray.data.Dataset:
    """``iters`` synchronous Lloyd sweeps from the deterministic init,
    then a final assignment pass: (vec_id, cluster, dist2 round6).
    ``carry_embedding=True`` keeps the vector column on the output rows
    (for consumers like ``semdedup`` that need the payload grouped by
    cluster — cheaper than a post-hoc join back onto the table the
    assignment just read)."""
    ds = read_embeddings(sf_dir).materialize()
    cents = _init_centroids(sf_dir, k)

    for _ in range(iters):
        cents_ref = ray.put(cents)

        def sweep_partial(batch: pa.Table) -> pa.Table:
            cts = ray.get(cents_ref)
            _, mat = _batch_matrix(batch)
            mat = mat.astype(np.float64, copy=False)
            assign = np.argmin(_sq_dists(mat, cts), axis=1)
            uniq, inv = np.unique(assign, return_inverse=True)
            sums = np.zeros((len(uniq), mat.shape[1]), np.float64)
            np.add.at(sums, inv, mat)
            cnt = np.bincount(inv).astype(np.int64)
            return pa.Table.from_pydict(
                {
                    "cl": pa.array(uniq, pa.int64()),
                    "n": pa.array(cnt, pa.int64()),
                    "vec_sum": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        parts = [
            t
            for t in ray.get(
                ds.map_batches(sweep_partial, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        sums = np.zeros((k, cents.shape[1]), np.float64)
        counts = np.zeros(k, np.int64)
        for t in parts:
            cls = t.column("cl").to_numpy(zero_copy_only=False)
            counts[cls] += t.column("n").to_numpy(zero_copy_only=False)
            sums[cls] += np.array(t.column("vec_sum").to_pylist(), np.float64)
        filled = counts > 0
        new_cents = cents.copy()  # empty clusters keep their centroid
        new_cents[filled] = sums[filled] / counts[filled, None]
        cents = new_cents

    cents_ref = ray.put(cents)

    def final_assign(batch: pa.Table) -> pa.Table:
        cts = ray.get(cents_ref)
        ids, mat = _batch_matrix(batch)
        mat = mat.astype(np.float64, copy=False)
        d2 = _sq_dists(mat, cts)
        assign = np.argmin(d2, axis=1)
        best = d2[np.arange(len(mat)), assign]
        cols = {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(assign.astype(np.int64), pa.int64()),
            "dist2": pa.array(np.round(best, 6), pa.float64()),
        }
        if carry_embedding:
            cols["embedding"] = batch.column("embedding")
        return pa.Table.from_pydict(cols)

    return ds.map_batches(final_assign, batch_format="pyarrow")


def _train_pq(
    ds: ray.data.Dataset, sf_dir: str, m: int, k: int, iters: int
) -> np.ndarray:
    """Train the (m x k x D/m) product-quantization codebook: ``m``
    independent k-means over contiguous D/m-dim subspaces, FUSED so
    each Lloyd sweep is ONE ``map_batches`` pass emitting at most m*k
    (subspace, cluster, count, vector-sum) register rows per block.
    Determinism matches ``kmeans_assign``: init = the k lowest
    vec_ids (sliced per subspace), argmin ties -> lowest code, empty
    clusters keep their codeword."""
    init = _init_centroids(sf_dir, k)  # (k, D)
    d = init.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub_d = d // m
    # cents[s] is the (k, sub_d) codebook of subspace s
    cents = np.stack([init[:, s * sub_d : (s + 1) * sub_d] for s in range(m)])

    for _ in range(iters):
        cents_ref = ray.put(cents)

        def sweep_partial(batch: pa.Table) -> pa.Table:
            cb = ray.get(cents_ref)
            _, mat = _batch_matrix(batch)
            mat = mat.astype(np.float64, copy=False)
            subs, cls, ns, sums = [], [], [], []
            for s in range(m):
                sub = mat[:, s * sub_d : (s + 1) * sub_d]
                assign = np.argmin(_sq_dists(sub, cb[s]), axis=1)
                uniq, inv = np.unique(assign, return_inverse=True)
                acc = np.zeros((len(uniq), sub_d), np.float64)
                np.add.at(acc, inv, sub)
                subs.append(np.full(len(uniq), s, np.int64))
                cls.append(uniq.astype(np.int64))
                ns.append(np.bincount(inv).astype(np.int64))
                sums.extend(acc)
            return pa.Table.from_pydict(
                {
                    "sub": pa.array(np.concatenate(subs), pa.int64()),
                    "cl": pa.array(np.concatenate(cls), pa.int64()),
                    "n": pa.array(np.concatenate(ns), pa.int64()),
                    "vec_sum": pa.array(sums, pa.list_(pa.float64())),
                }
            )

        parts = [
            t
            for t in ray.get(
                ds.map_batches(sweep_partial, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
            if t.num_rows and "sub" in t.column_names
        ]
        sums = np.zeros((m, k, sub_d), np.float64)
        counts = np.zeros((m, k), np.int64)
        for t in parts:
            ss = t.column("sub").to_numpy(zero_copy_only=False)
            cc = t.column("cl").to_numpy(zero_copy_only=False)
            counts[ss, cc] += t.column("n").to_numpy(zero_copy_only=False)
            sums[ss, cc] += np.array(
                t.column("vec_sum").to_pylist(), np.float64
            )
        filled = counts > 0
        new_cents = cents.copy()  # empty clusters keep their codeword
        new_cents[filled] = sums[filled] / counts[filled][:, None]
        cents = new_cents
    return cents


def _pq_assign(mat: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(n x m) int64 codes: per-subspace nearest codeword, argmin
    ties -> lowest code (same rule as ``kmeans_assign``)."""
    m, _, sub_d = cb.shape
    codes = np.empty((len(mat), m), np.int64)
    for s in range(m):
        sub = mat[:, s * sub_d : (s + 1) * sub_d]
        codes[:, s] = np.argmin(_sq_dists(sub, cb[s]), axis=1)
    return codes


def pq_codes(
    sf_dir: str, m: int = 4, k: int = 4, iters: int = 2
) -> ray.data.Dataset:
    """Product quantization (Jegou et al. 2011): split each D-dim
    embedding into ``m`` contiguous subspaces of D/m dims and run an
    independent k-means (``k`` codewords) in each; a vector's code is
    its per-subspace nearest codeword. PQ codes are the memory-bound
    scale path for billion-vector ANN (an IVF-PQ index stores m bytes
    per vector instead of 4D) — ``build_ivf_index`` covers the
    coarse quantizer, this is the fine one.

    Scale shape — see ``_train_pq``: vectors never ride an exchange;
    m and k are constructor constants so the codebook broadcasts
    unconditionally. All m subspace trainings cost the same corpus
    reads as ONE k-means.

    Output long format (vec_id, sub, code, dist2 round6) — dist2 is
    the subspace reconstruction error, so SUM(dist2) per vec_id is
    the vector's total quantization error.
    """
    ds = read_embeddings(sf_dir).materialize()
    cents = _train_pq(ds, sf_dir, m, k, iters)
    sub_d = cents.shape[2]
    cents_ref = ray.put(cents)

    def final_assign(batch: pa.Table) -> pa.Table:
        cb = ray.get(cents_ref)
        ids, mat = _batch_matrix(batch)
        mat = mat.astype(np.float64, copy=False)
        out_ids, out_sub, out_code, out_d2 = [], [], [], []
        for s in range(m):
            sub = mat[:, s * sub_d : (s + 1) * sub_d]
            d2 = _sq_dists(sub, cb[s])
            assign = np.argmin(d2, axis=1)
            out_ids.append(ids)
            out_sub.append(np.full(len(ids), s, np.int64))
            out_code.append(assign.astype(np.int64))
            out_d2.append(d2[np.arange(len(sub)), assign])
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "sub": pa.array(np.concatenate(out_sub), pa.int64()),
                "code": pa.array(np.concatenate(out_code), pa.int64()),
                "dist2": pa.array(
                    np.round(np.concatenate(out_d2), 6), pa.float64()
                ),
            }
        )

    return ds.map_batches(final_assign, batch_format="pyarrow")


def knn_pq_adc(
    sf_dir: str,
    n_queries: int = 3,
    topk: int = 10,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
) -> pa.Table:
    """Asymmetric-distance (ADC) top-k search over PQ codes (Jegou et
    al. 2011 §IV): approximate d²(q, x) = Σ_s ||q_s − c_{s,code_s(x)}||²
    — the query stays un-quantized, every corpus vector collapses to
    its m codes, and the per-query cost is a (m × k) lookup table plus
    one table lookup per (vector, subspace). This is the scan that
    makes a billion-vector index RAM-resident: at 10^12 vectors the
    probe reads m bytes/vector instead of 4D.

    Scale shape: the codebook and the (n_queries × m × k) LUT are
    driver constants broadcast once via ``ray.put``; each block
    computes its codes (same argmin rule as ``pq_codes``), gathers
    LUT entries, and emits only its local top-k per query — k ×
    n_queries rows per block, merged in one tiny driver sort. ADC
    distances are block-independent (they depend only on codes + LUT),
    so per-block round-then-merge is exact.

    Determinism: adist rounded to 6dp BEFORE ranking on both sides;
    ties break by vec_id asc. Queries are the ``n_queries`` lowest
    vec_ids (query vectors are NOT excluded from their own result —
    the oracle keeps them too).
    """
    ds = read_embeddings(sf_dir).materialize()
    cents = _train_pq(ds, sf_dir, m, k, iters)  # (m, k, sub_d)
    sub_d = cents.shape[2]
    queries = _init_centroids(sf_dir, n_queries)  # (nq, D)
    lut = np.empty((n_queries, m, k), np.float64)
    for s in range(m):
        qs = queries[:, s * sub_d : (s + 1) * sub_d]
        lut[:, s, :] = _sq_dists(qs, cents[s])
    bcast = ray.put((cents, lut))

    def local_topk(batch: pa.Table) -> pa.Table:
        cb, lt = ray.get(bcast)
        ids, mat = _batch_matrix(batch)
        mat = mat.astype(np.float64, copy=False)
        codes = _pq_assign(mat, cb)  # (n, m)
        adist = np.zeros((n_queries, len(ids)), np.float64)
        for s in range(m):
            adist += lt[:, s, codes[:, s]]
        adist = np.round(adist, 6)
        out_q, out_v, out_d = [], [], []
        kk = min(topk, len(ids))
        for qi in range(n_queries):
            order = np.lexsort((ids, adist[qi]))[:kk]
            out_q.append(np.full(kk, qi, np.int64))
            out_v.append(ids[order])
            out_d.append(adist[qi][order])
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "adist": pa.array(np.concatenate(out_d), pa.float64()),
            }
        )

    rows = ds.map_batches(local_topk, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["query_id"], r["adist"], r["vec_id"]))
    out_q, out_v, out_d = [], [], []
    for qi in range(n_queries):
        per = [r for r in rows if r["query_id"] == qi][:topk]
        out_q.extend(r["query_id"] for r in per)
        out_v.extend(r["vec_id"] for r in per)
        out_d.extend(r["adist"] for r in per)
    return pa.Table.from_pydict(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "adist": pa.array(out_d, pa.float64()),
        }
    )


def semdedup(
    sf_dir: str, k: int = 8, iters: int = 2, tau: float = 0.4
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication that makes all-pairs cosine tractable by only
    comparing WITHIN k-means clusters. A vector is dropped when some
    lower-vec_id member of its own cluster has cosine > ``tau`` with
    it (deterministic keep-lowest-id rule). Returns
    (vec_id, cluster, keep) for every vector.

    Scale shape: clustering is the no-shuffle register pass above;
    then ONE payload exchange groups vectors by cluster and the
    pairwise check runs inside ``map_groups`` as a single normalized
    gram matrix per cluster. The cluster-size cap IS k — at corpus
    scale you raise k so |cluster| ~ corpus/k stays matmul-sized
    (SemDeDup's own design), or recurse: re-cluster an oversized
    cluster with a second hash-salted k-means before the pairwise.
    """
    attached = kmeans_assign(
        sf_dir, k=k, iters=iters, carry_embedding=True
    ).select_columns(["vec_id", "cluster", "embedding"])

    def prune(group: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(group)
        order = np.argsort(ids, kind="stable")
        ids, mat = ids[order], mat[order]
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        nm = mat / norms
        gram = nm @ nm.T
        n = len(ids)
        # drop i if any j < i (by vec_id order) with cos > tau
        drop = np.zeros(n, bool)
        iu = np.triu_indices(n, 1)
        hit = gram[iu] > tau
        if hit.any():
            drop_idx = np.unique(iu[1][hit])
            drop[drop_idx] = True
        cluster = group.column("cluster").take(pa.array(order))
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": cluster,
                "keep": pa.array(~drop, pa.bool_()),
            }
        )

    return attached.groupby("cluster").map_groups(
        prune, batch_format="pyarrow"
    )
