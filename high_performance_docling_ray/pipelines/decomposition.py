"""Distributed embedding decomposition: covariance + PCA projection.

Corpus-curation use: whitening / dimensionality reduction of document
embeddings before clustering or SemDeDup-style pruning (a (D x D)
covariance is the sufficient statistic for PCA, and PCA-reduced
vectors make the IVF / k-means passes in ``similarity.py`` /
``clustering.py`` cheaper at the same recall). The reference scope
never needed it; a 100-TB embedding corpus does.

Scale shape (register discipline, same as ``label_centroids`` /
``kmeans_assign``):

- ONE ``map_batches`` pass emits per-block moment partials — count,
  per-dim sums, and the flattened (D x D) sum of outer products — at
  most ONE row per block regardless of block size. D is a constructor
  constant (64 here), so a partial is ~32 KiB; vectors never ride an
  exchange and there is no groupby at all.
- The driver folds partials into the population covariance
  cov = E[xy] - E[x]E[y] (a few thousand doubles) and, for PCA,
  eigendecomposes it locally — O(D^3), independent of corpus size.
- The projection back over the corpus is a pure vectorized map
  against the broadcast (D x k) basis: zero exchanges end to end.

Determinism: partials are float64 sums folded in block order; the
covariance is rounded to 6dp (the established oracle tolerance — SQL
SUM associates differently). Eigenvector sign is fixed by making each
vector's largest-|component| (lowest index on ties) positive, so the
projection is reproducible across runs and platforms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .similarity import _batch_matrix, read_embeddings


def _moment_partials(sf_dir: str) -> tuple[int, np.ndarray, np.ndarray]:
    """Fold per-block (n, sum_x, sum_xy) registers on the driver.

    Returns (n, sums[D], prods[D, D]).
    """
    ds = read_embeddings(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        _, mat = _batch_matrix(batch)
        mat = mat.astype(np.float64, copy=False)
        sums = mat.sum(axis=0)
        prods = mat.T @ mat
        return pa.Table.from_pydict(
            {
                "n": pa.array([len(mat)], pa.int64()),
                "sum_x": pa.array([sums], pa.list_(pa.float64())),
                "sum_xy": pa.array([prods.ravel()], pa.list_(pa.float64())),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows and "n" in t.column_names
    ]
    if not parts:
        raise ValueError(f"no embeddings under {sf_dir}")
    n = 0
    sums: np.ndarray | None = None
    prods: np.ndarray | None = None
    for t in parts:
        n += int(t.column("n").to_numpy(zero_copy_only=False).sum())
        s = np.array(t.column("sum_x").to_pylist(), np.float64).sum(axis=0)
        p = np.array(t.column("sum_xy").to_pylist(), np.float64).sum(axis=0)
        sums = s if sums is None else sums + s
        prods = p if prods is None else prods + p
    d = len(sums)
    return n, sums, prods.reshape(d, d)


def _covariance(sf_dir: str) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean[D], population covariance[D, D]) from one corpus pass."""
    n, sums, prods = _moment_partials(sf_dir)
    mean = sums / n
    cov = prods / n - np.outer(mean, mean)
    return n, mean, cov


def embedding_covariance(sf_dir: str) -> pa.Table:
    """Long-format upper triangle of the population covariance matrix:
    (i, j, cov) with 1-based dims i <= j, cov rounded to 6dp.

    The output is O(D^2) rows (2 080 at D=64) — a driver-side table by
    construction, like ``label_centroids``.
    """
    _, _, cov = _covariance(sf_dir)
    d = cov.shape[0]
    iu = np.triu_indices(d)
    return pa.Table.from_pydict(
        {
            "i": pa.array((iu[0] + 1).astype(np.int64), pa.int64()),
            "j": pa.array((iu[1] + 1).astype(np.int64), pa.int64()),
            "cov": pa.array(np.round(cov[iu], 6), pa.float64()),
        }
    )


def pca_basis(sf_dir: str, k: int = 8) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean[D], basis[D, k], eigenvalues[k]) — top-k principal
    components of the population covariance, deterministically
    sign-fixed (largest-|component|, lowest index on ties, positive).
    """
    _, mean, cov = _covariance(sf_dir)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals, kind="stable")[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    for c in range(vecs.shape[1]):
        v = vecs[:, c]
        pivot = int(np.argmax(np.abs(v)))  # first index on ties
        if v[pivot] < 0:
            vecs[:, c] = -v
    return mean, vecs, vals


def pca_project(sf_dir: str, k: int = 8) -> ray.data.Dataset:
    """Project every embedding onto the top-k principal components:
    (vec_id, pc list<double> len k, round 6).

    No SQL oracle (eigendecomposition is not SQL-expressible) — pinned
    by pytest instead: exact equality with a serial numpy
    recomputation, per-component variance == eigenvalue, basis
    orthonormality, and cross-run determinism.
    """
    mean, basis, _ = pca_basis(sf_dir, k=k)
    proj_ref = ray.put((mean, basis))

    def project(batch: pa.Table) -> pa.Table:
        mu, w = ray.get(proj_ref)
        ids, mat = _batch_matrix(batch)
        y = (mat.astype(np.float64, copy=False) - mu) @ w
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "pc": pa.array(list(np.round(y, 6)), pa.list_(pa.float64())),
            }
        )

    return read_embeddings(sf_dir).map_batches(project, batch_format="pyarrow")


def random_projection(sf_dir: str, k: int = 16) -> ray.data.Dataset:
    """Johnson-Lindenstrauss sign random projection (Achlioptas 2003):
    y = x @ R / sqrt(k) with R[i, j] in {+1, -1}. Unlike PCA this
    needs NO training pass — the matrix is a pure function of (i, j),
    so at 10^12 vectors the whole operator is one stateless
    ``map_batches`` with a broadcast (D x k) sign matrix: zero
    exchanges, zero corpus-dependent state.

    The sign is md5-derived (``hash64("rp:i:j") % 2``, 1-based dims ==
    DuckDB ``md5_number_upper('rp:' || i || ':' || j) % 2``) so the
    driver-gate oracle rebuilds the identical matrix in SQL. Output
    long format (vec_id, j, y round6).
    """
    from ..kernels.sketch import hash64

    d = _init_centroids_dim(sf_dir)
    keys = [f"rp:{i}:{j}" for i in range(1, d + 1) for j in range(1, k + 1)]
    signs = np.where(hash64(keys) % 2 == 0, 1.0, -1.0).reshape(d, k)
    r_ref = ray.put(signs)

    def project(batch: pa.Table) -> pa.Table:
        r = ray.get(r_ref)
        ids, mat = _batch_matrix(batch)
        # sum-then-scale, matching the oracle's SUM(x*sign)/sqrt(k)
        y = np.round(mat.astype(np.float64, copy=False) @ r / np.sqrt(k), 6)
        n, kk = y.shape
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(np.repeat(ids, kk), pa.int64()),
                "j": pa.array(np.tile(np.arange(1, kk + 1), n), pa.int64()),
                "y": pa.array(y.ravel(), pa.float64()),
            }
        )

    return read_embeddings(sf_dir).map_batches(project, batch_format="pyarrow")


def _init_centroids_dim(sf_dir: str) -> int:
    """Embedding dimensionality from one driver-direct row."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    first = next(f.iter_batches(batch_size=1, columns=["embedding"]))
    return len(first.column("embedding")[0])


def embedding_outliers(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k per-dimension z-score outliers — the embedding-sanity
    screen a curation run fires before trusting vectors for dedup /
    retrieval (a bad encoder shard shows up as dimension blowouts).

    Pass 1 reuses the covariance moment registers (``_covariance``:
    per-block (n, sum, sum_xy) partials, driver fold). Pass 2 is a
    pure map: z = max_d |x_d - mu_d| / sigma_d per vector, per-block
    top-k, driver merge of k rows per block (the knn_brute pattern).

    Returns (vec_id, z) sorted by z desc, vec_id asc.
    """
    import pyarrow.compute as pc

    _, mean, cov = _covariance(sf_dir)
    sigma = np.sqrt(np.maximum(np.diag(cov), 0.0))
    sigma = np.where(sigma == 0.0, 1.0, sigma)
    ref = ray.put((mean, sigma))

    def local_topk(batch: pa.Table) -> pa.Table:
        mu, sd = ray.get(ref)
        ids, mat = _batch_matrix(batch)
        z = (np.abs(mat - mu) / sd).max(axis=1)
        kk = min(k, len(ids))
        part = (
            np.argpartition(-z, kk - 1)[:kk] if kk else np.array([], int)
        )
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[part], pa.int64()),
                "z": pa.array(z[part], pa.float64()),
            }
        )

    rows = (
        read_embeddings(sf_dir)
        .map_batches(local_topk, batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: (-r["z"], r["vec_id"]))
    top = rows[:k]
    del pc
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array([r["vec_id"] for r in top], pa.int64()),
            "z": pa.array([round(r["z"], 6) for r in top], pa.float64()),
        }
    )
