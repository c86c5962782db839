"""Embedding covariance / PCA / PQ: serial numpy recomputation pins
(exact covariance + PQ codes are additionally hash-verified by the
driver-gate oracle at sf0.01; PCA is rows-only by design — these pins
ARE its correctness evidence)."""

import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.clustering import (  # noqa: E402
    knn_pq_adc,
    pq_codes,
)
from high_performance_docling_ray.pipelines.decomposition import (  # noqa: E402
    embedding_covariance,
    pca_basis,
    pca_project,
    random_projection,
)
from high_performance_docling_ray.pipelines.text_analysis import (  # noqa: E402
    weighted_sample,
)

SF = "/root/testdata/sf0.001"


def _corpus() -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{SF}/embeddings.parquet").sort_by("vec_id")
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    mat = np.array(t.column("embedding").to_pylist(), np.float64)
    return ids, mat


def test_covariance_matches_serial_numpy():
    ids, mat = _corpus()
    cov = np.cov(mat, rowvar=False, bias=True)  # population
    out = embedding_covariance(SF).to_pandas()
    d = mat.shape[1]
    assert len(out) == d * (d + 1) // 2
    got = np.zeros((d, d))
    got[out["i"] - 1, out["j"] - 1] = out["cov"]
    iu = np.triu_indices(d)
    assert np.abs(got[iu] - cov[iu]).max() < 1.5e-6  # round-6 both


def test_pca_basis_orthonormal_and_sign_fixed():
    mean, basis, vals = pca_basis(SF, k=8)
    assert basis.shape == (64, 8)
    assert np.allclose(basis.T @ basis, np.eye(8), atol=1e-10)
    assert (vals[:-1] >= vals[1:]).all()  # descending
    for c in range(8):
        v = basis[:, c]
        assert v[int(np.argmax(np.abs(v)))] > 0  # sign rule


def test_pca_project_matches_serial_and_eigenvalues():
    ids, mat = _corpus()
    mean, basis, vals = pca_basis(SF, k=8)
    expect = np.round((mat - mat.mean(axis=0)) @ basis, 6)
    out = (
        pca_project(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    got = np.stack(out["pc"].to_numpy())
    assert (out["vec_id"].to_numpy() == ids).all()
    assert np.abs(got - expect).max() <= 1e-6
    # per-component variance of the projection == eigenvalue
    assert np.allclose(got.var(axis=0), vals, rtol=1e-4)
    # determinism across runs
    out2 = (
        pca_project(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert np.array_equal(got, np.stack(out2["pc"].to_numpy()))


def _serial_pq(mat: np.ndarray, m=4, k=4, iters=2):
    d = mat.shape[1]
    sub_d = d // m
    codes = np.zeros((len(mat), m), np.int64)
    d2s = np.zeros((len(mat), m))
    for s in range(m):
        sub = mat[:, s * sub_d : (s + 1) * sub_d]
        cents = sub[:k].copy()  # vec_id-sorted input -> lowest ids
        for _ in range(iters):
            dist = ((sub[:, None, :] - cents[None]) ** 2).sum(axis=2)
            a = np.argmin(dist, axis=1)
            for c in range(k):
                if (a == c).any():
                    cents[c] = sub[a == c].mean(axis=0)
        dist = ((sub[:, None, :] - cents[None]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(dist, axis=1)
        d2s[:, s] = dist[np.arange(len(sub)), codes[:, s]]
    return codes, d2s


def test_pq_codes_match_serial_lloyd():
    ids, mat = _corpus()
    codes, d2s = _serial_pq(mat)
    out = (
        pq_codes(SF)
        .to_pandas()
        .sort_values(["vec_id", "sub"])
        .reset_index(drop=True)
    )
    assert len(out) == len(mat) * 4
    got_codes = out["code"].to_numpy().reshape(len(mat), 4)
    got_d2 = out["dist2"].to_numpy().reshape(len(mat), 4)
    assert np.array_equal(got_codes, codes)
    assert np.abs(got_d2 - d2s).max() < 1.5e-6
    # total quantization error is small relative to raw energy
    energy = ((mat - mat.mean(axis=0)) ** 2).sum()
    assert got_d2.sum() < energy


def test_knn_pq_adc_matches_serial_lut_scan():
    """ADC top-k == a serial LUT scan over the serial-Lloyd codes:
    same codebooks, same argmin ties, round-6-before-rank, vec_id
    tiebreak. Also pins block-independence (distances don't depend on
    how Ray split the corpus) and cross-run determinism."""
    ids, mat = _corpus()
    m, k, sub_d, nq, topk = 4, 4, mat.shape[1] // 4, 3, 10
    codes, _ = _serial_pq(mat, m=m, k=k)
    # rebuild the trained codebooks the same serial way
    cents = np.zeros((m, k, sub_d))
    for s in range(m):
        sub = mat[:, s * sub_d : (s + 1) * sub_d]
        cb = sub[:k].copy()
        for _ in range(2):
            dist = ((sub[:, None, :] - cb[None]) ** 2).sum(axis=2)
            a = np.argmin(dist, axis=1)
            for c in range(k):
                if (a == c).any():
                    cb[c] = sub[a == c].mean(axis=0)
        cents[s] = cb
    queries = mat[np.argsort(ids, kind="stable")][:nq]
    expect_rows = []
    for qi in range(nq):
        adist = np.zeros(len(mat))
        for s in range(m):
            lut = ((queries[qi, s * sub_d : (s + 1) * sub_d] - cents[s]) ** 2).sum(
                axis=1
            )
            adist += lut[codes[:, s]]
        adist = np.round(adist, 6)
        order = np.lexsort((ids, adist))[:topk]
        expect_rows += [(qi, int(ids[i]), adist[i]) for i in order]
    out = knn_pq_adc(SF).to_pandas()
    got = list(zip(out["query_id"], out["vec_id"], out["adist"]))
    assert [(q, v) for q, v, _ in got] == [(q, v) for q, v, _ in expect_rows]
    assert (
        np.abs(
            np.array([d for *_, d in got]) - np.array([d for *_, d in expect_rows])
        ).max()
        < 1.5e-6
    )
    # query's own vector should rank first with adist == its
    # quantization error under the shared codebook (it is its own
    # nearest reconstruction for these corpora)
    for qi in range(nq):
        first = out[out["query_id"] == qi].iloc[0]
        assert first["vec_id"] == qi
    # determinism across runs
    out2 = knn_pq_adc(SF).to_pandas()
    assert out.equals(out2)


def test_random_projection_matches_serial_and_preserves_distance():
    """Serial-equality pin + the JL property the operator exists for:
    scaled sign projections approximately preserve pairwise squared
    distances in expectation (checked loosely over the corpus mean)."""
    from high_performance_docling_ray.kernels.sketch import hash64

    ids, mat = _corpus()
    d, k = mat.shape[1], 16
    keys = [f"rp:{i}:{j}" for i in range(1, d + 1) for j in range(1, k + 1)]
    signs = np.where(hash64(keys) % 2 == 0, 1.0, -1.0).reshape(d, k)
    expect = np.round(mat @ signs / np.sqrt(k), 6)
    out = (
        random_projection(SF)
        .to_pandas()
        .sort_values(["vec_id", "j"])
        .reset_index(drop=True)
    )
    assert len(out) == len(mat) * k
    got = out["y"].to_numpy().reshape(len(mat), k)
    assert np.abs(got - expect).max() <= 1e-9  # same float path
    # JL in expectation: mean squared norm is preserved (E||y||^2 ==
    # ||x||^2 for sign projections); allow 25% sampling slack at k=16
    ratio = (got**2).sum() / (mat**2).sum()
    assert 0.75 < ratio < 1.25
    # determinism
    out2 = (
        random_projection(SF)
        .to_pandas()
        .sort_values(["vec_id", "j"])
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_weighted_sample_matches_serial_priority_rule():
    from high_performance_docling_ray.kernels.sketch import hash64

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    texts = t.column("text").to_pylist()
    w = np.array([0 if s is None else len(s) for s in texts], np.float64)
    u = (
        hash64([f"ws:{i}" for i in ids.tolist()]).astype(np.float64) + 1.0
    ) / 2.0**64
    prio = w / u
    ok = w > 0
    order = np.lexsort((ids[ok], -prio[ok]))[:50]
    sel = np.nonzero(ok)[0][order]
    expect = sorted(
        zip(ids[sel].tolist(), w[sel].astype(int).tolist(), np.round(prio[sel], 6))
    )
    out = weighted_sample(SF).to_pandas()
    got = list(zip(out["doc_id"], out["weight"], out["priority"]))
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in expect]
    assert np.allclose(
        [p for *_, p in got], [p for *_, p in expect], rtol=0, atol=1e-9
    )
    # weight-proportionality sanity: the sample's mean weight should
    # exceed the corpus mean (long docs are favored)
    assert out["weight"].mean() > w[ok].mean()
    # determinism
    assert out.to_dict() == weighted_sample(SF).to_pandas().to_dict()


def test_quality_threshold_filter_is_corpus_relative():
    from high_performance_docling_ray.pipelines.text_analysis import (
        quality_scores,
        quality_threshold_filter,
    )

    all_scores = quality_scores(SF).to_pandas()
    kept = quality_threshold_filter(SF).to_pandas()
    n = len(all_scores)
    # at most ~10% + ties survive a p90 gate, and never zero
    assert 0 < len(kept) <= int(0.1 * n) + (all_scores["quality"] ==
                                            kept["quality"].min()).sum()
    # the threshold is exactly the quantile_disc value: every kept
    # score >= it, and every dropped score < it
    thr = kept["quality"].min()
    dropped = all_scores[~all_scores["doc_id"].isin(kept["doc_id"])]
    assert (dropped["quality"] < thr).all()
    srt = np.sort(all_scores["quality"].to_numpy())
    import math

    assert thr == srt[max(0, math.ceil(0.9 * n) - 1)]
