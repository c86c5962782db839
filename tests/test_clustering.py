"""Distributed k-means: Lloyd's monotone-inertia property,
determinism, and bounds (exactness is pinned by the driver-gate
oracle at sf0.01)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.clustering import (  # noqa: E402
    kmeans_assign,
)

SF = "/root/testdata/sf0.001"


def test_kmeans_bounds_and_determinism():
    t = kmeans_assign(SF).to_pandas()
    assert len(t) == 500
    assert t["vec_id"].is_unique
    assert t["cluster"].between(0, 7).all()
    assert (t["dist2"] >= 0).all()
    t2 = kmeans_assign(SF).to_pandas()
    a = t.sort_values("vec_id").reset_index(drop=True)
    b = t2.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_kmeans_inertia_monotone():
    """Lloyd's algorithm never increases total inertia with more
    sweeps (assignment and update steps each minimize it)."""
    inertias = [
        kmeans_assign(SF, iters=i).to_pandas()["dist2"].sum()
        for i in (0, 1, 2, 3)
    ]
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a + 1e-6
    # and the first sweep strictly improves on the raw init
    assert inertias[1] < inertias[0]


def test_semdedup_semantics():
    """Recompute the keep rule in numpy over the collected result."""
    import pyarrow.parquet as pq
    from high_performance_docling_ray.pipelines.clustering import semdedup

    t = semdedup(SF).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert len(t) == 500 and t["vec_id"].is_unique
    emb = pq.read_table(SF + "/embeddings.parquet").to_pandas()
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    mat = np.array(emb["embedding"].tolist(), np.float64)
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for cl in t["cluster"].unique():
        sub = t[t["cluster"] == cl].sort_values("vec_id")
        ids = sub["vec_id"].to_numpy()
        gram = nm[ids] @ nm[ids].T
        n = len(ids)
        expected_drop = np.zeros(n, bool)
        for i in range(n):
            for j in range(i):
                if gram[i, j] > 0.4:
                    expected_drop[i] = True
                    break
        assert (sub["keep"].to_numpy() == ~expected_drop).all()
        # lowest vec_id in every cluster always survives
        assert sub["keep"].iloc[0]


def test_dedup_keep_best_one_winner_per_component():
    from high_performance_docling_ray.pipelines.components import (
        dedup_keep_best,
    )

    t = dedup_keep_best(SF).to_pandas()
    assert len(t) > 0 and t["doc_id"].is_unique
    per = t.groupby("component")["keep"].sum()
    assert (per == 1).all()  # exactly one survivor per component
    # and tiers agree (forced distributed label propagation)
    t2 = dedup_keep_best(SF, pairs_broadcast_budget=0).to_pandas()
    a = t.sort_values("doc_id").reset_index(drop=True)
    b = t2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
