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


def test_neardup_medoids_closed_form(tmp_path):
    """Three vectors nearly collinear + one far: the middle vector has
    the highest summed cosine -> medoid; the far one is a singleton
    and drops."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.components import (
        neardup_medoids,
    )

    d = tmp_path / "sf"
    d.mkdir()
    vecs = [
        [1.0, 0.0],
        [0.9, 0.4358898943540674],   # unit-ish, cos to v0 = 0.9
        [0.6, 0.8],                   # cos to v1 ~ 0.888, to v0 = 0.6
        [-1.0, 0.0],                  # singleton (all cos <= 0)
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0, 0, 0, 0], pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    out = neardup_medoids(str(d)).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row.component == 0 and row.n_members == 3
    # middle vector 1 maximizes cos(1,0)+cos(1,2)
    assert row.medoid_id == 1
    dist = neardup_medoids(str(d), pairs_broadcast_budget=0).to_pandas()
    assert dist.equals(out)


def test_neardup_medoids_hot_cap(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from high_performance_docling_ray.pipelines.components import (
        neardup_medoids,
    )

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(list(range(5)), pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0]] * 5, pa.list_(pa.float32())
                ),
                "label": pa.array([0] * 5, pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    with pytest.raises(ValueError, match="hot_member_cap"):
        neardup_medoids(str(d), hot_member_cap=3).to_pandas()
