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
