"""Bulk kNN-graph construction (similarity.py:knn_graph) — tier
equality and structural invariants. Oracle agreement is driver-gate
verified at sf0.001/sf0.01.
"""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.similarity import (  # noqa: E402
    knn_graph,
)

SF = "/root/testdata/sf0.001"


def test_tiers_equal_and_invariants():
    a = (
        knn_graph(SF)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        knn_graph(SF, broadcast_budget=0)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # every vector has exactly k ranked neighbors, none itself
    per = a.groupby("vec_id")
    assert (per.size() == 5).all()
    assert (a["vec_id"] != a["neighbor_id"]).all()
    assert per["rank"].apply(lambda s: list(s) == [1, 2, 3, 4, 5]).all()
    # cosine non-increasing within each vector's list
    assert (
        per["cosine"].apply(lambda s: s.is_monotonic_decreasing).all()
    )
