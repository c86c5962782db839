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


def test_hard_negatives_closed_form(tmp_path):
    """4 vectors, two labels: each vector's hard negative is the
    most-cosine-similar OTHER-label vector; a unique-label vector
    drops from the output entirely."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.similarity import (
        hard_negatives,
    )

    d = tmp_path / "sf"
    d.mkdir()
    vecs = [
        [1.0, 0.0],    # 0, label 1
        [0.9, 0.1],    # 1, label 1
        [0.8, 0.6],    # 2, label 2  (closest label-2 vec to 0 and 1)
        [-1.0, 0.0],   # 3, label 2
        [0.0, 1.0],    # 4, label 9  (unique label)
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([1, 1, 2, 2, 9], pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    out = hard_negatives(str(d)).to_pandas().set_index("vec_id")
    # label-9 vector 4 IS a valid negative for everyone; for vec 0:
    # cos(0,2)=0.8, cos(0,3)=-1, cos(0,4)=0 -> neg 2
    assert out.loc[0, "neg_id"] == 2
    assert abs(out.loc[0, "cosine"] - 0.8) < 1e-9
    # vec 2 (label 2): cos(2,0)=0.8, cos(2,1)=0.9..., cos(2,4)=0.6 -> neg 1
    assert out.loc[2, "neg_id"] == 1
    # vec 4 (unique label): every other vec is a negative; best is 2
    assert out.loc[4, "neg_id"] == 2
    assert sorted(out.index) == [0, 1, 2, 3, 4]
    sharded = hard_negatives(str(d), broadcast_budget=0).to_pandas()
    assert sharded.set_index("vec_id").sort_index().equals(out.sort_index())


def test_hard_negatives_tiers_sf0001():
    from high_performance_docling_ray.pipelines.similarity import (
        hard_negatives,
    )

    a = hard_negatives(SF).to_pandas().sort_values("vec_id").reset_index(
        drop=True
    )
    b = (
        hard_negatives(SF, broadcast_budget=0)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(a) > 0
    assert a.equals(b)
