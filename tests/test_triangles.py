"""Exact triangle counting (graph.py:triangle_count) — tier equality
and closed-form graphs. Oracle agreement is driver-gate verified.
"""

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.graph import (  # noqa: E402
    triangle_count,
)

SF = "/root/testdata/sf0.001"


def _mk(tmp_path, pairs, name="sf"):
    """lineitem stub whose (l_suppkey %40, l_partkey %40) edges are
    exactly `pairs` (ids < 40 pass through the mod untouched)."""
    d = tmp_path / name
    d.mkdir()
    s = [p[0] for p in pairs]
    p_ = [p[1] for p in pairs]
    pq.write_table(
        pa.table(
            {
                "l_suppkey": pa.array(s, pa.int64()),
                "l_partkey": pa.array(p_, pa.int64()),
            }
        ),
        d / "lineitem.parquet",
    )
    return str(d)


def test_known_graphs(tmp_path):
    # a 4-clique has C(4,3)=4 triangles; the pendant edge adds none
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    sf = _mk(tmp_path, clique + [(3, 9)], "clique")
    out = triangle_count(sf).to_pandas().iloc[0]
    assert out["n_nodes"] == 5 and out["n_edges"] == 7
    assert out["n_triangles"] == 4
    # duplicate rows must not double-count (distinct edges)
    sf2 = _mk(tmp_path, clique * 3 + [(0, 1)], "dups")
    assert triangle_count(sf2).to_pandas().iloc[0]["n_triangles"] == 4
    # triangle-free star
    sf3 = _mk(tmp_path, [(0, i) for i in range(1, 6)], "star")
    assert triangle_count(sf3).to_pandas().iloc[0]["n_triangles"] == 0


def test_tiers_equal_on_real_data():
    a = triangle_count(SF).to_pandas()
    b = triangle_count(SF, adj_broadcast_budget=0).to_pandas()
    assert a.equals(b)
    assert int(a.iloc[0]["n_triangles"]) > 0
