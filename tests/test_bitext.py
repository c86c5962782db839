"""Margin-based bitext mining (pipelines/bitext.py) — tier equality,
mutuality, and a planted-translation pin. Oracle agreement (both
tiers) is driver-gate verified at sf0.001/sf0.01.
"""

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.bitext import (  # noqa: E402
    bitext_mine,
)

SF = "/root/testdata/sf0.001"


def _sorted(ds):
    return (
        ds.to_pandas()
        .sort_values(["src_id", "tgt_id"])
        .reset_index(drop=True)
    )


def test_tiers_equal_and_mutual():
    a = _sorted(bitext_mine(SF, threshold=1.06))
    b = _sorted(bitext_mine(SF, threshold=1.06, broadcast_budget=0))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    # mutual-best: each src and each tgt appears at most once
    assert a["src_id"].is_unique and a["tgt_id"].is_unique
    # side convention: src even, tgt odd
    assert (a["src_id"] % 2 == 0).all() and (a["tgt_id"] % 2 == 1).all()
    assert (a["margin"] >= 1.06).all()


def test_planted_translations_mine_first(tmp_path):
    """Near-identical cross-side vectors must surface as the
    top-margin pairs; decoys (random vectors) must not pair with
    them."""
    rng = np.random.default_rng(7)
    d = 16
    base = rng.normal(size=(3, d))
    rows = []
    # planted pairs: even id 2i <-> odd id 2i+1, almost identical
    for i in range(3):
        rows.append((2 * i, base[i]))
        rows.append((2 * i + 1, base[i] + rng.normal(scale=1e-3, size=d)))
    # decoys on both sides
    for j in range(6, 26):
        rows.append((j, rng.normal(size=d)))
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1].astype(np.float32).tolist() for r in rows],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, sf / "embeddings.parquet")
    out = _sorted(bitext_mine(str(sf), threshold=0.0))
    got = dict(zip(out["src_id"], out["tgt_id"]))
    for i in range(3):
        assert got.get(2 * i) == 2 * i + 1
    top3 = out.sort_values("margin", ascending=False).head(3)
    assert set(top3["src_id"]) == {0, 2, 4}
