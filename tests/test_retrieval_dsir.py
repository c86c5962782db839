"""BM25 retrieval + DSIR importance weights: invariants beyond the
driver-gate oracles (exactness is pinned there at sf0.01)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.corpus_clean import (  # noqa: E402
    bm25_topk,
)
from high_performance_docling_ray.pipelines.lm_filters import (  # noqa: E402
    dsir_weights,
)

SF = "/root/testdata/sf0.001"


def test_bm25_topk_shape_and_order():
    t = bm25_topk(SF).to_pandas()
    assert len(t) > 0 and len(t) <= 20
    assert list(t.columns) == ["doc_id", "score"]
    # descending by score, ties by doc_id ascending
    s = t["score"].to_numpy()
    assert (np.diff(s) <= 1e-12).all()
    assert (t["score"] > 0).all()
    # deterministic across runs
    t2 = bm25_topk(SF).to_pandas()
    assert t.reset_index(drop=True).equals(t2.reset_index(drop=True))


def test_bm25_k_prefix_property():
    """top-5 must be a prefix of top-20 under the same ordering."""
    t20 = bm25_topk(SF, k=20).to_pandas().reset_index(drop=True)
    t5 = bm25_topk(SF, k=5).to_pandas().reset_index(drop=True)
    assert t5.equals(t20.iloc[: len(t5)].reset_index(drop=True))


def test_dsir_weights_invariants():
    t = dsir_weights(SF).to_pandas()
    assert (t["n_tokens"] > 0).all()
    assert t["doc_id"].is_unique
    # add-1 smoothed log-ratios are finite
    assert np.isfinite(t["dsir_logweight"]).all()
    # target slice scored like everything else (rows present)
    assert (t["doc_id"] % 50 == 0).any()
    # determinism
    a = t.sort_values("doc_id").reset_index(drop=True)
    b = dsir_weights(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_importance_resample_topk():
    from high_performance_docling_ray.pipelines.lm_filters import (
        importance_resample,
    )

    t = importance_resample(SF, k=25).to_pandas()
    assert len(t) == 25 and t["doc_id"].is_unique
    # keys descending; k-prefix property
    key = t["gumbel_key"].to_numpy()
    assert (np.diff(key) <= 1e-12).all()
    t5 = importance_resample(SF, k=5).to_pandas().reset_index(drop=True)
    assert t5.equals(t.iloc[:5].reset_index(drop=True))
    # gumbel key recomputation from the weight column
    w = dsir_weights(SF).to_pandas().set_index("doc_id")["dsir_logweight"]
    import hashlib

    for _, row in t5.iterrows():
        h = int.from_bytes(
            hashlib.md5(str(int(row["doc_id"])).encode()).digest()[:8],
            "little",
        )
        u = (h + 0.5) / float(1 << 64)
        expect = round(w[row["doc_id"]] - np.log(-np.log(u)), 6)
        assert abs(expect - row["gumbel_key"]) < 1e-9


def test_rrf_fusion_closed_form(tmp_path):
    """3-doc corpus: doc 0 tops BOTH lists -> rrf 2/61; doc 1 second in
    both -> 2/62; doc 2 only in the dense list at rank 3 -> 1/63."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.similarity import rrf_fusion

    d = tmp_path / "rrf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["table hash join", "table scan", "nothing here"],
                    pa.string(),
                ),
            }
        ),
        d / "documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        d / "embeddings.parquet",
    )
    out = rrf_fusion(str(d)).to_pandas().set_index("doc_id")
    assert list(out.index) == [0, 1, 2]
    assert abs(out.loc[0, "rrf_score"] - round(2 / 61, 6)) < 1e-9
    assert abs(out.loc[1, "rrf_score"] - round(2 / 62, 6)) < 1e-9
    assert abs(out.loc[2, "rrf_score"] - round(1 / 63, 6)) < 1e-9
    assert out.loc[0, "bm25_rank"] == 1 and out.loc[0, "cosine_rank"] == 1
    # doc 2 never matched a query token: null lexical rank
    assert np.isnan(out.loc[2, "bm25_rank"]) or out.loc[2, "bm25_rank"] is None


def test_rrf_fusion_sf0001_topped_by_query_doc():
    """vec 0 IS the dense query, so doc 0 holds dense rank 1 and must
    appear in the fused top-10 unless 10 docs out-fuse a rank-1 leg."""
    from high_performance_docling_ray.pipelines.similarity import rrf_fusion

    out = rrf_fusion(SF).to_pandas()
    assert len(out) == 10
    assert (out["rrf_score"].to_numpy()[:-1]
            >= out["rrf_score"].to_numpy()[1:] - 1e-12).all()
    assert 0 in set(out["doc_id"])
