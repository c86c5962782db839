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
