"""Sparse tf-idf all-pairs cosine (sparse_sim.py): closed forms, tier
equality (driver / distributed / All-Pairs prefix), stopword-prefix
pruning, and the hot-token auto-reroute. Oracle agreement is
driver-gate verified (tools/check_correctness.py, all three entries
MATCH at sf0.001 and sf0.01)."""

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.sparse_sim import (  # noqa: E402
    sparse_cosine_pairs,
)

SF = "/root/testdata/sf0.001"


def _canon(res):
    df = res.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(
        drop=True
    )
    df["cosine"] = df["cosine"].round(6)
    return df


def _write_docs(d, texts):
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_closed_form_identical_and_disjoint(tmp_path):
    """Identical docs -> cosine 1.0; token-disjoint docs -> no pair;
    an empty doc drops (zero norm) without poisoning the rest."""
    sf = _write_docs(
        tmp_path / "cf",
        ["apple banana", "apple banana", "cherry date", ""],
    )
    out = _canon(sparse_cosine_pairs(sf, threshold=0.5))
    assert out["doc_a"].tolist() == [0]
    assert out["doc_b"].tolist() == [1]
    assert out["cosine"].tolist() == [1.0]


def test_tier_equality():
    """dense driver (the auto route on this tiny-vocab corpus) ==
    sparse driver pair-sum == fully distributed sparse (df cogroup +
    pair-sum shuffle) == All-Pairs prefix == dense block-pair store,
    at 6dp canon."""
    base = _canon(sparse_cosine_pairs(SF))
    assert base.equals(
        _canon(sparse_cosine_pairs(SF, dense_vocab_budget=0))
    )
    assert base.equals(
        _canon(
            sparse_cosine_pairs(
                SF, driver_budget=0, df_budget=0, dense_vocab_budget=0
            )
        )
    )
    assert base.equals(_canon(sparse_cosine_pairs(SF, strategy="prefix")))
    assert base.equals(
        _canon(
            sparse_cosine_pairs(
                SF, strategy="dense", dense_cell_budget=10_000
            )
        )
    )
    assert len(base) > 0  # the fixture corpus has qualifying pairs


def test_stopword_prefix_pruning_and_hot_reroute(tmp_path):
    """A corpus-wide stopword has idf 0, so every cumulative All-Pairs
    bound stays below the threshold at its position -> the hot token
    is UNINDEXED and generates zero candidate emissions, while the df²
    probe reroutes the auto strategy away from the pair-sum path. 10
    pairs of docs share a rare token each; all three routes agree."""
    texts = []
    for k in range(10):
        texts.append(f"the w{k} w{k}")
        texts.append(f"the w{k} w{k}")
    sf = _write_docs(tmp_path / "hot", texts)
    expect = _canon(sparse_cosine_pairs(sf, threshold=0.9))
    assert len(expect) == 10
    assert (expect["cosine"] == 1.0).all()
    # force the auto reroute: 'the' alone would emit 20·19/2 = 190
    # pairs > cap, but the prefix route's flagged-only enumeration
    # stays at 1 partner per rare-token posting (40 total)
    rerouted = _canon(
        sparse_cosine_pairs(
            sf,
            threshold=0.9,
            driver_budget=0,
            hot_emit_cap=100,
            dense_vocab_budget=0,  # pin the SPARSE reroute, not dense
        )
    )
    assert rerouted.equals(expect)


def test_threshold_monotonicity():
    """Raising the threshold can only shrink the pair set, and every
    surviving pair appears at the lower threshold with the same score."""
    lo = _canon(sparse_cosine_pairs(SF, threshold=0.9))
    hi = _canon(sparse_cosine_pairs(SF, threshold=0.95))
    assert len(hi) <= len(lo)
    merged = hi.merge(lo, on=["doc_a", "doc_b"], suffixes=("_h", "_l"))
    assert len(merged) == len(hi)
    assert (merged["cosine_h"] == merged["cosine_l"]).all()
