"""Incremental shard-vs-store dedup + cross-doc duplicate n-gram
fraction: branch coverage, store reuse, tier pins."""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.incremental import (  # noqa: E402
    build_hash_store,
    incremental_dedup,
)
from high_performance_docling_ray.pipelines.lm_filters import (  # noqa: E402
    crossdoc_ngram_dup,
)

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_branches_and_determinism():
    t = (
        incremental_dedup(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert t["doc_id"].is_unique and len(t) > 0
    # shard slice only
    assert (t["doc_id"] % 20 == 1).all()
    # planted history hits are never new
    m = t["doc_id"] // 20
    hist = m % 5 == 0
    assert hist.any() and (~t.loc[hist, "is_new"]).all()
    # planted within-shard dups: exactly one winner per planted text
    dup = m % 5 == 2
    if dup.sum() >= 2:
        per = t[dup].groupby(m[dup] % 3)["is_new"].sum()
        assert (per == 1).all()
    t2 = (
        incremental_dedup(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert t.equals(t2)


def test_hash_store_cached_and_resumable():
    d1 = build_hash_store(SF)
    assert os.path.exists(os.path.join(d1, "_SUCCESS"))
    mtime = os.stat(os.path.join(d1, "_SUCCESS")).st_mtime_ns
    d2 = build_hash_store(SF)  # second call = cache hit, no rebuild
    assert d1 == d2
    assert os.stat(os.path.join(d2, "_SUCCESS")).st_mtime_ns == mtime


def test_crossdoc_ngram_dup_tiers_equal():
    a = (
        crossdoc_ngram_dup(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        crossdoc_ngram_dup(SF, dup_broadcast_budget=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[a.columns.tolist()]
    )
    assert a.equals(b)
    assert (a["n_dup"] <= a["n_grams"]).all()
    assert np.allclose(a["dup_frac"], (a["n_dup"] / a["n_grams"]).round(6))


def test_incremental_minhash_exact_and_near_pairs():
    """Planted exact (hist shared, est=1.0) and near (20-token passage
    + shard tail, est=63/64) cross-partition pairs both surface; every
    pair is shard (source residue 1) x base, est >= 0.8."""
    from high_performance_docling_ray.pipelines.incremental import (
        incremental_minhash,
    )

    out = (
        incremental_minhash(SF)
        .to_pandas()
        .sort_values(["shard_doc", "base_doc"])
        .reset_index(drop=True)
    )
    assert len(out) > 0
    # shard side is src1 == doc_id % 20 == 1 in this corpus
    assert (out["shard_doc"] % 20 == 1).all()
    assert (out["base_doc"] % 20 != 1).all()
    assert (out["est_jaccard"] >= 0.8).all()
    vals = set(out["est_jaccard"].round(6))
    assert 1.0 in vals            # exact hist pairs
    assert round(63 / 64, 6) in vals  # near pairs (one-token tail)
    # deterministic rerun (store cached)
    again = (
        incremental_minhash(SF)
        .to_pandas()
        .sort_values(["shard_doc", "base_doc"])
        .reset_index(drop=True)[out.columns.tolist()]
    )
    assert out.equals(again)


def test_corpus_diff_statuses(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from high_performance_docling_ray.pipelines.incremental import (
        corpus_diff,
    )

    # ids chosen so each status fires: 4 removed (4%31), 3 modified
    # (3%17), 5 unchanged + spawns 1000005 added (5%23), 0 unchanged
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([0, 3, 4, 5], pa.int64()),
            "text": pa.array(["t0", "t3", "t4", "t5"], pa.string()),
            "lang": pa.array(["en"] * 4),
        }
    )
    _pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        corpus_diff(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = {0: "unchanged", 3: "modified", 4: "removed",
            5: "unchanged", 1000005: "added"}
    got = dict(zip(out["doc_id"], out["status"]))
    assert got == want


def test_incremental_decontaminate_matches_full_restricted_to_shard():
    """The shard probe against the PERSISTED store must agree exactly
    with the full decontaminate run restricted to the shard's docs."""
    from high_performance_docling_ray.pipelines.incremental import (
        build_eval_shingle_store,
        incremental_decontaminate,
    )
    from high_performance_docling_ray.pipelines.lm_filters import (
        decontaminate,
    )

    inc = (
        incremental_decontaminate(SF, shard_source="src3")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    full = decontaminate(SF).to_pandas()
    full = (
        full[full["doc_id"] % 20 == 3]  # source == src3
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert inc.equals(full)
    # the store is cached: a second build returns the same dir, and a
    # second run is byte-identical
    d1 = build_eval_shingle_store(SF)
    d2 = build_eval_shingle_store(SF)
    assert d1 == d2
    again = (
        incremental_decontaminate(SF, shard_source="src3", store_dir=d1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert again.equals(inc)


def test_incremental_extract_tiers_and_reuse_accounting():
    from high_performance_docling_ray.pipelines.incremental import (
        build_extract_store,
        incremental_extract,
    )

    store = build_extract_store(SF)
    a = (
        incremental_extract(SF, store_dir=store)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # exactly the planted modifications re-extract
    changed = a[~a["reused"]]
    ids = changed["url"].str.extract(r"(\d+)$")[0].astype(int)
    assert (ids % 23 == 7).all()
    # modified docs end with the planted suffix, reused ones don't
    assert changed["extracted_text"].str.endswith(" v2").all()
    assert not a[a["reused"]]["extracted_text"].str.endswith(" v2").any()
    # budget=0 forces the full-row cogroup fallback; byte-identical
    b = (
        incremental_extract(
            SF, store_dir=store, changed_broadcast_budget=0
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert a.equals(b)
