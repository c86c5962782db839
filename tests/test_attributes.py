"""Dolma-style attribute sidecars (pipelines/attributes.py): store
persistence + cache, mixer precedence, and policy-only reruns. Oracle
agreement is driver-gate verified at sf0.001/sf0.01.
"""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.attributes import (  # noqa: E402
    build_attribute_store,
    mix_attributes,
    tag_attributes,
)

SF = "/root/testdata/sf0.001"


def _mk(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_store_is_cached_and_partitioned():
    d1 = build_attribute_store(SF)
    assert os.path.exists(os.path.join(d1, "_SUCCESS"))
    buckets = [p for p in os.listdir(d1) if p.startswith("bucket=")]
    assert len(buckets) == 8
    d2 = build_attribute_store(SF)
    assert d2 == d1  # content-keyed cache hit, no rebuild


def test_mixer_precedence(tmp_path):
    en = "the cat is on the mat and it is a good day for the old man "
    sf = _mk(
        tmp_path,
        [
            (0, "tiny", "en"),                       # too_short wins
            (1, en * 3, "en"),                       # keep
            (2, en * 3, "fr"),                       # lang_mismatch
            # long enough (>=20 tokens) but junk -> low_quality
            (3, "zzz " * 25, "en"),
        ],
    )
    out = mix_attributes(sf).to_pandas().set_index("doc_id")
    assert out.loc[0, "reason"] == "too_short" and not out.loc[0, "keep"]
    assert out.loc[1, "reason"] == "keep" and bool(out.loc[1, "keep"])
    assert out.loc[2, "reason"] == "lang_mismatch"
    assert out.loc[3, "reason"] == "low_quality"
    # n_chars joined from the DOC side, not the store
    assert out.loc[0, "n_chars"] == 4


def test_policy_rerun_uses_same_store(tmp_path):
    """Changing mixer policy must not retag: same store dir, different
    verdicts."""
    en = "the cat is on the mat and it is a good day for the old man "
    sf = _mk(tmp_path, [(0, en * 3, "en"), (1, en, "en")])
    d1 = build_attribute_store(sf)
    strict = mix_attributes(sf, min_tokens=50).to_pandas().set_index("doc_id")
    loose = mix_attributes(sf, min_tokens=5).to_pandas().set_index("doc_id")
    assert build_attribute_store(sf) == d1
    assert strict.loc[1, "reason"] == "too_short"
    assert loose.loc[1, "reason"] != "too_short"


def test_tag_attributes_roundtrip():
    t = tag_attributes(SF).to_pandas()
    assert len(t) == pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert set(t.columns) == {
        "doc_id", "n_ws_tokens", "quality", "lang_agrees",
    }
    assert t["doc_id"].is_unique
