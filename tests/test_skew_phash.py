"""Partition-skew report + perceptual-hash image dedup — planted-dup
recall, no false merges, and skew ordering. partition_skew_report's
oracle agreement is driver-gate verified.
"""

import sys

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.profiling import (  # noqa: E402
    partition_skew_report,
)
from high_performance_docling_ray.stages.multimodal import (  # noqa: E402
    dhash64,
    decode_fake_image,
    encode_fake_image,
    image_phash_dedup,
)

SF = "/root/testdata/sf0.001"


def test_skew_orders_candidate_keys():
    out = partition_skew_report(SF).to_pandas().set_index("part_key")
    # 5 languages can use at most 5 of 64 buckets; doc_id spreads
    assert out.loc["lang", "n_buckets_used"] <= 5
    assert out.loc["doc_id", "n_buckets_used"] > 30
    assert out.loc["lang", "skew_ratio"] > out.loc["doc_id", "skew_ratio"]
    assert (out["avg_rows"] == out["avg_rows"].iloc[0]).all()


def test_phash_identical_payloads_identical_hash():
    a = dhash64(decode_fake_image(encode_fake_image(32, 48, b"x")))
    b = dhash64(decode_fake_image(encode_fake_image(32, 48, b"x")))
    c = dhash64(decode_fake_image(encode_fake_image(32, 48, b"y")))
    assert a == b and a != c


def test_phash_dedup_finds_planted_pairs():
    df = image_phash_dedup(100).to_pandas()
    planted = [i for i in range(100) if i % 10 == 7 and i >= 3]
    for i in planted:
        row = df[df["media_id"] == i].iloc[0]
        assert row["canonical_id"] == i - 3 and row["group_size"] == 2
    # no false merges: every dup row is part of a planted pair
    dups = df[df["group_size"] > 1]
    assert len(dups) == 2 * len(planted)
    assert (df[df["group_size"] == 1]["media_id"]
            == df[df["group_size"] == 1]["canonical_id"]).all()
