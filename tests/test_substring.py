"""ExactSubstr dedup (pipelines/substring.py): closed-form window
semantics on crafted corpora plus the broadcast/cogroup tier pin."""

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.substring import (  # noqa: E402
    substring_dedup,
)

SF = "/root/testdata/sf0.001"

P = "p1 p2 p3 p4 p5 p6 p7 p8"  # exactly L=8 tokens


def _write_docs(tmp_path, rows):
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_substring_dedup_cross_doc_first_occurrence_kept(tmp_path):
    # doc0 holds the globally-first copy of P (pos 0); doc1 repeats it
    # at pos 2 -> exactly P's 8 tokens excised from doc1 only. doc2
    # shares nothing. Junction windows (spanning "x y" + P) are unique.
    sf = _write_docs(
        tmp_path,
        [(0, P + " tail0 tail1"), (1, "x y " + P), (2, "a b c d e f g h")],
    )
    out = (
        substring_dedup(sf, plant=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [10, 10, 8]
    assert out["n_removed"].tolist() == [0, 8, 0]
    assert out.loc[0, "clean_text"] == P + " tail0 tail1"
    assert out.loc[1, "clean_text"] == "x y"
    assert out.loc[2, "clean_text"] == "a b c d e f g h"


def test_substring_dedup_within_doc_repeat(tmp_path):
    # "P P": window@0 == window@8; winner is @0, so tokens 8..15 go
    sf = _write_docs(tmp_path, [(7, P + " " + P)])
    out = substring_dedup(sf, plant=False).to_pandas()
    assert out["n_tokens"].tolist() == [16]
    assert out["n_removed"].tolist() == [8]
    assert out["clean_text"].tolist() == [P]


def test_substring_dedup_short_and_empty_docs(tmp_path):
    # < L tokens -> no windows, nothing removed; empty/null-ish text
    # yields an empty clean_text row (every doc emits a row)
    sf = _write_docs(tmp_path, [(0, "just a few tokens"), (1, "   ")])
    out = (
        substring_dedup(sf, plant=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_tokens"].tolist() == [4, 0]
    assert out["n_removed"].tolist() == [0, 0]
    assert out["clean_text"].tolist() == ["just a few tokens", ""]


def test_substring_dedup_overlapping_windows_union(tmp_path):
    # doc1 repeats a 9-token passage -> two overlapping dup windows
    # (@start and @start+1) whose UNION covers 9 tokens, not 16
    P9 = P + " p9"
    sf = _write_docs(tmp_path, [(0, P9 + " end"), (1, "z " + P9)])
    out = (
        substring_dedup(sf, plant=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_removed"].tolist() == [0, 9]
    assert out.loc[1, "clean_text"] == "z"


def test_substring_dedup_tiers_equal():
    """Broadcast dup-model tier == forced cogroup tier, byte for byte
    (planted passages make removals observable at sf0.001)."""
    a = (
        substring_dedup(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        substring_dedup(SF, dup_broadcast_budget=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[list(a.columns)]
    )
    assert len(a) == 500
    assert (a["n_removed"] > 0).sum() > 0
    assert a.equals(b)
