"""Vocabulary-bounded PMI collocations — planted-collocation pin and
register-merge determinism. Oracle agreement is driver-gate verified
at both SFs.
"""

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.corpus_clean import (  # noqa: E402
    pmi_pairs,
)


def test_planted_collocation_ranks_first(tmp_path):
    """'alpha beta' always co-occur; fillers co-occur at chance ->
    the planted pair tops PMI."""
    rows = []
    fillers = ["red", "blue", "green", "gold"]
    for i in range(40):
        base = " ".join(fillers[j % 4] for j in range(i, i + 2))
        if i % 2 == 0:
            rows.append(f"alpha beta {base}")
        else:
            rows.append(base + " noise" + str(i % 7))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(rows, pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    out = pmi_pairs(str(d), vocab_k=16, top_pairs=5).to_pandas()
    assert (out.iloc[0]["token_a"], out.iloc[0]["token_b"]) == (
        "alpha",
        "beta",
    )
    # perfect co-occurrence of two 50%-frequency tokens: pmi = ln(2)
    assert abs(out.iloc[0]["pmi"] - 0.693147) < 1e-6
    assert out.iloc[0]["n_docs_xy"] == 20


def test_pmi_deterministic_across_runs():
    SF = "/root/testdata/sf0.001"
    a = pmi_pairs(SF).to_pandas()
    b = pmi_pairs(SF).to_pandas()
    assert a.equals(b)
    assert (a["token_a"] < a["token_b"]).all()
