"""Unicode script composition (text_analysis.py:script_mix) — plant
routing, multi-plant stacking, empty-doc guard. Oracle agreement is
driver-gate verified; these are the closed-form pins.
"""

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.text_analysis import (  # noqa: E402
    script_mix,
)


def _mk(tmp_path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_script_mix_plants_and_counts(tmp_path):
    sf = _mk(
        tmp_path,
        [
            (0, "plain ascii 12"),
            (4, "host doc"),       # %13==4 -> Cyrillic
            (6, "host doc"),       # %17==6 -> CJK
            (3, "host doc"),       # %19==3 -> Greek
            (108, "double"),       # %13==4 AND %17==6 -> both
            (13, ""),              # empty, no plant (13%13=0)
        ],
    )
    out = script_mix(sf).to_pandas().set_index("doc_id")
    p = out.loc[0]
    assert p["n_cyrillic"] == p["n_greek"] == p["n_cjk"] == 0
    assert p["n_digit"] == 2 and p["frac_non_latin"] == 0.0
    # ' Пример русского текста номер 4.' = 25 Cyrillic letters
    cy = out.loc[4]
    assert cy["n_cyrillic"] == 25 and cy["n_cjk"] == 0
    assert cy["n_digit"] == 1  # the doc_id
    assert cy["frac_non_latin"] > 0
    cj = out.loc[6]
    assert cj["n_cjk"] == 7 and cj["n_cyrillic"] == 0
    gr = out.loc[3]
    assert gr["n_greek"] == 14 and gr["n_cjk"] == 0
    both = out.loc[108]
    assert both["n_cyrillic"] == 25 and both["n_cjk"] == 7
    # n_chars is total codepoints of the planted string
    assert both["n_chars"] == len(
        "double Пример русского текста номер 108. 中文样本文档108号"
    )
    empty = out.loc[13]
    assert empty["n_chars"] == 0 and empty["frac_non_latin"] == 0.0
