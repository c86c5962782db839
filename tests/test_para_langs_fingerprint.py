"""Per-paragraph language segmentation + Merkle dataset fingerprint —
closed-form pins; oracle agreement is driver-gate verified at both SFs.
"""

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.profiling import (  # noqa: E402
    dataset_fingerprint,
)
from high_performance_docling_ray.pipelines.text_analysis import (  # noqa: E402
    paragraph_langs,
)

SF = "/root/testdata/sf0.001"


def test_paragraph_plants_detect_their_language():
    out = paragraph_langs(SF).to_pandas()
    planted = out[out["para_ord"] > 0]
    # German plant on %7==2, French on %11==5, Spanish on %13==8
    de = planted[planted["doc_id"] % 7 == 2]
    assert (de.groupby("doc_id").head(1)["para_lang"] == "de").all()
    fr = planted[(planted["doc_id"] % 11 == 5) & (planted["para_lang"] == "fr")]
    assert len(fr) > 0
    # every doc contributes a para_ord==0 row (its own text)
    assert out[out["para_ord"] == 0]["doc_id"].nunique() == 500
    # differs is exactly (para_lang != doc_lang) — including the docs
    # whose own label happens to equal the planted language
    assert (
        planted["differs"] == (planted["para_lang"] != planted["doc_lang"])
    ).all()


def test_fingerprint_detects_single_doc_change(tmp_path):
    def mk(name, texts):
        d = tmp_path / name
        d.mkdir()
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

    base = [f"doc {i}" for i in range(40)]
    a = dataset_fingerprint(mk("a", base)).to_pandas().set_index("shard")
    changed = list(base)
    changed[7] = "doc 7 EDITED"
    b = dataset_fingerprint(mk("b", changed)).to_pandas().set_index("shard")
    # root differs, and exactly the one shard holding doc 7 differs
    assert a.loc[-1, "node_md5"] != b.loc[-1, "node_md5"]
    diff = [
        s
        for s in a.index
        if s >= 0 and a.loc[s, "node_md5"] != b.loc[s, "node_md5"]
    ]
    assert diff == [7 % 16]
    # identical input -> identical root (determinism)
    c = dataset_fingerprint(mk("c", base)).to_pandas().set_index("shard")
    assert c.loc[-1, "node_md5"] == a.loc[-1, "node_md5"]
