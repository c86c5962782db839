"""A 120-page document must take the page-exploded path at the DEFAULT
monster threshold and still produce byte-identical output to the
doc-at-once path (skew defusal, SURVEY.md §4.2)."""

import json
import random

import ray.data

from high_performance_docling_ray.pipelines.extract import (
    GIANT_BYTES,
    extract_pipeline,
)
from high_performance_docling_ray.sources.pages import (
    PAGES_SCHEMA,
    PDF_MAGIC,
    _make_page,
    rows_to_table,
)

N_PAGES = 120
_TS = 1_704_067_200_000_000


def _monster_rows():
    rng = random.Random(99)
    pages = [_make_page(rng, p) for p in range(N_PAGES)]
    payload = PDF_MAGIC + json.dumps({"pages": pages}).encode("utf-8")
    assert len(payload) >= GIANT_BYTES, (
        f"monster payload {len(payload)}B under the {GIANT_BYTES}B threshold"
    )
    small_rng = random.Random(7)
    small = PDF_MAGIC + json.dumps(
        {"pages": [_make_page(small_rng, 0)]}
    ).encode("utf-8")
    return [
        {"url": "https://m.x/monster", "warc_ts": _TS, "html": payload,
         "text": "", "lang": "en"},
        {"url": "https://m.x/small", "warc_ts": _TS, "html": small,
         "text": "", "lang": "en"},
    ]


def test_monster_doc_exploded_and_byte_identical():
    tbl = rows_to_table(_monster_rows()).select(
        ["url", "warc_ts", "html", "lang"]
    )
    ds_a = ray.data.from_arrow(tbl)
    ds_b = ray.data.from_arrow(tbl)
    exploded = {
        r["url"]: r
        for r in extract_pipeline(ds_a, dedup=False, explode_giant=True).take_all()
    }
    at_once = {
        r["url"]: r
        for r in extract_pipeline(ds_b, dedup=False, explode_giant=False).take_all()
    }
    assert set(exploded) == set(at_once) == {
        "https://m.x/monster", "https://m.x/small"
    }
    m = exploded["https://m.x/monster"]
    assert m["n_pages"] == N_PAGES
    assert m["extract_ok"]
    for url in exploded:
        assert exploded[url]["extracted_text"] == at_once[url]["extracted_text"], url
        assert exploded[url]["n_elements"] == at_once[url]["n_elements"], url
        assert exploded[url]["n_tables"] == at_once[url]["n_tables"], url
