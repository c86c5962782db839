"""Code/formula enrichment kernel + stage tests (reference M26/M27/A4)."""

import json

import ray.data

from high_performance_docling_ray.kernels.document import (
    ExtractOptions,
    extract_document,
)
from high_performance_docling_ray.kernels.formula import (
    CodeFormulaPredictorStub,
    enrich_elements,
    extract_code_language,
    is_processable,
)
from high_performance_docling_ray.pipelines.extract import extract_pipeline
from high_performance_docling_ray.sources.pages import synth_pages_table


def test_extract_code_language_regex():
    # the reference regex ^<_([^_>]+)_>\s(.*)  (code_formula_model.py:175)
    assert extract_code_language("<_python_> x = 1") == ("x = 1", "python")
    assert extract_code_language("<_c++_> int x;") == ("int x;", "c++")
    # unknown tag -> unknown language, tag stripped
    assert extract_code_language("<_klingon_> qapla") == ("qapla", "unknown")
    # no tag -> unchanged
    assert extract_code_language("plain text") == ("plain text", "unknown")


def test_is_processable():
    assert is_processable({"kind": "text", "label": "code"})
    assert is_processable({"kind": "text", "label": "formula"})
    assert not is_processable({"kind": "text", "label": "text"})
    assert not is_processable({"kind": "table", "label": "table"})


def test_enrich_elements_batches_and_rewrites():
    items = [
        {"kind": "text", "label": "code", "text": f"print({i})"}
        for i in range(7)  # > BATCH_SIZE to exercise chunking
    ] + [{"kind": "text", "label": "formula", "text": "E=mc2"}]
    out = enrich_elements([dict(x) for x in items])
    for el in out[:7]:
        assert "code_language" in el
        assert el["code_language"] != ""
        assert not el["text"].startswith("<_")
    assert out[7]["text"].startswith("\\mathrm{")


def test_enrichment_deterministic():
    items = [{"kind": "text", "label": "code", "text": "select 1"}]
    a = enrich_elements([dict(x) for x in items], CodeFormulaPredictorStub())
    b = enrich_elements([dict(x) for x in items], CodeFormulaPredictorStub())
    assert a == b


def test_pipeline_with_enrichment_runs():
    corpus = synth_pages_table(40, seed=11)
    ds = ray.data.from_arrow(corpus.select(["url", "warc_ts", "html", "lang"]))
    opts = ExtractOptions(do_code_enrichment=True)
    rows = extract_pipeline(ds, dedup=False, options=opts).take_all()
    assert len(rows) == 40
    # default-options output must be unaffected by the flag's existence
    base = extract_document(
        corpus.column("html")[0].as_py(), ExtractOptions()
    )
    assert isinstance(json.loads(base["elements_json"]), list)
