"""Edge-case robustness: null/empty/malformed payloads through the
full pipeline (verify-skill gotcha: null binary + pyarrow predicates)."""

import pyarrow as pa

import ray.data

from high_performance_docling_ray.kernels.document import extract_document
from high_performance_docling_ray.pipelines.extract import (
    PAGE_COLUMNS,
    dedup_by_url,
    extract_pipeline,
)
from high_performance_docling_ray.sources.pages import PAGES_SCHEMA

_TS = 1_704_067_200_000_000


def _tbl(rows):
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def _row(url, html, ts=_TS):
    return {"url": url, "warc_ts": ts, "html": html, "text": "", "lang": "en"}


def test_null_and_empty_payloads_do_not_poison_block():
    rows = [
        _row("https://e.x/null", None),
        _row("https://e.x/empty", b""),
        _row("https://e.x/ok", b"<html><body><main><p>hello world</p></main></body></html>"),
        _row("https://e.x/badpdf", b"%SYNTHPDF{not json"),
    ]
    ds = ray.data.from_arrow(_tbl(rows).select(PAGE_COLUMNS))
    out = {r["url"]: r for r in extract_pipeline(ds, dedup=False).take_all()}
    assert len(out) == 4
    assert out["https://e.x/ok"]["extract_ok"]
    assert "hello world" in out["https://e.x/ok"]["extracted_text"]
    # malformed PDF payload degrades to an error row, not an exception
    assert not out["https://e.x/badpdf"]["extract_ok"]
    # null/empty html extract to empty text but succeed
    assert out["https://e.x/null"]["extracted_text"] == ""


def test_null_payloads_survive_dedup_and_split():
    rows = [
        _row("https://e.x/a", None, _TS),
        _row("https://e.x/a", None, _TS + 5),
        _row("https://e.x/b", b"<html><body><p>x y z</p></body></html>"),
    ]
    ds = ray.data.from_arrow(_tbl(rows).select(PAGE_COLUMNS))
    out = extract_pipeline(ds, dedup=True, explode_giant=True).take_all()
    urls = sorted(r["url"] for r in out)
    assert urls == ["https://e.x/a", "https://e.x/b"]
    kept = {r["url"]: r["warc_ts"] for r in dedup_by_url(
        ray.data.from_arrow(_tbl(rows).select(PAGE_COLUMNS))
    ).take_all()}
    # earliest capture won
    assert int(kept["https://e.x/a"].timestamp() * 1e6) == _TS


def test_tied_min_warc_ts_resolved_to_single_row():
    rows = [
        _row("https://e.x/t", b"<html><body><p>one</p></body></html>", _TS),
        _row("https://e.x/t", b"<html><body><p>one</p></body></html>", _TS),
        _row("https://e.x/u", b"<html><body><p>two</p></body></html>", _TS),
    ]
    ds = ray.data.from_arrow(_tbl(rows).select(PAGE_COLUMNS))
    out = dedup_by_url(ds).take_all()
    urls = sorted(r["url"] for r in out)
    assert urls == ["https://e.x/t", "https://e.x/u"]


def test_whitespace_only_html():
    res = extract_document(b"   \n\t  ")
    assert res["doc_kind"] == "html"
    assert res["extracted_text"] == ""


def test_html_with_only_boilerplate():
    html = (
        b"<html><body><nav><a href='/a'>a</a> <a href='/b'>b</a></nav>"
        b"<footer>\xc2\xa9 2024 corp</footer></body></html>"
    )
    res = extract_document(html)
    assert res["extracted_text"] == ""


def test_dedup_keeps_null_url_rows():
    rows = [
        _row(None, b"<html><body><p>anon one</p></body></html>", _TS),
        _row(None, b"<html><body><p>anon two</p></body></html>", _TS + 1),
        _row("https://e.x/k", b"<html><body><p>keyed</p></body></html>", _TS),
        _row("https://e.x/k", b"<html><body><p>keyed</p></body></html>", _TS + 5),
    ]
    ds = ray.data.from_arrow(_tbl(rows).select(PAGE_COLUMNS))
    out = dedup_by_url(ds).take_all()
    # both null-url rows survive (no dedup key); keyed url deduped to one
    assert len(out) == 3
    assert sum(1 for r in out if r["url"] is None) == 2


def test_dedup_null_warc_ts_loses_to_real_capture():
    rows = [
        _row("https://e.x/n", b"<html><body><p>a</p></body></html>", None),
        _row("https://e.x/n", b"<html><body><p>a</p></body></html>", _TS),
        _row("https://e.x/onlynull", b"<html><body><p>b</p></body></html>", None),
    ]
    tbl = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    ds = ray.data.from_arrow(tbl.select(PAGE_COLUMNS))
    out = dedup_by_url(ds).take_all()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(r)
    # the null-ts capture loses to the real one
    assert len(by_url["https://e.x/n"]) == 1
    assert by_url["https://e.x/n"][0]["warc_ts"] is not None
    # a url with ONLY null ts still survives
    assert "https://e.x/onlynull" in by_url


def test_ocr_pipeline_skips_malformed_payload():
    from high_performance_docling_ray.pipelines.ocr import ocr_pipeline

    rows = [
        _row("https://e.x/badpdf", b"%SYNTHPDF{not json"),
        _row("https://e.x/null2", None),
    ]
    ds = ray.data.from_arrow(_tbl(rows).select(PAGE_COLUMNS))
    assert ocr_pipeline(ds, concurrency=(1, 1)).take_all() == []


def test_q3_empty_segment_returns_empty():
    from high_performance_docling_ray.pipelines.relational import q3_shipping

    out = q3_shipping("/root/testdata/sf0.001", segment="NO_SUCH_SEGMENT")
    assert out.num_rows == 0


def test_malformed_giant_payload_degrades_not_crashes():
    bad = b"%SYNTHPDF{not json" + b"x" * 2_000_000  # over GIANT_BYTES
    rows = [
        _row("https://e.x/badgiant", bad),
        _row("https://e.x/ok2", b"<html><body><p>fine text</p></body></html>"),
    ]
    ds = ray.data.from_arrow(_tbl(rows).select(PAGE_COLUMNS))
    out = {r["url"]: r for r in extract_pipeline(ds, dedup=False, explode_giant=True).take_all()}
    assert len(out) == 2
    assert not out["https://e.x/badgiant"]["extract_ok"]
    assert out["https://e.x/ok2"]["extract_ok"]


def test_pre_block_preserves_code_formatting():
    html = (
        b"<html><body><main><p>intro</p>"
        b"<pre>def f():\n    return x -\ny</pre>"
        b"</main></body></html>"
    )
    res = extract_document(html)
    assert "def f():\n    return x -\ny" in res["extracted_text"]


def test_text_inside_table_outside_cells_is_kept():
    html = (
        b"<html><body><table>Disclaimer note"
        b"<tr><td>a1</td><td>b1</td></tr></table></body></html>"
    )
    res = extract_document(html)
    assert "Disclaimer note" in res["extracted_text"]
    assert "a1\tb1" in res["extracted_text"]
    # standalone html oracle agrees
    from high_performance_docling_ray.kernels.html_extract import extract_text

    assert "Disclaimer note" in extract_text(html.decode())
