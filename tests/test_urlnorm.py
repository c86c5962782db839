"""URL canonicalization kernel + pipeline stage."""

import pyarrow as pa
import pytest

import ray.data

from high_performance_docling_ray.kernels.urlnorm import normalize_url
from high_performance_docling_ray.pipelines.extract import (
    PAGE_COLUMNS,
    dedup_by_url,
    normalize_urls,
)
from high_performance_docling_ray.sources.pages import PAGES_SCHEMA

_TS = 1_704_067_200_000_000


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("HTTP://Example.COM/a", "http://example.com/a"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("https://example.com:8443/a", "https://example.com:8443/a"),
        ("https://example.com/a#frag", "https://example.com/a"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/a/", "https://example.com/a"),
        ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
        (
            "https://example.com/a?x=1&utm_source=feed&fbclid=z",
            "https://example.com/a?x=1",
        ),
        (None, None),
        ("not a url", "not a url"),
    ],
)
def test_normalize_url(raw, canon):
    assert normalize_url(raw) == canon


def test_normalize_idempotent():
    urls = [
        "HTTP://A.B:80/x/?q=2&p=1#f",
        "https://u:pw@Host.tld:8080/deep/path/",
    ]
    for u in urls:
        once = normalize_url(u)
        assert normalize_url(once) == once


def test_normalized_dedup_collapses_variants():
    html = b"<html><body><p>same page</p></body></html>"
    rows = [
        {"url": "HTTP://Example.com/page#top", "warc_ts": _TS, "html": html,
         "text": "", "lang": "en"},
        {"url": "http://example.com/page?utm_source=x", "warc_ts": _TS + 9,
         "html": html, "text": "", "lang": "en"},
        {"url": "http://example.com/other", "warc_ts": _TS, "html": html,
         "text": "", "lang": "en"},
    ]
    tbl = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    ds = ray.data.from_arrow(tbl.select(PAGE_COLUMNS))
    out = dedup_by_url(normalize_urls(ds)).take_all()
    urls = sorted(r["url"] for r in out)
    assert urls == ["http://example.com/other", "http://example.com/page"]
    # keep-first still holds: the earliest capture of the variants won
    page = [r for r in out if r["url"].endswith("/page")][0]
    assert int(page["warc_ts"].timestamp() * 1e6) == _TS


@pytest.mark.parametrize(
    "raw",
    [
        "http://example.com:99999999/x",      # out-of-range port
        "http://example.com:8o8/x",           # non-numeric port
    ],
)
def test_malformed_port_passes_through(raw):
    assert normalize_url(raw) == raw


def test_ipv6_host_keeps_brackets():
    assert (
        normalize_url("http://[2001:db8::1]:8080/path")
        == "http://[2001:db8::1]:8080/path"
    )
    assert (
        normalize_url("HTTP://[2001:DB8::1]/x")
        == "http://[2001:db8::1]/x"
    )
