"""WARC record packing + parsing (pipelines/warc.py) — hash-verified
at the driver gate; these pins cover framing round-trip, blob
determinism, and the loud-failure contract on corrupt framing."""

import hashlib
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.warc import (  # noqa: E402
    _record_bytes,
    parse_warc,
    parse_warc_blob,
    warc_blobs,
)

SF = "/root/testdata/sf0.001"


def _n_docs() -> int:
    return pq.read_metadata(f"{SF}/documents.parquet").num_rows


def test_roundtrip_every_record_once():
    n = _n_docs()
    out = parse_warc(SF).to_pandas()
    assert len(out) == n
    assert out["url"].is_unique
    assert (out["warc_type"] == "response").all()
    assert (out["content_length"] > 0).all()


def test_blob_packing_is_layout_independent():
    a = warc_blobs(SF).to_pandas().sort_values("blob_id").reset_index(drop=True)
    b = (
        warc_blobs(SF, records_per_blob=32)
        .to_pandas()
        .sort_values("blob_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    # every blob except the last is full
    if len(a) > 1:
        assert (a["n_records"].iloc[:-1] == 32).all()
    assert all(blob.startswith(b"WARC/1.0\r\n") for blob in a["blob"])


def test_parser_uses_content_length_framing_not_delimiters():
    # payload contains CRLFCRLF — a delimiter scanner would split it
    payload = b"hello \r\n\r\n world WARC/1.0\r\n trap"
    rec = _record_bytes("https://x.example/1", 123, payload)
    rows = parse_warc_blob(rec)
    assert rows == [
        (
            "https://x.example/1",
            "response",
            len(payload),
            hashlib.md5(payload).hexdigest(),
        )
    ]
    # two records back-to-back parse in order
    rec2 = rec + _record_bytes("https://x.example/2", 124, b"b")
    assert [r[0] for r in parse_warc_blob(rec2)] == [
        "https://x.example/1",
        "https://x.example/2",
    ]


def test_parser_rejects_corrupt_framing():
    rec = _record_bytes("https://x.example/1", 123, b"abc")
    with pytest.raises(ValueError, match="bad record framing"):
        parse_warc_blob(b"XXXX" + rec)
    with pytest.raises(ValueError, match="truncated payload"):
        parse_warc_blob(rec[:-6])  # cut into the payload/trailer


def test_wet_roundtrip_preserves_extraction_bytes():
    from high_performance_docling_ray.pipelines.extract import (
        extract_pipeline,
    )
    from high_performance_docling_ray.pipelines.warc import (
        parse_wet,
        wet_blobs,
    )
    from high_performance_docling_ray.sources.pages import (
        pages_from_documents,
    )

    direct = (
        extract_pipeline(
            pages_from_documents(SF), dedup=True, explode_giant=False
        )
        .select_columns(["url", "extracted_text"])
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    rt = (
        parse_wet(SF)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert rt.equals(direct)
    # records are conversion-framed with correct blob packing
    blobs = wet_blobs(SF, records_per_blob=32).to_pandas()
    assert blobs["n_records"].sum() == len(direct)
    assert blobs["blob"].map(
        lambda b: b.startswith(b"WARC/1.0\r\nWARC-Type: conversion")
    ).all()
