"""WARC-style record packing + parsing — the archive-ingest stage.

A crawl archive stores many variable-length records per file; the
engine must split records WITHOUT a delimiter scan of the payload
(payloads contain anything, including header-lookalike bytes), by
honoring each record's ``Content-Length``. ``warc_blobs`` packs the
synthetic pages into multi-record binary blobs (fixture construction —
its groupby exchange builds the input, it is not the operator);
``parse_warc`` is the operator: a stateless flat-map over the blob
stream that walks record headers, validates the version line, reads
exactly Content-Length payload bytes, and emits one row per record
with an md5 payload digest. Record contents are closed forms of
doc_id (sources/pages.py:pages_with_links), so the driver-gate oracle
rebuilds url / octet length / digest in SQL while the Ray side
genuinely parses bytes.

Scale shape: parsing is pure per-blob work (records never straddle
blobs, mirroring WARC files, which never split a record across
files); one blob is one independent unit, so the stage streams at
10^12 records with zero exchanges. The header walk is a Python loop
over RECORDS (inherent — variable-length framing is sequential within
a blob), not over bytes: each step is one ``find`` + one slice.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ..sources.pages import pages_with_links

_CRLF2 = b"\r\n\r\n"


def _record_bytes(url: str, ts_us: int, payload: bytes) -> bytes:
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date-Micros: {ts_us}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8")
    return header + payload + _CRLF2


def warc_blobs(sf_dir: str, records_per_blob: int = 32) -> ray.data.Dataset:
    """(blob_id, blob, n_records): pages packed into multi-record
    binary blobs, records ordered by doc_id within a blob
    (blob_id = doc_id // records_per_blob — deterministic regardless
    of block layout)."""
    pages = pages_with_links(sf_dir, with_doc_id=True)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "blob_id",
            pa.array((ids // records_per_blob).astype(np.int64), pa.int64()),
        )

    def assemble(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        g = group.take(order)
        urls = g.column("url").to_pylist()
        htmls = g.column("html").to_pylist()
        # timestamp[us] -> raw micros
        ts = g.column("warc_ts").cast(pa.int64()).to_pylist()
        blob = b"".join(
            _record_bytes(u, t, h) for u, t, h in zip(urls, ts, htmls)
        )
        return pa.Table.from_pydict(
            {
                "blob_id": pa.array(
                    [int(g.column("blob_id")[0].as_py())], pa.int64()
                ),
                "blob": pa.array([blob], pa.binary()),
                "n_records": pa.array([g.num_rows], pa.int64()),
            }
        )

    return (
        pages.map_batches(keyed, batch_format="pyarrow")
        .groupby("blob_id")
        .map_groups(assemble, batch_format="pyarrow")
    )


def parse_warc_blob(blob: bytes) -> list[tuple[str, str, int, str]]:
    """Walk one blob's Content-Length-framed records; returns
    (url, warc_type, content_length, payload_md5) tuples. Malformed
    framing raises — an archive reader must fail loudly, not
    resynchronize silently."""
    out: list[tuple[str, str, int, str]] = []
    i = 0
    n = len(blob)
    while i < n:
        if not blob.startswith(b"WARC/1.0\r\n", i):
            raise ValueError(f"bad record framing at offset {i}")
        hdr_end = blob.find(_CRLF2, i)
        if hdr_end < 0:
            raise ValueError("unterminated header block")
        headers: dict[str, str] = {}
        for line in blob[i:hdr_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(": ")
            headers[k] = v
        length = int(headers["Content-Length"])
        start = hdr_end + len(_CRLF2)
        payload = blob[start : start + length]
        if len(payload) != length:
            raise ValueError("truncated payload")
        out.append(
            (
                headers["WARC-Target-URI"],
                headers["WARC-Type"],
                length,
                hashlib.md5(payload).hexdigest(),
            )
        )
        i = start + length + len(_CRLF2)
    return out


def parse_warc(sf_dir: str, records_per_blob: int = 32) -> ray.data.Dataset:
    """(url, warc_type, content_length, payload_md5): one row per
    parsed record."""
    blobs = warc_blobs(sf_dir, records_per_blob=records_per_blob)

    def parse(batch: pa.Table) -> pa.Table:
        recs: list[tuple[str, str, int, str]] = []
        for blob in batch.column("blob").to_pylist():
            recs.extend(parse_warc_blob(blob))
        return pa.Table.from_pydict(
            {
                "url": pa.array([r[0] for r in recs], pa.string()),
                "warc_type": pa.array([r[1] for r in recs], pa.string()),
                "content_length": pa.array(
                    [r[2] for r in recs], pa.int64()
                ),
                "payload_md5": pa.array([r[3] for r in recs], pa.string()),
            }
        )

    return blobs.map_batches(parse, batch_format="pyarrow")


def _wet_record_bytes(url: str, ts_us: int, text: str) -> bytes:
    payload = text.encode("utf-8")
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date-Micros: {ts_us}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("utf-8")
    return header + payload + _CRLF2


def wet_blobs(sf_dir: str, records_per_blob: int = 32) -> ray.data.Dataset:
    """WET export of the flagship extraction: each doc's EXTRACTED
    text framed as a ``WARC-Type: conversion`` record, packed into
    multi-record blobs (blob_id = doc_id // records_per_blob, doc_id
    recovered from the deterministic docs.example url). The
    extraction -> WET -> parse roundtrip is hash-gated against the
    same closed-form oracle as extract_docs_text, so the framing can't
    silently corrupt payloads."""
    from ..sources.pages import pages_from_documents
    from .extract import extract_pipeline

    out = extract_pipeline(
        pages_from_documents(sf_dir), dedup=True, explode_giant=False
    ).select_columns(["url", "warc_ts", "extracted_text"])

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(
            pc.struct_field(
                pc.extract_regex(
                    batch.column("url").combine_chunks(), r"/(?P<id>\d+)$"
                ),
                "id",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "blob_id",
            pa.array((ids // records_per_blob).astype(np.int64), pa.int64()),
        ).append_column("doc_id", pa.array(ids, pa.int64()))

    def assemble(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(group, sort_keys=[("doc_id", "ascending")])
        g = group.take(order)
        urls = g.column("url").to_pylist()
        texts = g.column("extracted_text").to_pylist()
        ts = g.column("warc_ts").cast(pa.int64()).to_pylist()
        blob = b"".join(
            _wet_record_bytes(u, t, x or "")
            for u, t, x in zip(urls, ts, texts)
        )
        return pa.Table.from_pydict(
            {
                "blob_id": pa.array(
                    [int(g.column("blob_id")[0].as_py())], pa.int64()
                ),
                "blob": pa.array([blob], pa.binary()),
                "n_records": pa.array([g.num_rows], pa.int64()),
            }
        )

    return (
        out.map_batches(keyed, batch_format="pyarrow")
        .groupby("blob_id")
        .map_groups(assemble, batch_format="pyarrow")
    )


def parse_wet(sf_dir: str, records_per_blob: int = 32) -> ray.data.Dataset:
    """(url, extracted_text): the WET blobs parsed back — byte-level
    roundtrip of the extraction output through the archive framing."""
    blobs = wet_blobs(sf_dir, records_per_blob=records_per_blob)

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        texts: list[str] = []
        for blob in batch.column("blob").to_pylist():
            i = 0
            n = len(blob)
            while i < n:
                if not blob.startswith(b"WARC/1.0\r\n", i):
                    raise ValueError(f"bad record framing at offset {i}")
                hdr_end = blob.find(_CRLF2, i)
                if hdr_end < 0:
                    raise ValueError("unterminated header block")
                headers: dict[str, str] = {}
                for line in blob[i:hdr_end].decode("utf-8").split("\r\n")[1:]:
                    k, _, v = line.partition(": ")
                    headers[k] = v
                if headers["WARC-Type"] != "conversion":
                    raise ValueError("non-conversion record in WET blob")
                length = int(headers["Content-Length"])
                start = hdr_end + len(_CRLF2)
                payload = blob[start : start + length]
                if len(payload) != length:
                    raise ValueError("truncated payload")
                urls.append(headers["WARC-Target-URI"])
                texts.append(payload.decode("utf-8"))
                i = start + length + len(_CRLF2)
        return pa.Table.from_pydict(
            {
                "url": pa.array(urls, pa.string()),
                "extracted_text": pa.array(texts, pa.string()),
            }
        )

    return blobs.map_batches(parse, batch_format="pyarrow")
