"""Extraction stages: Arrow-batch transforms around kernels/document.py.

Two execution shapes, chosen by document size to defuse skew
(SURVEY.md §4.2):

* ``DocExtractor`` — callable class for ``map_batches``: one worker
  extracts whole documents of a batch. Right for the 99% of docs that
  are small/medium; zero shuffles.
* explode/assemble — ``explode_pdf_pages`` flat-maps giant documents
  into page rows, ``PageExtractor`` processes pages independently, and
  ``assemble_doc_group`` re-groups per url (the one keyed shuffle the
  doc path needs; reading order is per-document, readingorder_model.py:355-381).

Stateful setup (compiled regexes, options) happens in ``__init__`` —
once per actor, not per batch. But the extractors' setup is CHEAP
(no model weights), so the pipeline defaults to plain ``map_batches``
functions with a module-level per-options cache: stateless tasks reuse
Ray's already-warm worker pool and skip actor-pool spin-up, which
measures 4-6x faster on short runs and identical at steady state. The
callable classes remain the interface for heavy-state variants (real
detector weights, OCR models) via ``use_actors=True``.
"""

from __future__ import annotations

import json
from typing import Any

import pyarrow as pa

from ..kernels.document import (
    DEFAULT_OPTIONS,
    PDF_MAGIC,
    ExtractOptions,
    extract_document,
    process_pdf_page,
    sniff_format,
)
from ..kernels.reading_order import (
    assemble_document,
    canonical_items,
    export_markdown,
)

RESULT_FIELDS = [
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("doc_kind", pa.string()),
    ("extracted_text", pa.large_string()),
    ("markdown", pa.large_string()),
    ("elements_json", pa.large_string()),
    ("n_pages", pa.int32()),
    ("n_elements", pa.int32()),
    ("n_tables", pa.int32()),
    ("layout_score", pa.float64()),
    ("extract_ok", pa.bool_()),
]
RESULT_SCHEMA = pa.schema(RESULT_FIELDS)


def parse_ocr_json(ocr_json: str) -> dict[int, dict[int, str]]:
    """Per-url OCR lookup column -> the ``extract_document`` lookup
    shape ``{page_no: {cluster_id: text}}`` (JSON keys arrive as
    strings)."""
    return {
        int(p): {int(c): t for c, t in by_cluster.items()}
        for p, by_cluster in json.loads(ocr_json).items()
    }


def _empty_result() -> dict[str, Any]:
    return {
        "extracted_text": "",
        "markdown": "",
        "elements_json": "[]",
        "n_pages": 0,
        "n_elements": 0,
        "n_tables": 0,
        "doc_kind": "error",
        "layout_score": float("nan"),
    }


class DocExtractor:
    """map_batches callable: whole-document extraction.

    Failed documents degrade to empty rows with ``extract_ok=False``
    instead of poisoning the block (the reference skips invalid pages,
    layout_model.py:167-177).
    """

    def __init__(
        self,
        options: ExtractOptions = DEFAULT_OPTIONS,
        ocr_ref=None,
    ) -> None:
        self.options = options
        self._extract = extract_document
        # broadcast ObjectRef to {url: {page_no: {cluster_id: text}}}
        # from the distributed OCR stage (pipelines/ocr.py), resolved
        # ONCE per instance on first use (not per batch)
        self.ocr_ref = ocr_ref
        self._ocr_by_url = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.ocr_ref is not None and self._ocr_by_url is None:
            import ray as _ray

            self._ocr_by_url = _ray.get(self.ocr_ref)
        ocr_by_url = self._ocr_by_url
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").to_pylist()
        langs = (
            batch.column("lang").to_pylist()
            if "lang" in batch.column_names
            else [""] * len(urls)
        )
        payloads = batch.column("html").to_pylist()
        # distributed-OCR join-back, over-budget tier: recognized text
        # arrives as a per-url JSON column (pipelines/ocr.py attach)
        # instead of the broadcast ref
        ocr_jsons = (
            batch.column("ocr_json").to_pylist()
            if "ocr_json" in batch.column_names
            else [None] * len(urls)
        )
        out: dict[str, list] = {name: [] for name, _ in RESULT_FIELDS}
        for url, t, lang, payload, ocr_json in zip(
            urls, ts, langs, payloads, ocr_jsons
        ):
            try:
                if ocr_json is not None:
                    lookup = parse_ocr_json(ocr_json)
                else:
                    lookup = (
                        ocr_by_url.get(url) if ocr_by_url is not None else None
                    )
                res = self._extract(payload or b"", self.options, lookup)
                ok = True
            except Exception:
                res = _empty_result()
                ok = False
            out["url"].append(url)
            out["warc_ts"].append(t)
            out["lang"].append(lang)
            out["doc_kind"].append(res["doc_kind"])
            out["extracted_text"].append(res["extracted_text"])
            out["markdown"].append(res["markdown"])
            out["elements_json"].append(res["elements_json"])
            out["n_pages"].append(res["n_pages"])
            out["n_elements"].append(res["n_elements"])
            out["n_tables"].append(res["n_tables"])
            out["layout_score"].append(res["layout_score"])
            out["extract_ok"].append(ok)
        return pa.Table.from_pydict(out, schema=RESULT_SCHEMA)


# Per-process extractor cache: options is a frozen (hashable) dataclass,
# so stateless map_batches tasks share one prepared extractor per options
# value instead of rebuilding it per batch.
_EXTRACTOR_CACHE: dict[tuple, Any] = {}


def _cached(cls, options: ExtractOptions, **kwargs):
    key = (cls.__name__, options, tuple(sorted(kwargs.items(), key=str)))
    inst = _EXTRACTOR_CACHE.get(key)
    if inst is None:
        if kwargs.get("ocr_ref") is not None:
            # each distributed-OCR run carries a fresh ObjectRef; evict
            # the previous run's entry for these options so workers do
            # not pin every historical OCR lookup in the object store
            stale = [
                k
                for k, v in _EXTRACTOR_CACHE.items()
                if k[0] == cls.__name__
                and k[1] == options
                and getattr(v, "ocr_ref", None) is not None
            ]
            for k in stale:
                del _EXTRACTOR_CACHE[k]
        inst = _EXTRACTOR_CACHE[key] = cls(options, **kwargs)
    return inst


def make_doc_extract_fn(options: ExtractOptions = DEFAULT_OPTIONS, ocr_ref=None):
    def extract_docs(batch: pa.Table) -> pa.Table:
        return _cached(DocExtractor, options, ocr_ref=ocr_ref)(batch)

    return extract_docs


def make_page_extract_fn(options: ExtractOptions = DEFAULT_OPTIONS, ocr_ref=None):
    def extract_pages(batch: pa.Table) -> pa.Table:
        return _cached(PageExtractor, options, ocr_ref=ocr_ref)(batch)

    return extract_pages


# -- giant-document page parallelism ---------------------------------------

# Payload size above which a document is page-exploded across the
# cluster instead of processed in-task. Exploding pays a per-doc
# groupby regroup, so it is reserved for true monsters (~100+ pages,
# the docs that would straggle a task); a 20-page doc is ~30 ms of
# in-task work and takes the doc-at-once path.
GIANT_BYTES = 1_572_864  # >=1.5 MiB payload -> page-exploded path


def add_cost_class(batch: pa.Table, giant_bytes: int = GIANT_BYTES) -> pa.Table:
    """Cheap ingest-time size classification on payload length
    (SURVEY.md §4.2): 0 = small/medium (doc-at-once), 1 = giant
    (page-exploded)."""
    import pyarrow.compute as pc

    sizes = pc.fill_null(pc.binary_length(batch.column("html")), 0)
    giant = pc.greater_equal(sizes, giant_bytes)
    return batch.append_column("cost_class", pc.cast(giant, pa.int8()))


def explode_pdf_pages(row: dict[str, Any]) -> list[dict[str, Any]]:
    """flat_map: one giant document row -> one row per page.

    Page payloads stay JSON-encoded so rows are plain Arrow-friendly
    scalars; HTML docs pass through as a single pseudo-page.
    """
    payload = row["html"]
    base = {"url": row["url"], "warc_ts": row["warc_ts"], "lang": row.get("lang", "")}
    if "ocr_json" in row:
        # distributed-OCR join-back column rides along to every page row
        base["ocr_json"] = row["ocr_json"]
    if sniff_format(payload or b"") != "pdf":
        return [{**base, "page_no": 0, "page_payload": payload, "page_kind": "html"}]
    try:
        doc = json.loads(payload[len(PDF_MAGIC):])
        pages = doc["pages"]
    except Exception:
        # malformed giant payload: degrade to one error page so the
        # doc becomes an extract_ok=False row (DocExtractor parity)
        # instead of failing the flat_map task
        return [{**base, "page_no": 0, "page_payload": b"", "page_kind": "error"}]
    return [
        {
            **base,
            "page_no": page["page_no"],
            "page_payload": json.dumps(page).encode("utf-8"),
            "page_kind": "pdf_page",
        }
        for page in pages
    ]


class PageExtractor:
    """map_batches callable over exploded page rows: runs layout
    postprocess + table structure + page assembly for a single page,
    emitting the page's elements as JSON for the per-url re-group.

    Distributed-OCR join-back (J6) mirrors DocExtractor: a broadcast
    ``ocr_ref`` ({url: {page_no: {cluster_id: text}}}) or a per-url
    ``ocr_json`` column carried through ``explode_pdf_pages``; either
    supplies the page's override so the inline recognizer never runs.
    """

    def __init__(
        self, options: ExtractOptions = DEFAULT_OPTIONS, ocr_ref=None
    ) -> None:
        self.options = options
        self.ocr_ref = ocr_ref
        self._ocr_by_url = None

    def _page_override(self, row: dict[str, Any]):
        """None -> run the inline recognizer; a dict -> use as the
        recognized texts (same missing-url semantics as DocExtractor:
        a url absent from the lookup falls back to inline, which is
        output-identical because identify found no regions there)."""
        if self._ocr_by_url is not None:
            lookup = self._ocr_by_url.get(row["url"])
            if lookup is None:
                return None
            return lookup.get(int(row["page_no"]), {})
        ocr_json = row.get("ocr_json")
        if ocr_json is not None:
            return parse_ocr_json(ocr_json).get(int(row["page_no"]), {})
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.ocr_ref is not None and self._ocr_by_url is None:
            import ray as _ray

            self._ocr_by_url = _ray.get(self.ocr_ref)
        out = {
            "url": [], "warc_ts": [], "lang": [], "page_no": [],
            "elements_json": [], "page_kind": [], "layout_score": [],
        }
        for row in batch.to_pylist():
            kind = row["page_kind"]
            try:
                if kind == "pdf_page":
                    page = json.loads(row["page_payload"])
                    elements, scores = process_pdf_page(
                        page, self.options, self._page_override(row)
                    )
                    score = scores["layout_score"]
                elif kind == "error":
                    elements, score = [], float("nan")
                else:
                    from ..kernels.document import html_to_elements

                    elements = html_to_elements(
                        (row["page_payload"] or b"").decode(
                            "utf-8", errors="replace"
                        )
                    )
                    score = float("nan")
            except Exception:
                # one corrupt page degrades, it must not fail the task
                kind = "error"
                elements, score = [], float("nan")
            out["url"].append(row["url"])
            out["warc_ts"].append(row["warc_ts"])
            out["lang"].append(row["lang"])
            out["page_no"].append(row["page_no"])
            out["elements_json"].append(json.dumps(elements, ensure_ascii=False))
            out["page_kind"].append(kind)
            out["layout_score"].append(score)
        return pa.Table.from_pydict(out)


def assemble_doc_group(
    group: pa.Table, options: ExtractOptions = DEFAULT_OPTIONS
) -> pa.Table:
    """map_groups(url): pages of one document -> final result row.

    Pages sort by page_no inside the group (the only cross-page
    ordering constraint, SURVEY.md §7.4) and run the same document
    assembly kernel as the doc-at-once path.
    """
    rows = sorted(group.to_pylist(), key=lambda r: r["page_no"])
    elements: list[dict] = []
    for r in rows:
        for el in json.loads(r["elements_json"]):
            el["bbox"] = tuple(el["bbox"])
            elements.append(el)
    assembled = assemble_document(elements)
    items = assembled["items"]
    extracted_text = assembled["extracted_text"]
    if options.do_code_enrichment:
        from ..kernels.formula import enrich_elements
        from ..kernels.reading_order import export_text

        items = enrich_elements(items)
        extracted_text = export_text(items)
    canon_items = canonical_items(items)
    scores = [r["layout_score"] for r in rows if r["layout_score"] == r["layout_score"]]
    first = rows[0]
    kinds = {r["page_kind"] for r in rows}
    had_error = "error" in kinds
    kind = "error" if kinds == {"error"} else (
        "pdf" if "pdf_page" in kinds else "html"
    )
    return pa.Table.from_pydict(
        {
            "url": [first["url"]],
            "warc_ts": [first["warc_ts"]],
            "lang": [first["lang"]],
            "doc_kind": [kind],
            "extracted_text": [extracted_text],
            "markdown": [export_markdown(items)],
            "elements_json": [json.dumps(canon_items, ensure_ascii=False)],
            "n_pages": [len(rows)],
            "n_elements": [len(items)],
            "n_tables": [sum(1 for it in items if it["kind"] == "table")],
            "layout_score": [sum(scores) / len(scores) if scores else float("nan")],
            "extract_ok": [not had_error],
        },
        schema=RESULT_SCHEMA,
    )
