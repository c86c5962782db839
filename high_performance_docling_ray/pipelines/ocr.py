"""Distributed OCR: the reference's phase-2 steps 2-3 as Ray stages.

Reference flow (`/root/reference/gpu_processor.py:204-288`):
identify empty-text regions per page -> batch 32 crops through TrOCR
-> apply recognized text back by (page_no, cluster_id). Here the same
flow runs over a pages Dataset:

    pages parquet
      -> flat_map(explode_pdf_pages)                 # page rows
      -> map_batches(identify)                       # task rows (url, page_no, cluster_id, bbox)
      -> map_batches(OcrRecognizer, concurrency=(1,N), batch_size=32)
                                                     # ACTOR POOL: model weights
                                                     # load once per actor (A3)
      -> (url, page_no, cluster_id, ocr_text)        # J6 join key shape

The result table re-merges into the extraction by its (url, page_no,
cluster_id) key — the same key the inline apply join uses
(`kernels/document.py:assemble_page`). The recognizer core is the
deterministic stub from kernels/ocr.py; drop in a real vision model by
replacing one method on the actor.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from ..kernels.document import (
    PDF_MAGIC,
    ExtractOptions,
    page_clusters,
    sniff_format,
)
from ..kernels.ocr import OCR_BATCH_SIZE, identify_ocr_regions, recognize_batch

_OCR_OPTIONS = ExtractOptions(do_ocr=True)  # keeps the empty OCR regions

TASK_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("page_no", pa.int32()),
        ("cluster_id", pa.int32()),
        ("l", pa.float64()),
        ("t", pa.float64()),
        ("r", pa.float64()),
        ("b", pa.float64()),
    ]
)


def identify_tasks(batch: pa.Table) -> pa.Table:
    """Page rows -> OCR task rows (reference _identify_ocr_regions).

    Malformed documents are skipped (the extraction path degrades the
    same way) rather than failing the task."""
    out = {name: [] for name in TASK_SCHEMA.names}
    for row in batch.to_pylist():
        payload = row["html"]
        if sniff_format(payload or b"") != "pdf":
            continue
        try:
            doc = json.loads(payload[len(PDF_MAGIC):])
            pages = doc["pages"]
        except Exception:
            continue  # unparseable document: no OCR tasks from it
        for page in pages:
            clusters, _cells = page_clusters(page, _OCR_OPTIONS)
            for task in identify_ocr_regions(clusters):
                out["url"].append(row["url"])
                out["page_no"].append(int(page["page_no"]))
                out["cluster_id"].append(int(task["cluster_id"]))
                ll, tt, rr, bb = task["bbox"]
                out["l"].append(float(ll))
                out["t"].append(float(tt))
                out["r"].append(float(rr))
                out["b"].append(float(bb))
    return pa.Table.from_pydict(out, schema=TASK_SCHEMA)


class OcrRecognizer:
    """Actor-pool stage: model weights load once per actor (A3 shape).

    The stub loads instantly; a TrOCR deployment does its processor +
    model load here and replaces ``_recognize``.
    """

    def __init__(self) -> None:
        self._recognize = recognize_batch  # model handle in real build

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        # one model call per (url, page_no) run — real batched inference
        # over ONE page's crops, never mixing documents (a real model
        # crops from that page's image); rows of one page are contiguous
        # because identify_tasks emits them together
        texts: list[str] = []
        i = 0
        while i < len(rows):
            j = i
            key = (rows[i]["url"], rows[i]["page_no"])
            page_no = rows[i]["page_no"]
            while (
                j < len(rows)
                and (rows[j]["url"], rows[j]["page_no"]) == key
            ):
                j += 1
            tasks = [
                {
                    "cluster_id": r["cluster_id"],
                    "bbox": (r["l"], r["t"], r["r"], r["b"]),
                }
                for r in rows[i:j]
            ]
            texts.extend(self._recognize(tasks, page_no))
            i = j
        return pa.Table.from_pydict(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "page_no": pa.array([r["page_no"] for r in rows], pa.int32()),
                "cluster_id": pa.array(
                    [r["cluster_id"] for r in rows], pa.int32()
                ),
                "ocr_text": pa.array(texts, pa.large_string()),
            }
        )


def ocr_pipeline(
    pages_ds: ray.data.Dataset, concurrency=(1, 4)
) -> ray.data.Dataset:
    """pages -> OCR task rows -> recognized text keyed for the J6 merge."""
    return pages_ds.map_batches(
        identify_tasks, batch_format="pyarrow"
    ).map_batches(
        OcrRecognizer,
        batch_format="pyarrow",
        batch_size=OCR_BATCH_SIZE,  # reference: 32 regions per model call
        concurrency=concurrency,
    )


def collect_ocr_results(
    ocr_ds: ray.data.Dataset, broadcast_budget: int = 2_000_000
):
    """OCR result rows -> broadcast ObjectRef to
    ``{url: {page_no: {cluster_id: text}}}`` for the extraction
    join-back (J6; reference apply gpu_processor.py:260-288), or
    ``None`` when the result exceeds ``broadcast_budget`` rows.

    The nested dict is bounded by the number of EMPTY-text regions —
    a small fraction of the corpus — so it usually broadcasts like the
    dedup winner set. ONE streaming pass (the winner-phase idiom): the
    over-budget path stops pulling as soon as the budget breaks, and
    callers fall back to the distributed column attach
    (``attach_ocr_json``)."""
    import ray

    lookup: dict[str, dict[int, dict[int, str]]] = {}
    total = 0
    for t in ocr_ds.iter_batches(batch_format="pyarrow"):
        if t.num_rows == 0:
            continue
        total += t.num_rows
        if total > broadcast_budget:
            return None
        for row in t.to_pylist():
            lookup.setdefault(row["url"], {}).setdefault(
                int(row["page_no"]), {}
            )[int(row["cluster_id"])] = row["ocr_text"]
    return ray.put(lookup)


def _url_ocr_json(group: pa.Table) -> pa.Table:
    """One hash-bucket of OCR rows -> per-url JSON lookup rows
    (url, ocr_json). Vectorized run detection over the sorted bucket;
    JSON bodies are tiny (one url's empty-text regions)."""
    import pyarrow.compute as pc

    order = pc.sort_indices(
        group,
        sort_keys=[
            ("url", "ascending"),
            ("page_no", "ascending"),
            ("cluster_id", "ascending"),
        ],
    )
    tbl = group.take(order)
    urls = tbl.column("url").to_pylist()
    pages = tbl.column("page_no").to_pylist()
    cids = tbl.column("cluster_id").to_pylist()
    texts = tbl.column("ocr_text").to_pylist()
    out_url: list[str] = []
    out_json: list[str] = []
    i, n = 0, len(urls)
    while i < n:
        j = i
        lookup: dict[int, dict[int, str]] = {}
        while j < n and urls[j] == urls[i]:
            lookup.setdefault(int(pages[j]), {})[int(cids[j])] = texts[j]
            j += 1
        out_url.append(urls[i])
        out_json.append(json.dumps(lookup, ensure_ascii=False))
        i = j
    return pa.Table.from_pydict(
        {
            "url": pa.array(out_url, pa.string()),
            "ocr_json": pa.array(out_json, pa.large_string()),
        }
    )


def attach_ocr_json(
    pages_ds: ray.data.Dataset, ocr_ds: ray.data.Dataset
) -> ray.data.Dataset:
    """Distributed join-back tier: aggregate OCR rows to one
    ``ocr_json`` lookup per url (bucketed groupby, vectorized runs)
    and LEFT-JOIN it onto the pages stream with the union-cogroup
    string-key join (pipelines/joins.py). Urls with no OCR rows get a
    null ocr_json — the extractors fall back to the inline recognizer
    there, which is output-identical because identify found no regions.

    This tier moves page payloads through one keyed exchange, so it is
    reserved for the regime where the OCR result set cannot broadcast
    (collect_ocr_results -> None)."""
    from .joins import cogroup_attach, string_key_buckets

    def add_part(batch: pa.Table, num_parts: int) -> pa.Table:
        parts = string_key_buckets(batch.column("url"), num_parts)
        return batch.append_column("part", pa.array(parts, pa.int32()))

    num_parts = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    per_url = (
        ocr_ds.map_batches(
            lambda b: add_part(b, num_parts), batch_format="pyarrow"
        )
        .groupby("part")
        .map_groups(
            lambda g: _url_ocr_json(g.drop_columns(["part"])),
            batch_format="pyarrow",
        )
    )
    left_fields = [
        pa.field(name, typ) for name, typ in zip(
            pages_ds.schema().names, pages_ds.schema().types
        )
    ]
    return cogroup_attach(
        pages_ds,
        per_url,
        "url",
        left_fields=left_fields,
        payload_fields=[pa.field("ocr_json", pa.large_string())],
    )


def extract_with_distributed_ocr(
    pages_ds_factory,
    options: ExtractOptions,
    concurrency=(1, 4),
    ocr_broadcast_budget: int = 2_000_000,
    **extract_kwargs,
) -> ray.data.Dataset:
    """Reference phase-2 OCR as a SEPARATE Ray stage, joined back into
    extraction by (url, page_no, cluster_id) — byte-identical to the
    inline ``do_ocr=True`` path (asserted in tests/test_ocr_pipeline.py)
    through BOTH tiers:

    * in-budget: results broadcast once (``ray.put``) and every
      extractor branch (doc-at-once AND page-exploded) reads the
      lookup zero-copy;
    * over-budget: results aggregate to a per-url ``ocr_json`` column
      attached via the distributed union-cogroup join, and the column
      rides the pages stream through dedup / size-class split /
      page explosion into the extractors.

    ``pages_ds_factory``: zero-arg callable returning the pages
    Dataset. Called twice — a lazy Dataset re-executes its upstream per
    consumer (NOTES_r1), so the OCR pass and the extraction pass each
    build their own plan rather than sharing one branch point.
    """
    from .extract import extract_pipeline

    ocr_ds = ocr_pipeline(pages_ds_factory(), concurrency=concurrency)
    ocr_ref = collect_ocr_results(ocr_ds, ocr_broadcast_budget)
    if ocr_ref is not None:
        return extract_pipeline(
            pages_ds_factory(), options=options, ocr_ref=ocr_ref,
            **extract_kwargs,
        )
    pages_with = attach_ocr_json(pages_ds_factory(), ocr_ds)
    return extract_pipeline(pages_with, options=options, **extract_kwargs)
