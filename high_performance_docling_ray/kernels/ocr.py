"""OCR region identify / apply (reference M11, M12, J6, A3).

Semantics from `/root/reference/gpu_processor.py:204-288`:

* identify: clusters with a text-ish label and ZERO assigned cells are
  OCR tasks (text region with no extractable text);
* recognize: the reference batches 32 crops through TrOCR
  (gpu_processor.py:236-258). Torch isn't in this container, so the
  recognizer is a clearly-marked deterministic STUB — replace
  ``recognize_batch`` with a real model call inside the actor to go
  live; identify/apply plumbing is real.
* apply: recognized text becomes a synthetic text cell with
  ``from_ocr=True, confidence=0.9`` appended to the cluster
  (gpu_processor.py:279-285).
"""

from __future__ import annotations

import hashlib

from . import labels as L

OCR_TEXT_LABELS = frozenset(
    {L.TEXT, L.SECTION_HEADER, L.CAPTION, L.FOOTNOTE, L.LIST_ITEM}
)
OCR_CONFIDENCE = 0.9  # gpu_processor.py:283
OCR_BATCH_SIZE = 32   # gpu_processor.py:236


def identify_ocr_regions(clusters: list[dict]) -> list[dict]:
    """Empty text clusters -> OCR tasks (gpu_processor.py:204-234)."""
    return [
        {"cluster_id": cl["id"], "bbox": tuple(cl["bbox"])}
        for cl in clusters
        if cl["label"] in OCR_TEXT_LABELS and not cl["cells"]
    ]


def recognize_batch(tasks: list[dict], page_no: int) -> list[str]:
    """STUB recognizer: deterministic text per (page_no, cluster_id, bbox).

    A real deployment replaces this with a TrOCR/vision-model call in
    the actor (weights loaded once in ``__init__``); everything around
    it is unchanged.
    """
    out = []
    for t in tasks:
        payload = f"{page_no}:{t['cluster_id']}:" + ",".join(
            f"{v:.1f}" for v in t["bbox"]
        )
        # md5 so the DuckDB oracle can reproduce the stub exactly:
        # substr(md5(printf('%d:%d:%.1f,...')), 1, 8)
        h = hashlib.md5(payload.encode()).hexdigest()[:8]
        out.append(f"[ocr {h}]")
    return out


def run_ocr(clusters: list[dict], page_no: int) -> dict[int, str]:
    """identify -> recognize (in reference-sized batches) -> map by
    cluster_id for the apply join (J6)."""
    tasks = identify_ocr_regions(clusters)
    results: dict[int, str] = {}
    for i in range(0, len(tasks), OCR_BATCH_SIZE):
        chunk = tasks[i : i + OCR_BATCH_SIZE]
        for task, text in zip(chunk, recognize_batch(chunk, page_no)):
            results[task["cluster_id"]] = text
    return results
