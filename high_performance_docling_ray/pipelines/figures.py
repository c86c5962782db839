"""Figure-image extraction (reference M25, document_assembler.py:62-91).

The reference crops the rendered page image at every figure's
provenance bbox and stores it on the picture item. Expressed over a
Dataset:

    pages -> extract_pipeline -> elements_json
          -> flat_map figure items -> (url, page_no, bbox, caption)
          -> crop stage (binary image payload; deterministic fake here —
             a real build crops the rendered page image)
          -> ImageFeatureStage actor pool (decode + features)

Wide-record discipline (SURVEY.md §7.4): the crop payload column is
created immediately before the feature stage and dropped right after —
it never rides along the whole pipeline.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from ..stages.extract_stage import RESULT_SCHEMA  # noqa: F401  (schema contract)
from ..stages.multimodal import ImageFeatureStage, encode_fake_image

CROP_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("page_no", pa.int32()),
        ("l", pa.float64()),
        ("t", pa.float64()),
        ("r", pa.float64()),
        ("b", pa.float64()),
        ("caption", pa.large_string()),
        ("media_id", pa.int64()),
        ("media", pa.binary()),
        ("media_type", pa.string()),
    ]
)


def figure_rows(batch: pa.Table) -> pa.Table:
    """Extraction result rows -> one row per figure item with a crop
    payload sized from the figure bbox (stub image; real build crops
    the rendered page)."""
    import hashlib

    out = {name: [] for name in CROP_SCHEMA.names}
    for row in batch.to_pylist():
        items = json.loads(row["elements_json"])
        for it in items:
            if it["kind"] != "figure":
                continue
            left, top, right, bottom = it["bbox"]
            h = max(1, min(512, int(round(bottom - top))))
            w = max(1, min(512, int(round(right - left))))
            seed = f"{row['url']}|{it['page_no']}|{left},{top}".encode()
            # globally unique, deterministic id (not a per-batch counter)
            media_id = int.from_bytes(
                hashlib.blake2b(seed, digest_size=8).digest(), "big"
            ) >> 1
            out["url"].append(row["url"])
            out["page_no"].append(int(it["page_no"]))
            out["l"].append(float(left))
            out["t"].append(float(top))
            out["r"].append(float(right))
            out["b"].append(float(bottom))
            caps = it.get("captions") or []
            out["caption"].append(caps[0] if caps else "")
            out["media_id"].append(media_id)
            out["media"].append(encode_fake_image(h, w, seed))
            out["media_type"].append("image/fake")
    return pa.Table.from_pydict(out, schema=CROP_SCHEMA)


def figure_features(
    result_ds: ray.data.Dataset,
    concurrency=(1, 4),
    batch_size: int = 16,
) -> ray.data.Dataset:
    """Extraction results -> per-figure decoded features.

    Small batches for the wide binary rows; the actor-pool feature
    stage drops the media payload column in its output.
    """
    crops = result_ds.map_batches(figure_rows, batch_format="pyarrow")
    feats = crops.map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return feats
