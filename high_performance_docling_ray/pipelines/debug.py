"""Debug overlay sink (SURVEY §2.1 S7).

The reference draws cluster/cell overlays onto page PNGs and writes
one file per page (`fork/layout/layout_model.py:113-155`,
`fork/table/table_structure_model.py:96-153`). This container has no
PIL, so the overlays render as SVG — pure text, deterministic, zero
native deps — with the same side-by-side split: left pane = regular
clusters, right pane = FORM / KEY_VALUE_REGION / PICTURE, each box
annotated with label + confidence, cells as thin inner boxes.

The sink is a ``map_batches`` stage writing one ``.svg`` per
(url, page_no) under ``out_dir`` (files land from the worker, like the
shard manifests; at multi-node scale out_dir is shared storage). The
``debug_overlays`` driver query returns the per-page index instead of
the files so the stage is visible at the correctness gate.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

import ray.data

from ..kernels.document import (
    PDF_MAGIC,
    DEFAULT_OPTIONS,
    page_clusters,
    sniff_format,
)
from ..kernels.textnorm import safe_id

_LABEL_COLORS = {
    "text": "#2a6fbb",
    "section_header": "#b02a9b",
    "title": "#b02a9b",
    "list_item": "#1d8a53",
    "caption": "#b8860b",
    "footnote": "#b8860b",
    "page_header": "#888888",
    "page_footer": "#888888",
    "table": "#cc3311",
    "document_index": "#cc3311",
    "picture": "#7744cc",
    "form": "#117766",
    "key_value_region": "#117766",
    "formula": "#aa3377",
    "code": "#aa3377",
}
_RIGHT_PANE = {"form", "key_value_region", "picture"}


def _svg_boxes(clusters, cells, x_off: float) -> list[str]:
    frags = []
    for cl in clusters:
        l, t, r, b = cl["bbox"]
        color = _LABEL_COLORS.get(cl["label"], "#444444")
        frags.append(
            f'<rect x="{l + x_off:.1f}" y="{t:.1f}" width="{r - l:.1f}" '
            f'height="{b - t:.1f}" fill="none" stroke="{color}" '
            f'stroke-width="1.2"/>'
        )
        frags.append(
            f'<text x="{l + x_off:.1f}" y="{max(8.0, t - 2.0):.1f}" '
            f'font-size="7" fill="{color}">'
            f'{cl["label"]} {cl["confidence"]:.2f}</text>'
        )
        for row in cl["cells"]:
            frags.append(
                f'<rect x="{cells.l[row] + x_off:.1f}" y="{cells.t[row]:.1f}" '
                f'width="{cells.r[row] - cells.l[row]:.1f}" '
                f'height="{cells.b[row] - cells.t[row]:.1f}" fill="none" '
                f'stroke="{color}" stroke-width="0.4" stroke-dasharray="2,2"/>'
            )
    return frags


def page_overlay_svg(page: dict, options=DEFAULT_OPTIONS) -> str:
    """One parsed page -> side-by-side SVG overlay (deterministic)."""
    return _page_overlay(page, options)[0]


def _page_overlay(page: dict, options=DEFAULT_OPTIONS) -> tuple[str, int]:
    """(svg, n_clusters) — one layout-postprocess pass serves both."""
    clusters, cells = page_clusters(page, options)
    w, h = float(page["width"]), float(page["height"])
    left = [c for c in clusters if c["label"] not in _RIGHT_PANE]
    right = [c for c in clusters if c["label"] in _RIGHT_PANE]
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{2 * w:.0f}" '
        f'height="{h:.0f}" viewBox="0 0 {2 * w:.0f} {h:.0f}">',
        f'<rect x="0" y="0" width="{w:.0f}" height="{h:.0f}" fill="#ffffff" '
        f'stroke="#000000"/>',
        f'<rect x="{w:.0f}" y="0" width="{w:.0f}" height="{h:.0f}" '
        f'fill="#ffffff" stroke="#000000"/>',
    ]
    parts += _svg_boxes(left, cells, 0.0)
    parts += _svg_boxes(right, cells, w)
    parts.append("</svg>")
    return "\n".join(parts), len(clusters)


def write_debug_overlays(
    pages_ds: ray.data.Dataset, out_dir: str, options=DEFAULT_OPTIONS
) -> ray.data.Dataset:
    """PDF-payload rows -> one SVG per page under ``out_dir``; returns
    the written index (url, page_no, path, n_clusters, svg_bytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def render(batch: pa.Table) -> pa.Table:
        out = {"url": [], "page_no": [], "path": [], "n_clusters": [],
               "svg_bytes": []}
        for row in batch.to_pylist():
            payload = row["html"]
            if sniff_format(payload or b"") != "pdf":
                continue
            try:
                pages = json.loads(payload[len(PDF_MAGIC):])["pages"]
            except Exception:
                continue
            stem = safe_id(row["url"])
            if len(stem) > 80:  # keep filenames bounded like the ref's stems
                stem = stem[:64] + hashlib.md5(stem.encode()).hexdigest()[:8]
            for page in pages:
                svg, n_clusters = _page_overlay(page, options)
                path = os.path.join(
                    out_dir, f"{stem}_layout_page_{int(page['page_no']):05}.svg"
                )
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    f.write(svg)
                os.replace(tmp, path)
                out["url"].append(row["url"])
                out["page_no"].append(int(page["page_no"]))
                out["path"].append(path)
                out["n_clusters"].append(n_clusters)
                out["svg_bytes"].append(len(svg))
        return pa.Table.from_pydict(
            {
                "url": pa.array(out["url"], pa.string()),
                "page_no": pa.array(out["page_no"], pa.int32()),
                "path": pa.array(out["path"], pa.string()),
                "n_clusters": pa.array(out["n_clusters"], pa.int32()),
                "svg_bytes": pa.array(out["svg_bytes"], pa.int64()),
            }
        )

    return pages_ds.map_batches(render, batch_format="pyarrow")
