"""Per-partition metrics counters recorded into shard manifests.

North_rule: "resumable from checkpoint with per-partition lineage +
metrics". The reference prints per-stage ms breakdowns on every run
(`/root/reference/gpu_processor.py:102-129`); at corpus scale the
equivalent is a per-shard metrics row that travels WITH the data
(computed vectorized inside the same batch that writes the shard) and
lands in the shard's ``_manifest_<id>.json``.

Metrics are plain columns aggregated per shard with one vectorized
pyarrow group_by per batch, then combined on the driver — the same
partial-aggregation shape every other wide op in this repo uses.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

METRIC_COLS = ["docs", "ok_docs", "pages", "tables", "text_bytes"]


def shard_metrics_partial(batch: pa.Table) -> pa.Table:
    """One result batch -> per-shard metric partials (vectorized).

    Robust to schema: extraction-specific columns contribute 0 when a
    dataset being checkpointed does not carry them.
    """
    names = set(batch.column_names)
    zeros = pa.array(np.zeros(batch.num_rows, dtype=np.int64))
    cols = {
        "shard_id": batch.column("shard_id"),
        "docs": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        "ok_docs": (
            pc.cast(batch.column("extract_ok"), pa.int64())
            if "extract_ok" in names
            else zeros
        ),
        "pages": (
            pc.cast(batch.column("n_pages"), pa.int64())
            if "n_pages" in names
            else zeros
        ),
        "tables": (
            pc.cast(batch.column("n_tables"), pa.int64())
            if "n_tables" in names
            else zeros
        ),
        "text_bytes": (
            pc.cast(
                pc.binary_length(
                    pc.cast(batch.column("extracted_text"), pa.large_binary())
                ),
                pa.int64(),
            )
            if "extracted_text" in names
            else zeros
        ),
    }
    t = pa.Table.from_pydict(cols)
    return (
        t.group_by("shard_id")
        .aggregate([(c, "sum") for c in METRIC_COLS])
        .rename_columns(["shard_id"] + METRIC_COLS)
    )


def combine_metric_partials(partials: list[pa.Table]) -> dict[int, dict[str, Any]]:
    """Driver-side combine: tiny tables (one row per shard per block)."""
    live = [t for t in partials if t.num_columns > 0]
    if not live:
        return {}
    merged = (
        pa.concat_tables(live)
        .group_by("shard_id")
        .aggregate([(c, "sum") for c in METRIC_COLS])
        .rename_columns(["shard_id"] + METRIC_COLS)
    )
    out: dict[int, dict[str, Any]] = {}
    for row in merged.to_pylist():
        sid = int(row.pop("shard_id"))
        row["recorded_at"] = time.time()
        out[sid] = row
    return out
