"""Small-file compaction — the storage-maintenance pass every
long-running 100 TB pipeline needs: resumable writers produce one file
per shard per run (state/checkpoint.py:write_resumable), and after
enough incremental runs the store is thousands of KB-sized files whose
per-file open/footer cost dominates reads. Compaction rewrites the
store into ``target_files`` larger files WITHOUT changing a row.

Shape at scale:
  - the plan is driver-side over file METADATA only (paths + sizes
    from the filesystem listing — no data read): contiguous greedy
    bin-packing into byte-balanced output groups.
  - execution is one ``map_batches`` over plan rows: each task reads
    only ITS input group, concatenates, and writes ONE output file
    (tmp + atomic rename, retry-safe) — embarrassingly parallel,
    zero shuffle, no driver data movement.
  - the compacted store carries a manifest (input fingerprint, per-
    file row counts) and a ``_SUCCESS`` marker, same conventions as
    every persisted artifact in this repo.

The driver-gate query routes the flagship extraction output through
write -> compact -> read-back, so its oracle is the extract_docs_text
SQL itself: compaction provably cannot corrupt payloads (the same
hash-gate trick parse_wet uses for WARC framing).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa

import ray.data


def _list_parts(store_dir: str) -> list[str]:
    out: list[str] = []
    for root, _dirs, files in os.walk(store_dir):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def plan_compaction(
    store_dir: str, target_files: int
) -> list[list[str]]:
    """Greedy contiguous byte-balanced grouping of the store's parquet
    files into at most ``target_files`` output groups. Metadata-only:
    never opens a file."""
    paths = _list_parts(store_dir)
    if not paths:
        return []
    sizes = np.array([os.path.getsize(p) for p in paths], np.int64)
    budget = max(1, int(np.ceil(sizes.sum() / max(1, target_files))))
    groups: list[list[str]] = [[]]
    acc = 0
    for p, s in zip(paths, sizes):
        if acc and acc + s > budget and len(groups) < target_files:
            groups.append([])
            acc = 0
        groups[-1].append(p)
        acc += int(s)
    return groups


def compact_store_dir(
    store_dir: str, out_dir: str, target_files: int = 4
) -> dict:
    """Compact ``store_dir`` into ``out_dir``; returns the manifest
    (groups, per-file row counts, totals)."""
    groups = plan_compaction(store_dir, target_files)
    os.makedirs(out_dir, exist_ok=True)

    plan = ray.data.from_items(
        [
            {"out_id": i, "paths": g, "out_dir": out_dir}
            for i, g in enumerate(groups)
        ]
    )

    def compact_one(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        ids, rows_out, files_in = [], [], []
        for row in batch.to_pylist():
            tabs = [pq.read_table(p) for p in row["paths"]]
            merged = pa.concat_tables(tabs, promote_options="default")
            path = os.path.join(
                row["out_dir"], f"compact-{row['out_id']:05d}.parquet"
            )
            tmp = path + ".tmp"  # deterministic: a task retry overwrites
            pq.write_table(merged, tmp)
            os.replace(tmp, path)
            ids.append(row["out_id"])
            rows_out.append(merged.num_rows)
            files_in.append(len(row["paths"]))
        return pa.Table.from_pydict(
            {
                "out_id": pa.array(ids, pa.int32()),
                "n_rows": pa.array(rows_out, pa.int64()),
                "n_files_in": pa.array(files_in, pa.int64()),
            }
        )

    acct = plan.map_batches(
        compact_one, batch_size=1, batch_format="pyarrow"
    ).take_all()
    manifest = {
        "files_in": int(sum(r["n_files_in"] for r in acct)),
        "files_out": len(acct),
        "rows": int(sum(r["n_rows"] for r in acct)),
        "per_file": {int(r["out_id"]): int(r["n_rows"]) for r in acct},
    }
    with open(os.path.join(out_dir, "_compact_manifest.json"), "w") as f:
        json.dump(manifest, f)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return manifest


def compacted_extract(
    sf_dir: str, num_shards: int = 32, target_files: int = 4
) -> ray.data.Dataset:
    """Flagship extraction routed write -> compact -> read-back:
    (url, extracted_text) rows from the COMPACTED store. Both stores
    are content-keyed one-time artifacts."""
    from ..sources.pages import pages_from_documents
    from ..state.checkpoint import write_resumable
    from .extract import extract_pipeline
    from .io import read_parquet_clean

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    tag = hashlib.md5(
        f"{src}:{num_shards}:{target_files}:v1:{content_tag}".encode()
    ).hexdigest()[:12]
    base = f"/tmp/graft_compact/{tag}"
    raw_dir = os.path.join(base, "raw")
    out_dir = os.path.join(base, "compacted")

    if not os.path.exists(os.path.join(raw_dir, "_SUCCESS")):
        if os.path.isdir(raw_dir):
            shutil.rmtree(raw_dir)
        os.makedirs(raw_dir, exist_ok=True)
        rows = extract_pipeline(
            pages_from_documents(sf_dir), dedup=True, explode_giant=False
        ).select_columns(["url", "extracted_text"])
        write_resumable(rows, raw_dir, num_shards=num_shards)
        with open(os.path.join(raw_dir, "_SUCCESS"), "w") as f:
            f.write("ok")

    if not os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        compact_store_dir(raw_dir, out_dir, target_files=target_files)

    files = [
        os.path.join(out_dir, p)
        for p in sorted(os.listdir(out_dir))
        if p.endswith(".parquet")
    ]
    return read_parquet_clean(files).select_columns(
        ["url", "extracted_text"]
    )


def gc_store(raw_dir: str, compacted_dir: str) -> dict:
    """Reclaim the superseded RAW store after a verified compaction —
    the retention step that keeps an incremental store from growing
    without bound. Refuses (raises) unless the compacted store proves
    itself: ``_SUCCESS`` present AND the compaction manifest's row
    total equals the raw parquet footers' row total (metadata-only
    check, no data read). Only then are raw parquet files deleted.

    Returns {files_removed, bytes_reclaimed, rows_verified}.
    """
    import pyarrow.parquet as pq

    marker = os.path.join(compacted_dir, "_SUCCESS")
    manifest_path = os.path.join(compacted_dir, "_compact_manifest.json")
    if not (os.path.exists(marker) and os.path.exists(manifest_path)):
        raise RuntimeError(
            f"gc refused: {compacted_dir} has no verified compaction"
        )
    with open(manifest_path) as f:
        manifest = json.load(f)
    raw_files = _list_parts(raw_dir)
    raw_rows = sum(pq.read_metadata(p).num_rows for p in raw_files)
    if raw_rows != manifest["rows"]:
        raise RuntimeError(
            "gc refused: compacted manifest rows "
            f"{manifest['rows']} != raw rows {raw_rows}"
        )
    reclaimed = 0
    for p in raw_files:
        reclaimed += os.path.getsize(p)
        os.remove(p)
    return {
        "files_removed": len(raw_files),
        "bytes_reclaimed": reclaimed,
        "rows_verified": raw_rows,
    }
