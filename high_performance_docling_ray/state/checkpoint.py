"""Per-partition checkpointed lineage: shard manifests + resume filter.

North_rule requirement: any shard can resume mid-run. Design
(SURVEY.md §4.2):

* output is partitioned by a deterministic ``shard_id =
  int(md5(url)) % num_shards`` — one directory per shard, never one
  giant file;
* after a shard's rows are fully written, a ``_manifest_<shard>.json``
  records shard id, row count and per-shard metrics;
* on resume, completed shard ids are read back and their input rows
  are filtered out *before* the DAG runs (an Arrow-vectorized filter at
  the read, not a driver-side loop).

Ray's own task retries handle intra-run failures; the manifest handles
cross-run resume.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

MANIFEST_PREFIX = "_manifest_"


def shard_of_url(url: str, num_shards: int) -> int:
    digest = hashlib.md5(url.encode("utf-8")).digest()
    return int.from_bytes(digest[:8], "big") % num_shards


def add_shard_column(batch: pa.Table, num_shards: int) -> pa.Table:
    """Attach ``shard_id``. A batch that already carries one (a
    doc-keyed result, say) keeps it — the sink is key-agnostic; the
    url hash is only the default for page-keyed extraction output."""
    if "shard_id" in batch.column_names:
        return batch
    urls = batch.column("url").to_pylist()
    shards = pa.array(
        [shard_of_url(u, num_shards) for u in urls], type=pa.int32()
    )
    return batch.append_column("shard_id", shards)


def completed_shards(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    done: set[int] = set()
    for name in os.listdir(out_dir):
        if name.startswith(MANIFEST_PREFIX) and name.endswith(".json"):
            try:
                with open(os.path.join(out_dir, name)) as f:
                    m = json.load(f)
                done.add(int(m["shard_id"]))
            except (ValueError, KeyError, OSError):
                continue
    return done


def filter_completed(
    ds: ray.data.Dataset, out_dir: str, num_shards: int
) -> tuple[ray.data.Dataset, set[int]]:
    """Drop rows whose shard already has a manifest. Returns the
    filtered dataset (with ``shard_id`` attached) and the skipped set."""
    done = completed_shards(out_dir)

    def f(batch: pa.Table) -> pa.Table:
        batch = add_shard_column(batch, num_shards)
        if not done:
            return batch
        mask = pc.invert(
            pc.is_in(
                batch.column("shard_id"),
                value_set=pa.array(sorted(done), type=pa.int32()),
            )
        )
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow"), done


def write_manifests(out_dir: str, shard_counts: dict[int, int],
                    metrics: dict[str, Any] | None = None,
                    per_shard_metrics: dict[int, dict] | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    now = time.time()
    per_shard_metrics = per_shard_metrics or {}
    for shard_id, rows in shard_counts.items():
        manifest = {
            "shard_id": int(shard_id),
            "rows": int(rows),
            "completed_at": now,
            "metrics": per_shard_metrics.get(int(shard_id), metrics or {}),
        }
        path = os.path.join(out_dir, f"{MANIFEST_PREFIX}{shard_id}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)  # atomic: manifest appears only when complete


@ray.remote(num_cpus=0)
class MetricsCollector:
    """Side-channel for per-shard metric partials.

    Ray Data cannot tee one streaming pass into both a sink and an
    aggregate, so the write stage ships its (tiny) partial tables to
    this actor; the driver combines them after the sink finishes. This
    is the one deliberate drop to a raw actor in the repo (SURVEY.md
    custom-operator rule c).

    Correctness under failure: partials are keyed by a content hash of
    the batch, so a Ray task RETRY that re-sends the same batch
    overwrites rather than double-counts; the sender ``ray.get``s the
    add call, so every partial is delivered before ``write_parquet``
    returns and ``collect`` runs."""

    def __init__(self) -> None:
        self._partials: dict[str, object] = {}

    def add(self, key: str, tbl) -> None:
        self._partials[key] = tbl

    def collect(self) -> list:
        return list(self._partials.values())


def _batch_fingerprint(batch: pa.Table) -> str:
    """Deterministic identity of one batch (retry-idempotency key).

    Hashes VALUES, not Arrow buffers: zero-copy slices of one block
    alias the same parent buffers, so buffer-hashing would collide for
    distinct slices and drop their partials."""
    h = hashlib.md5()
    h.update(str(batch.num_rows).encode())
    if "url" in batch.column_names:
        for u in batch.column("url").to_pylist():
            h.update(b"\x00" if u is None else u.encode("utf-8"))
            h.update(b"\x01")
    elif batch.num_rows:
        # no url column: digest EVERY value via Arrow IPC bytes, so two
        # distinct batches with identical first/last rows can't collide
        # and silently overwrite each other's metric partials. `take`
        # rebuilds compact arrays first: zero-copy slices carry
        # non-rebased offset buffers that would make equal values hash
        # unequal across retries
        compact = batch.take(pa.array(range(batch.num_rows), type=pa.int64()))
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, compact.schema) as writer:
            writer.write_table(compact)
        h.update(sink.getvalue())
    return h.hexdigest()


def write_resumable(
    result_ds: ray.data.Dataset,
    out_dir: str,
    num_shards: int = 64,
    per_shard_manifests: bool = True,
    _fail_shards: set[int] | None = None,
) -> dict[int, int]:
    """Write results partitioned by shard_id with per-shard manifests.

    Default (``per_shard_manifests=True``): shards group on
    ``shard_id`` and each shard is written by ONE task that emits its
    ``_manifest_<id>.json`` the moment its parquet file closes — a
    crash mid-run leaves a manifest for every COMPLETED shard, so
    "any shard can resume mid-run" (north_rule) holds at shard
    granularity, not just whole-run granularity (VERDICT r1 item 6).
    The groupby shuffle is the price of shard-atomic manifests; pass
    ``per_shard_manifests=False`` for the shuffle-free single-pass sink
    whose manifests land only after the whole write returns.

    ``_fail_shards`` is a test hook: those shard writers raise, letting
    tests simulate a mid-run crash deterministically.
    """
    from .metrics import combine_metric_partials, shard_metrics_partial

    if not per_shard_manifests:
        return _write_resumable_streaming(result_ds, out_dir, num_shards)

    os.makedirs(out_dir, exist_ok=True)
    fail_shards = _fail_shards or set()

    def write_shard(group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        if group.num_rows == 0:
            return pa.Table.from_pydict(
                {"shard_id": pa.array([], pa.int32()),
                 "rows": pa.array([], pa.int64())}
            )
        sid = int(group.column("shard_id")[0].as_py())
        if sid in fail_shards:
            raise RuntimeError(f"injected crash for shard {sid}")
        metrics = combine_metric_partials([shard_metrics_partial(group)])
        shard_dir = os.path.join(out_dir, f"shard_id={sid}")
        os.makedirs(shard_dir, exist_ok=True)
        path = os.path.join(shard_dir, "part-0.parquet")
        tmp = path + ".tmp"  # deterministic name: a task RETRY overwrites
        pq.write_table(group.drop_columns(["shard_id"]), tmp)
        os.replace(tmp, path)  # data visible only when complete
        # manifest on shard close — not after the whole sink
        write_manifests(out_dir, {sid: group.num_rows},
                        per_shard_metrics=metrics)
        return pa.Table.from_pydict(
            {"shard_id": pa.array([sid], pa.int32()),
             "rows": pa.array([group.num_rows], pa.int64())}
        )

    counts_ds = (
        result_ds.map_batches(
            lambda b: add_shard_column(b, num_shards), batch_format="pyarrow"
        )
        .groupby("shard_id")
        .map_groups(write_shard, batch_format="pyarrow")
    )
    return {
        int(r["shard_id"]): int(r["rows"]) for r in counts_ds.take_all()
    }


def _write_resumable_streaming(
    result_ds: ray.data.Dataset,
    out_dir: str,
    num_shards: int = 64,
) -> dict[int, int]:
    """Single-pass sink: manifests + per-shard metrics in the SAME
    streaming pass (metric partials ship to the collector actor; no
    second pass, no shuffle) — but manifests land only after the whole
    write returns, so cross-run resume is all-or-nothing."""
    from .metrics import combine_metric_partials, shard_metrics_partial

    collector = MetricsCollector.remote()

    def tap(batch: pa.Table) -> pa.Table:
        batch = add_shard_column(batch, num_shards)
        # synchronous: acts as the delivery barrier (see MetricsCollector)
        ray.get(
            collector.add.remote(
                _batch_fingerprint(batch), shard_metrics_partial(batch)
            )
        )
        return batch

    with_shards = result_ds.map_batches(tap, batch_format="pyarrow")
    with_shards.write_parquet(out_dir, partition_cols=["shard_id"])
    metrics = combine_metric_partials(ray.get(collector.collect.remote()))
    counts = {sid: int(m["docs"]) for sid, m in metrics.items()}
    write_manifests(out_dir, counts, per_shard_metrics=metrics)
    return counts


def run_resumable(
    input_ds: ray.data.Dataset,
    build_pipeline,
    out_dir: str,
    num_shards: int = 64,
) -> dict[int, int]:
    """Resume-aware run: filter completed shards from the *input*,
    build the pipeline over the remainder, write + manifest."""
    remaining, skipped = filter_completed(input_ds, out_dir, num_shards)
    remaining = remaining.drop_columns(["shard_id"])
    result = build_pipeline(remaining)
    counts = write_resumable(result, out_dir, num_shards)
    for s in skipped:
        counts.setdefault(s, -1)
    return counts
