"""Cluster job entrypoint: the flagship extraction as a `ray job submit` payload.

North_rule: "run via ray job submit on a fixed-size multi-node Ray
cluster". On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/extract_job.py \
            --input  s3://bucket/pages/ \
            --output s3://bucket/extracted/ \
            --num-shards 4096 --resume

In this sandbox the same script runs standalone (Ray auto-inits local).
The job is resume-aware: completed shards (those with a
``_manifest_<id>.json``) are filtered out of the INPUT before the DAG
is built, so a preempted run continues where it stopped
(state/checkpoint.py). Output is partitioned parquet, one directory
per shard — never one giant file — with per-shard metrics in each
manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `ray job submit --working-dir .` ships the repo root; make the
# package importable when the entrypoint lives in jobs/.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="pages parquet path/dir")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--num-shards", type=int, default=64)
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="skip shards that already have a manifest")
    p.add_argument("--explode-giant", action="store_true",
                   help="enable the page-exploded plan for 100+-page monster "
                        "documents (two-branch union; only worth it when the "
                        "corpus actually contains such documents)")
    p.add_argument("--giant-bytes", type=int, default=None,
                   help="payload size that routes a doc to the page-exploded path")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init()  # under `ray job submit` this attaches to the cluster

    from high_performance_docling_ray.pipelines.extract import (
        GIANT_BYTES,
        extract_pipeline,
        read_pages,
    )
    from high_performance_docling_ray.state.checkpoint import (
        completed_shards,
        filter_completed,
        write_resumable,
    )

    t0 = time.time()
    ds = read_pages(args.input)
    skipped: set[int] = set()
    if args.resume:
        ds, skipped = filter_completed(ds, args.output, args.num_shards)
        ds = ds.drop_columns(["shard_id"])

    result = extract_pipeline(
        ds,
        dedup=not args.no_dedup,
        explode_giant=args.explode_giant,
        giant_bytes=args.giant_bytes or GIANT_BYTES,
        # key-column read for the dedup winner phase (no payload decode).
        # Safe under --resume: a url hashes to exactly one shard, so a
        # filtered shard's winner entries simply never match a row.
        source_path=args.input,
    )
    counts = write_resumable(result, args.output, num_shards=args.num_shards)

    done = completed_shards(args.output)
    summary = {
        "wall_s": round(time.time() - t0, 2),
        "shards_written": len(counts),
        "shards_skipped_resume": len(skipped),
        "shards_complete_total": len(done),
        "rows_written": sum(c for c in counts.values() if c >= 0),
        "output": args.output,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
