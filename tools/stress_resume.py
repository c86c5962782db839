"""Stress-prove checkpoint resume under forced spilling (VERDICT r4 #4).

Protocol:

1. Synthesize an N-doc pages corpus (bench's cached generator).
2. REFERENCE run: the resume-aware north-rule extraction job
   (``run_resumable``: manifest filter -> dedup -> size-class split ->
   explode-giant extract -> per-shard parquet + manifests) in a fresh
   subprocess with a TIGHT object store (forces Ray object spilling),
   uninterrupted.
3. KILL run: the same job against a second output dir; the parent
   polls for per-shard manifests and SIGKILLs the whole process group
   the moment some (but not all) shards have committed — a real
   mid-write driver death, not a polite exception.
4. RESUME run: a fresh subprocess against the same output dir;
   ``filter_completed`` drops the committed shards' input rows before
   the DAG runs and the job finishes the remainder.
5. VERDICT: the killed+resumed output must be BYTE-IDENTICAL to the
   uninterrupted reference (per-url extracted rows compared in full
   after a canonical sort), and every shard must carry a manifest.

Usage:
    python tools/stress_resume.py --docs 1000000 --num-shards 64 \
        --object-store-gb 4.0 --cpus 32
Prints one JSON line with the verdict + timings (including the largest
"Spilled N MiB" figure from the reference child's log — evidence the
object store actually spilled).

Sharp edge (measured): the north-rule DAG (two-branch union + two
AllToAll sorts) DEADLOCKS under Ray Data's per-operator resource
reservations when the object store is too small in ABSOLUTE terms —
NOT a data-size effect (a 46 MB corpus stalls at a 2 GB store; a
2.2 GB corpus stalls at 4 AND 8 GB but runs at 16 GB and the 37 GB
default). Force spilling by LOWERING object_spilling_threshold on a
store big enough for the reservations (16 GB + threshold 0.3 spills
12.7 GB on the 1M-doc corpus while progressing normally), never by
shrinking the store toward the stall region.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child_main(args) -> int:
    """One job run in this process: tight-object-store Ray session,
    resume-aware extraction, per-shard manifests."""
    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        object_store_memory=int(args.object_store_gb * 1e9),
        # spill EARLY (default 0.8): the point of the stress run is to
        # exercise disk spilling while the store is still big enough
        # for Ray Data's per-operator reservations to make progress
        _system_config={"object_spilling_threshold": args.spill_threshold},
    )
    from high_performance_docling_ray.pipelines.extract import (
        extract_pipeline,
        read_pages,
    )
    from high_performance_docling_ray.state.checkpoint import run_resumable

    counts = run_resumable(
        read_pages(args.input),
        lambda ds: extract_pipeline(
            ds, dedup=True, explode_giant=True, source_path=args.input
        ),
        args.output,
        num_shards=args.num_shards,
    )
    print(json.dumps({"shards": len(counts)}))
    ray.shutdown()
    return 0


def _spawn(argv, log_path, **kw):
    log = open(log_path, "ab")
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"] + argv,
        cwd=REPO,
        start_new_session=True,  # killpg reaps the raylet tree too
        stdout=log,
        stderr=log,
        **kw,
    )


def _spilled_mb(log_path: str) -> float:
    """Largest 'Spilled N MiB' figure in a child log — evidence the
    run actually exercised object-store spilling."""
    import re

    best = 0.0
    try:
        with open(log_path, "rb") as f:
            for line in f:
                m = re.search(rb"Spilled (\d+) MiB", line)
                if m:
                    best = max(best, float(m.group(1)))
    except OSError:
        pass
    return best


def _manifests(out_dir: str) -> int:
    if not os.path.isdir(out_dir):
        return 0
    return sum(
        1 for n in os.listdir(out_dir)
        if n.startswith("_manifest_") and n.endswith(".json")
    )


def _canonical_digest(out_dir: str):
    """(row_count, md5-of-sorted-rows) over every shard parquet —
    byte-level identity of the extracted output, order-independent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tables = []
    for root, _dirs, files in os.walk(out_dir):
        for f in sorted(files):
            if f.endswith(".parquet"):
                tables.append(pq.read_table(os.path.join(root, f)))
    if not tables:
        return 0, "empty"
    tbl = pa.concat_tables(tables).combine_chunks()
    tbl = tbl.sort_by([(c, "ascending") for c in tbl.column_names])
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return tbl.num_rows, hashlib.md5(sink.getvalue()).hexdigest()


def run_stress(
    docs: int,
    num_shards: int,
    object_store_gb: float,
    cpus: int,
    scratch: str | None = None,
    kill_after_frac: float = 0.1,
    quiet: bool = False,
    spill_threshold: float = 0.3,
) -> dict:
    import bench

    t0 = time.time()
    corpus = bench._prepare_corpus(docs)
    scratch = scratch or f"/tmp/graft_stress_resume_{docs}_{num_shards}"
    out_ref = os.path.join(scratch, "ref")
    out_kill = os.path.join(scratch, "kill")
    for d in (out_ref, out_kill):
        if os.path.isdir(d):
            import shutil

            shutil.rmtree(d)
    base = [
        "--input", corpus, "--num-shards", str(num_shards),
        "--object-store-gb", str(object_store_gb), "--cpus", str(cpus),
        "--spill-threshold", str(spill_threshold),
    ]

    os.makedirs(scratch, exist_ok=True)
    ref_log = os.path.join(scratch, "ref.log")
    kill_log = os.path.join(scratch, "kill.log")

    # 1. uninterrupted reference
    t_ref = time.time()
    p = _spawn(base + ["--output", out_ref], ref_log)
    p.wait()
    t_ref = time.time() - t_ref
    assert _manifests(out_ref) == num_shards, "reference run incomplete"

    # 2. kill mid-write: SIGKILL the process group once SOME shards
    # have committed manifests (but not all)
    kill_at = max(1, int(num_shards * kill_after_frac))
    killed_with = None
    for attempt in range(3):
        p = _spawn(base + ["--output", out_kill], kill_log)
        while p.poll() is None:
            n = _manifests(out_kill)
            if n >= kill_at:
                os.killpg(os.getpgid(p.pid), signal.SIGKILL)
                p.wait()
                killed_with = _manifests(out_kill)
                break
            time.sleep(0.02)
        if killed_with is not None and killed_with < num_shards:
            break  # genuine mid-run kill
        # run finished before the kill landed (or every shard already
        # committed): wipe and retry with an earlier trigger
        import shutil

        shutil.rmtree(out_kill, ignore_errors=True)
        kill_at = 1
        killed_with = None
    assert killed_with is not None and killed_with < num_shards, (
        "could not land a mid-run kill; corpus too small for the "
        "write window"
    )

    # 3. resume from the manifests
    t_res = time.time()
    p = _spawn(base + ["--output", out_kill], kill_log)
    p.wait()
    t_res = time.time() - t_res
    assert _manifests(out_kill) == num_shards, "resume left shards undone"

    # 4. byte-identity
    n_ref, h_ref = _canonical_digest(out_ref)
    n_kill, h_kill = _canonical_digest(out_kill)
    result = {
        "metric": "kill/resume byte-identity under forced spilling",
        "docs": docs,
        "num_shards": num_shards,
        "object_store_gb": object_store_gb,
        "spill_threshold": spill_threshold,
        "cpus": cpus,
        "manifests_at_kill": killed_with,
        "rows_ref": n_ref,
        "rows_resumed": n_kill,
        "byte_identical": bool(n_ref == n_kill and h_ref == h_kill),
        "spilled_mb_ref": _spilled_mb(ref_log),
        "ref_wall_s": round(t_ref, 1),
        "resume_wall_s": round(t_res, 1),
        "total_wall_s": round(time.time() - t0, 1),
    }
    if not quiet:
        print(json.dumps(result))
    return result


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--child", action="store_true")
    p.add_argument("--input")
    p.add_argument("--output")
    p.add_argument("--docs", type=int, default=1_000_000)
    p.add_argument("--num-shards", type=int, default=64)
    p.add_argument("--object-store-gb", type=float, default=16.0)
    p.add_argument("--spill-threshold", type=float, default=0.3)
    p.add_argument("--cpus", type=int, default=32)
    args = p.parse_args()
    if args.child:
        return child_main(args)
    result = run_stress(
        args.docs, args.num_shards, args.object_store_gb, args.cpus,
        spill_threshold=args.spill_threshold,
    )
    return 0 if result["byte_identical"] else 1


if __name__ == "__main__":
    sys.exit(main())
