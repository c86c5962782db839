"""Small-file compaction (pipelines/compaction.py) — row preservation,
plan balance, retry-safe output naming, cache idempotence. The driver
gate additionally hash-verifies the write->compact->read-back roundtrip
against the extraction oracle.
"""

import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.compaction import (  # noqa: E402
    compact_store_dir,
    compacted_extract,
    plan_compaction,
)

SF = "/root/testdata/sf0.001"


def _write_store(tmp_path, n_files=10, rows_per=7):
    d = tmp_path / "store"
    d.mkdir()
    for i in range(n_files):
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(
                        range(i * rows_per, (i + 1) * rows_per), pa.int64()
                    ),
                    "v": pa.array(
                        [f"row{i}-{j}" for j in range(rows_per)], pa.string()
                    ),
                }
            ),
            d / f"part-{i:03d}.parquet",
        )
    return str(d)


def test_plan_is_contiguous_and_bounded(tmp_path):
    store = _write_store(tmp_path, n_files=10)
    groups = plan_compaction(store, target_files=4)
    assert 1 <= len(groups) <= 4
    flat = [p for g in groups for p in g]
    assert flat == sorted(glob.glob(store + "/*.parquet"))


def test_compaction_preserves_rows_exactly(tmp_path):
    store = _write_store(tmp_path, n_files=10, rows_per=7)
    out = str(tmp_path / "out")
    manifest = compact_store_dir(store, out, target_files=3)
    assert manifest["files_in"] == 10 and manifest["rows"] == 70
    assert manifest["files_out"] <= 3
    parts = sorted(glob.glob(out + "/*.parquet"))
    merged = pa.concat_tables([pq.read_table(p) for p in parts])
    before = pa.concat_tables(
        [pq.read_table(p) for p in sorted(glob.glob(store + "/*.parquet"))]
    )
    assert merged.sort_by("k").equals(before.sort_by("k"))
    assert os.path.exists(os.path.join(out, "_SUCCESS"))


def test_compacted_extract_cached_and_fewer_files():
    ds = compacted_extract(SF)
    n = ds.count()
    assert n == 500
    base = os.path.dirname(
        os.path.dirname(
            glob.glob("/tmp/graft_compact/*/compacted/_SUCCESS")[0]
        )
    )
    raw = glob.glob(base + "/raw/**/*.parquet", recursive=True)
    compacted = glob.glob(base + "/compacted/*.parquet")
    assert len(compacted) < len(raw)
    # second call is a cache hit returning the same rows
    assert compacted_extract(SF).count() == n


def test_gc_store_verifies_then_reclaims(tmp_path):
    import json

    import pytest

    from high_performance_docling_ray.pipelines.compaction import gc_store

    store = _write_store(tmp_path, n_files=6, rows_per=5)
    out = str(tmp_path / "out")
    # refuse before compaction exists
    with pytest.raises(RuntimeError, match="no verified compaction"):
        gc_store(store, out)
    compact_store_dir(store, out, target_files=2)
    # refuse on row mismatch (tamper with the manifest)
    mpath = os.path.join(out, "_compact_manifest.json")
    m = json.load(open(mpath))
    json.dump({**m, "rows": m["rows"] + 1}, open(mpath, "w"))
    with pytest.raises(RuntimeError, match="gc refused"):
        gc_store(store, out)
    json.dump(m, open(mpath, "w"))
    acct = gc_store(store, out)
    assert acct["files_removed"] == 6 and acct["rows_verified"] == 30
    assert glob.glob(store + "/*.parquet") == []
    # compacted store fully intact
    parts = sorted(glob.glob(out + "/*.parquet"))
    assert sum(pq.read_metadata(p).num_rows for p in parts) == 30
