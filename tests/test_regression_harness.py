"""Tolerant golden-regression harness (state/regression.py) vs the
reference runner's semantics (table_regression_runner.py:153-258)."""

import copy
import random

from high_performance_docling_ray.kernels.table_rules import build_table
from high_performance_docling_ray.state.regression import (
    Tolerances,
    compare_tables,
    make_entry,
    match_tables,
    run_regression,
    write_baseline,
)


def _tables(seed=3, n=4):
    rng = random.Random(seed)
    out = []
    for k in range(n):
        ncols = rng.randint(2, 4)
        nrows = rng.randint(2, 4)
        otsl = []
        bboxes = []
        tokens = []
        tid = 0
        for r in range(nrows):
            for c in range(ncols):
                otsl.append("ched" if r == 0 else "fcel")
                bboxes.append([c * 50.0, r * 20.0, c * 50.0 + 44.0, r * 20.0 + 16.0])
                tokens.append(
                    {
                        "id": tid,
                        "text": f"w{k}_{r}_{c}",
                        "bbox": {
                            "l": c * 50.0 + 2, "t": r * 20.0 + 2,
                            "r": c * 50.0 + 30, "b": r * 20.0 + 12,
                        },
                    }
                )
                tid += 1
            otsl.append("nl")
        out.append((build_table(otsl, bboxes, tokens), k % 2))  # (table, page)
    return out


def test_identical_runs_are_clean(tmp_path):
    tables = _tables()
    entries = [make_entry(t, page, i) for i, (t, page) in enumerate(tables)]
    path = str(tmp_path / "golden.json")
    write_baseline(path, "doc", entries)
    report = run_regression(path, [make_entry(t, p, 100 + i) for i, (t, p) in enumerate(tables)])
    assert report["clean"] and report["matched"] == len(tables)


def test_detection_order_instability_is_matched(tmp_path):
    """Shuffled detection ids / ordering must not produce false
    ADDED/REMOVED — stable ids + greedy grid match recover the pairs."""
    tables = _tables()
    entries = [make_entry(t, page, i) for i, (t, page) in enumerate(tables)]
    shuffled = list(reversed([make_entry(t, p, 50 - i) for i, (t, p) in enumerate(tables)]))
    pairs, removed, added = match_tables(entries, shuffled)
    assert len(pairs) == len(tables) and not removed and not added


def test_small_bbox_jitter_tolerated_large_flagged():
    tables = _tables(n=1)
    t, page = tables[0]
    base = make_entry(t, page, 0)

    jit = copy.deepcopy(t)
    for c in jit["cells"]:
        if c["bbox"]:
            c["bbox"] = [v + 0.4 for v in c["bbox"]]  # < 1px: tolerated
    assert compare_tables(base["table"], make_entry(jit, page, 0)["table"]) == []

    off = copy.deepcopy(t)
    moved = False
    for c in off["cells"]:
        if c["bbox"]:
            c["bbox"] = [c["bbox"][0] + 9.0, c["bbox"][1],
                         c["bbox"][2] + 9.0, c["bbox"][3]]
            moved = True
    assert moved
    msgs = compare_tables(base["table"], make_entry(off, page, 0)["table"])
    assert any("bbox" in m for m in msgs)


def test_structure_change_reports_added_removed():
    tables = _tables(n=2)
    entries = [make_entry(t, p, i) for i, (t, p) in enumerate(tables)]
    # drop half the cells of table 0: grid similarity < 0.98 -> unmatched
    broken = copy.deepcopy(tables[0][0])
    broken["cells"] = broken["cells"][: len(broken["cells"]) // 2]
    current = [make_entry(broken, tables[0][1], 0),
               make_entry(tables[1][0], tables[1][1], 1)]
    pairs, removed, added = match_tables(entries, current)
    assert len(pairs) == 1 and len(removed) == 1 and len(added) == 1


def test_token_text_change_is_flagged_and_case_flag_works():
    tables = _tables(n=1)
    t, page = tables[0]
    base = make_entry(t, page, 0)["table"]
    up = copy.deepcopy(t)
    for c in up["cells"]:
        if c.get("text"):
            c["text"] = c["text"].upper()
    curr = make_entry(up, page, 0)["table"]
    assert any("token text" in m for m in compare_tables(base, curr))
    assert compare_tables(
        base, curr, Tolerances(text_case_insensitive=True)
    ) == []
