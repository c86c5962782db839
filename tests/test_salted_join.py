"""Hot-key-salted tier of joins.cogroup_attach + the event_type_warmup
query that forces it. Oracle agreement is driver-gate verified;
here: salted output == unsalted output on planted-skew data, null-key
and missing-payload semantics survive salting, and replication cannot
duplicate output rows.
"""

import sys

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")

import ray  # noqa: E402
import ray.data  # noqa: E402

from high_performance_docling_ray.pipelines.analytics import (  # noqa: E402
    event_type_warmup,
)
from high_performance_docling_ray.pipelines.joins import (  # noqa: E402
    cogroup_attach,
)

SF = "/root/testdata/sf0.001"


def _skewed_left(n=5000, hot_frac=0.5, seed=7):
    """Planted skew: one key holds half the probe mass."""
    rng = np.random.default_rng(seed)
    keys = rng.integers(1, 50, size=n).astype(np.int64)
    keys[: int(n * hot_frac)] = 42
    return pa.Table.from_pydict(
        {"k": pa.array(keys, pa.int64()),
         "row_id": pa.array(np.arange(n, dtype=np.int64))}
    )


def _dim():
    return pa.Table.from_pydict(
        {"k": pa.array(np.arange(1, 49, dtype=np.int64)),  # key 49 missing
         "payload": pa.array([f"p{i}" for i in range(1, 49)], pa.string())}
    )


LEFT_FIELDS = [pa.field("k", pa.int64()), pa.field("row_id", pa.int64())]
PAYLOAD_FIELDS = [pa.field("payload", pa.string())]


def _run(left_tbl, right_tbl, **kw) -> pd.DataFrame:
    out = cogroup_attach(
        ray.data.from_arrow(left_tbl),
        ray.data.from_arrow(right_tbl),
        "k",
        LEFT_FIELDS,
        PAYLOAD_FIELDS,
        num_parts=16,
        **kw,
    )
    df = pd.DataFrame(out.take_all())
    return df.sort_values("row_id").reset_index(drop=True)


def test_salted_equals_unsalted_on_planted_skew():
    left, right = _skewed_left(), _dim()
    base = _run(left, right)
    for n_salts in (2, 8, 16, 64):  # 64 clamps to num_parts
        salted = _run(left, right, hot_keys=[42], n_salts=n_salts)
        assert salted.equals(base), f"n_salts={n_salts}"
    # exactly one output row per input row — replication never leaks
    assert len(base) == left.num_rows
    assert base.loc[base.k == 42, "payload"].eq("p42").all()


def test_salting_missing_and_null_keys():
    left = pa.Table.from_pydict(
        {"k": pa.array([42, 49, None, 42, 1], pa.int64()),
         "row_id": pa.array(np.arange(5, dtype=np.int64))}
    )
    base = _run(left, _dim())
    salted = _run(left, _dim(), hot_keys=[42, 49], n_salts=4)
    assert salted.equals(base)
    # key 49 has no dim row; null key never matches — both stay null
    assert salted.loc[salted.row_id == 1, "payload"].isna().all()
    assert salted.loc[salted.row_id == 2, "payload"].isna().all()
    assert (salted.loc[salted.k == 42, "payload"] == "p42").all()


def test_salting_string_keys():
    left = pa.Table.from_pydict(
        {"k": pa.array(["hot"] * 40 + ["a", "b"], pa.string()),
         "row_id": pa.array(np.arange(42, dtype=np.int64))}
    )
    right = pa.Table.from_pydict(
        {"k": pa.array(["hot", "a"], pa.string()),
         "payload": pa.array(["H", "A"], pa.string())}
    )
    base = cogroup_attach(
        ray.data.from_arrow(left), ray.data.from_arrow(right), "k",
        [pa.field("k", pa.string()), pa.field("row_id", pa.int64())],
        PAYLOAD_FIELDS, num_parts=8,
    )
    salted = cogroup_attach(
        ray.data.from_arrow(left), ray.data.from_arrow(right), "k",
        [pa.field("k", pa.string()), pa.field("row_id", pa.int64())],
        PAYLOAD_FIELDS, num_parts=8, hot_keys=["hot"], n_salts=8,
    )
    a = pd.DataFrame(base.take_all()).sort_values("row_id").reset_index(drop=True)
    b = pd.DataFrame(salted.take_all()).sort_values("row_id").reset_index(drop=True)
    assert a.equals(b)
    assert (b.loc[b.k == "hot", "payload"] == "H").all()
    assert b.loc[b.k == "b", "payload"].isna().all()


def test_event_type_warmup_tiers_equal():
    a = event_type_warmup(SF).to_pandas()
    b = event_type_warmup(SF, salted=False).to_pandas()
    c = event_type_warmup(SF, n_salts=3).to_pandas()
    assert a.equals(b) and a.equals(c)
    # every type's first event is early by definition
    assert a.is_early.any()
    assert len(a) == len(a.event_id.unique())
