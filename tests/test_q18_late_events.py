"""q18 big-orders (HAVING-filtered winner join) and watermark
late-event accounting — tier equality and closed-form pins. Oracle
agreement is driver-gate verified.
"""

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.relational import (  # noqa: E402
    late_event_stats,
    q18_big_orders,
)

SF = "/root/testdata/sf0.001"


def test_q18_tiers_equal():
    a = q18_big_orders(SF).to_pandas()
    b = q18_big_orders(SF, combine_limit=0).to_pandas()  # groupby tier
    assert a.equals(b)
    assert len(a) > 0
    assert (a["sum_qty"] > 200).all()
    assert a["o_totalprice"].is_monotonic_decreasing


def test_late_events_closed_form(tmp_path):
    """3 events for one user: event 3 (planted late, %17==3) arrives
    after events 4 and 21; its ts is 2h behind the watermark -> late.
    A fresh user's first arrival is never late."""
    import numpy as np

    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(3600, "s")
    tbl = pa.table(
        {
            "event_id": pa.array([3, 4, 21, 5], pa.int64()),
            "ts": pa.array(
                [base + 0 * h, base + 1 * h, base + 2 * h, base + 5 * h]
            ),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    out = late_event_stats(str(d)).to_pandas().set_index("user_id")
    # user 1: arrival order 4, 21, 3(late by 2h > 1h allowance)
    assert out.loc[1, "n_events"] == 3 and out.loc[1, "n_late"] == 1
    assert out.loc[2, "n_events"] == 1 and out.loc[2, "n_late"] == 0


def test_gap_fill_closed_form(tmp_path):
    """User with events at hours 0 and 3 -> 4 rows, zeros at 1-2;
    single-event user -> one row."""
    import numpy as np

    from high_performance_docling_ray.pipelines.relational import (
        events_gap_fill,
    )

    base = np.datetime64("2024-01-01T00:10:00", "us")
    h = np.timedelta64(3600, "s")
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array([base, base + 3 * h, base + 3 * h, base]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet")
    out = events_gap_fill(str(d)).to_pandas()
    u1 = out[out["user_id"] == 1]
    assert list(u1["n_events"]) == [1, 0, 0, 2]
    assert len(out[out["user_id"] == 2]) == 1
