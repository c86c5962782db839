"""Table profiling (pipelines/profiling.py) — exact-count semantics,
null handling, and oracle agreement (the driver gate also checks this
at sf0.01; the duckdb pin here keeps it covered under plain pytest).
"""

import sys

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.profiling import (  # noqa: E402
    column_profile,
)

SF = "/root/testdata/sf0.001"


def test_column_profile_matches_sql():
    rdf = column_profile(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    parts = [
        f"""
        SELECT '{c}' AS col_name, count(*) AS n_rows,
               count(*) - count({c}) AS n_null,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_str,
               CAST(max({c}) AS VARCHAR) AS max_str,
               round(avg(length(CAST({c} AS VARCHAR))), 6) AS avg_len
        FROM documents"""
        for c in ("doc_id", "lang", "n_chars", "source", "text")
    ]
    odf = con.execute(" UNION ALL ".join(parts) + " ORDER BY col_name").df()
    pd.testing.assert_frame_equal(
        rdf.reset_index(drop=True), odf.reset_index(drop=True),
        check_dtype=False,
    )


def test_column_profile_null_semantics(tmp_path):
    """Nulls: excluded from distinct, min/max, and avg_len; counted in
    n_null. An all-null column profiles to null min/max/avg_len."""
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a", None, "a", "bb"], pa.string()),
            "lang": pa.array([None, None, None, None], pa.string()),
            "source": pa.array(["s", "s", "s", "s"], pa.string()),
            "n_chars": pa.array([1, 0, 1, 2], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "documents.parquet")
    out = column_profile(str(d)).to_pandas().set_index("col_name")
    t = out.loc["text"]
    assert t["n_null"] == 1 and t["n_distinct"] == 2
    assert t["min_str"] == "a" and t["max_str"] == "bb"
    assert abs(t["avg_len"] - 4 / 3) < 1e-6
    la = out.loc["lang"]
    assert la["n_null"] == 4 and la["n_distinct"] == 0
    assert la["min_str"] is None or pd.isna(la["min_str"])
    assert pd.isna(la["avg_len"])
    assert out.loc["n_chars"]["min_str"] == "0"


def _write_events_xy(d, users, vals):
    import numpy as np
    import pyarrow.parquet as pq

    base = np.datetime64("2024-01-01T00:00:00", "us")
    n = len(users)
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array([base] * n),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(["click"] * n, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        d / "events.parquet",
    )
    return str(d)


def test_zorder_closed_form(tmp_path):
    """2x2 corner grid: ranges [0,1] quantize to {0, 128}; the Morton
    interleave puts bit 7 of x at 14 and of y at 15, so the four
    corners land in partitions 0 / 16 / 32 / 48 exactly."""
    from high_performance_docling_ray.pipelines.profiling import (
        zorder_layout,
    )

    sf = _write_events_xy(
        tmp_path / "zo", [0, 1, 0, 1], [0.00, 0.00, 0.01, 0.01]
    )
    out = zorder_layout(sf).to_pydict()
    assert out["zpart"] == [0, 16, 32, 48]
    assert out["n_rows"] == [1, 1, 1, 1]
    assert out["min_user"] == [0, 1, 0, 1]
    assert out["min_cents"] == [0, 0, 1, 1]


def test_zorder_tiers_and_mass(tmp_path):
    """Driver mixed-agg combine == forced Ray groupby aggregate
    (all-int64 output, exact); partition row counts account for every
    event; constant columns collapse to one partition."""
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.profiling import (
        zorder_layout,
    )

    base = zorder_layout(SF)
    assert base.equals(zorder_layout(SF, combine_limit=0))
    n_events = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert sum(base.column("n_rows").to_pylist()) == n_events
    sf = _write_events_xy(tmp_path / "zc", [7, 7, 7], [5.0, 5.0, 5.0])
    one = zorder_layout(sf).to_pydict()
    assert one["zpart"] == [0] and one["n_rows"] == [3]


def test_benford_closed_form(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.profiling import (
        benford_digits,
    )

    d = tmp_path / "sf"
    d.mkdir()
    # cents: 123, 19, 1, 950000, 0 (dropped), 0.07->7
    prices = [1.23, 0.19, 0.01, 9500.00, 0.0, 0.07]
    pq.write_table(
        pa.table({"o_totalprice": pa.array(prices, pa.float64())}),
        d / "orders.parquet",
    )
    out = benford_digits(str(d)).to_pandas().set_index("digit")
    assert sorted(out.index) == [1, 7, 9]
    assert out.loc[1, "n_orders"] == 3  # 123, 19->1, 1
    assert out.loc[9, "n_orders"] == 1
    assert abs(out.loc[1, "observed_p"] - 3 / 5) < 1e-12
    assert abs(out.loc[1, "benford_p"] - np.log10(2.0)) < 1e-12
    grouped = benford_digits(str(d), combine_limit=0).to_pandas()
    assert grouped.set_index("digit").equals(out)


def test_benford_tiers_sf0001():
    from high_performance_docling_ray.pipelines.profiling import (
        benford_digits,
    )

    sf = "/root/testdata/sf0.001"
    a = benford_digits(sf).to_pandas()
    assert len(a) > 0
    assert a.equals(benford_digits(sf, combine_limit=0).to_pandas())
