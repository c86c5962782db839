"""Hypothesis-test operators (hypotests.py): Mann-Whitney rank-sum,
Welch's t, chi²/Cramér's V/mutual information. Closed-form pins + tier
equality; oracle agreement is driver-gate verified
(tools/check_correctness.py, all six entries MATCH at sf0.001 and
sf0.01)."""

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.hypotests import (  # noqa: E402
    contingency_stats,
    mannwhitney_value,
    welch_ttest_value,
)

SF = "/root/testdata/sf0.001"


def _write_events(d, types, vals, hours=None):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    n = len(types)
    hours = hours or [0] * n
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [
                        base + np.timedelta64(int(h) * 3600_000_000, "us")
                        for h in hours
                    ]
                ),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
            }
        ),
        d / "events.parquet",
    )
    return str(d)


def test_mannwhitney_closed_form(tmp_path):
    """a=[1,2,3] vs b=[2,4]: combined average ranks 1, 2.5, 2.5, 4, 5
    -> R1=7.5, U1=1.5, one tie run of 2 -> z=-0.888523."""
    sf = _write_events(
        tmp_path / "mw",
        ["purchase", "purchase", "purchase", "click", "click"],
        [1.0, 2.0, 3.0, 2.0, 4.0],
    )
    out = mannwhitney_value(sf).to_pydict()
    assert out == {
        "n_a": [3],
        "n_b": [2],
        "u_stat": [1.5],
        "z_score": [-0.888523],
    }


def test_mannwhitney_zero_variance_and_empty_cohort(tmp_path):
    """All values tied -> sigma²=0 -> NULL z (U still defined); a
    missing cohort -> NULL u and z."""
    sf = _write_events(
        tmp_path / "mw0",
        ["purchase", "click", "purchase"],
        [5.0, 5.0, 5.0],
    )
    out = mannwhitney_value(sf).to_pydict()
    assert out["u_stat"] == [1.0]  # R1 = 2+2 (avg rank 2), U1 = 4-3
    assert out["z_score"] == [None]
    out2 = mannwhitney_value(sf, type_b="signup").to_pydict()
    assert out2["n_b"] == [0]
    assert out2["u_stat"] == [None] and out2["z_score"] == [None]


def test_mannwhitney_tier_equality():
    """Driver combine == forced bucket tier (bit-identical), including
    a tiny bucket width that forces many buckets and the offset path."""
    base = mannwhitney_value(SF)
    assert base.equals(mannwhitney_value(SF, combine_limit=0))
    assert base.equals(
        mannwhitney_value(SF, combine_limit=0, bucket_bits=2)
    )


def test_welch_closed_form(tmp_path):
    """a=[1,3] (var 2) vs b=[2,2,2] (var 0): t=0 exactly, df=1."""
    sf = _write_events(
        tmp_path / "wt",
        ["purchase", "purchase", "click", "click", "click"],
        [1.0, 3.0, 2.0, 2.0, 2.0],
    )
    out = welch_ttest_value(sf).to_pydict()
    assert out == {
        "n_a": [2],
        "n_b": [3],
        "mean_a": [2.0],
        "mean_b": [2.0],
        "t_stat": [0.0],
        "welch_df": [1.0],
    }


def test_welch_single_row_cohort_null(tmp_path):
    """n=1 cohort has no variance -> NULL t/df, mean still reported."""
    sf = _write_events(
        tmp_path / "wt1", ["purchase", "click", "click"], [7.0, 1.0, 3.0]
    )
    out = welch_ttest_value(sf).to_pydict()
    assert out["mean_a"] == [7.0]
    assert out["t_stat"] == [None] and out["welch_df"] == [None]


def test_welch_tier_equality():
    assert welch_ttest_value(SF).equals(
        welch_ttest_value(SF, combine_limit=0)
    )


def test_contingency_closed_form(tmp_path):
    """2x2 grid (x/y × hour 0/1) with counts 10/10/10/20: chi² =
    1.388889, V = sqrt(chi²/n) = 0.166667, MI = 0.013844 nats."""
    types = ["x"] * 20 + ["y"] * 30
    hours = [0] * 10 + [1] * 10 + [0] * 10 + [1] * 20
    sf = _write_events(
        tmp_path / "ct", types, [1.0] * 50, hours=hours
    )
    out = contingency_stats(sf).to_pydict()
    assert out == {
        "n": [50],
        "r_levels": [2],
        "c_levels": [2],
        "dof": [1],
        "chi2": [1.388889],
        "cramers_v": [0.166667],
        "mutual_info": [0.013844],
    }


def test_contingency_empty_cell_identity(tmp_path):
    """A grid with an EMPTY cell: chi² from observed cells via
    Σ((f−e)²/e − e) + n must equal the full-grid definition."""
    # x only in hour 0 (5 rows); y in hours 0 and 1 (5+10)
    types = ["x"] * 5 + ["y"] * 15
    hours = [0] * 5 + [0] * 5 + [1] * 10
    sf = _write_events(tmp_path / "ce", types, [1.0] * 20, hours=hours)
    out = contingency_stats(sf).to_pydict()
    f = np.array([[5.0, 0.0], [5.0, 10.0]])
    n = f.sum()
    e = np.outer(f.sum(1), f.sum(0)) / n
    chi2 = ((f - e) ** 2 / e).sum()
    assert out["chi2"] == [round(chi2, 6)]
    # MI over observed cells only (0·log0 = 0 for the empty cell)
    obs = f > 0
    mi = (
        f[obs] / n
        * np.log(f[obs] * n / (np.outer(f.sum(1), f.sum(0))[obs]))
    ).sum()
    assert out["mutual_info"] == [round(mi, 6)]


def test_contingency_tier_equality():
    assert contingency_stats(SF).equals(
        contingency_stats(SF, combine_limit=0)
    )


def test_ks_closed_form(tmp_path):
    """a=[1,2,3] vs b=[2,4]: inclusive CDF counts ca=[1,2,3,3],
    cb=[0,1,1,2] -> max|ca*2 - cb*3| = 3 at v=3 -> D = 3/6 = 0.5,
    ks = sqrt(6/5)*0.5 = 0.547723."""
    from high_performance_docling_ray.pipelines.hypotests import (
        ks_two_sample,
    )

    sf = _write_events(
        tmp_path / "ks",
        ["purchase", "purchase", "purchase", "click", "click"],
        [1.0, 2.0, 3.0, 2.0, 4.0],
    )
    out = ks_two_sample(sf).to_pydict()
    assert out == {
        "n_a": [3],
        "n_b": [2],
        "d_num": [3],
        "d_stat": [0.5],
        "ks_stat": [0.547723],
    }


def test_ks_identical_and_empty_cohort(tmp_path):
    """Identical samples -> D = 0 exactly; a missing cohort -> NULL
    stats with n_b = 0."""
    from high_performance_docling_ray.pipelines.hypotests import (
        ks_two_sample,
    )

    sf = _write_events(
        tmp_path / "ks0",
        ["purchase", "click", "purchase", "click"],
        [5.0, 5.0, 7.0, 7.0],
    )
    out = ks_two_sample(sf).to_pydict()
    assert out["d_num"] == [0] and out["d_stat"] == [0.0]
    out2 = ks_two_sample(sf, type_b="signup").to_pydict()
    assert out2["n_b"] == [0]
    assert out2["d_stat"] == [None] and out2["ks_stat"] == [None]


def test_ks_tier_equality():
    """Driver combine == forced bucket tier (the max is decided in
    integer arithmetic, so equality is exact), including a 2-bit
    bucket width that forces the multi-bucket offset path."""
    from high_performance_docling_ray.pipelines.hypotests import (
        ks_two_sample,
    )

    base = ks_two_sample(SF)
    assert base.equals(ks_two_sample(SF, combine_limit=0))
    assert base.equals(ks_two_sample(SF, combine_limit=0, bucket_bits=2))


def test_psi_closed_form(tmp_path):
    """Two sources with identical distributions -> identical PSI;
    smoothed-proportion arithmetic checked against a hand fold."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.hypotests import (
        psi_source_drift,
    )

    d = tmp_path / "sf"
    d.mkdir()
    # buckets: floor(log2(n+1)): 7->3, 100->6
    rows = [("a", 7), ("a", 100), ("b", 7), ("b", 100)]
    pq.write_table(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "n_chars": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    out = psi_source_drift(str(d)).to_pandas().set_index("source")
    # both sources match the corpus mix exactly; smoothing keeps the
    # terms finite but symmetric: ps == pr -> psi == 0
    assert abs(out.loc["a", "psi"]) < 1e-12
    assert abs(out.loc["b", "psi"]) < 1e-12
    assert (out.n_docs == 2).all()
    # skewed source: all docs in one bucket
    rows2 = rows + [("c", 7), ("c", 7)]
    pq.write_table(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows2], pa.string()),
                "n_chars": pa.array([r[1] for r in rows2], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    out2 = psi_source_drift(str(d)).to_pandas().set_index("source")
    # hand fold for source c: B=2, n_c=2, corpus: bucket3 ct=4, bucket6 ct=2, nt=6
    ps3, ps6 = (2 + 0.5) / (2 + 1.0), (0 + 0.5) / (2 + 1.0)
    pr3, pr6 = (4 + 0.5) / (6 + 1.0), (2 + 0.5) / (6 + 1.0)
    want = (ps3 - pr3) * math.log(ps3 / pr3) + (ps6 - pr6) * math.log(
        ps6 / pr6
    )
    assert abs(out2.loc["c", "psi"] - round(want, 6)) < 1e-9
    assert psi_source_drift(str(d), combine_limit=0).to_pandas().equals(
        out2.reset_index()[["source", "n_docs", "psi"]]
    )


def test_psi_tiers_sf0001():
    from high_performance_docling_ray.pipelines.hypotests import (
        psi_source_drift,
    )

    base = psi_source_drift("/root/testdata/sf0.001").to_pandas()
    assert len(base) > 0
    assert base.equals(
        psi_source_drift(
            "/root/testdata/sf0.001", combine_limit=0
        ).to_pandas()
    )
