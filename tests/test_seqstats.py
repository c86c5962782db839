"""Round-4 session-4 operators (seqstats.py): global NTILE fold,
per-user mode / entropy / interval union / lag-1 autocorrelation.
Closed-form pins + tier equality; oracle agreement is driver-gate
verified (tools/check_correctness.py, all tiers MATCH at sf0.001 and
sf0.01)."""

import math
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.seqstats import (  # noqa: E402
    event_entropy,
    interval_merge,
    lag1_autocorr,
    mode_event_type,
    ntile_orders,
)

SF = "/root/testdata/sf0.001"


def _write_orders(d, okeys, prices):
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys, pa.int64()),
                "o_totalprice": pa.array(prices, pa.float64()),
            }
        ),
        d / "orders.parquet",
    )
    return str(d)


def _write_events(d, eids, ts_us, users, types=None, vals=None):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    cols = {
        "event_id": pa.array(eids, pa.int64()),
        "ts": pa.array([base + np.timedelta64(t, "us") for t in ts_us]),
        "user_id": pa.array(users, pa.int64()),
    }
    if types is not None:
        cols["event_type"] = pa.array(types, pa.string())
    if vals is not None:
        cols["value"] = pa.array(vals, pa.float64())
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table(cols), d / "events.parquet")
    return str(d)


def test_ntile_closed_form(tmp_path):
    """7 rows, 3 tiles -> sizes 3,2,2 by (price, orderkey); the price
    tie at 10.0 resolves by orderkey so key 5 lands in tile 1."""
    sf = _write_orders(
        tmp_path / "sf",
        okeys=[1, 2, 3, 4, 5, 6, 7],
        prices=[10.0, 30.0, 20.0, 50.0, 10.0, 40.0, 60.0],
    )
    out = ntile_orders(sf, tiles=3).to_pandas()
    # sorted: (10,1),(10,5),(20,3) | (30,2),(40,6) | (50,4),(60,7)
    assert out["tile"].tolist() == [1, 2, 3]
    assert out["n_orders"].tolist() == [3, 2, 2]
    assert out["sum_price"].tolist() == [40.0, 70.0, 110.0]
    assert out["min_price"].tolist() == [10.0, 30.0, 50.0]
    assert out["max_price"].tolist() == [20.0, 40.0, 60.0]


def test_ntile_tier_equality(tmp_path):
    """driver == distributed == distributed-with-forced-Ray-combine,
    including a price tie straddling a tile boundary."""
    rng = np.random.default_rng(7)
    prices = np.round(rng.uniform(1, 1000, 500), 2)
    prices[100:200] = 123.45  # heavy tie across boundaries
    sf = _write_orders(
        tmp_path / "sf", okeys=list(range(500)), prices=prices.tolist()
    )
    a = ntile_orders(sf, tiles=7).to_pandas()
    b = ntile_orders(sf, tiles=7, driver_budget=0).to_pandas()
    c = ntile_orders(
        sf, tiles=7, driver_budget=0, combine_limit=0
    ).to_pandas()
    assert a.equals(b) and a.equals(c)
    assert a["n_orders"].sum() == 500


def test_ntile_more_tiles_than_rows(tmp_path):
    """NTILE(k) with n < k: the first n tiles get one row each."""
    sf = _write_orders(tmp_path / "sf", okeys=[1, 2], prices=[5.0, 3.0])
    out = ntile_orders(sf, tiles=10).to_pandas()
    assert out["tile"].tolist() == [1, 2]
    assert out["min_price"].tolist() == [3.0, 5.0]
    grouped = ntile_orders(sf, tiles=10, driver_budget=0).to_pandas()
    assert out.equals(grouped)


def test_mode_tie_break_and_tiers(tmp_path):
    """User 1: click x2 beats view x1; user 2: 1-1 tie -> lexic.
    smallest ('click' < 'view')."""
    sf = _write_events(
        tmp_path / "sf",
        eids=[1, 2, 3, 4, 5],
        ts_us=[0, 1, 2, 3, 4],
        users=[1, 1, 1, 2, 2],
        types=["click", "view", "click", "view", "click"],
    )
    out = mode_event_type(sf).to_pandas()
    assert out["user_id"].tolist() == [1, 2]
    assert out["mode_event"].tolist() == ["click", "click"]
    assert out["n_mode"].tolist() == [2, 1]
    grouped = mode_event_type(sf, combine_limit=0).to_pandas()
    assert out.equals(grouped)


def test_entropy_closed_form(tmp_path):
    """Single-type user -> 0; uniform two-type user -> ln 2."""
    sf = _write_events(
        tmp_path / "sf",
        eids=[1, 2, 3, 4],
        ts_us=[0, 1, 2, 3],
        users=[1, 1, 2, 2],
        types=["view", "view", "click", "view"],
    )
    out = event_entropy(sf).to_pandas().set_index("user_id")
    assert out.loc[1, "entropy"] == 0.0 and out.loc[1, "n_events"] == 2
    assert abs(out.loc[2, "entropy"] - math.log(2)) < 1e-12
    grouped = event_entropy(sf, combine_limit=0).to_pandas()
    assert out.reset_index().equals(grouped)


def test_interval_merge_closed_form(tmp_path):
    """event_id %3600+1 gives the duration in seconds. User 1:
    [0,2s] + [1s,3s] overlap -> one island [0,3s]; [10s,11s] disjoint.
    Touching intervals ([0,2s] then [2s,3s]) merge (s > prev is
    strict)."""
    sf = _write_events(
        tmp_path / "sf",
        eids=[1, 1, 0, 1],  # durations 2s, 2s, 1s, 2s
        ts_us=[0, 1_000_000, 10_000_000, 0],
        users=[1, 1, 1, 2],
    )
    out = interval_merge(sf).to_pandas().set_index("user_id")
    assert out.loc[1, "n_intervals"] == 2
    assert out.loc[1, "covered_us"] == 3_000_000 + 1_000_000
    assert out.loc[2, "n_intervals"] == 1
    assert out.loc[2, "covered_us"] == 2_000_000
    grouped = interval_merge(sf, driver_budget=0).to_pandas()
    assert out.reset_index().equals(grouped)


def test_interval_merge_touching(tmp_path):
    """start == previous end merges (closed intervals)."""
    sf = _write_events(
        tmp_path / "sf",
        eids=[1, 1],  # 2s each
        ts_us=[0, 2_000_000],
        users=[9, 9],
    )
    out = interval_merge(sf).to_pandas()
    assert out["n_intervals"].tolist() == [1]
    assert out["covered_us"].tolist() == [4_000_000]


def test_autocorr_closed_form(tmp_path):
    """Linear sequence -> corr exactly 1; single event -> 0 pairs,
    NaN; one pair -> NaN (zero variance guard)."""
    sf = _write_events(
        tmp_path / "sf",
        eids=[1, 2, 3, 4, 5, 6, 7],
        ts_us=[0, 1, 2, 3, 0, 0, 1],
        users=[1, 1, 1, 1, 2, 3, 3],
        types=None,
        vals=[1.0, 2.0, 3.0, 4.0, 5.0, 1.0, 9.0],
    )
    out = lag1_autocorr(sf).to_pandas().set_index("user_id")
    assert out.loc[1, "n_pairs"] == 3
    assert abs(out.loc[1, "lag1_corr"] - 1.0) < 1e-12
    assert out.loc[2, "n_pairs"] == 0 and np.isnan(out.loc[2, "lag1_corr"])
    assert out.loc[3, "n_pairs"] == 1 and np.isnan(out.loc[3, "lag1_corr"])
    grouped = lag1_autocorr(sf, driver_budget=0).to_pandas()
    assert out.reset_index().equals(grouped)


def test_seqstats_sf0001_tier_equality():
    """All five ops pin driver == forced-distributed on the real
    sf0.001 tables (parallelism-independence)."""
    assert (
        ntile_orders(SF).to_pandas().equals(
            ntile_orders(SF, driver_budget=0, combine_limit=0).to_pandas()
        )
    )
    assert (
        mode_event_type(SF).to_pandas().equals(
            mode_event_type(SF, combine_limit=0).to_pandas()
        )
    )
    assert (
        event_entropy(SF).to_pandas().equals(
            event_entropy(SF, combine_limit=0).to_pandas()
        )
    )
    assert (
        interval_merge(SF).to_pandas().equals(
            interval_merge(SF, driver_budget=0).to_pandas()
        )
    )
    assert (
        lag1_autocorr(SF).to_pandas().equals(
            lag1_autocorr(SF, driver_budget=0).to_pandas()
        )
    )


def test_interval_merge_sink_roundtrip(tmp_path):
    """sink_dir streams per-user rows to sharded parquet; read-back
    equals the in-memory table."""
    tbl = interval_merge(SF).to_pandas()
    sink = tmp_path / "iv_out"
    path = interval_merge(SF, driver_budget=0, sink_dir=str(sink))
    assert path == str(sink)
    back = (
        pq.read_table(str(sink))
        .to_pandas()
        .sort_values("user_id", kind="mergesort")
        .reset_index(drop=True)
    )
    assert back.equals(tbl)


def _write_docs(d, ids, texts):
    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_rolling_distinct_closed_form(tmp_path):
    """W=2: user 1 active at hours 0,1 covers [0,2]; user 2 at hour 1
    covers [1,2]; hour 1 sees both. A far-away hour only its own."""
    H = 3_600_000_000
    sf = _write_events(
        tmp_path / "sf",
        eids=[1, 2, 3, 4],
        ts_us=[0, 1 * H, 1 * H + 5, 9 * H],
        users=[1, 1, 2, 2],
    )
    from high_performance_docling_ray.pipelines.seqstats import (
        rolling_distinct_users,
    )

    out = rolling_distinct_users(sf, window_hours=2).to_pandas()
    base_h = (
        np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64) // H
    )
    hours = out["hour"].astype("int64") // H - base_h
    got = dict(zip(hours.tolist(), out["n_users"].tolist()))
    assert got == {0: 1, 1: 2, 9: 1}
    grouped = rolling_distinct_users(
        sf, window_hours=2, driver_budget=0, combine_limit=0
    ).to_pandas()
    assert out.equals(grouped)


def test_rolling_distinct_tier_equality_sf0001():
    from high_performance_docling_ray.pipelines.seqstats import (
        rolling_distinct_users,
    )

    a = rolling_distinct_users(SF).to_pandas()
    b = rolling_distinct_users(
        SF, driver_budget=0, combine_limit=0
    ).to_pandas()
    assert len(a) > 0 and a.equals(b)


def test_containment_subset_pair(tmp_path):
    """Doc 1's shingle set is a strict subset of doc 2's ->
    containment exactly 1.0 while Jaccard is well below it."""
    sf = _write_docs(
        tmp_path / "sf",
        ids=[1, 2],
        texts=[
            "a b c d e f",
            "x y a b c d e f z w q r s t u v",
        ],
    )
    from high_performance_docling_ray.pipelines.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    out = ngram_containment_pairs(sf, threshold=0.9).to_pandas()
    assert out["doc_a"].tolist() == [1]
    assert out["doc_b"].tolist() == [2]
    assert out["containment"].tolist() == [1.0]
    jac = ngram_jaccard_pairs(sf, threshold=0.9).to_pandas()
    assert len(jac) == 0  # the pair Jaccard misses by construction


def test_containment_tier_equality_sf0001():
    from high_performance_docling_ray.pipelines.dedup import (
        ngram_containment_pairs,
    )

    a = (
        ngram_containment_pairs(SF, threshold=0.4)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    b = (
        ngram_containment_pairs(SF, threshold=0.4, driver_budget=0)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(a) > 0 and a.equals(b)


def test_mode_entropy_sink_roundtrip(tmp_path):
    """sink_dir streams per-user rows to sharded parquet (forcing the
    distributed tier); read-back equals the in-memory table."""
    from high_performance_docling_ray.pipelines.seqstats import (
        event_entropy,
        mode_event_type,
    )

    for fn, name in [(mode_event_type, "mode"), (event_entropy, "ent")]:
        tbl = fn(SF).to_pandas()
        sink = tmp_path / name
        path = fn(SF, sink_dir=str(sink))
        assert path == str(sink)
        back = (
            pq.read_table(str(sink))
            .to_pandas()
            .sort_values("user_id", kind="mergesort")
            .reset_index(drop=True)
        )
        assert back.equals(tbl)


def test_user_value_deciles_closed_form(tmp_path):
    """Totals: u1=3.00, u2=1.00, u3=2.00 -> 3 tiles of one user each
    ordered by total; a total tie resolves by user_id."""
    sf = _write_events(
        tmp_path / "sf",
        eids=[1, 2, 3, 4],
        ts_us=[0, 1, 2, 3],
        users=[1, 1, 2, 3],
        vals=[1.0, 2.0, 1.0, 2.0],
    )
    from high_performance_docling_ray.pipelines.seqstats import (
        user_value_deciles,
    )

    out = user_value_deciles(sf, tiles=3).to_pandas()
    assert out["tile"].tolist() == [1, 2, 3]
    assert out["n_users"].tolist() == [1, 1, 1]
    assert out["min_total"].tolist() == [1.0, 2.0, 3.0]
    assert out["sum_total"].tolist() == [1.0, 2.0, 3.0]
    grouped = user_value_deciles(sf, tiles=3, combine_limit=0).to_pandas()
    assert out.equals(grouped)


def test_user_value_deciles_tiers_sf0001():
    from high_performance_docling_ray.pipelines.seqstats import (
        user_value_deciles,
    )

    a = user_value_deciles(SF).to_pandas()
    b = user_value_deciles(SF, combine_limit=0).to_pandas()
    assert len(a) > 0 and a.equals(b)
    assert (a["min_total"] <= a["max_total"]).all()
    # deciles are ordered by construction
    assert (a["min_total"].to_numpy()[1:] >= a["max_total"].to_numpy()[:-1]).all()


def test_spearman_closed_forms(tmp_path):
    """Monotone-agreeing metrics -> rho exactly 1; then a perfect
    reversal -> rho exactly -1 (no ties in either metric)."""
    from high_performance_docling_ray.pipelines.seqstats import (
        spearman_user_metrics,
    )

    # user 1: 3 events of total 6.0; user 2: 2 events total 3.0;
    # user 3: 1 event total 1.0 -> x and y agree in order: rho = 1
    sf = _write_events(
        tmp_path / "up",
        eids=[1, 2, 3, 4, 5, 6],
        ts_us=[0, 1, 2, 3, 4, 5],
        users=[1, 1, 1, 2, 2, 3],
        vals=[2.0, 2.0, 2.0, 1.5, 1.5, 1.0],
    )
    out = spearman_user_metrics(sf).to_pandas()
    assert out["n_users"].tolist() == [3]
    assert abs(out["spearman_rho"][0] - 1.0) < 1e-12
    # reversal: more events -> smaller total: rho = -1
    sf2 = _write_events(
        tmp_path / "down",
        eids=[1, 2, 3, 4, 5, 6],
        ts_us=[0, 1, 2, 3, 4, 5],
        users=[1, 1, 1, 2, 2, 3],
        vals=[0.1, 0.1, 0.1, 1.0, 1.0, 9.0],
    )
    out2 = spearman_user_metrics(sf2).to_pandas()
    assert abs(out2["spearman_rho"][0] + 1.0) < 1e-12


def test_spearman_all_tied_is_null(tmp_path):
    """Identical (x, y) for every user -> zero rank variance -> NaN
    (the oracle's CASE -> NULL)."""
    from high_performance_docling_ray.pipelines.seqstats import (
        spearman_user_metrics,
    )

    sf = _write_events(
        tmp_path / "sf",
        eids=[1, 2],
        ts_us=[0, 1],
        users=[1, 2],
        vals=[5.0, 5.0],
    )
    out = spearman_user_metrics(sf).to_pandas()
    assert out["n_users"].tolist() == [2]
    assert np.isnan(out["spearman_rho"][0])


def test_spearman_tiers_close_sf0001():
    """Tier results agree to float tolerance (per-bucket ra summation
    order may differ across tiers; the oracle gate rounds to 6dp)."""
    from high_performance_docling_ray.pipelines.seqstats import (
        spearman_user_metrics,
    )

    a = spearman_user_metrics(SF).to_pandas()
    b = spearman_user_metrics(SF, combine_limit=0).to_pandas()
    assert a["n_users"].tolist() == b["n_users"].tolist()
    assert abs(a["spearman_rho"][0] - b["spearman_rho"][0]) < 1e-9


def test_inversion_counter_fuzz():
    """The merge-pass inversion counter is exact vs brute force over
    randomized (x, y) with heavy ties."""
    from high_performance_docling_ray.pipelines.seqstats import (
        _strict_inversions,
    )

    rng = np.random.default_rng(42)
    for _ in range(120):
        n = int(rng.integers(0, 50))
        x = rng.integers(0, 6, n).astype(np.int64)
        y = rng.integers(0, 6, n).astype(np.int64)
        brute = sum(
            1
            for i in range(n)
            for j in range(n)
            if x[i] < x[j] and y[i] > y[j]
        )
        assert _strict_inversions(x, y) == brute


def test_kendall_closed_forms(tmp_path):
    """Perfect agreement -> tau exactly 1; perfect reversal -> -1;
    all-tied x -> NaN (zero denominator guard)."""
    from high_performance_docling_ray.pipelines.seqstats import (
        kendall_user_metrics,
    )

    sf = _write_events(
        tmp_path / "up",
        eids=[1, 2, 3, 4, 5, 6],
        ts_us=[0, 1, 2, 3, 4, 5],
        users=[1, 1, 1, 2, 2, 3],
        vals=[2.0, 2.0, 2.0, 1.5, 1.5, 1.0],
    )
    out = kendall_user_metrics(sf).to_pandas()
    assert out["n_users"].tolist() == [3]
    assert abs(out["kendall_tau"][0] - 1.0) < 1e-12
    sf2 = _write_events(
        tmp_path / "down",
        eids=[1, 2, 3, 4, 5, 6],
        ts_us=[0, 1, 2, 3, 4, 5],
        users=[1, 1, 1, 2, 2, 3],
        vals=[0.1, 0.1, 0.1, 1.0, 1.0, 9.0],
    )
    out2 = kendall_user_metrics(sf2).to_pandas()
    assert abs(out2["kendall_tau"][0] + 1.0) < 1e-12
    sf3 = _write_events(
        tmp_path / "tied",
        eids=[1, 2],
        ts_us=[0, 1],
        users=[1, 2],
        vals=[3.0, 7.0],
    )  # both users have x = 1 event -> n0 - n1 = 0
    out3 = kendall_user_metrics(sf3).to_pandas()
    assert np.isnan(out3["kendall_tau"][0])


def test_kendall_tiers_equal_sf0001():
    """Grid decomposition == driver counter exactly (Q and the tie
    counts are integers; the only float is the final ratio)."""
    from high_performance_docling_ray.pipelines.seqstats import (
        kendall_user_metrics,
    )

    a = kendall_user_metrics(SF).to_pandas()
    b = kendall_user_metrics(SF, combine_limit=0).to_pandas()
    assert a.equals(b)
    # coarse grids exercise bigger same-bucket partitions; still exact
    c = kendall_user_metrics(SF, combine_limit=0, grid_bits=2).to_pandas()
    assert a.equals(c)


def test_user_drawdown_closed_form(tmp_path):
    """User 1 values [5, -3, 4, -10]: running balance
    [500, 200, 600, -400] cents, peaks [500, 500, 600, 600] ->
    final -400, peak 600, max drawdown 1000 (peak 600 to -400)."""
    from high_performance_docling_ray.pipelines.seqstats import (
        user_drawdown,
    )

    sf = _write_events(
        tmp_path / "dd",
        eids=[1, 2, 3, 4],
        ts_us=[10, 20, 30, 40],
        users=[1, 1, 1, 1],
        vals=[5.0, -3.0, 4.0, -10.0],
    )
    out = user_drawdown(sf).to_pydict()
    assert out == {
        "user_id": [1],
        "n_events": [4],
        "final_cents": [-400],
        "peak_cents": [600],
        "max_drawdown_cents": [1000],
    }


def test_user_drawdown_ts_tie_resolves_by_event_id(tmp_path):
    """Two events share a timestamp: event_id order decides the scan
    order, so the drawdown sees +, - (not -, +)."""
    from high_performance_docling_ray.pipelines.seqstats import (
        user_drawdown,
    )

    sf = _write_events(
        tmp_path / "ddt",
        eids=[2, 1],
        ts_us=[10, 10],
        users=[7, 7],
        vals=[-4.0, 9.0],  # scan order by eid: +9 then -4
    )
    out = user_drawdown(sf).to_pydict()
    assert out["peak_cents"] == [900]
    assert out["max_drawdown_cents"] == [400]
    assert out["final_cents"] == [500]


def test_user_drawdown_tier_equality_and_sink(tmp_path):
    """Driver tier == forced hash(user) co-partition tier (all-int64
    outputs, so equality is exact); sink read-back pins the parquet
    variant."""
    from high_performance_docling_ray.pipelines.seqstats import (
        user_drawdown,
    )

    tbl = user_drawdown(SF).to_pandas()
    assert user_drawdown(SF, driver_budget=0).to_pandas().equals(tbl)
    sink = tmp_path / "dd_sink"
    path = user_drawdown(SF, driver_budget=0, sink_dir=str(sink))
    assert path == str(sink)
    back = (
        pq.read_table(str(sink))
        .to_pandas()
        .sort_values("user_id", kind="mergesort")
        .reset_index(drop=True)
    )
    assert back.equals(tbl)


def test_activity_streaks_closed_form(tmp_path):
    """User 1 active on days {0,1,2, 5,6, 9}: 6 active days, longest
    streak 3; duplicate events within a day count once."""
    from high_performance_docling_ray.pipelines.seqstats import (
        activity_streaks,
    )

    day = 86_400_000_000
    sf = _write_events(
        tmp_path / "st",
        eids=list(range(8)),
        ts_us=[0, day // 2, day, 2 * day, 5 * day, 6 * day, 9 * day,
               9 * day + 7],
        users=[1] * 8,
    )
    out = activity_streaks(sf).to_pydict()
    assert out == {
        "user_id": [1],
        "n_active_days": [6],
        "longest_streak": [3],
    }


def test_activity_streaks_tier_equality():
    """Driver tier == forced hash(user) co-partition (all-int64)."""
    from high_performance_docling_ray.pipelines.seqstats import (
        activity_streaks,
    )

    base = activity_streaks(SF)
    assert base.equals(activity_streaks(SF, driver_budget=0))
    assert base.num_rows > 0


def test_user_value_trend_closed_form(tmp_path):
    from high_performance_docling_ray.pipelines.seqstats import (
        user_value_trend,
    )

    # user 1: perfectly linear y = 2x + 1 -> slope 2, intercept 3
    #   (intercept here is vs rank 1..n: y = 2*rn + 3 for rn=1.. wait:
    #    ranks 1,2,3 with y = 5,7,9 -> slope 2, intercept 3, r2 = 1)
    # user 2: single event -> NULLs
    # user 3: constant y -> slope 0, r2 NULL (zero y-variance)
    sf = _write_events(
        tmp_path / "t",
        eids=[1, 2, 3, 4, 5, 6, 7],
        ts_us=[0, 10, 20, 0, 0, 10, 20],
        users=[1, 1, 1, 2, 3, 3, 3],
        vals=[5.0, 7.0, 9.0, 4.0, 2.5, 2.5, 2.5],
    )
    out = user_value_trend(sf).to_pandas().set_index("user_id")
    assert abs(out.loc[1, "slope"] - 2.0) < 1e-12
    assert abs(out.loc[1, "intercept"] - 3.0) < 1e-12
    assert abs(out.loc[1, "r2"] - 1.0) < 1e-12
    assert out.loc[2, "n_events"] == 1 and np.isnan(out.loc[2, "slope"])
    assert abs(out.loc[3, "slope"]) < 1e-12
    assert np.isnan(out.loc[3, "r2"])
    grouped = user_value_trend(sf, driver_budget=0).to_pandas()
    assert grouped.set_index("user_id").equals(out)


def test_user_value_trend_tiers_sf0001():
    from high_performance_docling_ray.pipelines.seqstats import (
        user_value_trend,
    )

    assert (
        user_value_trend(SF).to_pandas().equals(
            user_value_trend(SF, driver_budget=0).to_pandas()
        )
    )


def test_theil_sen_closed_form(tmp_path):
    from high_performance_docling_ray.pipelines.seqstats import (
        theil_sen_trend,
    )

    hour = 3_600_000_000
    # user 1: values 0,2,6 at hours 0,1,2 -> pair slopes {2,3,4}/hr,
    #   median 3 (odd count)
    # user 2: two events at the SAME ts -> zero qualifying pairs ->
    #   absent from the output (mirrors the SQL e2.ts > e1.ts join)
    # user 3: 0,1,2,100 at hours 0..3 -> slopes
    #   {1,1,1,100/3,49.5,98}; even count 6 -> (1 + 100/3)/2
    sf = _write_events(
        tmp_path / "t",
        eids=[1, 2, 3, 4, 5, 6, 7, 8, 9],
        ts_us=[0, hour, 2 * hour, 5, 5, 0, hour, 2 * hour, 3 * hour],
        users=[1, 1, 1, 2, 2, 3, 3, 3, 3],
        vals=[0.0, 2.0, 6.0, 1.0, 9.0, 0.0, 1.0, 2.0, 100.0],
    )
    out = theil_sen_trend(sf).to_pandas().set_index("user_id")
    assert sorted(out.index) == [1, 3]
    assert out.loc[1, "n_pairs"] == 3
    assert abs(out.loc[1, "slope_per_hour"] - 3.0) < 1e-12
    assert out.loc[3, "n_pairs"] == 6
    assert abs(out.loc[3, "slope_per_hour"] - (1.0 + 100.0 / 3.0) / 2) < 1e-12
    grouped = theil_sen_trend(sf, driver_budget=0).to_pandas()
    assert grouped.set_index("user_id").equals(out)


def test_theil_sen_hot_pair_cap(tmp_path):
    import pytest

    from high_performance_docling_ray.pipelines.seqstats import (
        theil_sen_trend,
    )

    sf = _write_events(
        tmp_path / "t",
        eids=list(range(10)),
        ts_us=[i * 1000 for i in range(10)],
        users=[7] * 10,
        vals=[float(i) for i in range(10)],
    )
    with pytest.raises(ValueError, match="hot_pair_cap"):
        theil_sen_trend(sf, hot_pair_cap=2)


def test_theil_sen_tiers_sf0001():
    from high_performance_docling_ray.pipelines.seqstats import (
        theil_sen_trend,
    )

    base = theil_sen_trend(SF).to_pandas()
    assert len(base) > 0
    assert base.equals(theil_sen_trend(SF, driver_budget=0).to_pandas())


def test_burstiness_closed_form(tmp_path):
    from high_performance_docling_ray.pipelines.seqstats import (
        user_burstiness,
    )

    hour = 3_600_000_000
    # user 1: perfectly periodic (gaps 1,1,1 h) -> std 0, B = -1
    # user 2: single event -> dropped
    # user 3: gaps 1h and 3h -> mean 2, std 1, B = -1/3
    # user 5: two events at the SAME ts -> one zero gap ->
    #   mean=std=0 -> burstiness NULL (the x/0 mirror)
    sf = _write_events(
        tmp_path / "t",
        eids=[1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
        ts_us=[0, hour, 2 * hour, 3 * hour, 0,
               0, hour, 4 * hour, 5, 5],
        users=[1, 1, 1, 1, 2, 3, 3, 3, 5, 5],
        vals=None,
    )
    out = user_burstiness(sf).to_pandas().set_index("user_id")
    assert sorted(out.index) == [1, 3, 5]
    assert out.loc[1, "n_gaps"] == 3
    assert abs(out.loc[1, "std_gap_hours"]) < 1e-12
    assert abs(out.loc[1, "burstiness"] + 1.0) < 1e-12
    assert abs(out.loc[3, "mean_gap_hours"] - 2.0) < 1e-12
    assert abs(out.loc[3, "std_gap_hours"] - 1.0) < 1e-12
    assert abs(out.loc[3, "burstiness"] + 1.0 / 3.0) < 1e-12
    assert np.isnan(out.loc[5, "burstiness"])
    grouped = user_burstiness(sf, driver_budget=0).to_pandas()
    assert grouped.set_index("user_id").sort_index().equals(
        out.sort_index()
    )


def test_burstiness_tiers_sf0001():
    from high_performance_docling_ray.pipelines.seqstats import (
        user_burstiness,
    )

    base = user_burstiness(SF).to_pandas()
    assert len(base) > 0
    assert base.equals(user_burstiness(SF, driver_budget=0).to_pandas())


def test_event_throttle_closed_form(tmp_path):
    from high_performance_docling_ray.pipelines.seqstats import (
        event_throttle,
    )

    minute = 60_000_000
    # user 1 clicks at t=0, 10min, 40min -> keep first and third
    # (gap 30min from PREVIOUS event, not previous kept); a view at
    # 10min is its own stream and keeps
    sf = _write_events(
        tmp_path / "t",
        eids=[1, 2, 3, 4],
        ts_us=[0, 10 * minute, 40 * minute, 10 * minute],
        users=[1, 1, 1, 1],
        types=["click", "click", "click", "view"],
    )
    out = event_throttle(sf)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert sorted(out.event_id) == [1, 3, 4]
    grouped = event_throttle(sf, driver_budget=0).to_pandas()
    assert grouped.sort_values("event_id").reset_index(drop=True).equals(
        out.sort_values("event_id").reset_index(drop=True)
    )
