"""TPC-H widening family (pipelines/analytics.py): over-budget
shuffle-tier equality pins + closed-form funnel/retention fixtures.
Oracle agreement for every query is driver-gate verified
(tools/check_correctness.py).
"""

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.analytics import (  # noqa: E402
    funnel_analysis,
    q4_order_priority,
    q6_forecast_revenue,
    q7_nation_volume,
    q10_returned_items,
    q12_priority_lines,
    q14_promo_revenue,
    retention_cohorts,
    revenue_rollup,
)

SF = "/root/testdata/sf0.001"


def _eq(a: pa.Table, b: pa.Table):
    pa_a = a.to_pandas().reset_index(drop=True)
    pa_b = b.to_pandas().reset_index(drop=True)
    assert pa_a.equals(pa_b), f"{pa_a}\n!=\n{pa_b}"


def test_q4_tiers_equal():
    a = q4_order_priority(SF)
    b = q4_order_priority(SF, combine_limit=0)  # forced groupby tier
    _eq(a, b)
    assert a.num_rows > 0
    assert (a.column("order_count").to_numpy() > 0).all()


def test_q7_tiers_equal():
    a = q7_nation_volume(SF)
    b = q7_nation_volume(SF, combine_limit=0)
    _eq(a, b)
    # both directions present and disjoint
    sn = set(a.column("supp_nation").to_pylist())
    assert sn <= {"NATION_1", "NATION_2"}
    for s, c in zip(a.column("supp_nation").to_pylist(),
                    a.column("cust_nation").to_pylist()):
        assert s != c


def test_q10_tiers_equal():
    a = q10_returned_items(SF)
    b = q10_returned_items(SF, combine_limit=0)
    _eq(a, b)
    rev = a.column("revenue").to_numpy()
    assert (np.diff(rev) <= 1e-9).all()  # descending top-k


def test_q12_tiers_equal():
    a = q12_priority_lines(SF)
    b = q12_priority_lines(SF, combine_limit=0)
    _eq(a, b)
    # every 1996-shipped line lands in exactly one bucket
    tot = (a.column("high_line_count").to_numpy()
           + a.column("low_line_count").to_numpy()).sum()
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_shipdate"])
    ship = li.column("l_shipdate").to_numpy(zero_copy_only=False)
    lo, hi = np.datetime64("1996-01-01", "us"), np.datetime64("1997-01-01", "us")
    assert tot == int(((ship >= lo) & (ship < hi)).sum())


def test_rollup_tiers_and_identity():
    a = revenue_rollup(SF)
    b = revenue_rollup(SF, combine_limit=0)
    _eq(a, b)
    df = a.to_pandas()
    grand = df[df.r_name.isna()]["revenue"]
    assert len(grand) == 1
    finest = df[df.n_name.notna()]["revenue"].sum()
    regions = df[df.r_name.notna() & df.n_name.isna()]["revenue"].sum()
    assert abs(float(grand.iloc[0]) - finest) < 1e-6
    assert abs(regions - finest) < 1e-6


def test_q6_q14_scalars():
    q6 = q6_forecast_revenue(SF)
    assert q6.num_rows == 1 and q6.column("revenue")[0].as_py() > 0
    q14 = q14_promo_revenue(SF)
    v = q14.column("promo_revenue")[0].as_py()
    assert 0.0 < v < 100.0


def _write_events(tmp_path, rows):
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def test_funnel_closed_form(tmp_path):
    """u1 completes all 3 steps in order; u2 clicks BEFORE viewing (the
    click cannot count) and never purchases; u3 views only; u4 has a
    purchase with no prior click (depth 1: view only)."""
    rows = [
        (1, "2024-01-01T00:00", "view"),
        (1, "2024-01-01T01:00", "click"),
        (1, "2024-01-01T02:00", "purchase"),
        (2, "2024-01-01T00:30", "click"),
        (2, "2024-01-01T01:30", "view"),
        (3, "2024-01-02T00:00", "view"),
        (4, "2024-01-03T00:00", "view"),
        (4, "2024-01-03T01:00", "purchase"),
    ]
    sf = _write_events(tmp_path, rows)
    out = funnel_analysis(sf).to_pandas().set_index("step")["users"]
    assert out["1_view"] == 4
    assert out["2_click"] == 1  # only u1 clicked after first view
    assert out["3_purchase"] == 1
    # forced groupby tier identical
    out2 = funnel_analysis(sf, combine_limit=0).to_pandas()
    assert out2.set_index("step")["users"].equals(out)


def test_funnel_strict_ordering(tmp_path):
    """A click at EXACTLY the first-view timestamp does not qualify
    (strict >), matching the oracle's e.ts > v.t1."""
    rows = [
        (1, "2024-01-01T00:00", "view"),
        (1, "2024-01-01T00:00", "click"),
    ]
    sf = _write_events(tmp_path, rows)
    out = funnel_analysis(sf).to_pandas().set_index("step")["users"]
    assert out["1_view"] == 1 and out["2_click"] == 0


def test_retention_closed_form(tmp_path):
    """u1 active day0+day2 (cohort d0), u2 active day1 twice (cohort d1,
    one distinct row), u3 day0+day1 (cohort d0)."""
    rows = [
        (1, "2024-01-01T05:00", "view"),
        (1, "2024-01-03T05:00", "view"),
        (2, "2024-01-02T01:00", "view"),
        (2, "2024-01-02T09:00", "click"),
        (3, "2024-01-01T10:00", "view"),
        (3, "2024-01-02T10:00", "view"),
    ]
    sf = _write_events(tmp_path, rows)
    out = retention_cohorts(sf).to_pandas()
    d0 = np.datetime64("2024-01-01", "us")
    d1 = np.datetime64("2024-01-02", "us")
    got = {
        (row.cohort_day.to_datetime64(), int(row.day_offset)): int(row.users)
        for row in out.itertuples()
    }
    assert got == {
        (d0, 0): 2,  # u1, u3 on their first day
        (d0, 1): 1,  # u3 next day
        (d0, 2): 1,  # u1 two days later
        (d1, 0): 1,  # u2 (distinct once despite 2 events)
    }
    out2 = retention_cohorts(sf, combine_limit=0).to_pandas()
    assert out2.equals(out)


def test_retention_tiers_equal_sf():
    a = retention_cohorts(SF).to_pandas().reset_index(drop=True)
    b = retention_cohorts(SF, combine_limit=0).to_pandas().reset_index(drop=True)
    assert a.equals(b)
    assert (a["users"] > 0).all()


def test_events_dod_growth_tiers_and_lag_semantics():
    from high_performance_docling_ray.pipelines.analytics import events_dod_growth

    a = events_dod_growth(SF)
    b = events_dod_growth(SF, combine_limit=0)
    _eq(a, b)
    df = a.to_pandas()
    # per type: first day has null prev; every later row's prev equals
    # the previous EXISTING day's count (calendar gaps skipped)
    for t, g in df.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        assert np.isnan(g.growth.iloc[0]) and g.prev_events.isna().iloc[0]
        assert (g.prev_events.iloc[1:].to_numpy()
                == g.n_events.iloc[:-1].to_numpy()).all()


def test_events_cube_identities():
    from high_performance_docling_ray.pipelines.analytics import events_cube

    a = events_cube(SF)
    b = events_cube(SF, combine_limit=0)
    _eq(a, b)
    df = a.to_pandas()
    total = df[df.event_type.isna() & df.dow.isna()].n_events.iloc[0]
    fine = df[df.event_type.notna() & df.dow.notna()]
    # each marginal set and the finest grain all sum to the total
    assert fine.n_events.sum() == total
    assert df[df.event_type.notna() & df.dow.isna()].n_events.sum() == total
    assert df[df.event_type.isna() & df.dow.notna()].n_events.sum() == total


def test_exact_quantiles_cont_interpolation():
    from high_performance_docling_ray.pipelines.relational import (
        exact_quantiles,
        exact_quantiles_cont,
    )

    disc = exact_quantiles(SF).to_pandas().set_index("q")["value"]
    cont = exact_quantiles_cont(SF).to_pandas().set_index("q")["value"]
    # cont lies within one value-step of disc and is monotone in q
    assert (cont.sort_index().diff().dropna() >= 0).all()
    for q in (0.25, 0.5, 0.75, 0.95):
        assert abs(cont[q] - disc[q]) <= 1.0 + 1e-9


def test_hll_user_overlap_algebra():
    from high_performance_docling_ray.pipelines.text_analysis import (
        distinct_users_hll,
        hll_user_overlap,
    )

    per = distinct_users_hll(SF).to_pandas().set_index("event_type")[
        "approx_distinct_users"
    ]
    ov = hll_user_overlap(SF).to_pandas()
    assert len(ov) == len(per) * (len(per) - 1) // 2
    for _, r in ov.iterrows():
        # the pairwise columns must agree with the single-type query
        assert r.approx_a == per[r.type_a]
        assert r.approx_b == per[r.type_b]
        # union bounds: >= each side, <= sum
        assert r.approx_union >= max(r.approx_a, r.approx_b) - 1
        assert r.approx_union <= r.approx_a + r.approx_b
        assert r.approx_overlap == r.approx_a + r.approx_b - r.approx_union


def test_events_value_ranks_tiers_and_bounds():
    from high_performance_docling_ray.pipelines.analytics import events_value_ranks

    a = events_value_ranks(SF)
    b = events_value_ranks(SF, combine_limit=0)
    _eq(a, b)
    df = a.to_pandas()
    assert (df.cume_dist > 0).all() and (df.cume_dist <= 1).all()
    assert (df.percent_rank >= 0).all() and (df.percent_rank <= 1).all()
    # the max value of a type has cume_dist exactly 1
    assert (df.cume_dist == 1.0).any()


def test_event_transitions_tiers_and_mass():
    from high_performance_docling_ray.pipelines.analytics import event_transitions

    a = event_transitions(SF)
    b = event_transitions(SF, combine_limit=0)
    _eq(a, b)
    df = a.to_pandas()
    # total transitions = total events - number of users (each user
    # contributes len(events)-1 transitions)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"]).to_pandas()
    assert df.n.sum() == len(ev) - ev.user_id.nunique()
    assert (df.n > 0).all()


def test_trimmed_stats_properties():
    from high_performance_docling_ray.pipelines.relational import trimmed_stats

    t = trimmed_stats(SF).to_pandas()
    tm, wm = t.trimmed_mean.iloc[0], t.winsorized_mean.iloc[0]
    assert tm > 0 and wm > 0
    # alpha=0 degenerates to the plain mean for both statistics
    t0 = trimmed_stats(SF, alpha=0.0).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_extendedprice"]).to_pandas()
    cents = np.rint(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    plain = cents.sum() / len(cents) / 100.0
    assert abs(t0.trimmed_mean.iloc[0] - plain) < 1e-9
    assert abs(t0.winsorized_mean.iloc[0] - plain) < 1e-9


def test_user_event_paths_tiers_and_mass():
    from high_performance_docling_ray.pipelines.analytics import user_event_paths

    a = user_event_paths(SF)
    b = user_event_paths(SF, combine_limit=0)
    _eq(a, b)
    df = a.to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    # one path per user; path lengths conserve total events
    assert df.n_users.sum() == ev.user_id.nunique()
    total_steps = sum((p.count(">") + 1) * n
                      for p, n in zip(df.path, df.n_users))
    assert total_steps == len(ev)


def test_moment_statistics_tiers_and_closed_forms():
    from high_performance_docling_ray.pipelines.analytics import (
        events_trend,
        price_qty_correlation,
    )

    c = price_qty_correlation(SF).to_pandas()
    assert -1.0 <= c.corr_qty_price.iloc[0] <= 1.0
    # closed-form check vs numpy on the full column (same cents basis)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_quantity", "l_extendedprice"]).to_pandas()
    x = np.rint(li.l_quantity.to_numpy() * 100).astype(np.int64)
    y = np.rint(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    ref = np.corrcoef(x, y)[0, 1]
    assert abs(c.corr_qty_price.iloc[0] - ref) < 1e-9

    a = events_trend(SF)
    b = events_trend(SF, combine_limit=0)
    _eq(a, b)
    assert a.num_rows == 5  # one row per event type


def test_mad_stats_tiers_and_reference():
    from high_performance_docling_ray.pipelines.relational import mad_stats

    a = mad_stats(SF)
    b = mad_stats(SF, combine_limit=0)
    _eq(a, b)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_extendedprice"]).to_pandas()
    cents = np.rint(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    med = np.median(cents) / 100.0
    mad = np.median(np.abs(cents - np.median(cents))) / 100.0
    df = a.to_pandas()
    assert abs(df["median"].iloc[0] - med) < 1e-9
    assert abs(df["mad"].iloc[0] - mad) < 1e-9


def test_selfjoin_size_estimate_bounds():
    from high_performance_docling_ray.pipelines.relational import (
        selfjoin_size_estimate,
    )

    t = selfjoin_size_estimate(SF).to_pandas()
    exact, est = int(t.exact_size.iloc[0]), int(t.cms_estimate.iloc[0])
    # CMS inner product NEVER underestimates the true F2
    assert est >= exact
    # lower bound: F2 >= n (every key contributes at least c>=1 -> c^2>=c)
    li = pq.ParquetFile(f"{SF}/lineitem.parquet").metadata.num_rows
    assert exact >= li
    # determinism
    t2 = selfjoin_size_estimate(SF).to_pandas()
    assert t.equals(t2)


def test_gini_coefficient_bounds_and_closed_form():
    from high_performance_docling_ray.pipelines.relational import (
        gini_coefficient,
    )

    g = gini_coefficient(SF).to_pandas().gini.iloc[0]
    assert 0.0 <= g < 1.0
    # numpy reference on the full column
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_totalprice"]).to_pandas()
    v = np.sort(np.rint(o.o_totalprice.to_numpy() * 100).astype(np.int64))
    n = len(v)
    rn = np.arange(1, n + 1)
    ref = float(np.sum((2 * rn - n - 1) * v)) / (n * v.sum())
    assert abs(g - ref) < 1e-9
    b = gini_coefficient(SF, combine_limit=0).to_pandas().gini.iloc[0]
    assert g == b


def test_lang_median_mad_tiers_and_reference():
    from high_performance_docling_ray.pipelines.relational import (
        lang_median_mad,
    )

    a = lang_median_mad(SF)
    b = lang_median_mad(SF, combine_limit=0)
    _eq(a, b)
    df = a.to_pandas().set_index("lang")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "n_chars"]).to_pandas()
    for g, grp in docs.groupby("lang"):
        v = grp.n_chars.to_numpy()
        assert abs(df.loc[g, "median_chars"] - np.median(v)) < 1e-9
        assert abs(df.loc[g, "mad_chars"]
                   - np.median(np.abs(v - np.median(v)))) < 1e-9


def test_weighted_median_tiers_and_reference():
    from high_performance_docling_ray.pipelines.relational import (
        weighted_median_qty,
    )

    a = weighted_median_qty(SF)
    b = weighted_median_qty(SF, combine_limit=0)
    _eq(a, b)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_quantity", "l_extendedprice"]).to_pandas()
    q = np.rint(li.l_quantity.to_numpy() * 100).astype(np.int64)
    w = np.rint(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    order = np.argsort(q, kind="stable")
    qs, ws = q[order], w[order]
    cw = np.cumsum(ws)
    ref = qs[np.searchsorted(2 * cw, cw[-1])] / 100.0
    assert a.to_pandas().weighted_median_qty.iloc[0] == ref


def test_frequent_item_pairs_closed_form(tmp_path):
    """Orders {1: (a,b,c), 2: (a,b), 3: (a,b)} -> (a,b) support 3,
    (a,c)/(b,c) support 1 (below min_support 2). Duplicated lineitems
    collapse; a basket over the cap drops whole. Both tiers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.analytics import (
        frequent_item_pairs,
    )

    d = tmp_path / "fip"
    d.mkdir()
    rows = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 10),
            (3, 11), (3, 10)]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([o for o, _ in rows], pa.int64()),
                "l_partkey": pa.array([p for _, p in rows], pa.int64()),
            }
        ),
        d / "lineitem.parquet",
    )
    for limit in (2_000_000, 0):
        out = frequent_item_pairs(str(d), combine_limit=limit).to_pydict()
        assert out == {"part_a": [10], "part_b": [11], "support": [3]}
    # cap=2 drops order 1 whole; (10,11) still supported by orders 2+3
    out = frequent_item_pairs(str(d), max_basket=2).to_pydict()
    assert out == {"part_a": [10], "part_b": [11], "support": [2]}


def test_frequent_item_pairs_tier_equality_sf0001():
    from high_performance_docling_ray.pipelines.analytics import (
        frequent_item_pairs,
    )

    a = frequent_item_pairs("/root/testdata/sf0.001")
    b = frequent_item_pairs("/root/testdata/sf0.001", combine_limit=0)
    assert a.num_rows > 0 and a.equals(b)
