"""Round-4 session-3 operators: per-key ROWS-frame moving average,
Bloom-pushdown semi-join, sorted-neighborhood windowed self-join.
Closed-form pins + tier equality; oracle agreement is driver-gate
verified (tools/check_correctness.py).
"""

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.relational import (  # noqa: E402
    events_moving_avg,
)

SF = "/root/testdata/sf0.001"


def _write_events(d, eids, ts_us, users, vals):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    tbl = pa.table(
        {
            "event_id": pa.array(eids, pa.int64()),
            "ts": pa.array([base + np.timedelta64(t, "us") for t in ts_us]),
            "user_id": pa.array(users, pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    d.mkdir(exist_ok=True)
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


def test_moving_avg_closed_form(tmp_path):
    """User 1: values 1,2,4 in ts order -> windows [1],[1,2],[1,2,4];
    user 2 single row -> its own value. A ts tie resolves by event_id."""
    sf = _write_events(
        tmp_path / "sf",
        eids=[10, 11, 12, 20, 13],
        ts_us=[0, 1000, 2000, 0, 1000],  # eid 13 ties eid 11's user? no:
        users=[1, 1, 1, 2, 1],  # eid 13 (user 1, ts 1000) ties eid 11
        vals=[1.0, 2.0, 4.0, 7.0, 8.0],
    )
    grouped = events_moving_avg(sf, driver_budget=0).to_pandas()
    driver = events_moving_avg(sf).to_pandas()
    assert driver.equals(grouped)  # tier equality
    out = driver.set_index("event_id")
    # user 1 order: (ts, event_id) = (0,10),(1000,11),(1000,13),(2000,12)
    assert out.loc[10, "mov_avg"] == 1.0 and out.loc[10, "n_window"] == 1
    assert out.loc[11, "mov_avg"] == (1.0 + 2.0) / 2
    assert out.loc[13, "mov_avg"] == (8.0 + 2.0 + 1.0) / 3
    assert out.loc[12, "mov_avg"] == (4.0 + 8.0 + 2.0) / 3
    assert out.loc[20, "mov_avg"] == 7.0 and out.loc[20, "n_window"] == 1
    assert len(out) == 5


def test_moving_avg_window_sizes(tmp_path):
    """window_rows=1 is the identity; larger windows keep counts
    clamped to the run length."""
    sf = _write_events(
        tmp_path / "sf",
        eids=[1, 2, 3],
        ts_us=[0, 1, 2],
        users=[5, 5, 5],
        vals=[3.0, 6.0, 9.0],
    )
    ident = events_moving_avg(sf, window_rows=1).to_pandas()
    assert (ident["mov_avg"] == [3.0, 6.0, 9.0]).all()
    assert (ident["n_window"] == 1).all()
    wide = events_moving_avg(sf, window_rows=10).to_pandas()
    assert (wide["n_window"] == [1, 2, 3]).all()
    assert wide["mov_avg"].tolist() == [3.0, 4.5, 6.0]


def test_bloom_semi_join_tiers_equal():
    """Bloom prefilter on == off == over-combine-budget fallback; the
    filter is a pure exchange-volume optimization."""
    from high_performance_docling_ray.pipelines.relational import (
        bloom_semi_join,
    )

    a = bloom_semi_join(SF).to_pandas()  # broadcast verify tier
    b = bloom_semi_join(SF, verify_budget=0).to_pandas()  # bloom+cogroup
    c = bloom_semi_join(SF, verify_budget=0, use_bloom=False).to_pandas()
    d = bloom_semi_join(SF, combine_limit=0).to_pandas()
    assert a.equals(b) and a.equals(c) and a.equals(d)
    assert len(a) > 0 and (a["n_items"] > 0).all()


def test_bloom_semi_join_tiny_bitmap_still_exact():
    """Force a saturated bitmap (64 bits for hundreds of keys) so the
    prefilter passes nearly everything — the exact verify must still
    produce the identical answer."""
    from high_performance_docling_ray.pipelines.relational import (
        bloom_semi_join,
    )

    exact = bloom_semi_join(SF).to_pandas()
    tiny = bloom_semi_join(
        SF, verify_budget=0, bloom_bits_per_key=1, bloom_max_bits=1 << 10
    ).to_pandas()
    assert tiny.equals(exact)


def test_int_bloom_no_false_negatives_and_filters():
    from high_performance_docling_ray.pipelines.joins import (
        int_bloom_build,
        int_bloom_query,
    )

    rng = np.random.default_rng(7)
    members = rng.choice(10**9, size=5000, replace=False).astype(np.int64)
    bits = int_bloom_build(members, 1 << 17)
    assert int_bloom_query(bits, members).all()
    probe = rng.choice(10**9, size=20000, replace=False).astype(np.int64)
    non = np.setdiff1d(probe, members)
    fp_rate = int_bloom_query(bits, non).mean()
    # 16+ bits/key at k=4 -> well under 1% false positives
    assert fp_rate < 0.01


def _snp_table(ds):
    import pandas as pd

    df = ds.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return df


def test_sorted_neighborhood_halo_boundaries():
    """A tiny pair_block forces halo replication at every block edge;
    the pair set must be identical to the one-block run."""
    from high_performance_docling_ray.pipelines.dedup import (
        sorted_neighborhood_pairs,
    )

    big = _snp_table(sorted_neighborhood_pairs(SF))  # driver tier
    wide = _snp_table(
        sorted_neighborhood_pairs(SF, driver_budget=0, pair_block=1 << 20)
    )
    tiny = _snp_table(
        sorted_neighborhood_pairs(SF, driver_budget=0, pair_block=8)
    )
    assert big.equals(tiny) and big.equals(wide)
    # n docs in global order -> exactly w*n - w*(w+1)/2 pairs
    n = big["doc_a"].nunique() + 1  # only the last rank never leads a pair
    assert len(big) == 3 * n - 6


def test_sorted_neighborhood_identical_keys(tmp_path):
    """All-identical blocking keys: order falls back to doc_id and
    every adjacent id pair appears once per distance."""
    from high_performance_docling_ray.pipelines.dedup import (
        sorted_neighborhood_pairs,
    )

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {"doc_id": pa.array([5, 1, 9, 3], pa.int64()),
             "text": pa.array(["same prefix here!"] * 4)}
        ),
        d / "documents.parquet",
    )
    for budget in (2_000_000, 0):  # both tiers
        out = _snp_table(
            sorted_neighborhood_pairs(str(d), window=2, driver_budget=budget)
        )
        got = set(map(tuple, out[["doc_a", "doc_b", "dist"]].values.tolist()))
        assert got == {(1, 3, 1), (3, 5, 1), (5, 9, 1), (1, 5, 2), (3, 9, 2)}


def test_pareto_orders_closed_form(tmp_path):
    """Strict-dominance semantics: date ties never dominate each
    other; exact (date, price) duplicates all survive; an interior
    point falls to a strictly-greater-in-both competitor."""
    from high_performance_docling_ray.pipelines.relational import (
        pareto_orders,
    )

    base = np.datetime64("2024-01-01", "us")
    day = np.timedelta64(86400_000_000, "us")
    tbl = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "o_orderdate": pa.array(
                [base, base + day, base + day, base + 2 * day,
                 base + 2 * day, base]
            ),
            # 1: (d0,100) dominated by 4 (d2,150); 2&3 tie date d1 at
            # 200 (both kept: nothing later beats 200); 4 (d2,150) and
            # 5 (d2,150) are exact duplicates on the front; 6 (d0,300)
            # highest price overall -> kept
            "o_totalprice": pa.array(
                [100.0, 200.0, 200.0, 150.0, 150.0, 300.0], pa.float64()
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, d / "orders.parquet")
    out = pareto_orders(str(d)).to_pandas()
    assert sorted(out["o_orderkey"].tolist()) == [2, 3, 4, 5, 6]


def test_pareto_orders_multipass_tier_equal():
    """merge_budget=0 forces the repartition + re-pass tier; the front
    is identical (local passes never remove skyline members)."""
    from high_performance_docling_ray.pipelines.relational import (
        pareto_orders,
    )

    a = pareto_orders(SF).to_pandas()
    b = pareto_orders(SF, merge_budget=0, max_passes=2).to_pandas()
    assert a.equals(b)
    assert len(a) > 0


def test_moving_avg_sink_roundtrip(tmp_path):
    """sink_dir streams the same rows to sharded parquet."""
    import pandas as pd

    tbl = events_moving_avg(SF).to_pandas()
    sink = tmp_path / "out"
    path = events_moving_avg(SF, sink_dir=str(sink))
    back = (
        pq.read_table(path)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, tbl)


def test_user_type_pivot_closed_form(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.relational import (
        user_type_pivot,
    )

    d = tmp_path / "sf"
    d.mkdir()
    base = np.datetime64("2024-01-01", "us")
    types = ["click", "click", "view", "weird", "purchase"]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "ts": pa.array([base] * 5),
            }
        ),
        d / "events.parquet",
    )
    out = user_type_pivot(str(d))
    out = (out.to_pandas() if hasattr(out, "to_pandas") else out).set_index(
        "user_id"
    )
    assert out.loc[1, "n_click"] == 2
    assert out.loc[1, "n_view"] == 1
    # unknown type counts toward the total only
    assert out.loc[1, "n_total"] == 4
    assert out.loc[2, "n_purchase"] == 1 and out.loc[2, "n_total"] == 1
    grouped = user_type_pivot(str(d), combine_limit=0).to_pandas()
    assert grouped.set_index("user_id").equals(out)


def test_user_type_pivot_tiers_sf0001():
    from high_performance_docling_ray.pipelines.relational import (
        user_type_pivot,
    )

    sf = "/root/testdata/sf0.001"
    a = user_type_pivot(sf)
    a = a.to_pandas() if hasattr(a, "to_pandas") else a
    b = user_type_pivot(sf, combine_limit=0).to_pandas()
    assert len(a) > 0 and a.equals(b)


def test_feature_correlations_closed_form(tmp_path):
    """Two users with click == view counts -> corr(n_click, n_view)
    exactly 1; click vs error anti-varying -> -1."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.relational import (
        feature_correlations,
    )

    d = tmp_path / "sf"
    d.mkdir()
    base = np.datetime64("2024-01-01", "us")
    rows = (
        [(1, "click")] * 1 + [(1, "view")] * 1 + [(1, "error")] * 3
        + [(2, "click")] * 3 + [(2, "view")] * 3 + [(2, "error")] * 1
    )
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array([base] * len(rows)),
            }
        ),
        d / "events.parquet",
    )
    out = feature_correlations(str(d)).to_pandas().set_index(
        ["feat_a", "feat_b"]
    )
    assert abs(out.loc[("n_click", "n_view"), "corr"] - 1.0) < 1e-9
    assert abs(out.loc[("n_click", "n_error"), "corr"] + 1.0) < 1e-9
    # n_purchase is all-zero -> zero variance -> NULL
    assert np.isnan(out.loc[("n_click", "n_purchase"), "corr"])
    assert (out.n_users == 2).all()
    grouped = feature_correlations(str(d), combine_limit=0).to_pandas()
    assert grouped.set_index(["feat_a", "feat_b"]).equals(out)


def test_dup_clique_histogram_closed_form(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.dedup import (
        dup_clique_histogram,
    )

    d = tmp_path / "sf"
    d.mkdir()
    texts = ["a", "a", "a", "b", "b", "c", None, None]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    out = dup_clique_histogram(str(d)).to_pandas().set_index("clique_size")
    # cliques: {a:3, b:2, c:1, '':2} -> size 1 x1, size 2 x2, size 3 x1
    assert out.loc[1, "n_cliques"] == 1
    assert out.loc[2, "n_cliques"] == 2
    assert out.loc[3, "n_cliques"] == 1
    grouped = dup_clique_histogram(str(d), combine_limit=0).to_pandas()
    assert grouped.set_index("clique_size").equals(out)


def test_value_concentration_closed_form(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.seqstats import (
        value_concentration,
    )

    d = tmp_path / "sf"
    d.mkdir()
    base = np.datetime64("2024-01-01", "us")
    # 10 users, totals 1..10 -> fewer than 100 users: tile 100 is
    # EMPTY (NTILE spreads 10 rows over tiles 1..100 -> tiles 1-10),
    # so top1_share is NULL and top10_share is also NULL (no tile>90)
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array(list(range(1, 11)), pa.int64()),
                "value": pa.array([float(i) for i in range(1, 11)]),
                "ts": pa.array([base] * 10),
            }
        ),
        d / "events.parquet",
    )
    out = value_concentration(str(d)).to_pandas()
    assert out.n_users[0] == 10
    assert out.top1_users[0] == 0
    assert np.isnan(out.top1_share[0]) and np.isnan(out.top10_share[0])
    assert value_concentration(str(d), combine_limit=0).to_pandas().equals(
        out
    )


def test_vocab_growth_statless_fallback(tmp_path):
    """No footer stats path: MAX(doc_id) must come from ALL documents
    (a trailing token-less doc raises the bound), matching the oracle."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import high_performance_docling_ray.pipelines.corpus_clean as cc

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(1, 11)), pa.int64()),
                "text": pa.array(["w"] * 9 + ["   "], pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    want = cc.vocab_growth(str(d)).to_pandas()
    assert list(want.cutoff_doc) == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    orig = cc._doc_id_max
    cc._doc_id_max = lambda _sf: None
    try:
        got = cc.vocab_growth(str(d)).to_pandas()
    finally:
        cc._doc_id_max = orig
    assert got.equals(want)


def test_feature_correlations_empty_events(tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.relational import (
        feature_correlations,
    )

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "ts": pa.array([], pa.timestamp("us")),
            }
        ),
        d / "events.parquet",
    )
    out = feature_correlations(str(d)).to_pandas()
    assert len(out) == 0


def test_feature_correlations_grouped_stays_distributed(tmp_path):
    """The forced tier must fold moments from the DISTRIBUTED pivot
    rows, never collecting per-user rows on the driver: _pivot_rows
    with combine_limit=0 returns a Dataset, not a Table."""
    import ray.data

    from high_performance_docling_ray.pipelines.relational import (
        _pivot_rows,
    )

    piv = _pivot_rows("/root/testdata/sf0.001", 0)
    assert isinstance(piv, ray.data.Dataset)
