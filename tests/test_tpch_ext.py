"""TPC-H tail family (pipelines/tpch_ext.py): over-budget shuffle-tier
equality pins + shape invariants. Oracle agreement for every query is
driver-gate verified (tools/check_correctness.py).
"""

import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.tpch_ext import (  # noqa: E402
    _q21_winners_from_arrays,
    q8_market_share,
    q13_customer_distribution,
    q15_top_supplier,
    q17_small_quantity_revenue,
    q19_disjunctive_revenue,
    q21_waiting_suppliers,
    q22_dormant_customers,
)

SF = "/root/testdata/sf0.001"


def _eq(a: pa.Table, b: pa.Table):
    pa_a = a.to_pandas().reset_index(drop=True)
    pa_b = b.to_pandas().reset_index(drop=True)
    assert pa_a.equals(pa_b), f"{pa_a}\n!=\n{pa_b}"


def test_q8_share_bounded():
    t = q8_market_share(SF)
    assert t.num_rows == 2  # 1996, 1997
    share = t.column("mkt_share").to_numpy()
    assert ((share >= 0.0) & (share <= 1.0)).all()


def test_q13_tiers_equal_and_mass_conserved():
    a = q13_customer_distribution(SF)
    b = q13_customer_distribution(SF, combine_limit=0)
    _eq(a, b)
    # every customer lands in exactly one bucket
    import pyarrow.parquet as pq

    n_cust = pq.ParquetFile(f"{SF}/customer.parquet").metadata.num_rows
    assert int(a.column("custdist").to_numpy().sum()) == n_cust
    # custdist strictly ordered desc, ties broken by c_count desc
    cd = a.column("custdist").to_numpy()
    cc = a.column("c_count").to_numpy()
    for i in range(1, len(cd)):
        assert (cd[i] < cd[i - 1]) or (cd[i] == cd[i - 1] and cc[i] < cc[i - 1])


def test_q15_tiers_equal_and_max():
    a = q15_top_supplier(SF)
    b = q15_top_supplier(SF, combine_limit=0)
    _eq(a, b)
    assert a.num_rows >= 1
    rev = a.column("total_revenue").to_numpy()
    # all winners share the max
    assert np.allclose(rev, rev.max())


def test_q17_tiers_equal():
    a = q17_small_quantity_revenue(SF)
    b = q17_small_quantity_revenue(SF, combine_limit=0)
    _eq(a, b)
    assert a.column("avg_yearly").to_numpy()[0] > 0


def test_q19_nonzero():
    t = q19_disjunctive_revenue(SF)
    assert t.column("revenue").to_numpy()[0] > 0


def test_q21_tiers_equal():
    a = q21_waiting_suppliers(SF)
    b = q21_waiting_suppliers(SF, combine_limit=0)  # map_groups resolution tier
    _eq(a, b)
    assert 0 < a.num_rows <= 10
    nw = a.column("numwait").to_numpy()
    assert (np.diff(nw) <= 0).all()


def test_q21_winner_kernel():
    # order 1: two suppliers, unique max -> supplier 9 wins
    # order 2: two suppliers sharing the max -> nobody wins
    # order 3: single supplier -> nobody wins (nsupp < 2)
    okey = np.array([1, 1, 2, 2, 3], dtype=np.int64)
    supp = np.array([7, 9, 4, 5, 6], dtype=np.int64)
    ms = np.array([10, 20, 30, 30, 40], dtype=np.int64)
    w = _q21_winners_from_arrays(okey, supp, ms)
    assert w.tolist() == [9]
    assert _q21_winners_from_arrays(
        np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64)
    ).tolist() == []


def test_q22_tiers_equal():
    a = q22_dormant_customers(SF)
    b = q22_dormant_customers(SF, combine_limit=0)
    _eq(a, b)
    # dormant candidates exist at this SF with the shipped cutoff
    assert int(a.column("numcust").to_numpy().sum()) > 0
    assert (a.column("totacctbal").to_numpy() > 0).all()


def test_top_order_values_with_ties():
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.tpch_ext import (
        top_order_values_with_ties,
    )

    a = top_order_values_with_ties(SF)
    b = top_order_values_with_ties(SF, combine_limit=0)
    _eq(a, b)
    df = a.to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderpriority", "o_totalprice"]).to_pandas()
    # per priority: exactly <=3 distinct values, ranks dense from 1
    for g, grp in df.groupby("o_orderpriority"):
        vals = sorted(grp.o_totalprice.unique(), reverse=True)
        assert len(vals) <= 3
        assert sorted(grp.rnk.unique()) == list(range(1, len(vals) + 1))
        # rank 1 really is the group's global max
        assert vals[0] == o.loc[o.o_orderpriority == g, "o_totalprice"].max()


def test_q2_tiers_and_argmin():
    from high_performance_docling_ray.pipelines.tpch_ext import (
        q2_min_cost_supplier,
    )

    a = q2_min_cost_supplier(SF)
    b = q2_min_cost_supplier(SF, combine_limit=0)
    _eq(a, b)
    assert a.num_rows > 0


def test_q9_profit_tiers():
    from high_performance_docling_ray.pipelines.tpch_ext import q9_nation_profit

    a = q9_nation_profit(SF)
    b = q9_nation_profit(SF, combine_limit=0)
    _eq(a, b)
    # one row per (present nation, present ship-year)
    assert a.num_rows > 0
    assert len(set(zip(a.column("nation").to_pylist(),
                       a.column("o_year").to_pylist()))) == a.num_rows


def test_q11_threshold_and_tiers():
    from high_performance_docling_ray.pipelines.tpch_ext import (
        q11_important_stock,
    )

    a = q11_important_stock(SF)
    b = q11_important_stock(SF, combine_limit=0)
    _eq(a, b)
    v = a.column("value").to_numpy()
    assert (np.diff(v) <= 1e-9).all()  # descending


def test_q16_q20_tiers():
    from high_performance_docling_ray.pipelines.tpch_ext import (
        q16_supplier_part_counts,
        q20_promotion_suppliers,
    )

    a = q16_supplier_part_counts(SF)
    b = q16_supplier_part_counts(SF, combine_limit=0)
    _eq(a, b)
    assert (a.column("supplier_cnt").to_numpy() > 0).all()
    c = q20_promotion_suppliers(SF)
    d = q20_promotion_suppliers(SF, combine_limit=0)
    _eq(c, d)
    assert c.num_rows > 0  # NATION_3 qualifies at every SF
