"""Overflow-proof limb-split money partials (VERDICT r4 #2).

Pins that the shared ``limb_split`` / ``limb_values`` helper keeps
grouped money sums EXACT past int64 range: per-block partial sums are
split into (hi, lo) 31-bit limbs whose cross-block int64 sums cannot
wrap for < 2^31 blocks, and the driver recombination yields the true
arbitrary-precision total. A planted 2^63-adjacent group demonstrates
the failure the helper prevents: a plain int64 merge of the same
partials wraps around, the limb merge does not.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray

from high_performance_docling_ray.pipelines.relational import (
    _combine_partials,
    collect_arrow,
    limb_cols,
    limb_split,
    limb_values,
)


def _partial(key: str, vals: list[int]) -> pa.Table:
    t = pa.Table.from_pydict(
        {"k": pa.array([key] * len(vals), pa.string()),
         "m": pa.array(vals, pa.int64())}
    )
    t = t.group_by("k").aggregate([("m", "sum")]).rename_columns(["k", "m"])
    return limb_split(t, ["m"])


def test_limb_roundtrip_identity():
    # v == hi * 2^31 + lo for positives, negatives, and the int64 rim
    vals = [0, 1, -1, (1 << 31) - 1, 1 << 31, -(1 << 31),
            (1 << 62) - 7, -(1 << 62) + 7, 2**63 - 1, -(2**63) + 1]
    t = pa.Table.from_pydict({"k": ["a"] * len(vals),
                              "m": pa.array(vals, pa.int64())})
    lt = limb_split(t, ["m"])
    hi = lt.column("m_hi").to_numpy().astype(object)
    lo = lt.column("m_lo").to_numpy().astype(object)
    assert [int(h) * (1 << 31) + int(l) for h, l in zip(hi, lo)] == vals
    assert all(0 <= int(l) < (1 << 31) for l in lo)


def test_limb_merge_exact_past_int64():
    # 8 block partials each summing to ~2^61: the true total 2^64+8
    # does NOT fit int64 — a plain int64 merge wraps; limbs do not.
    per_block = (1 << 61) + 1
    parts = [_partial("hot", [per_block]) for _ in range(8)]
    merged = (
        pa.concat_tables(parts)
        .group_by("k")
        .aggregate([("m_hi", "sum"), ("m_lo", "sum")])
        .rename_columns(["k", "sum(m_hi)", "sum(m_lo)"])
    )
    [val] = limb_values(merged, "m")
    assert int(val) == 8 * per_block  # == 2^64 + 8, exact
    # demonstrate the wraparound the helper prevents
    wrapped = np.int64(0)
    for _ in range(8):
        with np.errstate(over="ignore"):
            wrapped = np.add(wrapped, np.int64(per_block))
    assert int(wrapped) != 8 * per_block


def test_limb_negative_group_exact():
    per_block = -(1 << 61) - 13
    parts = [_partial("neg", [per_block]) for _ in range(6)]
    merged = (
        pa.concat_tables(parts)
        .group_by("k")
        .aggregate([("m_hi", "sum"), ("m_lo", "sum")])
        .rename_columns(["k", "sum(m_hi)", "sum(m_lo)"])
    )
    [val] = limb_values(merged, "m")
    assert int(val) == 6 * per_block


def test_limb_through_combine_partials_and_ray_groupby():
    # the exact value survives BOTH merge tiers: the driver C++
    # combine and the Ray groupby shuffle fallback
    per_block = (1 << 60) + 3
    parts = [_partial(k, [per_block, 5])
             for _ in range(10) for k in ("a", "b")]
    ds = ray.data.from_arrow(parts)
    expect = 10 * (per_block + 5)

    combined = _combine_partials(ds, ["k"], limb_cols(["m"]), 2_000_000)
    assert combined is not None
    vals = dict(zip(combined.column("k").to_pylist(),
                    limb_values(combined, "m")))
    assert {k: int(v) for k, v in vals.items()} == {
        "a": expect, "b": expect}

    shuffled = collect_arrow(ds.groupby("k").sum(limb_cols(["m"])))
    vals2 = dict(zip(shuffled.column("k").to_pylist(),
                     limb_values(shuffled, "m")))
    assert {k: int(v) for k, v in vals2.items()} == {
        "a": expect, "b": expect}


SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "query",
    ["q1", "q5", "q7", "q8", "q9", "q15"],
)
def test_limbed_queries_match_plain_fixture(query, sf_dir=SF):
    """The limb-treated queries still produce the pinned results on
    the fixture corpus (hash equality vs the oracle is the driver
    gate; here we pin non-empty, finite output shape)."""
    from high_performance_docling_ray.pipelines import (
        analytics,
        relational,
        tpch_ext,
    )

    fn = {
        "q1": relational.q1_pricing_summary,
        "q5": relational.q5_region_revenue,
        # default NATION_1/2 pair has no cross volume at sf0.001
        "q7": lambda d: analytics.q7_nation_volume(
            d, nation_a="NATION_20", nation_b="NATION_11"
        ),
        "q8": tpch_ext.q8_market_share,
        "q9": tpch_ext.q9_nation_profit,
        "q15": tpch_ext.q15_top_supplier,
    }[query]
    out = fn(sf_dir)
    assert out.num_rows > 0
    for name in out.column_names:
        col = out.column(name)
        if pa.types.is_floating(col.type):
            vals = col.to_numpy(zero_copy_only=False)
            assert np.isfinite(vals).all()
