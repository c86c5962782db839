"""Distribution-comparison hypothesis tests over corpus-scale event
streams — the A/B-readout family a training-data pipeline runs next to
its per-entity profiles (does cohort A's metric distribution differ
from cohort B's; are two categorical axes independent):

- ``mannwhitney_value`` — EXACT tie-corrected Mann-Whitney U / rank-sum
  z between two event-type cohorts, with no global sort: value counts
  are the sufficient statistic, so the exchange is bounded by DISTINCT
  values, never by rows (the nonparametric test that is robust where
  ``welch_ttest_value`` assumes finite variance).
- ``ks_two_sample`` — EXACT two-sample Kolmogorov-Smirnov D over the
  same distinct-value sufficient statistic; the max ECDF gap is
  decided in INTEGER arithmetic (max |ca·n_b − cb·n_a|), so ties and
  float rounding can never flip the argmax.
- ``welch_ttest_value`` — Welch's unequal-variance t from mergeable
  (n, Σcents, Σcents²) moment partials; two partial rows per block,
  one scalar exchange.
- ``contingency_stats`` — chi-square, Cramér's V and mutual
  information between two categorical axes (event_type × hour-of-day)
  from mergeable cell-count partials; empty grid cells enter chi² via
  the closed form Σ_observed((f−e)²/e − e) + n, so the observed cells
  are the only state.

House tier convention (NOTES_r4): a driver combine fast path under the
standard ``combine_limit`` partial budget, and a distributed fallback
(Ray groupby; for Mann-Whitney a range-scaled value-bucket pass in the
``shuffle_ranks`` two-level shape) registered as a forced ``*_grouped``
driver entry sharing the base oracle.

Exactness notes: rank sums are half-integer-quantized, so every tier's
partial additions are EXACT in float64 while the rank-sum magnitude
stays below 2^52 (n² < 2^52, n ≲ 6.7e7 cohort rows); past that the
tiers agree to ~1e-16 relative — far inside the 6dp gate rounding
(z divides by σ_U ~ n^1.5, shrinking the absolute error further).
Tie terms Σ(t³−t) are computed in float64 on BOTH sides (the oracle
casts to DOUBLE before cubing) so the expressions round identically.

Reference anchor: the reference engine's per-page confidence
aggregation (nanmean/quantile folds over predictor scores,
fork/docling_parity/confidence.py shape) is the same
sufficient-statistic reduction; these operators lift it to two-sample
and two-axis comparisons at corpus scale.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .relational import _cents, _combine_partials, _read

__all__ = [
    "mannwhitney_value",
    "ks_two_sample",
    "welch_ttest_value",
    "contingency_stats",
]


# -- Mann-Whitney U / rank-sum z ---------------------------------------------

_MW_EMPTY = {
    "n_a": pa.int64(),
    "n_b": pa.int64(),
    "u_stat": pa.float64(),
    "z_score": pa.float64(),
}


def _mw_row(n1: int, n2: int, r1: float, ties: float) -> pa.Table:
    """Close U and the tie-corrected normal z from the four sufficient
    scalars. Expression order mirrors the oracle SQL exactly (the
    half-integer U is bit-identical; z agrees far past 6dp)."""
    if n1 == 0 or n2 == 0:
        u1 = None
        z = None
    else:
        u1 = r1 - n1 * (n1 + 1) / 2.0
        n = n1 + n2
        z = None
        if n >= 2:
            sig2 = (n1 * n2 / 12.0) * (
                (n + 1) - ties / (float(n) * (n - 1))
            )
            if sig2 > 0:
                z = round((u1 - n1 * n2 / 2.0) / math.sqrt(sig2), 6)
        u1 = round(u1, 6)
    return pa.Table.from_pydict(
        {
            "n_a": pa.array([int(n1)], pa.int64()),
            "n_b": pa.array([int(n2)], pa.int64()),
            "u_stat": pa.array([u1], pa.float64()),
            "z_score": pa.array([z], pa.float64()),
        }
    )


def _mw_rank_sums(
    v: np.ndarray, fa: np.ndarray, fb: np.ndarray, offset: float = 0.0
) -> tuple[float, float, int, int]:
    """(r1, ties, n1, n2) from DISTINCT value counts sorted here;
    ``offset`` is the count of values in earlier global rank positions
    (0 for the driver tier, the bucket prefix for the distributed
    tier). Average ranks are 1-based."""
    order = np.argsort(v, kind="stable")
    fa = fa[order].astype(np.float64)
    fb = fb[order].astype(np.float64)
    t = fa + fb
    cum = offset + np.cumsum(t) - t
    avgrank = cum + (t + 1) / 2.0
    r1 = float((fa * avgrank).sum())
    ties = float((t * t * t - t).sum())
    return r1, ties, int(fa.sum()), int(fb.sum())


_EMPTY_VC = pa.Table.from_pydict(
    {
        "v": pa.array([], pa.int64()),
        "fa": pa.array([], pa.int64()),
        "fb": pa.array([], pa.int64()),
    }
)


def _cohort_vc_partials(
    sf_dir: str, type_a: str, type_b: str
) -> ray.data.Dataset:
    """Mergeable (cents, f_a, f_b) distinct-value count partials over
    the two event-type cohorts — the shared sufficient statistic of
    the rank/ECDF two-sample tests (Mann-Whitney AND
    Kolmogorov-Smirnov): every downstream exchange is bounded by
    DISTINCT values, never by rows."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def vc_partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, type_a), pc.equal(et, type_b))
        sub = batch.filter(pc.fill_null(keep, False))
        if sub.num_rows == 0:
            return _EMPTY_VC
        v = _cents(sub.column("value"))
        isa = pc.equal(sub.column("event_type"), type_a).to_numpy(
            zero_copy_only=False
        )
        uv, inv = np.unique(v, return_inverse=True)
        fa = np.bincount(inv, weights=isa).astype(np.int64)
        fb = np.bincount(inv, weights=~isa).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "v": pa.array(uv, pa.int64()),
                "fa": pa.array(fa, pa.int64()),
                "fb": pa.array(fb, pa.int64()),
            }
        )

    return ds.map_batches(vc_partial, batch_format="pyarrow").materialize()


def mannwhitney_value(
    sf_dir: str,
    type_a: str = "purchase",
    type_b: str = "click",
    bucket_bits: int = 16,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """EXACT tie-corrected Mann-Whitney U test (rank-sum z) between the
    ``value`` distributions of two event-type cohorts.

    Composition (every stage bounded by DISTINCT cent values, never by
    rows — value counts are the test's sufficient statistic):

    1. mergeable (cents, f_a, f_b) count partials reduce inside the
       scan; under the combine gate the distinct-value table is on the
       driver and one sorted pass closes (R1, Στ³−τ, n1, n2).
    2. past the budget: Ray ``groupby(v)`` merges counts, a min/max
       pre-pass range-scales integer buckets (equal values can never
       straddle buckets, so a tie run never splits), per-bucket count
       totals cumsum to global rank offsets, and ONE
       ``groupby(bucket)`` pass reduces each bucket to the four
       scalars — rank vectors never materialize (the spearman stage-3
       shape over values instead of users).
    """
    partials = _cohort_vc_partials(sf_dir, type_a, type_b)
    merged = _combine_partials(partials, ["v"], ["fa", "fb"], combine_limit)
    if merged is not None:
        if not merged.num_rows:
            return _mw_row(0, 0, 0.0, 0.0)
        r1, ties, n1, n2 = _mw_rank_sums(
            merged.column("v").to_numpy(zero_copy_only=False),
            merged.column("sum(fa)").to_numpy(zero_copy_only=False),
            merged.column("sum(fb)").to_numpy(zero_copy_only=False),
        )
        return _mw_row(n1, n2, r1, ties)

    # -- distributed tier: distinct-value merge + bucket rank pass -------
    vc = partials.groupby("v").sum(["fa", "fb"])
    vc = vc.map_batches(
        lambda b: b.rename_columns(["v", "fa", "fb"]),
        batch_format="pyarrow",
    ).materialize()

    def minmax_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        if not len(v):
            return pa.Table.from_pydict(
                {"lo": pa.array([], pa.int64()),
                 "hi": pa.array([], pa.int64())}
            )
        return pa.Table.from_pydict(
            {
                "lo": pa.array([int(v.min())], pa.int64()),
                "hi": pa.array([int(v.max())], pa.int64()),
            }
        )

    mm = [
        t
        for t in ray.get(
            vc.map_batches(minmax_partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not mm:
        return _mw_row(0, 0, 0.0, 0.0)
    mm_t = pa.concat_tables(mm)
    lo = int(pc.min(mm_t.column("lo")).as_py())
    hi = int(pc.max(mm_t.column("hi")).as_py())
    nb = 1 << bucket_bits
    width = max(1, (hi - lo) // nb + 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        bucket = (v - lo) // width
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    keyed = vc.map_batches(add_bucket, batch_format="pyarrow").materialize()

    def bucket_totals(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        t = (
            batch.column("fa").to_numpy(zero_copy_only=False)
            + batch.column("fb").to_numpy(zero_copy_only=False)
        )
        ub, inv = np.unique(b, return_inverse=True)
        tot = np.bincount(inv, weights=t).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(ub, pa.int64()),
                "t": pa.array(tot, pa.int64()),
            }
        )

    bt_partials = keyed.map_batches(
        bucket_totals, batch_format="pyarrow"
    ).materialize()
    bt = _combine_partials(bt_partials, ["bucket"], ["t"], combine_limit)
    if bt is None:
        rows = [
            t
            for t in ray.get(
                bt_partials.groupby("bucket").sum("t").to_arrow_refs()
            )
            if t.num_rows
        ]
        bt = pa.concat_tables(rows).rename_columns(["bucket", "sum(t)"])
    bt = bt.sort_by([("bucket", "ascending")])
    bb = bt.column("bucket").to_numpy(zero_copy_only=False)
    bf = bt.column("sum(t)").to_numpy(zero_copy_only=False)
    boffs = np.cumsum(bf) - bf
    off_ref = ray.put(dict(zip(bb.tolist(), boffs.tolist())))

    def bucket_sums(group: pa.Table) -> pa.Table:
        off = ray.get(off_ref)[int(group.column("bucket")[0].as_py())]
        r1, ties, n1, n2 = _mw_rank_sums(
            group.column("v").to_numpy(zero_copy_only=False),
            group.column("fa").to_numpy(zero_copy_only=False),
            group.column("fb").to_numpy(zero_copy_only=False),
            offset=float(off),
        )
        return pa.Table.from_pydict(
            {
                "r1": pa.array([r1], pa.float64()),
                "ties": pa.array([ties], pa.float64()),
                "n1": pa.array([n1], pa.int64()),
                "n2": pa.array([n2], pa.int64()),
            }
        )

    rows = [
        t
        for t in ray.get(
            keyed.groupby("bucket")
            .map_groups(bucket_sums, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not rows:
        return _mw_row(0, 0, 0.0, 0.0)
    st = pa.concat_tables(rows)
    return _mw_row(
        int(np.sum(st.column("n1").to_numpy(zero_copy_only=False))),
        int(np.sum(st.column("n2").to_numpy(zero_copy_only=False))),
        float(np.sum(st.column("r1").to_numpy(zero_copy_only=False))),
        float(np.sum(st.column("ties").to_numpy(zero_copy_only=False))),
    )


# -- Kolmogorov-Smirnov two-sample D ------------------------------------------


def _ks_row(n1: int, n2: int, d_num: int) -> pa.Table:
    """Close D and the asymptotic KS statistic sqrt(n1*n2/(n1+n2))*D
    from the exact integer numerator M = max|ca*n2 - cb*n1| (so
    d = M / (n1*n2) with no float max over candidates — the max is
    decided in integer arithmetic, tie-proof). Float expression order
    mirrors the oracle SQL."""
    if n1 == 0 or n2 == 0:
        d = None
        ks = None
    else:
        d_raw = float(d_num) / (float(n1) * float(n2))
        ks = round(
            math.sqrt(float(n1) * float(n2) / (n1 + n2)) * d_raw, 6
        )
        d = round(d_raw, 6)
    return pa.Table.from_pydict(
        {
            "n_a": pa.array([int(n1)], pa.int64()),
            "n_b": pa.array([int(n2)], pa.int64()),
            "d_num": pa.array([int(d_num)], pa.int64()),
            "d_stat": pa.array([d], pa.float64()),
            "ks_stat": pa.array([ks], pa.float64()),
        }
    )


def _ks_bucket_max(
    v: np.ndarray,
    fa: np.ndarray,
    fb: np.ndarray,
    offa: int,
    offb: int,
    n1: int,
    n2: int,
) -> int:
    """max |ca*n2 - cb*n1| over this value range's distinct points,
    with (offa, offb) the cohort counts in earlier global positions.
    Exact: int64 while n1*n2 < 2^62 (~2.1e9 rows per cohort), object
    ints past that — the numerator bound IS n1*n2."""
    if not len(v):
        return 0
    order = np.argsort(v, kind="stable")
    ca = offa + np.cumsum(fa[order])
    cb = offb + np.cumsum(fb[order])
    if n1 * n2 < 2**62:
        return int(np.abs(ca * n2 - cb * n1).max())
    return int(
        max(abs(int(a) * n2 - int(b) * n1) for a, b in zip(ca, cb))
    )


def ks_two_sample(
    sf_dir: str,
    type_a: str = "purchase",
    type_b: str = "click",
    bucket_bits: int = 16,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """EXACT two-sample Kolmogorov-Smirnov D between the ``value``
    distributions of two event-type cohorts — the distribution-SHAPE
    test completing the two-sample family (``mannwhitney_value``
    detects location shift, ``welch_ttest_value`` mean difference; KS
    detects ANY ECDF divergence).

    D = sup_v |F_a(v) − F_b(v)| is attained at an observed jump, so
    the distinct-value (cents, f_a, f_b) counts are again the
    sufficient statistic and the comparison is decided in INTEGER
    arithmetic: maximize |ca·n_b − cb·n_a| over inclusive cumulative
    counts, divide once at close. Composition (every exchange bounded
    by DISTINCT values):

    1. under the combine gate the distinct-value table lands on the
       driver; one sorted cumsum pass closes the max.
    2. past the budget: Ray ``groupby(v)`` merges counts, range-scaled
       integer buckets (a tie run never splits), per-bucket
       (Σf_a, Σf_b) totals cumsum to per-bucket CDF offsets, and ONE
       ``groupby(bucket)`` pass reduces each bucket to its local
       integer max — CDF vectors never materialize (the
       ``mannwhitney_value`` distributed shape with two prefix
       offsets instead of one rank offset).
    """
    partials = _cohort_vc_partials(sf_dir, type_a, type_b)
    merged = _combine_partials(partials, ["v"], ["fa", "fb"], combine_limit)
    if merged is not None:
        if not merged.num_rows:
            return _ks_row(0, 0, 0)
        fa = merged.column("sum(fa)").to_numpy(zero_copy_only=False)
        fb = merged.column("sum(fb)").to_numpy(zero_copy_only=False)
        n1, n2 = int(fa.sum()), int(fb.sum())
        m = _ks_bucket_max(
            merged.column("v").to_numpy(zero_copy_only=False),
            fa, fb, 0, 0, n1, n2,
        )
        return _ks_row(n1, n2, m)

    # -- distributed tier: distinct-value merge + bucketed CDF pass ------
    vc = partials.groupby("v").sum(["fa", "fb"])
    vc = vc.map_batches(
        lambda b: b.rename_columns(["v", "fa", "fb"]),
        batch_format="pyarrow",
    ).materialize()

    def minmax_partial(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        if not len(v):
            return pa.Table.from_pydict(
                {"lo": pa.array([], pa.int64()),
                 "hi": pa.array([], pa.int64())}
            )
        return pa.Table.from_pydict(
            {
                "lo": pa.array([int(v.min())], pa.int64()),
                "hi": pa.array([int(v.max())], pa.int64()),
            }
        )

    mm = [
        t
        for t in ray.get(
            vc.map_batches(minmax_partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not mm:
        return _ks_row(0, 0, 0)
    mm_t = pa.concat_tables(mm)
    lo = int(pc.min(mm_t.column("lo")).as_py())
    hi = int(pc.max(mm_t.column("hi")).as_py())
    nb = 1 << bucket_bits
    width = max(1, (hi - lo) // nb + 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        bucket = (v - lo) // width
        return batch.append_column(
            "bucket", pa.array(bucket.astype(np.int64), pa.int64())
        )

    keyed = vc.map_batches(add_bucket, batch_format="pyarrow").materialize()

    def bucket_totals(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        fa = batch.column("fa").to_numpy(zero_copy_only=False)
        fb = batch.column("fb").to_numpy(zero_copy_only=False)
        ub, inv = np.unique(b, return_inverse=True)
        ta = np.bincount(inv, weights=fa).astype(np.int64)
        tb = np.bincount(inv, weights=fb).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(ub, pa.int64()),
                "ta": pa.array(ta, pa.int64()),
                "tb": pa.array(tb, pa.int64()),
            }
        )

    bt_partials = keyed.map_batches(
        bucket_totals, batch_format="pyarrow"
    ).materialize()
    bt = _combine_partials(
        bt_partials, ["bucket"], ["ta", "tb"], combine_limit
    )
    if bt is None:
        rows = [
            t
            for t in ray.get(
                bt_partials.groupby("bucket")
                .sum(["ta", "tb"])
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        bt = pa.concat_tables(rows).rename_columns(
            ["bucket", "sum(ta)", "sum(tb)"]
        )
    bt = bt.sort_by([("bucket", "ascending")])
    bb = bt.column("bucket").to_numpy(zero_copy_only=False)
    ta = bt.column("sum(ta)").to_numpy(zero_copy_only=False)
    tb = bt.column("sum(tb)").to_numpy(zero_copy_only=False)
    n1, n2 = int(ta.sum()), int(tb.sum())
    offa = np.cumsum(ta) - ta
    offb = np.cumsum(tb) - tb
    off_ref = ray.put(
        {
            int(b): (int(a), int(c))
            for b, a, c in zip(bb.tolist(), offa.tolist(), offb.tolist())
        }
    )

    def bucket_max(group: pa.Table) -> pa.Table:
        oa, ob = ray.get(off_ref)[int(group.column("bucket")[0].as_py())]
        m = _ks_bucket_max(
            group.column("v").to_numpy(zero_copy_only=False),
            group.column("fa").to_numpy(zero_copy_only=False),
            group.column("fb").to_numpy(zero_copy_only=False),
            oa, ob, n1, n2,
        )
        return pa.Table.from_pydict({"m": pa.array([m], pa.int64())})

    rows = [
        t
        for t in ray.get(
            keyed.groupby("bucket")
            .map_groups(bucket_max, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not rows:
        return _ks_row(0, 0, 0)
    st = pa.concat_tables(rows)
    return _ks_row(
        n1, n2, int(st.column("m").to_numpy(zero_copy_only=False).max())
    )


# -- Welch's t ----------------------------------------------------------------


def welch_ttest_value(
    sf_dir: str,
    type_a: str = "purchase",
    type_b: str = "click",
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """Welch's unequal-variance t between two event-type cohorts'
    ``value`` means, from mergeable (cohort, n, Σcents, Σcents²)
    moment partials — two rows per block, one scalar exchange, the
    parametric fast sibling of ``mannwhitney_value``.

    Σcents² partials ride int64: per-cohort headroom needs
    Σc² < 2^63, i.e. ~9e10 rows at c ≈ 10^4 cents — the documented
    bound; past it the partial would adopt the decimal-string pattern
    (tpch_ext module docstring). Variance closes via the exact-integer
    form (Σc² − (Σc)²/n)/(n−1), mirrored by the oracle, so both sides
    round identically at 6dp.
    """
    ds = _read(sf_dir, "events", ["event_type", "value"])

    empty = pa.Table.from_pydict(
        {
            "ga": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sc": pa.array([], pa.int64()),
            "sc2": pa.array([], pa.int64()),
        }
    )

    def m_partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, type_a), pc.equal(et, type_b))
        sub = batch.filter(pc.fill_null(keep, False))
        if sub.num_rows == 0:
            return empty
        c = _cents(sub.column("value"))
        ga = pc.equal(sub.column("event_type"), type_a).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        out_g, out_n, out_s, out_s2 = [], [], [], []
        for g in (1, 0):
            m = ga == g
            if m.any():
                cg = c[m]
                out_g.append(g)
                out_n.append(int(m.sum()))
                out_s.append(int(cg.sum()))
                out_s2.append(int((cg * cg).sum()))
        return pa.Table.from_pydict(
            {
                "ga": pa.array(out_g, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "sc": pa.array(out_s, pa.int64()),
                "sc2": pa.array(out_s2, pa.int64()),
            }
        )

    partials = ds.map_batches(
        m_partial, batch_format="pyarrow"
    ).materialize()
    merged = _combine_partials(
        partials, ["ga"], ["n", "sc", "sc2"], combine_limit
    )
    if merged is None:
        rows = [
            t
            for t in ray.get(
                partials.groupby("ga")
                .sum(["n", "sc", "sc2"])
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        merged = pa.concat_tables(rows).rename_columns(
            ["ga", "sum(n)", "sum(sc)", "sum(sc2)"]
        )

    stats = {}
    for i in range(merged.num_rows):
        g = merged.column("ga")[i].as_py()
        stats[g] = (
            int(merged.column("sum(n)")[i].as_py()),
            int(merged.column("sum(sc)")[i].as_py()),
            int(merged.column("sum(sc2)")[i].as_py()),
        )
    n1, s1, q1 = stats.get(1, (0, 0, 0))
    n2, s2, q2 = stats.get(0, (0, 0, 0))

    def _mv(n: int, s: int, q: int) -> tuple[float | None, float | None]:
        if n == 0:
            return None, None
        mean = s / (100.0 * n)
        if n < 2:
            return mean, None
        var = (q - s * s / n) / (n - 1) / 10000.0
        return mean, var

    m1, v1 = _mv(n1, s1, q1)
    m2, v2 = _mv(n2, s2, q2)
    t_stat = None
    wdf = None
    if v1 is not None and v2 is not None:
        se2 = v1 / n1 + v2 / n2
        if se2 > 0:
            t_stat = round((m1 - m2) / math.sqrt(se2), 6)
            wdf = round(
                se2 * se2
                / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)),
                6,
            )
    return pa.Table.from_pydict(
        {
            "n_a": pa.array([n1], pa.int64()),
            "n_b": pa.array([n2], pa.int64()),
            "mean_a": pa.array(
                [None if m1 is None else round(m1, 6)], pa.float64()
            ),
            "mean_b": pa.array(
                [None if m2 is None else round(m2, 6)], pa.float64()
            ),
            "t_stat": pa.array([t_stat], pa.float64()),
            "welch_df": pa.array([wdf], pa.float64()),
        }
    )


# -- chi-square / Cramér's V / mutual information ------------------------------


def contingency_stats(
    sf_dir: str,
    combine_limit: int = 2_000_000,
) -> pa.Table:
    """Chi-square independence test, Cramér's V and mutual information
    (nats) between event_type and hour-of-day, from mergeable
    (a, b, count) cell partials — the observed cells are the ONLY
    state (empty grid cells enter chi² via
    Σ_obs((f−e)²/e − e) + n, an identity since an empty cell
    contributes (0−e)²/e = e, and contribute 0 to MI).

    The cell table is bounded by the categorical domain product, not
    the corpus (the op's contract — a high-cardinality axis belongs in
    ``pmi_pairs``' key-partitioned shape instead); the forced
    ``_grouped`` tier still exercises the Ray groupby exchange.
    """
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def cell_partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {
                "a": batch.column("event_type"),
                "b": pc.hour(batch.column("ts")).cast(pa.int64()),
                "f": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
            }
        )
        return (
            t.group_by(["a", "b"]).aggregate([("f", "sum")])
            .rename_columns(["a", "b", "f"])
        )

    partials = ds.map_batches(
        cell_partial, batch_format="pyarrow"
    ).materialize()
    cells = _combine_partials(partials, ["a", "b"], ["f"], combine_limit)
    if cells is None:
        rows = [
            t
            for t in ray.get(
                partials.groupby(["a", "b"]).sum("f").to_arrow_refs()
            )
            if t.num_rows
        ]
        cells = pa.concat_tables(rows).rename_columns(["a", "b", "sum(f)"])

    f = cells.column("sum(f)").to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    n = float(f.sum())
    if n == 0:
        return pa.Table.from_pydict(
            {
                "n": pa.array([0], pa.int64()),
                "r_levels": pa.array([0], pa.int64()),
                "c_levels": pa.array([0], pa.int64()),
                "dof": pa.array([0], pa.int64()),
                "chi2": pa.array([None], pa.float64()),
                "cramers_v": pa.array([None], pa.float64()),
                "mutual_info": pa.array([None], pa.float64()),
            }
        )
    a_codes = pc.dictionary_encode(
        cells.column("a").combine_chunks()
    ).indices.to_numpy(zero_copy_only=False)
    b_codes = pc.dictionary_encode(
        cells.column("b").combine_chunks()
    ).indices.to_numpy(zero_copy_only=False)
    fa = np.bincount(a_codes, weights=f)[a_codes]
    fb = np.bincount(b_codes, weights=f)[b_codes]
    r = int(a_codes.max()) + 1
    c = int(b_codes.max()) + 1
    e = fa * fb / n
    chi2 = float(((f - e) * (f - e) / e - e).sum()) + n
    mi = float((f / n * np.log(f * n / (fa * fb))).sum())
    k = min(r, c) - 1
    v = math.sqrt(chi2 / (n * k)) if k >= 1 and chi2 > 0 else (
        0.0 if k >= 1 else None
    )
    return pa.Table.from_pydict(
        {
            "n": pa.array([int(n)], pa.int64()),
            "r_levels": pa.array([r], pa.int64()),
            "c_levels": pa.array([c], pa.int64()),
            "dof": pa.array([(r - 1) * (c - 1)], pa.int64()),
            "chi2": pa.array([round(chi2, 6)], pa.float64()),
            "cramers_v": pa.array(
                [None if v is None else round(v, 6)], pa.float64()
            ),
            "mutual_info": pa.array([round(mi, 6)], pa.float64()),
        }
    )


# -- population stability index (distribution drift) --------------------------

_PSI_EMPTY = pa.Table.from_pydict(
    {
        "source": pa.array([], pa.string()),
        "n_docs": pa.array([], pa.int64()),
        "psi": pa.array([], pa.float64()),
    }
)


def psi_source_drift(
    sf_dir: str, combine_limit: int = 2_000_000
) -> pa.Table:
    """Population Stability Index of each source's ``n_chars``
    distribution against the whole corpus — the standard drift /
    mix-shift monitor a training-data pipeline runs per ingest batch
    (PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 action).

    Buckets are ``floor(log2(n_chars + 1))`` — deterministic on BOTH
    engines because log2 is exactly correct at powers of two (the
    only places the floor has a boundary), unlike ln(x)/ln(2) whose
    last-ulp error flips buckets. Proportions are Laplace-smoothed
    ``(c + 0.5) / (n + 0.5·B)`` over the CORPUS bucket set B, so
    sources missing a bucket contribute finite terms, mirrored
    exactly by the oracle's COALESCE(c, 0) cross join. The exchange
    is (source, bucket, count) partials — bounded by the categorical
    product, never rows; the final PSI fold is sources × ≤ ~40
    buckets on the driver (contract-bounded).
    ``psi_source_drift_grouped`` forces the Ray groupby exchange.
    """
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def cell_partial(batch: pa.Table) -> pa.Table:
        nc_col = batch.column("n_chars")
        # a null n_chars would survive to_numpy as NaN and hit an
        # undefined NaN->int64 floor cast (platform-dependent garbage
        # bucket) while the SQL oracle groups it into a NULL bucket —
        # refuse loudly instead of silently diverging (ADVICE r4)
        if nc_col.null_count:
            raise ValueError(
                "psi_source_drift: null n_chars violates the documents "
                "contract; fill or drop nulls upstream before bucketing"
            )
        nc = nc_col.to_numpy(zero_copy_only=False).astype(np.float64)
        if len(nc) and float(nc.min()) < 0:
            raise ValueError(
                "psi_source_drift: negative n_chars has no log2 bucket; "
                "clean the column upstream"
            )
        t = pa.Table.from_pydict(
            {
                "source": batch.column("source"),
                "bucket": pa.array(
                    np.floor(np.log2(nc + 1.0)).astype(np.int64)
                ),
                "f": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        return (
            t.group_by(["source", "bucket"]).aggregate([("f", "sum")])
            .rename_columns(["source", "bucket", "f"])
        )

    partials = ds.map_batches(
        cell_partial, batch_format="pyarrow"
    ).materialize()
    cells = _combine_partials(
        partials, ["source", "bucket"], ["f"], combine_limit
    )
    if cells is None:
        rows = [
            t
            for t in ray.get(
                partials.groupby(["source", "bucket"]).sum("f")
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        cells = pa.concat_tables(rows).rename_columns(
            ["source", "bucket", "sum(f)"]
        )
    if not cells.num_rows:
        return _PSI_EMPTY
    f = cells.column("sum(f)").to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    src_dict = pc.dictionary_encode(
        cells.column("source").combine_chunks()
    )
    s_codes = src_dict.indices.to_numpy(zero_copy_only=False)
    s_names = src_dict.dictionary.to_pylist()
    buckets, b_codes = np.unique(
        cells.column("bucket").to_numpy(zero_copy_only=False),
        return_inverse=True,
    )
    n_src, n_b = len(s_names), len(buckets)
    grid = np.zeros((n_src, n_b), np.float64)
    np.add.at(grid, (s_codes, b_codes), f)
    n_s = grid.sum(axis=1)
    ct = grid.sum(axis=0)
    nt = float(ct.sum())
    k = float(n_b)
    ps = (grid + 0.5) / (n_s[:, None] + 0.5 * k)
    pr = (ct[None, :] + 0.5) / (nt + 0.5 * k)
    psi = ((ps - pr) * np.log(ps / pr)).sum(axis=1)
    order = np.argsort(np.asarray(s_names, dtype=object), kind="stable")
    return pa.Table.from_pydict(
        {
            "source": pa.array(
                [s_names[i] for i in order], pa.string()
            ),
            "n_docs": pa.array(
                n_s[order].astype(np.int64), pa.int64()
            ),
            "psi": pa.array(np.round(psi[order], 6), pa.float64()),
        }
    )
