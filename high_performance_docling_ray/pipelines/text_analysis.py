"""Text-analysis pipelines over the ``documents`` table.

All single-pass ``map_batches`` transforms (no shuffle) except the
aggregations, which pre-aggregate per batch before the small groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..kernels.text_stats import (
    bpe_token_count,
    detect_language,
    md5_fingerprint,
    quality_features,
    quality_score,
    rolling_fingerprint,
    token_count,
)


def read_documents(sf_dir: str, columns=("doc_id", "text", "lang")) -> ray.data.Dataset:
    from .io import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=list(columns))


def token_counts(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_ws_tokens, n_bpe_tokens)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_ws_tokens": pa.array(
                    [token_count(t) for t in texts], pa.int64()
                ),
                "n_bpe_tokens": pa.array(
                    [bpe_token_count(t) for t in texts], pa.int64()
                ),
            }
        )

    return read_documents(sf_dir, ("doc_id", "text")).map_batches(
        f, batch_format="pyarrow"
    )


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, md5, rolling) content fingerprints."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "md5": pa.array([md5_fingerprint(t) for t in texts]),
                "rolling": pa.array(
                    [rolling_fingerprint(t) for t in texts], pa.uint64()
                ),
            }
        )

    return read_documents(sf_dir, ("doc_id", "text")).map_batches(
        f, batch_format="pyarrow"
    )


def language_id(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, lang, detected_lang, agrees)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        detected = [detect_language(t) for t in texts]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "detected_lang": pa.array(detected),
                "agrees": pa.array(
                    [d == l for d, l in zip(detected, langs)], pa.bool_()
                ),
            }
        )

    return read_documents(sf_dir).map_batches(f, batch_format="pyarrow")


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_chars, n_tokens, mean_word_len, punct_ratio,
    stopword_ratio, quality)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        feats = [quality_features(t) for t in texts]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array([int(x["n_chars"]) for x in feats], pa.int64()),
                "n_tokens": pa.array([int(x["n_tokens"]) for x in feats], pa.int64()),
                "mean_word_len": pa.array(
                    [round(x["mean_word_len"], 6) for x in feats], pa.float64()
                ),
                "punct_ratio": pa.array(
                    [round(x["punct_ratio"], 6) for x in feats], pa.float64()
                ),
                "stopword_ratio": pa.array(
                    [round(x["stopword_ratio"], 6) for x in feats], pa.float64()
                ),
                "quality": pa.array(
                    [quality_score(t) for t in texts], pa.float64()
                ),
            }
        )

    return read_documents(sf_dir, ("doc_id", "text")).map_batches(
        f, batch_format="pyarrow"
    )


def hash_sample(
    sf_dir: str, rate_permille: int = 100, columns=("doc_id", "lang")
) -> ray.data.Dataset:
    """DETERMINISTIC corpus sampling: keep a doc iff
    ``md5(doc_id) % 1000 < rate_permille``.

    The curation-grade sample — no RNG state, no coordination, stable
    across runs, block layouts and cluster sizes, and NESTED: a lower
    rate always selects a subset of a higher rate (same hash, so
    nested applications give min(rate), e.g. growing a 10% ablation to
    20% keeps every previously sampled doc). For an INDEPENDENT
    second sample, salt the hashed key instead. Pure map filter:
    streams at any scale. Hash = first 8 md5 bytes little-endian
    (== DuckDB ``md5_number_upper``) so the oracle reproduces it.
    """
    from ..kernels.sketch import hash64

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hv = hash64(ids)
        mask = (hv % np.uint64(1000)) < np.uint64(rate_permille)
        return batch.filter(pa.array(mask))

    return read_documents(sf_dir, columns).map_batches(
        keep, batch_format="pyarrow"
    )


def stratified_hash_sample(
    sf_dir: str,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    columns=("doc_id", "lang"),
) -> ray.data.Dataset:
    """Per-stratum deterministic sampling: each language keeps its own
    hash-threshold rate (e.g. downsample English, keep all low-resource
    languages) — the standard curation rebalance, with hash_sample's
    reproducibility and nesting per stratum."""
    from ..kernels.sketch import hash64

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        hv = hash64(ids) % np.uint64(1000)
        thresholds = np.fromiter(
            (rates_permille.get(l, default_permille) for l in langs),
            np.uint64,
            len(langs),
        )
        return batch.filter(pa.array(hv < thresholds))

    return read_documents(sf_dir, columns).map_batches(
        keep, batch_format="pyarrow"
    )


def sample_per_group(
    sf_dir: str, k: int = 3, columns=("doc_id", "lang")
) -> pa.Table:
    """DETERMINISTIC k-per-stratum sample: for each language, the k
    docs with the smallest ``hash64(doc_id)`` (ties by doc_id) — the
    fixed-size sibling of ``stratified_hash_sample``'s fixed-rate
    sample, with the same reproducibility and nesting (k'<k always
    selects a subset of k).

    Scale shape: each batch emits its own per-lang k-smallest rows (a
    combiner — at most k x #langs rows leave any block), one driver
    merge takes the global winners. No shuffle; partials are bounded
    by k x #langs x #blocks and #langs is small by construction (salt
    the stratum key otherwise).
    """
    from ..kernels.sketch import hash64

    def local_k(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        raw = batch.column("lang").to_pylist()
        # null langs form their own stratum (matches SQL PARTITION BY);
        # a (isnull, filled) key pair keeps lexsort comparable
        isnull = np.array([l is None for l in raw], dtype=bool)
        langs = np.asarray(
            ["" if l is None else l for l in raw], dtype=object
        )
        hv = hash64(ids)
        ids64 = np.asarray(ids, dtype=np.int64)
        order = np.lexsort((ids64, hv, langs, isnull))
        langs_s, null_s = langs[order], isnull[order]
        new_run = np.concatenate(
            (
                [True],
                (langs_s[1:] != langs_s[:-1]) | (null_s[1:] != null_s[:-1]),
            )
        )
        run_id = np.cumsum(new_run) - 1
        starts = np.nonzero(new_run)[0][run_id]
        pos = np.arange(len(langs_s)) - starts
        keep = order[pos < k]
        return batch.take(pa.array(np.sort(keep)))

    parts = [
        t
        for t in ray.get(
            read_documents(sf_dir, columns)
            .map_batches(local_k, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.Table.from_pydict(
            {"doc_id": pa.array([], pa.int64()),
             "lang": pa.array([], pa.string())}
        )
    merged = pa.concat_tables(parts)
    return local_k(merged).sort_by(
        [("lang", "ascending"), ("doc_id", "ascending")]
    )


def weighted_sample(sf_dir: str, k: int = 50) -> pa.Table:
    """Priority sampling (Duffield-Lund-Thorup 2007): a weight-
    proportional without-replacement sample of k docs. Each doc gets
    priority = weight / u with u = a doc-keyed uniform in (0, 1]; the
    k highest priorities ARE the sample (and the (k+1)th priority is
    the unbiased-estimator threshold). Weight = char length — the
    standard proxy when sampling corpora for inspection or ablation
    so long docs aren't under-represented.

    DETERMINISTIC: u derives from md5 (``hash64("ws:doc_id")`` ==
    ``md5_number_upper('ws:' || doc_id)``); both sides compute
    (double(h) + 1) / 2^64 with the same IEEE op order, so priorities
    are bit-identical pre-rounding and ranking needs no tolerance.
    Zero-weight docs are unsampleable (priority 0) and filtered.

    Scale shape: per-block top-k combiner (at most k rows leave any
    block), one tiny driver merge — the ``sample_per_group`` shape
    with a weighted key and no strata. No shuffle, no RNG state.
    """
    from ..kernels.sketch import hash64

    def local_k(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_chars = pc.fill_null(
            pc.utf8_length(batch.column("text")), 0
        ).to_numpy(zero_copy_only=False)
        hv = hash64([f"ws:{i}" for i in ids.tolist()])
        u = (hv.astype(np.float64) + 1.0) / 18446744073709551616.0
        prio = n_chars.astype(np.float64) / u
        ok = n_chars > 0
        order = np.lexsort((ids[ok], -prio[ok]))[:k]
        sel = np.nonzero(ok)[0][order]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[sel].astype(np.int64), pa.int64()),
                "weight": pa.array(n_chars[sel].astype(np.int64), pa.int64()),
                "priority": pa.array(prio[sel], pa.float64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            read_documents(sf_dir, ("doc_id", "text"))
            .map_batches(local_k, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    empty = pa.Table.from_pydict(
        {
            "doc_id": pa.array([], pa.int64()),
            "weight": pa.array([], pa.int64()),
            "priority": pa.array([], pa.float64()),
        }
    )
    if not parts:
        return empty
    merged = pa.concat_tables(parts)
    prio = merged.column("priority").to_numpy(zero_copy_only=False)
    ids = merged.column("doc_id").to_numpy(zero_copy_only=False)
    top = np.lexsort((ids, -prio))[:k]
    out = merged.take(pa.array(np.sort(top)))
    out = out.set_column(
        out.schema.get_field_index("priority"),
        "priority",
        pa.array(
            np.round(out.column("priority").to_numpy(zero_copy_only=False), 6),
            pa.float64(),
        ),
    )
    return out.sort_by([("doc_id", "ascending")])


def lang_stats(sf_dir: str):
    """Per-language doc count + mean n_chars: per-batch partial
    aggregation merged with one driver-side group_by (Ray groupby
    shuffle only as the over-budget fallback). Returns a pa.Table on
    the combine path, a Dataset on the shuffle path."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = (
            batch.group_by("lang")
            .aggregate([("n_chars", "sum"), ("n_chars", "count")])
            .rename_columns(["lang", "sum_chars", "n_docs"])
        )
        _ = pc
        return out

    from .io import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    partials = ds.map_batches(partial, batch_format="pyarrow")

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.column("sum(n_docs)")
        s = batch.column("sum(sum_chars)")
        avg = pc.divide(pc.cast(s, pa.float64()), pc.cast(n, pa.float64()))
        return pa.Table.from_pydict(
            {
                "lang": batch.column("lang"),
                "n_docs": pc.cast(n, pa.int64()),
                "avg_chars": pc.round(avg, 6),
            }
        )

    from .relational import _combine_partials

    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    tbl = _combine_partials(partials, ["lang"], ["sum_chars", "n_docs"])
    if tbl is None:  # over the combine budget: Ray groupby shuffle
        combined = partials.groupby("lang").sum(["sum_chars", "n_docs"])
        return combined.map_batches(finalize, batch_format="pyarrow")
    return finalize(tbl)


def _per_type_user_registers(sf_dir: str, p: int) -> dict:
    """Merged per-event_type HLL registers over user_id — the shared
    build for ``distinct_users_hll`` and the sketch-algebra overlap:
    each batch emits one 2^p-byte register blob per key, partials merge
    with elementwise max on the driver (associative/commutative, so
    block order cannot change the answer)."""
    import numpy as np
    import pyarrow as pa

    from ..kernels import sketch

    from .io import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        types = batch.column("event_type").to_pylist()
        users = batch.column("user_id").to_pylist()
        by_type: dict[str, list] = {}
        for t, u in zip(types, users):
            by_type.setdefault(t, []).append(u)
        out_t, out_r = [], []
        for t, vals in by_type.items():
            regs = sketch.add_hashed(
                sketch.empty_registers(p), sketch.hash64(vals)
            )
            out_t.append(t)
            out_r.append(regs.tobytes())
        return pa.Table.from_pydict(
            {"event_type": pa.array(out_t, pa.string()),
             "registers": pa.array(out_r, pa.binary())}
        )

    merged: dict[str, "np.ndarray"] = {}
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        regs = np.frombuffer(row["registers"], dtype=np.uint8)
        key = row["event_type"]
        merged[key] = (
            sketch.merge(merged[key], regs) if key in merged else regs.copy()
        )
    return merged


def distinct_users_hll(sf_dir: str, p: int = 12):
    """Approximate distinct users per event_type via HyperLogLog.

    The mergeable-sketch pattern for corpus-scale distinct counts: the
    shuffle a groupby-distinct would need never happens (see
    ``_per_type_user_registers``). Returns (event_type,
    approx_distinct_users); ~1.6% standard error at p=12.
    """
    import pyarrow as pa

    from ..kernels import sketch

    merged = _per_type_user_registers(sf_dir, p)
    out_t = sorted(merged)
    return pa.Table.from_pydict(
        {
            "event_type": pa.array(out_t, pa.string()),
            "approx_distinct_users": pa.array(
                [int(round(sketch.estimate(merged[t]))) for t in out_t],
                pa.int64(),
            ),
        }
    )


def hll_user_overlap(sf_dir: str, p: int = 12):
    """Sketch ALGEBRA: approximate distinct-user OVERLAP between every
    pair of event types by inclusion-exclusion over the same merged
    HLL registers — union is native to HLL (elementwise register max),
    so ``|A ∩ B| ≈ est(A) + est(B) - est(A ∪ B)`` costs three
    estimator evaluations and ZERO additional passes over the data.
    This is the corpus-overlap primitive (audience overlap, shard/
    source distinct-key overlap) at any scale: the registers are the
    only state, one 4 KiB blob per key. The raw (un-rounded) estimates
    combine before the single final round, mirrored bit-for-bit by the
    SQL oracle's register rebuild.
    """
    import pyarrow as pa

    from ..kernels import sketch

    merged = _per_type_user_registers(sf_dir, p)
    types = sorted(merged)
    rows = {"type_a": [], "type_b": [], "approx_a": [], "approx_b": [],
            "approx_union": [], "approx_overlap": []}
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            e_a = sketch.estimate(merged[ta])
            e_b = sketch.estimate(merged[tb])
            e_u = sketch.estimate(sketch.merge(merged[ta], merged[tb]))
            rows["type_a"].append(ta)
            rows["type_b"].append(tb)
            rows["approx_a"].append(int(round(e_a)))
            rows["approx_b"].append(int(round(e_b)))
            rows["approx_union"].append(int(round(e_u)))
            rows["approx_overlap"].append(int(round(e_a + e_b - e_u)))
    return pa.Table.from_pydict(
        {"type_a": pa.array(rows["type_a"], pa.string()),
         "type_b": pa.array(rows["type_b"], pa.string()),
         "approx_a": pa.array(rows["approx_a"], pa.int64()),
         "approx_b": pa.array(rows["approx_b"], pa.int64()),
         "approx_union": pa.array(rows["approx_union"], pa.int64()),
         "approx_overlap": pa.array(rows["approx_overlap"], pa.int64())}
    )


def distinct_users_hll_hourly(sf_dir: str, p: int = 12) -> ray.data.Dataset:
    """Approximate distinct users PER HOUR — the fully distributed
    sibling of ``distinct_users_hll``: instead of a driver-side merge
    dict (fine for a handful of event types, wrong for an unbounded
    group domain), each batch emits one 2^p-byte register blob per
    hour and a ``groupby(hour).map_groups`` merges them with one
    elementwise-max reduce WHERE THE GROUP LIVES. The exchange carries
    #blocks x #hours x 4 KiB register rows — never a user_id — and
    group count can grow without the driver seeing any of it.

    Returns ``(hour_bucket, approx_distinct_users)`` with hour_bucket
    = epoch hours (BIGINT both here and in the SQL oracle).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..kernels import sketch
    from .io import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    us_per_hour = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        hours = (
            pc.cast(batch.column("ts"), pa.int64())
            .to_numpy(zero_copy_only=False)
            // us_per_hour
        )
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        out_h, out_r = [], []
        order = np.argsort(hours, kind="stable")
        hours, users = hours[order], users[order]
        bounds = np.flatnonzero(np.r_[True, hours[1:] != hours[:-1]])
        for i, start in enumerate(bounds):
            end = bounds[i + 1] if i + 1 < len(bounds) else len(hours)
            regs = sketch.add_hashed(
                sketch.empty_registers(p),
                sketch.hash64(users[start:end].tolist()),
            )
            out_h.append(int(hours[start]))
            out_r.append(regs.tobytes())
        return pa.Table.from_pydict(
            {
                "hour_bucket": pa.array(out_h, pa.int64()),
                "registers": pa.array(out_r, pa.binary()),
            }
        )

    def merge_estimate(group: pa.Table) -> pa.Table:
        blobs = group.column("registers").to_pylist()
        regs = np.frombuffer(blobs[0], dtype=np.uint8).copy()
        for b in blobs[1:]:
            regs = sketch.merge(regs, np.frombuffer(b, dtype=np.uint8))
        return pa.Table.from_pydict(
            {
                "hour_bucket": group.column("hour_bucket").slice(0, 1),
                "approx_distinct_users": pa.array(
                    [int(round(sketch.estimate(regs)))], pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hour_bucket")
        .map_groups(merge_estimate, batch_format="pyarrow")
    )


def source_composition(sf_dir: str) -> ray.data.Dataset:
    """Per-source corpus composition — the mixing report a curator
    reads before setting domain weights: ``(source, n_docs,
    total_chars, mean_chars, lang_entropy)`` with Shannon entropy (in
    nats) over the source's language distribution.

    Reads ONLY (source, lang, n_chars) — document text never leaves
    storage. Per-batch (source, lang) combiner -> one composite-keyed
    groupby over source x lang rows (bounded by the domain product,
    not the corpus) -> per-source entropy fold. Null source/lang form
    their own strata via a sentinel tokens cannot contain.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .io import read_parquet_clean

    sep, nul = "\x1f", "\x00"
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.fill_null(batch.column("source"), nul),
            pc.fill_null(batch.column("lang"), nul),
            sep,
        )
        t = pa.Table.from_pydict(
            {"key": key, "n_chars": batch.column("n_chars")}
        )
        agg = t.group_by("key").aggregate(
            [("n_chars", "sum"), ("n_chars", "count")]
        )
        return agg.rename_columns(["key", "ch", "n"])

    from ray.data.aggregate import Sum

    summed = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("ch"), Sum("n"))
    )

    def split_source(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("key"), sep)
        return pa.Table.from_pydict(
            {
                "source": pc.list_element(parts, 0),
                "ch": pc.cast(batch.column("sum(ch)"), pa.int64()),
                "n": pc.cast(batch.column("sum(n)"), pa.int64()),
            }
        )

    def entropy_fold(group: pa.Table) -> pa.Table:
        n = group.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        ch = group.column("ch").to_numpy(zero_copy_only=False)
        tot = n.sum()
        p = n / tot
        src = group.column("source")[0].as_py()
        return pa.Table.from_pydict(
            {
                "source": pa.array(
                    [None if src == nul else src], pa.string()
                ),
                "n_docs": pa.array([int(tot)], pa.int64()),
                "total_chars": pa.array([int(ch.sum())], pa.int64()),
                "mean_chars": pa.array(
                    [round(float(ch.sum()) / tot, 6)], pa.float64()
                ),
                "lang_entropy": pa.array(
                    [round(float(-(p * np.log(p)).sum()), 6)], pa.float64()
                ),
            }
        )

    return (
        summed.map_batches(split_source, batch_format="pyarrow")
        .groupby("source")
        .map_groups(entropy_fold, batch_format="pyarrow")
    )


def mixture_sample(sf_dir: str, budget_den: int = 2) -> ray.data.Dataset:
    """Data-mixing sampler (the Pile / DoReMi reweighting shape): pick
    a deterministic sub-corpus whose TOKEN mass is split uniformly
    across sources, targeting ``total_tokens // budget_den`` tokens
    overall. Per-source acceptance is an INTEGER micro-threshold —
    accept a doc iff ``hash64(doc_id) % 1e6 < p_micro[source]`` where
    ``p_micro = min(1e6, floor(1e6 * T_s / n_s))`` and
    ``T_s = total // (budget_den * n_sources)`` — so the sample is
    deterministic, nested in the budget (same hash as ``hash_sample``),
    and reproducible in SQL with zero float-comparison risk.

    Two stages: a bounded per-source token-count aggregate (the
    ``source_composition`` exchange shape, O(sources) rows), then a
    pure accept map with the tiny threshold table in the closure.
    Returns every doc: (doc_id, source, n_tok, p_micro, sampled).
    """
    from ..kernels.sketch import hash64
    from .corpus_clean import _tokenize

    docs = read_documents(sf_dir, ("doc_id", "text", "source"))

    def count_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        _, _, n_tok = _tokenize(batch.column("text"))
        src = pc.fill_null(batch.column("source"), "").to_numpy(
            zero_copy_only=False
        )
        import pandas as pd

        g = (
            pd.DataFrame({"source": src, "n": n_tok})
            .groupby("source", sort=False)["n"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pydict(
            {
                "source": pa.array(g["source"].tolist(), pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    counts = (
        docs.map_batches(count_partial, batch_format="pyarrow")
        .groupby("source")
        .sum("n")
        .take_all()  # bounded: one row per source
    )
    n_s = {r["source"]: int(r["sum(n)"]) for r in counts}
    total = sum(n_s.values())
    t_s = total // (budget_den * max(1, len(n_s)))
    p_micro = {
        s: (
            1_000_000
            if n == 0
            else min(1_000_000, int(np.floor(1_000_000.0 * t_s / n)))
        )
        for s, n in n_s.items()
    }

    def accept(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import pyarrow.compute as pc

        _, _, n_tok = _tokenize(batch.column("text"))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = pc.fill_null(batch.column("source"), "").to_numpy(
            zero_copy_only=False
        )
        p = (
            pd.Series(src, dtype=object)
            .map(p_micro)
            .to_numpy(np.int64)
        )
        hv = hash64(ids) % np.uint64(1_000_000)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "source": pa.array(src.tolist(), pa.string()),
                "n_tok": pa.array(n_tok, pa.int64()),
                "p_micro": pa.array(p, pa.int64()),
                "sampled": pa.array(hv.astype(np.int64) < p, pa.bool_()),
            }
        )

    return docs.map_batches(accept, batch_format="pyarrow")


def chunk_documents(
    sf_dir: str, size: int = 128, stride: int = 96
) -> ray.data.Dataset:
    """Sliding-window chunking for embedding/retrieval prep: each doc
    with n > 0 tokens yields K = 1 + ceil((n - size) / stride) chunks
    (K = 1 when n <= size), chunk k covering tokens
    [k*stride, min(k*stride + size, n)) — adjacent chunks overlap by
    ``size - stride`` tokens and the tail is always covered. Pure map,
    fully vectorized: chunk token index arrays are built with one
    repeat/arange pass, gathered from the flat token array, and
    re-joined per chunk with one ``binary_join``. Integer chunk-count
    math ((n - size + stride - 1) // stride) is mirrored exactly in
    SQL. Returns (doc_id, chunk_ord, start_tok, n_tok, chunk_text).
    """
    from .corpus_clean import _tokenize

    docs = read_documents(sf_dir, ("doc_id", "text"))

    def chunk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, _, n_tok = _tokenize(batch.column("text"))
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc_offs = np.concatenate(([0], np.cumsum(n_tok)))[:-1]
        k_per_doc = np.where(
            n_tok == 0,
            0,
            1 + np.maximum(0, (n_tok - size + stride - 1) // stride),
        ).astype(np.int64)
        if int(k_per_doc.sum()) == 0:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "chunk_ord": pa.array([], pa.int64()),
                    "start_tok": pa.array([], pa.int64()),
                    "n_tok": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        rows = np.repeat(np.arange(len(n_tok), dtype=np.int64), k_per_doc)
        # chunk ordinal within each doc: global arange minus each doc's
        # first chunk row index
        firsts = np.concatenate(([0], np.cumsum(k_per_doc)))[:-1]
        ords = np.arange(len(rows), dtype=np.int64) - firsts[rows]
        starts = ords * stride
        lens = np.minimum(size, n_tok[rows] - starts)
        # gather token indices for every chunk: for chunk c the tokens
        # are doc_offs[row] + starts[c] .. + lens[c]
        chunk_offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        total = int(chunk_offs[-1])
        # index = base[c] + (i - chunk_offs[c]) for i in the chunk span
        base = doc_offs[rows] + starts
        idx = np.arange(total, dtype=np.int64) - np.repeat(
            chunk_offs[:-1], lens
        ) + np.repeat(base, lens)
        taken = flat.take(pa.array(idx))
        text = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(chunk_offs.astype(np.int32), pa.int32()), taken
            ),
            " ",
        )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids[rows], pa.int64()),
                "chunk_ord": pa.array(ords, pa.int64()),
                "start_tok": pa.array(starts, pa.int64()),
                "n_tok": pa.array(lens.astype(np.int64), pa.int64()),
                "chunk_text": text,
            }
        )

    return docs.map_batches(chunk, batch_format="pyarrow")


def normalize_text(sf_dir: str) -> ray.data.Dataset:
    """Unicode text normalization — the first map every web-scale text
    pipeline runs before tokenizing (cf. the reference's sanitize_text
    byte-identity core, fork/docling shim textnorm; this is the
    corpus-level sibling over the documents table).

    The corpus text is clean ASCII, so deterministic unicode mess is
    planted per doc_id residue (the url_curation pattern — the SQL
    oracle mirrors the exact planted construction, then applies the
    same normalization chain; DuckDB's nfc_normalize and pyarrow's
    utf8_normalize both implement standard Unicode NFC, and both
    regexp engines are RE2, so every step agrees byte-for-byte):

    - ``%23==3``  decomposed e + U+0301  -> NFC composes to ``é``
    - ``%23==10`` decomposed A + U+030A  -> NFC composes to ``Å``
    - ``%29==11`` BEL control char       -> stripped
    - ``%13==5``  NBSP                   -> mapped to space
    - ``%19==2``  leading/multi/trailing spaces -> collapsed + trimmed

    Chain (fixed order, both sides): NFC -> NBSP->space -> strip
    C0/DEL controls -> collapse ``\\s+`` to one space -> trim.
    Pure vectorized map: no shuffle, scale-free at 100 TB.
    """
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        suf = np.full(len(ids), "", dtype=object)
        suf[ids % 23 == 3] = " nfc Cafe\u0301"
        suf = np.where(ids % 23 == 10, suf + " ring A\u030A", suf)
        suf = np.where(ids % 29 == 11, suf + " ctl x\x07y", suf)
        suf = np.where(ids % 13 == 5, suf + " nbsp p\u00a0q", suf)
        suf = np.where(ids % 19 == 2, suf + "  wide   gaps  ", suf)
        planted = pc.binary_join_element_wise(
            batch.column("text"), pa.array(list(suf), pa.string()), ""
        )
        # replace_with_mask needs flat arrays, not ChunkedArray
        if isinstance(planted, pa.ChunkedArray):
            planted = planted.combine_chunks()
        # NFC: this pyarrow build's utf8_normalize(form="NFC") does NOT
        # compose (NFD of a composed char works, NFC of the decomposed
        # sequence returns it unchanged — verified on pyarrow 16.1), so
        # composition runs through stdlib unicodedata, gated on an RE2
        # match so only mark-bearing strings pay the Python loop; the
        # gate covers the canonical combining-mark blocks plus the
        # compatibility singletons (OHM/KELVIN/ANGSTROM) that NFC maps.
        m = pc.match_substring_regex(
            planted,
            "[\u0300-\u036f\u1ab0-\u1aff\u1dc0-\u1dff"
            "\u20d0-\u20ff\ufe20-\ufe2f\u2126\u212a\u212b]",
        )
        x = planted
        midx = np.flatnonzero(m.to_numpy(zero_copy_only=False))
        if midx.size:
            import unicodedata

            sub = x.take(pa.array(midx))
            fixed = pa.array(
                [unicodedata.normalize("NFC", s) for s in sub.to_pylist()],
                pa.string(),
            )
            x = pc.replace_with_mask(x, m, fixed)
        x = pc.replace_substring(x, pattern="\u00a0", replacement=" ")
        x = pc.replace_substring_regex(
            x,
            pattern=r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]",
            replacement="",
        )
        x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
        x = pc.utf8_trim_whitespace(x)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "text_norm": x,
                "n_before": pc.utf8_length(planted),
                "n_after": pc.utf8_length(x),
                "changed": pc.not_equal(planted, x),
            }
        )

    return read_documents(sf_dir, ("doc_id", "text")).map_batches(
        f, batch_format="pyarrow"
    )


def corpus_report(sf_dir: str) -> "pa.Table":
    """Dataset datasheet — the one-page summary a curator publishes
    next to a released corpus: long-format ``(section, stratum,
    metric, value)`` rows covering global counts, the exact-duplicate
    fraction, and per-language / per-source composition.

    Three scale-safe shapes composed in one result:

    - ``global`` / ``lang`` / ``source`` counts: per-batch combiners
      over (lang, source, n_chars) — text never read for these — then
      one composite-keyed groupby bounded by the strata domain.
    - ``dup_doc_frac``: md5 ``hash64(text)`` per batch, one KEY-ONLY
      ``groupby(h).count()`` exchange (the exact_dedup shape), docs in
      count>1 groups summed by a streaming aggregate. The hash is the
      first 8 md5 bytes == DuckDB ``md5_number_upper``, so the oracle
      groups bit-identically.

    Returns a small driver-side table (O(strata) rows); every input
    pass streams.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from ..kernels.sketch import hash64
    from .io import read_parquet_clean

    nul = "\x00"

    # -- strata counts (no text) ------------------------------------
    meta = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["lang", "source", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        langs = pc.fill_null(batch.column("lang"), nul)
        srcs = pc.fill_null(batch.column("source"), nul)
        t = pa.Table.from_pydict(
            {"lang": langs, "source": srcs, "ch": batch.column("n_chars")}
        )
        agg = t.group_by(["lang", "source"]).aggregate(
            [("ch", "sum"), ("ch", "count")]
        )
        return agg.rename_columns(["lang", "source", "ch", "n"])

    parts = (
        meta.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("ch", alias_name="ch"), Sum("n", alias_name="n"))
        .to_pandas()
    )

    # -- exact-dup fraction (key-only exchange over text hashes) -----
    # the corpus has no exact-dup texts, so pairs are planted per
    # doc_id residue (the clean_corpus construction: docs with
    # doc_id%41 in {7,8} share one text per 41-block) and the oracle
    # mirrors the same CASE — the metric exercises a real dup mass
    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def h(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dup = np.isin(ids % 41, (7, 8))
        planted = pc.if_else(
            pa.array(dup),
            pc.binary_join_element_wise(
                "dup page body ",
                pa.array((ids // 41).astype("U"), pa.string()),
                "",
            ),
            batch.column("text"),
        )
        # int64 bit-reinterpret: Ray's groupby key path converts
        # through Python ints and overflows on uint64 > 2^63; the
        # view is bijective so group multiplicities are unchanged
        hv = hash64(planted.to_pylist()).view(np.int64)
        return pa.Table.from_pydict({"h": pa.array(hv, pa.int64())})

    counts = (
        docs.map_batches(h, batch_format="pyarrow")
        .groupby("h")
        .count()
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "dup": pa.array(
                        [
                            pc.sum(
                                pc.if_else(
                                    pc.greater(t.column("count()"), 1),
                                    t.column("count()"),
                                    pa.scalar(0, t.column("count()").type),
                                )
                            ).as_py()
                            or 0
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .sum("dup")
    )
    n_dup = int(counts)

    # -- assemble the long-format report ------------------------------
    total_n = int(parts["n"].sum())
    total_ch = int(parts["ch"].sum())
    rows: list[tuple[str, str, str, float]] = [
        ("global", "ALL", "docs", float(total_n)),
        ("global", "ALL", "chars", float(total_ch)),
        ("global", "ALL", "dup_doc_frac", round(n_dup / total_n, 6)),
    ]
    for key, grp in (("lang", parts.groupby("lang")),
                     ("source", parts.groupby("source"))):
        for stratum, g in grp:
            s = "" if stratum == nul else str(stratum)
            n, ch = int(g["n"].sum()), int(g["ch"].sum())
            rows.append((key, s, "docs", float(n)))
            rows.append((key, s, "mean_chars", round(ch / n, 6)))
    return pa.Table.from_pydict(
        {
            "section": pa.array([r[0] for r in rows], pa.string()),
            "stratum": pa.array([r[1] for r in rows], pa.string()),
            "metric": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def source_divergence(sf_dir: str) -> pa.Table:
    """Per-source Jensen-Shannon divergence (nats) between the
    source's unigram distribution P_s and the whole-corpus
    distribution Q — the domain-shift report a curator reads next to
    ``source_composition`` before setting mixture weights. Returns
    ``(source, n_tokens, vocab, jsd)``.

    Scale shape: ONE corpus pass emits per-batch-combined
    (token, source, cnt) partials; that distinct-domain dataset
    (vocab x sources, far smaller than the corpus) is materialized
    once and reused for (a) the per-source token totals — per-batch
    combine -> tiny driver fold, no exchange — and (b) the single
    token-bucketed exchange where each bucket group computes exact
    per-(token, source) counts and folds them into per-source partial
    JS terms. Tokens absent from a source need no rows: their entire
    KL(Q||M) contribution collapses to ``(1 - sum_{t in V_s} q) ln 2``
    because m = q/2 there, so the exchange never densifies the
    (token x source) matrix. Final fold is sources x buckets rows on
    the driver.
    """
    import pyarrow.compute as pc

    from ..kernels.sketch import hash64_strings
    from .corpus_clean import _tokenize
    from .joins import default_num_buckets

    docs = read_documents(sf_dir, ("doc_id", "source", "text"))
    num_parts = default_num_buckets()

    def tf_partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = _tokenize(batch.column("text"))
        if len(flat) == 0:
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array([], pa.int32()),
                    "token": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        src = pc.fill_null(batch.column("source"), "").to_numpy(
            zero_copy_only=False
        )
        enc = flat.dictionary_encode()
        tcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        senc = pa.array(src[doc_idx]).dictionary_encode()
        scode = senc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # exact within-batch combine per (token, source)
        packed = tcode * len(senc.dictionary) + scode
        uniq, cnt = np.unique(packed, return_counts=True)
        ut = (uniq // len(senc.dictionary)).astype(np.int64)
        us = (uniq % len(senc.dictionary)).astype(np.int64)
        tok = enc.dictionary.take(pa.array(ut))
        h = hash64_strings(tok)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(
                    (h % np.uint64(num_parts)).astype(np.int32), pa.int32()
                ),
                "token": tok,
                "source": senc.dictionary.take(pa.array(us)),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    tf = docs.map_batches(tf_partial, batch_format="pyarrow").materialize()

    # per-source token totals: per-batch combine -> tiny driver fold
    def totals_partial(batch: pa.Table) -> pa.Table:
        agg = (
            pa.Table.from_pydict(
                {"source": batch.column("source"), "cnt": batch.column("cnt")}
            )
            .group_by("source")
            .aggregate([("cnt", "sum")])
        )
        return agg.rename_columns(["source", "n"])

    n_s: dict[str, int] = {}
    for row in tf.map_batches(
        totals_partial, batch_format="pyarrow"
    ).take_all():
        n_s[row["source"]] = n_s.get(row["source"], 0) + int(row["n"])
    n_total = sum(n_s.values())
    if n_total == 0:
        return pa.Table.from_pydict(
            {
                "source": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "vocab": pa.array([], pa.int64()),
                "jsd": pa.array([], pa.float64()),
            }
        )

    def bucket_terms(group: pa.Table) -> pa.Table:
        tok = group.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        enc = tok.dictionary_encode()
        tcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        src = group.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        senc = src.dictionary_encode()
        scode = senc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        n_src = len(senc.dictionary)
        # exact (token, source) counts across partial rows
        packed = tcode * n_src + scode
        order = np.argsort(packed, kind="stable")
        packed, cnt_o = packed[order], cnt[order]
        first = np.flatnonzero(np.r_[True, packed[1:] != packed[:-1]])
        cnt_ts = np.add.reduceat(cnt_o.astype(np.int64), first)
        ut = (packed[first] // n_src).astype(np.int64)
        us = (packed[first] % n_src).astype(np.int64)
        qcnt = np.bincount(
            ut, weights=cnt_ts, minlength=len(enc.dictionary)
        ).astype(np.int64)
        src_names = np.asarray(senc.dictionary.to_pylist(), object)
        ns_arr = np.array([n_s[s] for s in src_names], np.float64)
        p = cnt_ts / ns_arr[us]
        q = qcnt[ut] / float(n_total)
        term_p = p * np.log(2.0 * p / (p + q))
        term_q = q * np.log(2.0 * q / (p + q))
        # local per-source fold: sources x 1 rows per bucket
        sum_p = np.bincount(us, weights=term_p, minlength=n_src)
        sum_q = np.bincount(us, weights=term_q, minlength=n_src)
        qmass = np.bincount(us, weights=q, minlength=n_src)
        voc = np.bincount(us, minlength=n_src).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "source": senc.dictionary,
                "sum_p": pa.array(sum_p, pa.float64()),
                "sum_q": pa.array(sum_q, pa.float64()),
                "qmass": pa.array(qmass, pa.float64()),
                "vocab": pa.array(voc, pa.int64()),
            }
        )

    parts = tf.groupby("bucket").map_groups(
        bucket_terms, batch_format="pyarrow"
    )
    # driver fold: sources x buckets rows
    acc: dict[str, list[float]] = {}
    for row in parts.take_all():
        a = acc.setdefault(row["source"], [0.0, 0.0, 0.0, 0])
        a[0] += row["sum_p"]
        a[1] += row["sum_q"]
        a[2] += row["qmass"]
        a[3] += row["vocab"]
    srcs = sorted(acc)
    jsd = [
        round(
            0.5 * acc[s][0]
            + 0.5 * (acc[s][1] + (1.0 - acc[s][2]) * np.log(2.0)),
            6,
        )
        for s in srcs
    ]
    return pa.Table.from_pydict(
        {
            "source": pa.array(srcs, pa.string()),
            "n_tokens": pa.array([n_s[s] for s in srcs], pa.int64()),
            "vocab": pa.array([acc[s][3] for s in srcs], pa.int64()),
            "jsd": pa.array(jsd, pa.float64()),
        }
    )


def winnowing_fingerprints(
    sf_dir: str, k: int = 4, w: int = 8
) -> ray.data.Dataset:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS scheme): hash every word ``k``-gram, slide a ``w``-hash
    window, and select each window's minimum (RIGHTMOST position on
    ties — the paper's rule, which makes selections consistent across
    overlapping windows); the distinct selected (position, hash) pairs
    are the doc's fingerprints. Guarantees every length-``w`` gram run
    contributes at least one fingerprint, unlike a plain mod-p sampler.
    Returns rows ``(doc_id, pos, h)``; docs shorter than ``k`` tokens
    emit none, docs with fewer than ``w`` grams emit their single
    whole-doc minimum.

    Pure map at any scale (a doc's grams never straddle batches); the
    window minimum is one vectorized ``sliding_window_view`` pass with
    a reversed argmin for the rightmost-tie rule. Hashes are the md5
    ``hash64`` DuckDB rebuilds as ``md5_number_upper``, so the oracle
    reproduces every selected pair exactly.
    """
    import pyarrow.compute as pc

    from ..kernels.sketch import hash64_strings
    from .corpus_clean import _tokenize

    docs = read_documents(sf_dir, ("doc_id", "text"))

    def empty() -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                "h": pa.array([], pa.uint64()),
            }
        )

    def fp(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = _tokenize(batch.column("text"))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(flat)
        if n < k:
            return empty()
        valid = doc_idx[: n - k + 1] == doc_idx[k - 1 :]
        starts = np.flatnonzero(valid)
        if len(starts) == 0:
            return empty()
        parts = [flat.take(pa.array(starts + d)) for d in range(k)]
        grams = pc.binary_join_element_wise(*parts, " ")
        h = hash64_strings(grams)
        gdoc = doc_idx[starts]
        first = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
        counts = np.diff(np.r_[first, len(gdoc)])
        doc_start = np.repeat(first, counts)
        pos = np.arange(len(gdoc), dtype=np.int64) - doc_start
        m_of = np.repeat(counts, counts)  # grams in this gram's doc
        selected = []
        if len(h) >= w:
            from numpy.lib.stride_tricks import sliding_window_view

            W = sliding_window_view(h, w)
            am = np.argmin(W[:, ::-1], axis=1)
            sel = np.arange(len(W), dtype=np.int64) + (w - 1 - am)
            full = pos[: len(W)] <= (m_of[: len(W)] - w)
            selected.append(sel[full])
        # docs with fewer than w grams: one whole-doc minimum
        small = np.flatnonzero(counts < w)
        for gi in small:
            s, e = first[gi], first[gi] + counts[gi]
            hh = h[s:e]
            selected.append(
                np.array(
                    [s + len(hh) - 1 - int(np.argmin(hh[::-1]))], np.int64
                )
            )
        if not selected:
            return empty()
        sel = np.unique(np.concatenate(selected))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[gdoc[sel]], pa.int64()),
                "pos": pa.array(pos[sel], pa.int64()),
                "h": pa.array(h[sel], pa.uint64()),
            }
        )

    return docs.map_batches(fp, batch_format="pyarrow")


def winnowing_overlap_pairs(
    sf_dir: str, min_shared: int = 2, max_df: int = 64
) -> ray.data.Dataset:
    """MOSS-style overlap detection over winnowing fingerprints: doc
    pairs sharing >= ``min_shared`` distinct selected hashes, after
    dropping fingerprints selected by more than ``max_df`` docs (the
    paper's rule — ubiquitous fingerprints are boilerplate, and the
    cap also bounds the per-hash pair blowup to max_df^2 instead of
    letting one hot fingerprint emit corpus^2 pairs). Returns
    ``(doc_a, doc_b, shared)``.

    Scale shape: per-batch DISTINCT (h, doc) rows (a doc never
    straddles batches) -> ONE hash-bucketed exchange of key-only rows
    -> within each bucket group: vectorized per-hash df filter + pair
    emission + local pair-count combine -> one pair-keyed groupby sum.
    Payload text never shuffles; the exchange is bounded by the
    fingerprint domain, ~2/(w+1) of the gram count.
    """
    import pyarrow.compute as pc

    from .joins import default_num_buckets, int_key_buckets

    fps = winnowing_fingerprints(sf_dir)
    num_parts = default_num_buckets()

    def key_rows(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if len(d) and (d.min() < 0 or d.max() >= (1 << 31)):
            raise ValueError(
                "winnowing_overlap_pairs packs (doc_a, doc_b) into one "
                "int64; doc_id must fit in 31 bits — use a string pair "
                "key past that"
            )
        h = batch.column("h").to_numpy(zero_copy_only=False)
        # distinct (h, doc) within batch == globally distinct
        key = np.unique(np.stack([h, d.astype(np.uint64)], axis=1), axis=0)
        hs = np.ascontiguousarray(key[:, 0])
        return pa.Table.from_pydict(
            {
                "h": pa.array(hs, pa.uint64()),
                "doc_id": pa.array(key[:, 1].astype(np.int64), pa.int64()),
                "bucket": pa.array(
                    int_key_buckets(hs.view(np.int64), num_parts)
                ),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, h))
        h, d = h[order], d[order]
        first = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        counts = np.diff(np.r_[first, len(h)])
        ok = (counts >= 2) & (counts <= max_df)
        sizes = counts[ok]
        if not len(sizes):
            return pa.Table.from_pydict(
                {
                    "pk": pa.array([], pa.int64()),
                    "shared": pa.array([], pa.int64()),
                    "pkb": pa.array([], pa.int32()),
                }
            )
        # vectorized per-run pair emission (repeat/arange product,
        # i < j mask): work = sum c^2 <= max_df * sum pairs, no
        # Python loop over hot hashes
        starts = first[ok]
        c2 = sizes * sizes
        run_id = np.repeat(np.arange(len(sizes)), c2)
        base = np.repeat(np.cumsum(c2) - c2, c2)
        loc = np.arange(int(c2.sum()), dtype=np.int64) - base
        c_of = sizes[run_id]
        ii = loc // c_of
        jj = loc % c_of
        m = ii < jj
        gi = starts[run_id[m]] + ii[m]
        gj = starts[run_id[m]] + jj[m]
        # docs sorted asc within a run, so d[gi] < d[gj]
        pk = d[gi].astype(np.int64) * (1 << 32) + d[gj]
        uniq, cnt = np.unique(pk, return_counts=True)
        return pa.Table.from_pydict(
            {
                "pk": pa.array(uniq, pa.int64()),
                "shared": pa.array(cnt.astype(np.int64), pa.int64()),
                "pkb": pa.array(int_key_buckets(uniq, num_parts)),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "pk" not in group.column_names:
            # Ray groupby can hand a 0-row 0-COLUMN block downstream
            return pa.Table.from_pydict(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "shared": pa.array([], pa.int64()),
                }
            )
        pk = group.column("pk").to_numpy(zero_copy_only=False)
        sh = group.column("shared").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(pk, return_inverse=True)
        tot = np.bincount(inv, weights=sh).astype(np.int64)
        keep = tot >= min_shared
        pk, tot = uniq[keep], tot[keep]
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(pk >> 32, pa.int64()),
                "doc_b": pa.array(pk & ((1 << 32) - 1), pa.int64()),
                "shared": pa.array(tot, pa.int64()),
            }
        )

    # the pair-count fold is a BUCKETED map_groups (128-value key):
    # a groupby over millions of distinct pair keys pays the sort
    # shuffle's per-key cost; a bucket key does one np.unique fold
    # per bucket instead (the session-4 pagerank/keep-best pattern)
    return (
        fps.map_batches(key_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby("pkb")
        .map_groups(finish, batch_format="pyarrow")
    )


def quality_threshold_filter(
    sf_dir: str, q: float = 0.9, distinct_limit: int = 2_000_000
) -> ray.data.Dataset:
    """Dynamic corpus-relative filtering: keep docs whose quality
    score is at or above the corpus q-quantile — the two-pass shape
    every "top decile of the crawl" curation rule needs, because the
    threshold is a property OF the corpus, not a constant.

    Pass 1 computes the exact discrete quantile WITHOUT a sort: each
    block emits its (score, cnt) histogram (scores are round-6, so
    the distinct domain is bounded), one combine folds them, the
    driver takes ``index = max(0, ceil(q*n) - 1)`` from the cumulative
    counts (== DuckDB ``quantile_disc``). Pass 2 re-scores and filters
    with the threshold embedded as a closure constant — a pure map.
    Two corpus reads total; nothing but histograms ever leaves a
    block in pass 1.
    """
    import math

    from .relational import _combine_partials

    scores = quality_scores(sf_dir).select_columns(["doc_id", "quality"])

    def local_counts(batch: pa.Table) -> pa.Table:
        vals = batch.column("quality").to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(vals, return_counts=True)
        return pa.Table.from_pydict(
            {
                "value": pa.array(uniq.astype(np.float64), pa.float64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = scores.map_batches(local_counts, batch_format="pyarrow")
    # materialize once: the None fallback's groupby then reuses
    # these blocks instead of re-running the upstream DAG
    partials = partials.materialize()
    merged = _combine_partials(
        partials, keys=["value"], sum_cols=["cnt"],
        combine_limit=distinct_limit,
    )
    if merged is None:
        import ray as _ray

        shuffled = partials.groupby("value").sum("cnt")
        merged = pa.concat_tables(
            [
                t
                for t in _ray.get(shuffled.materialize().to_arrow_refs())
                if t.num_rows
            ]
        )
    vals = merged.column("value").to_numpy(zero_copy_only=False)
    cnts = merged.column("sum(cnt)").to_numpy(zero_copy_only=False)
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return scores
    idx = max(0, math.ceil(q * n) - 1)
    threshold = float(vals[np.searchsorted(cum, idx + 1)])

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.greater_equal(batch.column("quality"), threshold)
        return batch.filter(pc.fill_null(mask, False))

    return scores.map_batches(keep, batch_format="pyarrow")


def fix_mojibake(sf_dir: str) -> ray.data.Dataset:
    """Mojibake repair (ftfy-lite) — undo the classic UTF-8-read-as-
    Latin-1 double encoding that litters web crawls ("cafÃ©" -> "café").

    The corpus text is clean, so mojibake is PLANTED per residue (the
    normalize_text pattern — the oracle mirrors the construction):
    docs with ``doc_id % 6 == 2`` get the prefix
    ``'café — naïve résumé: '`` prepended and the whole string
    round-tripped ``encode('utf-8').decode('latin-1')``.

    Repair is gated: a vectorized RE2 match for the mojibake marker
    bytes (Ã / Â / â) selects candidates; only those pay the Python
    ``encode('latin-1') -> decode('utf-8')`` round-trip (strict — a
    string that legitimately contains the markers fails the decode and
    is kept verbatim). Scatter-back via ``replace_with_mask``. Pure
    vectorized map outside the gated subset: no shuffle, scale-free.

    Output: (doc_id, text_fixed, was_mojibake).
    """
    import pyarrow.compute as pc

    prefix = "café — naïve résumé: "

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").combine_chunks()
        hit = ids % 6 == 2
        if hit.any():
            idx = np.flatnonzero(hit)
            broken = pa.array(
                [
                    (prefix + s).encode("utf-8").decode("latin-1")
                    for s in texts.take(pa.array(idx)).to_pylist()
                ],
                pa.string(),
            )
            mask = pa.array(hit)
            texts = pc.replace_with_mask(texts, mask, broken)
        # --- the actual operator: detect + repair ---
        cand = pc.match_substring_regex(texts, "[ÃÂâ]")
        cidx = np.flatnonzero(
            pc.fill_null(cand, False).to_numpy(zero_copy_only=False)
        )
        fixed = texts
        was = np.zeros(len(ids), dtype=bool)
        if cidx.size:
            sub = texts.take(pa.array(cidx)).to_pylist()
            rep: list[str] = []
            ok = np.zeros(cidx.size, dtype=bool)
            for i, s in enumerate(sub):
                try:
                    r = s.encode("latin-1").decode("utf-8")
                except (UnicodeEncodeError, UnicodeDecodeError):
                    rep.append(s)
                    continue
                rep.append(r)
                ok[i] = r != s
            m = np.zeros(len(ids), dtype=bool)
            m[cidx] = True
            fixed = pc.replace_with_mask(
                texts, pa.array(m), pa.array(rep, pa.string())
            )
            was[cidx] = ok
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "text_fixed": fixed,
                "was_mojibake": pa.array(was),
            }
        )

    return read_documents(sf_dir, columns=("doc_id", "text")).map_batches(
        f, batch_format="pyarrow"
    )


def cdc_chunks(
    sf_dir: str,
    window: int = 16,
    div: int = 64,
    plant_dups: bool = False,
) -> ray.data.Dataset:
    """Content-defined chunking (Rabin rolling-hash boundaries) — the
    storage-level dedup primitive: chunk boundaries follow CONTENT, so
    an insertion reshapes only its neighborhood and every other chunk
    keeps its hash (dedupable across snapshots). Pure map, one Python
    rolling pass per doc (same budget class as rolling_fingerprint).

    Output: (doc_id, chunk_ord, start, length, chunk_md5) — start is a
    0-based byte offset, chunks cover the doc exactly.
    """
    import hashlib

    from ..kernels.text_stats import cdc_boundaries

    docs = read_documents(sf_dir, ("doc_id", "text"))

    _DUP_PAYLOAD = "shared duplicate payload block alpha beta gamma delta. " * 4

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        if plant_dups:
            texts = [
                _DUP_PAYLOAD if i % 41 in (7, 8) else t
                for i, t in zip(ids, texts)
            ]
        d: list[int] = []
        o: list[int] = []
        s: list[int] = []
        ln: list[int] = []
        md: list[str] = []
        for did, text in zip(ids, texts):
            data = (text or "").encode("utf-8")
            if not data:
                continue
            marks = sorted(
                {0, len(data), *cdc_boundaries(data, window, div)}
            )
            for k in range(len(marks) - 1):
                a, b = marks[k], marks[k + 1]
                d.append(int(did))
                o.append(k + 1)
                s.append(a)
                ln.append(b - a)
                md.append(hashlib.md5(data[a:b]).hexdigest())
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(d, pa.int64()),
                "chunk_ord": pa.array(o, pa.int64()),
                "start": pa.array(s, pa.int64()),
                "length": pa.array(ln, pa.int64()),
                "chunk_md5": pa.array(md, pa.string()),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def cdc_dedup_stats(sf_dir: str) -> pa.Table:
    """Chunk-level duplicate accounting over CDC chunks (planted
    duplicate docs: ``doc_id % 41 in (7, 8)`` share one repeated
    payload): ONE key-only ``groupby(chunk_md5)`` (Count + Min length
    — equal hashes have equal lengths), then per-block partial sums
    fold to a single report row on the driver. Output: (n_chunks,
    n_distinct, dup_chunk_frac, dup_byte_frac)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Min

    chunks = cdc_chunks(sf_dir, plant_dups=True)
    g = chunks.groupby("chunk_md5").aggregate(Count(), Min("length"))

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column("count()").to_numpy(zero_copy_only=False)
        ln = batch.column("min(length)").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "n_chunks": pa.array([int(c.sum())], pa.int64()),
                "n_distinct": pa.array([len(c)], pa.int64()),
                "dup_chunks": pa.array([int((c - 1).sum())], pa.int64()),
                "dup_bytes": pa.array(
                    [int(((c - 1) * ln).sum())], pa.int64()
                ),
                "total_bytes": pa.array([int((c * ln).sum())], pa.int64()),
            }
        )

    parts = [
        t
        for t in g.map_batches(
            partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    tot = pa.concat_tables(parts)
    n_chunks = int(pc.sum(tot.column("n_chunks")).as_py())
    n_distinct = int(pc.sum(tot.column("n_distinct")).as_py())
    dup_chunks = int(pc.sum(tot.column("dup_chunks")).as_py())
    dup_bytes = int(pc.sum(tot.column("dup_bytes")).as_py())
    total_bytes = int(pc.sum(tot.column("total_bytes")).as_py())
    return pa.Table.from_pydict(
        {
            "n_chunks": pa.array([n_chunks], pa.int64()),
            "n_distinct": pa.array([n_distinct], pa.int64()),
            "dup_chunk_frac": pa.array(
                [round(dup_chunks / n_chunks, 6)], pa.float64()
            ),
            "dup_byte_frac": pa.array(
                [round(dup_bytes / total_bytes, 6)], pa.float64()
            ),
        }
    )


# -- unicode script composition ----------------------------------------------

_SCRIPT_PLANTS = (
    (13, 4, " Пример русского текста номер {}.", ""),
    (17, 6, " 中文样本文档{}号", ""),
    (19, 3, " Ελληνικό δείγμα {}", ""),
)


def script_mix(sf_dir: str) -> ray.data.Dataset:
    """Per-doc unicode SCRIPT composition — the orthography axis of
    language ID (a corpus labeled ``lang=ru`` whose pages are 95 %
    Latin is mislabeled or mojibake; CJK fractions gate tokenizer
    choice). The corpus text is pure ASCII, so non-Latin scripts are
    PLANTED per residue (the fix_mojibake pattern — the oracle mirrors
    the construction): Cyrillic on doc_id%13==4, CJK on %17==6, Greek
    on %19==3, appended in that order (a doc can hit several).

    The counting pass is fully vectorized and allocation-bounded: one
    string join per batch -> one utf-32 decode (np.frombuffer) -> per
    class a cumsum sampled at doc offsets (reduceat-safe for empty
    docs). No per-row Python beyond the planted subset. Pure map,
    zero exchanges.

    Output: (doc_id, n_chars, n_latin, n_cyrillic, n_greek, n_cjk,
    n_digit, frac_non_latin).
    """
    import pyarrow.compute as pc

    from .io import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    # (lo, hi) inclusive codepoint ranges per class; latin is letters
    # only (A-Z, a-z) to match the oracle's [A-Za-z]
    classes = {
        "n_latin": ((0x41, 0x5A), (0x61, 0x7A)),
        "n_cyrillic": ((0x0400, 0x04FF),),
        "n_greek": ((0x0370, 0x03FF),),
        "n_cjk": ((0x4E00, 0x9FFF),),
        "n_digit": ((0x30, 0x39),),
    }

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").combine_chunks()
        planted = texts
        for mod, res, fmt, _ in _SCRIPT_PLANTS:
            hit = ids % mod == res
            if hit.any():
                idx = np.flatnonzero(hit)
                grown = pa.array(
                    [
                        s + fmt.format(i)
                        for s, i in zip(
                            planted.take(pa.array(idx)).to_pylist(),
                            ids[idx],
                        )
                    ],
                    pa.string(),
                )
                planted = pc.replace_with_mask(
                    planted, pa.array(hit), grown
                )
        # --- the actual operator: vectorized codepoint histogram ---
        texts_py = planted.to_pylist()
        joined = "".join(texts_py)
        cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        n_chars = pc.utf8_length(planted).to_numpy(zero_copy_only=False)
        offsets = np.concatenate([[0], np.cumsum(n_chars)]).astype(np.int64)
        out: dict[str, pa.Array] = {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars.astype(np.int64), pa.int64()),
        }
        non_latin = np.zeros(len(ids), np.int64)
        for name, ranges in classes.items():
            mask = np.zeros(len(cp), bool)
            for lo, hi in ranges:
                mask |= (cp >= lo) & (cp <= hi)
            csum = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
            counts = csum[offsets[1:]] - csum[offsets[:-1]]
            out[name] = pa.array(counts, pa.int64())
            if name in ("n_cyrillic", "n_greek", "n_cjk"):
                non_latin += counts
        denom = np.maximum(out["n_chars"].to_numpy(zero_copy_only=False), 1)
        frac = np.round(non_latin / denom, 6)
        frac[out["n_chars"].to_numpy(zero_copy_only=False) == 0] = 0.0
        out["frac_non_latin"] = pa.array(frac, pa.float64())
        return pa.Table.from_pydict(out)

    return ds.map_batches(f, batch_format="pyarrow")


# -- mergeable histogram quantile sketch --------------------------------------

HIST_WIDTH = 16
HIST_BINS = 64  # bins [0, 1024) + one overflow bin


def histogram_quantiles(
    sf_dir: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9)
) -> pa.Table:
    """Quantile estimates from a MERGEABLE equi-width histogram sketch
    (the approx_percentile/t-digest niche, fourth mergeable sketch
    next to HLL/CMS/Bloom): constant 65-register state per block, so
    the merge is a tiny partial-sum — one driver combine regardless of
    corpus size, the same register idiom as kernels/sketch.py HLL.

    Per block: ``np.bincount`` of ``min(n_chars // 16, 64)`` (bin 64 =
    overflow). Estimator: for each q, the first bin whose cumulative
    count reaches ``q*n``, linearly interpolated inside the bin —
    ``bin*16 + 16*(q*n - cum_before)/cnt`` — written in exactly this
    float op order so the SQL oracle reproduces it bit-for-bit (after
    the shared 6dp round).

    Returns (q, value) rows.
    """
    from .io import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("n_chars").to_numpy(zero_copy_only=False)
        bins = np.minimum(v // HIST_WIDTH, HIST_BINS).astype(np.int64)
        counts = np.bincount(bins, minlength=HIST_BINS + 1)
        return pa.Table.from_pydict(
            {"counts": pa.array([counts.tolist()], pa.list_(pa.int64()))}
        )

    parts = [
        t
        for t in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if t.num_rows
    ]
    reg = np.zeros(HIST_BINS + 1, np.int64)
    for t in parts:
        col = t.column("counts").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        reg += flat.reshape(len(col), HIST_BINS + 1).sum(axis=0)
    n = int(reg.sum())
    cum = np.cumsum(reg)
    out_q, out_v = [], []
    for q in qs:
        target = q * float(n)
        b = int(np.searchsorted(cum, target, side="left"))
        # empty leading bins: advance to the first bin with mass
        while reg[b] == 0 and b < HIST_BINS:
            b += 1
        cum_before = float(cum[b] - reg[b])
        cnt = float(reg[b])
        val = b * float(HIST_WIDTH) + float(HIST_WIDTH) * (
            target - cum_before
        ) / cnt
        out_q.append(q)
        out_v.append(round(min(val, float(HIST_WIDTH * (HIST_BINS + 1))), 6))
    return pa.Table.from_pydict(
        {
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        }
    )


# -- per-paragraph language segmentation --------------------------------------

_PARA_PLANTS = (
    (7, 2, "der und die das ist nicht ein von mit zu"),
    (11, 5, "le la les et un une est pour dans pas"),
    (13, 8, "el la los las de y un una es en no que"),
)


def paragraph_langs(sf_dir: str) -> ray.data.Dataset:
    """Per-PARAGRAPH language ID — code-switch segmentation (CCNet
    runs language ID per paragraph precisely because crawled pages mix
    languages; a doc-level label hides embedded boilerplate in another
    language). Paragraphs are newline-separated (the paragraph_dedup
    convention); foreign-language paragraphs are PLANTED per residue
    with stopword-bearing lines the detector genuinely recognizes
    (German on doc_id%7==2, French on %11==5, Spanish on %13==8,
    appended in that order — a doc can hit several).

    The detector is the SAME stopword-overlap heuristic as the
    hash-verified ``language_id`` query (kernels/text_stats.py:
    detect_language), applied per paragraph. Pure map, zero exchanges.

    Output: one row per paragraph — (doc_id, para_ord, para_lang,
    doc_lang, differs).
    """
    import pyarrow.compute as pc

    from ..kernels.text_stats import detect_language

    docs = read_documents(sf_dir, ("doc_id", "text", "lang"))

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        text = pc.fill_null(batch.column("text"), "")
        for mod, res, line in _PARA_PLANTS:
            suffix = np.where(ids % mod == res, "\n" + line, "").astype(
                object
            )
            text = pc.binary_join_element_wise(
                text, pa.array(suffix, pa.string()), ""
            )
        paras = pc.split_pattern(text, "\n").combine_chunks()
        offsets = paras.offsets.to_numpy(zero_copy_only=False)
        counts = np.diff(offsets)
        parent = np.repeat(np.arange(len(ids)), counts)
        ords = np.arange(len(parent)) - np.repeat(
            offsets[:-1], counts
        )
        flat = paras.flatten().to_pylist()
        detected = [detect_language(p) for p in flat]
        doc_lang = (
            pc.fill_null(batch.column("lang"), "")
            .take(pa.array(parent))
        )
        det = pa.array(detected, pa.string())
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[parent], pa.int64()),
                "para_ord": pa.array(ords.astype(np.int64), pa.int64()),
                "para_lang": det,
                "doc_lang": doc_lang,
                "differs": pc.not_equal(det, doc_lang),
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")


def lang_histogram_quantiles(
    sf_dir: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9)
) -> ray.data.Dataset:
    """GROUPED histogram quantile sketch: one 65-register histogram
    per language, merged through ONE ``groupby(lang)`` of per-block
    register rows (the hll_distinct_hourly grouped-sketch shape — no
    driver dict, works at any group cardinality). Estimator identical
    to ``histogram_quantiles``. Returns (lang, q, value) rows.
    """
    from .io import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        v = batch.column("n_chars").to_numpy(zero_copy_only=False)
        bins = np.minimum(v // HIST_WIDTH, HIST_BINS).astype(np.int64)
        out_l, out_c = [], []
        import pandas as pd

        codes, uniq = pd.factorize(np.asarray(langs, object))
        for i, lg in enumerate(uniq):
            counts = np.bincount(
                bins[codes == i], minlength=HIST_BINS + 1
            )
            out_l.append(lg)
            out_c.append(counts.tolist())
        return pa.Table.from_pydict(
            {
                "lang": pa.array(out_l, pa.string()),
                "counts": pa.array(out_c, pa.list_(pa.int64())),
            }
        )

    def estimate(group: pa.Table) -> pa.Table:
        lang = group.column("lang")[0].as_py()
        col = group.column("counts").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        reg = flat.reshape(len(col), HIST_BINS + 1).sum(axis=0)
        n = int(reg.sum())
        cum = np.cumsum(reg)
        out_q, out_v = [], []
        for q in qs:
            target = q * float(n)
            b = int(np.searchsorted(cum, target, side="left"))
            cum_before = float(cum[b] - reg[b])
            cnt = float(reg[b])
            val = b * float(HIST_WIDTH) + float(HIST_WIDTH) * (
                target - cum_before
            ) / cnt
            out_q.append(q)
            out_v.append(round(val, 6))
        return pa.Table.from_pydict(
            {
                "lang": pa.array([lang] * len(qs), pa.string()),
                "q": pa.array(out_q, pa.float64()),
                "value": pa.array(out_v, pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(estimate, batch_format="pyarrow")
    )
