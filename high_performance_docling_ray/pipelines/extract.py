"""Flagship extraction pipeline: pages parquet -> extracted text.

Ray-Data-first DAG (SURVEY.md §7.3):

    read_parquet(url, warc_ts, html, lang)          # column-pruned read
      -> [local keep-first combiner]                 # shrink dups pre-shuffle
      -> groupby(url).map_groups(keep_first)         # exact dedup (hash shuffle)
      -> cost-class split (payload length)           # skew defusal
           small/medium: map_batches(DocExtractor)   # doc-at-once, no shuffle
           giant:        flat_map(pages) -> map_batches(PageExtractor)
                         -> groupby(url).map_groups(assemble)   # per-doc regroup
      -> union -> write_parquet(partitioned by shard)

At 100 TB the only all-to-all exchanges are the url-keyed dedup and
the giant-class regroup (≈1% of rows after the split); everything else
is embarrassingly parallel map_batches over Arrow blocks.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.extract_stage import (
    GIANT_BYTES as _STAGE_GIANT_BYTES,
)
from ..stages.extract_stage import (
    DocExtractor,
    PageExtractor,
    add_cost_class,
    assemble_doc_group,
    explode_pdf_pages,
    make_doc_extract_fn,
    make_page_extract_fn,
)

# Re-exported from the stage module (single source of truth for the
# monster-explosion threshold; see stages/extract_stage.py).
GIANT_BYTES = _STAGE_GIANT_BYTES

PAGE_COLUMNS = ["url", "warc_ts", "html", "lang"]


def read_pages(path: str) -> ray.data.Dataset:
    """Column-pruned read of a pages parquet (never load ``text`` — the
    raw dump is not used by extraction)."""
    from .io import read_parquet_clean

    return read_parquet_clean(path, columns=PAGE_COLUMNS)


def normalize_urls(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Canonicalize the url column (kernels/urlnorm.py) so url dedup
    collapses scheme/host-case, fragment, port and tracking-param
    variants of the same page. Optional pre-dedup stage.

    INCOMPATIBLE with ``extract_pipeline(source_path=...)``: that fast
    path computes dedup winners from the RAW parquet url column, and a
    rewritten url would never match its winner (silent row loss).
    When normalizing, leave source_path unset so the winner phase
    derives keys from the normalized stream."""
    from ..kernels.urlnorm import normalize_url_column

    def f(batch: pa.Table) -> pa.Table:
        urls = normalize_url_column(batch.column("url").to_pylist())
        return batch.set_column(
            batch.column_names.index("url"), "url", pa.array(urls, pa.string())
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _local_keep_first(batch: pa.Table) -> pa.Table:
    """Pre-shuffle combiner: within a batch keep the earliest warc_ts
    per url. Safe because global keep-first = argmin(warc_ts) and min
    is associative; shrinks duplicate traffic before the hash shuffle."""
    order = pc.sort_indices(
        batch, sort_keys=[("url", "ascending"), ("warc_ts", "ascending")]
    )
    sorted_tbl = batch.take(order)
    urls = sorted_tbl.column("url").combine_chunks()
    n = len(urls)
    if n == 0:
        return sorted_tbl
    # vectorized first-occurrence mask: row i survives iff url[i] != url[i-1].
    # not_equal propagates null, and Table.filter DROPS null mask rows —
    # fill with True so null-url rows (no dedup key) are all kept.
    neq = pc.fill_null(pc.not_equal(urls.slice(1), urls.slice(0, n - 1)), True)
    keep = pa.chunked_array([pa.array([True]), neq])
    return sorted_tbl.filter(keep)


def _group_keep_first(group: pa.Table) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[("warc_ts", "ascending")])
    return group.take(order[:1])


def _add_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    from .joins import string_key_buckets

    buckets = string_key_buckets(batch.column("url"), num_buckets)
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


def _bucket_keep_first(group: pa.Table) -> pa.Table:
    """Vectorized keep-first over one WHOLE hash bucket (all captures of
    a url land in the same bucket, so within-bucket keep-first is
    globally exact)."""
    return _local_keep_first(group).drop_columns(["bucket"])


def dedup_shuffle(
    ds: ray.data.Dataset, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Exact keep-first dedup via ONE full-row hash shuffle.

    Keyed on a low-cardinality ``bucket = crc32(url) % P`` column
    rather than the raw url: ``groupby(url).map_groups`` would pay a
    Python call + Arrow slice per DISTINCT url (millions/sec of
    overhead at corpus scale); bucketing keeps the same exchange
    semantics but runs ONE vectorized sort+mask per bucket. P scales
    with the cluster (4x CPUs here; at 10^12 rows pick P so a bucket ~
    a block); hot-url skew cannot concentrate more than 1/P of the
    corpus in one group. This is the scale path: it moves payload
    bytes, but works at any corpus size.
    """
    if num_buckets is None:
        import ray

        num_buckets = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))
    return (
        ds.map_batches(_local_keep_first, batch_format="pyarrow")
        .map_batches(
            lambda b: _add_bucket(b, num_buckets), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(_bucket_keep_first, batch_format="pyarrow")
    )


def _keys_to_us(batch: pa.Table) -> pa.Table:
    return pa.Table.from_pydict(
        {
            "url": batch.column("url"),
            "ts_us": pc.cast(batch.column("warc_ts"), pa.int64()),
        }
    )


def _key_partial_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for the winner computation: (url, ts_us, n)."""
    keyed = _keys_to_us(batch)
    return (
        keyed.group_by(["url", "ts_us"])
        .aggregate([([], "count_all")])
        .rename_columns(["url", "ts_us", "n"])
    )




class WinnerPlan(NamedTuple):
    """Result of the dedup winner phase (one shape for every outcome)."""

    filter_fn: Any        # per-batch semi-join filter; None when empty input
    tie_urls: list        # urls whose min warc_ts is tied (need the shuffle)
    over_limit: bool      # winner set exceeded the broadcast budget


def winner_filter_factory(
    keys_src: ray.data.Dataset, broadcast_limit: int = 2_000_000
) -> WinnerPlan:
    """Compute the keep-first winner set and return a per-batch
    semi-join FILTER plus the tied urls, as a WinnerPlan.

    The filter is a pure per-row predicate (winners broadcast once via
    ``ray.put``), so it commutes with any other per-row stage — e.g.
    the size-class split can run first and each branch applies the
    filter to the few rows it actually keeps.

    over_limit=True means the winner set exceeds the broadcast budget
    and callers must fall back to the full-row shuffle; filter_fn=None
    with over_limit=False means the input was empty.

    Phase 1 entirely avoids a Ray groupby (whose fixed shuffle cost
    dwarfs a key-only aggregation): per-batch vectorized partial
    counts, concatenated on the driver (bounded by broadcast_limit —
    the same budget the broadcast itself needs), combined with one
    C++ group_by.
    """
    import ray

    partial_refs = (
        keys_src
        # whole-block batches: the partials are key-only, so bigger
        # batches just mean fewer tasks (the phase is overhead-bound)
        .map_batches(
            _key_partial_counts, batch_format="pyarrow", batch_size=None
        )
        # materialize() first: a lazy Dataset's to_arrow_refs runs the
        # plan fully AND re-executes a limit-1 pass for the schema; a
        # materialized one knows its schema and runs once
        .materialize()
        .to_arrow_refs()
    )
    partials = ray.get(partial_refs)  # one batched get, not N round-trips
    partials = [t for t in partials if t.num_columns > 0]  # drop schema-less empties
    if not partials:
        return WinnerPlan(None, [], False)  # empty input
    key_tbl = pa.concat_tables(partials)
    if key_tbl.num_rows > broadcast_limit:
        return WinnerPlan(None, [], True)
    counts = key_tbl.group_by(["url", "ts_us"]).aggregate([("n", "sum")])
    counts = counts.rename_columns(["url", "ts_us", "n"])
    # rows with a null url or null warc_ts have no usable dedup key;
    # they are excluded from the winner table and handled by the
    # passthrough rules in semi_join below
    counts = counts.filter(
        pc.and_(
            pc.is_valid(counts.column("url")),
            pc.is_valid(counts.column("ts_us")),
        )
    )
    counts = counts.take(
        pc.sort_indices(
            counts,
            sort_keys=[("url", "ascending"), ("ts_us", "ascending")],
        )
    )
    urls = counts.column("url").combine_chunks()
    n_rows = len(urls)
    if n_rows == 0:
        return WinnerPlan(None, [], False)
    first = pa.chunked_array(
        [pa.array([True]), pc.not_equal(urls.slice(1), urls.slice(0, n_rows - 1))]
    )
    winner_rows = counts.filter(first)
    winners = winner_rows.select(["url", "ts_us"])
    tie_urls = winner_rows.filter(
        pc.greater(winner_rows.column("n"), 1)
    ).column("url").to_pylist()
    winners_ref = ray.put(winners)

    def semi_join(batch: pa.Table) -> pa.Table:
        # fully vectorized semi-join: one pc.is_in over a composite
        # (url \x1f ts) key plus two vectorized null-rule masks. The
        # composite is injective — the ts component (int64 digits) can
        # never contain the separator, so key equality <=> pair
        # equality. Winner key arrays are built ONCE per worker process
        # and cached by ref.
        wkeys, wurls = _winner_arrays(winners_ref)
        urls = batch.column("url")
        ts = pc.cast(batch.column("warc_ts"), pa.int64())
        key = pc.binary_join_element_wise(
            urls, pc.cast(ts, pa.string()), "\x1f"
        )  # null when either side is null (emit_null default)
        keep = pc.or_(
            pc.or_(
                pc.is_in(key, value_set=wkeys),   # the winning capture
                pc.is_null(urls),                 # no dedup key: keep
            ),
            pc.and_(                              # null ts, no real winner
                pc.is_null(ts),
                pc.invert(pc.is_in(urls, value_set=wurls)),
            ),
        )
        return batch.filter(pc.fill_null(keep, False))

    return WinnerPlan(semi_join, tie_urls, False)


_WINNER_SET_CACHE: dict[str, tuple] = {}


def _winner_arrays(winners_ref):
    """Per-worker cache: winner composite-key array + winner url array
    (both pa.Array, ready as ``pc.is_in`` value sets)."""
    import ray

    key = winners_ref.hex()
    hit = _WINNER_SET_CACHE.get(key)
    if hit is None:
        w = ray.get(winners_ref)
        wurls = w.column("url").combine_chunks()
        wkeys = pc.binary_join_element_wise(
            wurls, pc.cast(w.column("ts_us"), pa.string()), "\x1f"
        )
        hit = (wkeys, wurls)
        _WINNER_SET_CACHE.clear()  # one plan active per run
        _WINNER_SET_CACHE[key] = hit
    return hit


def dedup_by_url(
    ds: ray.data.Dataset,
    num_buckets: int | None = None,
    strategy: str = "auto",
    broadcast_limit: int = 2_000_000,
    keys_ds: ray.data.Dataset | None = None,
    plan: "WinnerPlan | None" = None,
) -> ray.data.Dataset:
    """Exact dedup: keep the earliest capture per url (north_rule).

    strategy="auto": two-phase semi-join. Phase 1 shuffles ONLY the
    (url, warc_ts) key columns (~3% of corpus bytes) through Ray's
    built-in vectorized groupby-count, yielding the winner (url,
    min_ts) set. Phase 2 broadcasts the winners as an Arrow table
    (``ray.put`` once, zero-copy plasma reads) and filters the full
    rows with a C++ hash semi-join per batch — payload bytes never
    shuffle. Urls with TIED minimum timestamps are detected in phase 1
    and resolved exactly through the shuffle path (usually none).

    When the winner set exceeds ``broadcast_limit`` rows (the 10^12-doc
    regime — a winner table that cannot broadcast), falls back to
    ``dedup_shuffle``, the full-row exchange that works at any scale.
    strategy="shuffle" forces that path.

    ``keys_ds``: optional dataset carrying ONLY (url, warc_ts) for
    phase 1. Ray does not push a Project into read_parquet, so without
    it the key pass decodes every payload byte; callers that know the
    parquet path pass ``read_parquet(path, columns=["url","warc_ts"])``
    and the key pass reads ~3% of the corpus bytes.
    """
    import ray

    if strategy == "shuffle":
        return dedup_shuffle(ds, num_buckets)

    if plan is None:
        plan = winner_filter_factory(
            keys_ds if keys_ds is not None else ds.select_columns(
                ["url", "warc_ts"]
            ),
            broadcast_limit,
        )
    if plan.over_limit:
        return dedup_shuffle(ds, num_buckets)
    if plan.filter_fn is None:
        return ds  # empty input
    semi_join, tie_urls = plan.filter_fn, plan.tie_urls
    filtered = ds.map_batches(semi_join, batch_format="pyarrow")
    if not tie_urls:
        return filtered

    # Exact tie resolution: the few urls whose min warc_ts appears on
    # several rows go through the full shuffle; all others stream.
    ties = set(tie_urls)
    ties_ref = ray.put(pa.array(sorted(ties)))

    def drop_tied(batch: pa.Table) -> pa.Table:
        t = ray.get(ties_ref)
        return batch.filter(pc.invert(pc.is_in(batch.column("url"), value_set=t)))

    def only_tied(batch: pa.Table) -> pa.Table:
        t = ray.get(ties_ref)
        return batch.filter(pc.is_in(batch.column("url"), value_set=t))

    clean = filtered.map_batches(drop_tied, batch_format="pyarrow")
    tied = dedup_shuffle(
        ds.map_batches(only_tied, batch_format="pyarrow"), num_buckets=8
    )
    return clean.union(tied)


def _filter_class(ds: ray.data.Dataset, want_giant: bool) -> ray.data.Dataset:
    target = 1 if want_giant else 0

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("cost_class"), target)
        return batch.filter(mask).drop_columns(["cost_class"])

    return ds.map_batches(f, batch_format="pyarrow")


def extract_pipeline(
    ds: ray.data.Dataset,
    *,
    dedup: bool = True,
    explode_giant: bool = True,
    batch_size: int = 64,
    concurrency=None,
    options=None,
    use_actors: bool = False,
    giant_bytes: int = GIANT_BYTES,
    source_path: str | None = None,
    ocr_ref=None,
) -> ray.data.Dataset:
    """Build the extraction DAG over a pages dataset.

    ``use_actors=False`` (default): extraction runs as stateless
    ``map_batches`` tasks (setup is cheap — compiled regexes only), so
    the stage reuses Ray's warm worker pool. ``use_actors=True`` runs
    the same callables as an autoscaling actor pool — the shape a
    heavy-state variant (real detector/OCR weights) requires.

    ``source_path``: when the input is a parquet path, pass it so the
    dedup winner phase reads only the key columns (see dedup_by_url).
    Only valid when ``ds`` carries the parquet's url/warc_ts columns
    UNCHANGED — in particular do NOT combine with ``normalize_urls``
    (winners from raw urls would never match rewritten urls).
    """
    from ..kernels.document import DEFAULT_OPTIONS

    if options is None:
        options = DEFAULT_OPTIONS

    kwargs: dict[str, Any] = {
        "batch_format": "pyarrow",
        "batch_size": batch_size,
    }
    if use_actors:
        if concurrency is None:
            # Autoscaling actor pool (1..CPUs): a fixed-size pool can
            # deadlock the streaming executor when several pools
            # compete for the same CPUs; (min,max) lets Ray scale each
            # pool to the stage's actual load. (module-level import of
            # ray.data already binds `ray` — a local import here would
            # shadow it for the whole function)
            concurrency = (
                1, max(2, int(ray.cluster_resources().get("CPU", 4)))
            )
        doc_fn: Any = DocExtractor
        page_fn: Any = PageExtractor
        kwargs["concurrency"] = concurrency
        kwargs["fn_constructor_kwargs"] = {"options": options}
        if ocr_ref is not None:
            kwargs["fn_constructor_kwargs"]["ocr_ref"] = ocr_ref
        page_kwargs = dict(kwargs, batch_size=16)
        page_kwargs["fn_constructor_kwargs"] = {"options": options}
        if ocr_ref is not None:
            page_kwargs["fn_constructor_kwargs"]["ocr_ref"] = ocr_ref
    else:
        doc_fn = make_doc_extract_fn(options, ocr_ref=ocr_ref)
        page_fn = make_page_extract_fn(options, ocr_ref=ocr_ref)
        page_kwargs = dict(kwargs, batch_size=16)

    keys_ds = None
    if source_path:
        # coalesced key-column read: per-file tasks would dominate the
        # (tiny) winner phase with scheduling overhead
        nb = max(8, 2 * int(ray.cluster_resources().get("CPU", 8)))
        from .io import read_parquet_clean

        keys_ds = read_parquet_clean(
            source_path, columns=["url", "warc_ts"], override_num_blocks=nb
        )
    if not explode_giant:
        if dedup:
            ds = dedup_by_url(ds, keys_ds=keys_ds)
        return ds.map_batches(doc_fn, **kwargs)

    # Dedup + split. The winner phase runs ONCE (eager, broadcast);
    # its per-row semi-join filter commutes with the per-row size-class
    # predicate, so each branch applies the filter AFTER its split —
    # the giant branch (usually ~0 rows survive the length predicate)
    # then pays near-nothing for dedup. The branch point re-executes
    # the upstream read per consumer — cheap and parallel; a
    # mid-pipeline materialize() would instead pin the corpus in the
    # object store. When the winner set cannot broadcast or ties need
    # the shuffle (the 10^12-doc regime), dedup runs before the split
    # and a deployment would checkpoint the deduped stream to
    # partitioned parquet (state/checkpoint.py) instead of
    # re-shuffling per branch.
    dedup_fn = None
    if dedup:
        plan = winner_filter_factory(
            keys_ds
            if keys_ds is not None
            else ds.select_columns(["url", "warc_ts"])
        )
        if plan.over_limit or plan.tie_urls:
            # fallback (winner set too big, or tied timestamps): dedup
            # the whole stream before the split, REUSING the computed
            # plan so the winner phase never runs twice
            ds = dedup_by_url(ds, keys_ds=keys_ds, plan=plan)
            dedup = False
        elif plan.filter_fn is None:
            dedup = False  # empty input: nothing to dedup
        else:
            dedup_fn = plan.filter_fn  # per-row filter, no ties

    classified = ds.map_batches(
        lambda b: add_cost_class(b, giant_bytes), batch_format="pyarrow"
    )
    small = _filter_class(classified, want_giant=False)
    giant = _filter_class(classified, want_giant=True)
    if dedup_fn is not None:
        small = small.map_batches(dedup_fn, batch_format="pyarrow")
        giant = giant.map_batches(dedup_fn, batch_format="pyarrow")

    small_out = small.map_batches(doc_fn, **kwargs)
    giant_out = (
        giant.flat_map(explode_pdf_pages)
        .map_batches(page_fn, **page_kwargs)
        .groupby("url")
        .map_groups(
            functools.partial(assemble_doc_group, options=options),
            batch_format="pyarrow",
        )
    )
    return small_out.union(giant_out)


def extract_from_parquet(path: str, **kwargs) -> ray.data.Dataset:
    return extract_pipeline(read_pages(path), **kwargs)
