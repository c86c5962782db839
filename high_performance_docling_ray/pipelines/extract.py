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

import zlib
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.extract_stage import (
    DocExtractor,
    PageExtractor,
    add_cost_class,
    assemble_doc_group,
    explode_pdf_pages,
    make_doc_extract_fn,
    make_page_extract_fn,
)

GIANT_BYTES = 196_608  # >=192 KiB payload -> page-exploded path

PAGE_COLUMNS = ["url", "warc_ts", "html", "lang"]


def read_pages(path: str) -> ray.data.Dataset:
    """Column-pruned read of a pages parquet (never load ``text`` — the
    raw dump is not used by extraction)."""
    return ray.data.read_parquet(path, columns=PAGE_COLUMNS)


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
    # vectorized first-occurrence mask: row i survives iff url[i] != url[i-1]
    neq = pc.not_equal(urls.slice(1), urls.slice(0, n - 1))
    keep = pa.chunked_array([pa.array([True]), neq])
    return sorted_tbl.filter(keep)


def _group_keep_first(group: pa.Table) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[("warc_ts", "ascending")])
    return group.take(order[:1])


def _add_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    urls = batch.column("url").to_pylist()
    buckets = np.fromiter(
        (zlib.crc32(u.encode("utf-8")) % num_buckets for u in urls),
        dtype=np.int32,
        count=len(urls),
    )
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


def _bucket_keep_first(group: pa.Table) -> pa.Table:
    """Vectorized keep-first over one WHOLE hash bucket (all captures of
    a url land in the same bucket, so within-bucket keep-first is
    globally exact)."""
    return _local_keep_first(group).drop_columns(["bucket"])


def dedup_by_url(
    ds: ray.data.Dataset, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Exact dedup: keep the earliest capture per url (north_rule).

    Local combiner first, then ONE hash shuffle — keyed on a
    low-cardinality ``bucket = crc32(url) % P`` column rather than the
    raw url. ``groupby(url).map_groups`` would pay a Python call + Arrow
    slice per DISTINCT url (millions/sec of overhead at corpus scale);
    bucketing keeps the same exchange semantics but runs ONE vectorized
    sort+mask per bucket. P scales with the cluster (4x CPUs here; at
    10^12 rows pick P so a bucket ~ a block); hot-url skew cannot
    concentrate more than 1/P of the corpus in one group.
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
) -> ray.data.Dataset:
    """Build the extraction DAG over a pages dataset.

    ``use_actors=False`` (default): extraction runs as stateless
    ``map_batches`` tasks (setup is cheap — compiled regexes only), so
    the stage reuses Ray's warm worker pool. ``use_actors=True`` runs
    the same callables as an autoscaling actor pool — the shape a
    heavy-state variant (real detector/OCR weights) requires.
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
            # pool to the stage's actual load.
            import ray

            concurrency = (
                1, max(2, int(ray.cluster_resources().get("CPU", 4)))
            )
        doc_fn: Any = DocExtractor
        page_fn: Any = PageExtractor
        kwargs["concurrency"] = concurrency
        kwargs["fn_constructor_kwargs"] = {"options": options}
        page_kwargs = dict(kwargs, batch_size=16)
    else:
        doc_fn = make_doc_extract_fn(options)
        page_fn = make_page_extract_fn(options)
        page_kwargs = dict(kwargs, batch_size=16)

    if not explode_giant:
        if dedup:
            ds = dedup_by_url(ds)
        return ds.map_batches(doc_fn, **kwargs)

    # Branch point. A lazy Dataset with two consumers re-executes its
    # whole upstream once per consumer, and a mid-pipeline
    # materialize() pins the full corpus in the object store. So the
    # size-class split happens at the SOURCE — a cheap vectorized
    # length predicate — and each branch dedups independently. That is
    # exact whenever duplicate captures of a url keep their size class
    # (identical or near-identical payloads — the Common-Crawl shape;
    # asserted by the byte-identity tests). The giant branch's
    # re-scan drops ~99% of rows at the first filter. Deployments that
    # need a single-scan branch point instead write the deduped stream
    # to partitioned parquet (state/checkpoint.py) and read both
    # branches from that checkpoint.
    classified = ds.map_batches(
        lambda b: add_cost_class(b, GIANT_BYTES), batch_format="pyarrow"
    )
    small = _filter_class(classified, want_giant=False)
    giant = _filter_class(classified, want_giant=True)
    if dedup:
        small = dedup_by_url(small)
        giant = dedup_by_url(giant, num_buckets=16)

    small_out = small.map_batches(doc_fn, **kwargs)
    giant_out = (
        giant.flat_map(explode_pdf_pages)
        .map_batches(page_fn, **page_kwargs)
        .groupby("url")
        .map_groups(assemble_doc_group, batch_format="pyarrow")
    )
    return small_out.union(giant_out)


def extract_from_parquet(path: str, **kwargs) -> ray.data.Dataset:
    return extract_pipeline(read_pages(path), **kwargs)
