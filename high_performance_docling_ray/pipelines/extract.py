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

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.extract_stage import (
    DocExtractor,
    PageExtractor,
    add_cost_class,
    assemble_doc_group,
    explode_pdf_pages,
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
    urls = sorted_tbl.column("url")
    if len(urls) == 0:
        return sorted_tbl
    keep = np_first_occurrence_mask(urls)
    return sorted_tbl.filter(pa.array(keep))


def np_first_occurrence_mask(urls: pa.ChunkedArray) -> list[bool]:
    vals = urls.to_pylist()
    mask = [True] * len(vals)
    for i in range(1, len(vals)):
        if vals[i] == vals[i - 1]:
            mask[i] = False
    return mask


def _group_keep_first(group: pa.Table) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[("warc_ts", "ascending")])
    return group.take(order[:1])


def dedup_by_url(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup: keep the earliest capture per url (north_rule).

    Local combiner first, then one hash shuffle on ``url``.
    """
    return (
        ds.map_batches(_local_keep_first, batch_format="pyarrow")
        .groupby("url")
        .map_groups(_group_keep_first, batch_format="pyarrow")
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
    batch_size: int = 32,
    concurrency=None,
    options=None,
) -> ray.data.Dataset:
    """Build the extraction DAG over a pages dataset."""
    from ..kernels.document import DEFAULT_OPTIONS

    if options is None:
        options = DEFAULT_OPTIONS
    if dedup:
        ds = dedup_by_url(ds)

    if concurrency is None:
        # Autoscaling actor pool (1..CPUs): a fixed-size pool can
        # deadlock the streaming executor when several pools compete
        # for the same CPUs; (min,max) lets Ray scale each pool to the
        # stage's actual load.
        import ray

        concurrency = (1, max(2, int(ray.cluster_resources().get("CPU", 4))))
    kwargs: dict[str, Any] = {
        "batch_format": "pyarrow",
        "batch_size": batch_size,
        "concurrency": concurrency,
        "fn_constructor_kwargs": {"options": options},
    }

    if not explode_giant:
        return ds.map_batches(DocExtractor, **kwargs)

    classified = ds.map_batches(
        lambda b: add_cost_class(b, GIANT_BYTES), batch_format="pyarrow"
    )
    small = _filter_class(classified, want_giant=False)
    giant = _filter_class(classified, want_giant=True)

    small_out = small.map_batches(DocExtractor, **kwargs)
    giant_out = (
        giant.flat_map(explode_pdf_pages)
        .map_batches(
            PageExtractor,
            batch_format="pyarrow",
            batch_size=8,
            concurrency=concurrency,
            fn_constructor_kwargs={"options": options},
        )
        .groupby("url")
        .map_groups(assemble_doc_group, batch_format="pyarrow")
    )
    return small_out.union(giant_out)


def extract_from_parquet(path: str, **kwargs) -> ray.data.Dataset:
    return extract_pipeline(read_pages(path), **kwargs)
