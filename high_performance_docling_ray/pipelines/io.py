"""Shared read-side helpers for the pipelines package."""

from __future__ import annotations

import pyarrow as pa

import ray.data


def strip_pandas_metadata(batch: pa.Table) -> pa.Table:
    """Drop file-level schema metadata (the pandas JSON blob written
    into the testdata parquet).

    A schema carrying a metadata dict makes ``pyarrow.Schema``
    unhashable, which (a) spams ``Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'`` from Ray's
    ``unify_schemas`` on every groupby/sort reduce and (b) defeats its
    schema-dedup fast path. Stripping at the read boundary keeps every
    downstream block hashable; ``replace_schema_metadata`` is
    zero-copy and the extra map fuses with the next stage.
    """
    return (
        batch.replace_schema_metadata(None) if batch.schema.metadata else batch
    )


def read_parquet_clean(path, **kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet`` with schema metadata stripped."""
    return ray.data.read_parquet(path, **kwargs).map_batches(
        strip_pandas_metadata, batch_format="pyarrow"
    )
