"""Text-analysis pipelines over the ``documents`` table.

All single-pass ``map_batches`` transforms (no shuffle) except the
aggregations, which pre-aggregate per batch before the small groupby.
"""

from __future__ import annotations

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
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


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


def lang_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-language doc count + mean n_chars, with per-batch partial
    aggregation before the (tiny) groupby shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = (
            batch.group_by("lang")
            .aggregate([("n_chars", "sum"), ("n_chars", "count")])
            .rename_columns(["lang", "sum_chars", "n_docs"])
        )
        _ = pc
        return out

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    combined = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .sum(["sum_chars", "n_docs"])
    )

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

    return combined.map_batches(finalize, batch_format="pyarrow")
