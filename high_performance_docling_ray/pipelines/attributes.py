"""Dolma-style attribute sidecars: TAG once, MIX many times.

Large curation runs decouple per-doc quality signals from filtering
decisions (Dolma's tagger/mixer architecture): taggers write per-doc
ATTRIBUTE rows to a persisted sidecar store keyed by doc id — never
rewriting the corpus — and a later "mixer" pass joins attributes back
to the documents and applies a filter policy. Changing the policy
re-runs only the cheap mixer join, not the taggers.

Shape at scale:
  - the tagger is ONE pure-map pass over text (token count, quality
    score, language agreement — all existing hash-verified kernels);
    attribute rows (4 small columns) are written parquet-partitioned
    by ``bucket = doc_id % num_buckets`` with the repo's persisted-
    artifact convention (content-keyed cache dir + ``_SUCCESS``,
    like similarity.py:build_ivf_index).
  - the mixer joins documents to the store with ONE key-only
    ``cogroup_attach`` on doc_id (joins.py) — text never moves, and
    nothing broadcasts, so the join works at any corpus size.

The reference has no corpus-level curation (SURVEY.md §2.6 corpus
rows); this family comes from the north-rule's training-data mandate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..kernels.text_stats import (
    detect_language,
    quality_score,
    token_count,
)
from .joins import cogroup_attach
from .text_analysis import read_documents

NUM_BUCKETS = 8


def build_attribute_store(
    sf_dir: str, num_buckets: int = NUM_BUCKETS, out_dir: str | None = None
) -> str:
    """One-time persisted attribute sidecar for the documents table:
    (doc_id, n_ws_tokens, quality, lang_agrees, bucket) parquet rows
    partitioned by ``bucket = doc_id % num_buckets``."""
    import hashlib
    import os
    import shutil

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    if out_dir is None:
        tag = hashlib.md5(
            f"{src}:{num_buckets}:v1:{content_tag}".encode()
        ).hexdigest()[:12]
        out_dir = f"/tmp/graft_attrs/{tag}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def tag_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_ws_tokens": pa.array(
                    [token_count(t) for t in texts], pa.int64()
                ),
                "quality": pa.array(
                    [round(quality_score(t), 6) for t in texts],
                    pa.float64(),
                ),
                "lang_agrees": pa.array(
                    [
                        detect_language(t) == (lg if lg is not None else "")
                        for t, lg in zip(texts, langs)
                    ],
                    pa.bool_(),
                ),
                "bucket": pa.array(
                    (ids % num_buckets).astype(np.int32), pa.int32()
                ),
            }
        )

    read_documents(sf_dir, ("doc_id", "text", "lang")).map_batches(
        tag_batch, batch_format="pyarrow"
    ).write_parquet(out_dir, partition_cols=["bucket"])
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def _read_store(store_dir: str) -> ray.data.Dataset:
    from .io import read_parquet_clean

    return read_parquet_clean(store_dir).drop_columns(["bucket"])


def tag_attributes(sf_dir: str) -> ray.data.Dataset:
    """The tagger's output, read back from the persisted sidecar:
    (doc_id, n_ws_tokens, quality, lang_agrees)."""
    return _read_store(build_attribute_store(sf_dir))


def mix_attributes(
    sf_dir: str,
    min_tokens: int = 20,
    min_quality: float = 0.7,
) -> ray.data.Dataset:
    """The mixer: join documents to the attribute sidecar by doc_id
    (one key-only cogroup — text stays put) and apply the filter
    policy. Verdict precedence: too_short > low_quality >
    lang_mismatch > keep.

    Output: (doc_id, n_chars, keep, reason).
    """
    store = build_attribute_store(sf_dir)
    docs = read_documents(sf_dir, ("doc_id", "n_chars"))
    joined = cogroup_attach(
        docs,
        _read_store(store),
        key="doc_id",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("n_chars", pa.int64()),
        ],
        payload_fields=[
            pa.field("n_ws_tokens", pa.int64()),
            pa.field("quality", pa.float64()),
            pa.field("lang_agrees", pa.bool_()),
        ],
    )

    def verdict(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ntok = pc.fill_null(batch.column("n_ws_tokens"), 0).to_numpy(
            zero_copy_only=False
        )
        q = pc.fill_null(batch.column("quality"), 0.0).to_numpy(
            zero_copy_only=False
        )
        agrees = pc.fill_null(batch.column("lang_agrees"), False).to_numpy(
            zero_copy_only=False
        )
        reason = np.full(batch.num_rows, "keep", dtype=object)
        reason[~agrees] = "lang_mismatch"
        reason[q < min_quality] = "low_quality"
        reason[ntok < min_tokens] = "too_short"
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": batch.column("n_chars"),
                "keep": pa.array(reason == "keep", pa.bool_()),
                "reason": pa.array(reason, pa.string()),
            }
        )

    return joined.map_batches(verdict, batch_format="pyarrow")
