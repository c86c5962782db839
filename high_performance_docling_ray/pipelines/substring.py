"""Exact duplicated-substring removal — the ExactSubstr dedup of Lee
et al. 2022 ("Deduplicating Training Data Makes Language Models
Better"), re-expressed for Ray Data without the suffix array: every
L-token window that occurs at >=2 positions corpus-wide is excised
everywhere except its globally-first occurrence, where "first" is the
minimum of ``packed = doc_id * 2^20 + position`` (the segment_dedup
packing; positions are capped at 2^20 tokens per doc). A token is
removed iff at least one duplicated (non-winner) window covers it;
survivors are re-joined with single spaces.

Scale shape (the crossdoc_ngram_dup tiering):

- model pass: per-batch (h, packed) window rows — md5 ``hash64`` of
  the space-joined window, so the SQL oracle rebuilds identical keyed
  counts — one ``groupby(h)`` count/min exchange, then ``cnt >= 2``
  filter. Only DUPLICATED windows survive into the model, which is
  tiny for organic corpora.
- under ``dup_broadcast_budget`` model rows, the (h -> winner) arrays
  broadcast and a single second text pass marks + excises in place:
  no further exchange, text never shuffles.
- past the budget, window rows take a key-only ``cogroup_attach`` by
  h, dup starts regroup into per-doc start lists (bucket-keyed
  vectorized ``map_groups``), and ONE cogroup by doc_id meets the
  text; tiers pinned byte-equal in tests.

The organic corpus has no >=L-token cross-doc repeats, so (clean_corpus
idiom) deterministic passages are planted and mirrored exactly in the
SQL oracle: doc_id % 23 == 5 docs share one 10-token passage
(cross-doc dups; the lowest such doc_id keeps it), and doc_id % 29 == 7
docs append the same 9-token block twice (within-doc dup; the second
copy is excised).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..kernels.sketch import hash64_strings
from .corpus_clean import _tokenize
from .dedup import _collect_within_budget
from .joins import cogroup_attach, default_num_buckets, int_key_buckets
from .text_analysis import read_documents

POS_CAP = 1 << 20  # packed = doc_id * POS_CAP + position

SHARED_PASSAGE = (
    "the shared boilerplate footer appears on every mirrored page here"
)  # 10 tokens
REPEAT_BLOCK = "repeat block alpha beta gamma delta epsilon zeta eta"  # 9


def _plant_passages(batch: pa.Table) -> pa.Table:
    """Deterministic planted repeats, mirrored in the SQL oracle's
    CASE rewrite: without them no organic window of >= L tokens ever
    duplicates and the operator is vacuous on the synthetic corpus."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    shared = ids % 23 == 5
    # CASE precedence: a doc matching both gets ONLY the shared branch
    rep = (ids % 29 == 7) & ~shared
    text = pc.fill_null(batch.column("text"), "")
    if not (shared.any() or rep.any()):
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", text
        )
    vals = np.asarray(text.to_pylist(), object)
    vals[shared] = [f"{t} {SHARED_PASSAGE}" for t in vals[shared]]
    vals[rep] = [f"{t} {REPEAT_BLOCK} {REPEAT_BLOCK}" for t in vals[rep]]
    return batch.set_column(
        batch.schema.get_field_index("text"),
        "text",
        pa.array(vals.tolist(), pa.string()),
    )


def _window_arrays(batch: pa.Table, L: int):
    """Per-batch window rows: ``(doc_ids_per_window, rel_start,
    flat_start, h, flat, doc_idx, n_tokens)`` for every in-doc L-token
    window. flat/doc_idx/n_tokens are returned so excision can reuse
    the one tokenization."""
    flat, doc_idx, n_tokens = _tokenize(batch.column("text"))
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    offsets = np.concatenate(([0], np.cumsum(n_tokens)))[:-1]
    total = len(flat)
    if total < L:
        e = np.empty(0, np.int64)
        return (e, e, e, np.empty(0, np.uint64), flat, doc_idx, n_tokens)
    # a window starting at flat i stays in-doc iff doc_idx[i+L-1] ==
    # doc_idx[i] (windows never straddle doc boundaries)
    starts = np.flatnonzero(doc_idx[: total - L + 1] == doc_idx[L - 1 :])
    if not len(starts):
        e = np.empty(0, np.int64)
        return (e, e, e, np.empty(0, np.uint64), flat, doc_idx, n_tokens)
    parts = [flat.take(pa.array(starts + k)) for k in range(L)]
    joined = pc.binary_join_element_wise(*parts, " ")
    h = hash64_strings(joined)
    d = doc_idx[starts]
    rel = starts - offsets[d]
    return (doc_ids[d], rel, starts, h, flat, doc_idx, n_tokens)


def _excise(
    batch: pa.Table,
    L: int,
    flat,
    doc_idx: np.ndarray,
    n_tokens: np.ndarray,
    dup_flat_starts: np.ndarray,
) -> pa.Table:
    """Remove all tokens covered by any duplicated window (flat start
    indices) and re-join survivors per doc — one delta/cumsum interval
    union, one filter, one vectorized ``binary_join``."""
    total = len(flat)
    delta = np.zeros(total + 1, np.int64)
    if len(dup_flat_starts):
        np.add.at(delta, dup_flat_starts, 1)
        np.add.at(delta, dup_flat_starts + L, -1)
    covered = np.cumsum(delta[:-1]) > 0
    removed = np.bincount(
        doc_idx[covered], minlength=len(n_tokens)
    ).astype(np.int64)
    kept = ~covered
    kept_counts = n_tokens - removed
    offs = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
    values = flat.filter(pa.array(kept)) if total else flat
    clean = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offs, pa.int32()), values), " "
    )
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_removed": pa.array(removed, pa.int64()),
            "clean_text": clean,
        }
    )


def substring_dedup(
    sf_dir: str,
    L: int = 8,
    dup_broadcast_budget: int = 2_000_000,
    plant: bool = True,
) -> ray.data.Dataset:
    """ExactSubstr dedup over the documents table: returns one row per
    doc — (doc_id, n_tokens, n_removed, clean_text) — with every
    duplicated L-token window removed except its globally-first
    occurrence. See module docstring for the two scale tiers."""
    docs = read_documents(sf_dir, ("doc_id", "text"))
    if plant:
        docs = docs.map_batches(_plant_passages, batch_format="pyarrow")
    else:
        def _fill(b: pa.Table) -> pa.Table:
            return b.set_column(
                b.schema.get_field_index("text"),
                "text",
                pc.fill_null(b.column("text"), ""),
            )

        docs = docs.map_batches(_fill, batch_format="pyarrow")

    # model pass with a LOCAL (h -> cnt, min packed) combiner per batch
    # (windows repeat heavily whenever vocabulary is bounded) and a
    # bucket-keyed vectorized global fold — a raw groupby(h) aggregate
    # over one row per window was ~10x slower at 100k docs (NOTES_r3)
    num_model_parts = default_num_buckets()

    def model_partial(batch: pa.Table) -> pa.Table:
        d, rel, _, h, _, _, _ = _window_arrays(batch, L)
        hv = h.view(np.int64)
        packed = d * POS_CAP + rel
        if len(hv):
            order = np.argsort(hv, kind="stable")
            hs = hv[order]
            starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
            cnt = np.diff(np.r_[starts, len(hs)])
            minp = np.minimum.reduceat(packed[order], starts)
            uniq = hs[starts]
        else:
            uniq = np.empty(0, np.int64)
            cnt = np.empty(0, np.int64)
            minp = np.empty(0, np.int64)
        return pa.Table.from_pydict(
            {
                "h": pa.array(uniq, pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
                "minp": pa.array(minp, pa.int64()),
                "bucket": pa.array(int_key_buckets(uniq, num_model_parts)),
            }
        )

    def fold_bucket(group: pa.Table) -> pa.Table:
        hv = group.column("h").to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        minp = group.column("minp").to_numpy(zero_copy_only=False)
        order = np.argsort(hv, kind="stable")
        hs = hv[order]
        starts = np.flatnonzero(np.r_[True, hs[1:] != hs[:-1]])
        tot = np.add.reduceat(cnt[order], starts)
        win = np.minimum.reduceat(minp[order], starts)
        dup = tot >= 2  # only duplicated windows enter the model
        return pa.Table.from_pydict(
            {
                "h": pa.array(hs[starts][dup], pa.int64()),
                "win": pa.array(win[dup], pa.int64()),
            }
        )

    dup_model = (
        docs.map_batches(model_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold_bucket, batch_format="pyarrow")
    )
    dup_tbl = _collect_within_budget(dup_model, dup_broadcast_budget)

    if dup_tbl is not None:
        # a fully-dup-free corpus collects as a 0-row 0-COLUMN table
        # (NOTES_r3) — treat as an empty model
        if dup_tbl.num_rows and "h" in dup_tbl.column_names:
            hs = dup_tbl.column("h").to_numpy(zero_copy_only=False)
            ws = dup_tbl.column("win").to_numpy(zero_copy_only=False)
        else:
            hs = np.empty(0, np.int64)
            ws = np.empty(0, np.int64)
        order = np.argsort(hs)
        ref = ray.put((hs[order], ws[order]))

        def mark_and_excise(batch: pa.Table) -> pa.Table:
            h_sorted, w_sorted = ray.get(ref)
            d, rel, fstart, h, flat, doc_idx, n_tok = _window_arrays(
                batch, L
            )
            if len(h) and len(h_sorted):
                keys = h.view(np.int64)
                pos = np.minimum(
                    np.searchsorted(h_sorted, keys), len(h_sorted) - 1
                )
                dup = (h_sorted[pos] == keys) & (
                    d * POS_CAP + rel != w_sorted[pos]
                )
                starts = fstart[dup]
            else:
                starts = np.empty(0, np.int64)
            return _excise(batch, L, flat, doc_idx, n_tok, starts)

        return docs.map_batches(mark_and_excise, batch_format="pyarrow")

    # over-budget tier: key-only cogroup of window rows with the dup
    # model, then dup starts regroup into per-doc lists and meet the
    # text in ONE doc-keyed cogroup
    def pos_rows(batch: pa.Table) -> pa.Table:
        d, rel, _, h, _, _, _ = _window_arrays(batch, L)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(d, pa.int64()),
                "rel": pa.array(rel, pa.int64()),
                "h": pa.array(h.view(np.int64), pa.int64()),
            }
        )

    attached = cogroup_attach(
        docs.map_batches(pos_rows, batch_format="pyarrow"),
        dup_model,
        "h",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("rel", pa.int64()),
            pa.field("h", pa.int64()),
        ],
        payload_fields=[pa.field("win", pa.int64())],
    )

    def dup_starts(batch: pa.Table) -> pa.Table:
        win = batch.column("win")
        matched = win.is_valid().to_numpy(zero_copy_only=False)
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rel = batch.column("rel").to_numpy(zero_copy_only=False)
        w = pc.fill_null(win, -1).to_numpy(zero_copy_only=False)
        dup = matched & (d * POS_CAP + rel != w)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(d[dup], pa.int64()),
                "rel": pa.array(rel[dup], pa.int64()),
            }
        )

    num_parts = default_num_buckets()

    def add_bucket(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(int_key_buckets(d, num_parts))
        )

    def lists_in_bucket(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        rel = group.column("rel").to_numpy(zero_copy_only=False)
        order = np.lexsort((rel, d))
        d, rel = d[order], rel[order]
        first = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        offs = np.concatenate((first, [len(d)])).astype(np.int32)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(d[first], pa.int64()),
                "starts": pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), pa.array(rel, pa.int64())
                ),
            }
        )

    start_lists = (
        attached.map_batches(dup_starts, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lists_in_bucket, batch_format="pyarrow")
    )

    with_starts = cogroup_attach(
        docs,
        start_lists,
        "doc_id",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("text", pa.string()),
        ],
        payload_fields=[pa.field("starts", pa.list_(pa.int64()))],
    )

    def excise_joined(batch: pa.Table) -> pa.Table:
        flat, doc_idx, n_tok = _tokenize(batch.column("text"))
        offsets = np.concatenate(([0], np.cumsum(n_tok)))[:-1]
        starts_col = batch.column("starts")
        sflat = pc.list_flatten(starts_col).to_numpy(zero_copy_only=False)
        lens = pc.fill_null(
            pc.list_value_length(starts_col), 0
        ).to_numpy(zero_copy_only=False)
        rows = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        dup_flat = offsets[rows] + sflat
        return _excise(batch, L, flat, doc_idx, n_tok, dup_flat)

    return with_starts.map_batches(excise_joined, batch_format="pyarrow")
