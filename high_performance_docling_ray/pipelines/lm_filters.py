"""LM-training data filters the reference's single-document scope
never needed, but a 100-TB pretraining pipeline always runs:
benchmark decontamination (drop/flag training docs that share n-gram
shingles with a held-out eval set — GPT-3 appendix C / The Pile's
13-gram rule) and CCNet-style unigram language-model scoring (per-doc
mean token log-probability under the corpus unigram distribution, the
cheap stand-in for the KenLM perplexity filter).

Shuffle discipline (same tiering as pipelines/dedup.py):

- ``decontaminate``'s eval shingle-hash set is tiny relative to the
  training corpus (eval benchmarks are MBs, training data is TBs), so
  the common tier broadcasts one sorted uint64 hash array via
  ``ray.put`` and every training batch probes it with a vectorized
  ``searchsorted`` — zero exchanges over the big side. Past
  ``eval_broadcast_budget`` it degrades to one key-only exchange:
  distinct (hash, doc_id) rows cogrouped with the distinct eval hash
  set (``cogroup_attach``), then a doc-keyed count. Payload text never
  shuffles in either tier.
- ``unigram_logprob`` is the classic two-pass: token partial counts
  (per-batch combiner -> small token groupby) for the model, then a
  pure-map scoring pass under ``cnt_broadcast_budget``, else a fully
  distributed ``cogroup_attach`` of counts onto (doc_id, token, tf)
  rows by token followed by a per-doc aggregate.

Token/shingle semantics are shared with the rest of the repo so the
driver-gate oracles stay bit-exact: shingles are
``kernels.text_stats.ngram_set`` (lowercased word n-grams, whole-doc
shingle below n tokens) hashed with the md5 ``hash64`` that DuckDB
reproduces as ``md5_number_upper``; unigram tokens are the
``corpus_clean._tokenize`` whitespace tokens (not lowercased),
matching ``tfidf_topk``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..kernels.sketch import hash64, hash64_strings
from ..kernels.text_stats import ngram_set
from .corpus_clean import _tokenize, doc_tf_rows
from .dedup import _collect_within_budget
from .joins import cogroup_attach
from .text_analysis import read_documents


def _shingle_hash_rows(batch: pa.Table, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT shingle hashes for a (doc_id, text) batch.

    Returns ``(hashes_uint64, doc_ids_int64)`` flat row arrays.
    ``ngram_set`` already dedups within a doc; empty/null texts emit
    no rows.
    """
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    hv: list[np.ndarray] = []
    dv: list[np.ndarray] = []
    for did, text in zip(doc_ids, texts):
        shingles = ngram_set(text or "", n)
        if not shingles:
            continue
        # no sort: downstream is set membership / distinct counts, and
        # set iteration order never reaches any output
        hv.append(hash64(list(shingles)))
        dv.append(np.full(len(shingles), did, np.int64))
    if not hv:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    return np.concatenate(hv), np.concatenate(dv)


_LEAK_SUFFIXES = np.array(
    [
        f" leak sequence {v} alpha beta gamma delta epsilon zeta eta"
        for v in range(3)
    ],
    dtype=object,
)


def _plant_leaks(batch: pa.Table, holdout_mod: int) -> pa.Table:
    """Append a deterministic leak phrase to eval docs (variant
    ``(doc_id // holdout_mod) % 3``) and to training docs with
    ``doc_id % 7 == 3`` (variant ``doc_id % 3``) — the synthetic corpus
    shares almost no organic 8-grams, so planting (mirrored exactly in
    the SQL oracle) is what makes the contamination path observable
    end to end, same idiom as ``redact_pii``."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    is_eval = ids % holdout_mod == 0
    variant = np.where(is_eval, (ids // holdout_mod) % 3, ids % 3)
    mask = is_eval | (ids % 7 == 3)
    suffix = np.where(mask, _LEAK_SUFFIXES[variant], "")
    text = pc.binary_join_element_wise(
        batch.column("text"), pa.array(suffix.tolist(), pa.string()), ""
    )
    return batch.set_column(
        batch.schema.get_field_index("text"), "text", text
    )


def split_contamination(
    sf_dir: str, n: int = 8, combine_limit: int = 2_000_000
) -> pa.Table:
    """Quantify train->holdout shingle leakage under BOTH split rules:
    the number of distinct ``n``-gram shingles that appear in a TRAIN
    document AND in a holdout (valid/test) document, once for the
    per-doc split (``dataset_split``'s hash rule) and once for the
    leakage-safe per-source split (``dataset_split_by_source``) — the
    measurement that justifies grouped splitting (boilerplate shared
    within a source inflates the per-doc number, and the grouped rule
    moves those shingles wholly to one side).

    Scale shape: per-block flag partials OR-reduce by shingle hash
    (4 int8 max columns; bounded by DISTINCT shingles per block),
    merged under the combine budget with the Ray groupby(h).max
    fallback; the two conjunction counts fold from per-block row
    counts of the grouped output (additive over disjoint hash
    groups), so nothing shingle-sized lands on the driver in the
    over-budget tier. ``split_contamination_grouped`` forces it."""
    from ..kernels.sketch import hash64
    from .relational import _combine_partials, _read, collect_arrow

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    _EMPTY = pa.Table.from_pydict(
        {"h": pa.array([], pa.uint64()),
         **{c: pa.array([], pa.int8())
            for c in ("dtr", "dte", "str_", "ste")}}
    )

    def partial(batch: pa.Table) -> pa.Table:
        hv, dv = _shingle_hash_rows(batch, n)
        if not len(hv):
            return _EMPTY
        from .corpus_clean import split_of_doc_ids, split_of_sources

        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        # the SHARED split rules: this op provably measures exactly
        # what dataset_split / dataset_split_by_source apply
        doc_train = split_of_doc_ids(ids) == "train"
        src_train = split_of_sources(batch.column("source")) == "train"
        order = np.argsort(ids, kind="stable")
        pos = np.searchsorted(ids[order], dv)
        ridx = order[pos]
        t = pa.Table.from_pydict(
            {
                "h": pa.array(hv, pa.uint64()),
                "dtr": pa.array(
                    doc_train[ridx].astype(np.int8), pa.int8()),
                "dte": pa.array(
                    (~doc_train[ridx]).astype(np.int8), pa.int8()),
                "str_": pa.array(
                    src_train[ridx].astype(np.int8), pa.int8()),
                "ste": pa.array(
                    (~src_train[ridx]).astype(np.int8), pa.int8()),
            }
        )
        return t.group_by("h").aggregate(
            [(c, "max") for c in ("dtr", "dte", "str_", "ste")]
        ).rename_columns(["h", "dtr", "dte", "str_", "ste"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow"
    ).materialize()
    flags = ("dtr", "dte", "str_", "ste")
    merged = _combine_partials(
        partials, ["h"], list(flags), combine_limit, agg="max"
    )

    if merged is not None:
        doc_shared = int(
            (
                (merged.column("max(dtr)").to_numpy(
                    zero_copy_only=False) == 1)
                & (merged.column("max(dte)").to_numpy(
                    zero_copy_only=False) == 1)
            ).sum()
        )
        src_shared = int(
            (
                (merged.column("max(str_)").to_numpy(
                    zero_copy_only=False) == 1)
                & (merged.column("max(ste)").to_numpy(
                    zero_copy_only=False) == 1)
            ).sum()
        )
    else:
        grouped = partials.groupby("h").max(list(flags))

        def fold(b: pa.Table) -> pa.Table:
            dtr = b.column("max(dtr)").to_numpy(zero_copy_only=False)
            dte = b.column("max(dte)").to_numpy(zero_copy_only=False)
            st = b.column("max(str_)").to_numpy(zero_copy_only=False)
            se = b.column("max(ste)").to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {
                    "doc_shared": pa.array(
                        [int(((dtr == 1) & (dte == 1)).sum())],
                        pa.int64()),
                    "src_shared": pa.array(
                        [int(((st == 1) & (se == 1)).sum())],
                        pa.int64()),
                }
            )

        folded = collect_arrow(
            grouped.map_batches(fold, batch_format="pyarrow")
        )
        doc_shared = int(
            folded.column("doc_shared").to_numpy().sum()
        ) if folded.num_rows else 0
        src_shared = int(
            folded.column("src_shared").to_numpy().sum()
        ) if folded.num_rows else 0
    return pa.Table.from_pydict(
        {
            "rule": pa.array(["doc", "source"], pa.string()),
            "shared_shingles": pa.array(
                [doc_shared, src_shared], pa.int64()
            ),
        }
    )


def decontaminate(
    sf_dir: str,
    n: int = 8,
    holdout_mod: int = 50,
    eval_broadcast_budget: int = 4_000_000,
    plant: bool = True,
) -> ray.data.Dataset:
    """Flag training documents contaminated by a held-out eval set.

    The eval set is the deterministic slice ``doc_id % holdout_mod ==
    0`` (standing in for a benchmark suite); a training doc is
    contaminated if it shares ANY lowercased word ``n``-gram with any
    eval doc. Output: one ``(doc_id, n_hits)`` row per contaminated
    training doc, ``n_hits`` = number of DISTINCT shared shingles.

    Tier 1 (common): the eval set's distinct shingle-hash array is
    collected under ``eval_broadcast_budget`` rows, ``ray.put`` once,
    and probed per training batch with ``np.searchsorted`` — the
    training corpus streams with zero exchanges. Tier 2: distinct
    (hash, doc_id) training rows LEFT-cogrouped with the distinct
    eval-hash set by hash (one key-only exchange), then
    ``groupby(doc_id).count()``. Hashes are md5 ``hash64`` ==
    ``md5_number_upper``, so the SQL oracle rebuilds them exactly
    (collisions, if any, collide identically on both sides).
    """
    docs = read_documents(sf_dir, ("doc_id", "text"))
    if plant:
        docs = docs.map_batches(
            lambda b: _plant_leaks(b, holdout_mod), batch_format="pyarrow"
        )
    is_eval_expr = lambda ids: ids % holdout_mod == 0  # noqa: E731

    def eval_hash_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(is_eval_expr(ids)))
        hv, _ = _shingle_hash_rows(sub, n)
        # int64 bit-view: cogroup/groupby keys are int64; the bit
        # pattern is what must match, not the sign
        return pa.Table.from_pydict(
            {"h": pa.array(np.unique(hv).view(np.int64), pa.int64())}
        )

    eval_hash_ds = docs.map_batches(eval_hash_partial, batch_format="pyarrow")

    def train_hits_factory(eval_sorted_ref):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            sub = batch.filter(pa.array(~is_eval_expr(ids)))
            hv, dv = _shingle_hash_rows(sub, n)
            out_ids = np.empty(0, np.int64)
            out_hits = np.empty(0, np.int64)
            if len(hv):
                ev = ray.get(eval_sorted_ref)
                pos = np.searchsorted(ev, hv)
                hit = (pos < len(ev)) & (ev[np.minimum(pos, len(ev) - 1)] == hv)
                if hit.any():
                    # per-doc hit counts; hv is distinct within doc
                    hit_docs = dv[hit]
                    uniq, cnt = np.unique(hit_docs, return_counts=True)
                    out_ids, out_hits = uniq, cnt.astype(np.int64)
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(out_ids, pa.int64()),
                    "n_hits": pa.array(out_hits, pa.int64()),
                }
            )

        return f

    eval_tbl = _collect_within_budget(eval_hash_ds, eval_broadcast_budget)
    if eval_tbl is not None:
        if eval_tbl.num_columns == 0 or eval_tbl.num_rows == 0:
            # no eval shingles: nothing can be contaminated
            return docs.map_batches(
                lambda b: pa.Table.from_pydict(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "n_hits": pa.array([], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        ev = np.unique(
            eval_tbl.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        )
        ref = ray.put(ev)
        return docs.map_batches(
            train_hits_factory(ref), batch_format="pyarrow"
        )

    # over-budget tier: key-only exchange, text never moves
    return _cogroup_contamination(docs, n, holdout_mod)


def _cogroup_contamination(
    docs: ray.data.Dataset, n: int, holdout_mod: int
) -> ray.data.Dataset:
    """Distributed contamination counts ``(doc_id, n_hits)`` — the
    over-budget tier shared by ``decontaminate`` and ``clean_corpus``:
    distinct (hash, doc_id) training rows LEFT-cogrouped with the
    distinct eval-hash set by hash, filtered to hits, doc-keyed count.
    ``docs`` must already carry any planting."""

    def eval_hash_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % holdout_mod == 0))
        hv, _ = _shingle_hash_rows(sub, n)
        return pa.Table.from_pydict(
            {"h": pa.array(np.unique(hv).view(np.int64), pa.int64())}
        )

    def train_hash_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % holdout_mod != 0))
        hv, dv = _shingle_hash_rows(sub, n)
        return pa.Table.from_pydict(
            {
                "h": pa.array(hv.view(np.int64), pa.int64()),
                "doc_id": pa.array(dv, pa.int64()),
            }
        )

    eval_distinct = (
        docs.map_batches(eval_hash_partial, batch_format="pyarrow")
        .groupby("h")
        .count()
        .map_batches(
            lambda b: pa.Table.from_pydict(
                {
                    "h": b.column("h"),
                    "hit": pa.array(
                        np.ones(b.num_rows, np.int8), pa.int8()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    joined = cogroup_attach(
        docs.map_batches(train_hash_partial, batch_format="pyarrow"),
        eval_distinct,
        key="h",
        left_fields=[
            pa.field("h", pa.int64()),
            pa.field("doc_id", pa.int64()),
        ],
        payload_fields=[pa.field("hit", pa.int8())],
    )

    def keep_hits(batch: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.equal(batch.column("hit"), 1), False)
        return batch.filter(mask).select(["doc_id"])

    hits = joined.map_batches(keep_hits, batch_format="pyarrow")
    counted = hits.groupby("doc_id").count()
    return counted.map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "doc_id": b.column("doc_id"),
                "n_hits": pc.cast(b.column("count()"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def unigram_logprob(
    sf_dir: str,
    cnt_broadcast_budget: int = 2_000_000,
) -> ray.data.Dataset:
    """Per-document mean unigram log-probability — the CCNet-style
    quality score (docs far from the corpus distribution score low).

    ``logprob = round(sum_t tf_t * ln(cnt_t / total) / n_tokens, 6)``
    over the doc's whitespace tokens (``corpus_clean._tokenize``
    semantics == ``tfidf_topk``); docs with zero tokens emit no row.

    Pass 1 builds the model: per-batch token-count combiner -> one
    small token-keyed groupby (vocabulary-sized, sublinear in corpus).
    Pass 2 scores: pure map under ``cnt_broadcast_budget`` (count
    table ``ray.put`` once), else a distributed ``cogroup_attach`` of
    counts onto (doc_id, token, tf) rows by token and a per-doc
    ``map_groups`` — no tier ever ships document text through an
    exchange.
    """
    docs = read_documents(sf_dir, ("doc_id", "text"))

    def partial_counts(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tokenize(batch.column("text"))
        codes_arr = pc.dictionary_encode(flat)
        codes = np.asarray(
            codes_arr.indices.to_numpy(zero_copy_only=False), np.int64
        )
        if not len(codes):
            return pa.Table.from_pydict(
                {"token": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        cnt = np.bincount(codes).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "token": codes_arr.dictionary,
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    cnt_ds = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
    )

    def doc_rows(doc_ids, tfs, lps):
        """(sorted-by-doc groups) -> per-doc mean logprob table."""
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs, lps = doc_ids[order], tfs[order], lps[order]
        boundary = np.flatnonzero(
            np.r_[True, doc_ids[1:] != doc_ids[:-1]]
        )
        sums = np.add.reduceat(tfs * lps, boundary)
        n_tok = np.add.reduceat(tfs, boundary)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids[boundary], pa.int64()),
                "n_tokens": pa.array(n_tok.astype(np.int64), pa.int64()),
                "logprob": pa.array(
                    np.round(sums / n_tok, 6), pa.float64()
                ),
            }
        )

    cnt_tbl = _collect_within_budget(cnt_ds, cnt_broadcast_budget)
    if cnt_tbl is not None and cnt_tbl.num_rows:
        counts = cnt_tbl.column("sum(cnt)").to_numpy(zero_copy_only=False)
        total = float(counts.sum())
        lookup_ref = ray.put(
            dict(
                zip(
                    cnt_tbl.column("token").to_pylist(),
                    (counts / total).tolist(),
                )
            )
        )

        def score(batch: pa.Table) -> pa.Table:
            import pandas as pd

            tf_tbl = doc_tf_rows(batch)
            if tf_tbl.num_rows == 0:
                return pa.Table.from_pydict(
                    {"doc_id": pa.array([], pa.int64()),
                     "n_tokens": pa.array([], pa.int64()),
                     "logprob": pa.array([], pa.float64())}
                )
            lookup = ray.get(lookup_ref)
            tok = tf_tbl.column("token").to_numpy(zero_copy_only=False)
            p = pd.Series(tok, dtype=object).map(lookup).to_numpy(np.float64)
            return doc_rows(
                tf_tbl.column("doc_id").to_numpy(zero_copy_only=False),
                tf_tbl.column("tf")
                .to_numpy(zero_copy_only=False)
                .astype(np.float64),
                np.log(p),
            )

        return docs.map_batches(score, batch_format="pyarrow")

    # over-budget tier: distribute the count attach by token
    total = float(
        cnt_ds.sum("sum(cnt)")  # small vocabulary-sized aggregate
    )

    def rename_cnt(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["token", "cnt"])

    tf_rows = docs.map_batches(doc_tf_rows, batch_format="pyarrow")
    joined = cogroup_attach(
        tf_rows,
        cnt_ds.map_batches(rename_cnt, batch_format="pyarrow"),
        key="token",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("token", pa.string()),
            pa.field("tf", pa.int64()),
        ],
        payload_fields=[pa.field("cnt", pa.int64())],
    )

    def per_doc(group: pa.Table) -> pa.Table:
        tfs = (
            group.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        cnts = (
            group.column("cnt")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        return doc_rows(
            group.column("doc_id").to_numpy(zero_copy_only=False),
            tfs,
            np.log(cnts / total),
        )

    # bucket docs so the exchange keys on ~4*CPU buckets and per_doc
    # resolves every doc in the bucket with one argsort + reduceat —
    # groupby(doc_id).map_groups would be one Python call per doc
    from .joins import default_num_buckets, int_key_buckets

    num_parts = default_num_buckets()

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(int_key_buckets(ids, num_parts))
        )

    return (
        joined.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_doc, batch_format="pyarrow")
    )


def pack_sequences(
    sf_dir: str,
    capacity: int = 512,
    bucket_docs: int = 64,
    return_assignments: bool = False,
    docs: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """GPT-style sequence packing: concatenate every document's tokens
    in doc_id order and cut fixed-``capacity`` training sequences,
    reporting per-chunk stats ``(chunk_id, n_tokens, n_docs,
    first_doc, last_doc)``. Zero-token docs are skipped (they occupy
    no positions).

    The global token offset of each doc is a distributed TWO-LEVEL
    PREFIX SUM — the scale pattern for any "global position" need:

    1. per-batch combiner: (bucket = doc_id // bucket_docs) token
       subtotals -> tiny groupby (corpus/bucket_docs rows);
    2. the bucket totals come to the driver (at 10^12 docs and 2^20
       docs/bucket that is ~10^6 rows), one exclusive cumsum, broadcast
       via ``ray.put``;
    3. per-bucket ``map_groups``: docs sort locally by doc_id, a local
       cumsum plus the bucket's offset gives every doc its global
       [start, end) token span with no further exchange;
    4. each doc emits one row per chunk it overlaps (<= n_tok/capacity
       + 1), and a chunk-keyed groupby folds spans into per-chunk
       stats.

    Exchanges: one tiny bucket groupby, one bucket-keyed regroup, one
    chunk-keyed groupby — document TEXT never shuffles, only
    (doc_id, n_tok) and (chunk_id, overlap) key rows.

    ``docs`` overrides the source dataset (any (doc_id, text) stream —
    e.g. the survivors of ``clean_corpus``); default reads sf_dir's
    documents table.
    """
    if docs is None:
        docs = read_documents(sf_dir, ("doc_id", "text"))
    counts = _tok_count_rows(docs, bucket_docs)
    return _pack_from_counts(
        counts, capacity, bucket_docs, return_assignments
    )


def _tok_count_rows(
    docs: ray.data.Dataset, bucket_docs: int
) -> ray.data.Dataset:
    """(doc_id, text) stream -> materialized (doc_id, n_tok, bucket)
    key rows (zero-token docs dropped) — ~24 B/doc, far smaller than
    re-tokenizing the text for a second pass."""

    def tok_counts(batch: pa.Table) -> pa.Table:
        _, _, n_tok = _tokenize(batch.column("text"))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = n_tok > 0
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_tok": pa.array(n_tok[keep], pa.int64()),
                "bucket": pa.array(ids[keep] // bucket_docs, pa.int64()),
            }
        )

    return docs.map_batches(tok_counts, batch_format="pyarrow").materialize()


def _pack_from_counts(
    counts: ray.data.Dataset,
    capacity: int,
    bucket_docs: int,
    return_assignments: bool,
) -> ray.data.Dataset:
    """The packing core over (doc_id, n_tok, bucket) key rows — see
    ``pack_sequences`` for the two-level prefix-sum shape."""

    def bucket_partial(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        n = batch.column("n_tok").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(b, return_inverse=True)
        sums = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(uniq, pa.int64()),
                "tok": pa.array(sums, pa.int64()),
            }
        )

    bucket_tbl = (
        counts.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum("tok")
        .sort("bucket")
        .to_arrow_refs()
    )
    parts = [t for t in ray.get(bucket_tbl) if t.num_rows]
    if not parts:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "chunk_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "first_doc": pa.array([], pa.int64()),
                    "last_doc": pa.array([], pa.int64()),
                }
            )
        )
    merged = pa.concat_tables(parts)
    buckets = merged.column("bucket").to_numpy(zero_copy_only=False)
    totals = merged.column("sum(tok)").to_numpy(zero_copy_only=False)
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]])
    offset_ref = ray.put(dict(zip(buckets.tolist(), offsets.tolist())))

    def chunk_rows(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        n = group.column("n_tok").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, n = ids[order], n[order]
        base = ray.get(offset_ref)[int(ids[0] // bucket_docs)]
        ends = base + np.cumsum(n)
        starts = ends - n
        first_chunk = starts // capacity
        last_chunk = (ends - 1) // capacity
        reps = (last_chunk - first_chunk + 1).astype(np.int64)
        doc_rep = np.repeat(np.arange(len(ids)), reps)
        chunk = np.concatenate(
            [np.arange(f, l + 1) for f, l in zip(first_chunk, last_chunk)]
        ) if len(ids) else np.empty(0, np.int64)
        ov = np.minimum(ends[doc_rep], (chunk + 1) * capacity) - np.maximum(
            starts[doc_rep], chunk * capacity
        )
        return pa.Table.from_pydict(
            {
                "chunk_id": pa.array(chunk, pa.int64()),
                "doc_id": pa.array(ids[doc_rep], pa.int64()),
                "ov": pa.array(ov.astype(np.int64), pa.int64()),
            }
        )

    spans = counts.groupby("bucket").map_groups(
        chunk_rows, batch_format="pyarrow"
    )
    if return_assignments:
        # the per-doc training artifact: which chunk(s) each doc's
        # tokens land in and how many (a doc spans >1 chunk when it
        # crosses a capacity boundary)
        return spans.map_batches(
            lambda b: b.rename_columns(["chunk_id", "doc_id", "n_tokens"]),
            batch_format="pyarrow",
        )

    # per-batch pyarrow combiner + one vectorized multi-aggregate
    # groupby (partials merge as sum/sum/min/max) — no per-group Python
    from ray.data.aggregate import Max, Min, Sum

    def span_partials(batch: pa.Table) -> pa.Table:
        return batch.group_by("chunk_id").aggregate(
            [
                ("ov", "sum"),
                ("doc_id", "count"),
                ("doc_id", "min"),
                ("doc_id", "max"),
            ]
        )

    stats = (
        spans.map_batches(span_partials, batch_format="pyarrow")
        .groupby("chunk_id")
        .aggregate(
            Sum("ov_sum"),
            Sum("doc_id_count"),
            Min("doc_id_min"),
            Max("doc_id_max"),
        )
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "chunk_id": batch.column("chunk_id"),
                "n_tokens": pc.cast(batch.column("sum(ov_sum)"), pa.int64()),
                "n_docs": pc.cast(
                    batch.column("sum(doc_id_count)"), pa.int64()
                ),
                "first_doc": pc.cast(
                    batch.column("min(doc_id_min)"), pa.int64()
                ),
                "last_doc": pc.cast(
                    batch.column("max(doc_id_max)"), pa.int64()
                ),
            }
        )

    return stats.map_batches(finalize, batch_format="pyarrow")


# doc_id inside the repeated phrase keeps spam docs distinct from each
# other (identical spam would fail exact_dup before repetitious)
def _spam_text(doc_id: int) -> str:
    return " ".join([f"click here buy now {doc_id}"] * 10)


_DUP_FILLER = (
    "lorem ipsum dolor sit amet consectetur adipiscing"
    " elit sed do eiusmod tempor"
)


def _plant_clean(batch: pa.Table, holdout_mod: int) -> pa.Table:
    """Deterministic plantings for the composite cleaner — the
    synthetic corpus contains no organic exact dups, spam repetition or
    eval leaks, so each rule gets a planted population (mirrored
    exactly in the SQL oracle). Precedence: eval docs keep their leak
    suffix (they ARE the benchmark), then dup pairs (doc_id % 41 in
    {7, 8} share text per 41-block), then spam docs (% 37 == 11), then
    leaked train docs (% 7 == 3)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column("text")
    is_eval = ids % holdout_mod == 0
    is_dup = ~is_eval & np.isin(ids % 41, (7, 8))
    is_spam = ~is_eval & ~is_dup & (ids % 37 == 11)
    is_leak = ~is_eval & ~is_dup & ~is_spam & (ids % 7 == 3)
    variant = np.where(is_eval, (ids // holdout_mod) % 3, ids % 3)
    suffix = np.where(is_eval | is_leak, _LEAK_SUFFIXES[variant], "")
    base = pc.binary_join_element_wise(
        texts, pa.array(suffix.tolist(), pa.string()), ""
    ).to_numpy(zero_copy_only=False).astype(object)
    if is_dup.any():
        base[is_dup] = np.array(
            [
                f"dup block content {k} {_DUP_FILLER}"
                for k in ids[is_dup] // 41
            ],
            dtype=object,
        )
    if is_spam.any():
        base[is_spam] = np.array(
            [_spam_text(k) for k in ids[is_spam]], dtype=object
        )
    return batch.set_column(
        batch.schema.get_field_index("text"),
        "text",
        pa.array(base.tolist(), pa.string()),
    )


def clean_corpus(
    sf_dir: str,
    min_tokens: int = 15,
    max_dup_trigram: float = 0.25,
    max_top_bigram: float = 0.5,
    min_quality: float = 0.55,
    n_shingle: int = 8,
    holdout_mod: int = 50,
    eval_broadcast_budget: int = 4_000_000,
    plant: bool = True,
) -> ray.data.Dataset:
    """The composite C4/Gopher-style cleaning pipeline: every doc gets
    a keep/drop verdict with the FIRST failing rule as its reason —

        holdout      doc_id % holdout_mod == 0 (the eval slice itself)
        too_short    n_tokens < min_tokens
        exact_dup    not the min-doc_id owner of its md5(text) group
        repetitious  dup_trigram_frac > max_dup_trigram
                     or top_bigram_frac > max_top_bigram (Gopher)
        low_quality  quality score < min_quality
        contaminated shares an n_shingle-gram with any eval doc

    Output: ``(doc_id, keep, reason)`` for EVERY doc (reason null when
    kept) — the audit table a data curator reads before training.

    One streaming pass computes every per-doc signal (token stats via
    the shared ``repetition_stats_rows`` kernel, md5 content hash,
    quality score, eval-shingle probe against a budgeted broadcast —
    same machinery as ``decontaminate``); exact-dup winners are the
    ``groupby(text_hash).min(doc_id)`` attached back by one
    ``cogroup_attach`` — so the only exchanges are hash-keyed rows of
    a few dozen bytes, never document text.

    Scale note: the eval-hash build is a SECOND pass over the corpus
    here only because the synthetic eval set is a doc_id slice of the
    same table; in a real deployment the benchmark suite is its own
    small table and that pass reads ONLY it (the flags pass over the
    training corpus stays single-read either way).
    """
    from ..kernels.text_stats import md5_fingerprint, quality_score
    from .corpus_clean import repetition_stats_rows

    docs = read_documents(sf_dir, ("doc_id", "text"))
    if plant:
        docs = docs.map_batches(
            lambda b: _plant_clean(b, holdout_mod), batch_format="pyarrow"
        )

    def eval_hash_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sub = batch.filter(pa.array(ids % holdout_mod == 0))
        hv, _ = _shingle_hash_rows(sub, n_shingle)
        return pa.Table.from_pydict(
            {"h": pa.array(np.unique(hv).view(np.int64), pa.int64())}
        )

    eval_tbl = _collect_within_budget(
        docs.map_batches(eval_hash_partial, batch_format="pyarrow"),
        eval_broadcast_budget,
    )
    # broadcast tier: contamination is probed inline in the signal
    # pass; over budget, flags carry False and the distributed
    # _cogroup_contamination ids are attached by doc_id at the end
    broadcast_cont = eval_tbl is not None
    ev = (
        np.unique(
            eval_tbl.column("h").to_numpy(zero_copy_only=False).view(
                np.uint64
            )
        )
        if broadcast_cont and eval_tbl.num_columns and eval_tbl.num_rows
        else np.empty(0, np.uint64)
    )
    ev_ref = ray.put(ev)

    def flags(batch: pa.Table) -> pa.Table:
        rep = repetition_stats_rows(batch)
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        evh = ray.get(ev_ref)
        contaminated = np.zeros(len(ids), bool)
        train_mask = ids % holdout_mod != 0
        if len(evh) and train_mask.any():
            hv, dv = _shingle_hash_rows(
                batch.filter(pa.array(train_mask)), n_shingle
            )
            if len(hv):
                pos = np.searchsorted(evh, hv)
                hit = (pos < len(evh)) & (
                    evh[np.minimum(pos, len(evh) - 1)] == hv
                )
                hit_ids = np.unique(dv[hit])
                contaminated = np.isin(ids, hit_ids)
        return rep.append_column(
            "text_hash", pa.array([md5_fingerprint(t) for t in texts])
        ).append_column(
            "quality",
            pa.array([quality_score(t) for t in texts], pa.float64()),
        ).append_column(
            "contaminated", pa.array(contaminated, pa.bool_())
        )

    flag_ds = docs.map_batches(flags, batch_format="pyarrow")

    def winner_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        pdf = batch.select(["text_hash", "doc_id"]).to_pandas()
        pdf = pdf.groupby("text_hash", sort=False, as_index=False).min()
        return pa.Table.from_pandas(
            pdf, preserve_index=False
        ).replace_schema_metadata(None)

    winners = (
        flag_ds.map_batches(winner_partial, batch_format="pyarrow")
        .groupby("text_hash")
        .min("doc_id")
        .map_batches(
            lambda b: b.rename_columns(["text_hash", "win"]),
            batch_format="pyarrow",
        )
    )

    joined = cogroup_attach(
        flag_ds,
        winners,
        key="text_hash",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("dup_token_frac", pa.float64()),
            pa.field("top_bigram_frac", pa.float64()),
            pa.field("dup_trigram_frac", pa.float64()),
            pa.field("text_hash", pa.string()),
            pa.field("quality", pa.float64()),
            pa.field("contaminated", pa.bool_()),
        ],
        payload_fields=[pa.field("win", pa.int64())],
    )

    if not broadcast_cont:
        cont_ids = _cogroup_contamination(docs, n_shingle, holdout_mod)
        joined = cogroup_attach(
            joined,
            cont_ids,
            key="doc_id",
            left_fields=[
                pa.field("doc_id", pa.int64()),
                pa.field("n_tokens", pa.int64()),
                pa.field("dup_token_frac", pa.float64()),
                pa.field("top_bigram_frac", pa.float64()),
                pa.field("dup_trigram_frac", pa.float64()),
                pa.field("text_hash", pa.string()),
                pa.field("quality", pa.float64()),
                pa.field("contaminated", pa.bool_()),
                pa.field("win", pa.int64()),
            ],
            payload_fields=[pa.field("n_hits", pa.int64())],
        ).map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("contaminated"),
                "contaminated",
                pc.fill_null(
                    pc.greater(b.column("n_hits"), 0), False
                ),
            ).drop_columns(["n_hits"]),
            batch_format="pyarrow",
        )

    def verdict(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n_tok = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        tg3 = batch.column("dup_trigram_frac").to_numpy(zero_copy_only=False)
        bg2 = batch.column("top_bigram_frac").to_numpy(zero_copy_only=False)
        q = batch.column("quality").to_numpy(zero_copy_only=False)
        cont = batch.column("contaminated").to_numpy(zero_copy_only=False)
        # fill_null first: a nullable int64 with nulls converts to
        # float64 and breaks the exact id comparison
        win = pc.fill_null(batch.column("win"), -1).to_numpy(
            zero_copy_only=False
        )
        reason = np.full(len(ids), None, dtype=object)
        # precedence: LAST write wins -> assign in reverse order
        reason[cont] = "contaminated"
        reason[q < min_quality] = "low_quality"
        reason[(tg3 > max_dup_trigram) | (bg2 > max_top_bigram)] = (
            "repetitious"
        )
        reason[ids != win] = "exact_dup"
        reason[n_tok < min_tokens] = "too_short"
        reason[ids % holdout_mod == 0] = "holdout"
        keep = np.array([r is None for r in reason], bool)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "keep": pa.array(keep.astype(np.int64), pa.int64()),
                "reason": pa.array(reason.tolist(), pa.string()),
            }
        )

    return joined.map_batches(verdict, batch_format="pyarrow")


def shuffle_ranks(
    sf_dir: str, salt: int = 0, n_buckets: int = 256
) -> ray.data.Dataset:
    """Deterministic epoch shuffle: every doc's GLOBAL position in the
    md5-keyed pseudo-random order — reshuffle an epoch by changing
    ``salt``, reproduce it exactly by reusing one. Output
    ``(doc_id, shuffle_rank)``, rank 0-based.

    A global rank normally means a global sort + enumeration; here the
    hash key's TOP BITS make range partitioning free (uniform over
    buckets, bucket id == key order), so it's the same two-level
    prefix-sum shape as ``pack_sequences``: per-bucket counts ->
    driver cumsum over n_buckets rows -> per-bucket local argsort +
    offset. One bucket-keyed exchange of (doc_id, h) rows, no
    all-to-all sort.
    """
    docs = read_documents(sf_dir, ("doc_id",))

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        h = hash64([f"{salt}:{i}" for i in ids])
        shift = np.uint64(64 - (int(n_buckets) - 1).bit_length())
        bucket = (h >> shift).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "h": pa.array(h, pa.uint64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    keyed_ds = docs.map_batches(keyed, batch_format="pyarrow").materialize()

    def bucket_counts(batch: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(
            batch.column("bucket").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            keyed_ds.map_batches(bucket_counts, batch_format="pyarrow")
            .groupby("bucket")
            .sum("n")
            .sort("bucket")
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64()),
                 "shuffle_rank": pa.array([], pa.int64())}
            )
        )
    cnt_tbl = pa.concat_tables(parts)
    buckets = cnt_tbl.column("bucket").to_numpy(zero_copy_only=False)
    counts = cnt_tbl.column("sum(n)").to_numpy(zero_copy_only=False)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    offset_ref = ray.put(dict(zip(buckets.tolist(), offsets.tolist())))

    def rank_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        h = group.column("h").to_numpy(zero_copy_only=False)
        b = int(group.column("bucket")[0].as_py())
        order = np.lexsort((ids, h))  # (h, doc_id) ascending
        ranks = np.empty(len(ids), np.int64)
        ranks[order] = ray.get(offset_ref)[b] + np.arange(
            len(ids), dtype=np.int64
        )
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shuffle_rank": pa.array(ranks, pa.int64()),
            }
        )

    return keyed_ds.groupby("bucket").map_groups(
        rank_bucket, batch_format="pyarrow"
    )


def curate_and_pack(
    sf_dir: str,
    capacity: int = 512,
    bucket_docs: int = 64,
    **clean_kwargs,
) -> ray.data.Dataset:
    """The end-to-end training-data pipeline in one DAG: run the
    composite cleaner, keep only surviving docs, and pack THEIR tokens
    into fixed-``capacity`` sequences — the `clean -> pack` composition
    a pretraining job actually runs before tokenizing shards.

    Composition stays key-rows-only: the kept/dropped verdict attaches
    to the (doc_id, n_tok) COUNT rows via ``cogroup_attach`` by doc_id
    (never to text), dropped docs filter out vectorized, and the
    packing core runs over the surviving counts. Document text is read
    once for signals and once for token counts; it never rides an
    exchange anywhere in the composed DAG.

    Output: the per-chunk stats table of ``pack_sequences``, over the
    cleaned corpus (planted text, since the cleaner's corpus IS the
    planted one).
    """
    verdicts = clean_corpus(sf_dir, **clean_kwargs)
    plant = clean_kwargs.get("plant", True)
    holdout_mod = clean_kwargs.get("holdout_mod", 50)
    docs = read_documents(sf_dir, ("doc_id", "text"))
    if plant:
        docs = docs.map_batches(
            lambda b: _plant_clean(b, holdout_mod), batch_format="pyarrow"
        )
    counts = _tok_count_rows(docs, bucket_docs)

    keep_flags = verdicts.map_batches(
        lambda b: b.select(["doc_id", "keep"]).rename_columns(
            ["doc_id", "keep"]
        ),
        batch_format="pyarrow",
    )
    attached = cogroup_attach(
        counts,
        keep_flags,
        key="doc_id",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("n_tok", pa.int64()),
            pa.field("bucket", pa.int64()),
        ],
        payload_fields=[pa.field("keep", pa.int64())],
    )
    kept = attached.map_batches(
        lambda b: b.filter(
            pc.fill_null(pc.equal(b.column("keep"), 1), False)
        ).select(["doc_id", "n_tok", "bucket"]),
        batch_format="pyarrow",
    ).materialize()
    return _pack_from_counts(kept, capacity, bucket_docs, False)


DSIR_BUCKETS = 1024


def dsir_weights(
    sf_dir: str, n_buckets: int = DSIR_BUCKETS, holdout_mod: int = 50
) -> ray.data.Dataset:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per-doc
    log importance weight under hashed-unigram bag-of-words models of
    the TARGET distribution (the ``doc_id % holdout_mod == 0`` slice
    standing in for the curated target corpus) vs the RAW corpus,
    add-1 smoothed over ``n_buckets`` hash buckets:

        w(doc) = sum_tok [ ln p_tgt(bucket(tok)) - ln p_raw(bucket(tok)) ]

    Returns (doc_id, n_tokens, dsir_logweight round6); zero-token docs
    emit no row (mirrors unigram_logprob).

    Scale shape: the feature state is FIXED-WIDTH (n_buckets counts),
    not vocabulary-width — per-batch ``np.bincount`` partials ride a
    bucket-keyed groupby bounded by ``n_buckets`` rows, and the fitted
    log-ratio table broadcasts unconditionally because its size is a
    constructor constant, independent of corpus size (no fallback tier
    needed — this is the point of hashed features). The scoring pass is
    a pure map. Buckets are md5 ``hash64 % n_buckets`` ==
    ``md5_number_upper(token) % n_buckets`` so the driver-gate oracle
    rebuilds both models bit-exactly.
    """

    def bucket_partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = _tokenize(batch.column("text"))
        if not len(flat):
            return pa.Table.from_pydict(
                {"bucket": pa.array([], pa.int64()),
                 "raw_cnt": pa.array([], pa.int64()),
                 "tgt_cnt": pa.array([], pa.int64())}
            )
        buckets = (hash64_strings(flat) % np.uint64(n_buckets)).astype(
            np.int64
        )
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        is_tgt = (doc_ids[doc_idx] % holdout_mod) == 0
        raw = np.bincount(buckets, minlength=n_buckets)
        tgt = np.bincount(buckets[is_tgt], minlength=n_buckets)
        nz = np.flatnonzero(raw)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(nz, pa.int64()),
                "raw_cnt": pa.array(raw[nz], pa.int64()),
                "tgt_cnt": pa.array(tgt[nz], pa.int64()),
            }
        )

    counts = (
        read_documents(sf_dir, ("doc_id", "text"))
        .map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["raw_cnt", "tgt_cnt"])
    )
    parts = [
        t
        for t in ray.get(counts.materialize().to_arrow_refs())
        if t.num_rows
    ]
    raw = np.zeros(n_buckets, np.int64)
    tgt = np.zeros(n_buckets, np.int64)
    for t in parts:
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        raw[b] += t.column("sum(raw_cnt)").to_numpy(zero_copy_only=False)
        tgt[b] += t.column("sum(tgt_cnt)").to_numpy(zero_copy_only=False)
    raw_tot, tgt_tot = int(raw.sum()), int(tgt.sum())
    w = np.log((tgt + 1.0) / (tgt_tot + n_buckets)) - np.log(
        (raw + 1.0) / (raw_tot + n_buckets)
    )
    w_ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        wt = ray.get(w_ref)
        flat, doc_idx, n_tokens = _tokenize(batch.column("text"))
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        tot = np.zeros(n, np.float64)
        if len(flat):
            buckets = (
                hash64_strings(flat) % np.uint64(n_buckets)
            ).astype(np.int64)
            np.add.at(tot, doc_idx, wt[buckets])
        keep = n_tokens > 0
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids[keep], pa.int64()),
                "n_tokens": pa.array(n_tokens[keep], pa.int64()),
                "dsir_logweight": pa.array(
                    np.round(tot[keep], 6), pa.float64()
                ),
            }
        )

    return read_documents(sf_dir, ("doc_id", "text")).map_batches(
        score, batch_format="pyarrow"
    )


def crossdoc_ngram_dup(
    sf_dir: str, n: int = 3, dup_broadcast_budget: int = 2_000_000
) -> ray.data.Dataset:
    """Cross-document duplicate n-gram fraction (the RefinedWeb /
    MassiveText signal that is NOT the within-doc Gopher repetition):
    per doc, the share of its DISTINCT word n-grams that also occur in
    at least one other document. Returns
    (doc_id, n_grams, n_dup, dup_frac round6); gram-less docs emit no
    row.

    Tiers (decontaminate's discipline, but the probe set is derived
    from the corpus itself):

    - distinct (h, doc_id) shingle rows -> key-only ``groupby(h)``
      count -> the DUPLICATED hash set (df >= 2), usually far smaller
      than the vocabulary. Under ``dup_broadcast_budget`` it broadcasts
      as one sorted int64 array and a pure-map pass rescans the text
      (vectorized searchsorted probe). Past it, the dup markers
      cogroup-attach back onto the (h, doc_id) rows by h and a
      doc-keyed aggregate folds the fraction — text never shuffles in
      either tier; tiers are pinned equal in tests.
    """
    docs = read_documents(sf_dir, ("doc_id", "text"))

    def gram_rows(batch: pa.Table) -> pa.Table:
        h, d = _shingle_hash_rows(batch, n)
        return pa.Table.from_pydict(
            {
                "h": pa.array(h.view(np.int64), pa.int64()),
                "doc_id": pa.array(d, pa.int64()),
            }
        )

    rows = docs.map_batches(gram_rows, batch_format="pyarrow")
    df = rows.groupby("h").count()

    def dup_only(batch: pa.Table) -> pa.Table:
        keep = pc.greater_equal(batch.column("count()"), 2)
        return batch.filter(keep).select(["h"])

    dup_ds = df.map_batches(dup_only, batch_format="pyarrow")
    dup_tbl = _collect_within_budget(dup_ds, dup_broadcast_budget)

    if dup_tbl is not None:
        dup_sorted = np.sort(
            dup_tbl.column("h").to_numpy(zero_copy_only=False)
            if dup_tbl.num_rows
            else np.empty(0, np.int64)
        )
        dup_ref = ray.put(dup_sorted)

        def score(batch: pa.Table) -> pa.Table:
            dup_arr = ray.get(dup_ref)
            h, d = _shingle_hash_rows(batch, n)
            hi = h.view(np.int64)
            if len(hi) and len(dup_arr):
                pos = np.minimum(
                    np.searchsorted(dup_arr, hi), len(dup_arr) - 1
                )
                member = dup_arr[pos] == hi
            else:
                member = np.zeros(len(hi), bool)
            uniq, inv = np.unique(d, return_inverse=True)
            n_grams = np.bincount(inv)
            n_dup = np.bincount(inv, weights=member.astype(np.float64))
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(uniq, pa.int64()),
                    "n_grams": pa.array(n_grams, pa.int64()),
                    "n_dup": pa.array(n_dup.astype(np.int64), pa.int64()),
                    "dup_frac": pa.array(
                        np.round(n_dup / n_grams, 6), pa.float64()
                    ),
                }
            )

        return docs.map_batches(score, batch_format="pyarrow")

    # over-budget tier: mark dup rows via cogroup by h, doc-keyed fold
    marked = cogroup_attach(
        rows,
        dup_ds.map_batches(
            lambda b: b.append_column(
                "is_dup", pa.array(np.ones(b.num_rows, bool))
            ),
            batch_format="pyarrow",
        ),
        "h",
        left_fields=[
            pa.field("h", pa.int64()),
            pa.field("doc_id", pa.int64()),
        ],
        payload_fields=[pa.field("is_dup", pa.bool_())],
    )

    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        m = (
            pc.fill_null(batch.column("is_dup"), False)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        uniq, inv = np.unique(d, return_inverse=True)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "g": pa.array(np.bincount(inv), pa.int64()),
                "dup": pa.array(
                    np.bincount(inv, weights=m).astype(np.int64), pa.int64()
                ),
            }
        )

    summed = (
        marked.map_batches(partial, batch_format="pyarrow")
        .groupby("doc_id")
        .sum(["g", "dup"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        g = batch.column("sum(g)").to_numpy(zero_copy_only=False)
        dup = batch.column("sum(dup)").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pa.array(g.astype(np.int64), pa.int64()),
                "n_dup": pa.array(dup.astype(np.int64), pa.int64()),
                "dup_frac": pa.array(np.round(dup / g, 6), pa.float64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def importance_resample(sf_dir: str, k: int = 50) -> pa.Table:
    """DSIR's second half — importance RESAMPLING: draw ``k`` docs
    without replacement with probability proportional to
    ``exp(dsir_logweight)`` via the deterministic Gumbel-top-k trick
    (key = w - ln(-ln(u)), u from the doc's md5 — reproducible noise,
    no RNG state). Returns (doc_id, dsir_logweight, gumbel_key round6)
    of the selected docs; keys are rounded BEFORE ranking (doc_id
    tiebreak) so the selected SET is float-order stable.

    Scale shape: composes on the ``dsir_weights`` map output — the key
    is per-row math, selection is per-block top-k + a k x #blocks
    driver merge (the ``top_tokens`` idiom). Nothing shuffles.
    """
    ds = dsir_weights(sf_dir)

    def keyed_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        w = batch.column("dsir_logweight").to_numpy(zero_copy_only=False)
        u = (hash64([str(i) for i in ids]).astype(np.float64) + 0.5) / float(
            1 << 64
        )
        key = np.round(w - np.log(-np.log(u)), 6)
        order = np.lexsort((ids, -key))[:k]
        order = np.sort(order)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "dsir_logweight": pa.array(w[order], pa.float64()),
                "gumbel_key": pa.array(key[order], pa.float64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            ds.map_batches(keyed_topk, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([], pa.int64()),
                "dsir_logweight": pa.array([], pa.float64()),
                "gumbel_key": pa.array([], pa.float64()),
            }
        )
    merged = pa.concat_tables(parts)
    ids = merged.column("doc_id").to_numpy(zero_copy_only=False)
    key = merged.column("gumbel_key").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -key))[:k]
    return merged.take(pa.array(np.sort(order))).sort_by(
        [("gumbel_key", "descending"), ("doc_id", "ascending")]
    )


def _bigram_position_arrays(batch: pa.Table):
    """Per-position bigram rows for a (doc_id, text) batch: returns
    ``(doc_ids_per_pos, h_prev, h_cur, h_bigram)`` for every within-doc
    adjacent token pair (uint64 md5 hashes == ``md5_number_upper``, so
    an oracle can rebuild the same keyed counts — hash collisions, if
    any, collide identically on both sides)."""
    flat, doc_idx, _ = _tokenize(batch.column("text"))
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    if len(flat) < 2:
        e = np.empty(0, np.uint64)
        return np.empty(0, np.int64), e, e, e
    adj = doc_idx[1:] == doc_idx[:-1]
    if not adj.any():
        e = np.empty(0, np.uint64)
        return np.empty(0, np.int64), e, e, e
    keep_prev = np.flatnonzero(adj)
    prev = flat.take(pa.array(keep_prev))
    cur = flat.take(pa.array(keep_prev + 1))
    big = pc.binary_join_element_wise(prev, cur, " ")
    h_all = hash64_strings(flat)
    hp = h_all[keep_prev]
    hc = h_all[keep_prev + 1]
    h2 = hash64_strings(big)
    return doc_ids[doc_idx[keep_prev]], hp, hc, h2


def bigram_logprob(
    sf_dir: str,
    lam: float = 0.7,
    cnt_broadcast_budget: int = 4_000_000,
) -> ray.data.Dataset:
    """Interpolated bigram LM scoring — the KenLM-perplexity-filter
    stand-in one order above ``unigram_logprob``:

        P(w_i | w_{i-1}) = lam * c2(w_{i-1} w_i) / c1(w_{i-1})
                           + (1 - lam) * c1(w_i) / T

    per-doc mean ln P over positions 2..n. Returns (doc_id, n_bigrams,
    bigram_logprob round6); docs with < 2 tokens emit no row.

    Model pass: ONE exchange — per-batch (kind, h, cnt) partials for
    token counts (kind 1) and bigram counts (kind 2), keyed by md5
    hash64 (== ``md5_number_upper``), composite-key groupby sum. Under
    ``cnt_broadcast_budget`` model rows the two sorted count arrays
    broadcast and scoring is a pure map. Past it, per-position rows
    (doc_id, hp, hc, h2) take three key-only ``cogroup_attach`` passes
    (c2 by h2, c1 by hp, c1 by hc) and a doc-keyed aggregate — the
    vocabulary^2 model never lands on the driver; tiers pinned equal
    in tests.
    """
    docs = read_documents(sf_dir, ("doc_id", "text"))

    def model_partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tokenize(batch.column("text"))
        _, _, _, h2 = _bigram_position_arrays(batch)
        h1 = hash64_strings(flat) if len(flat) else np.empty(0, np.uint64)
        ks, hs, cs = [], [], []
        for kind, h in ((1, h1), (2, h2)):
            if len(h):
                uniq, cnt = np.unique(h, return_counts=True)
                ks.append(np.full(len(uniq), kind, np.int8))
                hs.append(uniq.view(np.int64))
                cs.append(cnt.astype(np.int64))
        if not ks:
            return pa.Table.from_pydict(
                {"kind": pa.array([], pa.int8()),
                 "h": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        return pa.Table.from_pydict(
            {
                "kind": pa.array(np.concatenate(ks), pa.int8()),
                "h": pa.array(np.concatenate(hs), pa.int64()),
                "cnt": pa.array(np.concatenate(cs), pa.int64()),
            }
        )

    model = (
        docs.map_batches(model_partial, batch_format="pyarrow")
        .groupby(["kind", "h"])
        .sum("cnt")
    )

    def rename_model(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["kind", "h", "cnt"])

    model = model.map_batches(rename_model, batch_format="pyarrow")
    model_tbl = _collect_within_budget(model, cnt_broadcast_budget)

    if model_tbl is not None and model_tbl.num_rows:
        kinds = model_tbl.column("kind").to_numpy(zero_copy_only=False)
        hs = model_tbl.column("h").to_numpy(zero_copy_only=False)
        cs = model_tbl.column("cnt").to_numpy(zero_copy_only=False)
        m1, m2 = kinds == 1, kinds == 2
        o1, o2 = np.argsort(hs[m1]), np.argsort(hs[m2])
        h1_sorted, c1_sorted = hs[m1][o1], cs[m1][o1]
        h2_sorted, c2_sorted = hs[m2][o2], cs[m2][o2]
        total = float(c1_sorted.sum())
        refs = ray.put((h1_sorted, c1_sorted, h2_sorted, c2_sorted, total))

        def lookup(sorted_h, sorted_c, keys):
            pos = np.minimum(
                np.searchsorted(sorted_h, keys), len(sorted_h) - 1
            )
            return sorted_c[pos].astype(np.float64)

        def score(batch: pa.Table) -> pa.Table:
            h1s, c1s, h2s, c2s, tot = ray.get(refs)
            dids, hp, hc, h2 = _bigram_position_arrays(batch)
            if not len(dids):
                return pa.Table.from_pydict(
                    {"doc_id": pa.array([], pa.int64()),
                     "n_bigrams": pa.array([], pa.int64()),
                     "bigram_logprob": pa.array([], pa.float64())}
                )
            # every key is present in the model by construction
            cp = lookup(h1s, c1s, hp.view(np.int64))
            cc = lookup(h1s, c1s, hc.view(np.int64))
            c2v = lookup(h2s, c2s, h2.view(np.int64))
            lp = np.log(lam * c2v / cp + (1.0 - lam) * cc / tot)
            uniq, inv = np.unique(dids, return_inverse=True)
            n = np.bincount(inv)
            s = np.bincount(inv, weights=lp)
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(uniq, pa.int64()),
                    "n_bigrams": pa.array(n.astype(np.int64), pa.int64()),
                    "bigram_logprob": pa.array(
                        np.round(s / n, 6), pa.float64()
                    ),
                }
            )

        return docs.map_batches(score, batch_format="pyarrow")

    # over-budget tier: three key-only cogroups over position rows
    def split_kind(kind: int):
        def f(batch: pa.Table) -> pa.Table:
            keep = pc.equal(batch.column("kind"), kind)
            return batch.filter(keep).select(["h", "cnt"])

        return f

    c1_ds = model.map_batches(split_kind(1), batch_format="pyarrow")
    c2_ds = model.map_batches(split_kind(2), batch_format="pyarrow")
    total = float(c1_ds.sum("cnt") or 0.0)

    def pos_rows(batch: pa.Table) -> pa.Table:
        dids, hp, hc, h2 = _bigram_position_arrays(batch)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(dids, pa.int64()),
                "hp": pa.array(hp.view(np.int64), pa.int64()),
                "hc": pa.array(hc.view(np.int64), pa.int64()),
                "h2": pa.array(h2.view(np.int64), pa.int64()),
            }
        )

    rows = docs.map_batches(pos_rows, batch_format="pyarrow")

    def rename_to(key: str, val: str):
        def f(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([key, val])

        return f

    step1 = cogroup_attach(
        rows,
        c2_ds.map_batches(rename_to("h2", "c2"), batch_format="pyarrow"),
        "h2",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("hp", pa.int64()),
            pa.field("hc", pa.int64()),
            pa.field("h2", pa.int64()),
        ],
        payload_fields=[pa.field("c2", pa.int64())],
    )
    step2 = cogroup_attach(
        step1,
        c1_ds.map_batches(rename_to("hp", "cp"), batch_format="pyarrow"),
        "hp",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("hp", pa.int64()),
            pa.field("hc", pa.int64()),
            pa.field("h2", pa.int64()),
            pa.field("c2", pa.int64()),
        ],
        payload_fields=[pa.field("cp", pa.int64())],
    )
    step3 = cogroup_attach(
        step2,
        c1_ds.map_batches(rename_to("hc", "cc"), batch_format="pyarrow"),
        "hc",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("hp", pa.int64()),
            pa.field("hc", pa.int64()),
            pa.field("h2", pa.int64()),
            pa.field("c2", pa.int64()),
            pa.field("cp", pa.int64()),
        ],
        payload_fields=[pa.field("cc", pa.int64())],
    )

    def doc_partial(batch: pa.Table) -> pa.Table:
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        c2v = pc.fill_null(batch.column("c2"), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        cp = pc.fill_null(batch.column("cp"), 1).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        cc = pc.fill_null(batch.column("cc"), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        lp = np.log(lam * c2v / cp + (1.0 - lam) * cc / total)
        uniq, inv = np.unique(dids, return_inverse=True)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
                "s": pa.array(np.bincount(inv, weights=lp), pa.float64()),
            }
        )

    summed = (
        step3.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .sum(["n", "s"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n)").to_numpy(zero_copy_only=False)
        s = batch.column("sum(s)").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_bigrams": pa.array(n.astype(np.int64), pa.int64()),
                "bigram_logprob": pa.array(np.round(s / n, 6), pa.float64()),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


# -- CCNet-style perplexity stratification ----------------------------------


def _spill_logprob_rows(sf_dir: str) -> str:
    """Compute (doc_id, lang, n_tokens, logprob) ONCE and spill to
    /tmp parquet (the minhash-signature idiom): the bucketing pass
    needs three reads of these per-doc summary rows (histogram,
    boundary-bin refinement, final assignment) and re-running the
    unigram model for each would triple the corpus text reads. The
    spill is the per-doc summary — 4 narrow columns, never text."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    src = _os.path.join(_os.path.abspath(sf_dir), "documents.parquet")
    try:
        st = _os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    tag = _hashlib.md5(f"lpbuckets:{src}:{content_tag}".encode()).hexdigest()[
        :12
    ]
    out_dir = f"/tmp/graft_lpbuckets/{tag}"
    marker = _os.path.join(out_dir, "_SUCCESS")
    if _os.path.exists(marker):
        return out_dir
    if _os.path.isdir(out_dir):
        _shutil.rmtree(out_dir)
    _os.makedirs(out_dir, exist_ok=True)

    lp = unigram_logprob(sf_dir)
    langs = read_documents(sf_dir, ("doc_id", "lang"))

    def lang_rows(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                # null lang -> '' sentinel, mirrored by COALESCE in SQL
                "lang": pc.fill_null(batch.column("lang"), ""),
            }
        )

    rows = cogroup_attach(
        lp,
        langs.map_batches(lang_rows, batch_format="pyarrow"),
        "doc_id",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("n_tokens", pa.int64()),
            pa.field("logprob", pa.float64()),
        ],
        payload_fields=[pa.field("lang", pa.string())],
    )
    rows.write_parquet(out_dir)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def perplexity_buckets(sf_dir: str) -> ray.data.Dataset:
    """CCNet-style per-language quality stratification (Wenzek et al.
    2020): docs are bucketed head / middle / tail by per-doc unigram
    log-prob (``unigram_logprob``) against that LANGUAGE's exact
    tercile thresholds — head = top third (highest logprob == lowest
    perplexity).

    The per-lang thresholds are EXACT discrete quantiles computed
    without any global sort, two rounds of the ``exact_quantiles``
    primitive (relational.py:428) generalized to grouped CONTINUOUS
    values:

      1. coarse histogram: one (lang, floor(logprob*100)) count
         exchange — the bin domain is bounded (logprob spans a few
         hundred centinats), so the driver-side table is
         O(langs x bins), never O(docs);
      2. refinement: only rows whose bin CONTAINS a tercile boundary
         re-emit (lang, value) counts — O(docs/bins) rows — and the
         driver reads the exact rank-``max(1, ceil(q*n))`` value off
         the cumulative counts (the quantile_disc rule).

    Thresholds (langs x 2 scalars) ship in the assignment closure;
    assignment is a pure map. Ties at a threshold go to the higher
    bucket on both sides (``>=`` here, ``>=`` in the CASE oracle).
    Returns (doc_id, lang, n_tokens, logprob, bucket).
    """
    spill = _spill_logprob_rows(sf_dir)
    rows = ray.data.read_parquet(spill)

    def bin_partial(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        lp = batch.column("logprob").to_numpy(zero_copy_only=False)
        bins = np.floor(lp * 100.0).astype(np.int64)
        import pandas as pd

        df = pd.DataFrame({"lang": lang, "bin": bins})
        g = df.groupby(["lang", "bin"], sort=False).size().reset_index()
        return pa.Table.from_pydict(
            {
                "lang": pa.array(g["lang"].tolist(), pa.string()),
                "bin": pa.array(g["bin"].to_numpy(), pa.int64()),
                "cnt": pa.array(g[0].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    # bounded: O(langs x few-hundred bins) rows
    hist = (
        rows.map_batches(bin_partial, batch_format="pyarrow")
        .groupby(["lang", "bin"])
        .sum("cnt")
        .take_all()
    )
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in hist:
        by_lang.setdefault(r["lang"], []).append((r["bin"], r["sum(cnt)"]))

    # per (lang, tercile): the bin holding rank ceil(q*n) and the row
    # count strictly below that bin; ranks in EXACT integer math
    # ((n+2)//3 == ceil(n/3)) so the SQL oracle can reproduce them
    # without float-division drift
    targets: dict[str, list[tuple[int, int, int]]] = {}
    need: set[tuple[str, int]] = set()
    for lang, pairs in by_lang.items():
        pairs.sort()
        cnts = np.array([c for _, c in pairs], np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        targets[lang] = []
        for rank in ((n + 2) // 3, (2 * n + 2) // 3):
            rank = max(1, rank)
            i = int(np.searchsorted(cum, rank))
            below = int(cum[i - 1]) if i else 0
            targets[lang].append((rank, pairs[i][0], below))
            need.add((lang, pairs[i][0]))

    def refine_partial(batch: pa.Table) -> pa.Table:
        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        lp = batch.column("logprob").to_numpy(zero_copy_only=False)
        bins = np.floor(lp * 100.0).astype(np.int64)
        # <= 2 boundary bins per lang: one vectorized mask per pair
        keep = np.zeros(len(lang), bool)
        for la, b in need:
            keep |= (lang == la) & (bins == b)
        import pandas as pd

        df = pd.DataFrame({"lang": lang[keep], "value": lp[keep]})
        g = df.groupby(["lang", "value"], sort=False).size().reset_index()
        return pa.Table.from_pydict(
            {
                "lang": pa.array(g["lang"].tolist(), pa.string()),
                "value": pa.array(g["value"].to_numpy(), pa.float64()),
                "cnt": pa.array(g[0].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    vals = (
        rows.map_batches(refine_partial, batch_format="pyarrow")
        .groupby(["lang", "value"])
        .sum("cnt")
        .take_all()
    )
    in_bin: dict[str, list[tuple[float, int]]] = {}
    for r in vals:
        in_bin.setdefault(r["lang"], []).append((r["value"], r["sum(cnt)"]))

    thresholds: dict[str, list[float]] = {}
    for lang, specs in targets.items():
        pairs = sorted(in_bin.get(lang, []))
        v = np.array([x for x, _ in pairs], np.float64)
        c = np.array([x for _, x in pairs], np.int64)
        bins_of_v = np.floor(v * 100.0).astype(np.int64)
        ths = []
        for rank, b, below in specs:
            m = bins_of_v == b
            cum = below + np.cumsum(c[m])
            ths.append(float(v[m][np.searchsorted(cum, rank)]))
        thresholds[lang] = ths

    def assign(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lang = batch.column("lang").to_numpy(zero_copy_only=False)
        lp = batch.column("logprob").to_numpy(zero_copy_only=False)
        s = pd.Series(lang, dtype=object)
        t1 = s.map({la: t[0] for la, t in thresholds.items()}).to_numpy(
            np.float64
        )
        t2 = s.map({la: t[1] for la, t in thresholds.items()}).to_numpy(
            np.float64
        )
        bucket = np.where(lp >= t2, "head", np.where(lp >= t1, "middle", "tail"))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_tokens": batch.column("n_tokens"),
                "logprob": batch.column("logprob"),
                "bucket": pa.array(bucket.tolist(), pa.string()),
            }
        )

    return rows.map_batches(assign, batch_format="pyarrow")


# -- model-based quality filtering (fastText-style hashed linear) -----------

CLS_BUCKETS = 4096
CLS_SIGMOID_SCALE = 4.0


def _classifier_weights(n_buckets: int = CLS_BUCKETS) -> np.ndarray:
    """Deterministic int64 'trained' weight table, one value per hash
    bucket: k(b) = md5_number_upper(str(b)) % 2001 in [0, 2000] (the
    real weight is (k - 1000) / 997 — 997 is prime, so score rationals
    m/(997*n) never terminate in decimal and round(...,6) can't
    straddle a boundary). DuckDB rebuilds k(b) bit-exactly."""
    return (hash64([str(b) for b in range(n_buckets)]) % np.uint64(2001)).astype(
        np.int64
    )


class QualityClassifier:
    """fastText-style model-based quality filter (Joulin et al. 2017;
    the CCNet / LLaMA 'quality classifier' stage): every doc's hashed
    unigram + word-bigram features index a weight table and the doc
    score is the feature-weight mean — exactly fastText's averaged
    bag-of-features linear model, with deterministic md5-derived
    weights standing in for trained ones so the DuckDB oracle can
    rebuild every score bit-for-bit.

    Scale shape: the weight table is the MODEL and lives in actor
    state — built once per actor in ``__init__`` (a real fastText
    ``.bin`` would be ``ray.put`` once and ``ray.get`` here, read
    zero-copy from each node's object store, never re-shipped per
    batch). Scoring is a pure vectorized map: no exchange at any
    scale. ``keep`` is decided in INTEGER arithmetic
    (sum(k) >= 1000*n) so the verdict can't flip on a float ulp
    between numpy and SQL."""

    def __init__(self, n_buckets: int = CLS_BUCKETS):
        self.n_buckets = n_buckets
        self.k = _classifier_weights(n_buckets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = _tokenize(batch.column("text"))
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nrows = batch.num_rows
        h_uni = hash64_strings(flat)
        if len(flat) >= 2:
            adj = doc_idx[1:] == doc_idx[:-1]
            keep_prev = np.flatnonzero(adj)
        else:
            keep_prev = np.empty(0, np.int64)
        if len(keep_prev):
            prev = flat.take(pa.array(keep_prev))
            cur = flat.take(pa.array(keep_prev + 1))
            h_bi = hash64_strings(
                pc.binary_join_element_wise(prev, cur, " ")
            )
            feat_h = np.concatenate([h_uni, h_bi])
            feat_doc = np.concatenate([doc_idx, doc_idx[keep_prev]])
        else:
            feat_h = h_uni
            feat_doc = doc_idx
        b = (feat_h % np.uint64(self.n_buckets)).astype(np.int64)
        k = self.k[b]
        num = np.zeros(nrows, np.int64)  # sum(k) - 1000*n, exact
        np.add.at(num, feat_doc, k - 1000)
        cnt = np.bincount(feat_doc, minlength=nrows).astype(np.int64)
        mask = cnt > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            score = num / (997.0 * cnt)
            prob = 1.0 / (1.0 + np.exp(-CLS_SIGMOID_SCALE * score))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids[mask], pa.int64()),
                "n_feat": pa.array(cnt[mask], pa.int64()),
                "score": pa.array(np.round(score[mask], 6), pa.float64()),
                "prob": pa.array(np.round(prob[mask], 6), pa.float64()),
                "keep": pa.array(num[mask] >= 0, pa.bool_()),
            }
        )


def quality_classifier(sf_dir: str) -> ray.data.Dataset:
    """Model-based quality scores for every non-empty doc:
    (doc_id, n_feat, score, prob, keep). Actor-pool map_batches — the
    weight table loads once per actor, scoring is vectorized."""
    docs = read_documents(sf_dir, ("doc_id", "text"))
    return docs.map_batches(
        QualityClassifier, concurrency=(1, 4), batch_format="pyarrow"
    )


# -- FFD sample packing (docs not split) -------------------------------------


def pack_bins(
    sf_dir: str, capacity: int = 512, bucket_docs: int = 256
) -> ray.data.Dataset:
    """SFT-style sample packing: docs are NOT split (unlike
    ``pack_sequences``' concat-and-chunk) — each bin holds whole
    documents with total tokens <= ``capacity``, packed
    first-fit-decreasing. Returns assignments
    ``(doc_id, n_tok, bin_id, overflow)``; a doc longer than capacity
    gets a bin of its own with ``overflow = true``.

    FFD is inherently sequential, so the distributed shape packs each
    doc_id BUCKET independently (exactly what real loaders do per
    shard) and makes bucket-local bin ids global with a driver cumsum
    over per-bucket bin counts — the two-level offset pattern shared
    with ``pack_sequences``. Exchanges: the (doc_id, n_tok) key-row
    pass, one bucket-keyed regroup, and a tiny per-bucket bin-count
    fold on the driver; text never shuffles. Rows-only at the driver
    gate (greedy packing is outside SQL); pinned against a serial FFD
    and conservation/capacity invariants in tests.
    """
    docs = read_documents(sf_dir, ("doc_id", "text"))
    counts = _tok_count_rows(docs, bucket_docs)

    def ffd(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return pa.Table.from_pydict(
                {
                    "bucket": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "n_tok": pa.array([], pa.int64()),
                    "local_bin": pa.array([], pa.int64()),
                    "overflow": pa.array([], pa.bool_()),
                }
            )
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        n = group.column("n_tok").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -n))  # n_tok desc, doc_id asc
        remaining: list[int] = []
        bin_of = np.empty(len(d), np.int64)
        over = np.zeros(len(d), bool)
        for r in order:
            t = int(n[r])
            if t >= capacity:
                bin_of[r] = len(remaining)
                remaining.append(0)
                over[r] = t > capacity
                continue
            for b, rem in enumerate(remaining):
                if rem >= t:
                    bin_of[r] = b
                    remaining[b] = rem - t
                    break
            else:
                bin_of[r] = len(remaining)
                remaining.append(capacity - t)
        bucket = group.column("bucket").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "doc_id": pa.array(d, pa.int64()),
                "n_tok": pa.array(n, pa.int64()),
                "local_bin": pa.array(bin_of, pa.int64()),
                "overflow": pa.array(over, pa.bool_()),
            }
        )

    packed = (
        counts.groupby("bucket").map_groups(ffd, batch_format="pyarrow")
    ).materialize()

    def bin_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "bucket" not in batch.column_names:
            return pa.Table.from_pydict(
                {"bucket": pa.array([], pa.int64()),
                 "n_bins": pa.array([], pa.int64())}
            )
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        lb = batch.column("local_bin").to_numpy(zero_copy_only=False)
        uniq = np.unique(b)
        mx = np.full(len(uniq), -1, np.int64)
        idx = np.searchsorted(uniq, b)
        np.maximum.at(mx, idx, lb)
        return pa.Table.from_pydict(
            {"bucket": pa.array(uniq, pa.int64()),
             "n_bins": pa.array(mx + 1, pa.int64())}
        )

    # per-bucket bin counts: tiny (corpus/bucket_docs rows) driver fold
    per_bucket: dict[int, int] = {}
    for row in packed.map_batches(
        bin_counts, batch_format="pyarrow"
    ).take_all():
        per_bucket[row["bucket"]] = max(
            per_bucket.get(row["bucket"], 0), int(row["n_bins"])
        )
    buckets_sorted = sorted(per_bucket)
    offsets = {}
    acc = 0
    for b in buckets_sorted:
        offsets[b] = acc
        acc += per_bucket[b]
    off_ref = ray.put(offsets)

    def globalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "bucket" not in batch.column_names:
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_tok": pa.array([], pa.int64()),
                    "bin_id": pa.array([], pa.int64()),
                    "overflow": pa.array([], pa.bool_()),
                }
            )
        offs = ray.get(off_ref)
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        lb = batch.column("local_bin").to_numpy(zero_copy_only=False)
        gb = lb + np.asarray([offs[int(x)] for x in b], np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_tok": batch.column("n_tok"),
                "bin_id": pa.array(gb, pa.int64()),
                "overflow": batch.column("overflow"),
            }
        )

    return packed.map_batches(globalize, batch_format="pyarrow")
