"""Sparse TF-IDF all-pairs cosine similarity (APSS) — the SPARSE
counterpart to ``similarity.py``'s dense embedding near-dup join: find
every document pair whose unit-normalized tf-idf vectors have cosine
≥ threshold, exactly (Bayardo/Ma/Srikant, "Scaling Up All Pairs
Similarity Search", WWW 2007 — public algorithm).

Three exact strategies (identical output, pinned in tests):

* driver pair-sum (``auto``, posting rows within ``driver_budget``):
  postings land once; one lexsort + the repeat/arange block trick
  emits every within-token pair's weight product; one pyarrow
  group_by-sum IS the dot product (unit vectors ⇒ cosine).
* DISTRIBUTED pair-sum (``auto`` over budget): posting rows shuffle
  ONCE on a coarse token partition, pair products emit + pre-aggregate
  vectorized per partition, and a Ray groupby on (doc_a, doc_b) sums
  partial dots — no broadcast, no driver materialization. A df probe
  first bounds the emission volume; hot-token corpora auto-route to
  the prefix strategy.
* ``strategy="prefix"`` (All-Pairs prefix filter): under a per-doc
  df-DESCENDING feature order (hot tokens first), a doc's UNINDEXED
  prefix is the longest initial run with Σ w·maxw(t) < threshold — a
  pair matching only in unindexed positions is bounded below the
  threshold, so candidates need a shared token indexed by AT LEAST ONE
  side (recall exactly 1 for any fixed order; descending df is what
  keeps hot tokens unindexed and their posting lists out of the
  enumeration); candidates verify against a broadcast of
  candidate-only vectors (bounded by the candidate count, not the
  corpus).
* DENSE reroute (``auto`` when the vocabulary fits
  ``dense_vocab_budget``, or ``strategy="dense"``): a tiny vocabulary
  makes EVERY token hot (df ~ N/|V|), so any postings-driven plan —
  pair-sum or prefix — degenerates toward the N² pair set through
  per-token run enumeration. The right algorithm is then a dense
  block matmul: each doc is a |V|-dim unit vector and tiled
  ``A @ B.T`` tiles bound memory while the quadratic flops run at BLAS
  speed. Driver tier under ``dense_cell_budget`` matrix cells;
  past it, dense rows persist once to a hash-blocked parquet store
  (the ``embedding_neardup_ivf`` shape, similarity.py:376) and each
  block PAIR is one independent task reading only its two blocks.

Weights: w = tf · ln(N/df) (the ``tfidf_topk`` formula), L2-normalized
per doc; zero-norm (empty) docs drop like the oracle's ``nrm > 0``.
The document-frequency table is vocabulary-bounded (sublinear in
corpus size); it broadcasts under ``df_budget`` and otherwise attaches
distributedly (``cogroup_attach`` by token + one per-doc normalize
pass) — the forced ``_distributed`` driver entry runs BOTH fallbacks.

Reference anchor: the reference engine's per-page token-overlap
matching (fork/table/matching_post_processor.py's cell↔token
cosine-free overlap scores) is the same postings-intersection shape;
this lifts it to corpus-scale all-pairs with a sound prefix bound.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .corpus_clean import _group_counts, _tokenize
from .dedup import _collect_within_budget, read_documents
from .io import parquet_num_rows

__all__ = ["sparse_cosine_pairs"]

_EMPTY_COSINE = pa.Table.from_pydict(
    {
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
    }
)


def _doc_tf(batch: pa.Table):
    """(doc_ids, tokens, tf) arrays for one documents batch — rows
    sorted by (doc, token-code) so each doc's rows are contiguous."""
    flat, doc_idx, _ = _tokenize(batch.column("text"))
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    if not len(doc_idx):
        return (
            np.empty(0, np.int64),
            np.empty(0, object),
            np.empty(0, np.int64),
        )
    codes_arr = pc.dictionary_encode(flat)
    codes = np.asarray(
        codes_arr.indices.to_numpy(zero_copy_only=False), np.int64
    )
    firsts, counts = _group_counts([doc_idx, codes])
    toks = (
        codes_arr.dictionary.take(pa.array(codes[firsts]))
        .to_numpy(zero_copy_only=False)
    )
    return doc_ids[doc_idx[firsts]], toks, counts


_EMPTY_TF = pa.Table.from_pydict(
    {
        "doc_id": pa.array([], pa.int64()),
        "token": pa.array([], pa.string()),
        "tf": pa.array([], pa.int64()),
    }
)


def _tf_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, token, tf) rows — one per distinct (doc, token). The
    docs table is one row per doc, so every (doc, token) pair surfaces
    exactly once GLOBALLY; downstream consumers may therefore count
    rows per token for df. Tokenization happens here ONCE — df, the
    postings tiers and the dense tier all reuse the materialized rows."""
    dids, toks, tf = _doc_tf(batch)
    if not len(dids):
        return _EMPTY_TF
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(dids, pa.int64()),
            "token": pa.array(toks, pa.string()),
            "tf": pa.array(tf, pa.int64()),
        }
    )


def _token_df(tf_ds: ray.data.Dataset, combine_limit: int = 2_000_000):
    """Document frequency per token from the materialized tf rows:
    per-batch token counts (each (doc, token) row is globally unique,
    so row counts ARE document frequencies), merged with the house
    combine gate (Ray groupby("token") fallback past it — vocabulary
    is the bound either way). Returns a (token, df) pyarrow table."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = batch.column("token").to_numpy(zero_copy_only=False)
        if not len(toks):
            return pa.Table.from_pydict(
                {"token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        ut, cnt = np.unique(toks, return_counts=True)
        return pa.Table.from_pydict(
            {
                "token": pa.array(ut, pa.string()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    from .relational import _combine_partials

    partials = tf_ds.map_batches(
        partial, batch_format="pyarrow"
    ).materialize()
    merged = _combine_partials(partials, ["token"], ["n"], combine_limit)
    if merged is None:
        rows = [
            t
            for t in ray.get(
                partials.groupby("token").sum("n").to_arrow_refs()
            )
            if t.num_rows
        ]
        merged = pa.concat_tables(rows).rename_columns(["token", "sum(n)"])
    return merged.rename_columns(["token", "df"])


def _poly_part(tokens: np.ndarray, num_parts: int) -> np.ndarray:
    """Vectorized polynomial token hash (mod 2^64, odd base) → coarse
    partition stamp. Collisions only affect co-location, never
    correctness — pair products group by (doc_a, doc_b) afterwards."""
    lens = np.fromiter((len(t) for t in tokens), np.int64, len(tokens))
    if not len(lens):
        return np.empty(0, np.int32)
    flat = np.frombuffer(
        "".join(tokens.tolist()).encode("utf-8", "surrogatepass"),
        dtype=np.uint8,
    ).astype(np.uint64)
    blens = np.fromiter(
        (len(t.encode("utf-8", "surrogatepass")) for t in tokens),
        np.int64,
        len(tokens),
    )
    starts = np.cumsum(blens) - blens
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, blens)
    maxlen = int(blens.max()) if len(blens) else 1
    base = np.uint64(1099511628211)
    powers = np.empty(maxlen, np.uint64)
    acc = np.uint64(1)
    for i in range(maxlen):
        powers[i] = acc
        acc = acc * base
    ends = starts + blens
    rev = (np.repeat(ends, blens) - 1 - np.arange(len(flat))).astype(
        np.int64
    )
    terms = flat * powers[rev]
    h = np.add.reduceat(
        terms, np.minimum(starts, max(len(flat) - 1, 0))
    ) if len(flat) else np.zeros(len(tokens), np.uint64)
    if len(blens) and (blens == 0).any():
        # reduceat can't express empty segments; patch them to 0
        h = h.copy()
        h[blens == 0] = np.uint64(0)
    return (h % np.uint64(num_parts)).astype(np.int32)


def _emit_pair_products(tbl: pa.Table, emit_cap: int) -> pa.Table | None:
    """Postings (token, doc_id, w) → per-shared-token pair products
    (doc_a, doc_b, dot), locally pre-aggregated by pair. Vectorized
    across all runs (dictionary-encode + lexsort + the repeat/arange
    block trick); returns None past ``emit_cap`` emissions."""
    empty = pa.Table.from_pydict(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "dot": pa.array([], pa.float64()),
        }
    )
    if tbl.num_rows < 2:
        return empty
    codes = pc.dictionary_encode(
        tbl.column("token").combine_chunks()
    ).indices.to_numpy(zero_copy_only=False)
    ids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    w = tbl.column("w").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, codes))
    codes, ids, w = codes[order], ids[order], w[order]
    n = len(codes)
    new_run = np.concatenate(([True], codes[1:] != codes[:-1]))
    run_start_idx = np.nonzero(new_run)[0]
    run_id = np.cumsum(new_run) - 1
    starts = run_start_idx[run_id]
    p = np.arange(n, dtype=np.int64) - starts
    total = int(p.sum())
    if total == 0:
        return empty
    if total > emit_cap:
        return None
    jj = np.repeat(np.arange(n, dtype=np.int64), p)
    block_off = np.cumsum(p) - p
    ii = (
        np.arange(total, dtype=np.int64)
        - np.repeat(block_off, p)
        + np.repeat(starts, p)
    )
    a, b = ids[ii], ids[jj]  # doc-sorted within runs -> a < b
    prod = w[ii] * w[jj]
    out = pa.Table.from_pydict(
        {
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "dot": pa.array(prod, pa.float64()),
        }
    )
    return (
        out.group_by(["doc_a", "doc_b"])
        .aggregate([("dot", "sum")])
        .rename_columns(["doc_a", "doc_b", "dot"])
    )


def _tiled_pairs(
    aid: np.ndarray,
    amat: np.ndarray,
    bid: np.ndarray,
    bmat: np.ndarray,
    threshold: float,
    self_block: bool,
    tile_cells: int = 16_000_000,
) -> list[pa.Table]:
    """All qualifying cosine pairs between two dense unit-row sets via
    row-tiled matmul — the sims buffer never exceeds ``tile_cells``
    floats regardless of block size. ``self_block`` emits the strict
    upper triangle of one set (ids must be sorted ascending there);
    cross blocks emit (min, max)-ordered pairs."""
    outs: list[pa.Table] = []
    if not len(aid) or not len(bid):
        return outs
    step = max(1, tile_cells // max(len(bid), 1))
    for i0 in range(0, len(aid), step):
        i1 = min(len(aid), i0 + step)
        sims = amat[i0:i1] @ bmat.T
        ri, ci = np.nonzero(sims >= threshold)
        if not len(ri):
            continue
        cos = sims[ri, ci]
        gi = ri + i0
        if self_block:
            keep = ci > gi
            a, b, cos = aid[gi[keep]], bid[ci[keep]], cos[keep]
        else:
            a, b = aid[gi], bid[ci]
            keep = a != b
            a, b, cos = (
                np.minimum(a[keep], b[keep]),
                np.maximum(a[keep], b[keep]),
                cos[keep],
            )
        if not len(a):
            continue
        outs.append(
            pa.Table.from_pydict(
                {
                    "doc_a": pa.array(a, pa.int64()),
                    "doc_b": pa.array(b, pa.int64()),
                    "cosine": pa.array(np.round(cos, 6), pa.float64()),
                }
            )
        )
    return outs


def _dense_all_pairs(
    tf_ds: ray.data.Dataset,
    df_tbl: pa.Table,
    n_docs: int,
    threshold: float,
    cell_budget: int,
    sf_dir: str,
) -> ray.data.Dataset:
    """Dense tier of :func:`sparse_cosine_pairs` — see the module
    docstring. Vocabulary-bounded state (token→column map + idf
    vector) broadcasts once; the materialized tf rows (tokenized ONCE
    upstream) scatter into dense w rows; all-pairs cosine is a tiled
    block matmul, on the driver under ``cell_budget`` matrix cells,
    else over a persisted hash-blocked parquet store with one task per
    block pair.

    Batching may split a doc's tf rows across batches, so each batch
    emits UNNORMALIZED per-doc partial w rows; duplicates are summed
    (doc-sorted ``np.add.reduceat`` over rows) and L2-normalized at
    the combine point — on the driver, or inside each block (a doc's
    partials share its hash block by construction). Exact under any
    re-chunking."""
    toks = df_tbl.column("token").to_pylist()
    vocab = len(toks)
    idf = np.log(
        float(n_docs)
        / df_tbl.column("df").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
    )
    maps_ref = ray.put((dict(zip(toks, range(vocab))), idf))
    empty_rows = pa.Table.from_pydict(
        {
            "doc_id": pa.array([], pa.int64()),
            "vec": pa.array(
                [], pa.list_(pa.float64(), vocab)
            ),
        }
    )

    def dense_rows(batch: pa.Table) -> pa.Table:
        tok2col, idfv = ray.get(maps_ref)
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if not len(dids):
            return empty_rows
        btoks = batch.column("token").to_numpy(zero_copy_only=False)
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        cols = pd.Series(btoks, dtype=object).map(tok2col).to_numpy(
            np.int64
        )
        w = tf.astype(np.float64) * idfv[cols]
        uids, docpos = np.unique(dids, return_inverse=True)
        mat = np.zeros((len(uids), vocab), np.float64)
        # (doc, token) rows are globally unique -> direct scatter
        mat[docpos, cols] = w
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(uids, pa.int64()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), pa.float64()), vocab
                ),
            }
        )

    dense = tf_ds.map_batches(dense_rows, batch_format="pyarrow")

    def _mat_of(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """doc-sorted (ids, unit rows): sums split-doc partial rows,
        drops zero-norm docs, L2-normalizes."""
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        vec = tbl.column("vec").combine_chunks()
        mat = vec.values.to_numpy(zero_copy_only=False).reshape(
            -1, vocab
        )
        order = np.argsort(ids, kind="mergesort")
        ids, mat = ids[order], mat[order]
        new = np.concatenate(([True], ids[1:] != ids[:-1]))
        seg = np.flatnonzero(new)
        if len(seg) != len(ids):  # split-doc partials present
            mat = np.add.reduceat(mat, seg, axis=0)
            ids = ids[seg]
        norms = np.sqrt((mat * mat).sum(axis=1))
        keep = norms > 0
        return ids[keep], np.ascontiguousarray(
            mat[keep] / norms[keep, None]
        )

    if n_docs * vocab <= cell_budget:
        tabs = [
            t
            for t in ray.get(dense.materialize().to_arrow_refs())
            if t.num_rows
        ]
        if not tabs:
            return ray.data.from_arrow(_EMPTY_COSINE)
        ids, mat = _mat_of(pa.concat_tables(tabs))
        outs = _tiled_pairs(ids, mat, ids, mat, threshold, True)
        return ray.data.from_arrow(
            pa.concat_tables(outs) if outs else _EMPTY_COSINE
        )

    # over the driver cell budget: persist hash-blocked dense rows
    # once, then one independent task per block pair (each task holds
    # two blocks of <= per_block cells + one tile buffer)
    import glob
    import hashlib
    import os
    import shutil

    import pyarrow.parquet as pq

    per_block = max(vocab, cell_budget // 4)
    docs_per_block = max(1, per_block // vocab)
    n_blocks = max(2, -(-n_docs // docs_per_block))
    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    tag = hashlib.md5(
        f"{src}:{content_tag}:{vocab}:{n_blocks}:densecos".encode()
    ).hexdigest()[:12]
    out_dir = f"/tmp/graft_densecos/{tag}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir, exist_ok=True)

        def stamp_block(batch: pa.Table) -> pa.Table:
            ids = (
                batch.column("doc_id")
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            blk = (ids * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
                n_blocks
            )
            return batch.append_column(
                "block_id", pa.array(blk.astype(np.int32), pa.int32())
            )

        dense.map_batches(
            stamp_block, batch_format="pyarrow"
        ).write_parquet(
            os.path.join(out_dir, "blocks"), partition_cols=["block_id"]
        )
        with open(marker, "w") as f:
            f.write("ok")

    def _load_block(b: int) -> tuple[np.ndarray, np.ndarray] | None:
        paths = sorted(
            glob.glob(
                os.path.join(
                    out_dir, "blocks", f"block_id={b}", "*.parquet"
                )
            )
        )
        if not paths:
            return None
        return _mat_of(
            pq.read_table(paths, columns=["doc_id", "vec"])
        )

    def pair_task(batch: pa.Table) -> pa.Table:
        outs: list[pa.Table] = []
        for row in batch.to_pylist():  # batch_size=1: one block pair
            b1, b2 = row["b1"], row["b2"]
            a = _load_block(b1)
            if a is None:
                continue
            if b1 == b2:
                outs.extend(
                    _tiled_pairs(a[0], a[1], a[0], a[1], threshold, True)
                )
                continue
            b = _load_block(b2)
            if b is None:
                continue
            outs.extend(
                _tiled_pairs(a[0], a[1], b[0], b[1], threshold, False)
            )
        return pa.concat_tables(outs) if outs else _EMPTY_COSINE

    pairs = [
        {"b1": i, "b2": j}
        for i in range(n_blocks)
        for j in range(i, n_blocks)
    ]
    src_ds = ray.data.from_items(
        pairs, override_num_blocks=max(1, len(pairs))
    )
    return src_ds.map_batches(
        pair_task, batch_size=1, batch_format="pyarrow"
    )


def _finalize_cosine(counted: pa.Table, threshold: float) -> pa.Table:
    if counted.num_rows == 0:
        return _EMPTY_COSINE
    dot = counted.column("dot").to_numpy(zero_copy_only=False)
    keep = dot >= threshold
    return pa.Table.from_pydict(
        {
            "doc_a": counted.column("doc_a").filter(pa.array(keep)),
            "doc_b": counted.column("doc_b").filter(pa.array(keep)),
            "cosine": pa.array(np.round(dot[keep], 6), pa.float64()),
        }
    )


def sparse_cosine_pairs(
    sf_dir: str,
    threshold: float = 0.9,
    strategy: str = "auto",
    driver_budget: int = 2_000_000,
    df_budget: int = 2_000_000,
    hot_emit_cap: int = 50_000_000,
    dense_vocab_budget: int = 4096,
    dense_cell_budget: int = 200_000_000,
) -> ray.data.Dataset:
    """EXACT all-pairs tf-idf cosine ≥ threshold over non-empty docs:
    (doc_a, doc_b, cosine) with cosine rounded to 6dp (each tier's
    float-add order differs by partitioning; dots agree to ~1e-15,
    far inside the rounding).

    See the module docstring for the strategies; ``auto`` reroutes to
    the DENSE block matmul when the vocabulary fits
    ``dense_vocab_budget`` (a tiny vocabulary makes every token hot and
    any postings plan ~quadratic in emissions), else picks driver
    pair-sum under ``driver_budget`` posting rows, else probes Σdf²
    and either runs the distributed pair-sum or reroutes to the prefix
    strategy on hot-token blowup.
    """
    docs = read_documents(sf_dir)
    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")
    # tokenize ONCE: df, the dense tier and the df-cogroup tier all
    # consume these materialized rows instead of re-tokenizing
    tf_ds = docs.map_batches(
        _tf_rows, batch_format="pyarrow"
    ).materialize()
    df_tbl = _token_df(tf_ds)

    if df_tbl.num_rows == 0:
        return ray.data.from_arrow(_EMPTY_COSINE)
    if strategy == "dense" and df_tbl.num_rows > dense_vocab_budget:
        raise ValueError(
            "strategy='dense' needs vocabulary <= dense_vocab_budget "
            f"({df_tbl.num_rows} > {dense_vocab_budget}); use 'auto'"
        )
    if (
        strategy == "dense"
        or (strategy == "auto" and df_tbl.num_rows <= dense_vocab_budget)
    ):
        return _dense_all_pairs(
            tf_ds, df_tbl, n_docs, threshold, dense_cell_budget, sf_dir
        )

    df_map_ref = None
    if df_tbl.num_rows <= df_budget:
        df_map_ref = ray.put(
            dict(
                zip(
                    df_tbl.column("token").to_pylist(),
                    df_tbl.column("df").to_pylist(),
                )
            )
        )

    def postings_broadcast(batch: pa.Table) -> pa.Table:
        """Per-doc normalized tf-idf postings — one pure map when the
        vocabulary-bounded df table broadcasts."""
        dids, toks, tf = _doc_tf(batch)
        if not len(dids):
            return pa.Table.from_pydict(
                {"token": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64()),
                 "w": pa.array([], pa.float64())}
            )
        lookup = ray.get(df_map_ref)
        dfv = pd.Series(toks, dtype=object).map(lookup).to_numpy(
            np.float64
        )
        w = tf.astype(np.float64) * np.log(float(n_docs) / dfv)
        # rows are doc-contiguous (_doc_tf sorts by doc first)
        new_doc = np.concatenate(([True], dids[1:] != dids[:-1]))
        seg = np.flatnonzero(new_doc)
        norms = np.sqrt(np.add.reduceat(w * w, seg))
        wn = w / np.repeat(norms, np.diff(np.append(seg, len(w))))
        keep = np.isfinite(wn)
        return pa.Table.from_pydict(
            {
                "token": pa.array(toks[keep], pa.string()),
                "doc_id": pa.array(dids[keep], pa.int64()),
                "w": pa.array(wn[keep], pa.float64()),
            }
        )

    if df_map_ref is not None:
        postings = docs.map_batches(
            postings_broadcast, batch_format="pyarrow"
        )
    else:
        # df table past the broadcast budget: attach df by token, then
        # normalize per doc — fully distributed, two exchanges (the
        # materialized tf rows are reused; map_groups regroups by doc,
        # so tf-row batch boundaries don't matter here)
        from .joins import cogroup_attach

        joined = cogroup_attach(
            tf_ds,
            ray.data.from_arrow(df_tbl),
            key="token",
            left_fields=[
                pa.field("doc_id", pa.int64()),
                pa.field("token", pa.string()),
                pa.field("tf", pa.int64()),
            ],
            payload_fields=[pa.field("df", pa.int64())],
        )

        def normalize_doc(group: pa.Table) -> pa.Table:
            tf = group.column("tf").to_numpy(zero_copy_only=False)
            dfv = group.column("df").to_numpy(zero_copy_only=False)
            w = tf.astype(np.float64) * np.log(
                float(n_docs) / dfv.astype(np.float64)
            )
            nrm = math.sqrt(float((w * w).sum()))
            if nrm == 0:
                return pa.Table.from_pydict(
                    {"token": pa.array([], pa.string()),
                     "doc_id": pa.array([], pa.int64()),
                     "w": pa.array([], pa.float64())}
                )
            return pa.Table.from_pydict(
                {
                    "token": group.column("token"),
                    "doc_id": group.column("doc_id"),
                    "w": pa.array(w / nrm, pa.float64()),
                }
            )

        postings = joined.groupby("doc_id").map_groups(
            normalize_doc, batch_format="pyarrow"
        )

    num_parts = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))

    if strategy != "prefix":
        landed = _collect_within_budget(postings, driver_budget)
        if landed is not None and landed.num_rows:
            counted = _emit_pair_products(landed, hot_emit_cap)
            if counted is not None:
                return ray.data.from_arrow(
                    _finalize_cosine(counted, threshold)
                )
        elif landed is not None:
            return ray.data.from_arrow(_EMPTY_COSINE)

        # distributed pair-sum, guarded by the df emission probe
        dfc = df_tbl.column("df").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        max_df = float(dfc.max()) if dfc.size else 0.0
        total_emit = float((dfc * dfc).sum()) / 2.0
        if not (
            max_df * (max_df - 1) / 2 > hot_emit_cap
            or total_emit > float(num_parts) * hot_emit_cap
        ):

            def add_part(batch: pa.Table) -> pa.Table:
                toks = batch.column("token").to_numpy(
                    zero_copy_only=False
                )
                return batch.append_column(
                    "part", pa.array(_poly_part(toks, num_parts))
                )

            def emit_part(group: pa.Table) -> pa.Table:
                out = _emit_pair_products(
                    group.drop_columns(["part"]), hot_emit_cap
                )
                if out is None:  # backstop: df probe bounds this
                    raise ValueError(
                        "hot-token pair blowup past the df probe: "
                        "rerun with strategy='prefix'"
                    )
                return out

            counted_ds = (
                postings.map_batches(add_part, batch_format="pyarrow")
                .groupby("part")
                .map_groups(emit_part, batch_format="pyarrow")
                .groupby(["doc_a", "doc_b"])
                .sum("dot")
            )

            def finalize(batch: pa.Table) -> pa.Table:
                return _finalize_cosine(
                    batch.rename_columns(["doc_a", "doc_b", "dot"]),
                    threshold,
                )

            return counted_ds.map_batches(
                finalize, batch_format="pyarrow"
            )
        # hot-token corpus: fall through to the prefix strategy

    # -- All-Pairs prefix filter + candidate-only verify -----------------
    # per-doc feature order: df DESC (hot first), token ASC tiebreak
    from .relational import _combine_partials

    def maxw_partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_pydict(
            {"token": batch.column("token"), "mw": batch.column("w")}
        )
        return (
            t.group_by("token").aggregate([("mw", "max")])
            .rename_columns(["token", "mw"])
        )

    postings = postings.materialize()
    mw_partials = postings.map_batches(
        maxw_partial, batch_format="pyarrow"
    ).materialize()
    mw = _combine_partials(mw_partials, ["token"], ["mw"], agg="max")
    if mw is None:
        rows = [
            t
            for t in ray.get(
                mw_partials.groupby("token").max("mw").to_arrow_refs()
            )
            if t.num_rows
        ]
        mw = pa.concat_tables(rows).rename_columns(["token", "max(mw)"])
    order_ref = ray.put(
        (
            dict(
                zip(
                    df_tbl.column("token").to_pylist(),
                    df_tbl.column("df").to_pylist(),
                )
            ),
            dict(
                zip(
                    mw.column("token").to_pylist(),
                    mw.column("max(mw)").to_pylist(),
                )
            ),
        )
    )

    def flag_rows(batch: pa.Table) -> pa.Table:
        """Emit every posting with its All-Pairs index flag: under the
        (df asc, token asc) order, position i is INDEXED once the
        cumulative Σ_{j<=i} w_j·maxw_j reaches the threshold — a pair
        matching only in both unindexed prefixes is bounded below it."""
        df_map, mw_map = ray.get(order_ref)
        toks = batch.column("token").to_numpy(zero_copy_only=False)
        dids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        w = batch.column("w").to_numpy(zero_copy_only=False)
        if not len(toks):
            return pa.Table.from_pydict(
                {"token": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64()),
                 "idx": pa.array([], pa.bool_())}
            )
        dfv = pd.Series(toks, dtype=object).map(df_map).to_numpy(
            np.int64
        )
        mwv = pd.Series(toks, dtype=object).map(mw_map).to_numpy(
            np.float64
        )
        # per-doc (df DESC, token) order — hot tokens first, so the
        # below-threshold cumulative prefix (the UNINDEXED part)
        # absorbs them; soundness needs only a fixed per-doc order,
        # the descending choice is what makes hot tokens cheap
        order = np.lexsort((toks, -dfv, dids))
        toks, dids, w, mwv = (
            toks[order], dids[order], w[order], mwv[order]
        )
        new_doc = np.concatenate(([True], dids[1:] != dids[:-1]))
        seg = np.flatnonzero(new_doc)
        contrib = w * mwv
        cum = np.cumsum(contrib)
        base = np.repeat(cum[seg] - contrib[seg], np.diff(
            np.append(seg, len(w))
        ))
        local_cum = cum - base
        idx = local_cum >= threshold
        return pa.Table.from_pydict(
            {
                "token": pa.array(toks, pa.string()),
                "doc_id": pa.array(dids, pa.int64()),
                "idx": pa.array(idx, pa.bool_()),
            }
        )

    flagged = postings.map_batches(flag_rows, batch_format="pyarrow")

    def cand_part(batch: pa.Table) -> pa.Table:
        toks = batch.column("token").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(_poly_part(toks, num_parts))
        )

    def cand_pairs(group: pa.Table) -> pa.Table:
        """Within-token candidate pairs where at least one side indexed
        the token (the All-Pairs index∪probe condition). Enumeration is
        flagged × run, NOT run² — an unindexed hot token (e.g. a
        stopword whose idf≈0 keeps every cumulative bound below the
        threshold) costs ZERO emissions, which is the entire point of
        the prefix filter."""
        g = group.drop_columns(["part"])
        codes = pc.dictionary_encode(
            g.column("token").combine_chunks()
        ).indices.to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        idx = g.column("idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        codes, ids, idx = codes[order], ids[order], idx[order]
        n = len(codes)
        empty = pa.Table.from_pydict(
            {"doc_a": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64())}
        )
        if n < 2:
            return empty
        new_run = np.concatenate(([True], codes[1:] != codes[:-1]))
        run_start_idx = np.nonzero(new_run)[0]
        run_id = np.cumsum(new_run) - 1
        starts = run_start_idx[run_id]
        run_len = np.diff(np.append(run_start_idx, n))[run_id]
        flag_pos = np.nonzero(idx)[0]
        if not len(flag_pos):
            return empty
        cnt = run_len[flag_pos] - 1  # partners per flagged posting
        total = int(cnt.sum())
        if total == 0:
            return empty
        if total > hot_emit_cap:
            raise ValueError(
                "candidate blowup: threshold too low for the prefix "
                "strategy on this corpus"
            )
        ii = np.repeat(flag_pos, cnt)
        offs = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        local = offs + (offs >= (flag_pos - starts[flag_pos]).repeat(cnt))
        jj = starts[ii] + local  # run partners, self skipped
        a = np.minimum(ids[ii], ids[jj])
        b = np.maximum(ids[ii], ids[jj])
        keep = a != b
        out = pa.Table.from_pydict(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
            }
        )
        return out.group_by(["doc_a", "doc_b"]).aggregate([])

    cand = (
        flagged.map_batches(cand_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(cand_pairs, batch_format="pyarrow")
    )
    cand = cand.materialize()
    merged = _combine_partials(cand, ["doc_a", "doc_b"], [], agg="max")
    if merged is None:
        rows = [
            t
            for t in ray.get(
                cand.groupby(["doc_a", "doc_b"]).count().to_arrow_refs()
            )
            if t.num_rows
        ]
        pair_tbl = pa.concat_tables(rows).select(["doc_a", "doc_b"])
    else:
        pair_tbl = merged.select(["doc_a", "doc_b"])
    if pair_tbl.num_rows == 0:
        return ray.data.from_arrow(_EMPTY_COSINE)

    # verify: exact dot over candidate-only vectors (bounded by the
    # candidate count, never the corpus — the jaccard-prefix precedent)
    cand_ids = pa.array(
        sorted(
            set(pair_tbl.column("doc_a").to_pylist())
            | set(pair_tbl.column("doc_b").to_pylist())
        ),
        pa.int64(),
    )
    ids_ref = ray.put(cand_ids)

    def vectors_of_candidates(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        sub = batch.filter(
            pc.is_in(batch.column("doc_id"), value_set=wanted)
        )
        return sub

    vec_rows = [
        t
        for t in ray.get(
            postings.map_batches(
                vectors_of_candidates, batch_format="pyarrow"
            )
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    vec_tbl = (
        pa.concat_tables(vec_rows)
        if vec_rows
        else pa.Table.from_pydict(
            {"token": pa.array([], pa.string()),
             "doc_id": pa.array([], pa.int64()),
             "w": pa.array([], pa.float64())}
        )
    )
    vecs: dict[int, dict[str, float]] = {}
    for did, tok, wv in zip(
        vec_tbl.column("doc_id").to_pylist(),
        vec_tbl.column("token").to_pylist(),
        vec_tbl.column("w").to_pylist(),
    ):
        vecs.setdefault(did, {})[tok] = wv
    vecs_ref = ray.put(vecs)

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(vecs_ref)
        out_a, out_b, out_c = [], [], []
        for a, b in zip(
            batch.column("doc_a").to_pylist(),
            batch.column("doc_b").to_pylist(),
        ):
            va, vb = lookup.get(a, {}), lookup.get(b, {})
            if len(vb) < len(va):
                va, vb = vb, va
            dot = sum(w * vb[t] for t, w in va.items() if t in vb)
            if dot >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_c.append(round(dot, 6))
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )

    return ray.data.from_arrow(pair_tbl).map_batches(
        verify, batch_format="pyarrow"
    )
