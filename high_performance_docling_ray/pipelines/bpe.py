"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
"train the tokenizer on the corpus" step of an LLM data pipeline,
expressed as a Ray Data iteration:

1. ONE corpus pass builds the weighted vocabulary: per-batch
   (word, count) partials -> key-only ``groupby(word).sum``. Every
   later iteration works on the VOCABULARY (one row per distinct
   word), never on the corpus again — the classic BPE trick that makes
   n_merges passes affordable.
2. Each merge round: per-block adjacent-symbol-pair counts weighted by
   word count (register-style partials; the pair domain is bounded by
   the live vocabulary) -> driver combine -> argmax with a
   DETERMINISTIC tiebreak (count desc, then lexicographic pair asc) ->
   the winning pair merges into every word via a vectorized flat-array
   pass (parity rule resolves overlapping a==a candidates leftmost-
   first, exactly like the serial algorithm).

The vocabulary table stays distributed; only the per-block pair-count
partials (bounded by live pair domain per block) and the merge table
(n_merges rows) touch the driver. No SQL oracle — BPE is an iterative
argmax algorithm outside DuckDB's reach — so the driver gate records
rows-only and correctness is pinned by tests/test_bpe.py against a
from-scratch serial reference implementation on the same corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .corpus_clean import _tokenize
from .text_analysis import read_documents

SEP = "\x00"  # joins symbols inside a word; never appears in text


def _vocab_dataset(sf_dir: str) -> ray.data.Dataset:
    """(word, cnt) over the corpus — one key-only exchange."""
    docs = read_documents(sf_dir, ("doc_id", "text"))

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tokenize(batch.column("text"))
        enc = (
            flat.combine_chunks()
            if isinstance(flat, pa.ChunkedArray)
            else flat
        )
        if len(enc) == 0:
            return pa.Table.from_pydict(
                {"word": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        d = enc.dictionary_encode()
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False),
            minlength=len(d.dictionary),
        )
        return pa.Table.from_pydict(
            {
                "word": d.dictionary,
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .sum("cnt")
    )


def _to_symbol_rows(batch: pa.Table) -> pa.Table:
    """word -> SEP-joined character symbols (the iteration state)."""
    words = batch.column("word").to_pylist()
    syms = [SEP.join(w) for w in words]
    return pa.Table.from_pydict(
        {
            "syms": pa.array(syms, pa.string()),
            "cnt": batch.column(batch.column_names[1]),
        }
    )


def _pair_counts(batch: pa.Table) -> dict[tuple[str, str], int]:
    """Weighted adjacent-pair counts for a block of symbol rows —
    the canonical Sennrich ``get_stats`` convention: every adjacent
    pair counts, including overlapping runs (``aaa`` counts (a,a)
    twice). The merge APPLICATION is leftmost non-overlapping, as in
    the reference algorithm."""
    syms = batch.column("syms").to_pylist()
    cnts = batch.column("cnt").to_numpy(zero_copy_only=False)
    out: dict[tuple[str, str], int] = {}
    for s, c in zip(syms, cnts):
        parts = s.split(SEP)
        for key in zip(parts, parts[1:]):
            out[key] = out.get(key, 0) + int(c)
    return out


def _apply_merge(batch: pa.Table, a: str, b: str) -> pa.Table:
    """Merge every leftmost-first non-overlapping (a, b) occurrence.

    Pure string op on the SEP-joined form: replace a<SEP>b with ab.
    Python's str.replace is already leftmost-first non-overlapping,
    which is exactly the BPE rule."""
    syms = batch.column("syms").to_pylist()
    pat = f"{a}{SEP}{b}"
    rep = f"{a}{b}"
    return pa.Table.from_pydict(
        {
            "syms": pa.array([s.replace(pat, rep) for s in syms]),
            "cnt": batch.column("cnt"),
        }
    )


def bpe_train(sf_dir: str, n_merges: int = 12) -> pa.Table:
    """Learn ``n_merges`` BPE merges over the documents corpus.
    Returns the merge table (merge_ord, left, right, pair_count) —
    deterministic: ties break by (count desc, (left, right) asc)."""
    vocab = _vocab_dataset(sf_dir).map_batches(
        _to_symbol_rows, batch_format="pyarrow"
    ).materialize()

    merges: list[tuple[int, str, str, int]] = []
    for i in range(n_merges):
        # register-style partials: one dict per block, driver combine
        def pair_partial(b: pa.Table) -> pa.Table:
            d = _pair_counts(b)
            return pa.Table.from_pydict(
                {
                    "left": pa.array([k[0] for k in d], pa.string()),
                    "right": pa.array([k[1] for k in d], pa.string()),
                    "cnt": pa.array(list(d.values()), pa.int64()),
                }
            )

        parts = [
            t
            for t in ray.get(
                vocab.map_batches(pair_partial, batch_format="pyarrow")
                .materialize()
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        if not parts:
            break
        tbl = pa.concat_tables(parts)
        import pandas as pd

        agg = (
            tbl.to_pandas()
            .groupby(["left", "right"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        if not len(agg):
            break
        # deterministic argmax: count desc, then (left, right) asc
        agg = agg.sort_values(
            ["cnt", "left", "right"], ascending=[False, True, True],
            kind="mergesort",
        )
        best = agg.iloc[0]
        if int(best["cnt"]) < 2:
            break
        a, b, c = str(best["left"]), str(best["right"]), int(best["cnt"])
        merges.append((i, a, b, c))
        vocab = vocab.map_batches(
            lambda batch, a=a, b=b: _apply_merge(batch, a, b),
            batch_format="pyarrow",
        ).materialize()

    return pa.Table.from_pydict(
        {
            "merge_ord": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )
