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


def _merge_pattern(a: str, b: str):
    """Whole-symbol (a, b) matcher on the SEP-joined form — the
    Sennrich boundary trick: lookarounds assert each side is a SEP or
    a string edge WITHOUT consuming it, so (1) a pair like (o, w)
    never matches inside ["lo", "w"] just because 'o' is a suffix of
    a larger symbol, and (2) consecutive pairs ["a","b","a","b"] both
    merge (the shared SEP is not eaten by the first match). re.sub is
    leftmost-first non-overlapping, exactly the BPE rule."""
    import re

    return re.compile(
        r"(?<![^\x00])" + re.escape(a) + "\x00" + re.escape(b)
        + r"(?![^\x00])"
    )


def _apply_merge(batch: pa.Table, a: str, b: str) -> pa.Table:
    """Merge every leftmost-first non-overlapping whole-symbol (a, b)
    occurrence in each SEP-joined symbol string."""
    syms = batch.column("syms").to_pylist()
    pat = _merge_pattern(a, b)
    rep = (a + b).replace("\\", "\\\\")
    return pa.Table.from_pydict(
        {
            "syms": pa.array([pat.sub(rep, s) for s in syms]),
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


class BpeEncoder:
    """Corpus tokenization with a TRAINED merge list — the encode half
    of the tokenizer lifecycle (train -> encode -> pack). An actor
    holds the merge table (the model: tiny here, a few MB at a real
    100k-merge vocabulary — constructor-shipped once per actor, never
    per batch) and encodes each DISTINCT word of a batch once
    (dictionary-encode + scatter; web text repeats its vocabulary
    heavily), applying merges in rank order with the same
    leftmost-first non-overlapping replace the trainer used — so
    encode(word) is bit-identical to the trained vocab state.
    """

    def __init__(
        self,
        merge_pairs: list[tuple[str, str]],
        verify_roundtrip: bool = False,
    ):
        self.subs = [
            (
                _merge_pattern(a, b),
                (a + b).replace("\\", "\\\\"),
                f"{a}{SEP}{b}",
            )
            for a, b in merge_pairs
        ]
        # gate mode: also emit a per-doc lossless-decode check
        # (BPE pieces partition a word's characters, so decode is
        # just concatenation — join(encode(w)) must equal w)
        self.verify_roundtrip = verify_roundtrip

    def encode_word(self, word: str) -> list[str]:
        s = SEP.join(word)
        for pat, rep, quick in self.subs:
            if quick in s:  # cheap substring pre-filter
                s = pat.sub(rep, s)
        return s.split(SEP) if s else []

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.sketch import hash64

        flat, doc_idx, n_tok = _tokenize_words(batch.column("text"))
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nrows = batch.num_rows
        if len(flat):
            enc = flat.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            words = enc.dictionary.to_pylist()
            pieces = [self.encode_word(w) for w in words]
            piece_len = np.array([len(p) for p in pieces], np.int64)
            # per-distinct-word token-hash sum -> per-doc checksum
            word_sum = np.array(
                [
                    int(np.sum(hash64(p), dtype=np.uint64)) if p else 0
                    for p in pieces
                ],
                np.uint64,
            )
            n_bpe = np.zeros(nrows, np.int64)
            np.add.at(n_bpe, doc_idx, piece_len[codes])
            checksum = np.zeros(nrows, np.uint64)
            np.add.at(checksum, doc_idx, word_sum[codes])
            if self.verify_roundtrip:
                ok_word = np.array(
                    ["".join(p) == w for p, w in zip(pieces, words)],
                    bool,
                )
                roundtrip = np.ones(nrows, bool)
                np.logical_and.at(roundtrip, doc_idx, ok_word[codes])
        else:
            n_bpe = np.zeros(nrows, np.int64)
            checksum = np.zeros(nrows, np.uint64)
            roundtrip = np.ones(nrows, bool)
        out = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_words": pa.array(n_tok, pa.int64()),
            "n_bpe": pa.array(n_bpe, pa.int64()),
            "checksum": pa.array(checksum.view(np.int64), pa.int64()),
        }
        if self.verify_roundtrip:
            out["roundtrip_ok"] = pa.array(roundtrip, pa.bool_())
        return pa.Table.from_pydict(out)


def _tokenize_words(col):
    from .corpus_clean import _tokenize

    return _tokenize(col)


def bpe_encode(
    sf_dir: str, n_merges: int = 12, merges: pa.Table | None = None,
    verify_roundtrip: bool = False,
) -> ray.data.Dataset:
    """Tokenize the whole corpus with a trained BPE: per doc
    (doc_id, n_words, n_bpe, checksum) where checksum is the mod-2^64
    sum of md5 hashes of the doc's BPE tokens (pins byte-level token
    agreement in tests without shipping token lists). Trains the
    merges first unless a merge table is passed. Rows-only at the
    driver gate (iterative encode is outside SQL); pinned against a
    serial reference in tests/test_bpe.py."""
    if merges is None:
        merges = bpe_train(sf_dir, n_merges)
    pairs = list(
        zip(merges.column("left").to_pylist(),
            merges.column("right").to_pylist())
    )
    from .text_analysis import read_documents

    docs = read_documents(sf_dir, ("doc_id", "text"))
    return docs.map_batches(
        BpeEncoder,
        fn_constructor_args=(pairs, verify_roundtrip),
        concurrency=(1, 4),
        batch_format="pyarrow",
    )
