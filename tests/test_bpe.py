"""Distributed BPE training (pipelines/bpe.py) pinned against a
from-scratch serial reference (Sennrich get_stats/merge semantics,
deterministic count-desc / pair-asc tiebreak) on the same corpus."""

import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.bpe import bpe_train  # noqa: E402

SF = "/root/testdata/sf0.001"


def _serial_bpe(texts, n_merges):
    vocab = Counter()
    for t in texts:
        vocab.update((t or "").split())
    words = {w: list(w) for w in vocab}
    merges = []
    for i in range(n_merges):
        stats = Counter()
        for w, syms in words.items():
            c = vocab[w]
            for pair in zip(syms, syms[1:]):
                stats[pair] += c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c < 2:
            break
        merges.append((i, a, b, c))
        for w, syms in words.items():
            j, out = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = out
    return merges


def _write_docs(tmp_path, texts):
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_bpe_matches_serial_reference_closed(tmp_path):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "aaaa aaaa baaa",
    ]
    sf = _write_docs(tmp_path, texts)
    got = bpe_train(sf, n_merges=8).to_pandas()
    want = _serial_bpe(texts, 8)
    assert list(
        got[["merge_ord", "left", "right", "pair_count"]].itertuples(
            index=False, name=None
        )
    ) == want


def test_bpe_matches_serial_reference_corpus():
    import duckdb

    texts = [
        r[0]
        for r in duckdb.connect()
        .execute(
            f"SELECT COALESCE(text,'') FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
        )
        .fetchall()
    ]
    got = bpe_train(SF, n_merges=6).to_pandas()
    want = _serial_bpe(texts, 6)
    assert list(
        got[["merge_ord", "left", "right", "pair_count"]].itertuples(
            index=False, name=None
        )
    ) == want


def test_bpe_deterministic():
    a = bpe_train(SF, n_merges=4).to_pandas()
    b = bpe_train(SF, n_merges=4).to_pandas()
    assert a.equals(b)
    # merges nest: a shorter run is a prefix of a longer one
    c = bpe_train(SF, n_merges=2).to_pandas()
    assert c.equals(a.iloc[:2].reset_index(drop=True))


def _serial_apply(word, merges):
    """Apply merges in rank order, leftmost non-overlapping each."""
    syms = list(word)
    for _, a, b, _ in merges:
        j, out = 0, []
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def test_bpe_encode_matches_serial_application(tmp_path):
    import numpy as np

    from high_performance_docling_ray.kernels.sketch import hash64
    from high_performance_docling_ray.pipelines.bpe import (
        bpe_encode,
        bpe_train,
    )

    texts = [
        "low low lower lowest",
        "new newer newest low",
        "wider wide wide new",
        "",
    ]
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    merges_tbl = bpe_train(str(tmp_path), n_merges=8)
    merges = list(
        zip(
            merges_tbl.column("merge_ord").to_pylist(),
            merges_tbl.column("left").to_pylist(),
            merges_tbl.column("right").to_pylist(),
            merges_tbl.column("pair_count").to_pylist(),
        )
    )
    out = (
        bpe_encode(str(tmp_path), merges=merges_tbl)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(texts):
        words = t.split()
        pieces = [p for w in words for p in _serial_apply(w, merges)]
        # every piece list concatenates back to its word
        for w in words:
            assert "".join(_serial_apply(w, merges)) == w
        want_sum = int(np.sum(hash64(pieces), dtype=np.uint64).view(np.int64)) if pieces else 0
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "n_bpe"] == len(pieces)
        assert int(out.loc[i, "checksum"]) == want_sum


def test_bpe_encode_corpus_runs():
    from high_performance_docling_ray.pipelines.bpe import bpe_encode

    out = bpe_encode(SF, n_merges=4).to_pandas()
    assert len(out) == 500
    # encoding never yields fewer than 1 piece per non-empty word
    assert (out.loc[out["n_words"] > 0, "n_bpe"] >= out.loc[out["n_words"] > 0, "n_words"]).all()
