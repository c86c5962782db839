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
