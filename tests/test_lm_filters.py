"""LM-training filters (pipelines/lm_filters.py): closed-form checks
on crafted corpora plus the broadcast/cogroup tier pins for both
operators."""

import math
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.lm_filters import (  # noqa: E402
    decontaminate,
    unigram_logprob,
)

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, rows):
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_decontaminate_closed_form(tmp_path):
    # doc 0 is eval (0 % 50 == 0); with n=3 its shingles are the
    # 3-grams of "one two three four". doc 1 repeats "two three four"
    # (1 shared shingle); doc 2 shares nothing; doc 7 copies the whole
    # eval text (2 shared shingles).
    sf = _write_docs(
        tmp_path,
        [
            (0, "one two three four"),
            (1, "x y two three four"),
            (2, "p q r s t"),
            (7, "one two three four"),
        ],
    )
    out = (
        decontaminate(sf, n=3, plant=False)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 7]
    assert out["n_hits"].tolist() == [1, 2]


def test_decontaminate_short_doc_whole_shingle(tmp_path):
    # below-n docs shingle as the whole token string (ngram_set rule):
    # eval doc 0 "tiny doc" (2 tokens < 3) == train doc 3's text
    sf = _write_docs(tmp_path, [(0, "tiny doc"), (3, "tiny doc")])
    out = decontaminate(sf, n=3, plant=False).to_pandas()
    assert out["doc_id"].tolist() == [3]
    assert out["n_hits"].tolist() == [1]


def test_decontaminate_tiers_equal():
    """Broadcast eval-set tier == forced cogroup tier, byte for byte."""
    a = (
        decontaminate(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) > 0  # planted leaks make contamination observable
    b = (
        decontaminate(SF, eval_broadcast_budget=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[list(a.columns)]
    )
    assert a.equals(b)


def test_unigram_logprob_closed_form(tmp_path):
    # corpus tokens: a a a b  -> p(a)=3/4, p(b)=1/4
    # doc0 "a a a" -> mean lp = ln(3/4); doc1 "b" -> ln(1/4)
    sf = _write_docs(tmp_path, [(0, "a a a"), (1, "b")])
    out = (
        unigram_logprob(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_tokens"].tolist() == [3, 1]
    assert out.loc[0, "logprob"] == round(math.log(3 / 4), 6)
    assert out.loc[1, "logprob"] == round(math.log(1 / 4), 6)


def test_unigram_logprob_empty_doc_emits_no_row(tmp_path):
    sf = _write_docs(tmp_path, [(0, "a b"), (1, "   "), (2, "")])
    out = unigram_logprob(sf).to_pandas()
    assert out["doc_id"].tolist() == [0]


def test_unigram_logprob_tiers_equal():
    """Broadcast count tier == forced cogroup tier, byte for byte."""
    a = (
        unigram_logprob(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        unigram_logprob(SF, cnt_broadcast_budget=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[list(a.columns)]
    )
    assert len(a) == 500
    assert a.equals(b)


def test_pack_sequences_closed_form(tmp_path):
    # token counts: doc0=3, doc1 skipped (0 tokens), doc2=4, doc3=2
    # concat order 0,2,3 -> spans [0,3) [3,7) [7,9); capacity 4:
    # chunk0 = doc0(3) + doc2(1); chunk1 = doc2(3) + doc3(1); chunk2 = doc3(1)
    sf = _write_docs(
        tmp_path,
        [(0, "a b c"), (1, "   "), (2, "d e f g"), (3, "h i")],
    )
    from high_performance_docling_ray.pipelines.lm_filters import (
        pack_sequences,
    )

    out = (
        pack_sequences(sf, capacity=4, bucket_docs=2)
        .to_pandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    assert out["chunk_id"].tolist() == [0, 1, 2]
    assert out["n_tokens"].tolist() == [4, 4, 1]
    assert out["n_docs"].tolist() == [2, 2, 1]
    assert out["first_doc"].tolist() == [0, 2, 3]
    assert out["last_doc"].tolist() == [2, 3, 3]


def test_pack_sequences_conservation():
    """Total packed tokens == total corpus tokens; every chunk except
    the last is exactly full."""
    from high_performance_docling_ray.pipelines.lm_filters import (
        pack_sequences,
    )

    out = (
        pack_sequences(SF, capacity=512)
        .to_pandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    assert (out["n_tokens"].iloc[:-1] == 512).all()
    import duckdb

    total = duckdb.connect().execute(
        r"""SELECT SUM(len(list_filter(
              regexp_split_to_array(trim(text), '\s+'), x -> x <> '')))
            FROM read_parquet(?)""",
        [SF + "/documents.parquet"],
    ).fetchone()[0]
    assert int(out["n_tokens"].sum()) == int(total)
    assert out["chunk_id"].tolist() == list(range(len(out)))


def test_clean_corpus_closed_form(tmp_path):
    from high_performance_docling_ray.pipelines.lm_filters import clean_corpus

    long15 = " ".join(f"w{i}" for i in range(20))
    sf = _write_docs(
        tmp_path,
        [
            (1, "too few words"),           # too_short
            (2, long15),                    # kept twin winner
            (4, long15),                    # exact_dup of 2
            (5, " ".join(["ping pong"] * 20)),  # repetitious
            (6, "the a of and to in is it you that " +
                " ".join(f"u{i}" for i in range(10))),
        ],
    )
    out = (
        clean_corpus(sf, plant=False, min_quality=0.0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = dict(zip(out["doc_id"], out["reason"]))
    assert got[1] == "too_short"
    assert got[2] is None and got[4] == "exact_dup"
    assert got[5] == "repetitious"
    assert got[6] is None
    assert out["keep"].tolist() == [0, 1, 0, 0, 1]


def test_clean_corpus_precedence_and_totals():
    """Planted sf0.001 corpus: every rule fires, verdict covers every
    doc exactly once, and holdout beats every other reason."""
    from high_performance_docling_ray.pipelines.lm_filters import clean_corpus

    out = clean_corpus(SF).to_pandas()
    assert len(out) == 500
    assert set(out.loc[out["keep"] == 0, "reason"]) == {
        "holdout",
        "too_short",
        "exact_dup",
        "repetitious",
        "low_quality",
        "contaminated",
    }
    assert out.loc[out["keep"] == 1, "reason"].isna().all()
    assert (out.loc[out["doc_id"] % 50 == 0, "reason"] == "holdout").all()


def test_shuffle_ranks_is_permutation_and_salted():
    from high_performance_docling_ray.pipelines.lm_filters import (
        shuffle_ranks,
    )

    a = shuffle_ranks(SF).to_pandas()
    assert sorted(a["shuffle_rank"]) == list(range(500))  # a permutation
    b = shuffle_ranks(SF).to_pandas()  # deterministic rerun
    # reset_index: Ray block order varies run to run, and
    # DataFrame.equals compares the index too
    assert (
        a.sort_values("doc_id")
        .reset_index(drop=True)
        .equals(b.sort_values("doc_id").reset_index(drop=True))
    )
    c = shuffle_ranks(SF, salt=1).to_pandas()  # new epoch, new order
    merged = a.merge(c, on="doc_id", suffixes=("_0", "_1"))
    assert (merged["shuffle_rank_0"] != merged["shuffle_rank_1"]).any()


def test_shuffle_ranks_matches_serial_order(tmp_path):
    import hashlib

    from high_performance_docling_ray.pipelines.lm_filters import (
        shuffle_ranks,
    )

    sf = _write_docs(tmp_path, [(i, f"doc {i}") for i in range(40)])
    out = (
        shuffle_ranks(sf, n_buckets=8)
        .to_pandas()
        .sort_values("shuffle_rank")
    )
    def h(i):
        return int.from_bytes(
            hashlib.md5(f"0:{i}".encode()).digest()[:8], "little"
        )
    want = sorted(range(40), key=lambda i: (h(i), i))
    assert out["doc_id"].tolist() == want


def test_clean_corpus_tiers_equal():
    """Broadcast contamination tier == forced distributed tier."""
    from high_performance_docling_ray.pipelines.lm_filters import clean_corpus

    a = (
        clean_corpus(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        clean_corpus(SF, eval_broadcast_budget=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[list(a.columns)]
    )
    assert a.equals(b)


def test_curate_and_pack_composition():
    """The composed DAG == manual composition: pack only kept docs,
    token totals match the kept corpus exactly."""
    import duckdb

    from high_performance_docling_ray.pipelines.lm_filters import (
        clean_corpus,
        curate_and_pack,
    )

    out = (
        curate_and_pack(SF, capacity=128)
        .to_pandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    assert (out["n_tokens"].iloc[:-1] == 128).all()
    kept = clean_corpus(SF).to_pandas()
    kept_ids = set(kept.loc[kept["keep"] == 1, "doc_id"])
    # every doc referenced by a chunk is a kept doc
    assert set(out["first_doc"]).issubset(kept_ids)
    assert set(out["last_doc"]).issubset(kept_ids)


def test_clean_corpus_verdicts_resumable(tmp_path):
    """The verdict table rides the shard-manifest sink: a mid-run crash
    leaves manifests for completed shards, the resume writes ONLY the
    missing ones, and the union equals a crash-free run."""
    import glob
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from high_performance_docling_ray.pipelines.lm_filters import clean_corpus
    from high_performance_docling_ray.state.checkpoint import (
        completed_shards,
        write_resumable,
    )

    n_shards = 8

    def with_shards(ds):
        return ds.map_batches(
            lambda b: b.append_column(
                "shard_id",
                pc.cast(
                    pc.bit_wise_and(b.column("doc_id"), n_shards - 1),
                    pa.int32(),
                ),
            ),
            batch_format="pyarrow",
        )

    out_dir = str(tmp_path / "verdicts")
    try:
        write_resumable(
            with_shards(clean_corpus(SF)),
            out_dir,
            num_shards=n_shards,
            _fail_shards={3, 5},
        )
    except Exception:
        pass  # injected crash
    done = completed_shards(out_dir)
    assert done and 3 not in done and 5 not in done
    # resume: write only the missing shards
    done_arr = pa.array(sorted(done), type=pa.int32())
    remaining = with_shards(clean_corpus(SF)).map_batches(
        lambda b: b.filter(
            pc.invert(pc.is_in(b.column("shard_id"), value_set=done_arr))
        ),
        batch_format="pyarrow",
    )
    write_resumable(remaining, out_dir, num_shards=n_shards)
    got = (
        pd.concat(
            [
                pd.read_parquet(p)
                for p in glob.glob(
                    os.path.join(out_dir, "shard_id=*", "*.parquet")
                )
            ]
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = clean_corpus(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got[want.columns.tolist()].equals(want)


def test_bigram_logprob_closed_form(tmp_path):
    # corpus: doc0 "a b a", doc1 "b a", doc2 "a" -> unigrams a:4 b:2
    # T=6 (doc2's lone token still feeds the model, same as the SQL
    # oracle); bigrams: "a b":1, "b a":2
    # doc0 positions: (a,b) lp=ln(.7*1/4 + .3*2/6); (b,a) ln(.7*2/2 + .3*4/6)
    # doc1: (b,a) -> same as second term; doc2 single token -> no row
    from high_performance_docling_ray.pipelines.lm_filters import (
        bigram_logprob,
    )

    sf = _write_docs(tmp_path, [(0, "a b a"), (1, "b a"), (2, "a")])
    out = (
        bigram_logprob(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lp_ab = math.log(0.7 * (1 / 4) + 0.3 * (2 / 6))
    lp_ba = math.log(0.7 * (2 / 2) + 0.3 * (4 / 6))
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_bigrams"].tolist() == [2, 1]
    assert out.loc[0, "bigram_logprob"] == round((lp_ab + lp_ba) / 2, 6)
    assert out.loc[1, "bigram_logprob"] == round(lp_ba, 6)


def test_bigram_logprob_tiers_equal():
    """Broadcast model tier == forced three-cogroup tier, byte for
    byte (the n_bigrams/rounded-mean outputs are exact either way)."""
    from high_performance_docling_ray.pipelines.lm_filters import (
        bigram_logprob,
    )

    a = (
        bigram_logprob(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        bigram_logprob(SF, cnt_broadcast_budget=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[list(a.columns)]
    )
    assert len(a) > 0
    assert a.equals(b)


def test_perplexity_buckets_ordering_and_ties(tmp_path):
    """Every head logprob >= every middle >= every tail within a lang;
    all-tied logprobs collapse to one bucket ('head', ties take the
    higher bucket)."""
    from high_performance_docling_ray.pipelines.lm_filters import (
        perplexity_buckets,
    )

    # 6 docs, one lang, strictly distinct logprobs (token freqs 6..1)
    rows = [(i, " ".join([f"w{i}"] * (i + 1)) + " common") for i in range(6)]
    sf = _write_docs(tmp_path, rows)
    out = perplexity_buckets(sf).to_pandas()
    assert len(out) == 6
    by = {
        b: sorted(g["logprob"]) for b, g in out.groupby("bucket")
    }
    assert set(by) == {"head", "middle", "tail"}
    assert min(by["head"]) >= max(by["middle"]) >= max(by["tail"])

    # all-identical docs -> identical logprob -> single 'head' bucket
    sf2 = _write_docs(tmp_path / "t2" if (tmp_path / "t2").mkdir() is None else tmp_path / "t2", [(i, "x y z") for i in range(5)])
    out2 = perplexity_buckets(sf2).to_pandas()
    assert set(out2["bucket"]) == {"head"}


def test_perplexity_buckets_deterministic():
    from high_performance_docling_ray.pipelines.lm_filters import (
        perplexity_buckets,
    )

    a = (
        perplexity_buckets(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        perplexity_buckets(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[list(a.columns)]
    )
    assert len(a) == 500
    assert a.equals(b)
    # per-lang tercile sizes: |head|+|middle|+|tail| == n and sizes
    # within 1 of n/3 when logprobs are distinct enough
    g = a.groupby("lang")["bucket"].value_counts().unstack(fill_value=0)
    assert (g.sum(axis=1) == a.groupby("lang").size()).all()


def test_quality_classifier_closed_form(tmp_path):
    # serial reference: same hashing/weights, computed by hand
    import hashlib

    import numpy as np

    from high_performance_docling_ray.pipelines.lm_filters import (
        quality_classifier,
    )

    def h64(s):
        return int.from_bytes(
            hashlib.md5(s.encode()).digest()[:8], "little"
        )

    sf = _write_docs(
        tmp_path,
        [(0, "alpha beta gamma"), (1, "solo"), (2, ""), (3, None)],
    )
    out = (
        quality_classifier(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # docs 2/3 have no tokens -> no row
    assert out["doc_id"].tolist() == [0, 1]
    feats0 = ["alpha", "beta", "gamma", "alpha beta", "beta gamma"]
    ks = [h64(str(h64(f) % 4096)) % 2001 for f in feats0]
    num = sum(ks) - 1000 * len(ks)
    assert out.loc[0, "n_feat"] == 5
    assert out.loc[0, "score"] == round(num / (997.0 * len(ks)), 6)
    assert bool(out.loc[0, "keep"]) == (num >= 0)
    k1 = h64(str(h64("solo") % 4096)) % 2001
    assert out.loc[1, "n_feat"] == 1
    assert out.loc[1, "score"] == round((k1 - 1000) / 997.0, 6)
    p = 1.0 / (1.0 + np.exp(-4.0 * ((k1 - 1000) / 997.0)))
    assert out.loc[1, "prob"] == round(p, 6)


def _serial_ffd(pairs, capacity):
    """(doc_id, n_tok) -> {doc_id: bin}, FFD with (n desc, id asc)."""
    order = sorted(pairs, key=lambda p: (-p[1], p[0]))
    remaining, out = [], {}
    for d, t in order:
        if t >= capacity:
            out[d] = len(remaining)
            remaining.append(0)
            continue
        for b, rem in enumerate(remaining):
            if rem >= t:
                out[d] = b
                remaining[b] = rem - t
                break
        else:
            out[d] = len(remaining)
            remaining.append(capacity - t)
    return out


def test_pack_bins_serial_pin_single_bucket(tmp_path):
    from high_performance_docling_ray.pipelines.lm_filters import pack_bins

    # token counts 300, 300, 200, 200, 600(overflow), 100
    texts = [
        "w " * 300, "x " * 300, "y " * 200, "z " * 200,
        "v " * 600, "u " * 100,
    ]
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array([t.strip() for t in texts], pa.string()),
            "lang": pa.array(["en"] * 6),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        pack_bins(str(tmp_path), capacity=512)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _serial_ffd([(i, n) for i, n in enumerate([300, 300, 200, 200, 600, 100])], 512)
    assert dict(zip(out["doc_id"], out["bin_id"])) == want
    assert out.loc[4, "overflow"] and not out.loc[0, "overflow"]


def test_pack_bins_invariants_corpus():
    from high_performance_docling_ray.pipelines.lm_filters import (
        _tok_count_rows,
        pack_bins,
    )
    from high_performance_docling_ray.pipelines.text_analysis import (
        read_documents,
    )

    out = pack_bins(SF, capacity=512).to_pandas()
    # conservation: every nonzero-token doc assigned exactly once
    n_docs = len(
        _tok_count_rows(read_documents(SF, ("doc_id", "text")), 256)
        .to_pandas()
    )
    assert len(out) == n_docs
    assert out["doc_id"].is_unique
    # capacity: every non-overflow bin fits
    fills = out[~out["overflow"]].groupby("bin_id")["n_tok"].sum()
    assert (fills <= 512).all()
    # overflow bins are singletons
    over_bins = out[out["overflow"]]["bin_id"]
    assert out["bin_id"].isin(over_bins).sum() == len(over_bins)
    # determinism
    out2 = pack_bins(SF, capacity=512).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_split_contamination_tiers_and_semantics(ray_session):
    """Shared-shingle leakage counts: tier equality AND both rule
    counts equal a from-scratch serial recomputation over the corpus
    (so a swapped flag, a stale hash rule, or doc/source conflation
    cannot pass)."""
    import pyarrow.parquet as pq

    from high_performance_docling_ray.kernels.text_stats import ngram_set
    from high_performance_docling_ray.pipelines.corpus_clean import (
        split_of_doc_ids,
        split_of_sources,
    )
    from high_performance_docling_ray.pipelines.lm_filters import (
        split_contamination,
    )

    sf = "/root/testdata/sf0.001"
    a = split_contamination(sf)
    b = split_contamination(sf, combine_limit=0)
    assert a.equals(b)
    d = dict(zip(a.column("rule").to_pylist(),
                 a.column("shared_shingles").to_pylist()))

    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    import numpy as np

    ids = docs.column("doc_id").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    doc_tr = split_of_doc_ids(ids) == "train"
    src_tr = split_of_sources(docs.column("source")) == "train"
    sides: dict[str, list[set]] = {
        "doc_tr": set(), "doc_te": set(), "src_tr": set(), "src_te": set()
    }
    for i, text in enumerate(docs.column("text").to_pylist()):
        sh = ngram_set(text or "", 8)
        if doc_tr[i]:
            sides["doc_tr"] |= sh
        else:
            sides["doc_te"] |= sh
        if src_tr[i]:
            sides["src_tr"] |= sh
        else:
            sides["src_te"] |= sh
    assert d["doc"] == len(sides["doc_tr"] & sides["doc_te"])
    assert d["source"] == len(sides["src_tr"] & sides["src_te"])
