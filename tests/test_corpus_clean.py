"""Corpus-cleaning operators (pipelines/corpus_clean.py): closed-form
unit checks on crafted corpora plus the broadcast/cogroup tier pin for
TF-IDF."""

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.corpus_clean import (  # noqa: E402
    _group_counts,
    _tokenize,
    redact_pii,
    repetition_signals,
    segment_dedup,
    tfidf_topk,
)

SF = "/root/testdata/sf0.001"


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


def test_tokenize_edges():
    flat, doc_idx, n_tok = _tokenize(
        pa.chunked_array([["  a  b ", "", "x", None]])
    )
    assert flat.to_pylist() == ["a", "b", "x"]
    assert doc_idx.tolist() == [0, 0, 2]
    assert n_tok.tolist() == [2, 0, 1, 0]


def test_group_counts():
    doc = np.array([0, 0, 0, 1, 1], np.int64)
    code = np.array([7, 7, 3, 7, 7], np.int64)
    firsts, counts = _group_counts([doc, code])
    got = sorted(zip(doc[firsts].tolist(), code[firsts].tolist(), counts.tolist()))
    assert got == [(0, 3, 1), (0, 7, 2), (1, 7, 2)]


def test_repetition_signals_closed_form(tmp_path):
    # doc0: 'a b a b a b' -> 6 tokens, 2 distinct, top bigram 'a b' x3,
    # trigrams: aba x2, bab x2 -> all 4 duplicated
    # doc1: all distinct -> all fracs 0
    sf = _write_docs(tmp_path, ["a b a b a b", "p q r s"])
    out = (
        repetition_signals(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.loc[0, "n_tokens"] == 6
    assert out.loc[0, "dup_token_frac"] == pytest.approx(4 / 6, abs=1e-6)
    assert out.loc[0, "top_bigram_frac"] == pytest.approx(1.0, abs=1e-6)
    assert out.loc[0, "dup_trigram_frac"] == pytest.approx(1.0, abs=1e-6)
    assert out.loc[1, "dup_token_frac"] == 0.0
    assert out.loc[1, "top_bigram_frac"] == pytest.approx(2 / 4, abs=1e-6)
    assert out.loc[1, "dup_trigram_frac"] == 0.0


def test_redact_pii_planted(tmp_path):
    sf = _write_docs(tmp_path, ["hello world", "reach me at a.b-c@x.co now"])
    out = redact_pii(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # every doc gets exactly one planted email + phone; doc1 has one organic email
    assert out["n_phones"].tolist() == [1, 1]
    assert out["n_emails"].tolist() == [1, 2]
    assert "[EMAIL]" in out.loc[1, "redacted"]
    assert "a.b-c@x.co" not in out.loc[1, "redacted"]
    assert out.loc[0, "redacted"].endswith("or [PHONE].")


def test_segment_dedup_keep_first(tmp_path):
    # seg_tokens=2: doc0 = [a b][c d]; doc1 = [c d][e f]; doc2 = [a b]
    # winners: 'a b'->(0,0), 'c d'->(0,1), 'e f'->(1,1)
    # doc2 loses its only segment -> no row
    sf = _write_docs(tmp_path, ["a b c d", "c d e f", "a b"])
    out = (
        segment_dedup(sf, seg_tokens=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1]
    assert out["dedup_text"].tolist() == ["a b c d", "e f"]
    assert out["n_kept"].tolist() == [2, 1]


def test_segment_dedup_partial_tail(tmp_path):
    # 3-token doc with seg_tokens=2 -> segments [a b], [c]
    sf = _write_docs(tmp_path, ["a b c"])
    out = segment_dedup(sf, seg_tokens=2).to_pandas()
    assert out["dedup_text"].tolist() == ["a b c"]
    assert out["n_kept"].tolist() == [2]


def test_tfidf_closed_form(tmp_path):
    # 'x' appears in both docs (df=2, idf=ln(1)=0); 'y' only in doc0
    sf = _write_docs(tmp_path, ["x y y", "x z"])
    out = tfidf_topk(sf, k=2).to_pandas()
    d0 = out[out.doc_id == 0].set_index("token")
    assert d0.loc["y", "tf"] == 2 and d0.loc["y", "df"] == 1
    assert d0.loc["y", "score"] == pytest.approx(2 * np.log(2), abs=1e-6)
    assert d0.loc["x", "score"] == 0.0
    # rank: y (score>0) before x (0)
    assert out[out.doc_id == 0]["token"].tolist() == ["y", "x"]


def test_tfidf_tiers_equal():
    """Broadcast df tier == forced cogroup tier, byte for byte."""
    a = (
        tfidf_topk(SF)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    b = (
        tfidf_topk(SF, df_broadcast_budget=0)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)[list(a.columns)]
    )
    assert a.equals(b)


def test_segment_dedup_sf_conservation():
    """Every distinct segment in the corpus survives exactly once:
    total kept == corpus-wide distinct segment count."""
    out = segment_dedup(SF).to_pandas()
    kept_total = int(out["n_kept"].sum())

    import duckdb

    con = duckdb.connect()
    distinct = con.execute(
        rf"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM read_parquet('{SF}/documents.parquet')
        ),
        s2 AS (
          SELECT array_to_string(toks[u.ord*13+1 : u.ord*13+13], ' ') AS seg
          FROM t,
               unnest(range(0, CAST(ceil(len(toks) / 13.0) AS INT))) AS u(ord)
        )
        SELECT COUNT(DISTINCT seg) FROM s2
        """
    ).fetchone()[0]
    assert kept_total == distinct


def test_inverted_index_roundtrip_and_pruning():
    """Partition-pruned lookup equals a direct tf count, and the read
    touches only the query tokens' buckets."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        build_inverted_index,
        out_glob,
        postings_lookup,
    )
    from high_performance_docling_ray.pipelines.joins import (
        string_key_buckets,
    )

    got = postings_lookup(SF, ["spark", "key"]).to_pandas()

    import duckdb

    want = duckdb.connect().execute(
        rf"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM read_parquet('{SF}/documents.parquet')
        ),
        tok AS (SELECT doc_id, unnest(toks) AS token FROM t)
        SELECT token, doc_id, COUNT(*) AS tf FROM tok
        WHERE token IN ('spark', 'key')
        GROUP BY 1, 2 ORDER BY token, doc_id
        """
    ).fetchdf().astype({"tf": "int64"})
    assert got.reset_index(drop=True).equals(want)

    # pruning: the lookup's buckets are a strict subset of all buckets
    import os

    index_dir = build_inverted_index(SF)
    all_buckets = {
        int(d.split("=")[1])
        for d in os.listdir(index_dir)
        if d.startswith("bucket=")
    }
    query_buckets = set(
        string_key_buckets(
            pa.array(["spark", "key"], pa.string()), 16
        ).tolist()
    )
    assert query_buckets <= all_buckets
    assert len(query_buckets) < len(all_buckets)


def test_cms_guarantee_vs_exact():
    """CMS estimates dominate true counts; absent tokens estimate 0
    only when their buckets are collision-free (just assert >=)."""
    from high_performance_docling_ray.pipelines.corpus_clean import (
        cms_token_estimates,
    )

    import duckdb

    probes = ["spark", "key", "zzzabsent"]
    est = (
        cms_token_estimates(SF, probes)
        .to_pandas()
        .set_index("token")["est"]
    )
    true = duckdb.connect().execute(
        rf"""
        WITH t AS (
          SELECT list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM read_parquet('{SF}/documents.parquet')
        )
        SELECT token, COUNT(*) AS cnt
        FROM (SELECT unnest(toks) AS token FROM t)
        WHERE token IN ('spark', 'key') GROUP BY token
        """
    ).fetchdf().set_index("token")["cnt"]
    for tok in ["spark", "key"]:
        assert est[tok] >= true[tok]
    assert est["zzzabsent"] >= 0


def test_bloom_membership_no_false_negatives(tmp_path):
    from high_performance_docling_ray.pipelines.corpus_clean import (
        bloom_token_membership,
    )

    sf = _write_docs(tmp_path, ["alpha beta gamma", "delta alpha"])
    out = bloom_token_membership(
        sf, ["alpha", "beta", "gamma", "delta", "nope1", "nope2"]
    ).to_pandas()
    got = dict(zip(out["token"], out["hit"]))
    # present tokens MUST hit (no false negatives)
    assert all(got[t] == 1 for t in ["alpha", "beta", "gamma", "delta"])
    # 5 distinct tokens * 4 bits in 8192 -> absent probes miss w.h.p.
    assert got["nope1"] == 0 and got["nope2"] == 0


def test_bloom_kernel_merge_is_union():
    import numpy as np

    from high_performance_docling_ray.kernels.sketch import (
        bloom_add,
        bloom_query,
    )

    a = bloom_add(np.zeros(8192, bool), ["x", "y"])
    b = bloom_add(np.zeros(8192, bool), ["z"])
    merged = a | b
    whole = bloom_add(np.zeros(8192, bool), ["x", "y", "z"])
    assert (merged == whole).all()
    assert bloom_query(merged, ["x", "y", "z"]).all()


def test_top_tokens_per_lang_closed_form(tmp_path):
    import pyarrow.parquet as _pq

    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["b a a", "c c c b", "z z q"], pa.string()),
            "lang": pa.array(["en", "en", None], pa.string()),
        }
    )
    _pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    from high_performance_docling_ray.pipelines.corpus_clean import (
        top_tokens_per_lang,
    )

    out = (
        top_tokens_per_lang(str(tmp_path), k=2)
        .to_pandas()
        .sort_values(["lang", "cnt", "token"], na_position="first")
        .reset_index(drop=True)
    )
    # en: c x3, a x2 (b x2 loses the tie to a); null lang: z x2, q x1
    en = out[out["lang"] == "en"]
    assert sorted(zip(en["token"], en["cnt"])) == [("a", 2), ("c", 3)]
    nul = out[out["lang"].isna()]
    assert sorted(zip(nul["token"], nul["cnt"])) == [("q", 1), ("z", 2)]


def test_phrase_lookup_closed_form(tmp_path):
    import pyarrow.parquet as _pq

    from high_performance_docling_ray.pipelines.corpus_clean import (
        phrase_lookup,
    )

    texts = [
        "a b a b a",          # "a b a": occurrences at 0 and 2
        "a b c a b a x",      # one at 3
        "b a b a b",          # one at 1
        "c c c",              # none
        "a b",                # phrase longer than doc suffix: none
    ]
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts)),
        }
    )
    _pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        phrase_lookup(str(tmp_path), phrase=("a", "b", "a"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["n_occ"].tolist() == [2, 1, 1]
    assert out["first_pos"].tolist() == [0, 3, 1]


def test_phrase_lookup_pruned_and_absent(tmp_path):
    import os

    import pyarrow.parquet as _pq

    from high_performance_docling_ray.pipelines.corpus_clean import (
        build_positional_index,
        phrase_lookup,
    )
    from high_performance_docling_ray.pipelines.joins import (
        string_key_buckets,
    )

    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["x y z w", "y z x"], pa.string()),
            "lang": pa.array(["en", "en"]),
        }
    )
    _pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    # absent phrase -> empty result with a stable schema
    out = phrase_lookup(str(tmp_path), phrase=("z", "q")).to_pandas()
    assert len(out) == 0
    # pruning: the query's buckets are a subset of the store's
    index_dir = build_positional_index(str(tmp_path))
    all_buckets = {
        int(d.split("=")[1])
        for d in os.listdir(index_dir)
        if d.startswith("bucket=")
    }
    qb = set(
        string_key_buckets(pa.array(["y", "z"], pa.string()), 16).tolist()
    )
    assert qb <= all_buckets


def _freq_ngram_oracle(sf_dir, phi, n=3):
    import duckdb

    assert n == 3
    return (
        duckdb.connect()
        .execute(
            rf"""
        WITH t AS (
          SELECT list_filter(regexp_split_to_array(trim(text), '\s+'),
                             x -> x <> '') AS toks
          FROM read_parquet('{sf_dir}/documents.parquet')
        ),
        g AS (
          SELECT toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
                 AS gram
          FROM t, UNNEST(range(1, len(toks) - 1)) AS r(i)
          WHERE len(toks) >= 3
        ),
        tot AS (SELECT COUNT(*) AS n FROM g)
        SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM g, tot
        GROUP BY gram, n
        HAVING COUNT(*) >= {phi} * n
        ORDER BY cnt DESC, gram
        """
        )
        .arrow()
    )


def test_frequent_ngrams_matches_exact(ray_session):
    from high_performance_docling_ray.pipelines.corpus_clean import (
        frequent_ngrams,
    )

    got = frequent_ngrams(SF, phi=0.0002)
    want = _freq_ngram_oracle(SF, 0.0002)
    assert got.num_rows > 0
    assert got.equals(want.cast(got.schema))


def test_frequent_ngrams_exact_under_forced_truncation(
    ray_session, tmp_path
):
    """phi large enough that cap = ceil(2/phi) is far below the
    distinct-gram count of every batch, so the Misra-Gries decrement
    actually fires (dec > 0) in pass 1 — and the candidate-verify
    pass still recovers the EXACT heavy-hitter set. 2500 docs spans
    multiple map_batches batches, exercising the summary merge."""
    rng = np.random.default_rng(7)
    texts = []
    for i in range(2500):
        # unique filler grams per doc + a planted hot phrase in 1/3
        filler = " ".join(f"u{i}x{j}" for j in range(8))
        if i % 3 == 0:
            texts.append(filler + " hot hot hot hot")
        else:
            texts.append(filler)
    # shuffle so hot docs spread over batches
    order = rng.permutation(len(texts))
    sf = _write_docs(tmp_path, [texts[k] for k in order])

    from high_performance_docling_ray.pipelines.corpus_clean import (
        frequent_ngrams,
    )

    phi = 0.01  # cap = 200 << ~8k distinct grams per 1024-doc batch
    got = frequent_ngrams(sf, phi=phi)
    want = _freq_ngram_oracle(sf, phi)
    assert want.num_rows > 0  # the planted phrase must survive
    assert got.equals(want.cast(got.schema))


def test_frequent_ngrams_edges(ray_session, tmp_path):
    from high_performance_docling_ray.pipelines.corpus_clean import (
        frequent_ngrams,
    )

    # all docs shorter than n -> zero grams -> empty with stable schema
    sf = _write_docs(tmp_path, ["a b", "", "x"])
    out = frequent_ngrams(sf, phi=0.1)
    assert out.num_rows == 0
    assert out.column_names == ["gram", "cnt"]
    with pytest.raises(ValueError):
        frequent_ngrams(sf, phi=0.0)
    with pytest.raises(ValueError):
        frequent_ngrams(sf, phi=0.1, n=0)


def test_zipf_slope_closed_form(tmp_path):
    """Exact powers-of-two counts: token 'a' x4, 'b' x2, 'c' x1 gives
    y = ln(4),ln(2),ln(1) over x = ln(1),ln(2),ln(3) — slope from the
    hand OLS; a 1-token corpus yields the NULL-fit row."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.corpus_clean import (
        zipf_slope,
    )

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["a a a a b b c"], pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    out = zipf_slope(str(d)).to_pandas()
    assert out.n_tokens[0] == 3
    x = np.log(np.array([1.0, 2.0, 3.0]))
    y = np.log(np.array([4.0, 2.0, 1.0]))
    n = 3.0
    num = n * (x * y).sum() - x.sum() * y.sum()
    dx = n * (x * x).sum() - x.sum() ** 2
    assert abs(out.slope[0] - round(num / dx, 6)) < 1e-9
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["solo"], pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    out1 = zipf_slope(str(d)).to_pandas()
    assert out1.n_tokens[0] == 1 and math.isnan(out1.slope[0])


def test_vocab_growth_closed_form(tmp_path):
    """4 docs ids 10,20,30,40: cutoffs floor(i*40/10) = 4,8,...,40.
    'alpha' first at 10 (deciles 3+), 'beta' at 20 (5+), 'gamma' at
    40 (decile 10 only)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.corpus_clean import (
        vocab_growth,
    )

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([10, 20, 30, 40], pa.int64()),
                "text": pa.array(
                    ["alpha", "alpha beta", "beta", "gamma alpha"],
                    pa.string(),
                ),
            }
        ),
        d / "documents.parquet",
    )
    out = vocab_growth(str(d)).to_pandas().set_index("decile")
    assert list(out.cutoff_doc) == [4, 8, 12, 16, 20, 24, 28, 32, 36, 40]
    assert out.loc[2, "vocab_size"] == 0
    assert out.loc[3, "vocab_size"] == 1   # alpha seen by 12
    assert out.loc[5, "vocab_size"] == 2   # beta by 20
    assert out.loc[9, "vocab_size"] == 2
    assert out.loc[10, "vocab_size"] == 3  # gamma at 40
    grouped = vocab_growth(str(d), combine_limit=0).to_pandas()
    assert grouped.set_index("decile").equals(out)


def test_dataset_split_deterministic(tmp_path):
    """Assignment is a pure function of doc_id: rerunning and re-tiering
    give identical manifests; splits partition the corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.corpus_clean import (
        dataset_split,
    )

    d = tmp_path / "sf"
    d.mkdir()
    n = 200
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(n)), pa.int64()),
                "lang": pa.array(["en"] * n, pa.string()),
                "n_chars": pa.array([10] * n, pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    out = dataset_split(str(d)).to_pandas()
    assert out.n_docs.sum() == n
    assert set(out.split) == {"train", "valid", "test"}
    tr = out[out.split == "train"].n_docs.sum()
    assert 0.6 * n < tr < 0.95 * n  # hash split near 80%
    assert dataset_split(str(d)).to_pandas().equals(out)
    assert dataset_split(str(d), combine_limit=0).to_pandas().equals(out)


def test_dataset_split_by_source_leakage_safe(ray_session):
    """Grouped split: every SOURCE lands whole in exactly one split
    (the anti-leakage guarantee the per-doc split cannot give), totals
    conserve, and the forced exchange tier is identical."""
    import numpy as np
    import pyarrow.parquet as pq

    from high_performance_docling_ray.kernels.sketch import hash64
    from high_performance_docling_ray.pipelines.corpus_clean import (
        dataset_split_by_source,
    )

    sf = "/root/testdata/sf0.001"
    out = dataset_split_by_source(sf)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["source", "n_chars"])
    src = docs.column("source").to_pylist()
    uniq = sorted(set(src))
    hv = hash64([f"gsplit:{s}" for s in uniq]) % np.uint64(100)
    expect_split = {
        s: ("train" if h < 80 else "valid" if h < 90 else "test")
        for s, h in zip(uniq, hv)
    }
    # conservation + distinct-source partition
    assert int(sum(out.column("n_docs").to_pylist())) == docs.num_rows
    assert int(sum(out.column("n_sources").to_pylist())) == len(uniq)
    from collections import Counter

    per_split_sources = Counter(expect_split.values())
    got = dict(zip(out.column("split").to_pylist(),
                   out.column("n_sources").to_pylist()))
    assert got == {k: v for k, v in per_split_sources.items()}
    # forced exchange tier identical
    forced = dataset_split_by_source(sf, combine_limit=0)
    assert out.equals(forced)
