"""URL curation (pipelines/web_curation.py): each planted mess type
normalizes away, verdict rules fire, and domain_stats reconciles with
the per-doc verdicts."""

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.web_curation import (  # noqa: E402
    domain_stats,
    url_curation,
)

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, rows):
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_url_curation_normalization_closed_forms(tmp_path):
    # doc 20: %5==0 (HTTPS scheme) -> lowered
    # doc  4: %3==1 (upper host) and %11==4 (:443) -> lowered, dropped
    # doc 19: %13==6 (trailing /) and %17==2 (utm + id) -> slash gone,
    #         utm stripped, ?id kept
    # doc  5: %19==5 (#frag) -> dropped
    # doc  9: %31==9 -> '-casino-bonus' path, 2 spam hits
    sf = _write_docs(
        tmp_path,
        [(20, "src0", 10), (4, "src1", 10), (19, "src2", 10),
         (5, "src2", 10), (9, "src4", 10)],
    )
    out = (
        url_curation(sf)
        .to_pandas()
        .set_index("doc_id")
    )
    # 20 % 17 == 3 also plants utm+id -> utm stripped, id survives
    assert out.loc[20, "url_norm"] == "https://m6.src0.example.com/p/2?id=20"
    assert out.loc[4, "url_norm"] == "https://m4.src1.example.com/p/0?id=4"
    assert out.loc[19, "url_norm"] == "https://m5.src2.example.com/p/1?id=19"
    assert out.loc[5, "url_norm"] == "https://m5.src2.example.com/p/0"
    assert (
        out.loc[9, "url_norm"] == "https://m2.src4.example.com/p/0-casino-bonus"
    )
    assert out.loc[9, "spam_hits"] == 2
    assert not out.loc[9, "keep"]
    assert out.loc[20, "spam_hits"] == 0 and out.loc[20, "keep"]
    assert (out["domain"] == out.index.map(
        {20: "src0", 4: "src1", 19: "src2", 5: "src2", 9: "src4"}
    ) + ".example.com").all()


def test_url_curation_blocklist(tmp_path):
    sf = _write_docs(tmp_path, [(1, "src3", 5), (2, "src4", 5)])
    out = url_curation(sf).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "blocked"]) and not bool(out.loc[1, "keep"])
    assert not bool(out.loc[2, "blocked"]) and bool(out.loc[2, "keep"])


def test_domain_stats_reconciles_with_verdicts():
    v = url_curation(SF).to_pandas()
    s = domain_stats(SF).to_pandas().set_index("domain")
    g = v.groupby("domain")
    assert (s["n_docs"] == g.size()).all()
    assert (s["n_kept"] == g["keep"].sum()).all()
    assert len(s) == v["domain"].nunique()


def test_mixture_sample_closed_form(tmp_path):
    """Skewed sources: the big source is capped at ~T_s tokens, the
    tiny one is taken whole (p_micro == 1e6)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.text_analysis import (
        mixture_sample,
    )

    rows = [(i, "w " * 10, "big") for i in range(40)] + [
        (100, "a b c", "small")
    ]
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = mixture_sample(str(tmp_path)).to_pandas()
    # total = 403 tokens, S = 2, T_s = 403 // 4 = 100
    # big: n_s = 400 -> p = floor(1e6 * 100/400) = 250000
    # small: n_s = 3 -> capped at 1e6 -> always sampled
    big = out[out.source == "big"]
    small = out[out.source == "small"]
    assert (big["p_micro"] == 250000).all()
    assert (small["p_micro"] == 1_000_000).all()
    assert small["sampled"].all()
    assert 0 < big["sampled"].sum() < len(big)


def test_mixture_sample_deterministic_and_total():
    from high_performance_docling_ray.pipelines.text_analysis import (
        mixture_sample,
    )

    a = (
        mixture_sample(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        mixture_sample(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[list(a.columns)]
    )
    assert len(a) == 500
    assert a.equals(b)
    share = a.loc[a.sampled, "n_tok"].sum() / a.n_tok.sum()
    assert 0.3 < share < 0.7  # targets ~1/2 of corpus tokens


def test_chunk_documents_overlap_closed_form(tmp_path):
    """n=10, size=4, stride=3 -> K = 1 + ceil(6/3) = 3 chunks at
    starts 0,3,6 with the last chunk length 4 (6..9); overlap = 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.text_analysis import (
        chunk_documents,
    )

    toks = [f"t{i}" for i in range(10)]
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([" ".join(toks), "a b", "   "], pa.string()),
            "lang": pa.array(["en"] * 3),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        chunk_documents(str(tmp_path), size=4, stride=3)
        .to_pandas()
        .sort_values(["doc_id", "chunk_ord"])
        .reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    assert d1["chunk_ord"].tolist() == [0, 1, 2]
    assert d1["start_tok"].tolist() == [0, 3, 6]
    assert d1["n_tok"].tolist() == [4, 4, 4]
    assert d1["chunk_text"].tolist() == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
    ]
    d2 = out[out.doc_id == 2]
    assert d2["chunk_text"].tolist() == ["a b"]
    assert (out.doc_id != 3).all()  # 0-token doc emits no chunk


def test_line_dedup_closed_form(tmp_path):
    """Boilerplate = df>=2 lines removed from EVERY doc (no survivor);
    unique lines stay; a doc losing >30% of chars is dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.web_curation import (
        line_dedup,
    )

    boiler = "accept cookies"
    rows = [
        (1, "first unique content line here okay\n" + boiler),
        (2, "second unique and much longer content line\n" + boiler),
        (3, boiler + "\nx"),  # boiler is 14/15 chars -> dropped
        (4, "only unique content nothing shared at all"),
    ]
    tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        line_dedup(str(tmp_path), plant=False)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out["n_lines"].tolist() == [2, 2, 2, 1]
    assert out["n_removed_lines"].tolist() == [1, 1, 1, 0]
    assert out.loc[1, "clean_text"] == "first unique content line here okay"
    assert out.loc[3, "clean_text"] == "x"
    # char fractions removed: doc1 14/49=0.286, doc2 14/57=0.246 (both
    # kept), doc3 14/15=0.933 (dropped), doc4 0
    assert out["kept"].tolist() == [True, True, False, True]


def test_line_dedup_tiers_equal():
    from high_performance_docling_ray.pipelines.web_curation import (
        line_dedup,
    )

    a = (
        line_dedup(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        line_dedup(SF, df_broadcast_budget=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[list(a.columns)]
    )
    assert len(a) == 500
    assert (~a["kept"]).sum() > 0 and a["n_removed_lines"].sum() > 0
    assert a.equals(b)


def test_ingest_jsonl_roundtrip():
    """parquet -> sharded JSONL -> ray.data.read_json == the original
    table, byte for byte after schema normalization."""
    import duckdb
    import pandas as pd

    from high_performance_docling_ray.pipelines.io import ingest_jsonl

    got = (
        ingest_jsonl(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text, lang, source, n_chars "
            f"FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
        )
        .fetchdf()
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_ingest_csv_roundtrip():
    import duckdb
    import pandas as pd

    from high_performance_docling_ray.pipelines.io import ingest_csv

    got = (
        ingest_csv(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text, lang, source, n_chars "
            f"FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
        )
        .fetchdf()
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_domain_split_leakage_free_and_deterministic():
    from high_performance_docling_ray.pipelines.web_curation import (
        domain_split,
    )

    a = (
        domain_split(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # every domain lands in exactly one split (the leakage guarantee)
    assert (a.groupby("domain")["split"].nunique() == 1).all()
    assert set(a["split"]) <= {"train", "val", "test"}
    b = (
        domain_split(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[list(a.columns)]
    )
    assert a.equals(b)


def test_host_line_dedup_scopes_df_per_source():
    """The cross-host notice (doc_id % 97 == 5) lands on a DIFFERENT
    source for each of the 5-6 planted docs at this scale, so per-host
    df stays 1 and the line SURVIVES — while the per-source footers
    (df == docs-per-host) are removed everywhere."""
    from high_performance_docling_ray.pipelines.web_curation import (
        line_dedup,
    )

    out = (
        line_dedup(SF, scope="host")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert len(out) == n
    rare_docs = [i for i in range(n) if i % 97 == 5]
    sources = {i % 20 for i in rare_docs}
    assert len(sources) == len(rare_docs)  # precondition: distinct hosts
    for i in rare_docs:
        assert "rare cross-host migration notice" in out.loc[i, "clean_text"]
    # per-source footers removed from every doc
    assert not out["clean_text"].str.contains("footer of src").any()
    # each doc lost exactly its two footer lines
    extra = out.index.to_series() % 97 == 5
    assert (out["n_removed_lines"] == 2).all()
    assert (out["n_lines"] == 2 + 1 + extra).all()


def test_paragraph_dedup_keeps_first_occurrence_only():
    from high_performance_docling_ray.pipelines.web_curation import (
        paragraph_dedup,
    )

    out = paragraph_dedup(SF).to_pandas().set_index("doc_id")
    # doc 4: text + promo x3 -> 4 paras, 2 removed, promo kept once
    r = out.loc[4]
    assert r["n_paras"] == 4 and r["n_removed"] == 2
    assert r["clean_text"].count("repeated promo paragraph 4") == 1
    assert r["clean_text"].endswith("\nrepeated promo paragraph 4")
    # unplanted docs pass through with a single paragraph
    r3 = out.loc[3]
    assert r3["n_paras"] == 1 and r3["n_removed"] == 0
