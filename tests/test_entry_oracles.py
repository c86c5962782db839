"""Continuous mini-version of the driver's correctness gate: a few
cheap queries() vs oracle_sql() comparisons at sf0.001 so oracle
regressions surface in pytest, not only at the per-round driver run."""

import hashlib
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# cheap, structurally diverse subset (full sweep is the driver's job)
QUERIES = [
    "extract_confidence",
    "extract_list_markers",
    "extract_pdf_docs",
    "extract_pdf_ocr",
    "extract_pdf_tables",
    "extract_pdf_enriched",
    "language_id",
    "fingerprint_rolling",
    "ngram_jaccard_pairs",
    "frequent_ngrams",
    "embedding_neardup_pairs",
    "range_join_events",
    "topk_events_per_type",
    "hash_sample",
]


def _canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


@pytest.fixture(scope="module")
def entry_mod():
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(entry_mod, oracle_con, name):
    res = entry_mod.queries()[name](SF)
    rdf = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    odf = oracle_con.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert sorted(rdf.columns) == sorted(odf.columns)
    assert len(rdf) == len(odf)
    assert _canon(rdf) == _canon(odf)
