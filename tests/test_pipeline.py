"""End-to-end pipeline tests: Ray output == serial oracle, byte for byte."""

import pyarrow as pa
import pytest

import ray.data

from high_performance_docling_ray.pipelines.extract import (
    dedup_by_url,
    extract_pipeline,
)
from high_performance_docling_ray.sources.pages import synth_pages_table

from .oracle import oracle_extract

N_DOCS = 120
SEED = 42


@pytest.fixture(scope="module")
def corpus() -> pa.Table:
    return synth_pages_table(N_DOCS, seed=SEED, dup_fraction=0.1)


@pytest.fixture(scope="module")
def expected(corpus):
    return oracle_extract(corpus)


def _run(corpus, **kwargs):
    ds = ray.data.from_arrow(corpus.select(["url", "warc_ts", "html", "lang"]))
    result = extract_pipeline(ds, **kwargs).take_all()
    return {r["url"]: r for r in result}


def test_byte_identical_doc_at_once(corpus, expected):
    got = _run(corpus, explode_giant=False)
    assert set(got) == set(expected)
    for url, exp in expected.items():
        assert got[url]["extracted_text"] == exp["extracted_text"], url
        assert got[url]["n_tables"] == exp["n_tables"], url
        assert got[url]["n_pages"] == exp["n_pages"], url


def test_byte_identical_with_giant_explosion(corpus, expected):
    # force the medium/giant docs through the page-exploded path by
    # lowering the monster threshold (default reserves it for 100+
    # page docs, which the 120-doc fixture corpus does not contain)
    got = _run(corpus, explode_giant=True, giant_bytes=50_000)
    assert set(got) == set(expected)
    for url, exp in expected.items():
        assert got[url]["extracted_text"] == exp["extracted_text"], url
        assert got[url]["n_elements"] == exp["n_elements"], url


@pytest.mark.parametrize("strategy", ["auto", "shuffle"])
def test_dedup_keeps_earliest(corpus, strategy):
    ds = ray.data.from_arrow(corpus.select(["url", "warc_ts", "html", "lang"]))
    deduped = dedup_by_url(ds, strategy=strategy).take_all()
    urls = [r["url"] for r in deduped]
    assert len(urls) == len(set(urls))
    # earliest ts per url
    import collections

    first_ts = collections.defaultdict(list)
    for r in corpus.to_pylist():
        first_ts[r["url"]].append(r["warc_ts"])
    for r in deduped:
        assert r["warc_ts"] == min(first_ts[r["url"]])


def test_dedup_broadcast_matches_shuffle(corpus):
    ds = ray.data.from_arrow(corpus.select(["url", "warc_ts", "html", "lang"]))
    a = sorted(
        (r["url"], r["warc_ts"]) for r in dedup_by_url(ds, strategy="auto").take_all()
    )
    b = sorted(
        (r["url"], r["warc_ts"])
        for r in dedup_by_url(ds, strategy="shuffle").take_all()
    )
    assert a == b


def test_parallelism_invariance(corpus, expected):
    """Output independent of block structure (SURVEY.md §5)."""
    ds = ray.data.from_arrow(
        corpus.select(["url", "warc_ts", "html", "lang"])
    ).repartition(13)
    got = {r["url"]: r for r in extract_pipeline(ds).take_all()}
    assert {u: g["extracted_text"] for u, g in got.items()} == {
        u: e["extracted_text"] for u, e in expected.items()
    }


def test_actor_pool_path_equals_task_path():
    """use_actors=True (the heavy-state A1/A2 shape: callable classes
    in an autoscaling actor pool) must produce byte-identical output to
    the default stateless-task path."""
    import ray.data as rd

    from high_performance_docling_ray.pipelines.extract import extract_pipeline
    from high_performance_docling_ray.sources.pages import synth_pages_table

    tbl = synth_pages_table(80, seed=42)
    task_out = (
        extract_pipeline(rd.from_arrow(tbl), dedup=True, explode_giant=False)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    actor_out = (
        extract_pipeline(
            rd.from_arrow(tbl), dedup=True, explode_giant=False,
            use_actors=True, concurrency=(1, 2),
        )
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert task_out.equals(actor_out)
