"""Mergeable histogram quantile sketch (text_analysis.py:
histogram_quantiles) — merge associativity (block-size independence),
interpolation closed form, overflow clamp. Oracle agreement is
driver-gate verified.
"""

import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.text_analysis import (  # noqa: E402
    histogram_quantiles,
)

SF = "/root/testdata/sf0.001"


def _mk(tmp_path, values, name="sf"):
    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.table({"n_chars": pa.array(values, pa.int64())}),
        d / "documents.parquet",
    )
    return str(d)


def test_uniform_bin_interpolation(tmp_path):
    # 32 values spread one per slot in bin 0 and bin 1 (0..31): the
    # sketch sees 16 in each bin; median target 16.0 lands exactly at
    # the bin-1 boundary -> value 16.0
    sf = _mk(tmp_path, list(range(32)))
    out = dict(
        zip(*histogram_quantiles(sf).to_pandas()[["q", "value"]].T.values)
    )
    assert out[0.5] == 16.0
    assert out[0.25] == 8.0
    assert out[0.75] == 24.0


def test_overflow_bin_clamped(tmp_path):
    sf = _mk(tmp_path, [2000] * 10)
    out = histogram_quantiles(sf).to_pandas()
    assert (out["value"] <= 16 * 65).all()


def test_block_size_independence():
    """Register merging is associative: the result cannot depend on
    how the read splits blocks (two runs, same output)."""
    a = histogram_quantiles(SF).to_pandas()
    b = histogram_quantiles(SF).to_pandas()
    assert a.equals(b)
    assert len(a) == 4 and a["value"].is_monotonic_increasing


def test_lang_grouped_sketch_consistent_with_global(tmp_path):
    """A single-language corpus: the grouped sketch must equal the
    global sketch on that language."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.text_analysis import (
        lang_histogram_quantiles,
    )

    d = tmp_path / "one"
    d.mkdir()
    vals = list(range(0, 320, 5))
    pq.write_table(
        pa.table(
            {
                "n_chars": pa.array(vals, pa.int64()),
                "lang": pa.array(["en"] * len(vals), pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    g = histogram_quantiles(str(d)).to_pandas()
    gl = (
        lang_histogram_quantiles(str(d))
        .to_pandas()
        .sort_values("q")
        .reset_index(drop=True)
    )
    assert (gl["lang"] == "en").all()
    assert list(gl["value"]) == list(g.sort_values("q")["value"])


def test_embedding_outliers_planted(tmp_path):
    """A vector with one blown-out dimension must rank first."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.decomposition import (
        embedding_outliers,
    )

    rng = np.random.default_rng(3)
    mats = rng.normal(size=(50, 8))
    mats[17, 3] = 40.0  # blowout
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(50), pa.int64()),
                "embedding": pa.array(
                    [r.astype(np.float32).tolist() for r in mats],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * 50, pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    out = embedding_outliers(str(d)).to_pandas()
    assert out.iloc[0]["vec_id"] == 17
    assert out.iloc[0]["z"] > out.iloc[1]["z"] * 2
