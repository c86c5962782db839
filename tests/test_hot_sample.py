"""Opt-in hot-entity subsample tiers for the quadratic-emission caps
(VERDICT r4 #5): refusal -> sample switch, deterministic pinned
results, and tier equality under the subsample.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray

from high_performance_docling_ray.pipelines.fuzzy import jaro_winkler_pairs
from high_performance_docling_ray.pipelines.seqstats import theil_sen_trend

SF = "/root/testdata/sf0.001"


def _tbl(x):
    if isinstance(x, pa.Table):
        return x
    parts = [t for t in ray.get(x.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(parts)


class TestTheilSenHotSample:
    def test_refusal_then_sample_switch(self):
        with pytest.raises(ValueError, match="hot_sample"):
            theil_sen_trend(SF, hot_pair_cap=10)
        out = theil_sen_trend(SF, hot_pair_cap=5000, hot_sample=3)
        assert out.num_rows > 0
        assert "sampled" in out.column_names
        assert out.column("sampled").to_numpy(zero_copy_only=False).any()

    def test_deterministic_and_tier_equal(self):
        a = theil_sen_trend(SF, hot_sample=5)
        b = theil_sen_trend(SF, hot_sample=5)
        assert a.sort_by([("user_id", "ascending")]).equals(
            b.sort_by([("user_id", "ascending")])
        )
        g = _tbl(theil_sen_trend(SF, hot_sample=5, driver_budget=0))
        assert (
            a.sort_by([("user_id", "ascending")]).to_pydict()
            == g.select(a.column_names)
            .sort_by([("user_id", "ascending")]).to_pydict()
        )

    def test_default_schema_unchanged(self):
        out = theil_sen_trend(SF)
        assert out.column_names == ["user_id", "n_pairs", "slope_per_hour"]

    def test_sampled_user_uses_capped_pairs(self):
        out = theil_sen_trend(SF, hot_sample=4)
        sampled = out.column("sampled").to_numpy(zero_copy_only=False)
        n_pairs = out.column("n_pairs").to_numpy(zero_copy_only=False)
        # a user sampled to 4 events emits at most C(4,2)=6 pairs
        assert (n_pairs[sampled] <= 6).all()


class TestJaroWinklerHotSample:
    def test_refusal_then_sample_switch(self):
        with pytest.raises(ValueError, match="hot_sample"):
            jaro_winkler_pairs(SF, hot_pair_cap=3)
        out = jaro_winkler_pairs(SF, hot_pair_cap=1000, hot_sample=2)
        assert "sampled" in out.column_names

    def test_deterministic_and_tier_equal(self):
        key = [("doc_a", "ascending"), ("doc_b", "ascending")]
        a = jaro_winkler_pairs(SF, hot_pair_cap=1000, hot_sample=2)
        b = jaro_winkler_pairs(SF, hot_pair_cap=1000, hot_sample=2)
        assert a.sort_by(key).equals(b.sort_by(key))
        g = _tbl(jaro_winkler_pairs(
            SF, driver_budget=0, hot_pair_cap=1000, hot_sample=2
        ))
        assert (
            a.sort_by(key).to_pydict()
            == g.select(a.column_names).sort_by(key).to_pydict()
        )

    def test_default_schema_unchanged(self):
        out = jaro_winkler_pairs(SF)
        assert out.column_names == ["doc_a", "doc_b", "jw"]

    def test_cold_blocks_exact_under_sampling(self):
        # with a huge hot_sample no block is hot: the sampled tier
        # reduces to the exact result plus an all-False flag
        key = [("doc_a", "ascending"), ("doc_b", "ascending")]
        exact = jaro_winkler_pairs(SF).sort_by(key)
        samp = jaro_winkler_pairs(SF, hot_sample=10**9).sort_by(key)
        assert not samp.column("sampled").to_numpy(
            zero_copy_only=False).any()
        assert samp.select(exact.column_names).equals(exact)
