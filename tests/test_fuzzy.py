"""Exact fuzzy (edit-distance<=2) self-join (pipelines/fuzzy.py):
algebraic delete-hash identities, banded-DP kernel closed forms,
SymSpell completeness on crafted edits, and over-budget tier pins.
Oracle agreement (DuckDB levenshtein cross join) is driver-gate
verified at both SFs.
"""

import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.fuzzy import (  # noqa: E402
    _codepoint_matrix,
    _ed_at_most,
    _variant_hashes,
    derive_keys,
    edit_distance_pairs,
)

SF = "/root/testdata/sf0.001"


def test_ed_kernel_closed_forms():
    assert _ed_at_most("abc", "abc") == 0
    assert _ed_at_most("abc", "abd") == 1          # substitution
    assert _ed_at_most("abcdef", "abdef") == 1     # deletion
    assert _ed_at_most("abdef", "abcdef") == 1     # insertion
    assert _ed_at_most("abcd", "bacd") == 2        # transposition = 2 in L
    assert _ed_at_most("abc", "xyz") == 3          # over the band -> k+1
    assert _ed_at_most("", "ab") == 2
    assert _ed_at_most("", "abc") == 3
    assert _ed_at_most("aaaa", "aa") == 2


def _brute_delete_hashes(key: str) -> set:
    """Reference variant set: hash every <=2-deletion STRING with the
    same polynomial the algebraic path uses."""
    B, M = 1099511628211, 1 << 64

    def poly(s: str) -> int:
        h = 0
        for t, ch in enumerate(s):
            h = (h + ord(ch) * pow(B, t, M)) % M
        return h

    outs = {poly(key)}
    for i in range(len(key)):
        s1 = key[:i] + key[i + 1:]
        outs.add(poly(s1))
        for j in range(len(s1)):
            outs.add(poly(s1[:j] + s1[j + 1:]))
    return outs


def test_algebraic_delete_hash_equals_string_slicing():
    keys = ["key agg row scan slow fa", "abcxyz", "", "a",
            "same same same same same"]
    mat = _codepoint_matrix(keys)
    vh = _variant_hashes(mat).view(np.uint64)
    for row, key in enumerate(keys):
        got = set(int(x) for x in vh[row])
        want = _brute_delete_hashes(key)
        # padding deletions alias shorter-deletion variants, so the
        # algebraic set may contain exactly the brute set, no more
        assert want <= got
        assert got <= want | {int(vh[row][0])}


def test_symspell_catches_crafted_edits():
    base = "the quick brown fox jump"
    edits = [
        base,                      # 0
        base[:5] + base[6:],       # deletion
        base[:7] + "Z" + base[7:],  # insertion
        base[:3] + "Q" + base[4:],  # substitution
        base[:2] + "XY" + base[4:],  # two substitutions
    ]
    mats = _codepoint_matrix(edits)
    vh = _variant_hashes(mats).view(np.uint64)
    base_set = set(int(x) for x in vh[0])
    for r in range(1, len(edits)):
        assert base_set & set(int(x) for x in vh[r]), f"edit {r} missed"
        assert _ed_at_most(base, edits[r], 2) <= 2


def test_derive_keys_precedence_and_residues():
    ids = np.array([5, 3, 70, 1], dtype=np.int64)  # 70 = 5 mod 13 AND 2 mod 17
    texts = pa.chunked_array([pa.array(["abcdefghijklmnopqrstuvwxyz"] * 4)])
    keys = derive_keys(ids, texts)
    base = "abcdefghijklmnopqrstuvwx"
    assert keys[3] == base
    p = (5 % 12) + 1
    assert keys[0] == base[:p] + base[p + 1:]
    q = (3 % 10) + 2
    assert keys[1] == base[:q] + "x" + base[q:]
    p70 = (70 % 12) + 1  # delete branch wins for 70 (first match)
    assert keys[2] == base[:p70] + base[p70 + 1:]


def test_pairs_tiers_equal_and_planted_distances():
    a = edit_distance_pairs(SF).to_pandas()
    b = edit_distance_pairs(SF, pair_budget=0, key_budget=0).to_pandas()
    # forced over-budget tiers: Ray-groupby pair dedup + double-cogroup
    # key attach
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert len(a) > 0
    # planted edits make non-zero distances genuinely occur
    assert (a.dist == 0).any() and (a.dist > 0).any()
    assert (a.a_id < a.b_id).all()
    assert a.dist.max() <= 2


def test_fuzzy_components_tiers_and_structure():
    import pandas as pd

    from high_performance_docling_ray.pipelines.components import (
        fuzzy_components,
    )

    a = pd.DataFrame(fuzzy_components(SF).take_all()).sort_values(
        "doc_id").reset_index(drop=True)
    b = pd.DataFrame(
        fuzzy_components(SF, pairs_broadcast_budget=0).take_all()
    ).sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # every doc labeled; component label is the min member id
    assert (a.component <= a.doc_id).all()
    # paired docs share a component
    pairs = edit_distance_pairs(SF).to_pandas()
    comp = a.set_index("doc_id").component
    assert (comp[pairs.a_id].to_numpy() == comp[pairs.b_id].to_numpy()).all()
    # some non-trivial cluster exists
    assert (a.component != a.doc_id).any()


def test_jw_kernel_matches_duckdb():
    """The strongest pin: the vectorized byte-level JW kernel is
    bit-identical to DuckDB's jaro_winkler_similarity over random +
    adversarial pairs (tiny alphabet forces transpositions and window
    clashes; multi-byte UTF-8 forces the bytes-not-chars convention;
    empties force the 0.0 edge)."""
    import random

    import duckdb

    from high_performance_docling_ray.pipelines.fuzzy import (
        _byte_matrix,
        _jw_pairs,
    )

    rng = random.Random(42)
    cases = [("", ""), ("", "abc"), ("a", "a"), ("ab", "ba"),
             ("café x", "cafe x"), ("martha", "marhta")]
    for _ in range(1500):
        a = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 12)))
        cases.append((a, b))
    for _ in range(500):
        a = "".join(rng.choice("abcdefgé日 ") for _ in range(rng.randint(8, 28)))
        lb = list(a)
        for _ in range(rng.randint(0, 3)):
            p = rng.randrange(max(1, len(lb)))
            op = rng.choice("sdit")
            if op == "s" and lb:
                lb[p] = rng.choice("abcd")
            elif op == "d" and lb:
                del lb[p]
            elif op == "i":
                lb.insert(p, rng.choice("abcd"))
            elif len(lb) > 1:
                q = min(p + 1, len(lb) - 1)
                lb[p], lb[q] = lb[q], lb[p]
        cases.append((a, "".join(lb)))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, a VARCHAR, b VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, a, b) for i, (a, b) in enumerate(cases)],
    )
    exp = np.array([r[0] for r in con.execute(
        "SELECT jaro_winkler_similarity(a, b) FROM t ORDER BY i"
    ).fetchall()])
    uniq = sorted({s for ab in cases for s in ab})
    kidx = {k: i for i, k in enumerate(uniq)}
    mat, lk = _byte_matrix(uniq)
    u = np.array([kidx[a] for a, _ in cases])
    v = np.array([kidx[b] for _, b in cases])
    got = _jw_pairs(mat, lk, u, v)
    assert np.abs(got - exp).max() == 0.0


def _write_docs(d, doc_ids, texts):
    import pyarrow.parquet as pq

    d.mkdir(exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet",
    )
    return str(d)


def test_jw_pairs_clique_and_blocking(tmp_path):
    """Same-key cliques expand to C(g,2) pairs at exactly 1.0; docs in
    different 2-char blocks never pair; empty-text keys score 0.0 and
    are excluded at any positive threshold."""
    from high_performance_docling_ray.pipelines.fuzzy import (
        jaro_winkler_pairs,
    )

    base = "the quick brown fox jumps over"
    # doc_ids chosen OFF the planted-edit residues (%13 != 5, %17 != 3)
    sf = _write_docs(
        tmp_path / "d",
        [1, 2, 4, 6, 7, 9],
        [base, base, base,              # clique of 3 identical keys
         "zz completely different txt",  # other block
         "th" + "x" * 22,               # same block, dissimilar tail
         ""],                            # empty key
    )
    out = jaro_winkler_pairs(sf, threshold=0.9)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    pairs = set(zip(out.doc_a, out.doc_b))
    assert pairs == {(1, 2), (1, 4), (2, 4)}
    assert (out.jw == 1.0).all()
    grouped = jaro_winkler_pairs(sf, threshold=0.9, driver_budget=0)
    gdf = grouped.to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    assert gdf.equals(out.sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True))


def test_jw_hot_pair_cap(tmp_path):
    import pytest

    from high_performance_docling_ray.pipelines.fuzzy import (
        jaro_winkler_pairs,
    )

    # 8 distinct keys in one block -> 28 candidate pairs > cap 5
    sf = _write_docs(
        tmp_path / "d",
        [1, 2, 4, 6, 7, 9, 11, 12],
        ["qq tail %d unique here ok" % i for i in range(8)],
    )
    with pytest.raises(ValueError, match="hot_pair_cap"):
        jaro_winkler_pairs(sf, hot_pair_cap=5)


def test_jw_pairs_tiers_sf0001():
    from high_performance_docling_ray.pipelines.fuzzy import (
        jaro_winkler_pairs,
    )

    drv = jaro_winkler_pairs(SF)
    drv = drv.to_pandas() if hasattr(drv, "to_pandas") else drv
    drv = drv.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    grp = (
        jaro_winkler_pairs(SF, driver_budget=0)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert len(drv) > 0
    assert grp.equals(drv)


def test_ngram_diversity_closed_form(tmp_path):
    """Source 'a': two identical docs -> 6 gram occurrences over 3
    distinct (diversity 0.5); source 'b': one doc -> 1.0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from high_performance_docling_ray.pipelines.dedup import (
        ngram_diversity,
    )

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["one two three four five",
                     "one two three four five",
                     "alpha beta gamma"],
                    pa.string(),
                ),
                "source": pa.array(["a", "a", "b"], pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    out = ngram_diversity(str(d)).to_pandas().set_index("source")
    assert out.loc["a", "n_grams"] == 6 and out.loc["a", "n_distinct"] == 3
    assert abs(out.loc["a", "diversity"] - 0.5) < 1e-9
    assert out.loc["b", "n_grams"] == 1 and out.loc["b", "diversity"] == 1.0
    grouped = ngram_diversity(str(d), combine_limit=0).to_pandas()
    assert grouped.set_index("source").equals(out)
