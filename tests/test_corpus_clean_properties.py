"""Hypothesis properties for the corpus-cleaning batch kernels vs
naive pure-Python references (no Ray DAG in the loop — these drive the
module-level per-batch functions directly)."""

import sys
from collections import Counter

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.components import (  # noqa: E402
    _union_find_labels,
)
from high_performance_docling_ray.pipelines.corpus_clean import (  # noqa: E402
    _segment_rows,
    doc_tf_rows,
    repetition_stats_rows,
)

_word = st.text(alphabet="abcx", min_size=1, max_size=3)
_doc = st.lists(_word, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=6)


def _batch(texts):
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


@given(_corpus)
@settings(max_examples=150, deadline=None)
def test_doc_tf_rows_matches_counter(texts):
    out = doc_tf_rows(_batch(texts))
    got = {
        (d, t): c
        for d, t, c in zip(
            out.column("doc_id").to_pylist(),
            out.column("token").to_pylist(),
            out.column("tf").to_pylist(),
        )
    }
    want = {}
    for d, text in enumerate(texts):
        for tok, c in Counter(text.split()).items():
            want[(d, tok)] = c
    assert got == want


@given(_corpus, st.integers(min_value=1, max_value=5))
@settings(max_examples=150, deadline=None)
def test_segment_rows_matches_reference(texts, k):
    out = _segment_rows(_batch(texts), k)
    got = sorted(
        zip(
            out.column("packed").to_pylist(),
            out.column("segment").to_pylist(),
        )
    )
    want = []
    for d, text in enumerate(texts):
        toks = text.split()
        for ordn, i in enumerate(range(0, len(toks), k)):
            want.append(((d << 20) | ordn, " ".join(toks[i : i + k])))
    assert got == sorted(want)


def _ref_signals(text):
    toks = text.split()
    n = len(toks)
    if n == 0:
        return (0, 0.0, 0.0, 0.0)
    dup_tok = (n - len(set(toks))) / n
    bigrams = [tuple(toks[i : i + 2]) for i in range(n - 1)]
    top_bg = 2 * max(Counter(bigrams).values()) / n if bigrams else 0.0
    trigrams = [tuple(toks[i : i + 3]) for i in range(n - 2)]
    if trigrams:
        cnt = Counter(trigrams)
        dup3 = sum(c for c in cnt.values() if c > 1) / len(trigrams)
    else:
        dup3 = 0.0
    return (n, round(dup_tok, 6), round(top_bg, 6), round(dup3, 6))


@given(_corpus)
@settings(max_examples=150, deadline=None)
def test_repetition_stats_match_reference(texts):
    out = repetition_stats_rows(_batch(texts))
    for i in range(len(texts)):
        want = _ref_signals(texts[i])
        got = (
            out.column("n_tokens")[i].as_py(),
            out.column("dup_token_frac")[i].as_py(),
            out.column("top_bigram_frac")[i].as_py(),
            out.column("dup_trigram_frac")[i].as_py(),
        )
        assert got == want, (texts[i], got, want)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        max_size=30,
    )
)
@settings(max_examples=200, deadline=None)
def test_union_find_matches_bfs(edges):
    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)
    labels = _union_find_labels(a, b)
    # reference: BFS per node over the undirected edge set
    adj = {}
    for x, y in edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    for node in adj:
        seen = {node}
        stack = [node]
        while stack:
            cur = stack.pop()
            for nxt in adj[cur]:
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        assert labels[node] == min(seen)


# -- round-3 LM-filter kernels ------------------------------------------------

from high_performance_docling_ray.kernels.sketch import (  # noqa: E402
    bloom_add,
    bloom_positions,
    bloom_query,
)
from high_performance_docling_ray.kernels.text_stats import (  # noqa: E402
    ngram_set,
)
from high_performance_docling_ray.pipelines.lm_filters import (  # noqa: E402
    _shingle_hash_rows,
)


@given(_corpus, st.integers(min_value=1, max_value=4))
@settings(max_examples=150, deadline=None)
def test_shingle_hash_rows_matches_ngram_set(texts, n):
    """Flat (hash, doc) rows == per-doc ngram_set sizes, and every
    doc's hash multiset is distinct within the doc."""
    hv, dv = _shingle_hash_rows(_batch(texts), n)
    for d, text in enumerate(texts):
        want = len(ngram_set(text, n))
        got = int((dv == d).sum())
        assert got == want
        # distinct within doc (ngram_set is a set; md5 collisions on
        # <=12-token docs of a 3-letter alphabet are impossible)
        doc_h = hv[dv == d]
        assert len(np.unique(doc_h)) == len(doc_h)


@given(st.lists(_word, min_size=0, max_size=20, unique=True),
       st.lists(_word, min_size=0, max_size=20))
@settings(max_examples=200, deadline=None)
def test_bloom_no_false_negatives_property(added, probes):
    bits = bloom_add(np.zeros(8192, bool), added)
    hits = bloom_query(bits, probes)
    for tok, hit in zip(probes, hits):
        if tok in added:
            assert hit  # Bloom guarantee: no false negatives
        if not hit:
            assert tok not in added


@given(st.lists(st.integers(min_value=0, max_value=200), min_size=1,
                max_size=30),
       st.integers(min_value=1, max_value=9))
@settings(max_examples=200, deadline=None)
def test_pack_chunk_math_matches_naive(tok_counts, capacity):
    """The vectorized chunk-overlap emission inside pack_sequences ==
    a naive token-at-a-time packer (doc spans laid end to end)."""
    n = np.array([c for c in tok_counts if c > 0], np.int64)
    if not len(n):
        return
    ends = np.cumsum(n)
    starts = ends - n
    first_chunk = starts // capacity
    last_chunk = (ends - 1) // capacity
    got: dict[int, int] = {}
    for i in range(len(n)):
        for c in range(int(first_chunk[i]), int(last_chunk[i]) + 1):
            ov = min(int(ends[i]), (c + 1) * capacity) - max(
                int(starts[i]), c * capacity
            )
            got[c] = got.get(c, 0) + ov
    # naive: lay every token down one by one
    want: dict[int, int] = {}
    pos = 0
    for c_ in n:
        for _ in range(int(c_)):
            want[pos // capacity] = want.get(pos // capacity, 0) + 1
            pos += 1
    assert got == want
