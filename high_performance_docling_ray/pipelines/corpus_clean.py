"""Corpus-cleaning operators a web-scale training-data pipeline needs
beyond the reference's document scope: Gopher-style repetition quality
signals, PII redaction, C4-style segment-level global dedup, and
TF-IDF term scoring. (The reference processes one document at a time —
rule parity lives in kernels/; these are the corpus-level siblings,
same family as pipelines/dedup.py.)

Shuffle discipline:

- ``repetition_signals`` / ``redact_pii`` are pure per-row maps — a
  document's signals depend only on its own text — so they stream with
  zero exchanges at any corpus size.
- ``segment_dedup`` is exactly two key-grouped exchanges and NO
  broadcast/join: the winner of each distinct segment is the groupby
  MIN itself (keep-first by packed (doc_id, ord)), so kept occurrences
  fall straight out of the aggregate and only kept segments ride the
  second (reassembly) exchange.
- ``tfidf_topk`` is the classic two-pass: a token-keyed partial-count
  exchange for document frequencies (combiner inside ``map_batches``,
  then a small groupby sum), then either a broadcast df lookup (under
  ``df_broadcast_budget``) or a fully distributed
  ``cogroup_attach``-by-token fallback — the same tiering as every
  other broadcast in this repo.

All token math is vectorized: Arrow ``utf8_split_whitespace`` +
``dictionary_encode`` produce integer token codes, and group counts
come from one ``np.lexsort`` pass per batch — no Python loop touches a
token.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .text_analysis import read_documents

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def _tokenize(col: pa.ChunkedArray | pa.Array):
    """Vectorized whitespace tokenization of a string column.

    Returns ``(flat_tokens, doc_idx, n_tokens)``: the corpus-ordered
    flat token array (empties filtered), each token's row index, and
    per-row token counts. Null / empty texts yield zero tokens.
    """
    toks = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(col))
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False
    )
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    # split_whitespace emits '' for empty input and at string edges
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    keep &= flat.is_valid().to_numpy(zero_copy_only=False)
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
    n_tokens = np.bincount(doc_idx, minlength=len(lens)).astype(np.int64)
    return flat, doc_idx, n_tokens


def _group_counts(keys: list[np.ndarray]):
    """Group rows by the composite key (lexsort + adjacent-diff run
    detection — overflow-safe at any cardinality, unlike key packing).

    Returns ``(first_row_index, counts)`` per group, where
    ``first_row_index`` indexes the ORIGINAL row order's sorted
    permutation start — callers use it to read any per-group key column.
    """
    n = len(keys[0])
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort(keys[::-1])
    sorted_keys = [k[order] for k in keys]
    new = np.empty(n, dtype=bool)
    new[0] = True
    change = np.zeros(n - 1, dtype=bool)
    for k in sorted_keys:
        change |= k[1:] != k[:-1]
    new[1:] = change
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, n)).astype(np.int64)
    return order[starts], counts


def repetition_signals(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style per-document repetition quality signals
    (Rae et al. 2021 §A1.1, token-count variant):

    - ``dup_token_frac``   — ``(n_tokens - n_distinct) / n_tokens``
    - ``top_bigram_frac``  — tokens covered by the most frequent
      2-gram: ``2 * max_bigram_count / n_tokens``
    - ``dup_trigram_frac`` — fraction of 3-gram instances whose 3-gram
      occurs more than once

    Pure map: one batch in, one stats row per document out.
    """
    return read_documents(sf_dir, ("doc_id", "text")).map_batches(
        repetition_stats_rows, batch_format="pyarrow"
    )


def repetition_stats_rows(batch: pa.Table) -> pa.Table:
    """The per-batch kernel of ``repetition_signals`` (module-level so
    property tests can drive it without a Ray DAG)."""
    n = batch.num_rows
    flat, doc_idx, n_tok = _tokenize(batch.column("text"))
    codes_arr = pc.dictionary_encode(flat)
    codes = np.asarray(codes_arr.indices.to_numpy(zero_copy_only=False),
                       dtype=np.int64)

    n_distinct = np.zeros(n, np.int64)
    if len(codes):
        firsts, _ = _group_counts([doc_idx, codes])
        np.add.at(n_distinct, doc_idx[firsts], 1)

    max_bg = np.zeros(n, np.int64)
    if len(codes) >= 2:
        m = doc_idx[:-1] == doc_idx[1:]
        if m.any():
            d = doc_idx[:-1][m]
            firsts, counts = _group_counts(
                [d, codes[:-1][m], codes[1:][m]]
            )
            np.maximum.at(max_bg, d[firsts], counts)

    dup3 = np.zeros(n, np.int64)
    tot3 = np.zeros(n, np.int64)
    if len(codes) >= 3:
        m = doc_idx[:-2] == doc_idx[2:]
        if m.any():
            d = doc_idx[:-2][m]
            tot3 = np.bincount(d, minlength=n).astype(np.int64)
            firsts, counts = _group_counts(
                [d, codes[:-2][m], codes[1:-1][m], codes[2:][m]]
            )
            dup = counts > 1
            np.add.at(dup3, d[firsts[dup]], counts[dup])

    nt = n_tok.astype(np.float64)
    safe = np.where(n_tok > 0, nt, 1.0)
    safe3 = np.where(tot3 > 0, tot3.astype(np.float64), 1.0)
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "dup_token_frac": pa.array(
                np.round((n_tok - n_distinct) / safe, 6), pa.float64()
            ),
            "top_bigram_frac": pa.array(
                np.round(2.0 * max_bg / safe, 6), pa.float64()
            ),
            "dup_trigram_frac": pa.array(
                np.round(dup3 / safe3, 6), pa.float64()
            ),
        }
    )


def redact_pii(
    sf_dir: str, plant: bool = True
) -> ray.data.Dataset:
    """Redact emails / phone numbers from document text (RE2 patterns,
    vectorized ``replace_substring_regex``), reporting per-doc match
    counts. ``plant=True`` first appends a deterministic PII suffix
    derived from doc_id — the synthetic corpus contains no organic PII,
    so planting (mirrored exactly in the SQL oracle) is what makes the
    redaction path observable end to end.
    """

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if plant:
            did = pc.cast(batch.column("doc_id"), pa.string())
            mod = (
                batch.column("doc_id").to_numpy(zero_copy_only=False) % 100
            )
            two = pc.utf8_lpad(
                pc.cast(pa.array(mod, pa.int64()), pa.string()),
                width=2,
                padding="0",
            )
            text = pc.binary_join_element_wise(
                text, " Contact user", did, "@mail.example.com or +1-555-01",
                two, ".", "",
            )
        n_email = pc.count_substring_regex(text, EMAIL_RE)
        red = pc.replace_substring_regex(text, EMAIL_RE, "[EMAIL]")
        n_phone = pc.count_substring_regex(red, PHONE_RE)
        red = pc.replace_substring_regex(red, PHONE_RE, "[PHONE]")
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "redacted": red,
                "n_emails": pc.cast(n_email, pa.int64()),
                "n_phones": pc.cast(n_phone, pa.int64()),
            }
        )

    return read_documents(sf_dir, ("doc_id", "text")).map_batches(
        f, batch_format="pyarrow"
    )


_ORD_BITS = 20  # segments per doc < 2^20; packed = doc_id << 20 | ord


def _segment_rows(batch: pa.Table, seg_tokens: int) -> pa.Table:
    """(doc_id, text) -> one row per ``seg_tokens``-token segment:
    (segment, packed) with packed = doc_id * 2^20 + ord. Segment
    strings are built with ListArray offsets over the flat token
    array + one vectorized ``binary_join`` — no per-row loop."""
    flat, _, n_tok = _tokenize(batch.column("text"))
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    nseg = -(-n_tok // seg_tokens)  # ceil; 0 for empty docs
    if int(nseg.max(initial=0)) >= (1 << _ORD_BITS):
        raise ValueError(
            f"doc with >= 2^{_ORD_BITS} segments; raise _ORD_BITS"
        )
    if len(doc_ids) and (
        int(doc_ids.min()) < 0
        or int(doc_ids.max()) >= (1 << (63 - _ORD_BITS))
    ):
        # the packed key doc_id << 20 | ord must stay in int64; 64-bit
        # hash ids need a remap (dense ids or a split key), not silent
        # wraparound
        raise ValueError(
            f"doc_id outside [0, 2^{63 - _ORD_BITS}) would corrupt the "
            f"packed (doc_id, ord) key; remap ids before segment_dedup"
        )
    if int(n_tok.sum()) > np.iinfo(np.int32).max:
        raise ValueError(
            "batch exceeds 2^31 tokens; lower the batch size so "
            "segment offsets fit int32"
        )
    starts = np.concatenate([[0], np.cumsum(n_tok)])
    seg_doc_row = np.repeat(np.arange(len(n_tok), dtype=np.int64), nseg)
    seg_ord = (
        np.arange(int(nseg.sum()), dtype=np.int64)
        - np.repeat(np.concatenate([[0], np.cumsum(nseg)])[:-1], nseg)
    )
    bounds = starts[seg_doc_row] + seg_ord * seg_tokens
    offsets = np.append(bounds, starts[-1]).astype(np.int32)
    segs = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    seg_str = pc.binary_join(segs, " ")
    packed = (doc_ids[seg_doc_row].astype(np.int64) << _ORD_BITS) | seg_ord
    return pa.Table.from_pydict(
        {
            "segment": seg_str,
            "packed": pa.array(packed, pa.int64()),
        }
    )


def segment_dedup(sf_dir: str, seg_tokens: int = 13) -> ray.data.Dataset:
    """C4-style global segment-level exact dedup (Raffel et al. 2020
    §2.2 use three-sentence spans; here a span is ``seg_tokens``
    whitespace tokens, since the synthetic corpus has no sentence
    marks): every distinct segment is kept ONCE corpus-wide, at its
    first occurrence by (doc_id, ord), and each document is
    reassembled from its surviving segments in original order.

    Scale shape — two exchanges, no broadcast, no join:

      (segment, packed) rows -> groupby(segment).min(packed)

    The MIN row IS the kept occurrence, so winner determination and
    the semi-join collapse into one aggregate; docs whose every
    segment lost elsewhere simply emit no row (mirrored in the
    oracle). Reassembly is a second, kept-rows-only groupby(doc_id).
    """
    rows = read_documents(sf_dir, ("doc_id", "text")).map_batches(
        lambda b: _segment_rows(b, seg_tokens), batch_format="pyarrow"
    )
    winners = rows.groupby("segment").min("packed")

    def unpack(batch: pa.Table) -> pa.Table:
        packed = batch.column("min(packed)").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(packed >> _ORD_BITS, pa.int64()),
                "ord": pa.array(packed & ((1 << _ORD_BITS) - 1), pa.int64()),
                "segment": batch.column("segment"),
            }
        )

    kept = winners.map_batches(unpack, batch_format="pyarrow")

    def reassemble(group: pa.Table) -> pa.Table:
        order = np.argsort(
            group.column("ord").to_numpy(zero_copy_only=False), kind="stable"
        )
        segs = group.column("segment").take(pa.array(order))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array([0, len(segs)], pa.int32()),
                segs.combine_chunks() if isinstance(segs, pa.ChunkedArray) else segs,
            ),
            " ",
        )
        return pa.Table.from_pydict(
            {
                "doc_id": group.column("doc_id").slice(0, 1),
                "dedup_text": joined,
                "n_kept": pa.array([group.num_rows], pa.int64()),
            }
        )

    return kept.groupby("doc_id").map_groups(
        reassemble, batch_format="pyarrow"
    )


def top_tokens(sf_dir: str, k: int = 20) -> pa.Table:
    """Global top-``k`` tokens by total occurrence count (ties by token
    ascending) — the exact heavy-hitters pass a corpus profile needs.

    Scale shape: per-batch token-count partials (dictionary-encode +
    bincount — one row per DISTINCT token per block crosses the wire),
    a token-keyed groupby sum, then only the per-block TOP-k of the
    aggregated result rides to the driver for the final merge, so the
    driver sees k x #blocks rows, never the vocabulary. For
    heavy-tailed vocabularies where even the distinct-per-block
    partials are too wide, put a count-min sketch in front; the exact
    pass stays the verifier.
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tokenize(batch.column("text"))
        codes_arr = pc.dictionary_encode(flat)
        codes = np.asarray(
            codes_arr.indices.to_numpy(zero_copy_only=False), np.int64
        )
        if not len(codes):
            return pa.Table.from_pydict(
                {"token": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        cnt = np.bincount(codes).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "token": codes_arr.dictionary,
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    totals = (
        read_documents(sf_dir, ("doc_id", "text"))
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .sum("cnt")
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        cnts = batch.column("sum(cnt)").to_numpy(zero_copy_only=False)
        toks = np.asarray(
            batch.column("token").to_numpy(zero_copy_only=False),
            dtype=object,
        )
        order = np.lexsort((toks, -cnts))[:k]
        return batch.take(pa.array(np.sort(order)))

    parts = [
        t
        for t in ray.get(
            totals.map_batches(local_topk, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        return pa.Table.from_pydict(
            {"token": pa.array([], pa.string()),
             "cnt": pa.array([], pa.int64())}
        )
    merged = local_topk(pa.concat_tables(parts))
    return merged.rename_columns(["token", "cnt"]).sort_by(
        [("cnt", "descending"), ("token", "ascending")]
    )


def frequent_ngrams(
    sf_dir: str, phi: float = 0.0002, n: int = 3
) -> pa.Table:
    """EXACT phi-heavy-hitter word n-grams: every within-doc word
    ``n``-gram whose corpus occurrence count is >= ``phi`` * total
    n-gram count, with its exact count (ties by gram ascending).

    Scale shape — two streaming passes, NO vocabulary-wide exchange:

    1. **Candidate pass (Misra-Gries partials).** Each block compresses
       its exact local gram counts to capacity ``c = ceil(2/phi)`` by
       subtracting the (c+1)-th largest local count from every counter
       and dropping the non-positive ones — the classic MG summary,
       computable in one ``np.partition`` because the block's counts
       are already exact. Summaries are MERGEABLE (Agarwal et al.,
       "Mergeable Summaries", PODS'12): summing them under-counts any
       gram by at most sum_b n_b/(c+1) <= N*phi/2, so every true heavy
       hitter keeps a merged estimate >= phi*N/2, and because the
       estimates sum to <= N the estimate-filtered candidate set has
       at most 2/phi entries REGARDLESS of corpus size, block count,
       or gram-domain cardinality. Each block also emits one sentinel
       row (gram = "" — impossible for a real gram, ``_tokenize``
       drops empty tokens) carrying its exact local gram total, so the
       global N rides the same small exchange. Contrast with
       ``top_tokens``: its partials are one row per DISTINCT token per
       block — fine for a bounded word vocabulary, unbounded for the
       open-ended n-gram domain this profiles.
    2. **Exact verify pass.** Re-count ONLY the candidates (a
       ``pc.is_in`` mask per batch, bincount partials, one gram-keyed
       groupby over <= 2/phi keys) and keep exact count >= phi*N.
       False positives die here; false negatives cannot exist by the
       pass-1 bound — so the output is exact at every scale, including
       when truncation bites (test-pinned with a capacity small enough
       to force per-block decrements).

    The boilerplate-phrase detector a 100-TB corpus profile needs:
    the driver never sees more than 2/phi + 1 rows.
    """
    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    cap = int(np.ceil(2.0 / phi))

    def block_grams(batch: pa.Table) -> pa.Array | None:
        """Within-doc word n-grams of a (doc_id, text) batch, corpus
        order, or None when the batch holds no full window (same
        doc-boundary mask as substring.py's dup-window builder)."""
        flat, doc_idx, _ = _tokenize(batch.column("text"))
        total = len(flat)
        if total < n:
            return None
        starts = np.flatnonzero(doc_idx[: total - n + 1] == doc_idx[n - 1 :])
        if not len(starts):
            return None
        parts = [flat.take(pa.array(starts + k)) for k in range(n)]
        return pc.binary_join_element_wise(*parts, " ")

    empty = pa.Table.from_pydict(
        {"gram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
    )

    def mg_summary(batch: pa.Table) -> pa.Table:
        grams = block_grams(batch)
        if grams is None:
            return pa.Table.from_pydict(
                {"gram": pa.array([""], pa.string()),
                 "cnt": pa.array([0], pa.int64())}
            )
        codes_arr = pc.dictionary_encode(grams)
        codes = np.asarray(
            codes_arr.indices.to_numpy(zero_copy_only=False), np.int64
        )
        cnt = np.bincount(codes).astype(np.int64)
        dictionary = codes_arr.dictionary
        if len(cnt) > cap:
            # the (cap+1)-th largest local count is the MG decrement:
            # (cap+1)*dec <= sum(top cap+1 counts) <= block gram total,
            # so per-block error <= n_b/(cap+1)
            dec = np.partition(cnt, len(cnt) - cap - 1)[len(cnt) - cap - 1]
            keep = np.flatnonzero(cnt > dec)
            dictionary = dictionary.take(pa.array(keep))
            cnt = cnt[keep] - dec
        gram_col = pa.concat_arrays(
            [dictionary.cast(pa.string()), pa.array([""], pa.string())]
        )
        cnt_col = np.concatenate([cnt, [len(grams)]])
        return pa.Table.from_pydict(
            {"gram": gram_col, "cnt": pa.array(cnt_col, pa.int64())}
        )

    summaries = (
        read_documents(sf_dir, ("doc_id", "text"))
        .map_batches(mg_summary, batch_format="pyarrow")
        .groupby("gram")
        .sum("cnt")
        .materialize()
    )
    agg = "sum(cnt)"

    # Two cheap filter passes over the SAME materialized blocks, on
    # purpose: the candidate floor (phi*N/2) needs N first, and folding
    # both into one pass would require shipping each block's top-2/phi
    # rows to the driver — (2/phi) x blocks rows, block-count-scaled —
    # where these two passes each return a bounded row count (1, then
    # <= 2/phi). Filter tasks over materialized blocks re-run nothing.

    def only_sentinel(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("gram"), ""))

    sentinel = summaries.map_batches(
        only_sentinel, batch_format="pyarrow"
    ).take_all()
    n_total = int(sentinel[0][agg]) if sentinel else 0
    if n_total == 0:
        return empty

    est_floor = phi * n_total / 2.0

    def survivors(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.not_equal(batch.column("gram"), ""),
            pc.greater_equal(
                pc.cast(batch.column(agg), pa.float64()),
                pa.scalar(est_floor, pa.float64()),
            ),
        )
        return batch.filter(keep)

    cand_rows = summaries.map_batches(
        survivors, batch_format="pyarrow"
    ).take_all()
    if not cand_rows:
        return empty
    cand_arr = pa.array([r["gram"] for r in cand_rows], pa.string())

    def count_candidates(batch: pa.Table) -> pa.Table:
        grams = block_grams(batch)
        if grams is None:
            return empty
        hits = grams.filter(pc.is_in(grams, value_set=cand_arr))
        if not len(hits):
            return empty
        codes_arr = pc.dictionary_encode(hits)
        codes = np.asarray(
            codes_arr.indices.to_numpy(zero_copy_only=False), np.int64
        )
        return pa.Table.from_pydict(
            {
                "gram": codes_arr.dictionary.cast(pa.string()),
                "cnt": pa.array(np.bincount(codes), pa.int64()),
            }
        )

    exact = (
        read_documents(sf_dir, ("doc_id", "text"))
        .map_batches(count_candidates, batch_format="pyarrow")
        .groupby("gram")
        .sum("cnt")
        .take_all()
    )
    grams_out = [r["gram"] for r in exact]
    cnts_out = np.array([int(r[agg]) for r in exact], np.int64)
    keep = cnts_out >= phi * n_total
    tbl = pa.Table.from_pydict(
        {
            "gram": pa.array(
                [g for g, k in zip(grams_out, keep) if k], pa.string()
            ),
            "cnt": pa.array(cnts_out[keep], pa.int64()),
        }
    )
    return tbl.sort_by([("cnt", "descending"), ("gram", "ascending")])


def doc_tf_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, text) batch -> one (doc_id, token, tf) row per distinct
    token per doc — the shared per-batch term-frequency combiner used
    by both TF-IDF scoring and the inverted-index build (one
    definition so the persisted index can never drift from the
    scorer's token semantics)."""
    flat, doc_idx, _ = _tokenize(batch.column("text"))
    codes_arr = pc.dictionary_encode(flat)
    codes = np.asarray(
        codes_arr.indices.to_numpy(zero_copy_only=False), np.int64
    )
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    if not len(codes):
        return pa.Table.from_pydict(
            {"doc_id": pa.array([], pa.int64()),
             "token": pa.array([], pa.string()),
             "tf": pa.array([], pa.int64())}
        )
    firsts, counts = _group_counts([doc_idx, codes])
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids[doc_idx[firsts]], pa.int64()),
            "token": codes_arr.dictionary.take(pa.array(codes[firsts])),
            "tf": pa.array(counts, pa.int64()),
        }
    )


def cms_token_estimates(
    sf_dir: str, probe_tokens: list[str], depth: int = 4, width: int = 1024
) -> pa.Table:
    """Count-min-sketch point estimates for ``probe_tokens`` — the
    approximate heavy-hitter counter for vocabularies too wide for the
    exact ``top_tokens`` partials, with the classic CMS guarantee
    (est >= true count, overshoot bounded by bucket collisions).

    DETERMINISTIC and bit-exact reproducible in SQL: bucket indices are
    the salted md5 hash (``kernels/sketch.py:cms_buckets`` ==
    ``md5_number_upper(j || ':' || token) % width``), so the driver-gate
    oracle rebuilds the identical sketch from exact token counts.

    Scale shape: each batch folds its token counts into a fixed
    (depth x width) counter matrix (``np.add.at``) and emits the
    NONZERO cells — partial size is min(vocab, depth*width) rows per
    block regardless of corpus size; the merge is one elementwise sum
    on the driver (sketch registers, like HLL)."""
    from ..kernels.sketch import cms_add, cms_query

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tokenize(batch.column("text"))
        codes_arr = pc.dictionary_encode(flat)
        codes = np.asarray(
            codes_arr.indices.to_numpy(zero_copy_only=False), np.int64
        )
        cms = np.zeros((depth, width), dtype=np.int64)
        if len(codes):
            cnt = np.bincount(codes).astype(np.int64)
            cms_add(cms, codes_arr.dictionary.to_pylist(), cnt)
        j, b = np.nonzero(cms)
        return pa.Table.from_pydict(
            {
                "j": pa.array(j.astype(np.int64), pa.int64()),
                "b": pa.array(b.astype(np.int64), pa.int64()),
                "cnt": pa.array(cms[j, b], pa.int64()),
            }
        )

    parts = [
        t
        for t in ray.get(
            read_documents(sf_dir, ("doc_id", "text"))
            .map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    cms = np.zeros((depth, width), dtype=np.int64)
    for t in parts:
        np.add.at(
            cms,
            (
                t.column("j").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False),
            ),
            t.column("cnt").to_numpy(zero_copy_only=False),
        )
    ests = cms_query(cms, probe_tokens)
    return pa.Table.from_pydict(
        {
            "token": pa.array(probe_tokens, pa.string()),
            "est": pa.array(ests, pa.int64()),
        }
    )


def build_inverted_index(
    sf_dir: str,
    num_buckets: int = 16,
    out_dir: str | None = None,
) -> str:
    """One-time PERSISTED inverted index: (token, doc_id, tf) posting
    rows written as parquet partitioned by ``bucket = hash(token) %
    num_buckets`` — the search-index sibling of the IVF store
    (``similarity.py:build_ivf_index``: same content-keyed cache dir,
    ``_SUCCESS`` marker, crash-wipe rebuild). A lookup reads ONLY its
    query tokens' bucket partitions; at corpus scale, raise
    ``num_buckets`` so a bucket is one worker's read.

    The build is a single streaming pass: the per-batch (doc, token)
    tf combiner from ``tfidf_topk``'s pass 2, plus one vectorized
    bucket hash; no shuffle — parquet partitioning on write is the
    only data movement.
    """
    import hashlib
    import os
    import shutil

    from .joins import string_key_buckets

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    if out_dir is None:
        tag = hashlib.md5(
            f"{src}:{num_buckets}:{content_tag}".encode()
        ).hexdigest()[:12]
        out_dir = f"/tmp/graft_invidx/{tag}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    docs = read_documents(sf_dir, ("doc_id", "text"))

    def posting_rows(batch: pa.Table) -> pa.Table:
        # the shared tf combiner keeps the persisted index and TF-IDF
        # scoring on identical token semantics
        tfs = doc_tf_rows(batch)
        return tfs.append_column(
            "bucket",
            pa.array(
                string_key_buckets(tfs.column("token"), num_buckets),
                pa.int32(),
            ),
        )

    docs.map_batches(posting_rows, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def out_glob(index_dir: str, bucket: int) -> str:
    """Directory of one bucket partition of a persisted inverted index."""
    import os

    return os.path.join(index_dir, f"bucket={bucket}")


def postings_lookup(
    sf_dir: str, tokens: list[str], num_buckets: int = 16
) -> pa.Table:
    """(token, doc_id, tf) postings for ``tokens``, reading ONLY the
    bucket partitions the query tokens hash into — partition pruning
    does the candidate filtering, exactly like the IVF nprobe read."""
    import glob
    import os

    from .joins import string_key_buckets

    index_dir = build_inverted_index(sf_dir, num_buckets=num_buckets)
    want = pa.array(sorted(set(tokens)), pa.string())
    buckets = sorted(set(string_key_buckets(want, num_buckets).tolist()))
    paths = [
        f
        for b in buckets
        for f in sorted(
            glob.glob(os.path.join(out_glob(index_dir, b), "*.parquet"))
        )
    ]
    if not paths:
        return pa.Table.from_pydict(
            {"token": pa.array([], pa.string()),
             "doc_id": pa.array([], pa.int64()),
             "tf": pa.array([], pa.int64())}
        )

    def hit(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("token"), value_set=want)
        return batch.filter(mask).select(["token", "doc_id", "tf"])

    out = (
        ray.data.read_parquet(paths, columns=["token", "doc_id", "tf"])
        .map_batches(hit, batch_format="pyarrow")
    )
    parts = [
        t
        for t in ray.get(out.materialize().to_arrow_refs())
        if t.num_rows
    ]
    if not parts:
        return pa.Table.from_pydict(
            {"token": pa.array([], pa.string()),
             "doc_id": pa.array([], pa.int64()),
             "tf": pa.array([], pa.int64())}
        )
    return pa.concat_tables(parts).sort_by(
        [("token", "ascending"), ("doc_id", "ascending")]
    )


def tfidf_topk(
    sf_dir: str,
    k: int = 5,
    df_broadcast_budget: int = 2_000_000,
) -> ray.data.Dataset:
    """Per-document top-``k`` TF-IDF terms:
    ``score = round(tf * ln(N / df), 6)``, ranked by (score desc,
    token asc).

    Pass 1 computes document frequencies with a per-batch combiner
    (distinct (doc, token) -> token partial counts) before the small
    token-keyed groupby. Pass 2 scores per document — a pure map when
    the df table fits ``df_broadcast_budget`` (vocabulary grows
    sublinearly in corpus size, so this is the common case), else a
    fully distributed ``cogroup_attach`` of df onto (doc_id, token,
    tf) rows by token followed by a per-doc top-k ``map_groups``.
    """
    from .dedup import _collect_within_budget
    from .joins import cogroup_attach

    from .io import parquet_num_rows

    docs = read_documents(sf_dir, ("doc_id", "text"))
    # corpus row count from the parquet FOOTER — no Ray execution
    # spent on a scalar probe (session-8 sharp edge)
    n_docs = parquet_num_rows(f"{sf_dir}/documents.parquet")

    def partial_df(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = _tokenize(batch.column("text"))
        codes_arr = pc.dictionary_encode(flat)
        codes = np.asarray(
            codes_arr.indices.to_numpy(zero_copy_only=False), np.int64
        )
        if not len(codes):
            return pa.Table.from_pydict(
                {"token": pa.array([], pa.string()),
                 "pdf": pa.array([], pa.int64())}
            )
        firsts, _ = _group_counts([codes, doc_idx])
        cnt = np.bincount(codes[firsts]).astype(np.int64)
        present = np.flatnonzero(cnt)
        return pa.Table.from_pydict(
            {
                "token": codes_arr.dictionary.take(pa.array(present)),
                "pdf": pa.array(cnt[present], pa.int64()),
            }
        )

    df_ds = (
        docs.map_batches(partial_df, batch_format="pyarrow")
        .groupby("token")
        .sum("pdf")
    )

    doc_tf = doc_tf_rows

    def topk_table(tbl: pa.Table) -> pa.Table:
        """(doc_id, token, tf, df) rows -> per-doc top-k by score."""
        tf = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        df = tbl.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.round(tf * np.log(n_docs / df), 6)
        tbl = tbl.append_column("score", pa.array(score, pa.float64()))
        import pandas as pd

        pdf = tbl.to_pandas()
        pdf = pdf.sort_values(
            ["doc_id", "score", "token"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        pdf = pdf.groupby("doc_id", sort=False).head(k)
        return pa.Table.from_pandas(
            pdf, preserve_index=False
        ).replace_schema_metadata(None)

    df_tbl = _collect_within_budget(df_ds, df_broadcast_budget)
    if df_tbl is not None and df_tbl.num_rows:
        import ray

        df_ref = ray.put(
            dict(
                zip(
                    df_tbl.column("token").to_pylist(),
                    df_tbl.column("sum(pdf)").to_pylist(),
                )
            )
        )

        def score_broadcast(batch: pa.Table) -> pa.Table:
            import pandas as pd
            import ray as _ray

            tfs = doc_tf(batch)
            lookup = _ray.get(df_ref)
            tok = tfs.column("token").to_numpy(zero_copy_only=False)
            dfv = (
                pd.Series(tok, dtype=object).map(lookup).to_numpy(np.int64)
            )
            tfs = tfs.append_column("df", pa.array(dfv, pa.int64()))
            return topk_table(tfs)

        return docs.map_batches(score_broadcast, batch_format="pyarrow")

    # over-budget tier: distribute df attach by token, then per-doc top-k
    def rename_df(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["token", "df"])

    tf_rows = docs.map_batches(doc_tf, batch_format="pyarrow")
    joined = cogroup_attach(
        tf_rows,
        df_ds.map_batches(rename_df, batch_format="pyarrow"),
        key="token",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("token", pa.string()),
            pa.field("tf", pa.int64()),
        ],
        payload_fields=[pa.field("df", pa.int64())],
    )
    return joined.groupby("doc_id").map_groups(
        topk_table, batch_format="pyarrow"
    )


def bloom_token_membership(
    sf_dir: str, probe_tokens: list[str], m: int = 8192
) -> pa.Table:
    """Bloom-filter membership probe over the corpus vocabulary — the
    third mergeable sketch next to HLL (distinct counts) and CMS
    (frequency estimates): no false negatives, false positives bounded
    by fill**k. At 100-TB scale this is the cheap "have we seen this
    token/url/shingle?" pre-filter that avoids a distinct-key shuffle.

    DETERMINISTIC and bit-exact reproducible in SQL: positions are the
    CMS bucket scheme (``kernels/sketch.py:bloom_positions``), so the
    driver-gate oracle rebuilds the identical bit set from the corpus
    vocabulary.

    Scale shape: each batch emits its distinct SET BIT positions
    (<= min(4 * batch_vocab, m) rows regardless of corpus size); the
    merge is a position union on the driver (register merge, like HLL).
    """
    from ..kernels.sketch import bloom_add, bloom_query

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _tokenize(batch.column("text"))
        vocab = pc.unique(flat)
        bits = bloom_add(np.zeros(m, dtype=bool), vocab.to_pylist())
        return pa.Table.from_pydict(
            {"pos": pa.array(np.flatnonzero(bits), pa.int64())}
        )

    parts = [
        t
        for t in ray.get(
            read_documents(sf_dir, ("doc_id", "text"))
            .map_batches(partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    bits = np.zeros(m, dtype=bool)
    for t in parts:
        bits[t.column("pos").to_numpy(zero_copy_only=False)] = True
    hits = bloom_query(bits, probe_tokens)
    return pa.Table.from_pydict(
        {
            "token": pa.array(probe_tokens, pa.string()),
            "hit": pa.array(hits.astype(np.int64), pa.int64()),
        }
    )


_LANG_NULL = "\x00"  # sentinel: tokens are whitespace-split, never \x00
_LANG_SEP = "\x1f"


def top_tokens_per_lang(sf_dir: str, k: int = 10) -> ray.data.Dataset:
    """Exact per-language heavy hitters: the grouped sibling of
    ``top_tokens``. Per-batch (lang, token) partial counts (one lexsort
    per batch) -> one composite-keyed groupby sum (vocabulary x lang
    rows, sublinear in corpus) -> per-lang top-``k`` by (count desc,
    token asc). Null langs form their own stratum via a sentinel that
    whitespace tokens cannot contain."""
    docs = read_documents(sf_dir, ("text", "lang"))

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = _tokenize(batch.column("text"))
        codes_arr = pc.dictionary_encode(flat)
        codes = np.asarray(
            codes_arr.indices.to_numpy(zero_copy_only=False), np.int64
        )
        if not len(codes):
            return pa.Table.from_pydict(
                {"key": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        langs = pc.fill_null(batch.column("lang"), _LANG_NULL)
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        lang_codes_arr = pc.dictionary_encode(langs)
        lang_per_tok = np.asarray(
            lang_codes_arr.indices.to_numpy(zero_copy_only=False), np.int64
        )[doc_idx]
        firsts, counts = _group_counts([lang_per_tok, codes])
        key = pc.binary_join_element_wise(
            lang_codes_arr.dictionary.take(pa.array(lang_per_tok[firsts])),
            codes_arr.dictionary.take(pa.array(codes[firsts])),
            _LANG_SEP,
        )
        return pa.Table.from_pydict(
            {"key": key, "cnt": pa.array(counts, pa.int64())}
        )

    summed = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .sum("cnt")
    )

    def split_key(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("key"), _LANG_SEP)
        lang = pc.list_element(parts, 0)
        return pa.Table.from_pydict(
            {
                "lang": lang,
                "token": pc.list_element(parts, 1),
                "cnt": pc.cast(batch.column("sum(cnt)"), pa.int64()),
            }
        )

    def topk_group(group: pa.Table) -> pa.Table:
        import pandas as pd

        pdf = group.to_pandas().sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(k)
        pdf["lang"] = pdf["lang"].where(pdf["lang"] != _LANG_NULL, None)
        return pa.Table.from_pandas(
            pdf, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        summed.map_batches(split_key, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(topk_group, batch_format="pyarrow")
    )


DEFAULT_BM25_QUERY = ("table", "hash", "sort", "window")


def bm25_topk(
    sf_dir: str,
    query_tokens: tuple[str, ...] = DEFAULT_BM25_QUERY,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """Okapi BM25 retrieval: top-``k`` documents for a fixed query
    token set, ``(doc_id, score)`` with score rounded to 6dp BEFORE
    ranking (ties then break by doc_id, so the result set is stable
    against float summation order).

    Scale shape — the query side is O(|q|), so nothing shuffles:

    - Pass 1 streams the corpus once and emits ONE stats row per batch
      (doc count, token-length sum, per-query-token document
      frequencies as a fixed-width list) — a register-style partial
      bounded by |q|, driver-combined like the HLL/CMS sketches.
    - Pass 2 re-reads text (pruned columns; the corpus is never
      pinned), scores hit docs against the |q| broadcast scalars, and
      keeps only the per-block top-k, so the driver merge sees
      k x #blocks rows.

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))  (Robertson/Lucene)
    """
    q = list(query_tokens)

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx, n_tokens = _tokenize(batch.column("text"))
        n_docs = batch.num_rows
        df = np.zeros(len(q), np.int64)
        if len(flat):
            for j, tok in enumerate(q):
                mask = pc.equal(flat, tok).to_numpy(zero_copy_only=False)
                if mask.any():
                    hit_docs = np.unique(doc_idx[mask])
                    df[j] = len(hit_docs)
        return pa.Table.from_pydict(
            {
                "n_docs": pa.array([n_docs], pa.int64()),
                "sum_dl": pa.array([int(n_tokens.sum())], pa.int64()),
                "df": pa.array([df.tolist()], pa.list_(pa.int64())),
            }
        )

    parts = [
        t
        for t in ray.get(
            read_documents(sf_dir, ("doc_id", "text"))
            .map_batches(stats_partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    empty = pa.Table.from_pydict(
        {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
    )
    if not parts:
        return empty
    stats = pa.concat_tables(parts)
    n_total = int(pc.sum(stats.column("n_docs")).as_py() or 0)
    sum_dl = int(pc.sum(stats.column("sum_dl")).as_py() or 0)
    df_mat = np.array(stats.column("df").to_pylist(), np.int64)
    df_tot = df_mat.sum(axis=0)
    if n_total == 0:
        return empty
    avgdl = sum_dl / n_total
    idf = np.log(1.0 + (n_total - df_tot + 0.5) / (df_tot + 0.5))

    def score_block(batch: pa.Table) -> pa.Table:
        flat, doc_idx, n_tokens = _tokenize(batch.column("text"))
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        score = np.zeros(n, np.float64)
        if len(flat):
            dl = n_tokens.astype(np.float64)
            denom_dl = k1 * (1.0 - b + b * dl / avgdl)
            for j, tok in enumerate(q):
                mask = pc.equal(flat, tok).to_numpy(zero_copy_only=False)
                if not mask.any():
                    continue
                tf = np.bincount(doc_idx[mask], minlength=n).astype(np.float64)
                hit = tf > 0
                score[hit] += idf[j] * (
                    tf[hit] * (k1 + 1.0) / (tf[hit] + denom_dl[hit])
                )
        hit = score > 0
        if not hit.any():
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        sc = np.round(score[hit], 6)
        ids = doc_ids[hit]
        order = np.lexsort((ids, -sc))[:k]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "score": pa.array(sc[order], pa.float64()),
            }
        )

    blocks = [
        t
        for t in ray.get(
            read_documents(sf_dir, ("doc_id", "text"))
            .map_batches(score_block, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not blocks:
        return empty
    merged = pa.concat_tables(blocks)
    sc = merged.column("score").to_numpy(zero_copy_only=False)
    ids = merged.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -sc))[:k]
    return merged.take(pa.array(np.sort(order))).sort_by(
        [("score", "descending"), ("doc_id", "ascending")]
    )


def build_positional_index(
    sf_dir: str,
    num_buckets: int = 16,
    out_dir: str | None = None,
) -> str:
    """PERSISTED positional inverted index: (token, doc_id, positions)
    posting rows — the phrase-search extension of
    ``build_inverted_index`` (same content-keyed cache dir, _SUCCESS
    marker, bucket partitioning; a query reads only its tokens'
    buckets). Positions are 0-based whitespace-token ordinals, built
    in one vectorized lexsort pass per batch; no shuffle — parquet
    partitioning on write is the only data movement."""
    import hashlib
    import os
    import shutil

    from .joins import string_key_buckets

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    try:
        st = os.stat(src)
        content_tag = f"{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        content_tag = "unknown"
    if out_dir is None:
        tag = hashlib.md5(
            f"{src}:{num_buckets}:{content_tag}:pos".encode()
        ).hexdigest()[:12]
        out_dir = f"/tmp/graft_posidx/{tag}"
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    docs = read_documents(sf_dir, ("doc_id", "text"))

    def position_rows(batch: pa.Table) -> pa.Table:
        flat, doc_idx, n_tok = _tokenize(batch.column("text"))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pa.Table.from_pydict(
                {
                    "token": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "positions": pa.array([], pa.list_(pa.int64())),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        offs = np.concatenate(([0], np.cumsum(n_tok)))[:-1]
        pos = np.arange(len(doc_idx), dtype=np.int64) - offs[doc_idx]
        enc = flat.dictionary_encode()
        tcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pos, tcode, doc_idx))
        d, t, p = doc_idx[order], tcode[order], pos[order]
        first = np.flatnonzero(np.r_[True, (d[1:] != d[:-1]) | (t[1:] != t[:-1])])
        counts = np.diff(np.r_[first, len(d)])
        lo = np.concatenate((first, [len(d)])).astype(np.int32)
        tok = enc.dictionary.take(pa.array(t[first]))
        return pa.Table.from_pydict(
            {
                "token": tok,
                "doc_id": pa.array(ids[d[first]], pa.int64()),
                "positions": pa.ListArray.from_arrays(
                    pa.array(lo, pa.int32()), pa.array(p, pa.int64())
                ),
                "bucket": pa.array(
                    string_key_buckets(tok, num_buckets), pa.int32()
                ),
            }
        )

    docs.map_batches(position_rows, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def phrase_lookup(
    sf_dir: str,
    phrase: tuple[str, ...] = ("hash", "join"),
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Exact phrase search over the persisted positional index:
    returns ``(doc_id, n_occ, first_pos)`` for every doc containing
    the token sequence at adjacent positions. Reads ONLY the phrase
    tokens' bucket partitions (partition pruning = candidate
    filtering, like the IVF nprobe read); the surviving postings —
    bounded by the phrase's document frequency, not the corpus —
    regroup once by doc bucket, and each doc intersects its per-ordinal
    sorted position arrays (cand = cand[isin(cand + k, pos_k)]), the
    classic positional-postings merge."""
    import glob
    import os

    import ray
    import ray.data

    from .joins import (
        default_num_buckets,
        int_key_buckets,
        string_key_buckets,
    )

    if not phrase:
        raise ValueError("phrase must have at least one token")
    index_dir = build_positional_index(sf_dir, num_buckets=num_buckets)
    want = pa.array(sorted(set(phrase)), pa.string())
    buckets = sorted(set(string_key_buckets(want, num_buckets).tolist()))
    paths = [
        f
        for b in buckets
        for f in sorted(
            glob.glob(os.path.join(out_glob(index_dir, b), "*.parquet"))
        )
    ]
    empty_out = pa.Table.from_pydict(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_occ": pa.array([], pa.int64()),
            "first_pos": pa.array([], pa.int64()),
        }
    )
    if not paths:
        return ray.data.from_arrow(empty_out)
    # token -> phrase ordinals (a token may repeat in the phrase)
    ords_of: dict[str, list[int]] = {}
    for k, t in enumerate(phrase):
        ords_of.setdefault(t, []).append(k)
    n_parts = default_num_buckets()

    def hit(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("token"), value_set=want)
        t = batch.filter(mask).select(["token", "doc_id", "positions"])
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column(
            "dbucket", pa.array(int_key_buckets(d, n_parts))
        )

    def intersect(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return empty_out
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        toks = group.column("token").to_pylist()
        pos_col = group.column("positions")
        order = np.argsort(d, kind="stable")
        out_doc, out_n, out_first = [], [], []
        i = 0
        while i < len(order):
            j = i
            per_ord: dict[int, np.ndarray] = {}
            while j < len(order) and d[order[j]] == d[order[i]]:
                r = order[j]
                pl = np.asarray(pos_col[int(r)].as_py(), np.int64)
                for k in ords_of.get(toks[r], ()):
                    per_ord[k] = pl
                j += 1
            if len(per_ord) == len(phrase):
                cand = per_ord[0]
                for k in range(1, len(phrase)):
                    if not len(cand):
                        break
                    cand = cand[np.isin(cand + k, per_ord[k])]
                if len(cand):
                    out_doc.append(int(d[order[i]]))
                    out_n.append(len(cand))
                    out_first.append(int(cand.min()))
            i = j
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "n_occ": pa.array(out_n, pa.int64()),
                "first_pos": pa.array(out_first, pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(
            paths, columns=["token", "doc_id", "positions"]
        )
        .map_batches(hit, batch_format="pyarrow")
        .groupby("dbucket")
        .map_groups(intersect, batch_format="pyarrow")
    )


def pmi_pairs(
    sf_dir: str,
    vocab_k: int = 64,
    top_pairs: int = 25,
    min_docs: int = 5,
) -> pa.Table:
    """Vocabulary-bounded PMI collocations — co-occurrence mining with
    the pair explosion CAPPED by construction: pairs are only counted
    among the exact top-``vocab_k`` tokens (from ``top_tokens``), so
    the co-occurrence state is one dense ``k x k`` int64 register per
    block regardless of corpus size — the same mergeable-register
    discipline as the sketch family, applied to a quadratic statistic.

    Per batch: tokens hit the broadcast sorted vocab via searchsorted,
    presence dedups to a (docs x k) boolean matrix, and the pair
    register update is ONE ``M.T @ M`` — no per-doc Python, no pair
    rows on the wire. Driver folds the registers and scores
    ``pmi(x,y) = ln(c_xy * n_docs / (c_x * c_y))`` over document
    frequencies, keeping pairs seen in >= ``min_docs`` docs.

    Output: (token_a, token_b, n_docs_xy, pmi) top ``top_pairs`` by
    (pmi desc, token_a, token_b); token_a < token_b in string order —
    the vocab matrix is sorted by token, so pair orientation matches
    the SQL ``a.token < b.token`` join.
    """
    vocab_tbl = top_tokens(sf_dir, k=vocab_k)
    vocab = np.sort(
        np.asarray(vocab_tbl.column("token").to_pylist(), dtype=object)
    )
    vref = ray.put(vocab)

    def partial(batch: pa.Table) -> pa.Table:
        voc = ray.get(vref)
        flat, doc_idx, _ = _tokenize(batch.column("text"))
        n_rows = batch.num_rows
        toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        if len(toks):
            pos = np.searchsorted(voc, toks)
            pos = np.minimum(pos, len(voc) - 1)
            hit = voc[pos] == toks
            m = np.zeros((n_rows, len(voc)), bool)
            m[doc_idx[hit], pos[hit]] = True
        else:
            m = np.zeros((n_rows, len(voc)), bool)
        mi = m.astype(np.int64)
        pair = mi.T @ mi  # diag = per-token doc counts
        return pa.Table.from_pydict(
            {
                "n_docs": pa.array([n_rows], pa.int64()),
                "reg": pa.array([pair.ravel().tolist()], pa.list_(pa.int64())),
            }
        )

    parts = [
        t
        for t in read_documents(sf_dir, ("doc_id", "text"))
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        if t.num_rows
    ]
    k = len(vocab)
    reg = np.zeros((k, k), np.int64)
    n_docs = 0
    for t in parts:
        n_docs += int(pc.sum(t.column("n_docs")).as_py())
        col = t.column("reg").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        reg += flat.reshape(len(col), k * k).sum(axis=0).reshape(k, k)
    cx = np.diag(reg)
    iu, ju = np.triu_indices(k, k=1)
    c_xy = reg[iu, ju]
    keep = c_xy >= min_docs
    iu, ju, c_xy = iu[keep], ju[keep], c_xy[keep]
    pmi = np.log(
        c_xy.astype(np.float64) * n_docs / (cx[iu] * cx[ju]).astype(np.float64)
    )
    order = np.lexsort((vocab[ju], vocab[iu], -pmi))[:top_pairs]
    return pa.Table.from_pydict(
        {
            "token_a": pa.array(vocab[iu][order], pa.string()),
            "token_b": pa.array(vocab[ju][order], pa.string()),
            "n_docs_xy": pa.array(c_xy[order], pa.int64()),
            "pmi": pa.array(np.round(pmi[order], 6), pa.float64()),
        }
    )


def zipf_slope(sf_dir: str, k: int = 100) -> pa.Table:
    """Zipf fit over the corpus vocabulary head: OLS of ln(count) on
    ln(rank) across the exact top-``k`` tokens (ties by token asc, the
    ``top_tokens`` order) — the one-number corpus-health check a
    curation run uses to spot template/boilerplate-dominated crawls
    (natural language ~ −1; flatter means synthetic repetition,
    steeper means a few templates drown the tail).

    Composition: the distributed exact heavy-hitter pass
    (``top_tokens`` — distinct-per-block partials, token-keyed
    groupby, per-block top-k merge) already bounds what reaches the
    driver at k × #blocks rows; the OLS fold here is k rows of driver
    arithmetic with the oracle's exact formula shape (n·Σxy − ΣxΣy
    over n·Σx² − (Σx)²). Fewer than 2 distinct tokens → NULL fit,
    mirrored by the SQL CASE."""
    top = top_tokens(sf_dir, k)
    n_tok = top.num_rows
    if n_tok < 2:
        return pa.Table.from_pydict(
            {
                "n_tokens": pa.array([n_tok], pa.int64()),
                "slope": pa.array([None], pa.float64()),
                "intercept": pa.array([None], pa.float64()),
                "r2": pa.array([None], pa.float64()),
            }
        )
    cnt = top.column("cnt").to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    x = np.log(np.arange(1, n_tok + 1, dtype=np.float64))
    y = np.log(cnt)
    n = float(n_tok)
    sx, sy = x.sum(), y.sum()
    sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    num = n * sxy - sx * sy
    slope = num / dx
    intercept = (sy - slope * sx) / n
    r2 = (num * num) / (dx * dy) if dy > 0 else None
    return pa.Table.from_pydict(
        {
            "n_tokens": pa.array([n_tok], pa.int64()),
            "slope": pa.array([round(slope, 6)], pa.float64()),
            "intercept": pa.array([round(intercept, 6)], pa.float64()),
            "r2": pa.array(
                [None if r2 is None else round(r2, 6)], pa.float64()
            ),
        }
    )


_VG_EMPTY = pa.Table.from_pydict(
    {
        "decile": pa.array([], pa.int64()),
        "cutoff_doc": pa.array([], pa.int64()),
        "vocab_size": pa.array([], pa.int64()),
    }
)


def _doc_id_max(sf_dir: str) -> int | None:
    """MAX(doc_id) from parquet FOOTER row-group statistics — no Ray
    execution spent on a bound (the session-8 footer-probe edge,
    extended from row counts to column stats). None when stats are
    absent (caller falls back to an aggregate)."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    idx = f.schema_arrow.get_field_index("doc_id")
    mx = None
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        mx = st.max if mx is None else max(mx, st.max)
    return mx


def vocab_growth(
    sf_dir: str, deciles: int = 10, combine_limit: int = 2_000_000
) -> pa.Table:
    """Vocabulary growth curve (the Heaps'-law readout): distinct
    tokens seen after processing the first 10%, 20%, … of the corpus
    in ``doc_id`` order — the planning curve that says whether a
    tokenizer/vocab budget saturates or keeps growing with more data.

    "Seen by cutoff d" reduces to each token's FIRST doc: stage 1 is
    (token, min(doc_id)) — per-block group-min partials under the
    combine budget with the Ray ``groupby(token).min`` fallback,
    bounded by DISTINCT tokens, never occurrences. Stage 2 folds
    first-doc values into ≤ ``deciles`` counts per block (cutoffs =
    floor(i·max_id/10) with max_id from parquet FOOTER column stats —
    no Ray execution for a bound), second combine + fallback.
    ``vocab_growth_grouped`` forces both exchanges."""
    from .relational import _combine_partials, _read

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def first_partial(batch: pa.Table) -> pa.Table:
        flat, doc_idx, _ = _tokenize(batch.column("text"))
        if not len(doc_idx):
            return pa.Table.from_pydict(
                {"token": pa.array([], pa.string()),
                 "first_doc": pa.array([], pa.int64())}
            )
        dids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)[doc_idx]
        codes_arr = pc.dictionary_encode(flat)
        codes = codes_arr.indices.to_numpy(zero_copy_only=False)
        mn = np.full(len(codes_arr.dictionary), np.iinfo(np.int64).max)
        np.minimum.at(mn, codes, dids)
        return pa.Table.from_pydict(
            {
                "token": codes_arr.dictionary,
                "first_doc": pa.array(mn, pa.int64()),
            }
        )

    mx = _doc_id_max(sf_dir)
    partials = ds.map_batches(
        first_partial, batch_format="pyarrow"
    ).materialize()
    if mx is None:
        # stats-free file: the bound is MAX(doc_id) over ALL documents
        # (token-less docs count — the oracle's m CTE reads the whole
        # table), so aggregate the raw column, not the token firsts
        mx = _read(sf_dir, "documents", ["doc_id"]).max("doc_id")
        if mx is None:  # zero-row table: mirror the oracle's NULL
            # cutoffs (10 rows, empty vocabulary)
            return pa.Table.from_pydict(
                {
                    "decile": pa.array(
                        np.arange(1, deciles + 1, dtype=np.int64),
                        pa.int64(),
                    ),
                    "cutoff_doc": pa.array([None] * deciles, pa.int64()),
                    "vocab_size": pa.array(
                        np.zeros(deciles, dtype=np.int64), pa.int64()
                    ),
                }
            )
        mx = int(mx)
    cutoffs = np.floor(
        np.arange(1, deciles + 1, dtype=np.float64) * float(mx) / deciles
    ).astype(np.int64)

    def cut_rows(fd: np.ndarray) -> pa.Table:
        m = (fd[:, None] <= cutoffs[None, :]).sum(axis=0).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "decile": pa.array(
                    np.arange(1, deciles + 1, dtype=np.int64), pa.int64()
                ),
                "m": pa.array(m, pa.int64()),
            }
        )

    firsts = _combine_partials(
        partials, ["token"], ["first_doc"], combine_limit, agg="min"
    )
    if firsts is not None:
        cells = cut_rows(
            firsts.column("min(first_doc)").to_numpy(zero_copy_only=False)
        )
    else:
        grouped = partials.groupby("token").min("first_doc")
        cut_parts = grouped.map_batches(
            lambda b: cut_rows(
                b.column("min(first_doc)").to_numpy(zero_copy_only=False)
            ),
            batch_format="pyarrow",
        ).materialize()
        cells = _combine_partials(
            cut_parts, ["decile"], ["m"], combine_limit
        )
        if cells is None:
            rows = [
                t for t in ray.get(
                    cut_parts.groupby("decile").sum("m").to_arrow_refs()
                ) if t.num_rows
            ]
            cells = pa.concat_tables(rows).rename_columns(
                ["decile", "sum(m)"]
            )
        cells = cells.rename_columns(["decile", "m"])
    dec = cells.column("decile").to_numpy(zero_copy_only=False)
    m = cells.column("m").to_numpy(zero_copy_only=False)
    order = np.argsort(dec, kind="stable")
    return pa.Table.from_pydict(
        {
            "decile": pa.array(dec[order].astype(np.int64), pa.int64()),
            "cutoff_doc": pa.array(cutoffs[dec[order] - 1], pa.int64()),
            "vocab_size": pa.array(m[order].astype(np.int64), pa.int64()),
        }
    )


def split_of_sources(col) -> np.ndarray:
    """The 80/10/10 grouped-split rule, SHARED by
    ``dataset_split_by_source`` and ``split_contamination`` so the
    measurement op provably measures the split op's exact rule:
    ``hash64('gsplit:'+source) % 100`` -> train/valid/test. Null
    sources violate the documents contract and would silently
    stringify to the literal 'None' (dropping the salt) while the SQL
    oracle CASEs them to 'test' — refuse loudly instead (the
    psi_source_drift convention)."""
    from ..kernels.sketch import hash64_strings

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError(
            "split_of_sources: null source violates the documents "
            "contract; fill or drop nulls upstream"
        )
    pref = pc.binary_join_element_wise(pa.scalar("gsplit:"), col, "")
    hv = hash64_strings(pref) % np.uint64(100)
    return np.where(hv < 80, "train", np.where(hv < 90, "valid", "test"))


def split_of_doc_ids(ids: np.ndarray) -> np.ndarray:
    """The per-doc 80/10/10 rule (``dataset_split``'s hash), shared
    for the same provable-identity reason."""
    from ..kernels.sketch import hash64

    hv = hash64([f"split:{i}" for i in ids.tolist()]) % np.uint64(100)
    return np.where(hv < 80, "train", np.where(hv < 90, "valid", "test"))


def dataset_split_by_source(
    sf_dir: str, combine_limit: int = 2_000_000
) -> pa.Table:
    """LEAKAGE-SAFE grouped split manifest: every SOURCE hashes whole
    to train/valid/test via ``hash64('gsplit:'+source) % 100``
    (80/10/10), so near-duplicate / boilerplate-sibling documents —
    which overwhelmingly live within one source — can never straddle
    the train/eval boundary (the FineWeb/Dolma anti-contamination
    split rule; the per-doc ``dataset_split`` cannot give this
    guarantee). Output per split: distinct sources, docs, chars.

    Scale shape: per-block (split, source, n, chars) partials are
    bounded by DISTINCT sources per block; the per-split distinct-
    source count is the ROW COUNT of the (split, source) grouped
    result — additive over disjoint key blocks (the ngram_diversity
    trick) — so the over-budget tier folds per-block
    (split, rows, Σn, Σchars) partials and nothing source-sized ever
    lands on the driver. ``dataset_split_by_source_grouped`` forces
    the Ray exchange."""
    from .relational import _combine_partials, _read, collect_arrow

    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def split_partial(batch: pa.Table) -> pa.Table:
        src_col = batch.column("source")
        if isinstance(src_col, pa.ChunkedArray):
            src_col = src_col.combine_chunks()
        split = split_of_sources(src_col)
        t = pa.Table.from_pydict(
            {
                "split": pa.array(split.astype(object), pa.string()),
                "source": src_col,
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "chars": batch.column("n_chars").cast(pa.int64()),
            }
        )
        return (
            t.group_by(["split", "source"])
            .aggregate([("n", "sum"), ("chars", "sum")])
            .rename_columns(["split", "source", "n", "chars"])
        )

    partials = ds.map_batches(
        split_partial, batch_format="pyarrow"
    ).materialize()
    cells = _combine_partials(
        partials, ["split", "source"], ["n", "chars"], combine_limit
    )
    if cells is not None:
        sp = cells.column("split")
        agg = (
            pa.Table.from_pydict(
                {
                    "split": sp,
                    "s": pa.array(
                        np.ones(cells.num_rows, dtype=np.int64)
                    ),
                    "n": cells.column("sum(n)"),
                    "chars": cells.column("sum(chars)"),
                }
            )
            .group_by("split")
            .aggregate([("s", "sum"), ("n", "sum"), ("chars", "sum")])
            .rename_columns(["split", "n_sources", "n_docs", "sum_chars"])
        )
    else:
        # sources over the driver budget: dedup (split, source) in the
        # Ray groupby; whole key groups land in single blocks, so
        # per-block (split, rows, Σn, Σchars) partials are additive
        grouped = partials.groupby(["split", "source"]).sum(["n", "chars"])

        def fold(b: pa.Table) -> pa.Table:
            t = pa.Table.from_pydict(
                {
                    "split": b.column("split"),
                    "s": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                    "n": b.column("sum(n)"),
                    "chars": b.column("sum(chars)"),
                }
            )
            return t.group_by("split").aggregate(
                [("s", "sum"), ("n", "sum"), ("chars", "sum")]
            ).rename_columns(["split", "s", "n", "chars"])

        folded = grouped.map_batches(fold, batch_format="pyarrow")
        agg2 = _combine_partials(
            folded, ["split"], ["s", "n", "chars"], combine_limit
        )
        if agg2 is None:  # 3 splits x blocks: Ray groupby close
            agg2 = collect_arrow(
                folded.groupby("split").sum(["s", "n", "chars"])
            )
        agg = agg2.rename_columns(
            ["split", "n_sources", "n_docs", "sum_chars"]
        )
    out = pa.Table.from_pydict(
        {
            "split": agg.column("split"),
            "n_sources": pc.cast(agg.column("n_sources"), pa.int64()),
            "n_docs": pc.cast(agg.column("n_docs"), pa.int64()),
            "sum_chars": pc.cast(agg.column("sum_chars"), pa.int64()),
        }
    )
    return out.sort_by([("split", "ascending")])


def dataset_split(
    sf_dir: str, combine_limit: int = 2_000_000
) -> pa.Table:
    """Deterministic train/valid/test assignment manifest: every doc
    hashes to a split via ``hash64('split:'+doc_id) % 100`` (80/10/10)
    — the content-independent, machine-independent split rule an
    export step needs so reruns and resumes land every doc in the
    same split — and the op emits the per-(split, lang) doc and char
    counts that become the dataset card. The hash is the house
    md5-derived 64-bit key, so the oracle rebuilds the assignment
    bit-exactly with ``md5_number_upper``.

    Pure map + a categorical-bounded (split × lang) count exchange
    under the combine budget; ``dataset_split_grouped`` forces the
    Ray groupby fallback."""
    from .relational import _combine_partials, _read

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def split_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        split = split_of_doc_ids(ids)
        t = pa.Table.from_pydict(
            {
                "split": pa.array(split.astype(object), pa.string()),
                "lang": batch.column("lang"),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "chars": batch.column("n_chars").cast(pa.int64()),
            }
        )
        return (
            t.group_by(["split", "lang"])
            .aggregate([("n", "sum"), ("chars", "sum")])
            .rename_columns(["split", "lang", "n", "chars"])
        )

    partials = ds.map_batches(
        split_partial, batch_format="pyarrow"
    ).materialize()
    cells = _combine_partials(
        partials, ["split", "lang"], ["n", "chars"], combine_limit
    )
    if cells is None:
        rows = [
            t
            for t in ray.get(
                partials.groupby(["split", "lang"])
                .sum(["n", "chars"])
                .to_arrow_refs()
            )
            if t.num_rows
        ]
        cells = pa.concat_tables(rows).rename_columns(
            ["split", "lang", "sum(n)", "sum(chars)"]
        )
    return cells.rename_columns(
        ["split", "lang", "n_docs", "sum_chars"]
    ).sort_by([("split", "ascending"), ("lang", "ascending")])
