"""URL-level corpus curation — the RefinedWeb-style web-pipeline
stage the documents table lacks a column for: deterministic synthetic
urls are derived from (doc_id, source) with planted messiness
(scheme/host case, default :443 ports, trailing slashes, utm tracking
params, fragments, spammy path segments), then canonicalized with the
real ``kernels.urlnorm.normalize_url`` and scored:

- ``domain``: the registrable domain (host minus its first label),
  extracted from the NORMALIZED url with one vectorized RE2 pass;
- ``blocked``: domain membership in a UT1-style blocklist (a constant
  constructor set, like DSIR's bucket count — at scale this is the
  ray.put-broadcast small side of a semi-join, never a shuffle);
- ``spam_hits``: count of spam words in the url (RE2 count — DuckDB
  and pyarrow both run RE2, so the oracle agrees byte-for-byte);
- ``keep``: not blocked and zero spam hits.

Everything after the per-url ``urlsplit`` is vectorized; the
normalization itself is stdlib-per-url (the one hot-path Python loop,
~2 us/url, same budget class as the md5 ``hash64`` loops elsewhere).
The SQL oracle mirrors the planted construction as a closed form — it
never reimplements RFC 3986, it knows exactly which mess was planted.

``domain_stats`` aggregates the same verdicts per domain (docs, kept,
mean n_chars) with a per-batch combiner before one small groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..kernels.urlnorm import normalize_url_column
from .joins import cogroup_attach
from .text_analysis import read_documents

# UT1-style blocklist: a constant, like a real blocklist file shipped
# with the job; broadcast by closure capture (tiny)
BLOCKED_DOMAINS = frozenset(
    {"src3.example.com", "src7.example.com", "src11.example.com"}
)

SPAM_RE = r"casino|bonus"


def _synth_raw_urls(batch: pa.Table) -> list[str]:
    """Deterministic messy urls from (doc_id, source) — mirrored as a
    closed form in the SQL oracles (see __ray_entry__)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    src = batch.column("source").to_pylist()
    urls = []
    for d, s in zip(ids, src):
        d = int(d)
        s = s or "nosrc"
        scheme = "HTTPS" if d % 5 == 0 else "https"
        host_mid = s.upper() if d % 3 == 1 else s
        port = ":443" if d % 11 == 4 else ""
        path = f"/p/{d // 10}" + ("-casino-bonus" if d % 31 == 9 else "")
        trail = "/" if d % 13 == 6 else ""
        if d % 17 in (2, 3):
            query = f"?utm_source=feed&id={d % 97}"
        elif d % 17 == 4:
            query = f"?id={d % 97}"
        else:
            query = ""
        frag = "#frag" if d % 19 == 5 else ""
        urls.append(
            f"{scheme}://m{d % 7}.{host_mid}.Example.com{port}"
            f"{path}{trail}{query}{frag}"
        )
    return urls


def _verdict_batch(batch: pa.Table) -> pa.Table:
    raw = _synth_raw_urls(batch)
    norm = pa.array(normalize_url_column(raw), pa.string())
    # registrable domain: host, minus its first (subdomain) label
    host = pc.extract_regex(norm, r"^[a-z]+://(?P<host>[^/:?#]+)")
    host = pc.struct_field(host, "host")
    domain = pc.replace_substring_regex(
        host, r"^[^.]+\.", "", max_replacements=1
    )
    spam = pc.count_substring_regex(norm, SPAM_RE)
    dom_np = np.asarray(domain.to_pylist(), object)
    blocked = np.isin(dom_np, list(BLOCKED_DOMAINS))
    spam_np = pc.fill_null(spam, 0).to_numpy(zero_copy_only=False)
    keep = (~blocked) & (spam_np == 0)
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "url_norm": norm,
            "domain": domain,
            "spam_hits": pa.array(spam_np.astype(np.int64), pa.int64()),
            "blocked": pa.array(blocked, pa.bool_()),
            "keep": pa.array(keep, pa.bool_()),
        }
    )


def url_curation(sf_dir: str) -> ray.data.Dataset:
    """Per-doc url verdict: (doc_id, url_norm, domain, spam_hits,
    blocked, keep). Pure map — no exchange at any scale."""
    docs = read_documents(sf_dir, ("doc_id", "source"))
    return docs.map_batches(_verdict_batch, batch_format="pyarrow")


def domain_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-domain curation report: (domain, n_docs, n_kept,
    mean_chars round6). Per-batch combiner -> one domain-keyed
    groupby sum; the exchange is O(domains) per block."""
    docs = read_documents(sf_dir, ("doc_id", "source", "n_chars"))

    def partial(batch: pa.Table) -> pa.Table:
        v = _verdict_batch(batch)
        import pandas as pd

        df = pd.DataFrame(
            {
                "domain": v.column("domain").to_numpy(zero_copy_only=False),
                "keep": v.column("keep")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "chars": pc.fill_null(batch.column("n_chars"), 0).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        g = (
            df.groupby("domain", sort=False)
            .agg(n_docs=("keep", "size"), n_kept=("keep", "sum"),
                 sum_chars=("chars", "sum"))
            .reset_index()
        )
        return pa.Table.from_pydict(
            {
                "domain": pa.array(g["domain"].tolist(), pa.string()),
                "n_docs": pa.array(g["n_docs"].to_numpy(), pa.int64()),
                "n_kept": pa.array(g["n_kept"].to_numpy(), pa.int64()),
                "sum_chars": pa.array(
                    g["sum_chars"].to_numpy().astype(np.int64), pa.int64()
                ),
            }
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("domain")
        .sum(["n_docs", "n_kept", "sum_chars"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n_docs)").to_numpy(zero_copy_only=False)
        k = batch.column("sum(n_kept)").to_numpy(zero_copy_only=False)
        s = batch.column("sum(sum_chars)").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "domain": batch.column("domain"),
                "n_docs": pa.array(n, pa.int64()),
                "n_kept": pa.array(k, pa.int64()),
                "mean_chars": pa.array(
                    np.round(s / n, 6), pa.float64()
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# -- line-level boilerplate removal -----------------------------------------

COOKIE_LINE = "cookie notice please accept this site uses cookies"
NEWSLETTER_LINE = "subscribe to our newsletter for updates today"
LEGAL_LINES = (
    "all rights reserved contact us about advertising here",
    "terms of service privacy policy and cookie settings apply",
    "follow us on social media for the latest updates and news",
    "copyright two thousand twenty four example media holdings llc",
)


def _plant_lines(batch: pa.Table) -> pa.Table:
    """Deterministic line structure (mirrored in the SQL oracle): the
    corpus has no newlines, so boilerplate lines are appended — every
    doc gets the cookie line, every doc_id % 3 == 0 the newsletter
    line, and doc_id % 13 == 4 four bulky legal lines (enough char
    mass to trip the 30% doc-drop rule on short docs)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    text = pc.fill_null(batch.column("text"), "")
    vals = np.asarray(text.to_pylist(), object)
    news = ids % 3 == 0
    legal = ids % 13 == 4
    out = []
    for i, t in enumerate(vals):
        t = t + "\n" + COOKIE_LINE
        if news[i]:
            t = t + "\n" + NEWSLETTER_LINE
        if legal[i]:
            t = t + "\n" + "\n".join(LEGAL_LINES)
        out.append(t)
    return batch.set_column(
        batch.schema.get_field_index("text"),
        "text",
        pa.array(out, pa.string()),
    )


def _line_arrays(batch: pa.Table):
    """Flat line rows for a (doc_id, text) batch: ``(row_idx, flat
    lines, per-doc line counts)`` — splitting on newline only, no
    trimming, so SQL's regexp_split_to_array('\\n') agrees byte-wise."""
    lines = pc.split_pattern(
        pc.fill_null(batch.column("text"), ""), "\n"
    )
    flat = pc.list_flatten(lines)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    counts = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
    rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return rows, flat, counts


def _plant_host_lines(batch: pa.Table) -> pa.Table:
    """Host-scoped planting (mirrored in the host_line_dedup oracle):
    every doc gets two per-SOURCE template lines (df within the host ==
    docs-per-host, removed), and ``doc_id % 97 == 5`` docs share one
    cross-host notice whose within-host df depends on scale — the line
    the host scoping treats differently from global df."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    text = pc.fill_null(batch.column("text"), "")
    vals = np.asarray(text.to_pylist(), object)
    srcs = np.asarray(
        pc.fill_null(batch.column("source"), "").to_pylist(), object
    )
    rare = ids % 97 == 5
    out = []
    for i, t in enumerate(vals):
        s = srcs[i]
        t = t + f"\n(c) footer of {s}\nvisit {s} for more"
        if rare[i]:
            t = t + "\nrare cross-host migration notice"
        out.append(t)
    return batch.set_column(
        batch.schema.get_field_index("text"),
        "text",
        pa.array(out, pa.string()),
    )


def line_dedup(
    sf_dir: str,
    min_df: int = 2,
    drop_frac: float = 0.3,
    df_broadcast_budget: int = 4_000_000,
    plant: bool = True,
    scope: str = "global",
) -> ray.data.Dataset:
    """RefinedWeb-style line-level boilerplate removal: a line that
    occurs in >= ``min_df`` DISTINCT documents is removed from every
    document (boilerplate semantics — no first-occurrence survivor),
    and a document losing more than ``drop_frac`` of its characters is
    dropped entirely. Returns every doc: (doc_id, n_lines,
    n_removed_lines, kept, clean_text).

    ``scope="host"`` counts df per (source, line) instead of globally
    — the RefinedWeb formulation proper (template boilerplate repeats
    within a site; a quote repeating across sites is content). The
    host key folds into the line hash (one uint64 mix), so EVERY tier
    below runs unchanged on the composite key.

    Scale shape: a doc's lines never straddle batches (one row = one
    doc), so per-batch distinct (line-hash, doc) rows are globally
    distinct and the df model is ONE key-only ``groupby(h).sum``
    exchange of md5 hashes. Under ``df_broadcast_budget`` the sorted
    boilerplate-hash array broadcasts and the second pass removes +
    reassembles as a pure map; past it, line rows cogroup-attach the
    df verdict by hash, per-doc removed-ordinal lists rebuild in
    bucket-keyed vectorized groups, and ONE doc-keyed cogroup meets
    the text (the ExactSubstr fallback shape). Tiers pinned in tests.
    """
    from ..kernels.sketch import hash64_strings

    host_scope = scope == "host"
    cols = ("doc_id", "text", "source") if host_scope else ("doc_id", "text")
    docs = read_documents(sf_dir, cols)
    if plant:
        prep = _plant_host_lines if host_scope else _plant_lines
    else:
        prep = lambda b: b.set_column(  # noqa: E731
            b.schema.get_field_index("text"),
            "text",
            pc.fill_null(b.column("text"), ""),
        )
    docs = docs.map_batches(prep, batch_format="pyarrow")

    def line_hashes(batch: pa.Table, flat, rows) -> np.ndarray:
        """uint64 line key; under host scope the source hash is mixed
        in (Fibonacci multiply + add), so equal lines on different
        hosts get distinct keys."""
        h = hash64_strings(flat)
        if host_scope:
            hs = hash64_strings(batch.column("source"))
            h = h * np.uint64(0x9E3779B97F4A7C15) + hs[rows]
        return h.view(np.int64)

    def df_partial(batch: pa.Table) -> pa.Table:
        rows, flat, _ = _line_arrays(batch)
        h = line_hashes(batch, flat, rows)
        # distinct (h, doc) within the batch == globally distinct
        key = np.unique(np.stack([h, rows], axis=1), axis=0)
        uniq, cnt = np.unique(key[:, 0], return_counts=True)
        return pa.Table.from_pydict(
            {
                "h": pa.array(uniq, pa.int64()),
                "df": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    df_model = (
        docs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("h")
        .sum("df")
    )

    def boiler_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch.column("sum(df)"), min_df))
        return pa.Table.from_pydict({"h": t.column("h")})

    from .dedup import _collect_within_budget

    boiler = df_model.map_batches(boiler_only, batch_format="pyarrow")
    boiler_tbl = _collect_within_budget(boiler, df_broadcast_budget)

    def clean_batch(batch: pa.Table, removed_mask: np.ndarray) -> pa.Table:
        rows, flat, counts = _line_arrays(batch)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        rem_lines = np.bincount(
            rows[removed_mask], minlength=len(counts)
        ).astype(np.int64)
        rem_chars = np.bincount(
            rows[removed_mask], weights=lens[removed_mask],
            minlength=len(counts),
        )
        tot_chars = np.bincount(
            rows, weights=lens, minlength=len(counts)
        )
        kept_mask = ~removed_mask
        kept_counts = counts - rem_lines
        offs = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
        clean = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()),
                flat.filter(pa.array(kept_mask)),
            ),
            "\n",
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(tot_chars > 0, rem_chars / tot_chars, 0.0)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_lines": pa.array(counts.astype(np.int64), pa.int64()),
                "n_removed_lines": pa.array(rem_lines, pa.int64()),
                "kept": pa.array(frac <= drop_frac, pa.bool_()),
                "clean_text": clean,
            }
        )

    if boiler_tbl is not None:
        hs = (
            np.sort(boiler_tbl.column("h").to_numpy(zero_copy_only=False))
            if boiler_tbl.num_rows and "h" in boiler_tbl.column_names
            else np.empty(0, np.int64)
        )
        ref = ray.put(hs)

        def clean_broadcast(batch: pa.Table) -> pa.Table:
            boil = ray.get(ref)
            rows, flat, counts = _line_arrays(batch)
            h = line_hashes(batch, flat, rows)
            if len(boil) and len(h):
                pos = np.minimum(np.searchsorted(boil, h), len(boil) - 1)
                removed = boil[pos] == h
            else:
                removed = np.zeros(len(h), bool)
            return clean_batch(batch, removed)

        return docs.map_batches(clean_broadcast, batch_format="pyarrow")

    # over-budget tier: line rows attach the boilerplate verdict by
    # hash, removed ordinals regroup per doc, one doc-keyed cogroup
    # meets the text (the ExactSubstr fallback shape)
    def line_rows(batch: pa.Table) -> pa.Table:
        rows, flat, counts = _line_arrays(batch)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
        ords = np.arange(len(rows), dtype=np.int64) - offs[rows]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[rows], pa.int64()),
                "ord": pa.array(ords, pa.int64()),
                "h": pa.array(line_hashes(batch, flat, rows), pa.int64()),
            }
        )

    def mark(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "boil", pa.array(np.ones(batch.num_rows, bool))
        )

    attached = cogroup_attach(
        docs.map_batches(line_rows, batch_format="pyarrow"),
        boiler.map_batches(mark, batch_format="pyarrow"),
        "h",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("ord", pa.int64()),
            pa.field("h", pa.int64()),
        ],
        payload_fields=[pa.field("boil", pa.bool_())],
    )

    def removed_rows(batch: pa.Table) -> pa.Table:
        boil = pc.fill_null(batch.column("boil"), False).to_numpy(
            zero_copy_only=False
        )
        t = batch.filter(pa.array(boil))
        return pa.Table.from_pydict(
            {"doc_id": t.column("doc_id"), "ord": t.column("ord")}
        )

    from .joins import default_num_buckets, int_key_buckets

    num_parts = default_num_buckets()

    def add_bucket(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(int_key_buckets(d, num_parts))
        )

    def lists_in_bucket(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        o = group.column("ord").to_numpy(zero_copy_only=False)
        order = np.lexsort((o, d))
        d, o = d[order], o[order]
        first = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        offs = np.concatenate((first, [len(d)])).astype(np.int32)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(d[first], pa.int64()),
                "rm": pa.ListArray.from_arrays(
                    pa.array(offs, pa.int32()), pa.array(o, pa.int64())
                ),
            }
        )

    rm_lists = (
        attached.map_batches(removed_rows, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lists_in_bucket, batch_format="pyarrow")
    )

    with_rm = cogroup_attach(
        docs,
        rm_lists,
        "doc_id",
        left_fields=[
            pa.field("doc_id", pa.int64()),
            pa.field("text", pa.string()),
        ],
        payload_fields=[pa.field("rm", pa.list_(pa.int64()))],
    )

    def clean_joined(batch: pa.Table) -> pa.Table:
        rows, flat, counts = _line_arrays(batch)
        offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
        rm_col = batch.column("rm")
        rm_flat = pc.list_flatten(rm_col).to_numpy(zero_copy_only=False)
        rm_lens = pc.fill_null(
            pc.list_value_length(rm_col), 0
        ).to_numpy(zero_copy_only=False)
        rm_rows = np.repeat(np.arange(len(rm_lens), dtype=np.int64), rm_lens)
        removed = np.zeros(len(rows), bool)
        if len(rm_rows):
            removed[offs[rm_rows] + rm_flat] = True
        return clean_batch(batch, removed)

    return with_rm.map_batches(clean_joined, batch_format="pyarrow")


def domain_split(
    sf_dir: str, val_permille: int = 50, test_permille: int = 50
) -> ray.data.Dataset:
    """Leakage-aware train/val/test assignment: the split key is the
    registrable DOMAIN, not the doc — near-duplicates and templated
    pages cluster within a domain, so splitting by doc would leak eval
    content into training. Deterministic md5 threshold on the domain
    (the hash_sample rule), pure map at any scale. Returns
    (doc_id, domain, split)."""
    from ..kernels.sketch import hash64

    docs = read_documents(sf_dir, ("doc_id", "source"))

    def assign(batch: pa.Table) -> pa.Table:
        v = _verdict_batch(batch)
        dom = v.column("domain").to_pylist()
        hv = hash64(dom) % np.uint64(1000)
        split = np.where(
            hv < test_permille,
            "test",
            np.where(hv < test_permille + val_permille, "val", "train"),
        )
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "domain": v.column("domain"),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow")


def paragraph_dedup(sf_dir: str, plant: bool = True) -> ray.data.Dataset:
    """Within-document paragraph dedup (the Dolma cleaning rule):
    repeated paragraphs inside one doc keep their FIRST occurrence
    only. Unlike ``line_dedup`` this needs no df model and no exchange
    at all — the doc is the scope, so the whole operator is one pure
    vectorized map: (doc_id, n_paras, n_removed, clean_text).

    Planting (mirrored in SQL): docs with ``doc_id % 9 == 4`` get a
    promo paragraph appended 3x; every doc's own text is its first
    paragraph."""
    from ..kernels.sketch import hash64_strings

    docs = read_documents(sf_dir, ("doc_id", "text"))

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        text = pc.fill_null(batch.column("text"), "")
        if plant:
            promo = np.where(
                ids % 9 == 4,
                np.asarray(
                    [
                        "\nrepeated promo paragraph " + str(i % 5)
                        for i in ids
                    ],
                    object,
                ),
                "",
            ).astype(object)
            text = pc.binary_join_element_wise(
                text,
                pa.array((promo * 3).tolist(), pa.string()),
                "",
            )
        tbl = pa.Table.from_pydict({"doc_id": batch.column("doc_id"),
                                    "text": text})
        rows, flat, counts = _line_arrays(tbl)
        h = hash64_strings(flat).view(np.int64)
        # first occurrence per (doc, paragraph): np.unique returns the
        # first flat index of each distinct pair
        _, first_idx = np.unique(
            np.stack([rows, h], axis=1), axis=0, return_index=True
        )
        keep = np.zeros(len(rows), bool)
        keep[first_idx] = True
        kept_counts = np.bincount(
            rows[keep], minlength=len(counts)
        ).astype(np.int64)
        offs = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
        clean = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), flat.filter(pa.array(keep))
            ),
            "\n",
        )
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_paras": pa.array(counts.astype(np.int64), pa.int64()),
                "n_removed": pa.array(
                    counts.astype(np.int64) - kept_counts, pa.int64()
                ),
                "clean_text": clean,
            }
        )

    return docs.map_batches(f, batch_format="pyarrow")
