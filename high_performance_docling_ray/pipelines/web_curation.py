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
