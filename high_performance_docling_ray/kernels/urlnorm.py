"""URL canonicalization for corpus dedup keys.

Common-Crawl-style corpora carry near-duplicate urls that differ only
in scheme case, host case, default ports, fragments, trailing slashes
or tracking parameters. Exact url dedup treats those as distinct
documents; canonicalizing first collapses them. Pure stdlib
(urllib.parse), deterministic, and ORDER-INSENSITIVE for query params
(sorted), so it is safe as a shuffle/broadcast key.

This is a corpus-level op beyond the reference (which has no url
handling); semantics follow the common normalizations of RFC 3986 §6.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

# Query parameters that never affect content (tracking).
TRACKING_PARAMS = frozenset(
    {
        "utm_source", "utm_medium", "utm_campaign", "utm_term",
        "utm_content", "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid",
    }
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def normalize_url(url: str | None, *, strip_tracking: bool = True) -> str | None:
    """Canonical form of a url; None and unparseable values pass through.

    Applied: lowercase scheme+host, drop default port, drop fragment,
    sort query params (dropping tracking params), collapse an empty
    path to "/", strip a single trailing slash from non-root paths.
    """
    if url is None:
        return None
    try:
        parts = urlsplit(url.strip())
        if not parts.scheme or not parts.netloc:
            return url
        host = parts.hostname.lower() if parts.hostname else ""
        port = parts.port  # property: raises on malformed/out-of-range
    except ValueError:
        # malformed authority (bad port etc.): pass through untouched
        return url

    scheme = parts.scheme.lower()
    if ":" in host:  # IPv6 literal: brackets are part of the syntax
        host = f"[{host}]"
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username
        if parts.password:
            cred += f":{parts.password}"
        netloc = f"{cred}@{netloc}"

    path = parts.path or "/"
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]

    pairs = parse_qsl(parts.query, keep_blank_values=True)
    if strip_tracking:
        pairs = [(k, v) for k, v in pairs if k.lower() not in TRACKING_PARAMS]
    query = urlencode(sorted(pairs))

    return urlunsplit((scheme, netloc, path, query, ""))


def normalize_url_column(urls: list[str | None]) -> list[str | None]:
    """Batch helper for map_batches bodies."""
    return [normalize_url(u) for u in urls]
