"""Serial single-process oracle: the same kernels, no Ray.

Byte-identical ``extracted_text`` per url is the correctness contract
(BASELINE.json north_rule); the oracle defines the expected bytes and
the pipeline tests assert exact equality against it.
"""

from __future__ import annotations

import pyarrow as pa

from high_performance_docling_ray.kernels.document import extract_document


def oracle_extract(pages_table: pa.Table) -> dict[str, dict]:
    """pages table -> {url: result} with exact dedup (keep earliest
    warc_ts per url) applied serially."""
    rows = pages_table.to_pylist()
    best: dict[str, dict] = {}
    for row in rows:
        cur = best.get(row["url"])
        if cur is None or row["warc_ts"] < cur["warc_ts"]:
            best[row["url"]] = row
    out: dict[str, dict] = {}
    for url, row in best.items():
        res = extract_document(row["html"])
        res["warc_ts"] = row["warc_ts"]
        out[url] = res
    return out
