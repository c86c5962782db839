"""Head-section metadata family (pipelines/page_meta.py) and mojibake
repair (text_analysis.py:fix_mojibake) — driver-gate hash evidence
exists at sf0.001/sf0.01; these pins cover null semantics, breadcrumb
state, sitemap framing, and the repair round-trip.
"""

import sys

import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from high_performance_docling_ray.pipelines.page_meta import (  # noqa: E402
    html_outline,
    page_metadata,
    sitemap_urls,
)
from high_performance_docling_ray.pipelines.text_analysis import (  # noqa: E402
    fix_mojibake,
)

SF = "/root/testdata/sf0.001"


def _n_docs() -> int:
    return pq.read_metadata(f"{SF}/documents.parquet").num_rows


def test_page_metadata_fields_and_nulls():
    out = page_metadata(SF).to_pandas().set_index("url")
    assert len(out) == _n_docs()
    r = out.loc["https://site1.example/d/1"]
    # doc 1: %3=1 -> description, %4=1 -> canonical, %5=1 -> no og
    assert r["title"] == "Title 1"
    assert r["description"] == "Summary of doc 1"
    assert r["canonical"] == "https://canon.example/c/1"
    assert r["og_title"] is None
    assert not r["noindex"]
    # doc 0: %3=0 -> NO description (null, not ""), %5=0 -> og present
    r0 = out.loc["https://site0.example/d/0"]
    assert r0["description"] is None
    assert r0["og_title"] == "OG 0"
    # doc 7: %11==7 -> noindex
    assert bool(out.loc["https://site2.example/d/7"]["noindex"])
    # the decoy keywords meta never leaks into any extracted field
    assert not out["title"].str.contains("synthetic").any()


def test_html_outline_breadcrumbs_close_deeper_levels():
    out = html_outline(SF).to_pandas()
    # doc 5: n_h2 = 1 + 5%3 = 3; h3 counts per j: (5+j)%3 = 0,1,2
    d = (
        out[out["url"] == "https://site0.example/d/5"]
        .sort_values("ord")
        .reset_index(drop=True)
    )
    assert d["heading"].tolist() == [
        "Doc 5", "S1", "S2", "S2.1", "S3", "S3.1", "S3.2",
    ]
    assert d["path"].tolist() == [
        "Doc 5",
        "Doc 5 > S1",
        "Doc 5 > S2",
        "Doc 5 > S2 > S2.1",
        "Doc 5 > S3",
        "Doc 5 > S3 > S3.1",
        "Doc 5 > S3 > S3.2",  # a new h3 REPLACES the previous crumb
    ]
    assert d["ord"].tolist() == list(range(1, 8))


def test_sitemap_urls_only_sitemap_docs_emit():
    out = sitemap_urls(SF).to_pandas()
    n_sitemaps = sum(1 for i in range(_n_docs()) if i % 10 == 0)
    assert len(out) == 5 * n_sitemaps
    d = (
        out[out["sitemap_url"] == "https://site0.example/sitemap10.xml"]
        .sort_values("ord")
        .reset_index(drop=True)
    )
    assert d["loc"].tolist() == [
        f"https://site0.example/d/{10 + i}" for i in range(1, 6)
    ]
    assert d["lastmod"].tolist() == [
        f"2024-01-{1 + (10 + i) % 28:02d}" for i in range(1, 6)
    ]
    assert d["priority"].tolist() == [0.1, 0.2, 0.3, 0.4, 0.5]


def test_fix_mojibake_roundtrip_and_passthrough():
    out = fix_mojibake(SF).to_pandas().set_index("doc_id")
    assert len(out) == _n_docs()
    assert out["was_mojibake"].equals(out.index.to_series() % 6 == 2)
    fixed = out.loc[2, "text_fixed"]
    assert fixed.startswith("café — naïve résumé: ")
    assert "Ã" not in fixed
    # untouched docs pass through byte-identical
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().set_index("doc_id")
    assert out.loc[3, "text_fixed"] == docs.loc[3, "text"]


def test_fix_mojibake_keeps_legit_marker_strings():
    # a string that CONTAINS the marker but is not valid mojibake must
    # survive verbatim (strict decode fails -> keep)
    s = "price Ã 100"  # 0xC3 0x20 is not valid UTF-8
    try:
        s.encode("latin-1").decode("utf-8")
        assert False, "expected invalid utf-8"
    except UnicodeDecodeError:
        pass


def test_layout_table_rowspan_carries_into_next_row():
    from high_performance_docling_ray.pipelines.page_meta import (
        _layout_table,
    )

    rows = [
        "<th>C0</th><th>C1</th><th>C2</th>",
        '<td colspan="2">a</td><td>b</td>',
        '<td rowspan="2">c</td><td>d</td><td>e</td>',
        "<td>f</td><td>g</td>",
    ]
    cells = _layout_table(rows)
    # colspan shifts the sibling right
    assert (1, 0, 1, 2, False, "a") in cells
    assert (1, 2, 1, 1, False, "b") in cells
    # the open rowspan occupies col 0 of the NEXT row (regression: the
    # occupancy map must not age out in the row that created it)
    assert (3, 1, 1, 1, False, "f") in cells
    assert (3, 2, 1, 1, False, "g") in cells


def test_layout_table_rowspan_three_and_nested_spans():
    from high_performance_docling_ray.pipelines.page_meta import (
        _layout_table,
    )

    rows = [
        '<td rowspan="3">a</td><td>b</td>',
        "<td>c</td>",
        "<td>d</td>",
        "<td>e</td><td>f</td>",
    ]
    cells = _layout_table(rows)
    assert (1, 1, 1, 1, False, "c") in cells
    assert (2, 1, 1, 1, False, "d") in cells
    # row 3: the rowspan has expired, col 0 is free again
    assert (3, 0, 1, 1, False, "e") in cells


def test_html_tables_grid_for_doc_100():
    from high_performance_docling_ray.pipelines.page_meta import html_tables

    out = html_tables(SF).to_pandas()
    # doc 100: ncols=2, nr=3, colspan (100%5==0) AND rowspan (100%7==2)
    d = out[out["url"] == "https://site0.example/d/100"]
    d = d.sort_values(["row", "col"]).reset_index(drop=True)
    got = list(
        zip(d["row"], d["col"], d["rowspan"], d["colspan"], d["text"])
    )
    assert got == [
        (0, 0, 1, 1, "C0"), (0, 1, 1, 1, "C1"),
        (1, 0, 1, 2, "v100.1.0"),          # colspan row: one td only
        (2, 0, 2, 1, "v100.2.0"), (2, 1, 1, 1, "v100.2.1"),
        (3, 1, 1, 1, "v100.3.0"),          # col 0 held by the rowspan
    ]


def test_capture_change_rate_closed_form():
    from high_performance_docling_ray.pipelines.page_meta import (
        capture_change_rate,
    )

    out = capture_change_rate(SF).to_pandas().set_index("url")
    assert len(out) == _n_docs()

    def expected(doc_id):
        n = 1 + doc_id % 4
        ch = sum(1 for k in range(1, n) if (doc_id + k) % 3 == 0)
        return n, ch

    for doc_id in (0, 1, 2, 3, 7, 11):
        n, ch = expected(doc_id)
        r = out.loc[f"https://site{doc_id % 5}.example/d/{doc_id}"]
        assert r["n_captures"] == n
        assert r["n_changes"] == ch
        if n == 1:
            assert r["change_rate"] != r["change_rate"]  # NaN
        else:
            assert abs(r["change_rate"] - ch / (n - 1)) < 1e-12


def test_canonical_collapse_keeps_earliest_per_group():
    from high_performance_docling_ray.pipelines.page_meta import (
        canonical_collapse,
    )

    out = canonical_collapse(SF).to_pandas()
    n = _n_docs()
    canon_docs = [i for i in range(n) if i % 4 == 1]
    groups = {}
    for i in canon_docs:
        groups.setdefault(i % 50, []).append(i)
    # every canonical group keeps exactly its min member
    for target, members in groups.items():
        key = f"https://canon.example/c/{target}"
        kept = out[out["collapse_key"] == key]
        assert len(kept) == 1
        w = min(members)
        assert kept.iloc[0]["url"] == f"https://site{w % 5}.example/d/{w}"
        assert kept.iloc[0]["n_members"] == len(members)
    # non-canonical docs all survive with group size 1
    solo = out[out["n_members"] == 1]
    assert len(solo) == n - len(canon_docs)
    assert len(out) == n - len(canon_docs) + len(groups)


def test_sitemap_frontier_anti_join_outcomes():
    from high_performance_docling_ray.pipelines.page_meta import (
        sitemap_frontier,
    )

    out = sitemap_frontier(SF).to_pandas()
    n = _n_docs()
    sitemap_docs = [i for i in range(n) if i % 10 == 0]
    # i in 1..4 always uncrawled (host mismatch); i == 5 crawled iff
    # the target doc exists
    expected = sum(
        4 + (0 if d + 5 < n else 1) for d in sitemap_docs
    )
    assert len(out) == expected
    # doc 0's sitemap: locs for 1..4 present, 5 absent (crawled)
    locs = set(out["loc"])
    for i in range(1, 5):
        assert f"https://site0.example/d/{i}" in locs
    assert "https://site0.example/d/5" not in locs


def test_html_structure_groups_accounting():
    from high_performance_docling_ray.pipelines.page_meta import (
        html_structure_groups,
    )

    out = html_structure_groups(SF).to_pandas()
    assert out["n_pages"].sum() == _n_docs()
    # structure is determined by the 4 planted presence flags
    import hashlib

    def key(i):
        s = "html,head,title,meta"
        if i % 3 != 0:
            s += ",meta"
        if i % 4 == 1:
            s += ",link"
        if i % 5 in (0, 2):
            s += ",meta"
        if i % 11 == 7:
            s += ",meta"
        return hashlib.md5((s + ",body,p").encode()).hexdigest()

    expected = {}
    for i in range(_n_docs()):
        expected[key(i)] = expected.get(key(i), 0) + 1
    got = dict(zip(out["structure_md5"], out["n_pages"]))
    assert got == expected


def test_index_export_policy_then_collapse():
    from high_performance_docling_ray.pipelines.page_meta import index_export

    out = index_export(SF).to_pandas()
    n = _n_docs()
    ids = out["url"].str.extract(r"(\d+)$")[0].astype(int)
    # no noindex page survives
    assert not (ids % 11 == 7).any()
    # a noindex group-minimum cedes the win to the next member:
    # group c/{7}: members 7, 57, 107, ... — doc 7 is noindex
    g7 = out[out["collapse_key"] == "https://canon.example/c/7"]
    if len(g7):
        w = int(g7.iloc[0]["url"].rsplit("/", 1)[1])
        assert w != 7 and w % 4 == 1 and w % 50 == 7
    # extracted text is the real extraction output (normalized body)
    assert (out["title"] == "Title " + ids.astype(str)).all()
    assert out["extracted_text"].notna().all()
    assert len(out) < n
