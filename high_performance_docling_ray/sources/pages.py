"""Deterministic synthetic web-page corpus (BASELINE.json input shape).

Schema: ``url:string, warc_ts:timestamp[us], html:binary,
text:string, lang:string`` — Common-Crawl-style pages.

Two payload classes, sniffed by magic bytes exactly like the
reference sniffs formats (`/root/reference/base_models.py:88-124`):

* HTML payloads — nested markup with nav/footer boilerplate, link
  farms, headings/paragraphs/lists/tables, hyphen-split line breaks and
  unicode punctuation, exercising the boilerplate-strip + sanitize
  kernels.
* ``%SYNTHPDF`` payloads — a deterministic JSON stand-in for parsed PDF
  pages (docling ``SegmentedPdfPage`` shape: line cells + word cells
  with rects, FIXTURES.md §2) plus embedded synthetic detector outputs
  (raw layout clusters / OTSL table predictions, FIXTURES.md §3-4) that
  the stub layout/table "models" return, so the full postprocess ->
  table-match -> assemble -> reading-order path runs deterministically
  without torch weights.

Everything derives from (seed, doc ordinal): generation is
embarrassingly parallel and reproducible shard-by-shard, so the bench
corpus is generated *inside Ray tasks* rather than on the driver.
"""

from __future__ import annotations

import json
import random

import numpy as np
import pyarrow as pa

PDF_MAGIC = b"%SYNTHPDF"

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

_WORDS = (
    "stream data layout table cell page document cluster batch arrow "
    "ray shuffle block actor parquet column vector index merge sort "
    "filter group join window hash scan query plan spill object store "
    "schema partition replica lineage manifest checkpoint throughput"
).split()

_LANGS = ("en", "en", "en", "de", "fr", "es", "und")

# epoch micros for 2024-01-01; warc_ts increments deterministically.
_TS0 = 1_704_067_200_000_000


def _sentence(rng: random.Random, lo: int = 5, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    words = [rng.choice(_WORDS) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + rng.choice([".", ".", ".", "!", "?"])


def _paragraph(rng: random.Random, n_sent: int | None = None) -> str:
    n = n_sent or rng.randint(2, 5)
    return " ".join(_sentence(rng) for _ in range(n))


def _hyphen_split(rng: random.Random, text: str) -> list[str]:
    """Split a paragraph into 'lines', sometimes hyphen-breaking a word
    mid-line to exercise the de-hyphenation kernel."""
    words = text.split(" ")
    lines: list[str] = []
    cur: list[str] = []
    for w in words:
        cur.append(w)
        if len(cur) >= rng.randint(5, 9):
            line = " ".join(cur)
            if rng.random() < 0.25 and len(w) > 6 and w[-1].isalnum():
                cut = len(w) // 2
                line = " ".join(cur[:-1] + [w[:cut] + "-"])
                lines.append(line)
                cur = [w[cut:]]
            else:
                lines.append(line)
                cur = []
    if cur:
        lines.append(" ".join(cur))
    return lines


_UNICODE_SPICE = ("’", "‘", "“", "”", "•", "⁄", "\x02")


def _spice(rng: random.Random, text: str) -> str:
    """Sprinkle unicode punctuation the sanitize kernel must normalize."""
    if rng.random() < 0.4:
        ch = rng.choice(_UNICODE_SPICE)
        pos = rng.randint(0, max(0, len(text) - 1))
        text = text[:pos] + ch + text[pos:]
    return text


# --------------------------------------------------------------------------
# HTML documents
# --------------------------------------------------------------------------

def generate_html(rng: random.Random, size_class: str) -> str:
    """One synthetic page: boilerplate nav/header/footer + main content."""
    n_sections = {"small": 1, "medium": 4, "giant": 24}[size_class]
    nav_links = "".join(
        f'<a href="/{rng.choice(_WORDS)}">{rng.choice(_WORDS)}</a> '
        for _ in range(rng.randint(4, 10))
    )
    parts = [
        "<html><head><title>t</title><style>.x{color:red}</style>",
        "<script>var x=1;</script></head><body>",
        f"<nav><ul><li>{nav_links}</li></ul></nav>",
        f'<header><div>{_sentence(rng, 3, 6)} <a href="/l">home</a> '
        f'<a href="/m">about</a></div></header>',
        "<main>",
    ]
    for _ in range(n_sections):
        parts.append(f"<h2>{_spice(rng, _sentence(rng, 3, 7))}</h2>")
        for _ in range(rng.randint(1, 3)):
            lines = _hyphen_split(rng, _paragraph(rng))
            body = "<br>".join(_spice(rng, ln) for ln in lines)
            parts.append(f"<p>{body}</p>")
        if rng.random() < 0.4:
            items = "".join(
                f"<li>{_sentence(rng, 3, 7)}</li>" for _ in range(rng.randint(2, 5))
            )
            parts.append(f"<ul>{items}</ul>")
        if rng.random() < 0.25:
            rows = []
            ncol = rng.randint(2, 4)
            rows.append(
                "<tr>" + "".join(f"<th>{rng.choice(_WORDS)}</th>" for _ in range(ncol)) + "</tr>"
            )
            for _ in range(rng.randint(1, 4)):
                rows.append(
                    "<tr>"
                    + "".join(
                        f"<td>{rng.choice(_WORDS)} {rng.randint(0, 99)}</td>"
                        for _ in range(ncol)
                    )
                    + "</tr>"
                )
            parts.append("<table>" + "".join(rows) + "</table>")
        if rng.random() < 0.2:
            # link farm inside content: must be pruned by link density
            farm = " ".join(
                f'<a href="/{w}">{w}</a>' for w in rng.sample(_WORDS, 8)
            )
            parts.append(f"<div>{farm}</div>")
    parts.append("</main>")
    parts.append(
        f"<footer><div>© example {_sentence(rng, 2, 4)} "
        + " ".join(f'<a href="/f{i}">{rng.choice(_WORDS)}</a>' for i in range(5))
        + "</div></footer></body></html>"
    )
    return "".join(parts)


# --------------------------------------------------------------------------
# Synthetic "PDF" documents (parsed-page JSON payloads)
# --------------------------------------------------------------------------

_LAYOUT_LABELS = (
    "text", "section_header", "list_item", "caption", "footnote",
    "page_header", "page_footer", "picture", "table", "title", "code",
    "formula", "key_value_region",
)


def _make_page(rng: random.Random, page_no: int) -> dict:
    """One synthetic parsed page: a column of text blocks laid out on a
    612x792 page, detector clusters aligned to blocks (with fixture
    noise: low-confidence dups, overlapping pairs, orphans, titles)."""
    width, height = 612.0, 792.0
    cells: list[dict] = []
    words: list[dict] = []
    clusters: list[dict] = []
    tables: list[dict] = []
    y = 40.0
    cell_index = 0
    word_id = 0
    cluster_id = 0

    def add_block(block_lines: list[str], label: str, conf: float) -> dict:
        nonlocal y, cell_index, word_id, cluster_id
        top = y
        block_cells = []
        for ln in block_lines:
            x = 72.0
            line_words = ln.split(" ")
            wboxes = []
            for w in line_words:
                ww = 6.0 * max(1, len(w))
                words.append(
                    {
                        "index": word_id,
                        "text": w,
                        "l": x, "t": y, "r": x + ww, "b": y + 11.0,
                        "from_ocr": False, "confidence": 1.0,
                    }
                )
                wboxes.append((x, y, x + ww, y + 11.0))
                word_id += 1
                x += ww + 4.0
            cells.append(
                {
                    "index": cell_index,
                    "text": ln,
                    "l": 72.0, "t": y, "r": x - 4.0, "b": y + 11.0,
                    "from_ocr": False, "confidence": 1.0,
                }
            )
            block_cells.append(cells[-1])
            cell_index += 1
            y += 14.0
        bbox = (
            min(c["l"] for c in block_cells) - 1.0,
            top - 1.0,
            max(c["r"] for c in block_cells) + 1.0,
            y - 3.0 + 1.0,
        )
        cl = {
            "id": cluster_id,
            "label": label,
            "l": bbox[0], "t": bbox[1], "r": bbox[2], "b": bbox[3],
            "confidence": conf,
        }
        clusters.append(cl)
        cluster_id += 1
        y += 8.0
        return cl

    # page header (furniture)
    add_block([f"Synth Report — page {page_no + 1}"], "page_header", 0.9)

    # title on first page: exercises TITLE -> SECTION_HEADER remap
    if page_no == 0:
        add_block([_sentence(rng, 3, 6)], "title", 0.85)

    n_blocks = rng.randint(3, 6)
    for b in range(n_blocks):
        kind = rng.random()
        if kind < 0.15:
            add_block([_sentence(rng, 3, 7)], "section_header", 0.8)
        elif kind < 0.3:
            for _ in range(rng.randint(2, 4)):
                add_block(["- " + _sentence(rng, 3, 6)], "list_item", 0.75)
        else:
            para = _paragraph(rng, rng.randint(2, 4))
            lines = _hyphen_split(rng, para)
            lines = [_spice(rng, ln) for ln in lines]
            cl = add_block(lines, "text", round(0.55 + 0.4 * rng.random(), 3))
            # fixture: duplicate low-confidence cluster (threshold filter)
            if rng.random() < 0.2:
                clusters.append(
                    {
                        "id": cluster_id,
                        "label": "text",
                        "l": cl["l"] + 2, "t": cl["t"] + 2,
                        "r": cl["r"] - 2, "b": cl["b"] - 2,
                        "confidence": 0.2,
                    }
                )
                cluster_id += 1
            # fixture: overlapping near-identical cluster (must merge)
            if rng.random() < 0.2:
                clusters.append(
                    {
                        "id": cluster_id,
                        "label": "text",
                        "l": cl["l"] + 1.0, "t": cl["t"] + 1.0,
                        "r": cl["r"] + 1.0, "b": cl["b"] + 1.0,
                        "confidence": 0.6,
                    }
                )
                cluster_id += 1

    # fixture: picture region with a caption beneath it (figure path
    # M25 + caption attachment J7). Pictures are special-class
    # clusters with no cells; the caption is a text block the reading
    # order must map to the figure.
    if rng.random() < 0.35:
        pic_top = y
        clusters.append(
            {
                "id": cluster_id,
                "label": "picture",
                "l": 72.0, "t": pic_top, "r": 300.0, "b": pic_top + 80.0,
                "confidence": 0.85,
            }
        )
        cluster_id += 1
        y = pic_top + 84.0
        add_block(
            [f"Figure {page_no + 1}: " + _sentence(rng, 3, 6)], "caption", 0.8
        )

    # fixture: empty text cluster over a blank region — dropped by the
    # empty filter in the default config, an OCR task when do_ocr=True
    if rng.random() < 0.3:
        clusters.append(
            {
                "id": cluster_id,
                "label": "text",
                "l": 420.0, "t": 60.0, "r": 560.0, "b": 90.0,
                "confidence": 0.8,
            }
        )
        cluster_id += 1

    # orphan cell: text with no covering cluster (orphan promotion)
    if rng.random() < 0.5:
        cells.append(
            {
                "index": cell_index,
                "text": "Orphan note " + str(rng.randint(0, 9)),
                "l": 380.0, "t": y, "r": 520.0, "b": y + 11.0,
                "from_ocr": False, "confidence": 1.0,
            }
        )
        cell_index += 1
        y += 20.0

    # a table block with OTSL structure prediction
    if rng.random() < 0.6:
        ncols = rng.randint(2, 4)
        nrows = rng.randint(2, 4)
        tab_top = y
        otsl: list[str] = []
        bboxes: list[list[float]] = []
        for r in range(nrows):
            x = 72.0
            for c in range(ncols):
                # occasional horizontal span on a non-header row
                span_here = r > 0 and c == 1 and ncols >= 3 and rng.random() < 0.3
                tag = "ched" if r == 0 else ("fcel" if rng.random() > 0.1 else "ecel")
                cw = 90.0
                if span_here:
                    otsl.append("lcel")
                    x += cw
                    continue
                otsl.append(tag)
                bboxes.append([x, y, x + cw - 6.0, y + 12.0])
                if tag != "ecel":
                    word = rng.choice(_WORDS) if r > 0 else f"col{c}"
                    ww = 6.0 * len(word)
                    words.append(
                        {
                            "index": word_id,
                            "text": word,
                            "l": x + 2.0, "t": y + 1.0,
                            "r": x + 2.0 + ww, "b": y + 11.0,
                            "from_ocr": False, "confidence": 1.0,
                        }
                    )
                    cells.append(
                        {
                            "index": cell_index,
                            "text": word,
                            "l": x + 2.0, "t": y + 1.0,
                            "r": x + 2.0 + ww, "b": y + 11.0,
                            "from_ocr": False, "confidence": 1.0,
                        }
                    )
                    cell_index += 1
                    word_id += 1
                x += cw
            otsl.append("nl")
            y += 16.0
        tab_bbox = (66.0, tab_top - 2.0, 72.0 + ncols * 90.0, y - 4.0 + 2.0)
        clusters.append(
            {
                "id": cluster_id,
                "label": "table",
                "l": tab_bbox[0], "t": tab_bbox[1],
                "r": tab_bbox[2], "b": tab_bbox[3],
                "confidence": 0.9,
            }
        )
        # fixture: occasional bbox/tag desync (extra bbox)
        if rng.random() < 0.15:
            bboxes.append([0.0, 0.0, 1.0, 1.0])
        tables.append(
            {"cluster_id": cluster_id, "otsl_seq": otsl, "cell_bboxes": bboxes}
        )
        cluster_id += 1
        y += 10.0

    # page footer
    add_block([f"{page_no + 1} / synth"], "page_footer", 0.9)

    return {
        "page_no": page_no,
        "width": width,
        "height": height,
        "cells": cells,
        "words": words,
        "raw_clusters": clusters,
        "raw_tables": tables,
    }


def generate_pdf_payload(rng: random.Random, size_class: str) -> bytes:
    n_pages = {"small": 1, "medium": rng.randint(2, 4), "giant": rng.randint(12, 24)}[
        size_class
    ]
    pages = [_make_page(rng, p) for p in range(n_pages)]
    return PDF_MAGIC + json.dumps({"pages": pages}).encode("utf-8")


# --------------------------------------------------------------------------
# Corpus assembly
# --------------------------------------------------------------------------

def _size_class(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.90:
        return "small"
    if r < 0.99:
        return "medium"
    return "giant"


def generate_doc(seed: int, ordinal: int) -> dict:
    """One corpus row, a pure function of (seed, ordinal)."""
    rng = random.Random((seed << 20) ^ ordinal)
    size_class = _size_class(rng)
    is_pdf = rng.random() < 0.3
    if is_pdf:
        payload = generate_pdf_payload(rng, size_class)
        raw_text = ""
        url = f"https://synth.example/{seed}/pdf/{ordinal}"
    else:
        html = generate_html(rng, size_class)
        payload = html.encode("utf-8")
        raw_text = html  # noisy raw dump, NOT the expected output
        url = f"https://synth.example/{seed}/page/{ordinal}"
    return {
        "url": url,
        "warc_ts": _TS0 + ordinal * 1_000_000,
        "html": payload,
        "text": raw_text[:2000],
        "lang": rng.choice(_LANGS),
    }


def generate_rows(seed: int, start: int, count: int, dup_fraction: float = 0.05) -> list[dict]:
    """Rows [start, start+count); a controlled fraction are duplicate
    urls of earlier ordinals with later warc_ts (dedup fixture)."""
    rows = []
    for i in range(start, start + count):
        rng = random.Random((seed << 40) ^ i)
        if i > 0 and rng.random() < dup_fraction:
            target = rng.randint(0, i - 1)
            row = generate_doc(seed, target)
            row = dict(row)
            row["warc_ts"] = _TS0 + i * 1_000_000  # later capture of same url
            rows.append(row)
        else:
            rows.append(generate_doc(seed, i))
    return rows


def rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def synth_pages_table(n_docs: int, seed: int = 42, dup_fraction: float = 0.05) -> pa.Table:
    """Small corpora for tests (driver-side)."""
    return rows_to_table(generate_rows(seed, 0, n_docs, dup_fraction))


def synth_pages_dataset(n_docs: int, seed: int = 42, dup_fraction: float = 0.05,
                        rows_per_block: int = 512):
    """Distributed corpus generation: ray.data.range -> map_batches so
    blocks are generated in parallel on workers (no driver bottleneck)."""
    import ray.data

    def gen(batch):
        ordinals = batch["id"].to_pylist() if hasattr(batch["id"], "to_pylist") else list(batch["id"])
        rows = []
        for i in ordinals:
            rng = random.Random((seed << 40) ^ int(i))
            if i > 0 and rng.random() < dup_fraction:
                target = rng.randint(0, int(i) - 1)
                row = dict(generate_doc(seed, target))
                row["warc_ts"] = _TS0 + int(i) * 1_000_000
            else:
                row = generate_doc(seed, int(i))
            rows.append(row)
        return rows_to_table(rows)

    n_blocks = max(1, n_docs // rows_per_block)
    return ray.data.range(n_docs, override_num_blocks=n_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=rows_per_block
    )


def pdf_pages_from_documents(
    sf_dir: str,
    words_per_line: int = 12,
    blocks_per_page: int = 2,
    ocr_region: bool = False,
    table_block: bool = False,
    enrich_blocks: bool = False,
    ocr_cells: bool = False,
    list_blocks: bool = False,
    figure_block: bool = False,
):
    """Derive a %SYNTHPDF pages table from the driver's ``documents``
    parquet with a CLOSED-FORM structure (no RNG): the document's
    whitespace tokens chunk into lines of ``words_per_line``, one line
    per text block, ``blocks_per_page`` blocks per page, plus a TITLE
    block ("Doc <id>", exercising the TITLE->SECTION_HEADER remap) and
    page header/footer furniture. The full layout path (detector
    clusters -> assignment -> postprocess -> reading order) then
    reproduces ``'Doc <id>\\n' + '\\n'.join(line chunks)`` exactly, so
    the extract_pdf_docs query gets a DuckDB oracle over the SAME
    tables that verify the HTML path."""
    import ray.data

    def to_pdf_pages(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text, lang in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
            batch.column("lang").to_pylist(),
        ):
            words = text.split()
            lines = [
                " ".join(words[i : i + words_per_line])
                for i in range(0, len(words), words_per_line)
            ]
            blocks = [("title", f"Doc {doc_id}")]
            blocks += [("text", ln) for ln in lines]
            pages = []
            per_page = blocks_per_page
            # title rides on page 0 in addition to its content blocks
            content = blocks[1:]
            n_pages = max(1, -(-len(content) // per_page))
            for p in range(n_pages):
                page_blocks = content[p * per_page : (p + 1) * per_page]
                if p == 0:
                    page_blocks = [blocks[0]] + page_blocks
                cells, clusters = [], []
                y = 40.0
                cell_index = 0
                cluster_id = 0

                def add(label, line, conf):
                    nonlocal y, cell_index, cluster_id
                    w = 6.0 * max(1, len(line))
                    # ocr_cells: closed-form from_ocr metadata so the
                    # page ocr_score (mean from_ocr cell confidence) is
                    # SQL-reproducible — geometry/text untouched, so
                    # every other pipeline output is unchanged
                    mark = ocr_cells and (int(doc_id) + cell_index) % 3 == 0
                    cconf = (
                        0.55 + ((int(doc_id) + cell_index) % 45) / 100.0
                        if mark
                        else 1.0
                    )
                    cells.append(
                        {
                            "index": cell_index,
                            "text": line,
                            "l": 72.0, "t": y, "r": 72.0 + w, "b": y + 11.0,
                            "from_ocr": mark, "confidence": cconf,
                        }
                    )
                    clusters.append(
                        {
                            "id": cluster_id,
                            "label": label,
                            "l": 71.0, "t": y - 1.0,
                            "r": 73.0 + w, "b": y + 12.0,
                            "confidence": conf,
                        }
                    )
                    cell_index += 1
                    cluster_id += 1
                    y += 22.0

                add("page_header", f"Doc {doc_id} — page {p + 1}", 0.9)
                for label, line in page_blocks:
                    add(label, line, 0.9)
                if ocr_region:
                    # deterministic empty-text region: an OCR task when
                    # do_ocr=True (fixed bbox, cluster id = next)
                    clusters.append(
                        {
                            "id": cluster_id,
                            "label": "text",
                            "l": 420.0, "t": 60.0, "r": 560.0, "b": 90.0,
                            "confidence": 0.8,
                        }
                    )
                    cluster_id += 1
                if figure_block and p == 0:
                    # closed-form figure fixture (M25 + J7): a picture
                    # cluster in the fixed empty top-right corner with
                    # a caption block directly beneath it — the figure
                    # crop row (geometry + attached caption) is then a
                    # closed form of doc_id alone
                    clusters.append(
                        {
                            "id": cluster_id,
                            "label": "picture",
                            "l": 420.0, "t": 8.0, "r": 560.0, "b": 28.0,
                            "confidence": 0.9,
                        }
                    )
                    cluster_id += 1
                    cap = f"Figure: doc {doc_id}"
                    capw = 6.0 * len(cap)
                    cells.append(
                        {
                            "index": cell_index,
                            "text": cap,
                            "l": 420.0, "t": 30.0,
                            "r": 420.0 + capw, "b": 41.0,
                            "from_ocr": False, "confidence": 1.0,
                        }
                    )
                    clusters.append(
                        {
                            "id": cluster_id,
                            "label": "caption",
                            "l": 419.0, "t": 29.0,
                            "r": 421.0 + capw, "b": 42.0,
                            "confidence": 0.9,
                        }
                    )
                    cell_index += 1
                    cluster_id += 1
                if list_blocks and p == 0:
                    # closed-form marker-bearing list items: one bullet,
                    # one numbered, one paren-letter — the
                    # ListItemMarkerProcessor pass (M24) must strip the
                    # markers and flag enumeration, SQL-reproducibly
                    did = int(doc_id)
                    add("list_item", f"- alpha point {did}", 0.9)
                    add("list_item", f"{did % 9 + 1}. beta point {did}", 0.9)
                    add(
                        "list_item",
                        f"({chr(97 + did % 26)}) gamma point {did}",
                        0.9,
                    )
                if enrich_blocks and p == 0:
                    # deterministic code + formula blocks: with
                    # do_code_enrichment the stub predictor's visible
                    # effects (tag split for code, \mathrm head for
                    # formula) are closed-form from these texts
                    add("code", f"def f{doc_id}(): return {doc_id}", 0.8)
                    add("formula", f"x{doc_id} = y + {doc_id}", 0.8)
                raw_tables = []
                words_list: list[dict] = []
                if table_block and p == 0 and len(words) >= 4:
                    # deterministic 2x2 table from the doc's first four
                    # tokens: OTSL structure + word index tokens feed the
                    # full build_table -> 9-step matching chain, with a
                    # closed-form grid render (w1 TAB w2 NL w3 TAB w4)
                    ty = y + 8.0
                    otsl: list[str] = []
                    bboxes: list[list[float]] = []
                    wid = 0
                    for r2 in range(2):
                        x = 72.0
                        for c2 in range(2):
                            otsl.append("ched" if r2 == 0 else "fcel")
                            bboxes.append([x, ty, x + 84.0, ty + 12.0])
                            word = words[r2 * 2 + c2]
                            ww = 6.0 * len(word)
                            words_list.append(
                                {
                                    "index": wid,
                                    "text": word,
                                    "l": x + 2.0, "t": ty + 1.0,
                                    "r": x + 2.0 + ww, "b": ty + 11.0,
                                    "from_ocr": False, "confidence": 1.0,
                                }
                            )
                            cells.append(
                                {
                                    "index": cell_index,
                                    "text": word,
                                    "l": x + 2.0, "t": ty + 1.0,
                                    "r": x + 2.0 + ww, "b": ty + 11.0,
                                    "from_ocr": False, "confidence": 1.0,
                                }
                            )
                            cell_index += 1
                            wid += 1
                            x += 90.0
                        otsl.append("nl")
                        ty += 16.0
                    clusters.append(
                        {
                            "id": cluster_id,
                            "label": "table",
                            "l": 66.0, "t": y + 6.0,
                            "r": 72.0 + 180.0, "b": ty - 4.0 + 2.0,
                            "confidence": 0.9,
                        }
                    )
                    raw_tables.append(
                        {
                            "cluster_id": cluster_id,
                            "otsl_seq": otsl,
                            "cell_bboxes": bboxes,
                        }
                    )
                    cluster_id += 1
                    y = ty + 10.0
                add("page_footer", f"{p + 1} / pdfdoc", 0.9)
                pages.append(
                    {
                        "page_no": p,
                        "width": 612.0,
                        "height": 792.0,
                        "cells": cells,
                        "words": words_list,
                        "raw_clusters": clusters,
                        "raw_tables": raw_tables,
                    }
                )
            payload = PDF_MAGIC + json.dumps({"pages": pages}).encode("utf-8")
            rows.append(
                {
                    "url": f"https://docs.example/pdf/{doc_id}",
                    "warc_ts": _TS0 + int(doc_id),
                    "html": payload,
                    "text": text,
                    "lang": lang,
                }
            )
        return rows_to_table(rows)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(to_pdf_pages, batch_format="pyarrow")


def pages_from_documents(sf_dir: str, snapshot: str = "v1"):
    """Derive a pages table from the driver's ``documents`` parquet:
    each document's text is deterministically wrapped in boilerplated
    HTML. Lets the extraction pipeline run at any scale factor.

    ``snapshot="v2"`` (the incremental_extract input) modifies docs
    with ``doc_id % 23 == 7`` (text + ' v2'), leaving every other
    page byte-identical to v1 — a later crawl of the same corpus."""
    import ray.data

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        rows = []
        for doc_id, text, lang in zip(doc_ids, texts, langs):
            if snapshot == "v2" and doc_id % 23 == 7:
                text = text + " v2"
            rng = random.Random(doc_id)
            nav = " ".join(f'<a href="/n{i}">nav{i}</a>' for i in range(6))
            sentences = text.split(". ")
            body = "".join(f"<p>{s}</p>" for s in sentences if s)
            html = (
                f"<html><body><nav>{nav}</nav><main><h1>Doc {doc_id}</h1>"
                f"{body}</main><footer><a href='/f'>contact</a> © synth"
                f"</footer></body></html>"
            )
            rows.append(
                {
                    "url": f"https://docs.example/{doc_id}",
                    "warc_ts": _TS0 + int(doc_id),
                    "html": html.encode("utf-8"),
                    "text": text,
                    "lang": lang,
                }
            )
        _ = rng
        return rows_to_table(rows)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(to_pages, batch_format="pyarrow")


def pages_with_links(sf_dir: str, with_doc_id: bool = False):
    """Derive a pages table whose HTML carries a deterministic LINK
    structure — the input for the outlink-extraction / link-graph
    family (pipelines/links.py). Per doc: 2 relative nav links, 1
    content link to a docs.example target ((doc_id*31 + 17) % 100000
    — mostly dangling, realistic), 1 relative content link to
    /d/{(doc_id*7 + 3) % 97} (crawled iff that target doc lives on
    this host — gives the frontier anti-join both outcomes), 1
    external-domain link, 1 relative footer link; the page itself
    lives on one of 5 site hosts. Every planted value is a closed
    form of doc_id so the driver-gate oracle reconstructs the
    expected edges in SQL without reimplementing an HTML parser."""
    import ray.data

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        rows = []
        for doc_id, text, lang in zip(doc_ids, texts, langs):
            t1 = (doc_id * 31 + 17) % 100000
            t2 = (doc_id * 7 + 3) % 97
            html = (
                f'<html><body><nav><a href="/n0">home</a>'
                f'<a href="/n1">about</a></nav>'
                f"<main><h1>Doc {doc_id}</h1><p>{text}</p>"
                f'<a href="https://docs.example/{t1}">ref one</a>'
                f'<a href="/d/{t2}">ref two</a>'
                f'<a href="https://ext{doc_id % 7}.example/p/{doc_id % 13}">src</a>'
                f'</main><footer><a href="/contact">contact</a>'
                f"</footer></body></html>"
            )
            rows.append(
                {
                    "url": f"https://site{doc_id % 5}.example/d/{doc_id}",
                    "warc_ts": _TS0 + int(doc_id),
                    "html": html.encode("utf-8"),
                    "text": text,
                    "lang": lang,
                }
            )
        tbl = rows_to_table(rows)
        if with_doc_id:
            tbl = tbl.append_column("doc_id", pa.array(doc_ids, pa.int64()))
        return tbl

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(to_pages, batch_format="pyarrow")


def pages_with_metadata(sf_dir: str, shared_canonical: bool = False):
    """Pages whose ``<head>`` carries a planted metadata block — the
    input for ``pipelines/page_meta.py:page_metadata``. Per doc_id
    (all closed forms, so the driver-gate oracle is pure CASE SQL):

    * ``<title>`` — always ``Title {doc_id}``.
    * meta description — present iff ``doc_id % 3 != 0``.
    * ``<link rel="canonical">`` — present iff ``doc_id % 4 == 1``.
    * ``og:title`` — present iff ``doc_id % 5 in (0, 2)``.
    * robots ``noindex`` — present iff ``doc_id % 11 == 7``.
    * a decoy ``keywords`` meta on EVERY page, so extraction must key
      on the attribute value, not on ``<meta`` alone.

    ``shared_canonical=True`` (the canonical_collapse input) makes the
    canonical target ``c/{doc_id % 50}`` instead of ``c/{doc_id}``, so
    canonical-bearing pages form collapse groups.
    """
    import ray.data

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        rows = []
        for doc_id, text, lang in zip(doc_ids, texts, langs):
            head = [f"<title>Title {doc_id}</title>",
                    '<meta name="keywords" content="synthetic,corpus">']
            if doc_id % 3 != 0:
                head.append(
                    f'<meta name="description" content="Summary of doc {doc_id}">'
                )
            if doc_id % 4 == 1:
                target = doc_id % 50 if shared_canonical else doc_id
                head.append(
                    f'<link rel="canonical" href="https://canon.example/c/{target}">'
                )
            if doc_id % 5 in (0, 2):
                head.append(
                    f'<meta property="og:title" content="OG {doc_id}">'
                )
            if doc_id % 11 == 7:
                head.append('<meta name="robots" content="noindex,nofollow">')
            html = (
                f"<html><head>{''.join(head)}</head>"
                f"<body><p>{text}</p></body></html>"
            )
            rows.append(
                {
                    "url": f"https://site{doc_id % 5}.example/d/{doc_id}",
                    "warc_ts": _TS0 + int(doc_id),
                    "html": html.encode("utf-8"),
                    "text": text,
                    "lang": lang,
                }
            )
        return rows_to_table(rows)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(to_pages, batch_format="pyarrow")


def pages_with_outline(sf_dir: str):
    """Pages with a planted heading hierarchy — input for
    ``pipelines/page_meta.py:html_outline``. Per doc_id: one ``<h1>``
    (``Doc {doc_id}``), ``1 + doc_id % 3`` ``<h2>`` sections named
    ``S{j}``, and ``(doc_id + j) % 3`` ``<h3>`` subsections named
    ``S{j}.{k}`` under each — with paragraph filler between headings
    so the parse is positional, not line-oriented."""
    import ray.data

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        rows = []
        for doc_id, text, lang in zip(doc_ids, texts, langs):
            parts = [f"<h1>Doc {doc_id}</h1><p>intro {doc_id}</p>"]
            for j in range(1, 2 + doc_id % 3):
                parts.append(f"<h2>S{j}</h2><p>sec {j}</p>")
                for k in range(1, 1 + (doc_id + j) % 3):
                    parts.append(f"<h3>S{j}.{k}</h3><p>sub {k}</p>")
            html = (
                f"<html><body><main>{''.join(parts)}</main>"
                f"<footer>© synth</footer></body></html>"
            )
            rows.append(
                {
                    "url": f"https://site{doc_id % 5}.example/d/{doc_id}",
                    "warc_ts": _TS0 + int(doc_id),
                    "html": html.encode("utf-8"),
                    "text": text,
                    "lang": lang,
                }
            )
        return rows_to_table(rows)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(to_pages, batch_format="pyarrow")


def sitemap_pages(sf_dir: str):
    """Sitemap-XML pages — input for
    ``pipelines/page_meta.py:sitemap_urls``. Every doc with
    ``doc_id % 10 == 0`` becomes a sitemap listing 5 ``<url>`` entries
    (loc/lastmod/priority all closed forms of doc_id)."""
    import ray.data

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        rows = []
        for doc_id, lang in zip(doc_ids, langs):
            if doc_id % 10 != 0:
                continue
            host = f"https://site{doc_id % 5}.example"
            entries = []
            for i in range(1, 6):
                t = doc_id + i
                entries.append(
                    f"<url><loc>{host}/d/{t}</loc>"
                    f"<lastmod>2024-01-{1 + t % 28:02d}</lastmod>"
                    f"<priority>0.{i}</priority></url>"
                )
            xml = (
                '<?xml version="1.0" encoding="UTF-8"?>'
                '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
                + "".join(entries) + "</urlset>"
            )
            rows.append(
                {
                    "url": f"{host}/sitemap{doc_id}.xml",
                    "warc_ts": _TS0 + int(doc_id),
                    "html": xml.encode("utf-8"),
                    "text": "",
                    "lang": lang,
                }
            )
        return rows_to_table(rows)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(to_pages, batch_format="pyarrow")


def pages_with_tables(sf_dir: str):
    """Pages carrying one planted ``<table>`` each — input for
    ``pipelines/page_meta.py:html_tables``. Per doc_id (all closed
    forms, so the oracle rebuilds the grid in SQL):

    * ``ncols = 2 + doc_id % 2``; header row of ``<th>C{c}</th>``.
    * ``nr = 2 + doc_id % 3`` data rows of ``<td>v{doc_id}.{r}.{k}</td>``
      (k = the td ordinal within its row).
    * colspan: iff ``doc_id % 5 == 0`` the FIRST td of data row 1 gets
      ``colspan=2`` (and the row is written with one fewer td).
    * rowspan: iff ``doc_id % 7 == 2 and nr >= 3`` the first td of data
      row 2 gets ``rowspan=2`` (and data row 3 one fewer td) — so the
      parser must carry occupancy across rows.
    """
    import ray.data

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        rows = []
        for doc_id, lang in zip(doc_ids, langs):
            ncols = 2 + doc_id % 2
            nr = 2 + doc_id % 3
            cs = doc_id % 5 == 0
            rs = doc_id % 7 == 2 and nr >= 3
            parts = ["<table><tr>"]
            parts += [f"<th>C{c}</th>" for c in range(ncols)]
            parts.append("</tr>")
            for r in range(1, nr + 1):
                parts.append("<tr>")
                ntd = ncols
                if r == 1 and cs:
                    ntd -= 1
                if r == 3 and rs:
                    ntd -= 1
                for k in range(ntd):
                    attr = ""
                    if r == 1 and cs and k == 0:
                        attr = ' colspan="2"'
                    if r == 2 and rs and k == 0:
                        attr = ' rowspan="2"'
                    parts.append(f"<td{attr}>v{doc_id}.{r}.{k}</td>")
                parts.append("</tr>")
            parts.append("</table>")
            html = (
                f"<html><body><h1>Doc {doc_id}</h1>{''.join(parts)}"
                f"</body></html>"
            )
            rows.append(
                {
                    "url": f"https://site{doc_id % 5}.example/d/{doc_id}",
                    "warc_ts": _TS0 + int(doc_id),
                    "html": html.encode("utf-8"),
                    "text": "",
                    "lang": lang,
                }
            )
        return rows_to_table(rows)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(to_pages, batch_format="pyarrow")


def pages_with_captures(sf_dir: str):
    """Multi-capture crawl history — input for
    ``pipelines/page_meta.py:capture_change_rate``. Per doc_id:
    ``1 + doc_id % 4`` captures of the same url, one day apart; the
    content CHANGES at capture k (k >= 1) iff ``(doc_id + k) % 3 == 0``
    (the html embeds the cumulative version count, so consecutive
    captures are byte-identical exactly when nothing changed)."""
    import ray.data

    _DAY = 86_400_000_000

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        langs = batch.column("lang").to_pylist()
        rows = []
        for doc_id, lang in zip(doc_ids, langs):
            n_caps = 1 + doc_id % 4
            version = 0
            for k in range(n_caps):
                if k >= 1 and (doc_id + k) % 3 == 0:
                    version += 1
                body = f"doc {doc_id} version {version}"
                rows.append(
                    {
                        "url": f"https://site{doc_id % 5}.example/d/{doc_id}",
                        "warc_ts": _TS0 + int(doc_id) + k * _DAY,
                        "html": f"<html><body><p>{body}</p></body></html>".encode(),
                        "text": body,
                        "lang": lang,
                    }
                )
        return rows_to_table(rows)

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(to_pages, batch_format="pyarrow")
