"""HTML main-content extraction: DOM heuristics, boilerplate strip.

The reference repo declares HTML as a supported input format
(`/root/reference/base_models.py:45-124`) and delegates parsing to
docling's HTML backend; per the north-star (BASELINE.json) our engine
implements the HTML path natively: block segmentation over the DOM,
tag/text-density + link-density scoring, boilerplate pruning, and
emission of typed layout elements that flow into the same
assembly/reading-order path as PDF-style pages.

Pure stdlib (html.parser) + deterministic — shared by the Ray stage
and the serial oracle.
"""

from __future__ import annotations

import html as _html_mod
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from .textnorm import cells_to_text

# Elements whose subtree is never content.
_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "iframe", "head"}
)
# Landmark containers that are boilerplate by role.
_BOILERPLATE_TAGS = frozenset({"nav", "footer", "header", "aside"})
# Tags that terminate/open a text block.
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "body", "ul", "ol",
        "li", "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr", "td",
        "th", "pre", "blockquote", "figure", "figcaption", "br",
    }
)
_HEADING_LEVEL = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}

# Fast-path filters: the ONLY tags the start/end handlers react to
# (besides _SKIP_TAGS, probed first). Everything else — span, b, em,
# img, inline/unknown tags — is a single frozenset miss.
_START_RELEVANT = frozenset(
    _BOILERPLATE_TAGS
    | set(_HEADING_LEVEL)
    | {"a", "li", "figcaption", "pre", "table", "tr", "td", "th"}
    | _BLOCK_TAGS
)
_END_RELEVANT = frozenset(
    _BLOCK_TAGS
    | _BOILERPLATE_TAGS
    | set(_HEADING_LEVEL)
    | {"a", "li", "figcaption", "pre", "table"}
)

# Link-density pruning: blocks whose characters are mostly anchor text
# and that are short are navigation-like.
LINK_DENSITY_THRESHOLD = 0.5
LINK_DENSITY_MIN_CHARS = 120


@dataclass
class HtmlBlock:
    """One segmented DOM block (pre-pruning)."""

    label: str                      # text|section_header|list_item|caption|code|table_cell
    lines: list[str] = field(default_factory=list)
    link_chars: int = 0
    total_chars: int = 0
    boilerplate_depth: int = 0      # >0 when inside nav/footer/header/aside
    heading_level: int = 0
    table_id: int = -1              # >=0 when inside a <table>
    row: int = -1
    col: int = -1
    order: int = 0

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0


class _BlockSegmenter(HTMLParser):
    """Stream the DOM into flat blocks with link/boilerplate accounting."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[HtmlBlock] = []
        self._skip_depth = 0
        self._boiler_depth = 0
        self._anchor_depth = 0
        self._pre_depth = 0
        self._heading: int = 0
        self._label_stack: list[str] = []
        self._current: HtmlBlock | None = None
        self._table_counter = -1
        self._table_stack: list[int] = []
        self._row_counters: list[int] = []
        self._col_counters: list[int] = []
        self._order = 0

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        blk = self._current
        self._current = None
        if blk is None:
            return
        if blk.label == "code":
            # code keeps its line structure and indentation: raw chunks
            # split on newlines, only fully-blank edges trimmed
            raw = "".join(blk.lines)
            lines = [ln.rstrip() for ln in raw.split("\n")]
            while lines and not lines[0].strip():
                lines.pop(0)
            while lines and not lines[-1].strip():
                lines.pop()
        else:
            lines = [ln for ln in (s.strip() for s in blk.lines) if ln]
        if not lines:
            return
        blk.lines = lines
        self.blocks.append(blk)

    def _open_block(self, label: str) -> HtmlBlock:
        self._flush()
        self._order += 1
        blk = HtmlBlock(
            label=label,
            boilerplate_depth=self._boiler_depth,
            heading_level=self._heading,
            order=self._order,
        )
        if self._table_stack:
            blk.table_id = self._table_stack[-1]
            blk.row = self._row_counters[-1]
            blk.col = self._col_counters[-1]
        self._current = blk
        return blk

    def _current_label(self) -> str:
        if self._heading:
            return "section_header"
        if self._label_stack:
            return self._label_stack[-1]
        return "text"

    # -- parser events ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag not in _START_RELEVANT:
            # inline/unknown tags (span, b, em, img, ...) never change
            # segmenter state — one set probe instead of the full chain
            return
        if tag in _BOILERPLATE_TAGS:
            # landmark containers are block boundaries: text before the
            # landmark must not share a block with the landmark's text
            self._flush()
            self._boiler_depth += 1
        if tag == "a":
            self._anchor_depth += 1
        if tag in _HEADING_LEVEL:
            self._heading = _HEADING_LEVEL[tag]
        if tag == "li":
            self._label_stack.append("list_item")
        elif tag == "figcaption":
            self._label_stack.append("caption")
        elif tag == "pre":
            self._pre_depth += 1
            self._label_stack.append("code")
        if tag == "table":
            self._flush()
            self._table_counter += 1
            self._table_stack.append(self._table_counter)
            self._row_counters.append(-1)
            self._col_counters.append(-1)
        elif tag == "tr" and self._table_stack:
            self._flush()
            self._row_counters[-1] += 1
            self._col_counters[-1] = -1
        elif tag in ("td", "th") and self._table_stack:
            self._col_counters[-1] += 1
            blk = self._open_block("table_cell")
            if tag == "th":
                blk.label = "table_header"
            return
        if tag in _BLOCK_TAGS:
            self._open_block(self._current_label())

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag not in _END_RELEVANT:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _BOILERPLATE_TAGS:
            self._flush()  # close the landmark's block before leaving it
            self._boiler_depth = max(0, self._boiler_depth - 1)
        elif tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        elif tag in _HEADING_LEVEL:
            self._heading = 0
        elif tag in ("li", "figcaption") and self._label_stack:
            self._label_stack.pop()
        elif tag == "pre":
            self._pre_depth = max(0, self._pre_depth - 1)
            if self._label_stack:
                self._label_stack.pop()
        elif tag == "table" and self._table_stack:
            self._flush()
            self._table_stack.pop()
            self._row_counters.pop()
            self._col_counters.pop()

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        # whitespace-only runs (the majority of inter-tag text) are
        # dropped by the strip() check below in BOTH modes — bail before
        # paying for split/join
        if not data or data.isspace():
            return
        if self._pre_depth:
            text = data
        else:
            text = " ".join(data.split())
        if self._current is None:
            self._open_block(self._current_label())
        blk = self._current
        blk.lines.append(text)
        n = len(text)
        blk.total_chars += n
        if self._anchor_depth:
            blk.link_chars += n


# Fast tokenizer: one regex pass over the markup driving the SAME
# segmenter events as html.parser — ~3-5x faster than the stdlib
# state machine, which profiles as >half of the whole extraction
# kernel. Tag grammar: comments / doctype / processing instructions
# are skipped; raw-text elements (script/style/...) swallow everything
# up to their closing tag, like the stdlib parser does.
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"            # comment
    # marked sections, mirroring markupbase.parse_marked_section: the
    # cdata family closes at ']]>' (whitespace allowed between the
    # tokens), the MS-Office if/else/endif family at ']>'
    r"|(?i:<!\[(?:temp|cdata|ignore|include|rcdata)(?![-_.a-zA-Z0-9])"
    r".*?(?:\]\s*\]\s*>|$))"
    r"|(?i:<!\[(?:if|else|endif)(?![-_.a-zA-Z0-9]).*?(?:\]\s*>|$))"
    # doctype & bogus comments stop at the FIRST '>' —
    # html.parser.parse_html_declaration does rawdata.find('>'), so a
    # DOCTYPE internal subset's remainder (']>') is emitted as text
    # and the fast path must do the same (pinned by the differential
    # test in tests/test_html_parsers.py)
    r"|<![^>]*>"
    r"|<\?[^>]*>"                  # processing instruction
    # end tag (group 1): name = chars until whitespace/'/'/'>' — same
    # tolerant grammar as html.parser, so '<nav-bar>' is tag 'nav-bar',
    # not a misparsed 'nav'
    r"|</\s*([a-zA-Z][^\s/>]*)[^>]*>"
    # start tag (groups 2-4): attrs are LAZY so a trailing '/' is left
    # for the self-close group instead of being swallowed as attr text
    r"|<([a-zA-Z][^\s/>]*)((?:\"[^\"]*\"|'[^']*'|[^'\">])*?)(/?)>",
    re.DOTALL,
)

_ATTR_BOUNDARY = " \t\n\r\f\"'"


def _selfclose_real(attrs: str) -> bool:
    """Mirror html.parser: a trailing '/' self-closes UNLESS it merges
    into an unquoted attribute VALUE ('<a href=x/>' is value 'x/',
    start-only; '<header checked/>' is a boolean attr + self-close)."""
    if not attrs or attrs[-1] in _ATTR_BOUNDARY:
        return True
    cut = max(attrs.rfind(c) for c in _ATTR_BOUNDARY)
    return "=" not in attrs[cut + 1 :]
# stdlib html.parser treats exactly script/style as raw-text
# (CDATA_CONTENT_ELEMENTS); mirror that set. The end pattern requires
# a name BOUNDARY after the tag so '</scripty>' does not terminate a
# '<script>' element (stdlib stays in CDATA until the exact name).
_RAW_TEXT_TAGS = ("script", "style")
_RAW_END = {
    t: re.compile(f"</\\s*{t}(?=[\\s/>])[^>]*>", re.IGNORECASE)
    for t in _RAW_TEXT_TAGS
}


def _fast_feed(seg: _BlockSegmenter, html: str) -> None:
    """Drive the segmenter's event handlers from a regex token scan.

    Mirrors the stdlib parser's observable behavior for our handlers:
    lowercased tag names, entity-decoded data chunks (one per
    contiguous text run), start+end events for self-closing tags,
    raw-text element content delivered as data.
    """
    pos = 0
    n = len(html)
    while pos < n:
        m = _TOKEN_RE.search(html, pos)
        if m is None:
            text = html[pos:]
            if text:
                seg.handle_data(
                    _html_mod.unescape(text) if "&" in text else text
                )
            break
        if m.start() > pos:
            text = html[pos : m.start()]
            seg.handle_data(_html_mod.unescape(text) if "&" in text else text)
        pos = m.end()
        end_name, start_name, attrs, selfclose = m.group(1, 2, 3, 4)
        if end_name:
            seg.handle_endtag(end_name.lower())
        elif start_name:
            tag = start_name.lower()
            seg.handle_starttag(tag, [])
            if selfclose and _selfclose_real(attrs):
                seg.handle_endtag(tag)
            elif tag in _RAW_END:
                # swallow raw-text content up to the closing tag
                em = _RAW_END[tag].search(html, pos)
                if em is None:
                    seg.handle_data(html[pos:])
                    seg.handle_endtag(tag)
                    break
                seg.handle_data(html[pos : em.start()])
                seg.handle_endtag(tag)
                pos = em.end()
        # else: comment/doctype/PI — skipped


def segment_blocks(html: str, parser: str = "fast") -> list[HtmlBlock]:
    """Parse HTML into flat, ordered content blocks.

    parser="fast" (default): regex tokenizer above. parser="stdlib":
    html.parser state machine. Both drive the same segmenter; the
    differential test in tests/test_html_parsers.py pins them to
    identical output over the fixture corpus.
    """
    seg = _BlockSegmenter()
    try:
        if parser == "fast":
            _fast_feed(seg, html)
        else:
            seg.feed(html)
            seg.close()
    except Exception:
        # Malformed markup: keep whatever was segmented so far.
        pass
    seg._flush()
    return seg.blocks


def is_boilerplate(blk: HtmlBlock) -> bool:
    """Boilerplate predicate: landmark containers, or link-dense short blocks."""
    if blk.boilerplate_depth > 0:
        return True
    if blk.label == "section_header":
        return False
    return (
        blk.link_density > LINK_DENSITY_THRESHOLD
        and blk.total_chars < LINK_DENSITY_MIN_CHARS
    )


def extract_elements(html: str) -> list[dict]:
    """HTML -> ordered typed elements (main content only).

    Output element dicts: {label, text, heading_level, table_id, row, col}.
    Table cells stay separate elements (label table_cell/table_header)
    so the table path can reassemble grids; text is sanitized with the
    shared kernel (dehyphenation + unicode normalization).
    """
    out: list[dict] = []
    for blk in segment_blocks(html):
        if is_boilerplate(blk):
            continue
        if blk.label == "code":
            # verbatim join — sanitize would collapse indentation and
            # treat trailing hyphens as line-break hyphenation
            text = "\n".join(blk.lines)
        else:
            text = cells_to_text(blk.lines)
        if not text:
            continue
        out.append(
            {
                "label": blk.label,
                "text": text,
                "heading_level": blk.heading_level,
                "table_id": blk.table_id,
                "row": blk.row,
                "col": blk.col,
            }
        )
    return out


def elements_to_text(elements: list[dict]) -> str:
    """Ordered elements -> the final extracted_text (byte-identity target).

    Plain join with newlines; table rows join their cells with a tab.
    """
    parts: list[str] = []
    i = 0
    n = len(elements)
    while i < n:
        el = elements[i]
        # a block inside <table> but outside any td/th (row < 0) is
        # plain text, not a grid cell — same rule as html_to_elements
        if el["table_id"] >= 0 and el["row"] >= 0:
            tid = el["table_id"]
            rows: dict[int, list[tuple[int, str]]] = {}
            while (
                i < n
                and elements[i]["table_id"] == tid
                and elements[i]["row"] >= 0
            ):
                cell = elements[i]
                rows.setdefault(cell["row"], []).append((cell["col"], cell["text"]))
                i += 1
            for r in sorted(rows):
                cells = [t for _, t in sorted(rows[r], key=lambda p: p[0])]
                parts.append("\t".join(cells))
        else:
            parts.append(el["text"])
            i += 1
    return "\n".join(parts)


def extract_text(html: str) -> str:
    """One-shot helper: HTML -> extracted main-content text."""
    return elements_to_text(extract_elements(html))
