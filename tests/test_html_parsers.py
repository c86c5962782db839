"""Differential test: the fast regex tokenizer must produce IDENTICAL
blocks to the stdlib html.parser path over the fixture corpora and a
battery of edge markup."""

import pytest

from high_performance_docling_ray.kernels.html_extract import segment_blocks
from high_performance_docling_ray.sources.pages import generate_rows


def _blocks_equal(html: str) -> None:
    fast = segment_blocks(html, parser="fast")
    std = segment_blocks(html, parser="stdlib")
    assert len(fast) == len(std), (len(fast), len(std), html[:200])
    for f, s in zip(fast, std):
        assert f.label == s.label
        assert f.lines == s.lines
        assert f.link_chars == s.link_chars
        assert f.total_chars == s.total_chars
        assert f.boilerplate_depth == s.boilerplate_depth
        assert f.heading_level == s.heading_level
        assert (f.table_id, f.row, f.col) == (s.table_id, s.row, s.col)


def test_parsers_agree_on_fixture_corpus():
    n_checked = 0
    for row in generate_rows(42, 0, 400):
        payload = row["html"]
        if payload.startswith(b"%SYNTHPDF"):
            continue
        _blocks_equal(payload.decode("utf-8"))
        n_checked += 1
    assert n_checked > 200


@pytest.mark.parametrize(
    "html",
    [
        "",
        "plain text only",
        "<p>a &amp; b &lt;c&gt;</p>",
        "<P>UPPER tags</P><DIV>x</DIV>",
        "<p>self closing<br/>line two</p>",
        "<!-- comment --><p>after comment</p>",
        "<!DOCTYPE html><p>doc</p>",
        "<script>var x = '<p>not content</p>';</script><p>real</p>",
        "<style>p { color: red }</style><p>styled</p>",
        '<a href="/x?a=1&amp;b=2">link &quot;q&quot;</a>',
        "<table><tr><td>a</td><td>b</td></tr>stray</table>",
        "<pre>  indented\n    code -\nnext</pre>",
        "<p>unclosed paragraph",
        "<p>entity at end &amp;",
        "<nav>bare nav text</nav><p>content</p>",
        "<ul><li>one</li><li>two</li></ul>",
        "<h2>head</h2><p>body <b>bold</b> tail</p>",
        "<div a='>' b=\">\">attr with gt</div>",
        # doctype with internal subset: stdlib stops at the FIRST '>'
        # and the ']>' remainder becomes text — fast path must match
        '<body><!DOCTYPE html [ <!ENTITY x "y"> ]><p>hello world</p></body>',
        "<body><![if gte mso 9]><p>in mso > section</p><![endif]><p>real</p></body>",
        "<body><![CDATA[ raw > stuff ]]><p>after cdata</p></body>",
        "<body><![cdata junk ] ]><p>weird</p>]]><p>tail text</p></body>",
        '<body><!ENTITY foo "bar"><p>plain decl</p></body>',
    ],
)
def test_parsers_agree_on_edge_markup(html):
    _blocks_equal(html)


@pytest.mark.parametrize(
    "html",
    [
        "<header/><p>real content here</p>",
        "<a href=x/>unquoted slash value</a><p>after</p>",
        "<a href='x'/>quoted then selfclose</a>",
        "<header checked/>boolean attr selfclose",
        "<div a=b/c>slash inside value</div>",
        "<nav-bar>custom element text</nav-bar><p>more</p>",
        "<table-of-contents>toc text</table-of-contents>",
        "<script>var x=1</scripty>leak</script><p>visible</p>",
        "<input type=checkbox checked/>tail",
        "<br />spaced self close",
    ],
)
def test_parsers_agree_on_selfclose_and_custom_tags(html):
    _blocks_equal(html)


def _soup(rng, depth=0):
    tags = ["p", "div", "span", "li", "ul", "table", "tr", "td", "th", "nav",
            "footer", "header", "h1", "h2", "pre", "a", "b", "script",
            "style", "br", "custom-el", "x-widget", "figcaption", "main"]
    words = ["alpha", "beta", "a &amp; b", "&lt;tag&gt;", "word-", "y",
             "&quot;q&quot;", "©", "multi  space", "trail "]
    parts = []
    for _ in range(rng.randint(1, 6)):
        r = rng.random()
        if r < 0.35 or depth > 4:
            parts.append(rng.choice(words))
        elif r < 0.45:
            t = rng.choice(tags)
            parts.append(f"<{t}/>" if rng.random() < 0.5 else f"<{t} checked/>")
        elif r < 0.5:
            parts.append("<!-- comment -->")
        elif r < 0.55:
            t = rng.choice(["script", "style"])
            parts.append(f"<{t}>raw </not{t}> text</{t}>")
        elif r < 0.6:
            parts.append(f"<a href={rng.choice(['x/', '/y', 'z'])}>ln</a>")
        else:
            t = rng.choice(tags)
            attrs = rng.choice(["", " class=c", ' id="i"', " a='v'", " k=v/w"])
            inner = _soup(rng, depth + 1)
            close = f"</{t}>" if rng.random() < 0.9 else ""
            parts.append(f"<{t}{attrs}>{inner}{close}")
    return "".join(parts)


def test_parsers_agree_on_random_soup():
    import random

    for seed in range(300):
        rng = random.Random(seed)
        html = "<html><body>" + _soup(rng) + "</body></html>"
        _blocks_equal(html)
