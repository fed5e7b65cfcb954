"""Fast-tokenizer tier: the regex tokenizer must match the stdlib
html.parser tree semantics on every fixture page, and handle markup edge
cases (comments, raw-text elements, entities, self-closing, implicit
closes) identically."""

import pytest

from open_ocr_spark.fixtures import generate_pages
from open_ocr_spark.kernels.html_extract import (
    _emit_paragraphs,
    extract_main_text,
    select_main_node,
)
from open_ocr_spark.kernels.htmltree import parse_html, parse_html_stdlib


def _extract_with(parser, raw, aggressive=True):
    root = parser(raw)
    main = select_main_node(root) or root
    return "\n\n".join(_emit_paragraphs(main, strip_boilerplate=aggressive))


def test_tokenizer_matches_stdlib_on_all_fixtures():
    pages, _ = generate_pages(300)
    for p in pages:
        h = p["html"]
        if not h or h[:4] == b"%PDF":
            continue
        assert _extract_with(parse_html, h) == _extract_with(
            parse_html_stdlib, h
        ), p["url"]


CASES = [
    b"<body><!-- <p>not text</p> --><article><p>real</p></article></body>",
    b"<body><script>var a = '<p>fake</p>';</script><article><p>real</p></article></body>",
    b"<body><style>p::before{content:'<div>'}</style><article><p>real</p></article></body>",
    b"<body><article><p>one<br/>two</p><hr><p>three &amp; four</p></article></body>",
    b"<body><article><p>unclosed<p>second</article></body>",
    b"<body><ARTICLE><P>upper case</P></ARTICLE></body>",
    b"<body><article><p>a &lt;tag&gt; &#65; &nbsp;b</p></article></body>",
    b"<body><article><p>text</p><img src='x.png'><p>more</p></article></body>",
    b"<!DOCTYPE html><body><article><p>doc</p></article></body>",
    b"<body><article><p>stray</b></i> end tags</p></article></body>",
    b"<body><textarea><p>not content</p></textarea><article><p>yes</p></article></body>",
]


@pytest.mark.parametrize("html", CASES)
def test_tokenizer_edge_cases_match_stdlib(html):
    assert _extract_with(parse_html, html) == _extract_with(parse_html_stdlib, html)


def test_entities_unescaped():
    assert (
        extract_main_text(b"<body><article><p>a &amp; b &#8212; c</p></article></body>")
        == "a & b — c"
    )


def test_script_with_embedded_close_lookalike():
    html = b"<body><script>if(a</script1){}</script><article><p>ok</p></article></body>"
    # tolerant: whatever happens, no crash and deterministic output
    out1 = extract_main_text(html)
    out2 = extract_main_text(html)
    assert out1 == out2


def test_truncated_markup_no_raise():
    for frag in (b"<div", b"<div><p>half <", b"<!-- unclosed", b"<script>xx",
                 b"<![CDATA[zz", b"</closing-only>", b"<p>&brokenentity"):
        assert isinstance(extract_main_text(frag), str)
