"""PostScript extraction branch (r5): writer-twin round-trips, string
escapes, layout recovery, non-show literals, dispatch routing, and
ValueError-only totality."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.kernels.dispatch import extract_document
from open_ocr_spark.kernels.ps_text import (
    build_ps,
    extract_ps_text,
    is_ps,
)


def test_roundtrip_pages_lines_and_escapes():
    doc = build_ps([
        ["First line (with parens).", "Second \\ line."],
        ["Page two text."],
    ])
    assert is_ps(doc)
    assert extract_ps_text(doc) == (
        "First line (with parens).\nSecond \\ line.\n\nPage two text."
    )


def test_same_y_shows_concatenate_and_moveto_breaks_lines():
    doc = (b"%!PS\n72 700 moveto (Hel) show (lo) show\n"
           b"72 686 moveto (next) show\nshowpage\n")
    assert extract_ps_text(doc) == "Hello\nnext"
    # same y again: NO line break
    doc2 = (b"%!PS\n72 700 moveto (a) show 200 700 moveto (b) show\n"
            b"showpage\n")
    assert extract_ps_text(doc2) == "ab"


def test_spacing_show_variants_and_octal():
    doc = (b"%!PS\n72 700 moveto 1 0 (spaced) ashow\n"
           b"72 686 moveto 3 0 32 (wide) widthshow\n"
           b"72 672 moveto (\\110\\151) show\nshowpage\n")
    assert extract_ps_text(doc) == "spaced\nwide\nHi"


def test_non_show_literals_and_comments_dropped():
    doc = (b"%!PS-Adobe-3.0\n%%Title: (not content)\n"
           b"/Title (metadata string) def\n"
           b"72 700 moveto (real) show % trailing comment\nshowpage\n")
    assert extract_ps_text(doc) == "real"


def test_line_continuation_and_nested_parens():
    doc = (b"%!PS\n72 700 moveto (split\\\njoined (inner) tail) show\n"
           b"showpage\n")
    assert extract_ps_text(doc) == "splitjoined (inner) tail"


def test_no_shows_is_valueerror_and_dispatch_error_value():
    doc = b"%!PS-Adobe-3.0\n/a 1 def\nshowpage\n"
    with pytest.raises(ValueError, match="no text shows"):
        extract_ps_text(doc)
    text, status, err = extract_document(doc)
    assert status == "error:ps-unsupported" and "no text shows" in err


def test_dispatch_routes_ps():
    doc = build_ps([["Routed body."]])
    assert extract_document(doc) == ("Routed body.", "ok", "")


def test_is_ps_rejects_non_magic():
    assert not is_ps(b"%PDF-1.4 ...")
    assert not is_ps(b"<html>%!PS</html>")


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(max_size=2048))
def test_ps_parser_raises_only_valueerror(payload):
    assert is_ps(payload) in (True, False)
    try:
        extract_ps_text(payload)
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(payload=st.binary(max_size=1024))
def test_dispatch_total_on_ps_prefix(payload):
    text, status, _ = extract_document(b"%!PS\n" + payload)
    assert isinstance(text, str)
    assert status == "ok" or status.startswith("error:")


def test_undefined_escapes_and_crlf_continuation():
    # \8 is an undefined escape: backslash drops, char stays (PLRM)
    doc = b"%!PS\n72 700 moveto (a\\8b \\9 \\xc) show\nshowpage\n"
    assert extract_ps_text(doc) == "a8b 9 xc"
    # \<CRLF> and \<CR> are line continuations that vanish entirely
    doc2 = b"%!PS\n72 700 moveto (split\\\r\njoined\\\rtail) show\nshowpage\n"
    assert extract_ps_text(doc2) == "splitjoinedtail"


def test_real_and_radix_movetos_track_lines():
    doc = (b"%!PS\n72 700.5 moveto (a) show\n"
           b"72. 686. moveto (b) show\n"
           b"16#48 16#10 moveto (c) show\nshowpage\n")
    assert extract_ps_text(doc) == "a\nb\nc"
