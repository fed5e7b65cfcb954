"""RTF conversion kernel: writer-twin roundtrips, escape/Unicode
decoding, destination skipping, \\uc fallback, and dispatch routing."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.kernels.dispatch import extract_document
from open_ocr_spark.kernels.rtf_text import (
    build_rtf,
    extract_rtf_text,
    is_rtf,
)


def test_roundtrip_paragraphs_tabs_breaks():
    paras = ["Hello world", "a\tb\tc", "line one\nline two", ""]
    data = build_rtf(paras)
    assert is_rtf(data)
    assert extract_rtf_text(data) == "\n\n".join(paras)


def test_roundtrip_unicode_and_braces():
    paras = ["café €uro — naïve", "braces {x} back\\slash", "emoji 😀 𝔸"]
    assert extract_rtf_text(build_rtf(paras)) == "\n\n".join(paras)


def test_empty_edge_paragraph_lists():
    for paras in ([""], ["a", ""], ["", "b"], ["", "", ""]):
        assert extract_rtf_text(build_rtf(paras)) == "\n\n".join(paras)


def test_header_destinations_are_skipped():
    # fonttbl/colortbl/generator from the twin header must contribute
    # nothing even though they contain ';' and word characters
    assert extract_rtf_text(build_rtf(["x"])) == "x"


def test_hand_written_document_escapes():
    doc = (
        rb"{\rtf1\ansi\ansicpg1252\deff0{\fonttbl{\f0 Arial;}}"
        rb"{\info{\title secret}}"
        rb"\pard\b Bold\b0  and \i italic\i0  text.\par "
        rb"Second\~para with \'e9 and \u233?acute \emdash dash.\par}"
    )
    got = extract_rtf_text(doc)
    # \b0 eats its delimiter space; \~ is NBSP; trailing \par is a
    # separator so a trailing blank paragraph remains (documented)
    assert got == (
        "Bold and italic text.\n\n"
        "Second para with é and éacute —dash.\n\n"
    )


def test_uc_fallback_skipping():
    # \uc2: two fallback chars after each \u must be dropped
    assert extract_rtf_text(rb"{\rtf1\ansi\uc2 A\u233 e'B}") == "AéB"
    # fallback may be an \'xx escape, counting as ONE char
    assert extract_rtf_text(rb"{\rtf1\ansi\uc1 A\u233\'e9B}") == "AéB"
    # \uc is group-scoped: restored after the group closes
    assert (
        extract_rtf_text(rb"{\rtf1\ansi\uc1 {\uc2 \u65 xx}\u66 x}") == "AB"
    )


def test_negative_u_and_surrogate_pairs():
    # negative \uN is N + 65536
    assert extract_rtf_text(rb"{\rtf1 \u-247?}") == chr(65536 - 247)
    # surrogate pair recombines to one astral char
    assert extract_rtf_text(rb"{\rtf1 \u-10179?\u-8704?}") == "\U0001F600"


def test_bin_skips_raw_bytes():
    assert extract_rtf_text(rb"{\rtf1 x\bin5 \par{}y}") == "xy"


def test_escaped_newline_is_par():
    assert extract_rtf_text(b"{\\rtf1 a\\\nb}") == "a\n\nb"
    # raw newlines are ignored
    assert extract_rtf_text(b"{\\rtf1 a\nb\r\nc}") == "abc"


def test_codepage_switch():
    # cp1251: 0xE9 is CYRILLIC SMALL LETTER SHORT I
    assert extract_rtf_text(rb"{\rtf1\ansicpg1251 \'e9}") == "й"


def test_not_rtf_raises():
    with pytest.raises(ValueError):
        extract_rtf_text(b"not rtf at all")
    assert not is_rtf(b"%PDF-1.4")
    assert not is_rtf(b"{\\rt")


def test_dispatch_routes_rtf_by_magic():
    text, status, err = extract_document(build_rtf(["body text", "p2"]))
    assert (text, status) == ("body text\n\np2", "ok")


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            st.characters(blacklist_categories=("Cs",)),
            max_size=80,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_roundtrip_property(paras):
    assert extract_rtf_text(build_rtf(paras)) == "\n\n".join(paras)
