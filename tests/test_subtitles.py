"""SRT / WebVTT extraction branch (r5): writer-twin round-trips,
grammar machinery dropping, sniff rejections, dispatch routing, and
ValueError-only totality."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.kernels.dispatch import extract_document
from open_ocr_spark.kernels.subtitle_text import (
    build_srt,
    build_webvtt,
    extract_srt_text,
    extract_webvtt_text,
    is_srt,
    is_webvtt,
)


def test_srt_roundtrip_markup_and_multiline():
    raw = build_srt([
        (0, 1500, "Hello <i>world</i>."),
        (1500, 3000, "Line one\nLine two & more."),
    ])
    assert is_srt(raw)
    assert extract_srt_text(raw) == (
        "Hello world.\n\nLine one\nLine two & more."
    )


def test_vtt_roundtrip_note_voice_and_references():
    raw = build_webvtt(
        [(0, 1500, "<v Ann>Hi there.</v>"), (61000, 62000, "A &amp; B")],
        note="dropped block",
    )
    assert is_webvtt(raw)
    assert extract_webvtt_text(raw) == "Hi there.\n\nA & B"
    assert "dropped block" not in extract_webvtt_text(raw)


def test_vtt_karaoke_timestamps_and_bom():
    raw = ("﻿WEBVTT\n\n00:00.000 --> 00:01.000\n"
           "<00:00:00.500>word by <00:00:00.800>word").encode("utf-8")
    assert is_webvtt(raw)
    assert extract_webvtt_text(raw) == "word by word"


def test_srt_sniff_rejects_lists_and_html():
    assert not is_srt(b"1. first item\n2. second item\n")
    assert not is_srt(b"1 item\n2 item\n")
    assert not is_srt(b"<html><body>1</body></html>")
    assert not is_webvtt(b"WEBVITTY nope")


def test_empty_cue_payloads_are_valueerror():
    with pytest.raises(ValueError, match="no cue text"):
        extract_srt_text(b"1\n00:00:00,000 --> 00:00:01,000\n\n")
    with pytest.raises(ValueError, match="no cue text"):
        extract_webvtt_text(b"WEBVTT\n\nNOTE only a note\n")


def test_dispatch_routes_both_formats():
    assert extract_document(build_srt([(0, 1000, "SRT routed.")])) == (
        "SRT routed.", "ok", "",
    )
    assert extract_document(build_webvtt([(0, 1000, "VTT routed.")])) == (
        "VTT routed.", "ok", "",
    )


@settings(max_examples=200, deadline=None)
@given(payload=st.binary(max_size=2048))
def test_subtitle_parsers_raise_only_valueerror(payload):
    assert is_srt(payload) in (True, False)
    assert is_webvtt(payload) in (True, False)
    for fn in (extract_srt_text, extract_webvtt_text):
        try:
            fn(payload)
        except ValueError:
            pass


@settings(max_examples=100, deadline=None)
@given(payload=st.binary(max_size=1024))
def test_dispatch_total_on_subtitle_prefixes(payload):
    for prefix in (b"WEBVTT\n\n", b"1\r\n00:00:00,000 --> 00:00:01,000\r\n"):
        text, status, _ = extract_document(prefix + payload)
        assert isinstance(text, str)
        assert status == "ok" or status.startswith("error:")


# --- post-review hardening regressions ---------------------------------------


def test_bom_prefixed_payloads_route_through_dispatch():
    bom = "\ufeff".encode("utf-8")
    vtt = bom + b"WEBVTT\n\n00:00.000 --> 00:01.000\nHello world\n"
    assert extract_document(vtt) == ("Hello world", "ok", "")
    srt = bom + build_srt([(0, 1000, "BOM cue.")])
    assert extract_document(srt) == ("BOM cue.", "ok", "")


def test_srt_numeric_cue_text_survives():
    raw = build_srt([(0, 1000, "2024"), (2000, 3000, "was a year")])
    assert extract_srt_text(raw) == "2024\n\nwas a year"


def test_srt_angle_bracket_prose_survives():
    raw = build_srt([(0, 1000, "5 < x and y > 2"),
                     (2000, 3000, "<i>styled</i> <font color=red>red</font>")])
    assert extract_srt_text(raw) == "5 < x and y > 2\n\nstyled red"


def test_vtt_headerless_first_cue_and_pure_header():
    raw = b"WEBVTT\n00:00:01.000 --> 00:00:02.000\nHello"
    assert extract_webvtt_text(raw) == "Hello"
    # a real header block (metadata, no -->) still drops cleanly
    raw2 = (b"WEBVTT\nKind: captions\nLanguage: en\n\n"
            b"00:00:01.000 --> 00:00:02.000\nBody")
    assert extract_webvtt_text(raw2) == "Body"


def test_hours_over_99_are_machinery_not_content():
    vtt = (b"WEBVTT\n\n100:00:01.000 --> 100:00:04.000\nLate cue\n")
    assert extract_webvtt_text(vtt) == "Late cue"
    srt = b"1\n100:00:00,000 --> 100:00:01,000\nLong stream\n"
    assert extract_srt_text(srt) == "Long stream"


def test_vtt_cue_identifier_starting_with_note_is_a_cue():
    raw = (b"WEBVTT\n\nNOTES on the intro\n"
           b"00:00:01.000 --> 00:00:03.000\nActual dialogue\n")
    assert extract_webvtt_text(raw) == "Actual dialogue"


def test_srt_character_references_are_literal_bytes():
    raw = build_srt([(0, 1000, "use &lt;tag&gt; here & now")])
    assert extract_srt_text(raw) == "use &lt;tag&gt; here & now"
