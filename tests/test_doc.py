"""Word 97 binary codec: CFB roundtrip through both piece encodings and
both table streams, mini-vs-regular FAT paths, hostile-input totality."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.kernels.doc_text import (
    build_doc,
    extract_doc_text,
    is_cfb,
)

# text that survives the cleaner unchanged and is cp1252-encodable
_CP1252 = st.text(
    alphabet="abc DEF123éàç.,;", min_size=0, max_size=200
)
# arbitrary BMP text excluding controls the cleaner rewrites/drops
_UNI = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x2FFF, exclude_characters="\x7f"
    ),
    max_size=120,
)

_PIECES = st.lists(
    st.one_of(
        st.tuples(_CP1252, st.just(True)),
        st.tuples(_UNI, st.just(False)),
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=80, deadline=None)
@given(_PIECES, st.sampled_from([0, 1]))
def test_roundtrip_pieces(pieces, which):
    doc = build_doc(pieces, which_table=which)
    assert is_cfb(doc)
    expect = "".join(t for t, _ in pieces)
    assert extract_doc_text(doc) == expect


def test_paragraph_and_cell_marks_normalize():
    doc = build_doc([("a\rb\x07c\x0bd\x0ce\tf\x01g\r", True)])
    assert extract_doc_text(doc) == "a\nb\nc\nd\ne\tfg\n"


def test_big_stream_takes_fat_path():
    long = "word " * 1200 + "\r"
    doc = build_doc([(long, True)])
    assert len(doc) > 4096 + 512
    assert extract_doc_text(doc) == long.replace("\r", "\n")


def test_utf16_piece_holds_non_cp1252_chars():
    doc = build_doc([("№→★\r", False)])
    assert extract_doc_text(doc) == "№→★\n"


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=2048))
def test_totality_garbage_value_error_only(blob):
    try:
        extract_doc_text(blob)
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(_PIECES, st.integers(min_value=0, max_value=5000))
def test_truncation_value_error_only(pieces, cut):
    doc = build_doc(pieces)
    try:
        extract_doc_text(doc[: min(cut, len(doc) - 1)])
    except ValueError:
        pass


def test_missing_word_stream_raises():
    from open_ocr_spark.kernels.doc_text import _build_cfb

    blob = _build_cfb([("NotWord", b"x" * 100)])
    with pytest.raises(ValueError, match="WordDocument"):
        extract_doc_text(blob)


def test_dispatch_routes_cfb_magic():
    from open_ocr_spark.kernels.dispatch import extract_document

    doc = build_doc([("routed fine.\r", True)])
    text, status, _ = extract_document(doc)
    assert status == "ok" and text == "routed fine.\n"
    bad = doc[:512]  # header without sectors
    text, status, err = extract_document(bad)
    assert status == "error:doc-unsupported" and text == ""


# --- PowerPoint / Excel binary siblings --------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.tuples(_CP1252, st.just(False)),
            st.tuples(_UNI, st.just(True)),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_ppt_roundtrip(texts):
    from open_ocr_spark.kernels.doc_text import build_ppt, extract_ppt_text

    got = extract_ppt_text(build_ppt(texts))
    assert got == "".join(t + "\n" for t, _ in texts).replace("\r", "\n")


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.tuples(st.text(alphabet="ab cd1", max_size=40),
                      st.just(False)),
            st.tuples(_UNI, st.just(True)),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_xls_roundtrip(strings):
    from open_ocr_spark.kernels.doc_text import build_xls, extract_xls_text

    got = extract_xls_text(build_xls(strings))
    assert got == "".join(t + "\n" for t, _ in strings).replace("\r", "\n")


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=1500))
def test_ppt_xls_totality(blob):
    from open_ocr_spark.kernels.doc_text import (
        extract_ppt_text,
        extract_xls_text,
    )

    for fn in (extract_ppt_text, extract_xls_text):
        try:
            fn(blob)
        except ValueError:
            pass


def test_cfb_router_rejects_unknown_family():
    from open_ocr_spark.kernels.doc_text import _build_cfb, extract_cfb_text

    blob = _build_cfb([("Mystery", b"?" * 64)])
    with pytest.raises(ValueError, match="no Word/PowerPoint/Excel"):
        extract_cfb_text(blob)


@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="Sub jéct19", min_size=1, max_size=40),
    st.text(alphabet="bo dy çontent.\r", max_size=120),
    st.booleans(),
)
def test_msg_roundtrip(subject, body, wide):
    from open_ocr_spark.kernels.doc_text import build_msg, extract_msg_text

    got = extract_msg_text(build_msg(subject, body, wide=wide))
    parts = [p for p in (subject, body) if p]
    want = ("\r\r".join(parts) + ("\r" if parts else "")).replace("\r", "\n")
    assert got == want


def test_msg_without_properties_rejected():
    from open_ocr_spark.kernels.doc_text import (
        _build_cfb,
        extract_msg_text,
    )

    blob = _build_cfb([("__substg1.0_0C1A001F", "sender".encode("utf-16-le"))])
    with pytest.raises(ValueError, match="no subject or body"):
        extract_msg_text(blob)
