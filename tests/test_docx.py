"""DOCX conversion kernel: roundtrips through the writer twin,
entity/charref decoding, dispatch routing, and container edges."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.kernels.dispatch import extract_document
from open_ocr_spark.kernels.docx_text import (
    build_docx,
    extract_docx_text,
    is_docx,
)


def test_roundtrip_paragraphs_tabs_breaks():
    paras = ["Hello world", "a\tb\tc", "line one\nline two", ""]
    data = build_docx(paras)
    assert is_docx(data)
    assert extract_docx_text(data) == "\n\n".join(paras)


def test_entities_and_charrefs():
    paras = ["5 < 6 & 7 > 2", 'quotes " and \' fine']
    assert extract_docx_text(build_docx(paras)) == "\n\n".join(paras)
    # numeric character references decode too
    import io
    import zipfile

    raw = build_docx(["x"])
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        ct = zf.read("[Content_Types].xml")
    doc = (
        b'<?xml version="1.0"?><w:document xmlns:w="ns"><w:body>'
        b"<w:p><w:r><w:t>A&#233;B&#x41;</w:t></w:r></w:p>"
        b"</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("word/document.xml", doc)
    assert extract_docx_text(buf.getvalue()) == "AéBA"


def test_is_docx_rejects_other_zips():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
    assert not is_docx(buf.getvalue())
    assert not is_docx(b"PK\x03\x04 not a zip at all")
    assert not is_docx(b"%PDF-1.4")


def test_corrupt_container_raises_valueerror():
    data = build_docx(["hello"])
    # truncation loses the central directory: BadZipFile -> ValueError
    with pytest.raises(ValueError):
        extract_docx_text(data[: len(data) // 2])
    # a zip missing the document part: KeyError -> ValueError
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/other.xml", "x")
    with pytest.raises(ValueError):
        extract_docx_text(buf.getvalue())


def test_dispatch_routes_docx_by_magic():
    text, status, err = extract_document(build_docx(["body text", "p2"]))
    assert (text, status) == ("body text\n\np2", "ok")
    # a zip that is NOT WordprocessingML is an error value, not HTML soup
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "x")
    text, status, err = extract_document(buf.getvalue())
    assert status == "error:docx-unsupported" and text == ""
    # corrupt zip with the right magic: error value too
    text, status, err = extract_document(b"PK\x03\x04garbage")
    assert status == "error:docx-unsupported"


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.text(
            st.characters(
                blacklist_categories=("Cs",),
                blacklist_characters="\r\x0b\x0c\x1c\x1d\x1e\x85\u2028\u2029",
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_roundtrip_property(paras):
    assert extract_docx_text(build_docx(paras)) == "\n\n".join(paras)


def test_odt_roundtrip_and_dispatch():
    from open_ocr_spark.kernels.docx_text import (
        build_odt,
        extract_odt_text,
        is_odt,
    )

    paras = ["Hello ödt", "a\tb", "x\ny", "5 < 6 & 7"]
    data = build_odt(paras)
    assert is_odt(data) and not is_docx(data)
    assert extract_odt_text(data) == "\n\n".join(paras)
    text, status, err = extract_document(data)
    assert (text, status) == ("\n\n".join(paras), "ok")
    # text:s run-length spaces; text:span transparency
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        zf.writestr(
            "content.xml",
            '<office:text><text:p >a<text:s text:c="3"/>'
            "<text:span>b</text:span><text:s/>c</text:p></office:text>",
        )
    assert extract_odt_text(buf.getvalue()) == "a   b c"
    # epub-style mimetype is NOT odt
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("content.xml", "<x/>")
    assert not is_odt(buf2.getvalue())


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            st.characters(
                blacklist_categories=("Cs",),
                blacklist_characters="\r\x0b\x0c\x1c\x1d\x1e\x85  ",
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_odt_roundtrip_property(paras):
    from open_ocr_spark.kernels.docx_text import build_odt, extract_odt_text

    assert extract_odt_text(build_odt(paras)) == "\n\n".join(paras)


def test_pptx_roundtrip_and_dispatch():
    from open_ocr_spark.kernels.docx_text import (
        build_pptx,
        extract_pptx_text,
        is_pptx,
    )

    slides = [["Title & <sub>", "bullet one\nbullet two"], ["closing"]]
    pkg = build_pptx(slides)
    assert is_pptx(pkg)
    want = "Title & <sub>\n\nbullet one\nbullet two\n\nclosing"
    assert extract_pptx_text(pkg) == want
    text, status, err = extract_document(pkg)
    assert (text, status) == (want, "ok")
    # not mistaken for docx/odt
    from open_ocr_spark.kernels.docx_text import is_docx as _isd
    from open_ocr_spark.kernels.docx_text import is_odt as _iso

    assert not _isd(pkg) and not _iso(pkg)


def test_pptx_slide_order_is_numeric():
    from open_ocr_spark.kernels.docx_text import build_pptx, extract_pptx_text

    slides = [[f"s{i}"] for i in range(1, 13)]  # slide10+ sort after slide9
    assert extract_pptx_text(build_pptx(slides)) == "\n\n".join(
        f"s{i}" for i in range(1, 13)
    )


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(
                st.characters(
                    blacklist_categories=("Cs",),
                    blacklist_characters=(
                        "\t\r\x0b\x0c\x1c\x1d\x1e\x85  "
                    ),
                ),
                max_size=60,
            ),
            min_size=1,
            max_size=3,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_pptx_roundtrip_property(slides):
    from open_ocr_spark.kernels.docx_text import build_pptx, extract_pptx_text

    want = "\n\n".join(p for s in slides for p in s)
    assert extract_pptx_text(build_pptx(slides)) == want
