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
    # a zip that is NOT an Office container routes to the generic zip
    # archive branch (r5): members extract, no HTML soup
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "x")
    text, status, err = extract_document(buf.getvalue())
    assert (text, status) == ("x", "ok")
    # corrupt zip with the right magic: error value
    text, status, err = extract_document(b"PK\x03\x04garbage")
    assert status == "error:zip-unsupported"


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


# --- SpreadsheetML (XLSX) sibling ------------------------------------------


class TestXlsx:
    def test_roundtrip_sheets_rows_cells(self):
        from open_ocr_spark.kernels.docx_text import (
            build_xlsx,
            extract_xlsx_text,
            is_xlsx,
        )

        sheets = [
            [["Name", "Qty", "Price"],
             ["widget & co", "3", "19.99"],
             ["<gadget>", "-7", "x"]],
            [["lone"], ["", "dup", "dup"]],
        ]
        blob = build_xlsx(sheets)
        assert is_xlsx(blob)
        want = "\n\n".join(
            "\n".join("\t".join(r) for r in s) for s in sheets
        )
        assert extract_xlsx_text(blob) == want

    def test_shared_strings_deduplicate(self):
        import io
        import zipfile

        from open_ocr_spark.kernels.docx_text import build_xlsx

        blob = build_xlsx([[["same", "same", "same", "7"]]])
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            sst = zf.read("xl/sharedStrings.xml")
        assert sst.count(b"<si>") == 1  # one entry, three references

    def test_numbers_keep_lexical_form(self):
        from open_ocr_spark.kernels.docx_text import (
            build_xlsx,
            extract_xlsx_text,
        )

        # 19.990 must not reformat to 19.99: raw <v> text passes through
        assert extract_xlsx_text(
            build_xlsx([[["19.990", "-0.5", "007"]]])
        ) == "19.990\t-0.5\t007"

    def test_inline_string_and_empty_cells(self):
        import io
        import zipfile

        from open_ocr_spark.kernels.docx_text import extract_xlsx_text

        sheet = (
            b'<?xml version="1.0"?><worksheet><sheetData>'
            b'<row r="1"><c r="A1" t="inlineStr"><is><t>in</t>'
            b"<t>line</t></is></c>"
            b'<c r="B1" s="2"/><c r="C1"><v>4</v></c></row>'
            b"<row r=\"2\"/></sheetData></worksheet>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("xl/workbook.xml", b"<workbook/>")
            zf.writestr("xl/worksheets/sheet1.xml", sheet)
        assert extract_xlsx_text(buf.getvalue()) == "inline\t\t4\n"

    def test_sheet_numeric_order(self):
        import io
        import zipfile

        from open_ocr_spark.kernels.docx_text import extract_xlsx_text

        def _sheet(v):
            return (
                b"<worksheet><sheetData><row><c><v>"
                + v
                + b"</v></c></row></sheetData></worksheet>"
            )

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("xl/workbook.xml", b"<workbook/>")
            # insertion order 10, 2, 1 — extraction must sort numerically
            zf.writestr("xl/worksheets/sheet10.xml", _sheet(b"ten"))
            zf.writestr("xl/worksheets/sheet2.xml", _sheet(b"two"))
            zf.writestr("xl/worksheets/sheet1.xml", _sheet(b"one"))
        assert extract_xlsx_text(buf.getvalue()) == "one\n\ntwo\n\nten"

    def test_dispatch_routes_xlsx(self):
        from open_ocr_spark.kernels.dispatch import extract_document
        from open_ocr_spark.kernels.docx_text import build_xlsx

        blob = build_xlsx([[["cell a", "5"]]])
        text, status, err = extract_document(blob)
        assert (text, status, err) == ("cell a\t5", "ok", "")

    def test_corrupt_container_is_error_value(self):
        from open_ocr_spark.kernels.dispatch import extract_document

        # valid zip, workbook part present, but a worksheet is missing
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("xl/workbook.xml", b"<workbook/>")
        text, status, err = extract_document(buf.getvalue())
        assert text == "" and status == "error:xlsx-unsupported"

    @given(
        st.lists(
            st.lists(
                st.lists(
                    st.text(
                        alphabet=st.characters(
                            blacklist_characters="\t\n\r",
                            blacklist_categories=("Cs",),
                        ),
                        max_size=20,
                    ),
                    min_size=1,
                    max_size=4,
                ),
                min_size=1,
                max_size=4,
            ),
            min_size=1,
            max_size=3,
        )
    )
    @settings(max_examples=25, deadline=None)
    def test_roundtrip_property(self, sheets):
        from open_ocr_spark.kernels.docx_text import (
            build_xlsx,
            extract_xlsx_text,
        )

        want = "\n\n".join(
            "\n".join("\t".join(r) for r in s) for s in sheets
        )
        assert extract_xlsx_text(build_xlsx(sheets)) == want


# --- EPUB sibling ------------------------------------------------------------


class TestEpub:
    W = (
        '<html><head><title>t</title></head><body>'
        '<nav><a href="/">Home</a> <a href="/a">A</a></nav>'
        "<article><p>{}</p></article>"
        "<footer><p>(c) footer</p></footer></body></html>"
    )

    def _ch(self, text):
        return self.W.format(text).encode("utf-8")

    def test_spine_order_not_manifest_order(self):
        from open_ocr_spark.kernels.docx_text import (
            build_epub,
            extract_epub_text,
            is_epub,
        )

        # build_epub writes the manifest REVERSED on purpose: a reader
        # that walks manifest or member order gets chapters backwards
        blob = build_epub(
            [self._ch("First chapter body."),
             self._ch("Second chapter body."),
             self._ch("Third chapter body.")]
        )
        assert is_epub(blob)
        assert extract_epub_text(blob) == (
            "First chapter body.\n\nSecond chapter body.\n\n"
            "Third chapter body."
        )

    def test_boilerplate_stripped_per_chapter(self):
        from open_ocr_spark.kernels.docx_text import (
            build_epub,
            extract_epub_text,
        )

        out = extract_epub_text(build_epub([self._ch("Only the prose.")]))
        assert out == "Only the prose."  # nav/footer gone

    def test_dispatch_routes_epub(self):
        from open_ocr_spark.kernels.dispatch import extract_document
        from open_ocr_spark.kernels.docx_text import build_epub

        blob = build_epub([self._ch("Routed body text.")])
        assert extract_document(blob) == ("Routed body text.", "ok", "")

    def test_missing_spine_is_error_value(self):
        import io
        import zipfile

        from open_ocr_spark.kernels.dispatch import extract_document

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            info = zipfile.ZipInfo("mimetype")
            info.compress_type = zipfile.ZIP_STORED
            zf.writestr(info, b"application/epub+zip")
            zf.writestr(
                "META-INF/container.xml",
                b'<container><rootfiles><rootfile '
                b'full-path="OEBPS/content.opf"/></rootfiles></container>',
            )
            zf.writestr("OEBPS/content.opf",
                        b"<package><manifest/><spine/></package>")
        text, status, err = extract_document(buf.getvalue())
        assert text == "" and status == "error:epub-unsupported"

    def test_epub_not_confused_with_office_zips(self):
        from open_ocr_spark.kernels.docx_text import (
            build_docx,
            build_epub,
            build_odt,
            build_pptx,
            build_xlsx,
            is_docx,
            is_epub,
            is_odt,
            is_pptx,
            is_xlsx,
        )

        blobs = {
            "docx": build_docx(["x"]),
            "odt": build_odt(["x"]),
            "pptx": build_pptx([["x"]]),
            "xlsx": build_xlsx([[["x"]]]),
            "epub": build_epub([self._ch("x")]),
        }
        preds = {"docx": is_docx, "odt": is_odt, "pptx": is_pptx,
                 "xlsx": is_xlsx, "epub": is_epub}
        for kind, blob in blobs.items():
            for pkind, pred in preds.items():
                assert pred(blob) == (kind == pkind), (kind, pkind)

    @given(st.lists(
        st.text(alphabet="abcdefgh XYZ.,", min_size=1, max_size=40),
        min_size=1, max_size=4,
    ))
    @settings(max_examples=20, deadline=None)
    def test_roundtrip_property(self, texts):
        from open_ocr_spark.kernels.docx_text import (
            build_epub,
            extract_epub_text,
        )
        import re as _re

        want = "\n\n".join(
            _re.sub(r"\s+", " ", t).strip() for t in texts
        )
        got = extract_epub_text(build_epub([self._ch(t) for t in texts]))
        assert got == want
