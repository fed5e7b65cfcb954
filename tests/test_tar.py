"""tar archive extraction: parser vs the independent stdlib writer,
dispatch recursion, error values, pax extensions."""

import io
import tarfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.kernels.archive import build_tar, is_tar, split_tar
from open_ocr_spark.kernels.dispatch import extract_document
from open_ocr_spark.kernels.eml_text import build_eml


def _archive(i=5):
    return build_tar([
        ("site/page.html",
         f"<html><body><p>Tar member html {i} café.</p></body></html>"
         .encode()),
        ("mail/m.eml", build_eml(f"Tar msg {i % 7}", f"Tar body {i}.",
                                 variant=i % 4)),
        ("notes/plain.txt", f"Plain member {i} text.".encode()),
    ])


def test_split_roundtrip_against_stdlib_writer():
    raw = _archive()
    assert is_tar(raw)
    names = [n for n, _ in split_tar(raw)]
    assert names == ["site/page.html", "mail/m.eml", "notes/plain.txt"]


def test_dispatch_joins_member_texts_in_order():
    text, status, err = extract_document(_archive(5))
    assert status == "ok" and err == ""
    assert text == ("Tar member html 5 café.\n"
                    "Tar msg 5\n\nTar body 5.\n\n"
                    "Plain member 5 text.")


def test_nested_archive_is_an_error_value():
    _, status, err = extract_document(build_tar([("inner.tar", _archive())]))
    assert status == "error:tar-member" and "depth" in err


def test_corrupt_checksum_is_an_error_value():
    bad = bytearray(_archive())
    bad[148:156] = b"0000000\x00"
    _, status, _ = extract_document(bytes(bad))
    assert status == "error:tar-unsupported"
    assert not is_tar(bytes(bad))


def test_failing_member_names_the_member():
    raw = build_tar([("ok.txt", b"fine"),
                     ("bad.bin", b"\x89PNG\r\n\x1a\n garbage pixels")])
    _, status, err = extract_document(raw)
    assert status == "error:tar-member" and "bad.bin" in err


def test_truncated_member_data():
    raw = _archive()[:700]  # header survives, data cut
    with pytest.raises(ValueError, match="truncated"):
        split_tar(raw)


def test_pax_long_and_unicode_names():
    buf = io.BytesIO()
    long_name = "café-ü-" + "x" * 120 + ".txt"
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.PAX_FORMAT) as tf:
        for nm, data in [(long_name, b"pax member"), ("plain.txt", b"two")]:
            info = tarfile.TarInfo(name=nm)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    got = split_tar(buf.getvalue())
    assert got == [(long_name, b"pax member"), ("plain.txt", b"two")]


def test_dirs_and_links_skipped():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo(name="adir")
        d.type = tarfile.DIRTYPE
        d.mtime = 0
        tf.addfile(d)
        ln = tarfile.TarInfo(name="alink")
        ln.type = tarfile.SYMTYPE
        ln.linkname = "adir/f"
        ln.mtime = 0
        tf.addfile(ln)
        f = tarfile.TarInfo(name="adir/f.txt")
        f.size = 4
        f.mtime = 0
        tf.addfile(f, io.BytesIO(b"text"))
    assert split_tar(buf.getvalue()) == [("adir/f.txt", b"text")]


@settings(max_examples=25, deadline=None)
@given(members=st.lists(
    st.tuples(
        st.from_regex(r"[a-z][a-z0-9_./-]{0,40}[a-z0-9]", fullmatch=True)
        .filter(lambda n: ".." not in n and "//" not in n),
        st.binary(min_size=0, max_size=2048),
    ),
    min_size=1, max_size=8, unique_by=lambda m: m[0],
))
def test_property_split_matches_stdlib(members):
    raw = build_tar(members)
    assert split_tar(raw) == members
    # cross-check with the stdlib READER too: both parsers must agree
    with tarfile.open(fileobj=io.BytesIO(raw)) as tf:
        std = [(m.name, tf.extractfile(m).read()) for m in tf
               if m.isfile()]
    assert std == members
