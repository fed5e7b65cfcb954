"""EXIF codec: roundtrip both TIFF byte orders, inline-vs-offset values,
hostile payloads as ValueError (never a crash, never a wrong value)."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.dataops.exif import (
    build_exif_jpeg,
    build_tiff_exif,
    parse_exif,
)

_FIELDS = st.fixed_dictionaries(
    {
        "byte_order": st.sampled_from(["II", "MM"]),
        # short strings stay inline (<=3 chars + NUL), long go to the heap
        "make": st.text(alphabet="abcdefgh XYZ0123", max_size=12),
        "model": st.text(alphabet="Camera- 01", max_size=20),
        "orientation": st.integers(min_value=1, max_value=8),
        "x_resolution": st.tuples(
            st.integers(min_value=0, max_value=2**32 - 1),
            st.integers(min_value=1, max_value=2**32 - 1),
        ),
        "datetime": st.sampled_from(
            ["", "2024:01:01 00:00:00", "1999:12:31 23:59:59"]
        ),
        "exposure_time": st.tuples(
            st.integers(min_value=0, max_value=2**32 - 1),
            st.integers(min_value=1, max_value=2**32 - 1),
        ),
        "iso": st.integers(min_value=0, max_value=65535),
        "pixel_x": st.integers(min_value=0, max_value=2**32 - 1),
    }
)


@settings(max_examples=120, deadline=None)
@given(_FIELDS)
def test_roundtrip_every_field(fields):
    meta = parse_exif(build_exif_jpeg(**fields))
    assert meta["byte_order"] == fields["byte_order"]
    assert meta["make"] == fields["make"]
    assert meta["model"] == fields["model"]
    assert meta["orientation"] == fields["orientation"]
    assert (meta["x_res_num"], meta["x_res_den"]) == fields["x_resolution"]
    assert meta["datetime"] == fields["datetime"]
    assert (meta["exposure_num"], meta["exposure_den"]) == fields[
        "exposure_time"
    ]
    assert meta["iso"] == fields["iso"]
    assert meta["pixel_x"] == fields["pixel_x"]


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_totality_garbage_raises_value_error_only(blob):
    """Any byte string either parses or raises ValueError — no other
    exception type ever escapes (the kernel's error-as-value contract
    catches exactly ValueError)."""
    try:
        parse_exif(blob)
    except ValueError:
        pass


@settings(max_examples=80, deadline=None)
@given(_FIELDS, st.integers(min_value=0, max_value=400))
def test_truncation_raises_value_error_only(fields, cut):
    blob = build_exif_jpeg(**fields)
    try:
        parse_exif(blob[: min(cut, len(blob) - 1)])
    except ValueError:
        pass


def test_exif_after_other_app_segments():
    """The marker walk must skip earlier APP0/COM segments to find APP1."""
    inner = build_exif_jpeg(byte_order="MM", make="X", iso=200)
    app0 = b"\xff\xe0" + struct.pack(">H", 7) + b"JFIF\x00"
    com = b"\xff\xfe" + struct.pack(">H", 6) + b"note"
    blob = b"\xff\xd8" + app0 + com + inner[2:]
    meta = parse_exif(blob)
    assert meta["make"] == "X" and meta["iso"] == 200


def test_no_exif_raises():
    with pytest.raises(ValueError):
        parse_exif(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError):
        parse_exif(b"GIF89a")


def test_ifd_entry_cap():
    """A hostile entry count must be rejected by the cap, not allocate."""
    tiff = bytearray(build_tiff_exif(byte_order="II"))
    struct.pack_into("<H", tiff, 8, 0xFFFF)  # IFD0 claims 64k entries
    app1 = b"Exif\x00\x00" + bytes(tiff)
    blob = (
        b"\xff\xd8\xff\xe1"
        + struct.pack(">H", len(app1) + 2)
        + app1
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError):
        parse_exif(blob)


_GPS = st.fixed_dictionaries(
    {
        "lat_ref": st.sampled_from(["N", "S"]),
        "lat": st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2**32 - 1),
                st.integers(min_value=1, max_value=2**32 - 1),
            ),
            min_size=3,
            max_size=3,
        ),
        "lon_ref": st.sampled_from(["E", "W"]),
        "lon": st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2**32 - 1),
                st.integers(min_value=1, max_value=2**32 - 1),
            ),
            min_size=3,
            max_size=3,
        ),
    }
)


@settings(max_examples=80, deadline=None)
@given(_FIELDS, _GPS)
def test_gps_roundtrip_and_scrub(fields, gps):
    from open_ocr_spark.dataops.exif import scrub_gps

    blob = build_exif_jpeg(gps=gps, **fields)
    meta = parse_exif(blob)
    assert meta["has_gps"]
    assert meta["gps_lat_ref"] == gps["lat_ref"]
    assert meta["gps_lat_dms"] == ",".join(
        f"{n}/{d}" for (n, d) in gps["lat"]
    )
    assert meta["gps_lon_dms"] == ",".join(
        f"{n}/{d}" for (n, d) in gps["lon"]
    )
    after = parse_exif(scrub_gps(blob))
    assert not after["has_gps"]
    assert after["gps_lat_dms"] is None
    # every allowlisted tag survives the re-encode bit-exactly
    for k in ("byte_order", "make", "model", "orientation", "datetime",
              "iso", "pixel_x", "x_res_num", "x_res_den",
              "exposure_num", "exposure_den"):
        assert after[k] == meta[k], k


@settings(max_examples=50, deadline=None)
@given(_FIELDS)
def test_scrub_without_gps_is_semantically_identity(fields):
    from open_ocr_spark.dataops.exif import scrub_gps

    blob = build_exif_jpeg(**fields)
    assert parse_exif(scrub_gps(blob)) == parse_exif(blob)


def test_scrub_preserves_non_exif_segments():
    """APP0 before and COM after the Exif APP1 must pass through; only
    the APP1 body is rebuilt."""
    from open_ocr_spark.dataops.exif import scrub_gps

    gps = {"lat_ref": "N", "lat": [(1, 1), (2, 1), (3, 1)],
           "lon_ref": "E", "lon": [(4, 1), (5, 1), (6, 1)]}
    inner = build_exif_jpeg(byte_order="II", make="K", gps=gps)
    app0 = b"\xff\xe0" + struct.pack(">H", 7) + b"JFIF\x00"
    com = b"\xff\xfe" + struct.pack(">H", 6) + b"keep"
    blob = b"\xff\xd8" + app0 + inner[2:-2] + com + b"\xff\xd9"
    out = scrub_gps(blob)
    assert out.startswith(b"\xff\xd8" + app0)
    assert com in out
    assert not parse_exif(out)["has_gps"]
