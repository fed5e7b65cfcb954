"""EXIF metadata: TIFF-IFD parser over the JPEG APP1 segment, with the
encoder twin that makes it oracle-checkable.

A multimodal training pipeline reads EXIF for capture provenance
(camera make/model, timestamp), geometry (orientation — the pixel
decode is wrong without it), and exposure features; it is also the PII
surface images leak (GPS tags), so a scrub stage must FIND it reliably.
Format per the EXIF 2.3 / TIFF 6.0 public specs (CIPA DC-008, Adobe
TIFF rev 6.0): JPEG markers walk to APP1 ``Exif\\0\\0``; inside, a TIFF
stream — 2-byte byte order (``II`` little / ``MM`` big), magic 42,
IFD0 offset; each IFD is a count + 12-byte entries (tag, type, count,
value-or-offset — value inlines when it fits 4 bytes) + next-IFD
pointer; tag 0x8769 points at the Exif sub-IFD.

Both byte orders are first-class (fixtures alternate them); all offsets
are bounds-checked against the segment; malformed structures raise
``ValueError`` inside the kernel where the standard strict/null
error-as-value contract applies (same shape as multimodal.audio_stats).

Reference parity note: the reference engine never reads image metadata
(its OCR engines consume raw bytes); this operator is part of the
repo's multimodal-pipeline surface, not §2.A.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

# TIFF field types this surface uses: ASCII, SHORT, LONG, RATIONAL.
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_X_RESOLUTION = 0x011A
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_EXPOSURE_TIME = 0x829A
TAG_ISO = 0x8827
TAG_PIXEL_X = 0xA002

_MAX_ENTRIES = 4096  # hostile-input cap: one IFD cannot claim 64k entries


# --- encoder twin ----------------------------------------------------------------


def _entry(
    order: str, tag: int, typ: int, values, data_off: int, heap: bytearray
) -> bytes:
    """One 12-byte IFD entry; out-of-line values append to ``heap`` (which
    starts at absolute TIFF offset ``data_off``)."""
    if typ == 2:  # ASCII: NUL-terminated
        raw = values.encode("ascii") + b"\x00"
        count = len(raw)
    elif typ == 5:  # RATIONAL: (num, den) pairs
        raw = b"".join(
            struct.pack(order + "II", n, d) for (n, d) in values
        )
        count = len(values)
    else:  # SHORT / LONG
        fmt = {3: "H", 4: "I"}[typ]
        raw = b"".join(struct.pack(order + fmt, v) for v in values)
        count = len(values)
    if len(raw) <= 4:
        value = raw + b"\x00" * (4 - len(raw))
    else:
        value = struct.pack(order + "I", data_off + len(heap))
        heap.extend(raw)
        if len(heap) % 2:  # TIFF word alignment
            heap.append(0)
    return (
        struct.pack(order + "HHI", tag, typ, count) + value
    )


def build_tiff_exif(
    *,
    byte_order: str = "II",
    make: str = "",
    model: str = "",
    orientation: int = 1,
    x_resolution: tuple[int, int] = (72, 1),
    datetime: str = "",
    exposure_time: tuple[int, int] = (1, 60),
    iso: int = 100,
    pixel_x: int = 0,
) -> bytes:
    """The TIFF stream of an Exif APP1 payload: IFD0 with the five
    baseline tags plus an Exif sub-IFD (exposure, ISO, pixel width)."""
    order = "<" if byte_order == "II" else ">"
    ifd0_fields = [
        (TAG_MAKE, 2, make),
        (TAG_MODEL, 2, model),
        (TAG_ORIENTATION, 3, [orientation]),
        (TAG_X_RESOLUTION, 5, [x_resolution]),
        (TAG_DATETIME, 2, datetime),
        (TAG_EXIF_IFD, 4, None),  # patched below
    ]
    exif_fields = [
        (TAG_EXPOSURE_TIME, 5, [exposure_time]),
        (TAG_ISO, 3, [iso]),
        (TAG_PIXEL_X, 4, [pixel_x]),
    ]
    # layout: header(8) | IFD0 | IFD0 heap | ExifIFD | Exif heap
    ifd0_size = 2 + 12 * len(ifd0_fields) + 4
    ifd0_off = 8
    heap0_off = ifd0_off + ifd0_size
    heap0 = bytearray()
    entries0 = [
        _entry(order, t, typ, v, heap0_off, heap0)
        for (t, typ, v) in ifd0_fields
        if t != TAG_EXIF_IFD
    ]
    exif_off = heap0_off + len(heap0)
    entries0.append(
        struct.pack(order + "HHI", TAG_EXIF_IFD, 4, 1)
        + struct.pack(order + "I", exif_off)
    )
    entries0.sort(key=lambda e: struct.unpack(order + "H", e[:2])[0])
    exif_size = 2 + 12 * len(exif_fields) + 4
    heap1_off = exif_off + exif_size
    heap1 = bytearray()
    entries1 = [
        _entry(order, t, typ, v, heap1_off, heap1)
        for (t, typ, v) in exif_fields
    ]
    header = byte_order.encode("ascii") + struct.pack(
        order + "HI", 42, ifd0_off
    )
    ifd0 = (
        struct.pack(order + "H", len(entries0))
        + b"".join(entries0)
        + struct.pack(order + "I", 0)
    )
    exif_ifd = (
        struct.pack(order + "H", len(entries1))
        + b"".join(entries1)
        + struct.pack(order + "I", 0)
    )
    return header + ifd0 + bytes(heap0) + exif_ifd + bytes(heap1)


def build_exif_jpeg(**fields) -> bytes:
    """Minimal JPEG container carrying the Exif APP1: SOI, APP1, EOI.
    Enough structure for any marker-walking reader; the pixel payload is
    out of scope here (dataops/jpeg.py owns real pixel decode)."""
    tiff = build_tiff_exif(**fields)
    app1 = b"Exif\x00\x00" + tiff
    if len(app1) + 2 > 0xFFFF:
        raise ValueError("exif: APP1 payload exceeds segment size")
    return (
        b"\xff\xd8"
        + b"\xff\xe1"
        + struct.pack(">H", len(app1) + 2)
        + app1
        + b"\xff\xd9"
    )


# --- parser ----------------------------------------------------------------------


def _read_ifd(data: bytes, order: str, off: int) -> dict[int, tuple]:
    """tag -> (type, count, raw value bytes) for one IFD; bounds-checked."""
    if off + 2 > len(data):
        raise ValueError("exif: IFD offset past end")
    (n,) = struct.unpack_from(order + "H", data, off)
    if n > _MAX_ENTRIES:
        raise ValueError("exif: IFD entry count exceeds cap")
    if off + 2 + 12 * n + 4 > len(data):
        raise ValueError("exif: IFD truncated")
    out: dict[int, tuple] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(order + "HHI", data, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown type: skip the entry, not the file
        total = size * count
        if total <= 4:
            raw = data[base + 8 : base + 8 + total]
        else:
            (voff,) = struct.unpack_from(order + "I", data, base + 8)
            if voff + total > len(data):
                raise ValueError("exif: value offset past end")
            raw = data[voff : voff + total]
        out[tag] = (typ, count, raw)
    return out


def _ascii(entry) -> str | None:
    if entry is None or entry[0] != 2:
        return None
    return entry[2].split(b"\x00", 1)[0].decode("ascii", "replace")


def _uint(entry, order: str) -> int | None:
    if entry is None or entry[0] not in (3, 4) or entry[1] < 1:
        return None
    fmt = "H" if entry[0] == 3 else "I"
    return struct.unpack_from(order + fmt, entry[2], 0)[0]


def _rational(entry, order: str) -> tuple[int, int] | None:
    if entry is None or entry[0] != 5 or len(entry[2]) < 8:
        return None
    n, d = struct.unpack_from(order + "II", entry[2], 0)
    return n, d


def parse_exif(payload: bytes) -> dict:
    """The selected-tag dict of a JPEG's Exif APP1 (make, model,
    orientation, x_resolution num/den, datetime, exposure num/den, iso,
    pixel_x, byte_order).  Raises ValueError on any structural problem —
    no JPEG SOI, no Exif APP1 before SOS, bad TIFF header, out-of-range
    offsets — so the kernel above maps it to the strict/null contract."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG (no SOI)")
    pos = 2
    tiff = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("exif: marker desync")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        if seg_len < 2 or pos + 2 + seg_len > len(payload):
            raise ValueError("exif: segment length past end")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        if marker == 0xDA:  # SOS: entropy data follows, no APP1 found
            break
        pos += 2 + seg_len
    if tiff is None:
        raise ValueError("exif: no Exif APP1 segment")
    if len(tiff) < 8:
        raise ValueError("exif: TIFF header truncated")
    bo = tiff[:2]
    if bo == b"II":
        order = "<"
    elif bo == b"MM":
        order = ">"
    else:
        raise ValueError("exif: bad TIFF byte order")
    magic, ifd0_off = struct.unpack_from(order + "HI", tiff, 2)
    if magic != 42:
        raise ValueError("exif: bad TIFF magic")
    ifd0 = _read_ifd(tiff, order, ifd0_off)
    exif_ifd: dict[int, tuple] = {}
    ptr = _uint(ifd0.get(TAG_EXIF_IFD), order)
    if ptr is not None:
        exif_ifd = _read_ifd(tiff, order, ptr)
    xres = _rational(ifd0.get(TAG_X_RESOLUTION), order)
    expo = _rational(exif_ifd.get(TAG_EXPOSURE_TIME), order)
    return {
        "byte_order": bo.decode("ascii"),
        "make": _ascii(ifd0.get(TAG_MAKE)),
        "model": _ascii(ifd0.get(TAG_MODEL)),
        "orientation": _uint(ifd0.get(TAG_ORIENTATION), order),
        "x_res_num": xres[0] if xres else None,
        "x_res_den": xres[1] if xres else None,
        "datetime": _ascii(ifd0.get(TAG_DATETIME)),
        "exposure_num": expo[0] if expo else None,
        "exposure_den": expo[1] if expo else None,
        "iso": _uint(exif_ifd.get(TAG_ISO), order),
        "pixel_x": _uint(exif_ifd.get(TAG_PIXEL_X), order),
    }


_SCHEMA = (
    "media_id long, byte_order string, make string, model string, "
    "orientation int, x_res_num long, x_res_den long, datetime string, "
    "exposure_num long, exposure_den long, iso int, pixel_x long"
)

_COLS = [
    "media_id", "byte_order", "make", "model", "orientation",
    "x_res_num", "x_res_den", "datetime", "exposure_num",
    "exposure_den", "iso", "pixel_x",
]


def exif_metadata(media: DataFrame, strict: bool = False) -> DataFrame:
    """(media_id, byte_order, make, model, orientation, x_res_num/den,
    datetime, exposure_num/den, iso, pixel_x): EXIF capture metadata per
    JPEG payload over mapInPandas — the provenance/orientation/PII-scan
    projection of an image corpus.  Non-JPEG / Exif-less / structurally
    corrupt payloads: strict raises, default emits nulls (rows kept so
    joins see every media_id) — the multimodal error-as-value contract."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = None
                if payload is not None and len(payload) > 0:
                    try:
                        meta = parse_exif(bytes(payload))
                    except ValueError:
                        if strict:
                            raise
                if meta is None:
                    if strict:
                        raise NotImplementedError(
                            "exif_metadata: payload has no parseable Exif "
                            "APP1; run with strict=False for null rows"
                        )
                    rows.append((media_id,) + (None,) * 11)
                    continue
                rows.append((media_id,) + tuple(meta[c] for c in _COLS[1:]))
            yield pd.DataFrame(rows, columns=_COLS)

    return media.select("media_id", "payload").mapInPandas(kernel, _SCHEMA)
