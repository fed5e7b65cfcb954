"""PDF branch: magic-byte detection + text extraction from content streams.

Recast of the reference's convert-pdf preprocessor
(/root/reference/convert-pdf.go:23-77), which shells out to Ghostscript
(gs args at convert-pdf.go:51-62) to turn a PDF into a TIFF for tesseract.
Here the PDF payload is routed by magic bytes and its text-show operators
are read directly: no subprocess, fully vectorizable.

Scope (v2): literal-string text operators — ``(...) Tj`` and ``(...) '`` —
in uncompressed content streams OR FlateDecode-compressed stream objects
(inflated with stdlib zlib, matching the reference's ability to take any
real-world PDF via Ghostscript). Each text-show op becomes one line; lines
joined with '\\n'. Escapes \\( \\) \\\\ \\n \\r \\t are decoded. Streams
declaring any other filter (DCTDecode, LZWDecode, filter chains, ...) are
detected and reported as status='error:pdf-unsupported' rather than wrong
output.
"""

from __future__ import annotations

import re
import zlib

PDF_MAGIC = b"%PDF"

# (...) Tj  or  (...) '   — literal string followed by a text-show operator.
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')")

# Stream body start; the body itself is sliced by /Length when declared
# (binary bodies may contain 'endstream' or end in '\r', so a pure
# regex-to-endstream cut can corrupt them), with a non-greedy scan to
# `endstream` as the fallback (PDF 32000-1:2008 §7.3.8).
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_STREAM_FALLBACK_RE = re.compile(rb"(.*?)(?:\r?\n)?endstream", re.DOTALL)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_ENDSTREAM_AT_RE = re.compile(rb"(?:\r?\n)?endstream")

# /Filter value in the stream's own dict: a single name or an array of names.
_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")

_ESCAPES = {
    b"\\(": b"(",
    b"\\)": b")",
    b"\\\\": b"\\",
    b"\\n": b"\n",
    b"\\r": b"\r",
    b"\\t": b"\t",
}
_ESC_RE = re.compile(rb"\\[()\\nrt]")


def is_pdf(raw: bytes | None) -> bool:
    """Magic-byte test, the routing predicate for the PDF stage (the graft's
    equivalent of sending to the convert-pdf queue)."""
    return raw is not None and bytes(raw[:4]) == PDF_MAGIC


def _inflate_streams(raw: bytes) -> bytes:
    """Replace each FlateDecode stream body with its inflated bytes.

    The filter is read from the stream's own object dict (the bytes between
    the enclosing ``obj`` keyword and ``stream``). Unfiltered streams pass
    through untouched; any other declared filter raises ValueError so the
    caller maps it to error-as-value, mirroring how the reference surfaces
    Ghostscript failures (/root/reference/ocr_rpc_worker.go:163-190).
    """
    out = []
    pos = 0
    for m in _STREAM_START_RE.finditer(raw):
        if m.start() < pos:
            continue  # keyword bytes inside an already-consumed body
        obj_start = raw.rfind(b"obj", 0, m.start())
        head = raw[obj_start if obj_start >= 0 else 0 : m.start()]
        body_start = m.end()

        body = end = None
        fm = _FILTER_RE.search(head)
        lm = _LENGTH_RE.search(head)
        if lm:
            cand = body_start + int(lm.group(1))
            tm = _ENDSTREAM_AT_RE.match(raw, cand)
            if tm:
                body, end = raw[body_start:cand], tm.end()
        if body is None:
            if fm:
                # a FILTERED body is binary: cutting it at the first
                # 'endstream' byte pattern can truncate it mid-stream and
                # leak garbage back into the document scan — refuse
                # (error-as-value) instead of risking wrong output.
                # Reaching here means /Length was absent, indirect
                # ('/Length 5 0 R') or wrong.
                raise ValueError(
                    "pdf-unsupported: filtered stream without usable /Length"
                )
            fbm = _STREAM_FALLBACK_RE.match(raw, body_start)
            if not fbm:
                continue  # truncated stream: leave bytes untouched
            body, end = fbm.group(1), fbm.end()

        if fm:
            names = _NAME_RE.findall(fm.group(1))
            if names == [b"FlateDecode"]:
                try:
                    body = zlib.decompress(body)
                except zlib.error as exc:
                    raise ValueError(
                        f"pdf-unsupported: corrupt flate stream ({exc})"
                    ) from exc
            else:
                pretty = b",".join(names).decode("ascii", errors="replace")
                raise ValueError(f"pdf-unsupported: filter {pretty}")
        out.append(raw[pos : m.start()])
        out.append(b"stream\n")
        out.append(body)
        out.append(b"\nendstream")
        pos = end
    out.append(raw[pos:])
    return b"".join(out)


def extract_pdf_text(raw: bytes) -> str:
    """Extract text-show strings from a PDF payload, one per line.

    FlateDecode streams are inflated in-process (stdlib zlib); other
    declared filters raise ValueError, which the caller maps to an error
    status column (error-as-value, /root/reference/ocr_rpc_worker.go:163-190).
    """
    raw = bytes(raw)
    if not is_pdf(raw):
        raise ValueError("not a PDF payload")
    if b"stream" in raw:
        raw = _inflate_streams(raw)
    lines = []
    for match in _TJ_RE.finditer(raw):
        s = _ESC_RE.sub(lambda m: _ESCAPES[m.group(0)], match.group(1))
        lines.append(s.decode("utf-8", errors="replace"))
    return "\n".join(lines)
