"""PDF branch: magic-byte detection + text extraction from content streams.

Recast of the reference's convert-pdf preprocessor
(/root/reference/convert-pdf.go:23-77), which shells out to Ghostscript
(gs args at convert-pdf.go:51-62) to turn a PDF into a TIFF for tesseract.
Here the PDF payload is routed by magic bytes and its text-show operators
are read directly: no subprocess, fully vectorizable.

Scope (frozen, v1): uncompressed content streams with literal-string text
operators — ``(...) Tj`` and ``(...) '``. Each text-show op becomes one
line; lines joined with '\\n'. Escapes \\( \\) \\\\ \\n \\r \\t are decoded.
Compressed streams (FlateDecode etc.) would need zlib — detected and
reported as status='error:pdf-unsupported' rather than wrong output.
"""

from __future__ import annotations

import re

PDF_MAGIC = b"%PDF"

# (...) Tj  or  (...) '   — literal string followed by a text-show operator.
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*(?:Tj|')")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[[^\]]*?/FlateDecode|/FlateDecode)")

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


def extract_pdf_text(raw: bytes) -> str:
    """Extract text-show strings from an uncompressed PDF, one per line.

    Raises ValueError for compressed streams (caller maps it to an error
    status column — error-as-value, /root/reference/ocr_rpc_worker.go:163-190).
    """
    raw = bytes(raw)
    if not is_pdf(raw):
        raise ValueError("not a PDF payload")
    if _FLATE_RE.search(raw):
        raise ValueError("pdf-unsupported: compressed content stream")
    lines = []
    for match in _TJ_RE.finditer(raw):
        s = _ESC_RE.sub(lambda m: _ESCAPES[m.group(0)], match.group(1))
        lines.append(s.decode("utf-8", errors="replace"))
    return "\n".join(lines)
