"""RTF text extraction: Microsoft Rich Text Format through a pure-Python
group-stack tokenizer.

Third document-conversion branch of the extraction kernel (after PDF in
kernels/pdf_text.py and OOXML/ODF in kernels/docx_text.py; reference
parity: tleyden/open-ocr converts non-image payloads through its
preprocessor chain before OCR, /root/reference/ocr_request.go:21-31).
Web crawls still meet .rtf constantly — it was the default exchange
format for a decade of word processors and mail clients.

Scope (the text layer of the RTF 1.9 specification):
- header detection ``{\\rtf`` (is_rtf), ``\\ansicpgN`` codepage switch;
- group stack ``{ }`` with per-group state (``\\ucN`` skip count,
  destination skipping) saved and restored;
- control words: ``\\par`` -> paragraph separator (blank line, matching
  the DOCX branch's convention), ``\\line`` -> newline, ``\\tab`` -> TAB,
  the typographic set (em/en dash, smart quotes, bullet, spaces);
- escapes: ``\\\\ \\{ \\}`` literal, ``\\'xx`` codepage byte,
  ``\\~ \\_ \\-`` specials, escaped CR/LF = ``\\par``;
- Unicode: ``\\uN`` (negative N + 65536), surrogate pairs combined,
  ``\\ucN`` fallback characters skipped (plain or ``\\'xx`` forms);
- ``\\binN`` raw-byte runs skipped byte-exactly;
- ignorable destinations ``{\\*...}`` and the known non-text
  destinations (fonttbl, colortbl, stylesheet, info, pict, ...) skipped
  wholesale; everything unrecognised is formatting and ignored.

``build_rtf`` is the writer twin: the minimal RTF document whose
extract_rtf_text output is exactly ``'\\n\\n'.join(paragraphs)`` — it
emits ``\\par`` only BETWEEN paragraphs (separator convention), so
fixtures, property tests, and the driver oracle roundtrip any paragraph
list, including empty ones.
"""

from __future__ import annotations

import codecs

# destinations whose content is never body text (RTF 1.9 §"Destinations");
# \* marks every other ignorable destination
_DEST_SKIP = frozenset(
    {
        "fonttbl", "colortbl", "stylesheet", "listtable", "listoverridetable",
        "info", "pict", "object", "header", "footer", "headerl", "headerr",
        "headerf", "footerl", "footerr", "footerf", "footnote", "ftnsep",
        "ftnsepc", "ftncn", "aftnsep", "aftnsepc", "aftncn", "fldinst",
        "xmlnstbl", "themedata", "colorschememapping", "datastore",
        "latentstyles", "generator", "revtbl", "rsidtbl", "mmathPr",
        "background", "docvar", "bkmkstart", "bkmkend",
    }
)

# control words that emit a fixed character
_WORD_CHARS = {
    "line": "\n",
    "tab": "\t",
    "emdash": "—",
    "endash": "–",
    "lquote": "‘",
    "rquote": "’",
    "ldblquote": "“",
    "rdblquote": "”",
    "bullet": "•",
    "emspace": " ",
    "enspace": " ",
    "qmspace": " ",
    "sect": "\n\n",  # section break implies a paragraph break
    "page": "\n\n",
}

_ALPHA = frozenset(range(0x41, 0x5B)) | frozenset(range(0x61, 0x7B))
_DIGIT = frozenset(range(0x30, 0x3A))


def is_rtf(payload: bytes) -> bool:
    """True iff the payload starts with the RTF group header."""
    return bytes(payload[:5]) == b"{\\rtf"


def extract_rtf_text(payload: bytes) -> str:
    """Plain text of the RTF body: paragraphs separated by blank lines
    (``\\par`` is a separator), ``\\line``/``\\tab`` literal, Unicode
    and codepage escapes decoded, non-text destinations skipped.
    Raises ValueError when the header is missing."""
    data = bytes(payload)
    if data[:5] != b"{\\rtf":
        raise ValueError("rtf: missing {\\rtf header")
    n = len(data)
    i = 0
    out: list[str] = []
    codec = "cp1252"  # RTF default is \ansi; cpg overrides below
    uc = 1  # \ucN fallback length, per-group
    skip = False  # inside a non-text destination group
    pending = 0  # \uN fallback characters left to skip
    high = 0  # stashed high surrogate from \uN
    stack: list[tuple[int, bool]] = []

    def flush_high() -> None:
        nonlocal high
        if high:
            out.append("�")  # lone high surrogate: not representable
            high = 0

    while i < n:
        c = data[i]
        if c == 0x7B:  # {
            stack.append((uc, skip))
            pending = 0
            i += 1
            if data[i : i + 2] == b"\\*":
                skip = True
        elif c == 0x7D:  # }
            pending = 0
            if not stack:
                break  # tolerate an unbalanced close at top level
            uc, skip = stack.pop()
            i += 1
        elif c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            c2 = data[i]
            if c2 in _ALPHA:  # control word
                j = i
                while j < n and data[j] in _ALPHA:
                    j += 1
                word = data[i:j].decode("ascii")
                k = j
                param = None
                if k < n and (data[k] == 0x2D or data[k] in _DIGIT):
                    m = k + 1 if data[k] == 0x2D else k
                    while m < n and data[m] in _DIGIT:
                        m += 1
                    if m > k + (1 if data[k] == 0x2D else 0):
                        param = int(data[k:m])
                        k = m
                if k < n and data[k] == 0x20:  # delimiter space is eaten
                    k += 1
                i = k
                if word == "bin":  # raw bytes follow even inside skips
                    i += max(param or 0, 0)
                    continue
                if word == "u":
                    if skip:
                        continue
                    cp = param if param is not None else 0
                    if cp < 0:
                        cp += 65536
                    cp &= 0xFFFF
                    if 0xD800 <= cp <= 0xDBFF:
                        flush_high()
                        high = cp
                    elif 0xDC00 <= cp <= 0xDFFF:
                        if high:
                            out.append(
                                chr(
                                    0x10000
                                    + ((high - 0xD800) << 10)
                                    + (cp - 0xDC00)
                                )
                            )
                            high = 0
                        else:
                            out.append("�")
                    else:
                        flush_high()
                        out.append(chr(cp))
                    pending = uc  # skip the ANSI fallback that follows
                    continue
                pending = 0  # any other control word ends a fallback run
                if skip:
                    continue
                if word == "uc":
                    uc = max(param or 0, 0)
                elif word == "ansicpg":
                    try:
                        codec = codecs.lookup(f"cp{param}").name
                    except LookupError:
                        pass
                elif word == "par":
                    flush_high()
                    out.append("\n\n")
                elif word in _WORD_CHARS:
                    flush_high()
                    out.append(_WORD_CHARS[word])
                elif word in _DEST_SKIP:
                    skip = True
                # everything else is formatting: ignored
            else:  # control symbol
                i += 1
                if c2 == 0x27:  # \'xx codepage byte
                    hx = data[i : i + 2]
                    i += 2
                    if skip:
                        continue
                    if pending:
                        pending -= 1
                        continue
                    try:
                        b = bytes([int(hx, 16)])
                    except ValueError:
                        continue
                    flush_high()
                    out.append(b.decode(codec, "replace"))
                    continue
                if skip:
                    continue
                if pending:
                    pending -= 1
                    continue
                if c2 in (0x5C, 0x7B, 0x7D):  # \\ \{ \}
                    flush_high()
                    out.append(chr(c2))
                elif c2 == 0x7E:  # \~ non-breaking space
                    flush_high()
                    out.append(" ")
                elif c2 == 0x5F:  # \_ non-breaking hyphen
                    flush_high()
                    out.append("‑")
                elif c2 == 0x2D:  # \- optional hyphen: no text
                    pass
                elif c2 in (0x0D, 0x0A):  # escaped newline == \par
                    flush_high()
                    out.append("\n\n")
                elif c2 == 0x2A:  # \* outside group start: ignorable dest
                    skip = True
                # other symbols are formatting: ignored
        elif c in (0x0D, 0x0A, 0x00):  # raw CR/LF/NUL never reach text
            i += 1
        else:
            ch = chr(c) if c < 0x80 else data[i : i + 1].decode(codec, "replace")
            i += 1
            if skip:
                continue
            if pending:
                pending -= 1
                continue
            flush_high()
            out.append(ch)
    flush_high()
    return "".join(out)


def _escape(s: str) -> str:
    pieces: list[str] = []
    for ch in s:
        cp = ord(ch)
        if ch in "\\{}":
            pieces.append("\\" + ch)
        elif ch == "\t":
            pieces.append("\\tab ")
        elif ch == "\n":
            pieces.append("\\line ")
        elif 0x20 <= cp <= 0x7E:
            pieces.append(ch)
        elif cp <= 0xFFFF:
            pieces.append(f"\\u{cp - 65536 if cp > 32767 else cp}?")
        else:  # astral plane: \u is 16-bit, emit the surrogate pair
            enc = ch.encode("utf-16-be")
            for o in (0, 2):
                unit = int.from_bytes(enc[o : o + 2], "big")
                pieces.append(f"\\u{unit - 65536 if unit > 32767 else unit}?")
    return "".join(pieces)


def build_rtf(paragraphs: list[str]) -> bytes:
    """Writer twin: minimal RTF whose extract_rtf_text output is exactly
    '\\n\\n'.join(paragraphs).  Non-ASCII goes out as \\uN? (uc1), tabs
    and newlines inside a paragraph as \\tab / \\line, and \\par appears
    only between paragraphs."""
    body = "\\par ".join(_escape(p) for p in paragraphs)
    doc = (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1"
        "{\\fonttbl{\\f0\\froman Times New Roman;}}"
        "{\\colortbl;\\red0\\green0\\blue0;}"
        "{\\*\\generator open_ocr_spark rtf twin;}"
        "\\pard\\plain " + body + "}"
    )
    return doc.encode("ascii")
