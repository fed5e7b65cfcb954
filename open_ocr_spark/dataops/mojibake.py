"""Mojibake detection + repair (UTF-8 read as Latin-1/Windows-1252).

The single most common encoding damage in web corpora (the pattern
ftfy — Speer, "fixing Unicode for fun and profit" — fixes first):
a page was UTF-8, something decoded it as an 8-bit charset, and the
text now shows ``CrÃ¨me brÃ»lÃ©e`` / ``â€™``-style digraphs. The
charset sniffers (kernels/options.py, dataops/mime.py) prevent NEW
damage at extraction time; this operator repairs damage already baked
into upstream text.

The repair is the exact inverse transform, entirely in Catalyst
built-ins — no Python, no UDF:

1. ``translate`` the 27 Windows-1252 presentation forms (U+20AC ..
   U+0178) back down to their C1 byte values U+0080-U+009F (cp1252 is
   how the damage usually RENDERS; the five undefined cp1252 bytes
   pass through as literal C1 controls and need no mapping).
2. gate: the string now reads as a byte sequence (every char would be
   one byte). It is repairable iff that sequence parses as UTF-8 with
   at least one multi-byte sequence — checked with the UTF-8 DFA
   written as a regex over char classes \\x00-\\xF4 (shared Java-regex
   / RE2 subset; a char > U+00FF can match no alternative, so the gate
   also proves `encode` below cannot throw).
3. for gated rows only (CaseWhen is lazy): ``decode(encode(s,
   'ISO-8859-1'), 'UTF-8')`` — chars to bytes, bytes to real text.

All-or-nothing per row, by design: text mixing mojibake with genuine
supplementary-plane chars fails the gate and passes through unchanged
(repairing a substring needs segmentation RE2 can't express, and a
false repair is worse than a miss). Documented false-positive class:
text where EVERY non-ASCII char happens to form valid UTF-8 when read
as Latin-1 bytes (e.g. a page intentionally discussing ``Ã©``) gets
"repaired" — the same tradeoff ftfy accepts, vanishingly rare in
running text because it requires every accent to be followed by a
continuation-range char.

Scale: one translate + two rlike + (on the mojibake subset) one
encode/decode — a shuffle-free whole-stage-codegen projection riding
the extraction scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Windows-1252 0x80-0x9F -> Unicode (the 27 defined positions; 0x81,
# 0x8D, 0x8F, 0x90, 0x9D are undefined and appear as raw C1 controls)
CP1252_TABLE: dict[int, int] = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E,
    0x85: 0x2026, 0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6,
    0x89: 0x2030, 0x8A: 0x0160, 0x8B: 0x2039, 0x8C: 0x0152,
    0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019, 0x93: 0x201C,
    0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A,
    0x9C: 0x0153, 0x9E: 0x017E, 0x9F: 0x0178,
}
_SPECIALS = "".join(chr(v) for v in CP1252_TABLE.values())
_C1 = "".join(chr(k) for k in CP1252_TABLE.keys())

# UTF-8 DFA as a regex over chars-as-bytes (RFC 3629 table); shared
# Java-regex / RE2 subset. Chars > U+00FF match no alternative, so a
# full match guarantees every char fits in one ISO-8859-1 byte.
UTF8_AS_BYTES_RE = (
    "^(?:[\\x00-\\x7f]"
    "|[\\xc2-\\xdf][\\x80-\\xbf]"
    "|\\xe0[\\xa0-\\xbf][\\x80-\\xbf]"
    "|[\\xe1-\\xec][\\x80-\\xbf][\\x80-\\xbf]"
    "|\\xed[\\x80-\\x9f][\\x80-\\xbf]"
    "|[\\xee-\\xef][\\x80-\\xbf][\\x80-\\xbf]"
    "|\\xf0[\\x90-\\xbf][\\x80-\\xbf][\\x80-\\xbf]"
    "|[\\xf1-\\xf3][\\x80-\\xbf][\\x80-\\xbf][\\x80-\\xbf]"
    "|\\xf4[\\x80-\\x8f][\\x80-\\xbf][\\x80-\\xbf]"
    ")*$"
)
# at least one multi-byte lead: pure ASCII is "valid" but not mojibake
_LEAD_RE = "[\\xc2-\\xf4]"


def _pre(text: Column) -> Column:
    return F.translate(text, _SPECIALS, _C1)


def is_mojibake(text: Column) -> Column:
    """True iff the repair gate fires: after cp1252 down-translation the
    string parses as UTF-8 bytes with at least one multi-byte char."""
    p = _pre(text)
    return p.rlike(UTF8_AS_BYTES_RE) & p.rlike(_LEAD_RE)


def repair_mojibake(text: Column) -> Column:
    """The repaired string where the gate fires, the input otherwise."""
    p = _pre(text)
    return F.when(
        p.rlike(UTF8_AS_BYTES_RE) & p.rlike(_LEAD_RE),
        F.decode(F.encode(p, "ISO-8859-1"), "UTF-8"),
    ).otherwise(text)


def corrupt_to_mojibake(text: Column) -> Column:
    """The exact inverse, for fixtures and round-trip tests: UTF-8
    bytes re-read as Latin-1, then rendered the way cp1252 viewers
    render them. ``repair_mojibake(corrupt_to_mojibake(x)) == x`` for
    any x containing at least one non-ASCII char."""
    return F.translate(
        F.decode(F.encode(text, "UTF-8"), "ISO-8859-1"), _C1, _SPECIALS
    )
