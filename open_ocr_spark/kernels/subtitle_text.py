"""Subtitle extraction branch: SubRip (.srt) and WebVTT (.vtt).

Subtitle files are the transcript layer of the web's video corpus —
for a training-data pipeline they are often the only text a video
document carries, which makes "recover the text" for them exactly the
cue text in cue order, with the timing/markup machinery dropped.

From-scratch parsers over the public formats (SubRip's de-facto
grammar; WebVTT, W3C https://www.w3.org/TR/webvtt1/). Deterministic
rendering rules, pinned by the writer twins + unit fixtures:

- cues render in file order; multi-line cue text keeps its internal
  line breaks; cues are joined by blank lines (the house paragraph
  join);
- the cue index line (SRT), cue identifier line (VTT), and timestamp
  lines are machinery, not content — dropped;
- WebVTT NOTE / STYLE / REGION blocks and the header block are
  dropped;
- inline markup is stripped: in WebVTT every ``<...>`` span is markup
  by grammar (a literal ``<`` must be ``&lt;``), so voice/class spans
  and mid-cue ``<00:01:02.000>`` karaoke timestamps all reduce to
  their text; SubRip has NO escaping mechanism, so only the de-facto
  formatting tags (``<i> <b> <u> <s> <font>``) strip there and
  angle-bracket prose ("x < y") survives;
- the three WebVTT character references that survive tag stripping
  unescape (``&amp;`` ``&lt;`` ``&gt;``), ``&nbsp;`` becomes a plain
  space.

Totality: the sniffs are structural (SRT needs an index line AND a
``-->`` timestamp line; VTT needs the WEBVTT magic), so numbered lists
and prose never route here; extractors raise ValueError only.
"""

from __future__ import annotations

import re

_MAX_CUES = 100_000  # hostile-input cap

# hours take "two or more digits" in WebVTT (and long SRT streams pass
# 99h), so the hour field is \d+ rather than \d{1,2}
_SRT_TS = re.compile(
    r"^\s*\d+:\d{2}:\d{2}[,.]\d{3}\s*-->\s*\d+:\d{2}:\d{2}[,.]\d{3}"
)
_VTT_TS = re.compile(
    r"^\s*(?:\d+:)?\d{2}:\d{2}\.\d{3}\s*-->\s*(?:\d+:)?\d{2}:\d{2}\.\d{3}"
)
_TAG = re.compile(r"<[^>\n]*>")
# SubRip has NO escaping mechanism, so a bare '<' can be prose ("x < y")
# — only the de-facto formatting tags strip there, unlike WebVTT where
# the grammar requires '&lt;' for a literal '<'
_SRT_TAG = re.compile(r"</?(?:i|b|u|s|font)\b[^>\n]*>", re.IGNORECASE)


def _decode(payload: bytes) -> str:
    text = payload.decode("utf-8", errors="replace")
    if text[:1] == "﻿":
        text = text[1:]
    return text.replace("\r\n", "\n").replace("\r", "\n")


def is_srt(payload: bytes) -> bool:
    """First non-blank line is a bare cue index, the next is a SubRip
    timestamp line — prose and numbered lists fail the pair."""
    lines = _decode(payload[:512]).split("\n")
    i = 0
    while i < len(lines) and not lines[i].strip():
        i += 1
    if i + 1 >= len(lines) or not lines[i].strip().isdigit():
        return False
    return bool(_SRT_TS.match(lines[i + 1]))


def is_webvtt(payload: bytes) -> bool:
    head = _decode(payload[:16])
    return head[:6] == "WEBVTT" and head[6:7] in ("", "\n", " ", "\t")


def _clean(line: str) -> str:
    """WebVTT cleaning: strip markup spans, then unescape the character
    references the grammar defines. SRT cues use _clean_srt — SubRip
    has no escaping, so its bytes are content and never unescape."""
    line = _TAG.sub("", line)
    return (
        line.replace("&nbsp;", " ")
        .replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&amp;", "&")
    )


def _clean_srt(line: str) -> str:
    return _SRT_TAG.sub("", line)


def extract_srt_text(payload: bytes) -> str:
    """Cue texts in order, blank-line separated. ValueError only."""
    blocks = re.split(r"\n\s*\n", _decode(payload))
    if len(blocks) > _MAX_CUES:
        raise ValueError(f"srt cue count exceeds {_MAX_CUES}")
    cues: list[str] = []
    for block in blocks:
        lines = block.split("\n")
        # machinery = leading blanks, at most ONE index line directly
        # before the timestamp line, and the timestamp line itself —
        # a digit-only line AFTER the timestamps is cue text ("2024")
        while lines and not lines[0].strip():
            lines.pop(0)
        if (
            len(lines) >= 2
            and lines[0].strip().isdigit()
            and _SRT_TS.match(lines[1])
        ):
            lines.pop(0)
        if lines and _SRT_TS.match(lines[0]):
            lines.pop(0)
        text = "\n".join(
            _clean_srt(ln).rstrip() for ln in lines
        ).strip("\n")
        if text.strip():
            cues.append(text)
    if not cues:
        raise ValueError("srt payload has no cue text")
    return "\n\n".join(cues)


def extract_webvtt_text(payload: bytes) -> str:
    """Cue texts in order, blank-line separated; header and NOTE/STYLE/
    REGION blocks dropped. ValueError only."""
    text = _decode(payload)
    if text[:6] != "WEBVTT":
        raise ValueError("missing WEBVTT magic")
    blocks = re.split(r"\n\s*\n", text)
    if len(blocks) > _MAX_CUES:
        raise ValueError(f"vtt cue count exceeds {_MAX_CUES}")
    cues: list[str] = []
    for bi, block in enumerate(blocks):
        lines = block.split("\n")
        if bi == 0:
            # the header block: drop the WEBVTT line; if a cue follows
            # WITHOUT a blank separator (malformed but common), the
            # remaining lines flow through the normal cue path, and a
            # pure header (metadata, no -->) falls out naturally
            lines = lines[1:]
        first = lines[0].strip() if lines else ""
        if re.match(r"(?:NOTE|STYLE|REGION)(?:\s|$)", first):
            continue
        # optional cue identifier (a line without -->) then timestamps
        while lines and "-->" not in lines[0]:
            lines.pop(0)
        if not lines or not _VTT_TS.match(lines[0]):
            continue
        lines.pop(0)  # the timestamp/settings line
        cue = "\n".join(_clean(ln).rstrip() for ln in lines).strip("\n")
        if cue.strip():
            cues.append(cue)
    if not cues:
        raise ValueError("vtt payload has no cue text")
    return "\n\n".join(cues)


def _fmt_ts(ms: int, sep: str) -> str:
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, frac = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{frac:03d}"


def build_srt(cues: list[tuple[int, int, str]]) -> bytes:
    """Writer twin: (start_ms, end_ms, text) cues in SubRip wire form
    (1-based indices, comma milliseconds, CRLF line breaks)."""
    out = []
    for i, (start, end, text) in enumerate(cues, start=1):
        out.append(
            f"{i}\r\n{_fmt_ts(start, ',')} --> {_fmt_ts(end, ',')}\r\n"
            + text.replace("\n", "\r\n")
        )
    return ("\r\n\r\n".join(out) + "\r\n").encode("utf-8")


def build_webvtt(cues: list[tuple[int, int, str]], *,
                 note: str | None = None) -> bytes:
    """Writer twin: WEBVTT header (+ optional NOTE block) then cues
    with dot milliseconds and per-cue identifiers."""
    out = ["WEBVTT - fixture"]
    if note is not None:
        out.append("NOTE " + note)
    for i, (start, end, text) in enumerate(cues, start=1):
        out.append(
            f"cue-{i}\n{_fmt_ts(start, '.')} --> {_fmt_ts(end, '.')}"
            " align:start\n" + text
        )
    return ("\n\n".join(out) + "\n").encode("utf-8")
