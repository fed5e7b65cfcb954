"""Text reflow: de-hyphenation + hard-line-wrap removal.

Extracted text from PDFs and column-layout pages (the A9/A10 kernel
family, recast from the reference's convert-pdf.go + tesseract engine —
`/root/reference/convert-pdf.go:23-77`, `tesseract_engine.go:98-128`,
whose OCR output is hard-wrapped at the glyph-line level) arrives with
layout artifacts a training corpus must not keep: words hyphen-split at
line ends, hard newlines inside sentences, soft hyphens (U+00AD) left
from justification engines. Reflow undoes exactly that while keeping
real paragraph structure.

The chain (order matters; every regex is in the common Java-regex /
RE2 subset — no lookaround, captures only in replacements — so DuckDB
replays it EXACTLY):

1. newline normalization: ``\\r\\n?`` -> ``\\n``; soft hyphens deleted.
2. paragraph protect: runs of 2+ newlines (blank lines, with interior
   horizontal space) collapse to one ``\\x1d`` paragraph mark.
3. de-hyphenation (single newlines only, after step 2):
   ``([a-z])-\\n[ \\t]*([a-z])`` -> ``$1$2`` — a lowercase letter,
   hyphen, line break, lowercase continuation is a wrap-hyphenated
   word and the hyphen is spurious;
   ``-\\n[ \\t]*([A-Z0-9])`` -> ``-$1`` — an uppercase/digit
   continuation (Navier-\\nStokes, ISO-\\n8859) is a real compound:
   join the lines but KEEP the hyphen.
4. unwrap: remaining ``[ \\t]*\\n[ \\t]*`` -> one space.
5. restore paragraph marks: ``\\x1d`` -> ``\\n\\n``; trim.

Documented tradeoff (pinned by tests): hyphenation is judged on the
ASCII letter classes only — a wrap hyphen between non-ASCII letters
survives as ``-`` + space after step 4. RE2 lacks lookaround so a
dictionary check ("is the joined form a word?") is out of scope; the
lowercase/uppercase split above is the standard layout-only heuristic.

Scale: a pure-Catalyst projection — five regexp_replace + one
translate, zero Python, no shuffle, whole-stage codegen end to end;
at 100 TB this rides the extraction scan untouched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# step 1
_CRLF_RE = r"\r\n?"
# step 2 — two-or-more newlines with horizontal space between them
_PARA_RE = "\n[ \t]*(\n[ \t]*)+"
# step 3
_HYPH_LOWER_RE = "([a-z])-\n[ \t]*([a-z])"
_HYPH_COMPOUND_RE = "-\n[ \t]*([A-Z0-9])"
# step 4
_UNWRAP_RE = "[ \t]*\n[ \t]*"

_PARA_MARK = "\x1d"
_SOFT_HYPHEN = "\u00ad"  # soft hyphen


def reflow_text(text: Column) -> Column:
    """The reflowed string (paragraphs separated by exactly one blank
    line, no intra-paragraph newlines, wrap hyphens healed)."""
    t = F.regexp_replace(text, _CRLF_RE, "\n")
    t = F.translate(t, _SOFT_HYPHEN, "")
    t = F.regexp_replace(t, _PARA_RE, _PARA_MARK)
    t = F.regexp_replace(t, _HYPH_LOWER_RE, "$1$2")
    t = F.regexp_replace(t, _HYPH_COMPOUND_RE, "-$1")
    t = F.regexp_replace(t, _UNWRAP_RE, " ")
    return F.trim(F.regexp_replace(t, _PARA_MARK, "\n\n"))


def n_paragraphs(text: Column) -> Column:
    """Paragraph count of the reflowed form, computed from the mark
    stage (mark count + 1 on non-empty text) — no second reflow pass."""
    t = F.regexp_replace(text, _CRLF_RE, "\n")
    t = F.translate(t, _SOFT_HYPHEN, "")
    t = F.regexp_replace(t, _PARA_RE, _PARA_MARK)
    t = F.trim(t)
    marks = F.length(t) - F.length(F.translate(t, _PARA_MARK, ""))
    return (
        F.when(F.length(t) == 0, F.lit(0)).otherwise(marks + 1)
    ).cast("long")


def reflow_oracle_sql(source_expr: str) -> str:
    """DuckDB replay of the SAME chain over ``source_expr`` (a SQL
    expression producing (doc_id, text) rows). RE2 regexes, ``\\1``
    backreference replacements, chr(29) paragraph mark."""
    return f"""
        WITH src AS ({source_expr}),
        step AS (
            SELECT doc_id,
                   regexp_replace(
                       replace(
                           regexp_replace(text, '\r\n?', chr(10), 'g'),
                           chr(173), ''),
                       '\n[ \t]*(\n[ \t]*)+', chr(29), 'g') AS marked
            FROM src
        )
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(marked,
                               '([a-z])-\n[ \t]*([a-z])', '\\1\\2', 'g'),
                           '-\n[ \t]*([A-Z0-9])', '-\\1', 'g'),
                       '[ \t]*\n[ \t]*', ' ', 'g'),
                   chr(29), chr(10) || chr(10), 'g')) AS reflowed,
               CASE WHEN length(trim(marked)) = 0 THEN 0
                    ELSE length(trim(marked))
                         - length(replace(trim(marked), chr(29), '')) + 1
               END::BIGINT AS n_paras
        FROM step
        ORDER BY doc_id
    """
