"""Homoglyph / zero-width obfuscation skeleton.

Spam and SEO pages evade phrase blocklists and exact dedup by swapping
Latin letters for visually-identical Cyrillic/Greek/fullwidth codepoints
and salting the text with zero-width characters ("pаypal" with a
Cyrillic а, "f​r​e​e" with zero-width spaces). A pipeline's blocklist
gate (dataops/quality_rules.phrase_gate) and exact-dedup keys both need
a canonical SKELETON — the UTS #39 confusables idea, frozen to the
high-frequency table below rather than the full Unicode data file (the
full file is a data dependency; this map covers the Latin-look-alike
classes real spam uses).

Everything is codepoint-1:1, so the whole operator is two ``translate``
calls and three ``length`` calls — pure Catalyst, shuffle-free, and
byte-identically replayable in DuckDB (translate there has the same
map/delete semantics, verified in the tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Zero-width and invisible-control codepoints: deleted outright.
# U+00AD soft hyphen, U+200B..U+200F widths/marks, U+202A..U+202E bidi
# embeds, U+2060 word joiner, U+FEFF BOM/ZWNBSP.
ZERO_WIDTH = (
    "­​‌‍‎‏"
    "‪‫‬‭‮⁠﻿"
)

# Confusable -> ASCII skeleton, 1:1 codepoints. Sources: Cyrillic and
# Greek Latin-look-alikes, fullwidth ASCII. Order is paired with _TO.
_FROM = (
    # Cyrillic lowercase / uppercase look-alikes
    "аеорсхуіј"
    "АВЕКМНОРСТХ"
    # Greek look-alikes
    "οανΑΒΕΗΙΚΜ"
    "ΝΟΡΤΧ"
    # fullwidth digits, upper, lower
    "０１２３４５６７８９"
    "ＡＢＣＤＥＦＧＨＩＪ"
    "ＫＬＭＮＯＰＱＲＳＴ"
    "ＵＶＷＸＹＺ"
    "ａｂｃｄｅｆｇｈｉｊ"
    "ｋｌｍｎｏｐｑｒｓｔ"
    "ｕｖｗｘｙｚ"
)
_TO = (
    "aeopcxyij"
    "ABEKMHOPCTX"
    "oavABEHIKM"
    "NOPTX"
    "0123456789"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
)
assert len(_FROM) == len(_TO)

CONFUSABLES_FROM = _FROM
CONFUSABLES_TO = _TO


def skeleton(col: Column) -> Column:
    """The canonical form: zero-width chars deleted, confusables mapped
    to their ASCII skeleton."""
    return F.translate(
        F.translate(col, ZERO_WIDTH, ""), _FROM, _TO
    )


def confusable_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, skeleton, n_zero_width, n_confusables, obfuscated):
    counts come from length deltas under translate-deletion — no regex,
    no Python."""
    stripped = F.translate(F.col(text_col), ZERO_WIDTH, "")
    n_zw = F.length(text_col) - F.length(stripped)
    n_conf = F.length(stripped) - F.length(F.translate(stripped, _FROM, ""))
    return df.select(
        id_col,
        F.translate(stripped, _FROM, _TO).alias("skeleton"),
        n_zw.alias("n_zero_width"),
        n_conf.alias("n_confusables"),
        ((n_zw + n_conf) > 0).alias("obfuscated"),
    )


def confusable_stats_oracle_sql(source_expr: str) -> str:
    """DuckDB replay over ``source_expr`` rows of (doc_id, text)."""

    def lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    zw, frm, to = lit(ZERO_WIDTH), lit(_FROM), lit(_TO)
    return f"""
        WITH src AS ({source_expr})
        SELECT doc_id,
               translate(translate(text, {zw}, ''), {frm}, {to})
                   AS skeleton,
               length(text) - length(translate(text, {zw}, ''))
                   AS n_zero_width,
               length(translate(text, {zw}, ''))
                   - length(translate(translate(text, {zw}, ''), {frm}, ''))
                   AS n_confusables,
               (length(text) - length(translate(translate(text, {zw}, ''),
                                                {frm}, ''))) > 0
                   AS obfuscated
        FROM src
        ORDER BY doc_id
    """
