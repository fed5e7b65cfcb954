"""Deterministic rule-based sentence segmentation.

Training-data pipelines segment documents into sentences for dedup
granularity, fluency scoring, and chunking (the CCNet/C4 family work
line-level; sentence-level is the finer variant). A model-based
splitter isn't reproducible across engines, so this is a closed-form
rule chain that an independent SQL engine can replay EXACTLY — every
regex below is written in the common subset of Java regex (Spark) and
RE2 (DuckDB): no lookaround, no backreference matching, only capture
groups in replacements.

The chain (order matters):

1. protect known abbreviation periods   (Mr. Dr. No. ...) -> \\x01
2. protect decimal points               3.14              -> \\x02
3. terminator [.!?] + closing quotes/brackets + whitespace
   becomes terminator + \\x1e (the boundary marker)
4. split on \\x1e, trim, drop empties, restore the protected dots

Known tradeoff (documented, pinned by tests): the boundary rule does
NOT require an uppercase follower — RE2 has no lookahead, and the
cross-engine identity of the split is worth more at verification time
than the marginal precision. Unknown abbreviations therefore split.

Scale: a pure-Catalyst projection + one generated-column explode; no
shuffle, no Python, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# \b(...)\. works identically in Java regex and RE2
ABBREVIATIONS = (
    "Mr", "Mrs", "Ms", "Dr", "Prof", "St", "Jr", "Sr", "vs", "No",
    "Inc", "Ltd", "Co", "Fig", "Vol", "Ed", "approx",
)

_ABBR_RE = r"\b(" + "|".join(ABBREVIATIONS) + r")\."
_DECIMAL_RE = r"([0-9])\.([0-9])"
_BOUNDARY_RE = "([.!?][\"')\\]]*)[ \t\n]+"


def _marked(text: Column) -> Column:
    protected = F.regexp_replace(text, _ABBR_RE, "$1\x01")
    protected = F.regexp_replace(protected, _DECIMAL_RE, "$1\x02$2")
    return F.regexp_replace(protected, _BOUNDARY_RE, "$1\x1e")


def split_sentences(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sent_idx, sentence): one row per sentence, ``sent_idx`` the
    position in the split array (stable across engines because both
    keep empty trailing fields before the filter)."""
    arr = F.split(_marked(F.col(text_col)), "\x1e", -1)
    out = (
        df.select(id_col, F.posexplode(arr).alias("sent_idx", "raw"))
        .select(
            id_col,
            "sent_idx",
            F.translate(F.trim(F.col("raw")), "\x01\x02", "..")
            .alias("sentence"),
        )
        .filter(F.length("sentence") > 0)
    )
    return out


def sentence_split_oracle_sql(source_expr: str) -> str:
    """The DuckDB replay of the SAME chain over ``source_expr`` (a SQL
    expression producing (doc_id, text) rows): RE2 regexes, 1-based
    list indexing via an unnested subscript column."""
    abbr = "|".join(ABBREVIATIONS)
    return f"""
        WITH src AS ({source_expr}),
        marked AS (
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(text,
                               '\\b({abbr})\\.', '\\1' || chr(1), 'g'),
                           '([0-9])\\.([0-9])', '\\1' || chr(2) || '\\2',
                           'g'),
                       '([.!?]["'')\\]]*)[ \t\n]+', '\\1' || chr(30), 'g'
                   ) AS m
            FROM src
        ),
        exploded AS (
            SELECT doc_id,
                   generate_subscripts(str_split_regex(m, chr(30)), 1) - 1
                       AS sent_idx,
                   unnest(str_split_regex(m, chr(30))) AS raw
            FROM marked
        )
        SELECT doc_id,
               sent_idx,
               replace(replace(trim(raw), chr(1), '.'), chr(2), '.')
                   AS sentence
        FROM exploded
        WHERE length(trim(raw)) > 0
        ORDER BY doc_id, sent_idx
    """
