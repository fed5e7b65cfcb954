"""Sentence segmentation: rule semantics on Spark, and a hypothesis
differential between a Python replay of the Java-regex chain and the
DuckDB RE2 oracle chain — the two dialects must agree on arbitrary
punctuation-rich text for the contract query to be trustworthy."""

import re

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.dataops.sentences import (
    ABBREVIATIONS,
    _ABBR_RE,
    _BOUNDARY_RE,
    _DECIMAL_RE,
    sentence_split_oracle_sql,
    split_sentences,
)


def _py_split(text: str) -> list[tuple[int, str]]:
    """Python re replay of the exact chain split_sentences builds in
    Catalyst (Python re accepts the same common-subset patterns)."""
    m = re.sub(_ABBR_RE, "\\1\x01", text)
    m = re.sub(_DECIMAL_RE, "\\1\x02\\2", m)
    m = re.sub(_BOUNDARY_RE, "\\1\x1e", m)
    out = []
    for idx, raw in enumerate(m.split("\x1e")):
        # NB: engine trim (Spark and DuckDB alike) strips SPACES only
        s = raw.strip(" ").replace("\x01", ".").replace("\x02", ".")
        if s:
            out.append((idx, s))
    return out


def _duck_split(text: str) -> list[tuple[int, str]]:
    sql = sentence_split_oracle_sql(
        "SELECT 1 AS doc_id, ? AS text"
    )
    return [(i, s) for _, i, s in duckdb.execute(sql, [text]).fetchall()]


def test_rules_on_spark(spark):
    df = spark.createDataFrame(
        [(1, 'Dr. Smith met X on 3.14 units. "Quoted end!" '
             "Then (No. 4) followed? Yes. The end.")],
        "doc_id long, text string",
    )
    got = [(r.sent_idx, r.sentence)
           for r in split_sentences(df).orderBy("sent_idx").collect()]
    assert got == [
        (0, "Dr. Smith met X on 3.14 units."),
        (1, '"Quoted end!"'),
        (2, "Then (No. 4) followed?"),
        (3, "Yes."),
        (4, "The end."),
    ]


def test_no_terminator_is_one_sentence(spark):
    df = spark.createDataFrame([(1, "no punctuation at all")],
                               "doc_id long, text string")
    got = [r.sentence for r in split_sentences(df).collect()]
    assert got == ["no punctuation at all"]


def test_abbreviations_protected():
    got = [s for _, s in _py_split("Mrs. Jones vs. Mr. Smith won. Next one.")]
    assert got == ["Mrs. Jones vs. Mr. Smith won.", "Next one."]
    assert _py_split("approx. 3.14 is pi. Right.") == [
        (0, "approx. 3.14 is pi."), (1, "Right."),
    ]


def test_abbr_list_is_frozen_in_both_dialects():
    text = " ".join(f"{a}. X" for a in ABBREVIATIONS) + " done. End."
    assert _py_split(text) == _duck_split(text)


_TEXT = st.text(
    alphabet=st.sampled_from(
        "abcdef ABCDEF .!?\"')] 0123456789\n\tMr Dr No vs café"
    ),
    min_size=0, max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(text=_TEXT)
def test_differential_java_chain_vs_duckdb_chain(text):
    assert _py_split(text) == _duck_split(text)
