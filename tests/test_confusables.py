"""Homoglyph skeleton: map/delete semantics, counters, and the
Spark-vs-DuckDB translate identity on arbitrary obfuscated text."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.dataops.confusables import (
    CONFUSABLES_FROM,
    CONFUSABLES_TO,
    ZERO_WIDTH,
    confusable_stats,
    confusable_stats_oracle_sql,
)


def _py_skeleton(text: str) -> str:
    t = text.translate({ord(c): None for c in ZERO_WIDTH})
    return t.translate(
        {ord(f): t_ for f, t_ in zip(CONFUSABLES_FROM, CONFUSABLES_TO)}
    )


def test_map_table_is_sane():
    assert len(CONFUSABLES_FROM) == len(CONFUSABLES_TO)
    assert len(set(CONFUSABLES_FROM)) == len(CONFUSABLES_FROM)
    assert all(ord(c) < 128 for c in CONFUSABLES_TO)
    assert all(ord(c) > 127 for c in CONFUSABLES_FROM)


def test_spam_classics(spark):
    rows = [(1, "pаypal"),              # Cyrillic а
            (2, "f​r​e​e"),  # zero-width salted
            (3, "ＦＲＥＥ ｍｏｎｅｙ"),      # fullwidth
            (4, "clean ascii")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in confusable_stats(df).collect()}
    assert got[1].skeleton == "paypal" and got[1].n_confusables == 1
    assert got[2].skeleton == "free" and got[2].n_zero_width == 3
    assert got[3].skeleton == "FREE money" and got[3].n_confusables == 9
    assert got[4].skeleton == "clean ascii" and not got[4].obfuscated
    assert all(got[i].obfuscated for i in (1, 2, 3))


_OBF = st.text(
    alphabet=st.sampled_from(
        "abc ABC аеос АВЕ οαν ＡＢｃ０ ​‌﻿" + "xyz123"
    ),
    max_size=60,
)


@settings(max_examples=100, deadline=None)
@given(text=_OBF)
def test_duckdb_replay_matches_python_reference(text):
    sql = confusable_stats_oracle_sql("SELECT 1 AS doc_id, ? AS text")
    _, skel, n_zw, n_conf, obf = duckdb.execute(sql, [text]).fetchone()
    assert skel == _py_skeleton(text)
    stripped = text.translate({ord(c): None for c in ZERO_WIDTH})
    assert n_zw == len(text) - len(stripped)
    assert n_conf == sum(c in CONFUSABLES_FROM for c in stripped)
    assert obf == (n_zw + n_conf > 0)
