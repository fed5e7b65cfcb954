"""RFC 4180 CSV parsing: grammar rules, relaxations, and the
differential against the independent stdlib csv implementation."""

import csv
import io

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.kernels.csv_text import build_csv, parse_csv


def _flat(rows):
    return [(r, c, f) for r, rw in enumerate(rows) for c, f in enumerate(rw)]


def test_grammar_rules():
    rows = [["plain", "a,b", 'He said "hi"'],
            ["line1\nline2", "", "tail"]]
    assert parse_csv(build_csv(rows)) == _flat(rows)


def test_crlf_and_bare_lf_and_no_trailing_newline():
    assert parse_csv(b"a,b\r\nc,d") == [(0, 0, "a"), (0, 1, "b"),
                                        (1, 0, "c"), (1, 1, "d")]
    assert parse_csv(b"a,b\nc,d\n") == [(0, 0, "a"), (0, 1, "b"),
                                        (1, 0, "c"), (1, 1, "d")]


def test_trailing_newline_makes_no_empty_record():
    assert parse_csv(b"a\n") == [(0, 0, "a")]
    assert parse_csv(b"") == []


def test_quote_in_unquoted_field_is_literal():
    assert parse_csv(b'ab"cd,e') == [(0, 0, 'ab"cd'), (0, 1, "e")]


def test_quoted_escapes():
    assert parse_csv(b'""""') == [(0, 0, '"')]
    assert parse_csv(b'"a""b",c') == [(0, 0, 'a"b'), (0, 1, "c")]


def test_empty_fields_and_trailing_comma():
    assert parse_csv(b"a,,b") == [(0, 0, "a"), (0, 1, ""), (0, 2, "b")]
    assert parse_csv(b"a,\n") == [(0, 0, "a"), (0, 1, "")]


def test_unterminated_quote_consumes_remainder():
    # non-strict stdlib semantics: EOF inside quotes yields the field
    assert parse_csv(b'a,"never closed\nrest') == [
        (0, 0, "a"), (0, 1, "never closed\nrest"),
    ]
    std = list(csv.reader(io.StringIO('a,"never closed\nrest')))
    assert parse_csv(b'a,"never closed\nrest') == _flat(std)


_FIELD = st.text(alphabet=st.sampled_from('ab,"\n\r xé'), max_size=8)


@settings(max_examples=150, deadline=None)
@given(rows=st.lists(st.lists(_FIELD, min_size=1, max_size=4),
                     min_size=0, max_size=5))
def test_differential_against_stdlib(rows):
    raw = build_csv(rows)
    std = list(csv.reader(io.StringIO(raw.decode()), lineterminator="\r\n"))
    assert parse_csv(raw) == _flat(std)


def test_utf8_bom_stripped():
    assert parse_csv("﻿a,b".encode("utf-8")) == [(0, 0, "a"),
                                                      (0, 1, "b")]


# --- schema inference (r5, dataops/schema_infer.py) --------------------------


def test_infer_column_types_lattice(spark):
    from open_ocr_spark.dataops.schema_infer import infer_column_types

    cells = []
    # col 0: ints; col 1: int+float mix -> double; col 2: all empty ->
    # varchar with nulls; col 3: bools incl case; col 4: 19-digit
    # overflow -> falls past bigint to double
    grid = [
        ["h0", "h1", "h2", "h3", "h4"],          # header row, never typed
        ["1", "1", "", "true", "1234567890123456789"],
        ["-2", "2.5", "", "FALSE", "2"],
    ]
    for r, row in enumerate(grid):
        for c, f in enumerate(row):
            cells.append((7, r, c, f))
    df = spark.createDataFrame(
        cells, "doc_id long, row_idx int, col_idx int, field string"
    )
    got = {r["col_idx"]: (r["sql_type"], r["n_rows"], r["n_nulls"])
           for r in infer_column_types(df).collect()}
    assert got[0] == ("bigint", 2, 0)
    assert got[1] == ("double", 2, 0)
    assert got[2] == ("varchar", 2, 2)
    assert got[3] == ("boolean", 2, 0)
    assert got[4] == ("double", 2, 0)


def test_infer_column_types_single_aggregate_plan(spark):
    from open_ocr_spark.dataops.schema_infer import infer_column_types

    df = spark.createDataFrame(
        [(1, 0, 0, "h"), (1, 1, 0, "2")],
        "doc_id long, row_idx int, col_idx int, field string",
    )
    out = infer_column_types(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # one partial+final aggregate pair around ONE exchange, no Python
    n_exchanges = sum(
        1 for line in plan.splitlines()
        if line.strip().startswith("(") and line.strip().endswith("Exchange")
    )
    assert n_exchanges == 1, plan
    # no Python evaluator NODES (the createDataFrame test input's scan
    # mentions "applySchemaToPythonRDD", which is not an evaluator)
    for node in ("EvalPython", "MapInPandas", "MapInArrow", "PythonUDF"):
        assert node not in plan
