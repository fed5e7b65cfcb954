"""HTML table extraction: structure, nesting, entities, Spark surface."""

from open_ocr_spark.kernels.tables import extract_tables, html_tables

PAGE = b"""<html><body><nav><a href="/">home</a></nav>
<table>
  <thead><tr><th>name &amp; id</th><th class="n">qty</th></tr></thead>
  <tbody>
    <tr><td> item one </td><td>7</td></tr>
    <tr><td>item&#160;two</td><td>9<table><tr><td>inner</td></tr></table></td></tr>
  </tbody>
</table>
<p>prose between</p>
<table><tr><td>solo</td></tr></table>
</body></html>"""


def test_structure_nesting_entities():
    got = extract_tables(PAGE)
    assert got == [
        (0, 0, 0, "name & id"),
        (0, 0, 1, "qty"),
        (0, 1, 0, "item one"),
        (0, 1, 1, "7"),
        (0, 2, 0, "item two"),  # &#160; nbsp normalized by collapse_ws
        (0, 2, 1, "9 inner"),
        (1, 0, 0, "inner"),
        (2, 0, 0, "solo"),
    ]


def test_no_tables_is_empty():
    assert extract_tables(b"<html><body><p>just text</p></body></html>") == []


def test_malformed_rows_outside_table_ignored():
    # tr/td outside any table contribute nothing
    got = extract_tables(b"<tr><td>stray</td></tr><table><tr><td>x</td></tr></table>")
    assert got == [(0, 0, 0, "x")]


def test_html_tables_dataframe(spark):
    df = spark.createDataFrame(
        [(1, bytearray(PAGE)), (2, None),
         (3, bytearray(b"<table><tr><td>a</td><td>b</td></tr></table>"))],
        "doc_id long, html binary",
    )
    got = sorted(
        (r.doc_id, r.table_idx, r.row_idx, r.col_idx, r.cell)
        for r in html_tables(df).collect()
    )
    assert (3, 0, 0, 1, "b") in got
    assert len([g for g in got if g[0] == 1]) == 8
    assert not [g for g in got if g[0] == 2]


def test_html_tables_no_shuffle(spark):
    df = spark.createDataFrame([(1, b"<table></table>")],
                               "doc_id long, html binary")
    plan = html_tables(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
