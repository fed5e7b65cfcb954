"""Heading outline: trails, missing ancestors, stale-h2 reset, per-page
partitioning."""

from open_ocr_spark.dataops.outline import heading_outline


def _run(spark, pages):
    df = spark.createDataFrame(pages, "url string, html_str string")
    return [(r.url, r.heading_idx, r.level, r.title, r.path)
            for r in heading_outline(df)
            .orderBy("url", "heading_idx").collect()]


def test_trails(spark):
    html = ("<h1>Doc</h1><h2>Sec</h2><h3>Sub</h3>"
            "<h2>Sec2</h2><h3>Sub2</h3>")
    got = _run(spark, [("u", html)])
    assert [g[4] for g in got] == [
        "Doc", "Doc > Sec", "Doc > Sec > Sub",
        "Doc > Sec2", "Doc > Sec2 > Sub2",
    ]


def test_heading_before_any_h1_has_short_trail(spark):
    got = _run(spark, [("u", "<h2>Early</h2><h3>Deep</h3><h1>Top</h1>")])
    assert [g[4] for g in got] == ["Early", "Early > Deep", "Top"]


def test_stale_h2_does_not_leak_under_new_h1(spark):
    html = "<h1>A</h1><h2>S</h2><h1>B</h1><h3>X</h3>"
    got = _run(spark, [("u", html)])
    # X sits directly under B: the h2 'S' belongs to A's section
    assert got[-1][4] == "B > X"


def test_pages_partition_independently(spark):
    got = _run(spark, [("a", "<h1>A1</h1><h2>A2</h2>"),
                       ("b", "<h3>B3</h3>")])
    paths = {g[0]: g[4] for g in got if g[1] == len([])}
    assert paths["a"] == "A1"
    # page b's h3 must not see page a's headings
    assert [g[4] for g in got if g[0] == "b"] == ["B3"]


def test_h4_and_deeper_out_of_contract(spark):
    got = _run(spark, [("u", "<h1>A</h1><h4>skip</h4><h2>B</h2>")])
    assert [g[3] for g in got] == ["A", "B"]
