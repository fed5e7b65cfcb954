"""Anchor-text extraction and per-target aggregation."""

from pyspark.sql import functions as F

from open_ocr_spark.dataops.links import anchor_text_stats, extract_anchors


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_extracts_paired_href_and_text(spark):
    html = (
        '<a href="https://a.com/x">First Link</a>'
        '<A HREF="https://b.com/y" rel=nofollow>  spaced\n  text </A>'
    )
    got = sorted(
        extract_anchors(_pages(spark, [("https://s.com/", html)])).collect()
    )
    assert [(r.dst_url, r.anchor_text) for r in got] == [
        ("https://a.com/x", "First Link"),
        ("https://b.com/y", "spaced text"),
    ]


def test_skips_nested_markup_relative_and_empty(spark):
    html = (
        '<a href="https://a.com/"><b>bold</b></a>'  # nested markup: no match
        '<a href="/rel">relative</a>'  # not absolute
        '<a href="https://a.com/">   </a>'  # whitespace-only text
        '<a href="https://a.com/">kept</a>'
    )
    got = extract_anchors(_pages(spark, [("https://s.com/", html)])).collect()
    assert [(r.dst_url, r.anchor_text) for r in got] == [
        ("https://a.com/", "kept")
    ]


def test_binary_html_column(spark):
    df = spark.createDataFrame(
        [("https://s.com/", bytearray(b'<a href="https://a.com/">ok</a>'))],
        "url string, html binary",
    )
    assert extract_anchors(df).collect()[0].anchor_text == "ok"


def test_stats_mode_and_tiebreak(spark):
    rows = [
        ("s1", "https://t.com/", "beta"),
        ("s2", "https://t.com/", "alpha"),
        ("s3", "https://t.com/", "beta"),
        ("s4", "https://t.com/", "alpha"),  # tie 2-2: 'alpha' wins (asc)
        ("s5", "https://u.com/", "only"),
    ]
    df = spark.createDataFrame(
        rows, "src_url string, dst_url string, anchor_text string"
    )
    got = {r.dst_url: r for r in anchor_text_stats(df).collect()}
    t = got["https://t.com/"]
    assert (t.n_anchors, t.n_unique_texts, t.top_anchor_text, t.top_n) == (
        4, 2, "alpha", 2,
    )
    u = got["https://u.com/"]
    assert (u.n_anchors, u.n_unique_texts, u.top_anchor_text, u.top_n) == (
        1, 1, "only", 1,
    )


def test_stats_plan_has_no_join_and_two_exchanges(spark):
    df = spark.range(100).select(
        F.lit("s").alias("src_url"),
        F.concat(F.lit("https://t"), F.col("id") % 5).alias("dst_url"),
        F.concat(F.lit("text"), F.col("id") % 3).alias("anchor_text"),
    )
    plan = (
        anchor_text_stats(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2
