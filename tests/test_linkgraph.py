"""Outlink extraction and integer-domain PageRank: quote classes,
relative-link skips, dangling nodes, hand-computed rank values, and
parallelism-independence of the exact integer ranks."""

import pyspark.sql.functions as F

from open_ocr_spark.dataops.links import extract_links, host_edges
from open_ocr_spark.dataops.pagerank import SCALE, pagerank_int


def test_extract_links_quote_classes_and_relative_skip(spark):
    html = (
        '<a href="https://a.com/dq">x</a>'
        "<a href='https://b.com/sq'>y</a>"
        "<a href=https://c.com/bare>z</a>"
        '<a href="/relative">r</a>'
        '<a href="mailto:x@y.z">m</a>'
        '<A HREF="https://d.com/caps">c</A>'
        '<a class="k" href="https://e.com/attr">a</a>'
    )
    df = spark.createDataFrame([("https://src.com/p", html)], "url string, html string")
    got = sorted(r["dst_url"] for r in extract_links(df).collect())
    assert got == [
        "https://a.com/dq",
        "https://b.com/sq",
        "https://c.com/bare",
        "https://d.com/caps",
        "https://e.com/attr",
    ]


def test_extract_links_area_imagemap(spark):
    # <area href> is a real link-carrying element (imagemaps); tag names
    # that merely START with 'a'/'area' must not match.
    html = (
        '<map name=m><area shape=rect coords="0,0,9,9"'
        ' href="https://map.com/r">'
        "<area href='https://map2.com/s'></map>"
        '<abbr href="https://fake.com/abbr">not a link tag</abbr>'
        '<article href="https://fake.com/art">nor this</article>'
        '<a href="https://plain.com/a">still works</a>'
    )
    df = spark.createDataFrame(
        [("https://s.com/p", html)], "url string, html string"
    )
    got = sorted(r["dst_url"] for r in extract_links(df).collect())
    assert got == [
        "https://map.com/r", "https://map2.com/s", "https://plain.com/a"
    ]


def test_extract_links_binary_html(spark):
    df = spark.createDataFrame(
        [("https://s.com", b'<a href="https://t.com/x">l</a>')],
        "url string, html binary",
    )
    assert extract_links(df).collect()[0]["dst_url"] == "https://t.com/x"


def test_host_edges_multiplicity_and_case_fold(spark):
    rows = [
        ("https://S.com/1", "https://T.com/a"),
        ("https://s.com/2", "https://t.com/b"),
        ("https://s.com/2", "https://u.com/c"),
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string")
    out = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_edges(df).collect()
    }
    assert out == {("s.com", "t.com"): 2, ("s.com", "u.com"): 1}


def _ranks(spark, edges, iterations):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: r["rank"]
        for r in pagerank_int(df, iterations=iterations).collect()
    }


def test_pagerank_one_iteration_by_hand(spark):
    # a -> b, a -> c, b -> c; c dangling
    got = _ranks(spark, [("a", "b"), ("a", "c"), ("b", "c")], 1)
    base = 15 * SCALE // 100
    assert got["a"] == base  # nothing points at a
    assert got["b"] == base + 85 * (SCALE // 2) // 100
    assert got["c"] == base + 85 * (SCALE // 2 + SCALE) // 100


def test_pagerank_symmetric_cycle_is_stationary(spark):
    # a <-> b: each sends its whole rank to the other; SCALE is the fixed
    # point (base + 85% of SCALE = SCALE exactly at these integers)
    got = _ranks(spark, [("a", "b"), ("b", "a")], 7)
    assert got == {"a": SCALE, "b": SCALE}


def test_pagerank_multi_edges_count_once(spark):
    a = _ranks(spark, [("a", "b"), ("a", "b"), ("a", "c")], 3)
    b = _ranks(spark, [("a", "b"), ("a", "c")], 3)
    assert a == b


def test_pagerank_exact_across_parallelism(spark):
    edges = [
        (f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(400)
    ] + [(f"n{i}", f"n{(i + 1) % 40}") for i in range(40)]
    df1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    df2 = spark.createDataFrame(edges, "src string, dst string").repartition(16)
    r1 = {r["node"]: r["rank"] for r in pagerank_int(df1, 4).collect()}
    r2 = {r["node"]: r["rank"] for r in pagerank_int(df2, 4).collect()}
    assert r1 == r2  # bit-exact, not epsilon-close


def test_extract_links_ignores_href_suffixed_attributes(spark):
    # data-href / xlink:href contain 'href' as a suffix — no outlink; and
    # an anchor with BOTH real href and data-href yields the href only.
    html = (
        '<a data-href="https://fake.com/d">no real href</a>'
        '<a xlink:href="https://fake.com/x">svg-ish</a>'
        '<a href="https://real.com/a" data-href="https://fake.com/b">r</a>'
    )
    df = spark.createDataFrame(
        [("https://s.com/p", html)], "url string, html string"
    )
    got = sorted(r["dst_url"] for r in extract_links(df).collect())
    assert got == ["https://real.com/a"]
