"""Frontier scheduling: dedup-by-canonical, seen anti-join, robots gate,
quota binding, priority ordering, plan shape."""

from pyspark.sql import functions as F

from open_ocr_spark.dataops.frontier import frontier_schedule
from open_ocr_spark.dataops.robots import parse_robots


def _rules(spark, txt="User-agent: *\nDisallow: /private/\n",
           host="a.com"):
    df = spark.createDataFrame(
        [(host, txt)], "host string, robots_txt string"
    )
    return parse_robots(df)


def _schedule(spark, cand_rows, seen_rows=(), quota=4, rules=None):
    cand = spark.createDataFrame(
        cand_rows, "src_url string, dst_url string"
    )
    seen = spark.createDataFrame(
        [(u,) for u in seen_rows] or [("https://never.example/",)],
        "url string",
    )
    return frontier_schedule(
        cand, rules if rules is not None else _rules(spark), seen, quota
    ).collect()


def test_canonical_merge_and_indegree(spark):
    rows = [
        ("https://s1.com/", "https://www.a.com:443/x/?utm_source=t&b=2&a=1"),
        ("https://s2.com/", "https://a.com/x?a=1&b=2"),
        ("https://s2.com/", "https://a.com/x?b=2&a=1"),  # same src: distinct
    ]
    got = _schedule(spark, rows)
    assert len(got) == 1
    r = got[0]
    assert (r.url, r.host, r.in_degree, r.fetch_order) == (
        "https://a.com/x?a=1&b=2", "a.com", 2, 1,
    )


def test_seen_anti_join_is_canonical(spark):
    rows = [("https://s1.com/", "https://a.com/x")]
    # seen recorded in a messy raw form must still suppress the candidate
    got = _schedule(
        spark, rows, seen_rows=["https://WWW.a.com/x/?utm_medium=m"]
    )
    assert got == []


def test_robots_gate_drops_disallowed(spark):
    rows = [
        ("https://s1.com/", "https://a.com/private/1"),
        ("https://s1.com/", "https://a.com/public/1"),
    ]
    got = _schedule(spark, rows)
    assert [r.url for r in got] == ["https://a.com/public/1"]


def test_quota_binds_with_priority_order(spark):
    rows = []
    for s in range(5):
        rows.append((f"https://s{s}.com/", "https://a.com/popular"))
    for page in ["p1", "p2", "p3", "p4"]:
        rows.append(("https://s0.com/", f"https://a.com/{page}"))
    got = _schedule(spark, rows, quota=3)
    assert [(r.url, r.in_degree, r.fetch_order) for r in got] == [
        ("https://a.com/popular", 5, 1),
        ("https://a.com/p1", 1, 2),
        ("https://a.com/p2", 1, 3),
    ]


def test_non_http_candidates_dropped(spark):
    rows = [
        ("https://s1.com/", "ftp://a.com/x"),
        ("https://s1.com/", "mailto:x@a.com"),
        ("https://s1.com/", "https://a.com/ok"),
    ]
    got = _schedule(spark, rows)
    assert [r.url for r in got] == ["https://a.com/ok"]


def test_plan_prunes_quota_map_side(spark):
    cand = spark.range(1000).select(
        F.concat(F.lit("https://s"), F.col("id")).alias("src_url"),
        F.concat(F.lit("https://a.com/p"), F.col("id") % 100)
        .alias("dst_url"),
    )
    seen = spark.createDataFrame([("https://never.example/",)], "url string")
    plan = (
        frontier_schedule(cand, _rules(spark), seen, 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the rank filter must reach a WindowGroupLimit (map-side top-k
    # prune before the host exchange), and nothing may collect/cartesian
    assert "WindowGroupLimit" in plan
    assert "Cartesian" not in plan
