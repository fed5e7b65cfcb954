"""Redirect pointer doubling: exact hops, dangling targets, odd cycles,
over-deep chains, relative-Location resolution."""

import pyspark.sql.functions as F

from open_ocr_spark.dataops.redirects import resolve_redirect_chains


def _resolve(spark, rows, max_hops=8):
    df = spark.createDataFrame(
        rows, "url string, status int, location string"
    )
    out = resolve_redirect_chains(df, max_hops=max_hops)
    return {r["url"]: (r["final_url"], r["hops"], r["looped"])
            for r in out.collect()}


def test_chain_exact_hops(spark):
    rows = [
        ("http://x/0", 200, None),
        ("http://x/1", 301, "/0"),
        ("http://x/2", 302, "/1"),
        ("http://x/3", 307, "/2"),
        ("http://x/4", 308, "/3"),
        ("http://x/5", 303, "/4"),
    ]
    got = _resolve(spark, rows)
    for i in range(6):
        assert got[f"http://x/{i}"] == ("http://x/0", i, False), i


def test_dangling_target_is_terminal(spark):
    got = _resolve(spark, [("http://x/a", 301, "http://y/never-fetched")])
    assert got["http://x/a"] == ("http://y/never-fetched", 1, False)


def test_non_redirect_status_keeps_location_inert(spark):
    got = _resolve(spark, [("http://x/a", 200, "/elsewhere")])
    assert got["http://x/a"] == ("http://x/a", 0, False)


def test_even_cycle_returns_to_self(spark):
    rows = [("http://x/a", 302, "/b"), ("http://x/b", 302, "/a")]
    got = _resolve(spark, rows)
    assert got["http://x/a"] == ("http://x/a", 8, True)
    assert got["http://x/b"] == ("http://x/b", 8, True)


def test_odd_cycle_lands_eight_mod_three_ahead(spark):
    rows = [
        ("http://x/a", 301, "/b"),
        ("http://x/b", 301, "/c"),
        ("http://x/c", 301, "/a"),
    ]
    got = _resolve(spark, rows)
    # 8 steps from a in a 3-cycle = 8 % 3 = 2 ahead = c
    assert got["http://x/a"] == ("http://x/c", 8, True)
    assert got["http://x/b"] == ("http://x/a", 8, True)
    assert got["http://x/c"] == ("http://x/b", 8, True)


def test_overdeep_chain_marks_looped_at_cap(spark):
    rows = [("http://x/0", 200, None)] + [
        (f"http://x/{i}", 301, f"/{i - 1}") for i in range(1, 12)
    ]
    got = _resolve(spark, rows)
    assert got["http://x/8"] == ("http://x/0", 8, False)
    # 9+ hops exceed max_hops=8: capped, flagged
    final, hops, looped = got["http://x/11"]
    assert hops == 8 and looped and final == "http://x/3"


def test_relative_location_resolves_against_capture_url(spark):
    got = _resolve(
        spark,
        [
            ("http://x/dir/a", 301, "b"),  # relative path, no slash
            ("http://x/dir/b", 200, None),
        ],
    )
    assert got["http://x/dir/a"] == ("http://x/dir/b", 1, False)


def test_plan_stays_linear_in_rounds(spark):
    """Pointer doubling joins the state with ITSELF: without per-round
    pinning the plan tree doubles per round (1+2+4 = 7 doubling joins at
    K=3).  The pinned plan must show exactly 2 joins past the last
    checkpoint (final doubling + peek) and no cartesian."""
    df = spark.createDataFrame(
        [("http://x/a", 301, "/b")], "url string, status int, location string"
    )
    plan = (
        resolve_redirect_chains(df, max_hops=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Join LeftOuter") == 2  # last doubling + peek
    assert "Cartesian" not in plan
