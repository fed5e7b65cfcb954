"""RFC 3986 reference resolution: both engine renderings must pass the
RFC's own §5.4 example table (normal + abnormal, strict mode) and stay
in lockstep on messier crawl-shaped inputs."""

import duckdb
import pyspark.sql.functions as F

from open_ocr_spark.dataops.resolveurl import duckdb_resolve_sql, resolve_url

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 (normal) + §5.4.2 (abnormal, strict) + extras
RFC_CASES = {
    "g": "http://a/b/c/g", "./g": "http://a/b/c/g",
    "g/": "http://a/b/c/g/", "/g": "http://a/g", "//g": "http://g",
    "?y": "http://a/b/c/d;p?y", "g?y": "http://a/b/c/g?y",
    "#s": "http://a/b/c/d;p?q#s", "g#s": "http://a/b/c/g#s",
    "g?y#s": "http://a/b/c/g?y#s", ";x": "http://a/b/c/;x",
    "g;x": "http://a/b/c/g;x", "g;x?y#s": "http://a/b/c/g;x?y#s",
    "": "http://a/b/c/d;p?q", ".": "http://a/b/c/", "./": "http://a/b/c/",
    "..": "http://a/b/", "../": "http://a/b/", "../g": "http://a/b/g",
    "../..": "http://a/", "../../": "http://a/", "../../g": "http://a/g",
    "../../../g": "http://a/g", "../../../../g": "http://a/g",
    "/./g": "http://a/g", "/../g": "http://a/g", "g.": "http://a/b/c/g.",
    ".g": "http://a/b/c/.g", "g..": "http://a/b/c/g..",
    "..g": "http://a/b/c/..g", "./../g": "http://a/b/g",
    "./g/.": "http://a/b/c/g/", "g/./h": "http://a/b/c/g/h",
    "g/../h": "http://a/b/c/h", "g;x=1/./y": "http://a/b/c/g;x=1/y",
    "g;x=1/../y": "http://a/b/c/y", "g?y/./x": "http://a/b/c/g?y/./x",
    "g?y/../x": "http://a/b/c/g?y/../x", "g#s/./x": "http://a/b/c/g#s/./x",
    "g#s/../x": "http://a/b/c/g#s/../x", "http:g": "http:g",
}

# crawl-shaped extras beyond the RFC table
EXTRA = [
    ("https://ex.com", "style.css", "https://ex.com/style.css"),
    ("https://ex.com/a/", "b/c.html", "https://ex.com/a/b/c.html"),
    ("https://ex.com/a/b?x=1#f", "", "https://ex.com/a/b?x=1"),
    ("https://ex.com/a/", "//cdn.ex.org/j.js", "https://cdn.ex.org/j.js"),
    ("https://ex.com/deep/x/y/z", "../../up", "https://ex.com/deep/up"),
    ("https://ex.com/a", "mailto:u@ex.com", "mailto:u@ex.com"),
    # _DEPTH boundary: 4-deep ../ resolves exactly; 5-deep leaves the
    # documented residual — BOTH engines must produce the SAME residual
    # (the bounded policy is shared, not an implementation accident)
    ("https://ex.com/a/b/c/d/e/f", "../../../../g", "https://ex.com/a/g"),
    (
        "https://ex.com/a/b/c/d/e/f",
        "../../../../../g",
        "https://ex.com/a/../g",
    ),
    ("https://ex.com/a/", "./././././x", "https://ex.com/a/x"),
    ("https://ex.com/a/b", "c/./d/../e?q=1#frag",
     "https://ex.com/a/c/e?q=1#frag"),
    ("https://ex.com/a/b", "?", "https://ex.com/a/b?"),
    ("https://ex.com/a/b", "#", "https://ex.com/a/b#"),
    ("https://ex.com", "..//x", "https://ex.com//x"),
]


def test_rfc_table_spark(spark):
    rows = [(BASE, r) for r in RFC_CASES]
    df = spark.createDataFrame(rows, "base string, ref string").select(
        "ref", resolve_url("base", "ref").alias("got")
    )
    got = {r["ref"]: r["got"] for r in df.collect()}
    assert got == RFC_CASES


def test_rfc_table_duckdb():
    expr = duckdb_resolve_sql("base", "ref")
    for ref, want in RFC_CASES.items():
        got = duckdb.sql(
            f"select {expr} from (select '{BASE}' as base, "
            f"'{ref}' as ref)"
        ).fetchone()[0]
        assert got == want, (ref, got, want)


def test_extra_cases_both_engines(spark):
    df = spark.createDataFrame(
        [(b, r) for (b, r, _) in EXTRA], "base string, ref string"
    ).select(resolve_url("base", "ref").alias("got"))
    assert [r["got"] for r in df.collect()] == [w for (_, _, w) in EXTRA]
    expr = duckdb_resolve_sql("base", "ref")
    for b, r, want in EXTRA:
        got = duckdb.sql(
            f"select {expr} from (select '{b}' as base, '{r}' as ref)"
        ).fetchone()[0]
        assert got == want, (b, r, got, want)


def test_resolution_is_a_pure_projection(spark):
    """No join, no shuffle, no Python: the operator must survive any
    scale as a map-only expression."""
    docs = spark.range(10).select(
        F.lit("https://h.example.com/a/b").alias("base"),
        F.lit("../x").alias("ref"),
    )
    plan = docs.select(resolve_url("base", "ref")).explain(True)  # smoke
    physical = docs.select(
        resolve_url("base", "ref")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in physical
    assert "Join" not in physical

def test_staged_matches_column_form(spark):
    """with_resolved (the plan-size-bounded staging used by the link
    extractor) must be byte-identical to resolve_url on the full RFC
    §5.4 table, the crawl extras, and a NULL ref (which must resolve to
    NULL so callers can coalesce their own default)."""
    from open_ocr_spark.dataops.resolveurl import with_resolved

    rows = [(BASE, r) for r in RFC_CASES] + [
        (b, r) for (b, r, _) in EXTRA
    ] + [(BASE, None)]
    df = spark.createDataFrame(rows, "base string, ref string")
    both = with_resolved(df, "base", "ref", "staged").select(
        "base", "ref", "staged", resolve_url("base", "ref").alias("col")
    )
    for row in both.collect():
        assert row["staged"] == row["col"], (row["ref"], row["staged"])
        if row["ref"] is None:
            assert row["staged"] is None


def test_staged_plan_stays_small(spark):
    """The staging must survive CollapseProject: a resolve whose base is
    ITSELF a resolved URL (the <base href> shape that multiplied the
    Column form to 5,900+ regex nodes) stays linear in the policy size."""
    from open_ocr_spark.dataops.resolveurl import with_resolved

    df = spark.range(5).select(
        F.lit("https://h.example.com/a/b/page.html").alias("url"),
        F.lit("/cdn/v1/").alias("rawbase"),
        F.lit("../img/x.png").alias("href"),
    )
    df = with_resolved(df, "url", "rawbase", "base")
    df = with_resolved(df, "base", "href", "dst")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("regexp_replace") < 120, plan.count("regexp_replace")
    assert plan.count("regexp_extract") < 40, plan.count("regexp_extract")


def test_staged_matches_column_form_seeded_corpus(spark):
    """Combinatorial parity sweep: every (base, ref) pair from crawl-ish
    building blocks (dot segments, traversal, query/fragment tails,
    scheme-ish prefixes, authority forms) must resolve identically
    through the staged and Column forms.  Deterministic by construction
    — the full cross product, no RNG."""
    from itertools import product

    from open_ocr_spark.dataops.resolveurl import with_resolved

    bases = [
        "https://ex.com",
        "https://ex.com/",
        "https://u:p@ex.com:8443/a/b?q=1#f",
        "http://ex.com/a/b/c/",
    ]
    heads = ["", ".", "..", "a", "/", "//h", "http:", "%2e%2e", "#", "?"]
    tails = ["", "/g", "/../g", "/./", "?x=/../y", "#s/../t", "//", "/.."]
    refs = [h + t for h, t in product(heads, tails)]
    rows = [(b, r) for b, r in product(bases, refs)]
    df = spark.createDataFrame(rows, "base string, ref string")
    both = with_resolved(df, "base", "ref", "staged").select(
        "base", "ref", "staged", resolve_url("base", "ref").alias("col")
    )
    bad = [
        (row["base"], row["ref"], row["staged"], row["col"])
        for row in both.collect()
        if row["staged"] != row["col"]
    ]
    assert not bad, bad[:5]
