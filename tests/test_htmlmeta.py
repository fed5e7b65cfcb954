"""Page-metadata extraction: attribute-order tolerance, quote styles,
case-insensitivity, NULL for absent fields, binary html input."""

from open_ocr_spark.dataops.htmlmeta import extract_html_meta


def _one(spark, html):
    if isinstance(html, bytes):
        df = spark.createDataFrame(
            [("u", bytearray(html))], "url string, html binary"
        )
    else:
        df = spark.createDataFrame([("u", html)], "url string, html string")
    return extract_html_meta(df).collect()[0]


def test_all_fields_double_quoted(spark):
    r = _one(
        spark,
        '<html><head><title> My Page </title>'
        '<meta name="description" content="a summary">'
        '<link rel="canonical" href="https://ex.com/real">'
        '<meta property="og:title" content="OG name"></head></html>',
    )
    assert r["title"] == "My Page"  # trimmed
    assert r["meta_description"] == "a summary"
    assert r["canonical_url"] == "https://ex.com/real"
    assert r["og_title"] == "OG name"


def test_content_before_name_and_single_quotes(spark):
    r = _one(
        spark,
        "<TITLE>caps</TITLE>"
        "<meta content='backwards' name='description'>"
        "<link rel='canonical' href='https://ex.com/c'>",
    )
    assert r["title"] == "caps"
    assert r["meta_description"] == "backwards"
    assert r["canonical_url"] == "https://ex.com/c"
    assert r["og_title"] is None


def test_absent_fields_are_null_not_empty(spark):
    r = _one(spark, "<p>no head at all</p>")
    assert r["title"] is None
    assert r["meta_description"] is None
    assert r["canonical_url"] is None
    assert r["og_title"] is None


def test_binary_html_and_multiline_title(spark):
    r = _one(
        spark,
        b"<title>line one\nline two</title>"
        b'<meta name="keywords" content="not description">',
    )
    assert r["title"] == "line one\nline two"  # (?s): dot spans newline
    assert r["meta_description"] is None  # name=keywords must not match


# --- JSON-LD -----------------------------------------------------------------


def test_json_ld_blocks_and_error_handling(spark):
    from open_ocr_spark.dataops.htmlmeta import extract_json_ld

    html = (
        '<html><head>'
        '<script type="application/ld+json">'
        '{"@type":"Article","name":"A \\"quoted\\" piece"}</script>'
        "<script type='application/ld+json'>"
        '{"@type":"Product","name":"Item 1"}</script>'
        '<script type="application/ld+json">{not json</script>'
        '<script type="text/javascript">{"@type":"Nope"}</script>'
        "</head><body>x</body></html>"
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = sorted(tuple(r) for r in extract_json_ld(df).collect())
    assert got == [
        (1, "Article", 'A "quoted" piece'),
        (1, "Product", "Item 1"),
    ]


def test_json_ld_binary_html_and_missing_name(spark):
    from open_ocr_spark.dataops.htmlmeta import extract_json_ld

    html = (
        '<script type="application/ld+json">'
        '{"@type":"BreadcrumbList"}</script>'
    ).encode("utf-8")
    df = spark.createDataFrame([(7, bytearray(html))],
                               "doc_id long, html binary")
    got = [tuple(r) for r in extract_json_ld(df).collect()]
    assert got == [(7, "BreadcrumbList", None)]  # name absent -> NULL
