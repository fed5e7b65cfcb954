"""Overlapping-window chunking and sitemap parsing."""

import pytest

from open_ocr_spark.dataops.chunking import chunk_documents
from open_ocr_spark.dataops.sitemaps import parse_sitemaps


def _chunks(spark, text, chunk_tokens, stride):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens, stride).collect()
    return [(r["chunk_idx"], r["chunk_text"], r["n_tokens"])
            for r in sorted(rows, key=lambda r: r["chunk_idx"])]


def test_overlap_grid_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))  # w0..w9
    got = _chunks(spark, text, chunk_tokens=4, stride=3)
    # starts 0,3,6 — window at 6 reaches the end (6+4 >= 10), so 3 chunks
    assert got == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w3 w4 w5 w6", 4),
        (2, "w6 w7 w8 w9", 4),
    ]
    # stride == chunk: disjoint blocks with a short tail
    got = _chunks(spark, text, chunk_tokens=4, stride=4)
    assert got == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w4 w5 w6 w7", 4),
        (2, "w8 w9", 2),
    ]


def test_short_empty_and_validation(spark):
    assert _chunks(spark, "a b", 8, 4) == [(0, "a b", 2)]
    assert _chunks(spark, None, 8, 4) == [(0, "", 1)]
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=4, stride=5)
    with pytest.raises(ValueError, match=">= 1"):
        chunk_documents(df, chunk_tokens=0)


def test_no_token_dropped_at_any_length(spark):
    # every token index must be covered by at least one window
    for n in (1, 4, 5, 12, 13, 25):
        text = " ".join(f"t{i}" for i in range(n))
        got = _chunks(spark, text, chunk_tokens=5, stride=3)
        covered = set()
        for k, chunk, _ in got:
            toks = chunk.split(" ")
            covered.update(range(k * 3, k * 3 + len(toks)))
        assert covered == set(range(n)), n
        # and the last window is the FIRST to reach the end
        assert len(got) == 1 + max(0, -(-(n - 5) // 3)) if n > 5 else True


def _parse(spark, host, xml):
    df = spark.createDataFrame([(host, xml)], "host string, xml string")
    return [
        (r["kind"], r["loc"], r["lastmod"])
        for r in parse_sitemaps(df).orderBy("loc").collect()
    ]


def test_urlset_entries_and_entity_decode(spark):
    xml = (
        '<?xml version="1.0"?><urlset xmlns="ns">'
        "<url><loc> https://e.com/a?x=1&amp;y=2 </loc>"
        "<lastmod>2026-01-01</lastmod></url>"
        "<url><loc>https://e.com/b</loc></url>"
        "<url><lastmod>2020-05-05</lastmod></url>"  # loc-less: dropped
        "</urlset>"
    )
    assert _parse(spark, "e.com", xml) == [
        ("urlset", "https://e.com/a?x=1&y=2", "2026-01-01"),
        ("urlset", "https://e.com/b", None),
    ]


def test_sitemapindex_and_unknown(spark):
    xml = (
        "<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc>"
        "<lastmod>2026-02-02</lastmod></sitemap>"
        "<sitemap><loc>https://e.com/s2.xml</loc></sitemap></sitemapindex>"
    )
    assert _parse(spark, "e.com", xml) == [
        ("index", "https://e.com/s1.xml", "2026-02-02"),
        ("index", "https://e.com/s2.xml", None),
    ]
    assert _parse(spark, "e.com", "not xml at all") == []


def test_double_escaped_amp_not_overdecoded(spark):
    xml = "<urlset><url><loc>https://e.com/?q=&amp;lt;tag&amp;gt;</loc></url></urlset>"
    got = _parse(spark, "e.com", xml)
    # &amp;lt; decodes to the five characters '&lt;', not to '<'
    assert got == [("urlset", "https://e.com/?q=&lt;tag&gt;", None)]
