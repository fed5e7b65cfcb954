"""RSS/Atom feed parsing: kind routing, link shapes, CDATA titles,
entity decode, rel handling, drops."""

from open_ocr_spark.dataops.feeds import parse_feeds


def _parse(spark, xml, feed_url="https://e.com/feed"):
    df = spark.createDataFrame([(feed_url, xml)],
                               "feed_url string, xml string")
    return [
        (r["kind"], r["link"], r["title"], r["published"])
        for r in parse_feeds(df).orderBy("link").collect()
    ]


RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel><title>Chan</title>
<item><title>First &amp; best</title><link> https://e.com/a </link>
<pubDate>Mon, 17 Aug 2026 10:00:00 GMT</pubDate></item>
<item><title><![CDATA[Second <b>]]></title><link>https://e.com/b</link></item>
<item><title>No link: dropped</title></item>
</channel></rss>"""


def test_rss_items(spark):
    assert _parse(spark, RSS) == [
        ("rss", "https://e.com/a", "First & best",
         "Mon, 17 Aug 2026 10:00:00 GMT"),
        ("rss", "https://e.com/b", "Second <b>", None),
    ]


ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"><title>F</title>
<entry><title>One</title><link rel="self" href="https://e.com/meta"/>
<link rel="alternate" href="https://e.com/1"/>
<updated>2026-08-17T10:00:00Z</updated></entry>
<entry><title>Two</title><link href="https://e.com/2"/></entry>
<entry><title>linkless</title></entry>
</feed>"""


def test_atom_entries_prefer_alternate(spark):
    assert _parse(spark, ATOM) == [
        ("atom", "https://e.com/1", "One", "2026-08-17T10:00:00Z"),
        ("atom", "https://e.com/2", "Two", None),
    ]


def test_unknown_feed_yields_nothing(spark):
    assert _parse(spark, "<html><body>not a feed</body></html>") == []


def test_channel_only_rss_detected(spark):
    xml = ("<channel><item><link>https://e.com/x</link></item></channel>")
    assert _parse(spark, xml) == [("rss", "https://e.com/x", None, None)]
