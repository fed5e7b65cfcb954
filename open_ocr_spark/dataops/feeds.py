"""RSS 2.0 / Atom feed parsing: the change-discovery channel next to
sitemaps (dataops/sitemaps.py).

Crawl frontiers poll feeds for new content between sitemap refreshes —
an RSS ``<item>`` or Atom ``<entry>`` is a (url, title, timestamp)
triple feeding the fetch queue and the crawl-delta planner
(dataops/delta.py).  Like the sitemap parser, extraction is pure
Catalyst: one block-level ``regexp_extract_all`` per feed, per-block
field extraction inside a HOF transform, XML built-in entities decoded
— zero Python, no shuffle, output proportional to the entry count.

Format notes: RSS links are element text (``<link>url</link>``); Atom
links are attributes (``<link href="url"/>``, preferring
``rel="alternate"`` which is also the default when rel is absent) —
both shapes handled, with CDATA-wrapped titles unwrapped.  Timestamps
pass through verbatim (RFC 822 for RSS ``pubDate``, RFC 3339 for Atom
``updated``): parsing them to timestamps is the caller's choice of
calendar policy, not the feed walk's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ITEM = r"(?is)<item[\s>](.*?)</item>"
_ENTRY = r"(?is)<entry[\s>](.*?)</entry>"
_TITLE = r"(?is)<title[^>]*>\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*</title>"
_RSS_LINK = r"(?is)<link>\s*(.*?)\s*</link>"
_ATOM_LINK = (
    r'(?is)<link(?=[^>]*\shref="([^"]*)")'
    r'(?:(?![^>]*\srel=)|(?=[^>]*\srel="alternate"))[^>]*/?>'
)
_RSS_DATE = r"(?is)<pubdate>\s*(.*?)\s*</pubdate>"
_ATOM_DATE = r"(?is)<updated>\s*(.*?)\s*</updated>"


def _unescape(col):
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&apos;", "'"),
                    ("&quot;", '"'), ("&amp;", "&")):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def parse_feeds(
    feeds: DataFrame, id_col: str = "feed_url", xml_col: str = "xml"
) -> DataFrame:
    """(feed_url, kind, link, title, published): one row per RSS item /
    Atom entry; entries without a link are dropped, missing titles and
    dates are NULL.  kind is 'rss' or 'atom' ('unknown' feeds yield no
    rows)."""
    xml = F.col(xml_col)
    kind = (
        F.when(xml.rlike(r"(?is)<feed[\s>]"), F.lit("atom"))
        .when(xml.rlike(r"(?is)<rss[\s>]|<channel[\s>]"), F.lit("rss"))
        .otherwise(F.lit("unknown"))
    )
    blocks = F.when(
        kind == "atom", F.regexp_extract_all(xml, F.lit(_ENTRY), F.lit(1))
    ).when(
        kind == "rss", F.regexp_extract_all(xml, F.lit(_ITEM), F.lit(1))
    ).otherwise(F.array().cast("array<string>"))

    def entry(b):
        link = F.when(
            kind == "atom",
            F.regexp_extract(b, _ATOM_LINK, 1),
        ).otherwise(F.regexp_extract(b, _RSS_LINK, 1))
        date = F.when(
            kind == "atom", F.regexp_extract(b, _ATOM_DATE, 1)
        ).otherwise(F.regexp_extract(b, _RSS_DATE, 1))
        return F.struct(
            F.nullif(_unescape(link), F.lit("")).alias("link"),
            F.nullif(
                _unescape(F.regexp_extract(b, _TITLE, 1)), F.lit("")
            ).alias("title"),
            F.nullif(date, F.lit("")).alias("published"),
        )

    return (
        feeds.select(
            F.col(id_col).alias("feed_url"),
            kind.alias("kind"),
            F.explode(F.transform(blocks, entry)).alias("e"),
        )
        .filter(F.col("e.link").isNotNull())
        .select(
            "feed_url", "kind",
            F.col("e.link").alias("link"),
            F.col("e.title").alias("title"),
            F.col("e.published").alias("published"),
        )
    )
