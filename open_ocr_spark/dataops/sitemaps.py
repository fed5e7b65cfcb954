"""Sitemap parsing (sitemaps.org XML protocol): URL discovery for the
crawl frontier.

A webtext pipeline seeds and refreshes its frontier from sitemaps —
they carry the canonical URL list and change hints (<lastmod>) that
decide what the crawler fetches next (pairs with dataops/delta.py's
recrawl classification and dataops/robots.py's gating).

Both document kinds are handled: <urlset> (leaf sitemaps, one <url>
entry per page) and <sitemapindex> (pointers to child sitemaps — the
shape large sites use once they pass the 50k-URL per-file limit).
Extraction is pure Catalyst: one block-level regexp_extract_all, then
per-block <loc>/<lastmod> extraction inside a HOF transform — zero
Python, no shuffle, output proportional to the entry count.  Entity
decoding is limited to the XML built-ins sitemaps must escape (&amp;
&lt; &gt; &apos; &quot;).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_BLOCK = r"(?is)<url[\s>](.*?)</url>"
_SM_BLOCK = r"(?is)<sitemap[\s>](.*?)</sitemap>"
_LOC = r"(?is)<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"(?is)<lastmod>\s*(.*?)\s*</lastmod>"


def _unescape(col):
    # &amp; last, so '&amp;lt;' decodes to '&lt;' not '<'
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&apos;", "'"),
                    ("&quot;", '"'), ("&amp;", "&")):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def parse_sitemaps(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """(host, kind, loc, lastmod): one row per <url> (kind='urlset') or
    <sitemap> (kind='index') entry; entries without a <loc> are dropped,
    <lastmod> is NULL when absent.  Malformed XML degrades gracefully —
    whatever well-formed blocks exist are extracted (crawl frontiers
    prefer partial discovery over hard failure; strict validation
    belongs to the fetcher)."""
    xml = F.col(xml_col)
    kind = (
        F.when(xml.rlike(r"(?is)<sitemapindex[\s>]"), F.lit("index"))
        .when(xml.rlike(r"(?is)<urlset[\s>]"), F.lit("urlset"))
        .otherwise(F.lit("unknown"))
    )
    blocks = F.when(
        kind == "index", F.regexp_extract_all(xml, F.lit(_SM_BLOCK), F.lit(1))
    ).otherwise(F.regexp_extract_all(xml, F.lit(_URL_BLOCK), F.lit(1)))
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            F.nullif(
                _unescape(F.regexp_extract(b, _LOC, 1)), F.lit("")
            ).alias("loc"),
            F.nullif(F.regexp_extract(b, _LASTMOD, 1), F.lit("")).alias(
                "lastmod"
            ),
        ),
    )
    return (
        sitemaps.select(
            F.col(host_col).alias("host"),
            kind.alias("kind"),
            F.explode(entries).alias("e"),
        )
        .filter(F.col("e.loc").isNotNull())
        .select(
            "host", "kind",
            F.col("e.loc").alias("loc"),
            F.col("e.lastmod").alias("lastmod"),
        )
    )
