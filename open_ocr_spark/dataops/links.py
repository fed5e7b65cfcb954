"""Outlink extraction and the host-level link graph.

The reference keys everything on a single request url
(/root/reference/ocr_request.go:6-17) and never looks INTO a page for
links; a crawl pipeline must — the link graph drives ranking,
prioritisation, and spam heuristics.  Extraction here is pure Catalyst:
three `regexp_extract_all` passes (double-quoted, single-quoted, bare
href values — disjoint classes, so no double counting) keep the hot
path JVM-side with zero Python, and only absolute http(s) targets
survive (relative-link resolution needs per-page base handling the
graph doesn't: hosts are what we aggregate).

Scale shape: extraction is a projection (no shuffle); the host-edge
aggregate is one hash agg on a (src_host, dst_host) key.  Host keys are
skewed (big sites attract links) — the aggregate itself is safe
(map-side combine collapses the skew before the exchange) but anyone
JOINING on dst_host downstream should use the salted partitioning in
pipeline/partitioning.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The attribute name must start at a whitespace boundary — `(?:[^>]*\s)?`
# instead of `[^>]*` — or `data-href` / `xlink:href` (attribute names in
# which "href" is a mere suffix) would match and fabricate outlinks the
# page's real link structure does not have.  Both HTML link-carrying
# elements are covered: `<a>` and `<area>` (imagemaps); the tag name must
# be followed by whitespace, so `<abbr`/`<article` never match.
_TAG = r"<[aA](?:[rR][eE][aA])?\s"
_HREF_DQ = _TAG + r'(?:[^>]*\s)?[hH][rR][eE][fF]\s*=\s*"([^"]*)"'
_HREF_SQ = _TAG + r"(?:[^>]*\s)?[hH][rR][eE][fF]\s*=\s*'([^']*)'"
_HREF_BARE = _TAG + r"(?:[^>]*\s)?[hH][rR][eE][fF]\s*=\s*([^\s>\"'][^\s>]*)"


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url): one row per absolute http(s) outlink occurrence
    (repeated links repeat — callers distinct if they need to) from both
    ``<a href>`` anchors and ``<area href>`` imagemap regions.  The html
    column may be binary (decoded utf-8 JVM-side) or string.

    Charset note — this utf-8 decode intentionally diverges from the
    extraction kernel's sniff-then-replace policy (kernels/htmltree.py
    sniff_charset): link extraction only consumes the ASCII-compatible
    ``<a href=...>`` byte structure, which every web charset this engine
    sniffs (cp1252/shift_jis/gb18030/cp949 are all ASCII supersets)
    encodes identically, so staying JVM-side with a single decode is the
    right trade.  Non-ASCII bytes inside an href may surface as mojibake
    under a non-utf-8 charset; callers with such corpora should decode
    under the sniff policy first and pass the string column."""
    html = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        html = F.decode(html, "UTF-8")
    hrefs = F.concat(
        F.regexp_extract_all(html, F.lit(_HREF_DQ), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_HREF_SQ), F.lit(1)),
        F.regexp_extract_all(html, F.lit(_HREF_BARE), F.lit(1)),
    )
    return (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.explode(hrefs).alias("dst_url"),
        )
        .filter(
            F.col("dst_url").startswith("http://")
            | F.col("dst_url").startswith("https://")
        )
    )


def host_edges(links: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links): the host-level link graph with link
    multiplicity.  One hash-aggregate shuffle; hosts lowercased so the
    graph is spelling-insensitive."""
    return (
        links.select(
            F.lower(F.parse_url(F.col("src_url"), F.lit("HOST"))).alias(
                "src_host"
            ),
            F.lower(F.parse_url(F.col("dst_url"), F.lit("HOST"))).alias(
                "dst_host"
            ),
        )
        .filter(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )
