"""Canonical-key assignment: the one URL a crawl dedups/groups under.

A capture's canonical identity comes from three places, in a frozen
priority order (what search-engine dedup pipelines do):

1. the page's own ``<link rel=canonical>`` (authoritative author
   signal; routinely RELATIVE, so it resolves against the page URL per
   RFC 3986);
2. else the HTTP/meta-refresh redirect chain's FINAL target
   (dataops/redirects.py pointer doubling — ``<meta http-equiv=refresh
   content="N; url=...">`` edges union with the 3xx edges, because the
   web uses both interchangeably);
3. else the URL itself.

The winner is then normalized by canonicalize_url (dataops/urls.py) so
spelling variants of the same canonical collapse.  NON-RECURSIVE by
design: a rel-canonical pointing at a page that itself declares another
canonical is taken at one step — chasing author signals transitively
lets one spam page rewrite a whole site's identity.

Scale shape: one projection per signal, the doubling's K pinned
self-joins for chains, one left join of pages against chain finals on
the uniform url key.  No Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from open_ocr_spark.dataops.redirects import resolve_redirect_chains
from open_ocr_spark.dataops.resolveurl import resolve_url
from open_ocr_spark.dataops.urls import canonicalize_url

# <meta http-equiv=refresh content="N; url=target"> — the content attr
# may come before or after http-equiv (both patterns below); a bare "N"
# content (refresh-in-place) carries no target.
_REFRESH_CONTENT = (
    r"(?is)<meta\s[^>]*http-equiv\s*=\s*[\"']?refresh[\"']?[^>]*"
    r"content\s*=\s*[\"']([^\"']*)[\"']"
)
_REFRESH_CONTENT_REV = (
    r"(?is)<meta\s[^>]*content\s*=\s*[\"']([^\"']*)[\"'][^>]*"
    r"http-equiv\s*=\s*[\"']?refresh[\"']?"
)
_REFRESH_URL = r"(?i)url\s*=\s*([^\s\"']+)"

_REL_CANONICAL = (
    r"(?is)<link\s[^>]*rel\s*=\s*[\"']?canonical[\"']?[^>]*"
    r"href\s*=\s*[\"']([^\"']*)[\"']"
)


def meta_refresh_target(html: Column, url: Column) -> Column:
    """The meta-refresh redirect target resolved against the page URL;
    NULL when the page has no refresh or a target-less one."""
    content = F.coalesce(
        F.nullif(F.regexp_extract(html, _REFRESH_CONTENT, 1), F.lit("")),
        F.nullif(
            F.regexp_extract(html, _REFRESH_CONTENT_REV, 1), F.lit("")
        ),
    )
    raw = F.nullif(F.regexp_extract(content, _REFRESH_URL, 1), F.lit(""))
    return F.when(raw.isNotNull(), resolve_url(url, raw))


def rel_canonical_target(html: Column, url: Column) -> Column:
    """The rel=canonical href resolved against the page URL; NULL when
    absent or empty."""
    raw = F.nullif(F.regexp_extract(html, _REL_CANONICAL, 1), F.lit(""))
    return F.when(raw.isNotNull(), resolve_url(url, raw))


def assign_canonical(
    pages: DataFrame,
    captures: DataFrame | None = None,
    max_hops: int = 8,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(url, canonical_key, signal): the frozen-priority canonical
    identity per page.  ``captures`` optionally carries HTTP redirect
    rows (url, status, location); meta-refresh edges come from the pages
    themselves and union in.  ``signal`` names the winning source
    ('rel_canonical' / 'redirect' / 'self') so dedup audits can slice by
    provenance."""
    html = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        html = F.decode(html, "UTF-8")
    url = F.col(url_col)
    base = pages.select(
        url.alias("url"),
        rel_canonical_target(html, url).alias("rel_canon"),
        meta_refresh_target(html, url).alias("refresh_target"),
    )
    refresh_edges = base.where(F.col("refresh_target").isNotNull()).select(
        "url",
        F.lit(301).alias("status"),
        F.col("refresh_target").alias("location"),
    )
    edges = refresh_edges
    if captures is not None:
        http = captures.select("url", "status", "location")
        # one edge per url: an HTTP 3xx beats the page's meta refresh
        # (the refresh body was never served when the server redirected)
        edges = http.unionAll(
            refresh_edges.join(http.select("url"), "url", "left_anti")
        )
    finals = resolve_redirect_chains(edges, max_hops=max_hops).select(
        F.col("url").alias("f_url"),
        F.col("final_url"),
        F.col("hops"),
    )
    joined = base.join(finals, base["url"] == finals["f_url"], "left")
    moved = F.col("hops").isNotNull() & (F.col("hops") > 0)
    return joined.select(
        "url",
        canonicalize_url(
            F.coalesce(
                F.col("rel_canon"),
                F.when(moved, F.col("final_url")),
                F.col("url"),
            )
        ).alias("canonical_key"),
        F.when(F.col("rel_canon").isNotNull(), F.lit("rel_canonical"))
        .when(moved, F.lit("redirect"))
        .otherwise(F.lit("self"))
        .alias("signal"),
    )
