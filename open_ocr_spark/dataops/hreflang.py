"""hreflang alternate-language clusters.

International sites publish each page in several languages and link the
variants with ``<link rel="alternate" hreflang="xx" href="...">``
(Google's documented hreflang contract; RFC 8288 link relations). A
crawl pipeline needs the variant groups for: picking one language per
cluster during dedup, routing pages to per-language corpora, and
auditing declared-vs-detected language (dataops/htmlmeta.declared_lang
is the per-page half of that audit).

Two layers, both pure Catalyst (regexp_extract_all + one hash
aggregate; no joins, no Python, no window):

- ``hreflang_edges``: one row per alternate link (url, lang, href).
- ``hreflang_clusters``: per page, the variant-cluster key — the
  x-default target when declared, else the lexicographic minimum of
  the alternate set including the page itself (deterministic without
  any graph iteration: hreflang groups are cliques by contract, every
  member lists the same set, so min-of-set IS the connected-component
  key; full CC machinery — dataops/clusters.py — is only needed for
  broken non-clique markup, declared out of scope here).

Scale: the aggregate shuffles on the page url (uniform); output is one
row per page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LINK_RE = (
    r'<link rel="alternate" hreflang="([a-zA-Z][a-zA-Z0-9-]*)"'
    r' href="([^"]+)"'
)


def hreflang_edges(pages: DataFrame, html_col: str = "html_str",
                   url_col: str = "url") -> DataFrame:
    """(url, lang, href) per alternate link, document order preserved
    within a page by the zip of the two capture-group extractions."""
    langs = F.regexp_extract_all(F.col(html_col), F.lit(_LINK_RE), 1)
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(_LINK_RE), 2)
    pairs = F.arrays_zip(langs.alias("lang"), hrefs.alias("href"))
    return (
        pages.select(url_col, F.explode(pairs).alias("p"))
        .select(url_col, F.col("p.lang").alias("lang"),
                F.col("p.href").alias("href"))
    )


def hreflang_clusters(pages: DataFrame, html_col: str = "html_str",
                      url_col: str = "url") -> DataFrame:
    """(url, cluster_key, n_alternates, langs): one row per page that
    declares at least one alternate."""
    edges = hreflang_edges(pages, html_col, url_col)
    return (
        edges.groupBy(url_col)
        .agg(
            F.max(F.when(F.col("lang") == "x-default", F.col("href")))
            .alias("x_default"),
            F.min(F.when(F.col("lang") != "x-default", F.col("href")))
            .alias("min_href"),
            F.sum((F.col("lang") != "x-default").cast("int"))
            .alias("n_alternates"),
            F.array_join(
                F.array_sort(
                    F.collect_set(
                        F.when(F.col("lang") != "x-default", F.col("lang"))
                    )
                ),
                ",",
            ).alias("langs"),
        )
        .select(
            url_col,
            F.coalesce(
                "x_default", F.least("min_href", F.col(url_col))
            ).alias("cluster_key"),
            "n_alternates",
            "langs",
        )
    )
