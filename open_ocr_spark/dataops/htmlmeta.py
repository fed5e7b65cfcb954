"""Page-metadata extraction: <title>, meta description, canonical link,
og:title.

Every crawl pipeline materializes these fields next to the extracted
text — they feed dedup (canonical URL beats the fetch URL when present),
search indexing, and quality heuristics.  The reference transports whole
pages and never looks at metadata (its unit is the OCR payload,
/root/reference/ocr_request.go:6-17); this belongs to the repo's
extended web-corpus surface.

Like dataops/links.py, extraction stays pure Catalyst — four
`regexp_extract` projections, zero Python, no shuffle — and tolerates
the two dominant real-world attribute orders (name-before-content and
content-before-name) by coalescing a mirrored pattern.  Regexes use
only syntax shared by Java regex and RE2 (inline (?i), lazy
quantifiers, no backreferences), so a DuckDB oracle can run the same
patterns verbatim.  Empty extraction results normalize to NULL so
"absent" is one value, not two ('' vs NULL differ between engines'
no-match conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TITLE = r"(?is)<title[^>]*>(.*?)</title>"
# name=description ... content="...", both quote styles, either order
_DESC_NC = (
    r'(?is)<meta\s[^>]*name\s*=\s*["\']?description["\']?[^>]*'
    r'content\s*=\s*["\']([^"\']*)'
)
_DESC_CN = (
    r'(?is)<meta\s[^>]*content\s*=\s*["\']([^"\']*)["\'][^>]*'
    r'name\s*=\s*["\']?description["\']?'
)
_CANONICAL = (
    r'(?is)<link\s[^>]*rel\s*=\s*["\']?canonical["\']?[^>]*'
    r'href\s*=\s*["\']([^"\']*)'
)
_OG_TITLE = (
    r'(?is)<meta\s[^>]*property\s*=\s*["\']?og:title["\']?[^>]*'
    r'content\s*=\s*["\']([^"\']*)'
)


def _field(html, pattern: str):
    return F.nullif(F.trim(F.regexp_extract(html, pattern, 1)), F.lit(""))


def extract_html_meta(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, title, meta_description, canonical_url, og_title): one row
    per page; absent fields are NULL.  The html column may be binary
    (decoded utf-8 JVM-side — the ASCII-superset reasoning of
    dataops/links.py applies) or string."""
    html = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        html = F.decode(html, "UTF-8")
    return pages.select(
        F.col(url_col).alias("url"),
        _field(html, _TITLE).alias("title"),
        F.coalesce(
            _field(html, _DESC_NC), _field(html, _DESC_CN)
        ).alias("meta_description"),
        _field(html, _CANONICAL).alias("canonical_url"),
        _field(html, _OG_TITLE).alias("og_title"),
    )


# --- JSON-LD structured data -------------------------------------------------

_LD_BLOCK = (
    r'(?is)<script[^>]*type\s*=\s*["\']application/ld\+json["\'][^>]*>'
    r"(.*?)</script>"
)


def extract_json_ld(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, ld_type, name) — one row per parseable JSON-LD block
    (schema.org structured data: articles, products, breadcrumbs...),
    the machine-readable metadata harvest every commercial crawl runs.

    Pure Catalyst end to end: regexp_extract_all finds every
    <script type="application/ld+json"> block (RE2/Java-shared syntax,
    like the other patterns in this module), explode fans blocks out,
    get_json_object pulls @type/name — ONLY malformed JSON drops the
    row (filter on the '$' parse succeeding), an error-as-value per
    block rather than per page. Valid blocks with no top-level @type
    (@graph containers, @context-only wrappers) are KEPT with a NULL
    ld_type so downstream consumers decide (ADVICE r4: dropping them
    silently lost real structured data under a contract that claimed
    only malformed JSON drops). No shuffle before the explode; block
    volume is output-proportional."""
    html = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        html = F.decode(html, "utf-8")
    blocks = pages.select(
        id_col, F.explode(F.regexp_extract_all(html, F.lit(_LD_BLOCK), 1)).alias("block")
    )
    return (
        blocks.filter(F.get_json_object("block", "$").isNotNull())
        .select(
            id_col,
            F.get_json_object("block", "$['@type']").alias("ld_type"),
            F.get_json_object("block", "$.name").alias("name"),
        )
    )


# --- publication date -------------------------------------------------------------

# Source priority for a page's publication date, highest first: the
# page's structured data (JSON-LD datePublished), then the social-graph
# meta tag (article:published_time), then a /YYYY/MM/DD/ URL path
# segment.  The date-bearing string is truncated to its ISO calendar
# prefix (the first 10 chars of an ISO 8601 timestamp) and cast with
# try_to_date semantics — an unparseable value falls through to the
# next source rather than erroring.
_JSONLD_DATE = r'"datePublished"\s*:\s*"(\d{4}-\d{2}-\d{2})'
_META_PUBTIME = (
    r"(?is)<meta\s[^>]*property\s*=\s*[\"']article:published_time[\"']"
    r"[^>]*content\s*=\s*[\"'](\d{4}-\d{2}-\d{2})"
)
_URL_DATE = r"/((?:19|20)\d{2})/(\d{2})/(\d{2})/"


def extract_publish_date(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, publish_date, date_source): the page's publication date
    under the frozen source priority (module comment) — the recency
    signal a training pipeline slices and filters on.  date_source names
    the winner ('json_ld' / 'meta' / 'url_path'); pages with none yield
    NULL/NULL.  Pure Catalyst projection."""
    html = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        html = F.decode(html, "UTF-8")
    url = F.col(url_col)
    jl = F.try_to_date(
        F.nullif(F.regexp_extract(html, _JSONLD_DATE, 1), F.lit(""))
    )
    mt = F.try_to_date(
        F.nullif(F.regexp_extract(html, _META_PUBTIME, 1), F.lit(""))
    )
    up = F.try_to_date(
        F.nullif(
            F.concat_ws(
                "-",
                F.regexp_extract(url, _URL_DATE, 1),
                F.regexp_extract(url, _URL_DATE, 2),
                F.regexp_extract(url, _URL_DATE, 3),
            ),
            F.lit("--"),
        )
    )
    return pages.select(
        url.alias("url"),
        F.coalesce(jl, mt, up).alias("publish_date"),
        F.when(jl.isNotNull(), F.lit("json_ld"))
        .when(mt.isNotNull(), F.lit("meta"))
        .when(up.isNotNull(), F.lit("url_path"))
        .alias("date_source"),
    )


# --- declared language ---------------------------------------------------------

_HTML_LANG = r"(?is)<html\s[^>]*lang\s*=\s*[\"']?([a-zA-Z0-9_-]+)"


def declared_lang(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, lang_attr, lang_primary): the page's self-declared language
    — the <html lang> attribute, normalized to its BCP-47 PRIMARY
    subtag (lowercased, '_' tolerated for '-', first subtag taken:
    en-US / EN / fr_FR all yield en / en / fr).  Pages without the
    attribute yield NULL/NULL.  A corpus audit joins this against the
    content-model language to find mislabeled pages (the declared
    attribute is wrong often enough that CLD-style pipelines treat it as
    a hint, never a label).  Pure Catalyst projection."""
    html = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        html = F.decode(html, "UTF-8")
    raw = F.nullif(F.regexp_extract(html, _HTML_LANG, 1), F.lit(""))
    primary = F.element_at(
        F.split(F.lower(F.replace(raw, F.lit("_"), F.lit("-"))), "-"), 1
    )
    return pages.select(
        F.col(url_col).alias("url"),
        raw.alias("lang_attr"),
        primary.alias("lang_primary"),
    )
