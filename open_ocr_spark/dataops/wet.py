"""WET / WAT export layouts over the WARC container (ISO 28500; the
Common-Crawl derived-file shapes documented at commoncrawl.org/the-data/
get-started): downstream consumers of a crawl-extraction engine read WET
(extracted-text "conversion" records) and WAT (JSON "metadata" records)
far more often than raw WARC, so the engine that PRODUCES extracted text
must also emit them.  The reference serves one document's text per HTTP
response (/root/reference/ocr_http_handler.go:50-74); at corpus scale the
same output ships as WET/WAT segment files.

Both builders are pure Catalyst: each record is a string concat (version
line, CRLF headers, Content-Length in BYTES, two-CRLF separator — the
exact grammar `sources.parse_warc_bytes` consumes), and a segment file is
an `array_join` over one hash-bucketed aggregation.  No Python anywhere;
the one exchange is the file-assignment shuffle, whose key the caller
picks (url-hash buckets at 10^12 docs, so segment sizes are uniform
regardless of host skew).

Scale notes:
- A segment's records ride `collect_list` inside the agg.  That is the
  format's own constraint — a WET file IS a concatenation of its records
  — and the bucket count is the lever: at 10^12 docs and ~1k docs/file
  the exchange is uniform (md5 keys) and each group is a few MB, the
  same shape Common Crawl's own 1.2M-file segments use.
- Record IDs are deterministic (md5 of the target URI), so output bytes
  are parallelism-invariant and resumable reruns re-emit identical
  segments (the checkpoint layer diffs bytes, pipeline/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from open_ocr_spark.dataops.htmlmeta import extract_html_meta
from open_ocr_spark.dataops.links import extract_links

WET_DATE = "2024-01-01T00:00:00Z"

_WARCINFO_BODY = (
    "software: open-ocr-spark WET/WAT writer\r\n"
    "format: WARC File Format 1.0\r\n"
)


def _record(
    warc_type: str | Column, uri: Column | None, date: Column, ctype: str,
    body: Column, extra: Column | None = None,
) -> Column:
    """One spec-shaped WARC record as a string column: version line, CRLF
    headers, Content-Length counted in BYTES (octet_length — a multibyte
    body must not be counted in characters), blank line, body.  The
    record SEPARATOR (two CRLFs) is added by the array_join in
    `_files`, matching `sources.build_warc`.  ``warc_type`` may be a
    Column for writers that interleave record types (revisit.py)."""
    if not isinstance(warc_type, Column):
        warc_type = F.lit(warc_type)
    parts = [F.lit("WARC/1.0\r\nWARC-Type: "), warc_type, F.lit("\r\n")]
    if uri is not None:
        parts += [F.lit("WARC-Target-URI: "), uri, F.lit("\r\n")]
        parts += [
            F.lit("WARC-Record-ID: <urn:md5:"), F.md5(F.encode(uri, "utf-8")),
            F.lit(">\r\n"),
        ]
    if extra is not None:
        parts.append(extra)
    parts += [
        F.lit("WARC-Date: "), date,
        F.lit(f"\r\nContent-Type: {ctype}\r\nContent-Length: "),
        F.octet_length(body).cast("string"),
        F.lit("\r\n\r\n"),
        body,
    ]
    return F.concat(*parts)


def _files(records: DataFrame, num_buckets: int, file_col: str) -> DataFrame:
    """(file_id, <file_col> binary): md5-bucket the per-document records
    (packing.md5_bucket — the engine-independent expression every sampler
    and packer in this repo shares, so DuckDB oracles can replay the file
    assignment), then assemble each bucket into one file led by a
    `warcinfo` record.  One exchange total; the sort key inside a file is
    (uri) so bytes are deterministic at any parallelism."""
    from open_ocr_spark.dataops.packing import md5_bucket

    date = F.lit(WET_DATE)
    info = _record(
        "warcinfo", None, date, "application/warc-fields",
        F.lit(_WARCINFO_BODY),
    )
    return (
        records.select(
            md5_bucket(F.col("uri"), num_buckets).alias("file_id"),
            F.struct(F.col("uri"), F.col("rec")).alias("s"),
        )
        .groupBy("file_id")
        .agg(
            F.encode(
                F.concat(
                    info,
                    F.lit("\r\n\r\n"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list("s")),
                            lambda s: s["rec"],
                        ),
                        "\r\n\r\n",
                    ),
                    F.lit("\r\n\r\n"),
                ),
                "utf-8",
            ).alias(file_col)
        )
    )


def wet_files(
    extracted: DataFrame,
    num_buckets: int = 16,
    url_col: str = "url",
    text_col: str = "extracted_text",
) -> DataFrame:
    """(file_id, wet binary): Common-Crawl-style WET segments from the
    extraction output — a `warcinfo` lead record, then one `conversion`
    record per document carrying the extracted text as text/plain.
    Roundtrips through `sources.records_from_warc` byte-exactly."""
    recs = extracted.select(
        F.col(url_col).alias("uri"),
        _record(
            "conversion",
            F.col(url_col),
            F.lit(WET_DATE),
            "text/plain",
            F.coalesce(F.col(text_col), F.lit("")),
        ).alias("rec"),
    )
    return _files(recs, num_buckets, "wet")


def wat_json(pages: DataFrame, url_col: str = "url",
             html_col: str = "html") -> DataFrame:
    """(url, wat) — the per-page WAT metadata envelope as a JSON string:

        {"Envelope": {"WARC-Header-Metadata": {"WARC-Target-URI": ...},
                      "Payload-Metadata": {"HTML-Metadata": {
                          "Head": {"Title": ...},
                          "Links": [{"url": ...}, ...]}}}}

    Field values come from the engine's own parsers (htmlmeta title,
    links outlink extraction — the same operators the quality gates use),
    so WAT is a composition, not a second parser.  `to_json` with
    explicit struct fields keeps key order deterministic; pages with no
    outlinks carry an empty Links array (not null), per the CC shape."""
    links = (
        extract_links(pages, url_col=url_col, html_col=html_col)
        .groupBy(F.col("src_url").alias("url"))
        .agg(
            F.array_sort(F.collect_list(F.struct(F.col("dst_url").alias("url"))))
            .alias("links")
        )
    )
    meta = extract_html_meta(pages, url_col=url_col, html_col=html_col)
    return (
        meta.join(links, "url", "left")
        .select(
            "url",
            F.to_json(
                F.struct(
                    F.struct(
                        F.struct(
                            F.col("url").alias("WARC-Target-URI"),
                        ).alias("WARC-Header-Metadata"),
                        F.struct(
                            F.struct(
                                F.struct(F.col("title").alias("Title"))
                                .alias("Head"),
                                F.coalesce(
                                    F.col("links"),
                                    F.array().cast(
                                        "array<struct<url:string>>"
                                    ),
                                ).alias("Links"),
                            ).alias("HTML-Metadata"),
                        ).alias("Payload-Metadata"),
                    ).alias("Envelope")
                )
            ).alias("wat"),
        )
    )


def wat_files(
    pages: DataFrame,
    num_buckets: int = 16,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(file_id, wat binary): WAT segments — a `warcinfo` lead record,
    then one `metadata` record per page whose payload is the JSON
    envelope from `wat_json`.  Same container grammar as `wet_files`."""
    recs = wat_json(pages, url_col=url_col, html_col=html_col).select(
        F.col("url").alias("uri"),
        _record(
            "metadata",
            F.col("url"),
            F.lit(WET_DATE),
            "application/json",
            F.col("wat"),
        ).alias("rec"),
    )
    return _files(recs, num_buckets, "wat")
