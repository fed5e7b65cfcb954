"""Run metrics: the aggregation surface of SURVEY.md §2.B over extraction
outputs — docs/bytes/failures by host, lang, crawl day. All built-in
aggregates (partial+final map-side combine is automatic); the host rollup
goes through a salted two-phase aggregation so skewed hosts never funnel
into one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_ocr_spark.pipeline.partitioning import host_of


def run_metrics(extracted: DataFrame) -> DataFrame:
    """Per-host metrics with skew-safe two-phase agg: partial by
    (host, salt-of-url) then final by host. Counts and sums re-aggregate
    losslessly."""
    partial = (
        extracted.withColumn("host", host_of(F.col("url")))
        .withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(16)))
        .groupBy("host", "_salt")
        .agg(
            F.count("*").alias("_docs"),
            F.sum("n_bytes").alias("_bytes"),
            F.sum((F.col("status") != "ok").cast("long")).alias("_failures"),
        )
    )
    return (
        partial.groupBy("host")
        .agg(
            F.sum("_docs").alias("docs"),
            F.sum("_bytes").alias("bytes"),
            F.sum("_failures").alias("failures"),
        )
        .orderBy(F.desc("docs"), F.asc("host"))
    )


def lang_metrics(pages: DataFrame) -> DataFrame:
    """Docs + payload bytes per language — column-pruned: reads only
    (lang, html) from the scan."""
    return (
        pages.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.octet_length("html")).alias("bytes"),
        )
        .orderBy(F.desc("docs"), F.asc("lang"))
    )


def daily_metrics(pages: DataFrame) -> DataFrame:
    """Docs per crawl day (warc_ts truncated)."""
    return (
        pages.groupBy(F.date_trunc("day", F.col("warc_ts")).alias("crawl_day"))
        .agg(F.count("*").alias("docs"))
        .orderBy("crawl_day")
    )
