"""Latest-crawl-per-url dedupe: the window stage before extraction.

Crawl tables carry re-fetches of the same url; extraction must run on the
newest snapshot only (SURVEY.md §2.B "Window functions"). Deterministic
tie-break on the html hash so the result is stable at any parallelism even
if two crawls share a timestamp (SURVEY.md §7.3 Hard #2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_url(pages: DataFrame) -> DataFrame:
    """Keep exactly one row per url: max warc_ts, ties broken by
    xxhash64(html) descending (deterministic, content-derived — no UUIDs,
    SURVEY.md §4.2.4).

    Implemented as groupBy + max_by(struct) rather than a row_number
    window: ONE hash shuffle with map-side partial aggregation (duplicates
    collapse before the exchange) and no per-partition sort. At 100 TB this
    halves the dedupe stage's shuffle volume on re-crawl-heavy tables; the
    window form would sort every partition. Output rows also leave this
    exchange already hash-distributed by url — the downstream extraction
    kernel needs no second repartition (the north_rule's bucket-by-url-hash
    IS this shuffle)."""
    other_cols = [c for c in pages.columns if c != "url"]
    ordering = F.struct(
        F.col("warc_ts"), F.xxhash64(F.col("html")).alias("_tie")
    )
    picked = pages.groupBy("url").agg(
        F.max_by(F.struct(*other_cols), ordering).alias("_row")
    )
    return picked.select("url", *[F.col(f"_row.{c}").alias(c) for c in other_cols])


def latest_per_url_window(pages: DataFrame) -> DataFrame:
    """row_number-window form of the same operator (kept for parity tests
    and for SURVEY §2.B window coverage; the agg form above is the scale
    path)."""
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(),
        F.xxhash64(F.col("html")).desc(),
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
