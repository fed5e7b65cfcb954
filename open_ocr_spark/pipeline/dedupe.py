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
    SURVEY.md §4.2.4)."""
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc(),
        F.xxhash64(F.col("html")).desc(),
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
