"""Crawl-snapshot delta: classify every URL across two crawls as
added / removed / changed / unchanged.

Recrawl planning runs this constantly — the changed/added set feeds the
fetch queue, the unchanged set keeps its previous extraction (so the
expensive kernel never re-runs on stable pages), and the removed set
tombstones downstream indexes.  The reference's resume machinery
(ocr_request id correlation) is per-request; a corpus-level diff is the
batch analogue this engine needs at 100 TB.

Scale shape: ONE full outer join on the URL key — both sides bucketable
on the same key (pipeline/partitioning.py), so on a bucketed layout the
join is exchange-free; classification is a pure projection.  Content
comparison uses a caller-supplied digest column (md5 of the payload,
computed at ingest) rather than the payload itself, so the join carries
~50 bytes/row, not page bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    digest_col: str = "content_md5",
) -> DataFrame:
    """(url, status, old_md5, new_md5) with status in
    {'added','removed','changed','unchanged'}: full outer join of two
    snapshots on the URL, content equality by digest."""
    o = old.select(
        F.col(key_col).alias("url"), F.col(digest_col).alias("old_md5")
    )
    n = new.select(
        F.col(key_col).alias("url"), F.col(digest_col).alias("new_md5")
    )
    joined = o.join(n, "url", "full_outer")
    return joined.select(
        "url",
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") == F.col("new_md5"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        "old_md5",
        "new_md5",
    )
