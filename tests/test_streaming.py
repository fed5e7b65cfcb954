"""Streaming tier: the SAME kernel under readStream (batch/stream parity),
checkpointed incremental processing, and watermarked tumbling windows."""

import pyspark.sql.functions as F
import pytest

from open_ocr_spark.fixtures import golden_df, pages_df
from open_ocr_spark.streaming import (
    stream_extract,
    windowed_event_counts,
)

N_ROWS = 120


def test_stream_extract_matches_goldens(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_df(spark, N_ROWS)
    pages.write.mode("overwrite").parquet(pages_dir)

    q = stream_extract(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    # streaming emits per (url, warc_ts) without dedupe: row count equals
    # the INPUT count, not the deduped golden count
    assert got.count() == pages.count()

    # the golden table reflects the NEWEST crawl per url; compare the
    # streaming outputs restricted to newest-crawl rows byte-identically
    golden = golden_df(spark, N_ROWS)
    latest_out = (
        got.join(golden, "url")
        .filter(
            (got["extracted_text"] == golden["extracted_text"])
            & (got["status"] == golden["status"])
        )
        .select("url")
        .distinct()
    )
    # every url's newest-crawl extraction appears in the stream output
    assert latest_out.count() == golden.count()


def test_stream_incremental_checkpoint(spark, tmp_path):
    """New files appearing after the first run are processed exactly once
    on the next availableNow run (checkpoint offset tracking)."""
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = pages_df(spark, 40)
    first.write.mode("overwrite").parquet(pages_dir)
    q = stream_extract(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == first.count()

    # append a second batch of NEW urls (offset>40 via different seed rows)
    second = pages_df(spark, 80).join(
        first.select("url"), "url", "left_anti"
    )
    second.write.mode("append").parquet(pages_dir)
    q2 = stream_extract(spark, pages_dir, out_dir, ckpt)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(out_dir).count()
    assert n2 == n1 + second.count()

    # third run with nothing new: no duplicates
    q3 = stream_extract(spark, pages_dir, out_dir, ckpt)
    q3.awaitTermination(300)
    assert spark.read.parquet(out_dir).count() == n2


def test_windowed_event_counts_batch_parity(spark):
    """The watermark+window agg gives the same answer on a batch DataFrame
    as plain date_trunc bucketing (streaming/batch symmetry)."""
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:05:00", 1, "click", 1.0),
            (2, "2024-01-01 10:55:00", 1, "click", 2.0),
            (3, "2024-01-01 11:05:00", 2, "view", 3.0),
            (4, "2024-01-01 11:59:00", 2, "click", 4.0),
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id",
        "event_type", "value",
    )
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_event_counts(events, "1 hour", "2 hours").collect()
    }
    assert got[("2024-01-01 10:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 11:00:00", "view")] == (1, 3.0)
    assert got[("2024-01-01 11:00:00", "click")] == (1, 4.0)
