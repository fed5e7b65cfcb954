"""Streaming tier: the SAME kernel under readStream (batch/stream parity),
checkpointed incremental processing, and watermarked tumbling windows."""

import pyspark.sql.functions as F
import pytest

from open_ocr_spark.fixtures import golden_df, pages_df
from open_ocr_spark.streaming import (
    session_window_stats,
    stream_extract,
    stream_extract_deduped,
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


def test_stream_extract_deduped_one_row_per_url(spark, tmp_path):
    """A url re-crawled within the watermark horizon extracts exactly once
    (bounded-state dropDuplicatesWithinWatermark); the fixture's re-crawls
    span 30 days, so a 40-day horizon covers them all."""
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = pages_df(spark, N_ROWS)
    pages.write.mode("overwrite").parquet(pages_dir)
    n_rows = pages.count()
    n_urls = pages.select("url").distinct().count()
    assert n_urls < n_rows  # fixture really contains re-crawls

    q = stream_extract_deduped(spark, pages_dir, out_dir, ckpt,
                               watermark="40 days")
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    assert got.count() == n_urls
    assert got.select("url").distinct().count() == n_urls
    # suppressed re-crawls never reach the kernel: every emitted row is a
    # real extraction (ok or error-as-value), none missing
    assert got.filter(F.col("status").isNull()).count() == 0


def test_session_window_stats_matches_batch_sessionizer(spark):
    """The native session_window grouping reproduces the batch
    sessionizer's (n_events, sum_value) per session, and its window end is
    last-event + gap (documented close semantics)."""
    from open_ocr_spark.dataops.sessions import sessionize_events

    rows = [
        # user 1: two sessions (gap 1800s): events at 10:00,10:10 | 11:30
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (2, "2024-01-01 10:10:00", 1, "view", 2.0),
        (3, "2024-01-01 11:30:00", 1, "click", 4.0),
        # user 2: one session spanning the same wall-clock range
        (4, "2024-01-01 10:00:00", 2, "click", 8.0),
        (5, "2024-01-01 10:29:00", 2, "view", 16.0),
        (6, "2024-01-01 10:58:00", 2, "click", 32.0),
        # user 3: gap of EXACTLY 1800 s — merges into one session (Spark
        # merges an event landing on the window close; new session only
        # when the gap exceeds the duration, probed live)
        (7, "2024-01-01 10:00:00", 3, "click", 64.0),
        (8, "2024-01-01 10:30:00", 3, "view", 128.0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id",
        "event_type", "value",
    )

    got = {
        (r["user_id"], str(r["session_start"])): r
        for r in session_window_stats(events, gap_seconds=1800).collect()
    }
    assert len(got) == 4
    s3 = got[(3, "2024-01-01 10:00:00")]
    assert (s3["n_events"], s3["sum_value"]) == (2, 192.0)
    s1a = got[(1, "2024-01-01 10:00:00")]
    assert (s1a["n_events"], s1a["sum_value"]) == (2, 3.0)
    # close = last event (10:10) + 1800s gap
    assert str(s1a["session_end"]) == "2024-01-01 10:40:00"
    s1b = got[(1, "2024-01-01 11:30:00")]
    assert (s1b["n_events"], s1b["sum_value"]) == (1, 4.0)
    s2 = got[(2, "2024-01-01 10:00:00")]
    assert (s2["n_events"], s2["sum_value"]) == (3, 56.0)

    # full parity vs the batch sessionizer: same session count and the
    # same (n_events, sum_value) multiset per user; start == start and
    # end == session_end - gap
    batch = sessionize_events(events, gap_seconds=1800).collect()
    assert len(batch) == len(got)
    batch_keys = {
        (b["user_id"], b["start_epoch"], b["n_events"], b["sum_value"])
        for b in batch
    }
    stream_keys = {
        (
            r["user_id"],
            int(r["session_start"].timestamp()),
            r["n_events"],
            r["sum_value"],
        )
        for r in got.values()
    }
    assert batch_keys == stream_keys


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
