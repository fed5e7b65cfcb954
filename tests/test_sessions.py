"""Sessionization + stateful streaming tier: the Catalyst form, the
applyInPandas grouped form, and the applyInPandasWithState streaming form
must agree; streaming state must survive a query restart."""

import pyspark.sql.functions as F

from open_ocr_spark.dataops.sessions import (
    sessionize_events,
    sessionize_events_grouped,
)
from open_ocr_spark.streaming import running_user_counts_stateful

SF = "/root/testdata/sf0.001"


def test_grouped_map_matches_catalyst(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    a = sessionize_events(events)
    b = sessionize_events_grouped(events).select(*a.columns)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_session_gap_semantics(spark):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, "c", 1.0, ""),
            (2, "2024-01-01 10:10:00", 7, "c", 2.0, ""),   # same session
            (3, "2024-01-01 11:00:00", 7, "c", 4.0, ""),   # 50min gap: new
            (4, "2024-01-01 11:00:00", 8, "c", 8.0, ""),   # other user
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id",
        "event_type", "value", "props",
    )
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"])
        for r in sessionize_events(events, gap_seconds=1800).collect()
    }
    assert got[(7, 1)] == (2, 3.0)
    assert got[(7, 2)] == (1, 4.0)
    assert got[(8, 1)] == (1, 8.0)


def test_stateful_counts_survive_restart(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    all_events = spark.read.parquet(f"{SF}/events.parquet").cache()
    first = all_events.filter(F.col("event_id") % 2 == 0)
    second = all_events.filter(F.col("event_id") % 2 == 1)

    first.write.mode("overwrite").parquet(events_dir)
    q = running_user_counts_stateful(spark, events_dir, out_dir, ckpt)
    q.awaitTermination(300)

    second.write.mode("append").parquet(events_dir)
    q2 = running_user_counts_stateful(spark, events_dir, out_dir, ckpt)
    q2.awaitTermination(300)

    # counts are monotone: the max per user across emitted updates is the
    # running total, which must equal the batch ground truth over ALL rows
    got = (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    want = all_events.groupBy("user_id").agg(F.count("*").alias("n_events"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
