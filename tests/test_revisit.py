"""WARC revisit records (dataops/revisit.py): the digest-dedup storage
layout must classify capture history correctly (first capture stored,
later identical payloads become body-less revisits pointing at it),
write spec-shaped records the repo's own parser reads back byte-exactly,
and stay parallelism-invariant."""

from pyspark.sql import functions as F

from open_ocr_spark.dataops.revisit import (
    REVISIT_PROFILE,
    classify_captures,
    revisit_warc_files,
)
from open_ocr_spark.sources import parse_warc_bytes

CAPS_SCHEMA = "url string, warc_date string, payload binary"


def _caps(spark, rows, parts=None):
    df = spark.createDataFrame(
        [(u, d, p.encode()) for u, d, p in rows], CAPS_SCHEMA
    )
    return df.repartition(parts) if parts else df


HISTORY = [
    # url A fetched three times, unchanged twice then changed
    ("https://ex.com/a", "2024-01-01T00:00:00Z", "body one"),
    ("https://ex.com/a", "2024-01-02T00:00:00Z", "body one"),
    ("https://ex.com/a", "2024-01-03T00:00:00Z", "body CHANGED"),
    # url B serves the same bytes as A's first capture (cross-url dup)
    ("https://ex.com/b", "2024-01-02T00:00:00Z", "body one"),
    # url C unique
    ("https://ex.com/c", "2024-01-01T00:00:00Z", "only here"),
]


def test_classification(spark):
    out = {
        (r["url"], r["warc_date"]): r
        for r in classify_captures(_caps(spark, HISTORY)).collect()
    }
    a1 = out[("https://ex.com/a", "2024-01-01T00:00:00Z")]
    a2 = out[("https://ex.com/a", "2024-01-02T00:00:00Z")]
    a3 = out[("https://ex.com/a", "2024-01-03T00:00:00Z")]
    b = out[("https://ex.com/b", "2024-01-02T00:00:00Z")]
    c = out[("https://ex.com/c", "2024-01-01T00:00:00Z")]
    assert a1["warc_type"] == "response" and a1["refers_to_uri"] is None
    # unchanged refetch AND cross-url dup both point at the original
    for dup in (a2, b):
        assert dup["warc_type"] == "revisit"
        assert dup["refers_to_uri"] == "https://ex.com/a"
        assert dup["refers_to_date"] == "2024-01-01T00:00:00Z"
        assert dup["payload_digest"] == a1["payload_digest"]
    # changed payload is a fresh original, not a revisit
    assert a3["warc_type"] == "response" and a3["refers_to_uri"] is None
    assert c["warc_type"] == "response"


def test_roundtrip_through_own_parser(spark):
    files = revisit_warc_files(_caps(spark, HISTORY), num_buckets=2).collect()
    recs = [
        r
        for row in files
        for r in parse_warc_bytes(bytes(row["warc"]))
        if r["warc_type"] != "warcinfo"
    ]
    assert all(r["error"] is None for r in recs)
    by_key = {(r["target_uri"], r["warc_date"]): r for r in recs}
    assert len(by_key) == len(HISTORY)
    stored = {k: v for k, v in by_key.items() if v["warc_type"] == "response"}
    revisits = {k: v for k, v in by_key.items() if v["warc_type"] == "revisit"}
    assert len(stored) == 3 and len(revisits) == 2
    # originals carry the payload bytes; revisits carry NONE (the whole
    # point of the layout) but keep digest + refers-to on their headers
    assert {v["payload"] for v in stored.values()} == {
        b"body one", b"body CHANGED", b"only here"
    }
    for v in revisits.values():
        assert v["payload"] == b""
        assert v["refers_to_uri"] == "https://ex.com/a"
        assert v["payload_digest"].startswith("md5:")
    # archive shrinks by exactly the duplicate payload bytes
    dup_bytes = sum(len(p.encode()) for _, _, p in HISTORY) - sum(
        len(v["payload"]) for v in stored.values()
    )
    assert dup_bytes == 2 * len(b"body one")


def test_profile_header_written(spark):
    files = revisit_warc_files(_caps(spark, HISTORY), num_buckets=1).collect()
    raw = b"".join(bytes(r["warc"]) for r in files)
    assert raw.count(REVISIT_PROFILE.encode()) == 2


def test_parallelism_invariance(spark):
    one = revisit_warc_files(_caps(spark, HISTORY), num_buckets=2)
    many = revisit_warc_files(_caps(spark, HISTORY, parts=7), num_buckets=2)
    a = {r["file_id"]: bytes(r["warc"]) for r in one.collect()}
    b = {r["file_id"]: bytes(r["warc"]) for r in many.collect()}
    assert a == b


def test_date_tiebreak_is_url(spark):
    rows = [
        ("https://ex.com/z", "2024-01-01T00:00:00Z", "same"),
        ("https://ex.com/a", "2024-01-01T00:00:00Z", "same"),
    ]
    out = {r["url"]: r for r in classify_captures(_caps(spark, rows)).collect()}
    assert out["https://ex.com/a"]["warc_type"] == "response"
    assert out["https://ex.com/z"]["refers_to_uri"] == "https://ex.com/a"


# --- adaptive recrawl scheduling (r5, dataops/delta.py) ----------------------


def test_recrawl_schedule_rule_and_clamps(spark):
    from open_ocr_spark.dataops.delta import recrawl_schedule

    rows = [
        ("a", "changed", 48),     # halve -> 24
        ("b", "changed", 8),      # halve 4, floor -> 6
        ("c", "unchanged", 48),   # double -> 96
        ("d", "unchanged", 700),  # double 1400, cap -> 720
        ("e", "added", None),     # base -> 24
        ("f", "removed", 96),     # tombstone -> NULL, priority 0
        ("g", "changed", None),   # no history: base 24 -> halve -> 12
    ]
    df = spark.createDataFrame(
        rows, "url string, status string, prev_interval_h long"
    )
    got = {r["url"]: (r["next_interval_h"], r["priority"])
           for r in recrawl_schedule(df).collect()}
    assert got["a"] == (24, 30)
    assert got["b"] == (6, 120)
    assert got["c"] == (96, 7)
    assert got["d"] == (720, 1)
    assert got["e"] == (24, 30)
    assert got["f"] == (None, 0)
    assert got["g"] == (12, 60)


def test_recrawl_schedule_is_projection_only(spark):
    from open_ocr_spark.dataops.delta import recrawl_schedule

    df = spark.createDataFrame(
        [("a", "changed", 48)],
        "url string, status string, prev_interval_h long",
    )
    out = recrawl_schedule(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan


def test_recrawl_schedule_clamps_corrupt_history(spark):
    from open_ocr_spark.dataops.delta import recrawl_schedule

    rows = [
        ("h", "changed", 2000),   # clamp prev to 720 -> halve -> 360
        ("i", "unchanged", 0),    # clamp prev to 6 -> double -> 12
        ("j", "unchanged", -5),   # clamp prev to 6 -> double -> 12
    ]
    df = spark.createDataFrame(
        rows, "url string, status string, prev_interval_h long"
    )
    got = {r["url"]: (r["next_interval_h"], r["priority"])
           for r in recrawl_schedule(df).collect()}
    assert got["h"] == (360, 2)
    assert got["i"] == (12, 60)
    assert got["j"] == (12, 60)
    # no live row can collide with the tombstone rank 0
    assert all(p > 0 for _, p in got.values())
