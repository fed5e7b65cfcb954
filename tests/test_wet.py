"""WET / WAT export layouts (dataops/wet.py): segment files must be
spec-shaped WARC (parse back through sources.parse_warc_bytes — the
reader is the writer's independent twin), deterministic at any
parallelism, and carry the engine's own extraction/metadata values."""

import json

import pytest
from pyspark.sql import functions as F

from open_ocr_spark.dataops.wet import (
    WET_DATE,
    _WARCINFO_BODY,
    wat_files,
    wat_json,
    wet_files,
)
from open_ocr_spark.sources import parse_warc_bytes


def _wet_records(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, extracted_text string")
    files = {r["file_id"]: bytes(r["wet"])
             for r in wet_files(df, **kw).collect()}
    return {fid: parse_warc_bytes(blob) for fid, blob in files.items()}


def test_wet_roundtrip_structure(spark):
    rows = [(f"https://ex.com/{i}", f"text {i}") for i in range(20)]
    parsed = _wet_records(spark, rows, num_buckets=4)
    seen = {}
    for fid, recs in parsed.items():
        assert all(r["error"] is None for r in recs)
        # warcinfo leads every file
        assert recs[0]["warc_type"] == "warcinfo"
        assert recs[0]["content_type"] == "application/warc-fields"
        assert recs[0]["payload"].decode() == _WARCINFO_BODY
        for r in recs[1:]:
            assert r["warc_type"] == "conversion"
            assert r["content_type"] == "text/plain"
            assert r["warc_date"] == WET_DATE
            seen[r["target_uri"]] = r["payload"].decode()
        # in-file order is the uri sort: deterministic bytes
        uris = [r["target_uri"] for r in recs[1:]]
        assert uris == sorted(uris)
    assert seen == dict(rows)


def test_wet_content_length_counts_bytes_not_chars(spark):
    # multibyte text: a char-counted Content-Length would desync the
    # parser and corrupt every later record in the file
    rows = [("https://ex.com/a", "café — 🚀"), ("https://ex.com/b", "näïve")]
    parsed = _wet_records(spark, rows, num_buckets=1)
    (recs,) = parsed.values()
    assert [r["payload"].decode() for r in recs[1:]] in (
        [rows[0][1], rows[1][1]], [rows[1][1], rows[0][1]],
    )


def test_wet_null_text_becomes_empty_record(spark):
    df = spark.createDataFrame(
        [("https://ex.com/n", None)], "url string, extracted_text string"
    )
    (row,) = wet_files(df, num_buckets=1).collect()
    recs = parse_warc_bytes(bytes(row["wet"]))
    assert recs[1]["payload"] == b"" and recs[1]["error"] is None


def test_wet_bucketing_is_md5_deterministic(spark):
    rows = [(f"https://ex.com/{i}", "t") for i in range(50)]
    df = spark.createDataFrame(rows, "url string, extracted_text string")
    a = {r["file_id"]: bytes(r["wet"])
         for r in wet_files(df, num_buckets=8).collect()}
    b = {r["file_id"]: bytes(r["wet"])
         for r in wet_files(df.repartition(7), num_buckets=8).collect()}
    assert a == b  # byte-identical segments at any parallelism


def test_wat_json_envelope_shape(spark):
    pages = spark.createDataFrame(
        [
            ("https://ex.com/1",
             '<title>T1</title><a href="https://out.com/z">z</a>'
             "<a href='https://out.com/a'>a</a>"),
            ("https://ex.com/2", "<p>no title no links</p>"),
        ],
        "url string, html string",
    )
    got = {r["url"]: json.loads(r["wat"]) for r in wat_json(pages).collect()}
    env1 = got["https://ex.com/1"]["Envelope"]
    assert env1["WARC-Header-Metadata"]["WARC-Target-URI"] == "https://ex.com/1"
    hm = env1["Payload-Metadata"]["HTML-Metadata"]
    assert hm["Head"]["Title"] == "T1"
    # links are sorted, so envelope bytes are parallelism-invariant
    assert [l["url"] for l in hm["Links"]] == [
        "https://out.com/a", "https://out.com/z",
    ]
    hm2 = got["https://ex.com/2"]["Envelope"]["Payload-Metadata"]["HTML-Metadata"]
    assert hm2["Head"].get("Title") is None
    assert hm2["Links"] == []  # empty array, not null, per the CC shape


def test_wat_files_parse_back(spark):
    pages = spark.createDataFrame(
        [(f"https://ex.com/{i}",
          f'<title>D{i}</title><a href="https://o.com/{i}">x</a>')
         for i in range(12)],
        "url string, html string",
    )
    out = wat_files(pages, num_buckets=3).collect()
    n_meta = 0
    for row in out:
        recs = parse_warc_bytes(bytes(row["wat"]))
        assert recs[0]["warc_type"] == "warcinfo"
        for r in recs[1:]:
            assert r["warc_type"] == "metadata"
            assert r["content_type"] == "application/json"
            env = json.loads(r["payload"].decode())
            uri = env["Envelope"]["WARC-Header-Metadata"]["WARC-Target-URI"]
            assert uri == r["target_uri"]
            n_meta += 1
    assert n_meta == 12


def test_wet_binary_html_column_passthrough(spark):
    # wat over a BINARY html column (the pages-table shape)
    pages = spark.createDataFrame(
        [("https://ex.com/1", bytearray(b"<title>B</title>"))],
        "url string, html binary",
    )
    (r,) = wat_json(pages).collect()
    env = json.loads(r["wat"])
    hm = env["Envelope"]["Payload-Metadata"]["HTML-Metadata"]
    assert hm["Head"]["Title"] == "B"


@pytest.mark.parametrize("quota,round_ms,expect", [
    # delay 2000ms, 10s round -> 5 fit, quota 3 binds
    (3, 10_000, [("u1", 1, 0), ("u2", 2, 2000), ("u3", 3, 4000)]),
    # delay 2000ms, 5s round -> 2 fit, budget binds below quota
    (4, 5_000, [("u1", 1, 0), ("u2", 2, 2000)]),
    # delay 2000ms, 1s round -> floor says 0, but at least 1 is fetched
    (4, 1_000, [("u1", 1, 0)]),
])
def test_frontier_polite_budget(spark, quota, round_ms, expect):
    from open_ocr_spark.dataops.frontier import frontier_polite
    from open_ocr_spark.dataops.robots import parse_robots, parse_robots_meta

    candidates = spark.createDataFrame(
        [(f"https://s{s}.com/", f"https://h.com/u{u}")
         for u in (1, 2, 3, 4) for s in range(5 - u)],
        "src_url string, dst_url string",
    )
    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nCrawl-delay: 2\n")],
        "host string, robots_txt string",
    )
    seen = spark.createDataFrame([("https://h.com/u4",)], "url string")
    got = frontier_polite(
        candidates, parse_robots(robots), parse_robots_meta(robots), seen,
        per_host_quota=quota, round_ms=round_ms,
    ).orderBy("fetch_order").collect()
    assert [
        (r["url"].rsplit("/", 1)[1], r["fetch_order"], r["fetch_at_ms"])
        for r in got
    ] == expect
    assert all(r["delay_ms"] == 2000 for r in got)


def test_frontier_polite_default_delay_for_silent_host(spark):
    from open_ocr_spark.dataops.frontier import frontier_polite
    from open_ocr_spark.dataops.robots import parse_robots, parse_robots_meta

    candidates = spark.createDataFrame(
        [("https://s.com/", "https://quiet.com/a"),
         ("https://t.com/", "https://quiet.com/a")],
        "src_url string, dst_url string",
    )
    robots = spark.createDataFrame(
        [("quiet.com", "User-agent: *\nDisallow: /x\n")],  # no Crawl-delay
        "host string, robots_txt string",
    )
    seen = spark.createDataFrame([], "url string")
    (r,) = frontier_polite(
        candidates, parse_robots(robots), parse_robots_meta(robots), seen,
        default_delay_ms=750,
    ).collect()
    assert (r["delay_ms"], r["fetch_at_ms"], r["in_degree"]) == (750, 0, 2)
