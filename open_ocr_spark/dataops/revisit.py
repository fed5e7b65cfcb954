"""WARC ``revisit`` records (ISO 28500 §6.7.2, identical-payload-digest
profile): the crawl-storage dedup layer.  A recrawl whose payload digest
matches an earlier capture is not stored again — it becomes a ``revisit``
record with an empty body pointing back at the original capture
(WARC-Refers-To-Target-URI / WARC-Refers-To-Date), which is how Common
Crawl and Heritrix keep archives from growing with every refetch.  The
reference engine stores one payload per request (its HTTP handlers keep
no history, /root/reference/ocr_http_handler.go:50-74); at crawl scale
the SAME corpus arrives as capture history, and the engine that reads
WARC must also write its dedup layout.

Scale shape: classification is ONE window over the payload digest — an
md5 key, so the shuffle is uniform no matter how skewed urls or hosts
are; record assembly and file packing reuse the WET writer's pure-
Catalyst record grammar and md5-bucketed segment aggregation (wet.py).
No Python anywhere on the write path; storage shrinks by exactly the
duplicate payload bytes (revisit bodies are empty).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from open_ocr_spark.dataops.wet import _files, _record

# Profile URI the spec assigns to digest-based dedup (ISO 28500-2017
# Annex; also what Heritrix and warcprox emit).
REVISIT_PROFILE = (
    "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
)


def _digest(payload: Column) -> Column:
    """Spec-shaped labelled digest over the capture payload bytes.  The
    label is part of the header value (``md5:<hex>``) so readers know the
    algorithm; md5 keeps the DuckDB oracle exact (both engines agree on
    md5 over the same bytes)."""
    return F.concat(F.lit("md5:"), F.md5(payload))


def classify_captures(
    captures: DataFrame,
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
) -> DataFrame:
    """Tag every capture as the stored original or a revisit.

    Input: one row per capture (url, warc_date, payload binary).  Output
    adds ``warc_type`` ('response' for the first capture of each distinct
    payload, 'revisit' after), ``payload_digest``, and for revisits the
    original's coordinates ``refers_to_uri`` / ``refers_to_date`` (NULL on
    originals).  "First" is (warc_date, url) order within a digest — the
    earliest capture wins, url as the tiebreak for simultaneous captures.

    One hash exchange on the digest (uniform md5 key — a million
    identical spam pages land in ONE group but spread over no others),
    then a single window pass computes rank and the group head without a
    join-back.
    """
    digest = _digest(F.col(payload_col))
    w = Window.partitionBy("payload_digest").orderBy(date_col, url_col)
    first = (
        F.row_number().over(w) == 1
    )
    return (
        captures.withColumn("payload_digest", digest)
        .withColumn(
            "warc_type", F.when(first, F.lit("response")).otherwise("revisit")
        )
        .withColumn(
            "refers_to_uri",
            F.when(first, F.lit(None).cast("string")).otherwise(
                F.first(url_col).over(w)
            ),
        )
        .withColumn(
            "refers_to_date",
            F.when(first, F.lit(None).cast("string")).otherwise(
                F.first(date_col).over(w)
            ),
        )
    )


def revisit_warc_files(
    captures: DataFrame,
    num_buckets: int = 16,
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
) -> DataFrame:
    """(file_id, warc binary): the deduplicated capture archive — every
    original becomes a full ``response`` record, every duplicate a
    body-less ``revisit`` record carrying the profile URI and the
    refers-to headers.  Reparses byte-exactly through
    ``sources.records_from_warc`` (which surfaces payload_digest and
    refers_to_uri)."""
    tagged = classify_captures(captures, url_col, date_col, payload_col)
    is_rev = F.col("warc_type") == "revisit"
    extra = F.concat(
        F.lit("WARC-Payload-Digest: "), F.col("payload_digest"),
        F.lit("\r\n"),
        F.when(
            is_rev,
            F.concat(
                F.lit(f"WARC-Profile: {REVISIT_PROFILE}\r\n"),
                F.lit("WARC-Refers-To-Target-URI: "),
                F.col("refers_to_uri"),
                F.lit("\r\nWARC-Refers-To-Date: "),
                F.col("refers_to_date"),
                F.lit("\r\n"),
            ),
        ).otherwise(F.lit("")),
    )
    # Captures here are text pages (the engine's ingest schema), so the
    # payload decodes as UTF-8 and survives _files's final utf-8 encode
    # byte-exactly; arbitrary binary payloads would need a bytes-native
    # writer (build_warc covers that path on the driver side).
    body = F.when(is_rev, F.lit("")).otherwise(
        F.decode(F.col(payload_col), "UTF-8")
    )
    recs = tagged.select(
        F.col(url_col).alias("uri"),
        _record(
            F.col("warc_type"), F.col(url_col), F.col(date_col),
            "application/http; msgtype=response", body, extra,
        ).alias("rec"),
    )
    return _files(recs, num_buckets, "warc")
