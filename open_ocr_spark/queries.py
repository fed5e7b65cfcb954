"""Driver-contract query registry: every implemented operator from
SURVEY.md §2 as a (spark, sf_dir) -> DataFrame callable, with a matching
ANSI-SQL oracle DuckDB runs on the same parquet tables.

Contract rules (driver): column names must match between the Spark result
and the oracle (aliases everywhere); floats are rounded 4dp on BOTH sides
so value hashes agree across engines; orderings are made deterministic
with explicit tiebreaks before any LIMIT.

Queries marked ORACLE_NONE are genuinely non-SQL-expressible (kernel or
hash-seeded ops) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_ocr_spark.dataops.dedup import (
    _MH_PRIME,
    _PERMS,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from open_ocr_spark.dataops.similarity import cosine_topk, lsh_bucketed_topk
from open_ocr_spark.dataops.textstats import (
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_token_count,
)
from open_ocr_spark.pipeline.stages import extract_stage


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Extraction queries (the engine's own operators, §2.A) — pages are
# synthesized deterministically from `documents` JVM-side: the wrap is pure
# concat/encode (no Python), the unwrap is the real extraction kernel.
# ---------------------------------------------------------------------------

_WRAP_PREFIX = (
    '<html><head><title>doc</title><script>q()</script></head><body>'
    '<nav><ul><li><a href="/">Home</a></li><li><a href="/a">A</a></li>'
    '<li><a href="/b">B</a></li></ul></nav><article><p>'
)
_WRAP_SUFFIX = (
    '</p></article><footer><a href="/x">x</a> <a href="/y">y</a>'
    "<p>(c) footer</p></footer></body></html>"
)


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl-shaped pages table derived from the driver's documents
    table: url from doc_id, html by wrapping text in boilerplate — all
    Catalyst expressions (concat/encode), zero Python."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.lit("https://docs.example.com/doc/"), F.col("doc_id")).alias(
            "url"
        ),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit(_WRAP_PREFIX),
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(_WRAP_SUFFIX),
            ),
            "utf-8",
        ).alias("html"),
        F.col("text"),
        F.lit("eng").alias("lang"),
        F.col("doc_id"),
    )


def q_extract_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: wrap every document in nav/footer boilerplate, run the real
    extraction kernel, emit the recovered main text. The oracle is the
    normalization identity: extraction must strip ALL boilerplate and return
    exactly the whitespace-collapsed original text."""
    pages = pages_from_documents(spark, sf_dir)
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_extract_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = pages_from_documents(spark, sf_dir)
    return (
        extract_stage(pages)
        .groupBy("status")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.length("extracted_text")).alias("total_chars"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Relational operator surface (§2.B) over the TPC-H-ish tables
# ---------------------------------------------------------------------------


def q_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + predicate + projection: pushdown-eligible filter."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "net_price"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation: partial+final hash agg, map-side
    combine automatic."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_join_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + agg + top-k: customer is the broadcast side (small dim);
    deterministic tiebreak before the limit."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


def q_join_region_nation_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop broadcast join chain over the dimension tables."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("region_name")
    )


def q_window_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedupe window (latest-per-key): row_number over (ts desc,
    event_id desc) — the same operator the extraction pipeline uses for
    latest-crawl-per-url."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 4).alias("value"))
        .orderBy("user_id")
    )


def q_window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered analytic window: per-customer running order total."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


def q_anti_join_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join — THE resume operator (SURVEY §2.B): documents with
    no embedding row, i.e. work not yet done."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id, "left_anti")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def q_semi_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers that have at least one event identity
    (user_id key space)."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.join(ev, cust.c_custkey == ev.user_id, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def q_rollup_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface: rollup (source, lang) with counts."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.rollup("source", "lang")
        .agg(F.count("*").alias("docs"), F.sum("n_chars").alias("chars"))
        .orderBy(
            F.col("source").asc_nulls_first(), F.col("lang").asc_nulls_first()
        )
    )


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: exact distinct users and event types."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.count("*").alias("n_events"),
    )


def q_daily_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time bucketing: tumbling 1-day windows via date_trunc (the batch
    analog of a streaming tumbling window), value stats per day+type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("day", "event_type")
    )


def q_set_except_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: sources present in documents but absent from the
    high-quality slice (n_chars >= 200) — EXCEPT semantics."""
    docs = _t(spark, sf_dir, "documents")
    all_sources = docs.select("source").distinct()
    hq_sources = docs.filter(F.col("n_chars") >= 200).select("source").distinct()
    return all_sources.exceptAll(hq_sources).orderBy("source")


def q_union_lang_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two disjoint slices re-aggregated — the manifest
    combination pattern."""
    docs = _t(spark, sf_dir, "documents")
    small = docs.filter(F.col("n_chars") < 200)
    large = docs.filter(F.col("n_chars") >= 200)
    tagged = small.withColumn("bucket", F.lit("small")).unionByName(
        large.withColumn("bucket", F.lit("large"))
    )
    return (
        tagged.groupBy("lang", "bucket")
        .agg(F.count("*").alias("docs"))
        .orderBy("lang", "bucket")
    )


def q_fact_fact_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big equi-join (lineitem ⋈ orders on orderkey): too large to
    broadcast → shuffle hash/sort-merge join, Catalyst's choice, AQE-tuned.
    Revenue by order status."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("o_orderstatus")
    )


def q_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join (customer ⋈ orders ⋈ lineitem) with
    selective filters on both sides and top-k by revenue."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cutoff = "1995-03-15"
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_salted_host_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe salting pattern PROVEN equivalent: two-phase agg by
    (host, salt-of-key) then host must give exactly the plain GROUP BY
    answer (the oracle is the plain form)."""
    docs = _t(spark, sf_dir, "documents")
    with_url = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id"),
        ).alias("url"),
        "n_chars",
    )
    partial = (
        with_url.withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))
        .withColumn("_salt", F.pmod(F.xxhash64("url"), F.lit(16)))
        .groupBy("host", "_salt")
        .agg(F.count("*").alias("_docs"), F.sum("n_chars").alias("_chars"))
    )
    return (
        partial.groupBy("host")
        .agg(F.sum("_docs").alias("docs"), F.sum("_chars").alias("chars"))
        .orderBy("host")
    )


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE_NONE: HLL sketch (approx_count_distinct) — engine-specific
    estimates; sanity-gated by the rows-only check and compared to exact
    in tests."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap): lag + windowed cumsum +
    agg — the batch twin of the stateful streaming operator."""
    from open_ocr_spark.dataops.sessions import sessionize_events

    return sessionize_events(_t(spark, sf_dir, "events"))


def q_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window sessionization (streaming.session_window_stats
    run in batch mode — the same merging-window grouping Structured
    Streaming uses with watermark-evicted state). Epoch projection so the
    oracle hash is timestamp-render independent. Boundary rule (probed
    live): session_window merges an event landing exactly on the previous
    window's close — a new session starts only when the gap EXCEEDS the
    gap duration, the same > rule as the lag-cumsum sessionizer, and the
    oracle encodes it identically."""
    from open_ocr_spark.streaming import session_window_stats

    s = session_window_stats(_t(spark, sf_dir, "events"), gap_seconds=1800)
    return s.select(
        "user_id",
        F.unix_timestamp(F.col("session_start").cast("timestamp"))
        .cast("long")
        .alias("start_epoch"),
        F.unix_timestamp(F.col("session_end").cast("timestamp"))
        .cast("long")
        .alias("close_epoch"),
        "n_events",
        "sum_value",
    ).orderBy("user_id", "start_epoch")


def q_cube_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full grouping-sets surface: cube over (source, lang)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.cube("source", "lang")
        .agg(F.count("*").alias("docs"))
        .orderBy(
            F.col("source").asc_nulls_first(), F.col("lang").asc_nulls_first()
        )
    )


def q_intersect_user_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: user ids that are both event actors and customer keys."""
    ev = _t(spark, sf_dir, "events").select(F.col("user_id").alias("id"))
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("id"))
    return ev.intersect(cust).orderBy("id")


def q_window_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: seconds since the user's previous event."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.when(
            prev_ts.isNotNull(),
            (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).cast("long"),
        ).alias("gap_seconds"),
    ).orderBy("user_id", "event_id")


def q_host_doc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface: synthesize per-source urls, extract the
    host JVM-side with parse_url (the host-salting key, SURVEY §2.C), and
    aggregate. Oracle reconstructs the host without parse_url."""
    docs = _t(spark, sf_dir, "documents")
    with_url = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id"),
        ).alias("url"),
        "n_chars",
    )
    return (
        with_url.groupBy(F.parse_url(F.col("url"), F.lit("HOST")).alias("host"))
        .agg(F.count("*").alias("docs"), F.sum("n_chars").alias("chars"))
        .orderBy("host")
    )


def q_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 source parity: the inline-base64 ingest path
    (unbase64 = the reference's decodeBase64, ocr_request.go:33-45) must
    round-trip every document byte-exactly."""
    # Sort-early pattern (used by every projection-style query below): put
    # the orderBy on the SCAN and project after. A sort on top of a heavy
    # projection executes the projection twice — the range-partitioner's
    # sampling pass re-runs the sort's child — measured 6× slower on the
    # quality query. Projection preserves sort order, so results are
    # identical.
    docs = _t(spark, sf_dir, "documents").orderBy("doc_id")
    roundtrip = F.decode(
        F.unbase64(F.base64(F.encode(F.col("text"), "utf-8"))), "utf-8"
    )
    return docs.select(
        "doc_id",
        roundtrip.alias("roundtrip_text"),
        (roundtrip == F.col("text")).alias("matches"),
    )


# ---------------------------------------------------------------------------
# Training-data ops (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------


def q_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup_groups(docs).orderBy("content_hash")


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, k=3, threshold=0.8).orderBy("doc_a", "doc_b")


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution end-to-end: exact-jaccard near-dup
    pairs → connected components (iterative min-label propagation,
    dataops/clusters.py) → one canonical cluster id per document
    (singletons keep their own id). Oracle: DuckDB recursive CTE computing
    the same transitive closure over the same pair set."""
    from open_ocr_spark.dataops.clusters import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.8)
    return dedup_clusters(docs, pairs).orderBy("doc_id")


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE_NONE candidate generation (xxhash64 seeds are Spark-specific);
    the verification step IS SQL-checkable via q_ngram_jaccard_pairs.
    No orderBy: rows-only check, and a global sort on a pair table whose
    size is quadratic in duplicate-cluster size is pure waste."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, k=3, threshold=0.8)


def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE_NONE (xxhash64-derived bits); rows-only check, no sort."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_fingerprints(docs)


def q_minhash_lsh_pairs_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL MinHash+LSH pipeline — exact-collapse, 32-perm signatures,
    8-band bucketing, candidate generation, exact-Jaccard verification,
    pair expansion — on the md5-derived 31-bit base hash, which DuckDB can
    reproduce.  The oracle rebuilds every stage (shingles, signature
    minima, band-slice equality for candidacy — including LSH's false
    NEGATIVES — and the verify threshold), so a green row hash-checks the
    whole algorithm end to end, not just the verify step.  The xxhash64
    production default (q_minhash_lsh_pairs) is plan-identical; only the
    leaf hash expression differs."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, k=3, threshold=0.8, hashing="md5").orderBy(
        "doc_a", "doc_b"
    )


def q_simhash_fingerprints_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """62-bit SimHash on md5-derived per-token hashes (two 31-bit halves):
    the oracle recomputes every per-bit majority vote and the bit
    reassembly in DuckDB.  Same plan as the xxhash64 production form
    (explode → codegen'd 62-sum hash aggregate), one fewer usable bit
    pair so the fingerprint stays signed-int64-safe in any engine."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_fingerprints(docs, hashing="md5").orderBy("doc_id")


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").orderBy("doc_id")  # sort-early
    return with_token_count(docs).select("doc_id", "n_tokens")


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").orderBy("doc_id")  # sort-early
    return with_quality_score(docs).select(
        "doc_id", "n_tokens", "avg_token_len", "alpha_ratio", "quality_score"
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style within-document repetition filters: duplicate-bigram
    fraction (array exprs, codegen) + most-common-token share (explode +
    two uniform hash aggs). Oracle mirrors both in DuckDB list/agg SQL."""
    from open_ocr_spark.dataops.textstats import repetition_stats

    docs = _t(spark, sf_dir, "documents")
    return repetition_stats(docs).orderBy("doc_id")


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish-regex token counts side by side (the brief's
    token-counting pair): ws count from split, BPE-ish count from a
    lookahead-free GPT-2-style pre-tokenizer pattern that Java regex and
    RE2 execute identically."""
    from open_ocr_spark.dataops.textstats import with_bpe_token_count

    docs = _t(spark, sf_dir, "documents").orderBy("doc_id")  # sort-early
    return with_bpe_token_count(with_token_count(docs)).select(
        "doc_id", "n_tokens", "n_bpe_tokens"
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style PII redaction, oracle-checked end-to-end: a deterministic
    email + phone number is injected into every document (pure Catalyst
    concat — the base corpus contains no PII patterns), scrubbed with
    dialect-portable regexes, and the oracle states the EXPECTED redacted
    string directly (no regex on the oracle side — the check fails if the
    scrub misses or over-matches)."""
    from open_ocr_spark.dataops.textstats import scrub_pii

    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.org or call +1-555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        ).alias("text"),
    )
    return scrub_pii(injected).select("doc_id", "scrubbed").orderBy("doc_id")


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").orderBy("doc_id")  # sort-early
    return with_fingerprint(docs).select("doc_id", "fingerprint")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE_NONE: pandas-UDF kernel (heuristic language ID). Rows-only
    check, no sort — a sort above the UDF would run the kernel twice
    (range-sampling pass)."""
    docs = _t(spark, sf_dir, "documents")
    return with_lang_id(docs).select("doc_id", "lang", "lang_pred")


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, query_vec_id=0, k=10)


def q_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN. Approximate vs exact top-k, but fully
    deterministic: the hyperplanes are fixed LCG ±1 patterns, so the
    oracle replays bucket assignment and the bucket-restricted top-k
    exactly (generated from the same _hyperplane constants)."""
    emb = _t(spark, sf_dir, "embeddings")
    return lsh_bucketed_topk(emb, query_vec_id=0, k=10)


def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN — label-seeded centroids + one Lloyd refinement,
    nprobe-cell search. Approximate vs exact top-k but deterministic end
    to end, so the oracle replays the whole index build (seed means,
    argmax assignment, refined means, reassignment) and the probed-cell
    search in SQL."""
    from open_ocr_spark.dataops.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, query_vec_id=0, k=10, nprobe=2)


def _near_dup_embedding_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ slightly-perturbed copies of every 10th vector (first
    component +0.05, float32-rounded — replicable in SQL), so the corpus
    contains KNOWN near-dup pairs at cos ≈ 0.999 while the synthetic base
    vectors stay mutually far (max pairwise cos 0.51)."""
    emb = _t(spark, sf_dir, "embeddings")
    pert = emb.filter((F.col("vec_id") % 10) == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(
                (F.col("embedding")[0].cast("double") + F.lit(0.05)).cast(
                    "float"
                )
            ),
            F.expr("slice(embedding, 2, size(embedding) - 1)"),
        ).alias("embedding"),
        "label",
    )
    return emb.unionByName(pert)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, EXACT all-pairs form — the
    correctness baseline the LSH variant is checked against (the brief's
    'embedding-cosine near-dup' dedup tier). Oracle: the same all-pairs
    cosine in DuckDB list arithmetic over the same perturbed corpus."""
    from open_ocr_spark.dataops.similarity import embedding_cosine_pairs

    corpus = _near_dup_embedding_corpus(spark, sf_dir)
    return embedding_cosine_pairs(corpus, threshold=0.99).orderBy(
        "vec_a", "vec_b"
    )


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: multi-band hyperplane-LSH candidates + exact
    verification (no all-pairs node). Deterministic plane constants make
    the candidate generation — including LSH's false negatives — SQL
    replayable, so the oracle checks the full banded pipeline; recall
    vs exact is additionally pytest-checked."""
    from open_ocr_spark.dataops.similarity import embedding_near_dup_pairs

    corpus = _near_dup_embedding_corpus(spark, sf_dir)
    return embedding_near_dup_pairs(corpus, threshold=0.99)


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact k-means (Lloyd's, label-seeded, 2 updates) over the
    embeddings table — the semantic-clustering tier (dataops/kmeans.py).
    The oracle unrolls every iteration as a CTE (the host_pagerank
    pattern), so quantization, seeding, integer means, and argmin
    tie-breaks are all hash-checked; any drift flips an assignment."""
    from open_ocr_spark.dataops.kmeans import kmeans_assignments

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_assignments(emb, iters=2).orderBy("vec_id")


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cosine near-dup pruning restricted
    to within k-means cells, min-id representative kept — over the same
    perturbed corpus the embedding_near_dup family uses, so the known
    near-dup pairs exist to be dropped. Full SQL replay: k-means loop +
    in-cell pair join + keep rule."""
    from open_ocr_spark.dataops.kmeans import semantic_dedup

    corpus = _near_dup_embedding_corpus(spark, sf_dir)
    return semantic_dedup(corpus, threshold=0.99, iters=2).orderBy("vec_id")


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon character-entropy quality signal (information density):
    spam/template text sits far below prose's ~4.1 bits/char. Pure
    Catalyst, two uniform-key shuffles (dataops/textstats.py)."""
    from open_ocr_spark.dataops.textstats import char_entropy

    docs = _t(spark, sf_dir, "documents")
    return char_entropy(docs).orderBy("doc_id")


def q_prepare_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-corpus prep composition (dedup → quality gate →
    PII scrub → split) as one plan; the oracle reproduces the whole chain
    in SQL, so stage-ordering bugs fail the value hash."""
    from open_ocr_spark.dataops.corpus import prepare_corpus

    docs = _t(spark, sf_dir, "documents")
    return prepare_corpus(docs).select(
        "doc_id", "split", "n_tokens", "quality_score"
    ).orderBy("doc_id")


_BOILER_HEAD = "Accept cookies to continue"
_BOILER_FOOT = "All rights reserved. Powered by ExampleCMS."


def q_line_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup (CCNet/RefinedWeb-style boilerplate removal): give
    every document a deterministic line structure (10-word chunks) plus a
    shared cookie-banner header and rights footer, then strip every line
    that occurs in >= 2 distinct documents.  The oracle reproduces the
    chunking with unnest(range)/list-slice and the dedup with a
    count-distinct + anti-flag join, so both the frequency threshold and
    the order-preserving reassembly are value-hashed."""
    from open_ocr_spark.dataops.lines import chunk_words_to_lines, dedup_lines

    docs = _t(spark, sf_dir, "documents")
    with_lines = docs.select(
        "doc_id",
        F.concat(
            F.lit(_BOILER_HEAD),
            F.lit("\n"),
            F.array_join(chunk_words_to_lines(F.col("text"), 10), "\n"),
            F.lit("\n"),
            F.lit(_BOILER_FOOT),
        ).alias("text"),
    )
    return dedup_lines(with_lines, min_docs=2).orderBy("doc_id")


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-SPAN removal (dataops/substring.py, the
    windowed form of Lee et al. 2022 suffix-array dedup): every 8-token
    window occurring more than once in the corpus keeps its first
    (doc_id, pos) occurrence and is blanked everywhere else — the tier
    between line-dedup (needs identical lines) and doc-dedup (needs
    near-identical documents).  The corpus' own repeated passages drive
    it (the synthetic documents share sentences across docs).  The
    oracle rebuilds windows with list slices, ranks occurrences with a
    window function, and re-assembles survivors with an ordered
    string_agg — keeper choice, span overlap-union and token-exact
    blanking are all value-hashed (clean text compared as md5)."""
    from open_ocr_spark.dataops.substring import dedup_substrings

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = dedup_substrings(docs, window=8)
    return out.select(
        "doc_id",
        F.md5(F.col("clean_text")).alias("clean_md5"),
        "n_tokens",
        "n_removed",
    ).orderBy("doc_id")


def q_host_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl cap (dataops/mixing.py::quota_sample): a skewed
    70/20/10 host mixture is capped at 30 docs per host by keeping the
    30 smallest (md5_32(doc_id), doc_id) keys within each host — a pure
    function of the ids, so the oracle reproduces the EXACT kept set
    with the same md5 expression and a window rank.  The plan's scale
    property (WindowGroupLimit map-side prune on the skewed host key) is
    pinned separately in the plan-shape tier."""
    from open_ocr_spark.dataops.mixing import quota_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 7, F.lit("big.example.com"))
        .when(F.col("doc_id") % 10 < 9, F.lit("mid.example.com"))
        .otherwise(F.lit("small.example.com"))
        .alias("host"),
    )
    return quota_sample(docs, group_col="host", quota=30).orderBy("doc_id")


def q_html_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-metadata extraction (dataops/htmlmeta.py) through the driver
    gate: four synthetic page shapes cycle the real-world variation —
    name-before-content vs content-before-name meta ordering, a missing
    description (NULL path), uppercase TITLE tags, single-quoted
    attributes — and the oracle runs the SAME regexes in DuckDB (both
    engines' regex dialects share the used subset), with ''-vs-NULL
    normalized identically on both sides."""
    from open_ocr_spark.dataops.htmlmeta import extract_html_meta

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id").cast("string")
    v = F.col("doc_id") % 4
    desc = F.concat(F.lit("desc "), ((F.col("doc_id") * 7) % 100).cast("string"))
    canon = F.concat(
        F.lit("https://h"), (F.col("doc_id") % 20).cast("string"),
        F.lit(".example.com/p/"), i,
    )
    html = F.concat(
        F.when(v == 3, F.concat(F.lit("<TITLE>Doc "), i, F.lit(" </TITLE>")))
        .otherwise(F.concat(F.lit("<title>Doc "), i, F.lit("</title>"))),
        F.when(v == 0, F.concat(
            F.lit('<meta name="description" content="'), desc, F.lit('">')))
        .when(v == 1, F.concat(
            F.lit('<meta content="'), desc,
            F.lit('" name="description">')))
        .when(v == 3, F.concat(
            F.lit("<meta name='description' content='"), desc, F.lit("'>")))
        .otherwise(F.lit("")),
        F.when(v == 3, F.concat(
            F.lit("<link rel='canonical' href='"), canon, F.lit("'>")))
        .otherwise(F.concat(
            F.lit('<link rel="canonical" href="'), canon, F.lit('">'))),
        F.when(v != 3, F.concat(
            F.lit('<meta property="og:title" content="OG '), i,
            F.lit('">'))).otherwise(F.lit("")),
        F.lit("<body>x</body>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://p/"), i).alias("url"), html.alias("html")
    )
    return (
        extract_html_meta(pages)
        .withColumn(
            "doc_id",
            F.regexp_extract("url", r"https://p/(\d+)", 1).cast("long"),
        )
        .select("doc_id", "title", "meta_description", "canonical_url",
                "og_title")
        .orderBy("doc_id")
    )


def q_crawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synthetic crawl snapshots over the documents table — old
    omits doc_id%5==4 (those become 'added'), new omits doc_id%5==3
    ('removed'), and doc_id%7==0 pages change content between crawls —
    classified by crawl_delta's full outer join on url + md5 digest
    equality.  The oracle re-derives the status in closed form from the
    same residues, so join laterality (added vs removed swapped) or a
    digest-comparison bug flips rows and breaks the hash."""
    from open_ocr_spark.dataops.delta import crawl_delta

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(F.lit("https://h"), (F.col("doc_id") % 20).cast("string"),
                   F.lit(".example.com/p/"), F.col("doc_id").cast("string"))
    old = docs.filter(F.col("doc_id") % 5 != 4).select(
        url.alias("url"),
        F.md5(F.concat(F.lit("v1-"), F.col("doc_id").cast("string")))
        .alias("content_md5"),
    )
    new = docs.filter(F.col("doc_id") % 5 != 3).select(
        url.alias("url"),
        F.md5(
            F.concat(
                F.when(F.col("doc_id") % 7 == 0, F.lit("v2-"))
                .otherwise(F.lit("v1-")),
                F.col("doc_id").cast("string"),
            )
        ).alias("content_md5"),
    )
    return crawl_delta(old, new).orderBy("url")


def q_ngram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filtering made engine-exact
    (dataops/fluency.py): train a bigram model on the doc_id%10==0
    reference split, score EVERY document as the integer mean of
    SCALE-scaled conditional probabilities of its adjacent token pairs
    (unseen pairs 0).  The oracle retrains the same model and rescoring
    in SQL — a conditioning-total bug (c1 over the wrong margin), a
    join-laterality slip or a float sneaking into the mean breaks the
    hash."""
    from open_ocr_spark.dataops.fluency import (
        fluency_scores,
        train_bigram_model,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.filter(F.col("doc_id") % 10 == 0)
    model = train_bigram_model(ref)
    return fluency_scores(docs, model).orderBy("doc_id")


def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots gating (dataops/robots.py) end to end: every host
    publishes a robots.txt whose '*' group disallows /p/{h} but allows
    the longer /p/{h}/pub, wildcard-disallows /tmp/*, and end-anchors
    /exact$ — behind a googlebot group (Disallow: /) that must NOT leak
    into the '*' evaluation, plus a comment line.  Six URL shapes per
    host cycle the verdicts: prefix disallow, longest-match allow
    override, '*' wildcard, '$' anchor hit, '$' anchor miss (/exactly),
    and no-rule default-allow.  The oracle states the six verdicts in
    closed form — a group-attribution, precedence (longest/Allow-tie),
    wildcard or anchor bug flips rows and breaks the hash."""
    from open_ocr_spark.dataops.robots import gate_urls, parse_robots

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    h = (F.col("doc_id") % 20).cast("string")
    robots = docs.select(h.alias("hid")).distinct().select(
        F.concat(F.lit("h"), F.col("hid"), F.lit(".example.com")).alias(
            "host"
        ),
        F.concat(
            F.lit(
                "# corpus robots\nUser-agent: googlebot\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /p/"
            ),
            F.col("hid"),
            F.lit("\nAllow: /p/"),
            F.col("hid"),
            F.lit("/pub\nDisallow: /tmp/*\nDisallow: /exact$\n"),
        ).alias("robots_txt"),
    )
    v = F.col("doc_id") % 6
    path = (
        F.when(v == 0, F.concat(F.lit("/p/"), h))
        .when(v == 1, F.concat(F.lit("/p/"), h, F.lit("/pub/x")))
        .when(v == 2, F.lit("/tmp/cache/1"))
        .when(v == 3, F.lit("/exact"))
        .when(v == 4, F.lit("/exactly"))
        .otherwise(F.lit("/other"))
    )
    urls = docs.select(
        F.concat(
            F.lit("https://h"), h, F.lit(".example.com"), path,
            F.lit("?q="), F.col("doc_id").cast("string"),
        ).alias("url")
    )
    return gate_urls(urls, parse_robots(robots, agent="*")).orderBy("url")


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/embedding chunking (dataops/chunking.py): every document fans
    out to overlapping 16-token windows at stride 12 (the last window is
    the first to reach the end — no degenerate duplicate tail).  The
    oracle recomputes the window count closed-form and re-slices every
    window — an off-by-one in the start grid, the ceil, or the tail
    clamp changes chunk_md5/n_tokens and breaks the hash."""
    from open_ocr_spark.dataops.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        chunk_documents(docs, chunk_tokens=16, stride=12)
        .select(
            "doc_id",
            "chunk_idx",
            F.md5(F.col("chunk_text")).alias("chunk_md5"),
            "n_tokens",
        )
        .orderBy("doc_id", "chunk_idx")
    )


def q_sitemap_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap URL discovery (dataops/sitemaps.py): even hosts publish a
    <urlset> (one entry with an &amp;-escaped query and a lastmod, one
    without lastmod, one loc-less entry that must be dropped), odd hosts
    publish a <sitemapindex> with two child pointers (lastmod on the
    first only).  The oracle states every discovered row in closed form
    — kind routing, entity decoding, lastmod pairing and the loc-less
    drop are all value-hashed."""
    from open_ocr_spark.dataops.sitemaps import parse_sitemaps

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    hid = F.col("hid")
    hosts = docs.select((F.col("doc_id") % 20).alias("hid")).distinct()
    base = F.concat(F.lit("https://h"), hid.cast("string"),
                    F.lit(".example.com"))
    lastmod = F.concat(F.lit("2026-0"), ((hid % 8) + 1).cast("string"),
                       F.lit("-15"))
    urlset = F.concat(
        F.lit('<?xml version="1.0"?><urlset xmlns="x">'
              "<url><loc> "), base,
        F.lit("/p/a?x=1&amp;y=2 </loc><lastmod>"), lastmod,
        F.lit("</lastmod></url><url><loc>"), base,
        F.lit("/p/b</loc></url><url><lastmod>2020-01-01</lastmod></url>"
              "</urlset>"),
    )
    index = F.concat(
        F.lit('<?xml version="1.0"?><sitemapindex xmlns="x">'
              "<sitemap><loc>"), base,
        F.lit("/sitemap-0.xml</loc><lastmod>"), lastmod,
        F.lit("</lastmod></sitemap><sitemap><loc>"), base,
        F.lit("/sitemap-1.xml</loc></sitemap></sitemapindex>"),
    )
    sm = hosts.select(
        F.concat(F.lit("h"), hid.cast("string"), F.lit(".example.com"))
        .alias("host"),
        F.when(hid % 2 == 0, urlset).otherwise(index).alias("xml"),
    )
    return parse_sitemaps(sm).orderBy("host", "loc")


def q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (dataops/normalize.py) against DuckDB's
    nfc_normalize as an independent implementation: four codepoint
    spellings cycle per doc — decomposed accent (must compose),
    precomposed (unchanged), combining ring on A (must compose), plain
    ASCII (unchanged) — and BOTH engines normalize the same constructed
    strings, so the value hash compares two real normalizers, not a
    replayed formula."""
    from open_ocr_spark.dataops.normalize import unicode_normalize

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    v = F.col("doc_id") % 4
    raw = (
        F.when(v == 0, F.concat(F.lit("café "),
                                F.col("doc_id").cast("string")))
        .when(v == 1, F.concat(F.lit("café "),
                               F.col("doc_id").cast("string")))
        .when(v == 2, F.concat(F.lit("Århus "),
                               F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("plain "), F.col("doc_id").cast("string")))
    )
    with_text = docs.select("doc_id", raw.alias("raw_text"))
    norm = unicode_normalize(F.col("raw_text"), "NFC")
    return with_text.select(
        "doc_id",
        norm.alias("norm_text"),
        (norm != F.col("raw_text")).alias("changed"),
        F.length(norm).cast("long").alias("norm_len"),
    ).orderBy("doc_id")


def q_feed_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom discovery (dataops/feeds.py): even hosts publish RSS
    (one item with an &amp;-escaped title + pubDate, one CDATA title
    without a date, one link-less drop), odd hosts Atom (a rel=self
    decoy that must lose to rel=alternate, plus a rel-less default).
    Closed-form oracle over the same residues — kind routing, the Atom
    rel preference, CDATA unwrap and entity decode are all
    value-hashed."""
    from open_ocr_spark.dataops.feeds import parse_feeds

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    hid = F.col("hid")
    hosts = docs.select((F.col("doc_id") % 20).alias("hid")).distinct()
    base = F.concat(F.lit("https://h"), hid.cast("string"),
                    F.lit(".example.com"))
    rss = F.concat(
        F.lit('<rss version="2.0"><channel><item><title>News '),
        hid.cast("string"),
        F.lit(" &amp; views</title><link> "), base,
        F.lit("/p/a </link><pubDate>Mon, 17 Aug 2026 0"),
        (hid % 10).cast("string"),
        F.lit(":00:00 GMT</pubDate></item><item>"
              "<title><![CDATA[Deep <dive>]]></title><link>"), base,
        F.lit("/p/b</link></item><item><title>dropped</title></item>"
              "</channel></rss>"),
    )
    atom = F.concat(
        F.lit("<feed xmlns=\"x\"><entry><title>Entry "),
        hid.cast("string"),
        F.lit('</title><link rel="self" href="'), base,
        F.lit('/meta"/><link rel="alternate" href="'), base,
        F.lit('/e/1"/><updated>2026-08-17T10:00:00Z</updated></entry>'
              '<entry><title>Plain</title><link href="'), base,
        F.lit('/e/2"/></entry></feed>'),
    )
    feeds = hosts.select(
        F.concat(base, F.lit("/feed")).alias("feed_url"),
        F.when(hid % 2 == 0, rss).otherwise(atom).alias("xml"),
    )
    return parse_feeds(feeds).orderBy("feed_url", "link")


def _messy_urls(docs: DataFrame) -> DataFrame:
    """Four crawl spellings of each logical page https://src{K}.example.com
    /page/{L}: explicit default :443 + tracking params + fragment;
    uppercase host + trailing slash; unsorted params + utm/ref noise —
    those three must collapse to ONE group — plus a NON-default :8080
    origin that must stay its own group (a different origin, not a
    spelling)."""
    lid = F.expr("doc_id DIV 4").cast("string")
    src = F.expr("(doc_id DIV 4) % 20").cast("string")
    variant = F.col("doc_id") % 4
    url = (
        F.when(
            variant == 0,
            F.concat(
                F.lit("https://www.src"), src, F.lit(".example.com:443/page/"),
                lid, F.lit("?utm_source=feed&b=2&a=1#frag"),
            ),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("HTTPS://SRC"), src, F.lit(".EXAMPLE.COM/page/"),
                lid, F.lit("/?a=1&b=2"),
            ),
        )
        .when(
            variant == 2,
            F.concat(
                F.lit("https://src"), src, F.lit(".example.com/page/"),
                lid, F.lit("?b=2&utm_campaign=x&a=1&ref=rss"),
            )
        )
        .otherwise(
            F.concat(
                F.lit("https://src"), src, F.lit(".example.com:8080/page/"),
                lid, F.lit("?a=1&b=2"),
            )
        )
    )
    return docs.select("doc_id", url.alias("url"))


def q_canonical_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + canonical-url dedup: three crawl spellings of
    every logical page must collapse to one canonical group, while a
    fourth spelling on a NON-default port stays its own group.  Exercises
    scheme/host case folding, default-port-only stripping (https:443
    dropped, :8080 kept), www. stripping, trailing-slash normalisation,
    tracking-param removal, and bytewise param sorting — the oracle
    re-derives the canonical form with regexes + list_filter/list_sort,
    no parse_url."""
    from open_ocr_spark.dataops.urls import dedup_by_canonical_url

    docs = _t(spark, sf_dir, "documents")
    return dedup_by_canonical_url(_messy_urls(docs)).orderBy("canonical_url")


def q_pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-based sequence packing (concat-then-chunk pretraining layout):
    whitespace token counts, md5-bucketed running sum, seq_id = start DIV
    budget.  Engine-independent by construction (md5 bucket + id order), so
    the oracle reproduces the exact assignment with a window sum."""
    from open_ocr_spark.dataops.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias(
            "n_tokens"
        ),
    )
    return pack_sequences(toks, budget=200, n_buckets=8).orderBy(
        "bucket", "seq_id"
    )


def q_pack_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved image-text packing (dataops/packing.py::
    pack_multimodal_sequences): each document carries doc_id%3 inline
    images at 64 placeholder tokens apiece next to its whitespace text
    tokens; the sequence assignment runs on the COMBINED cost and each
    packed row reports its per-modality split.  The oracle reproduces
    the whole layout (md5 bucket, composite running sum, modality sums)
    — an image-cost slip or a modality-accounting bug changes
    seq_id/text_tokens/image_token_cost and breaks the hash."""
    from open_ocr_spark.dataops.packing import pack_multimodal_sequences

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias(
            "n_text_tokens"
        ),
        (F.col("doc_id") % 3).alias("n_images"),
    )
    return pack_multimodal_sequences(
        toks, budget=512, image_tokens=64, n_buckets=8
    ).orderBy("bucket", "seq_id")


def _link_pages(docs: DataFrame) -> DataFrame:
    """Synthetic pages with a deterministic outlink structure: page for
    doc D lives on host h{D%20}, links twice to h{(7D+1)%20} (once
    double-quoted, once bare) and once single-quoted to h{(3D+2)%20},
    plus an ``<area href>`` imagemap region to h{(11D+5)%20} and a
    relative link that extraction must skip."""
    def host(expr):
        return F.concat(
            F.lit("https://h"), expr.cast("string"), F.lit(".example.com")
        )

    a1 = host((F.col("doc_id") * 7 + 1) % 20)
    a2 = host((F.col("doc_id") * 3 + 2) % 20)
    a3 = host((F.col("doc_id") * 11 + 5) % 20)
    url = F.concat(
        host(F.col("doc_id") % 20), F.lit("/p/"), F.col("doc_id").cast("string")
    )
    html = F.concat(
        F.lit('<html><body><p>intro</p><a href="'), a1,
        F.lit("/x\">one</a> <a href='"), a2,
        F.lit("/y'>two</a><a href=/rel>skip</a><a href="), a1,
        F.lit('/bare>three</a><map name=m><area shape=rect href="'), a3,
        F.lit('/map"></map></body></html>'),
    )
    return docs.select(url.alias("url"), html.alias("html"))


def q_host_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction + host-level link graph, pure Catalyst: three
    regexp passes (double-quoted / single-quoted / bare hrefs), absolute
    http(s) filter, host fold, multiplicity counts.  The oracle re-derives
    the hrefs with DuckDB's regexp_extract_all and the hosts with a regex
    (no parse_url there), so quoting classes, the relative-link skip, and
    the double-link multiplicity are all value-hashed."""
    from open_ocr_spark.dataops.links import extract_links, host_edges

    docs = _t(spark, sf_dir, "documents")
    return host_edges(extract_links(_link_pages(docs))).orderBy(
        "src_host", "dst_host"
    )


def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full web-graph pipeline: build pages -> extract links -> host
    graph -> 5 rounds of deterministic integer-domain PageRank.  Integer
    arithmetic makes the ranks EXACT (order-independent sums), so the
    oracle value-hashes them from 5 unrolled SQL iterations instead of
    epsilon-comparing floats — any drift in degree counts, dangling-node
    handling, or the update formula fails the hash."""
    from open_ocr_spark.dataops.links import extract_links, host_edges
    from open_ocr_spark.dataops.pagerank import pagerank_int

    docs = _t(spark, sf_dir, "documents")
    edges = host_edges(extract_links(_link_pages(docs))).select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return (
        pagerank_int(edges, iterations=5)
        .select(F.col("node").alias("host"), "rank")
        .orderBy("host")
    )


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 source rebalancing over a skewed 60/30/10 mix (the
    table's own sources are uniform, which would never thin): the kept
    ids are a pure function of (ids, per-source counts) via md5
    acceptance below a sqrt-rate cutoff — division and sqrt are
    IEEE-correctly-rounded in both engines, so the oracle hashes the
    EXACT kept set, not counts."""
    from open_ocr_spark.dataops.mixing import temperature_sample

    docs = _t(spark, sf_dir, "documents")
    skewed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 6, F.lit("head"))
        .when(F.col("doc_id") % 10 < 9, F.lit("body"))
        .otherwise(F.lit("tail"))
        .alias("source"),
    )
    return (
        temperature_sample(skewed, tau=0.5)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def q_prepare_corpus_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE crawl-to-corpus chain, value-hashed end to end: wrap every
    document in boilerplate lines + a PII tail, then line-dedup ->
    exact-dedup -> quality gate -> PII scrub -> 5-gram decontamination
    (eval set = every 50th raw document) -> md5 split, one plan.  The
    oracle reproduces each stage in SQL IN ORDER, so any stage-ordering
    bug (gating scrubbed counts, decontaminating pre-scrub text, splitting
    before dedup) or any drift in one stage's semantics fails the hash of
    the final text bytes."""
    from open_ocr_spark.dataops.corpus import prepare_corpus_full
    from open_ocr_spark.dataops.lines import chunk_words_to_lines

    docs = _t(spark, sf_dir, "documents")
    pii_tail = " contact a1.b-c@mail-host.example.net or call +1-555-0100-22"
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit(_BOILER_HEAD),
            F.lit("\n"),
            F.array_join(
                chunk_words_to_lines(
                    F.concat(
                        F.coalesce(F.col("text"), F.lit("")), F.lit(pii_tail)
                    ),
                    10,
                ),
                "\n",
            ),
            F.lit("\n"),
            F.lit(_BOILER_FOOT),
        ).alias("text"),
    )
    bench = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    return prepare_corpus_full(wrapped, bench, ngram=5).orderBy("doc_id")


def q_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3-style n-gram overlap): every 50th
    document plays the eval set; a training document is contaminated when
    any of its distinct word 5-grams appears in the eval set.  The oracle
    re-derives both shingle sets with unnest(range)/list-slice and the
    hit counts with a join + group-by, so the gram window arithmetic, the
    per-doc distinct, and the broadcast-join semantics are all
    value-hashed.  The word soup shares a small vocabulary, so natural
    5-gram collisions (not just the eval docs themselves) must match too."""
    from open_ocr_spark.dataops.decontam import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return decontaminate(docs, bench, n=5).orderBy("doc_id")


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC container roundtrip (Common-Crawl-native ingest, A1/A3 over
    the crawl's own format): pack documents 10-per-file into spec-shaped
    WARC response records built entirely in Catalyst (version line, CRLF
    headers, Content-Length in BYTES, record separators), then explode
    the files back into records with the stdlib parser.  The oracle is
    the identity on documents — any header, length, or separator bug in
    the parser (or the builder) breaks the byte-equality of text and the
    record count per file."""
    from open_ocr_spark.sources import records_from_warc

    docs = _t(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "
              "https://crawl.example.com/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\n"
              "Content-Type: text/plain\r\nContent-Length: "),
        F.octet_length(text).cast("string"),
        F.lit("\r\n\r\n"),
        text,
    )
    files = (
        docs.select(
            F.expr("doc_id DIV 10").alias("file_id"),
            F.struct(F.col("doc_id"), rec.alias("rec")).alias("s"),
        )
        .groupBy("file_id")
        .agg(
            F.encode(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("s")), lambda s: s["rec"]
                    ),
                    "\r\n\r\n",
                ),
                "utf-8",
            ).alias("warc")
        )
    )
    return records_from_warc(files, "warc").select(
        "file_id",
        "rec_index",
        "warc_type",
        "target_uri",
        F.octet_length("payload").alias("n_bytes"),
        F.decode("payload", "utf-8").alias("text"),
    ).orderBy("file_id", "rec_index")


def q_orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + HAVING through the SQL surface: orders above the
    global average price, grouped with a post-aggregation filter. Catalyst
    plans the scalar subquery as a broadcast one-row join — no per-row
    re-evaluation.

    All comparisons run in EXACT integer cents (price*100 floored to
    BIGINT, compared as price_cents * n > sum_cents): a float average is
    summation-order-dependent in its last bits, so a sharp `> avg(double)`
    boundary can flip rows between engines — the same hazard class the
    quality-score floor-scale fix documents."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH cents AS (
            SELECT o_orderpriority,
                   CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
            FROM orders_v
        ),
        tot AS (SELECT sum(c) AS s, count(*) AS n FROM cents)
        SELECT o_orderpriority, count(*) AS n_orders,
               floor(sum(c) / count(*) + 0.5) / CAST(100 AS DOUBLE)
                   AS avg_price
        FROM cents, tot
        WHERE c * n > s
        GROUP BY o_orderpriority
        HAVING count(*) > 10
        ORDER BY o_orderpriority
        """
    )


def q_binary_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, oracle-checkable slice: documents.text encoded
    to an opaque binary column, JVM-side byte length + md5."""
    docs = _t(spark, sf_dir, "documents").orderBy("doc_id")  # sort-early
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    from open_ocr_spark.dataops.multimodal import binary_stats

    return binary_stats(media)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE_NONE: mapInPandas feature-extraction plumbing with the
    deterministic decode stub. Rows-only check, no sort — a sort above
    the mapInPandas stage would run it twice (range-sampling pass)."""
    from open_ocr_spark.dataops.multimodal import extract_media_features

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(None).cast("string").alias("media_type"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )
    return extract_media_features(media).select(
        "media_id", "n_bytes", "sha1", "width", "height"
    )


def q_pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): order counts per priority × status.
    Status values pinned explicitly — at scale an unpinned pivot runs an
    extra distinct-values job over the whole table before planning."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .orderBy("o_orderpriority")
    )


def q_percentile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (sort-based aggregate) with linear interpolation —
    matches DuckDB's quantile_cont. The approx path for 100 TB is
    approx_percentile (t-digest); the exact form is the oracle-checkable
    one."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


def q_grouping_sets_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form behind rollup/cube, via spark.sql."""
    _t(spark, sf_dir, "documents").createOrReplaceTempView("documents_gs")
    return spark.sql(
        """
        SELECT source, lang, count(*) AS n_docs, sum(n_chars) AS total_chars
        FROM documents_gs
        GROUP BY GROUPING SETS ((source, lang), (source), ())
        ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST
        """
    )


def q_full_outer_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: users who purchased vs users who clicked — either
    side may be missing. Both sides are pre-aggregated before the join
    (shuffle carries one row per user, not per event)."""
    e = _t(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("purchase_value"),
        )
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    return (
        purchases.join(clicks, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
        )
        .orderBy("user_id")
    )


def q_ntile_order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ntile ranking — via distributed_ntile, NOT an unpartitioned
    window: a global window funnels every row through one task, while this
    form computes the exact same bucket assignment with a range exchange +
    parallel per-partition ranks + a metadata-sized offset broadcast
    (dataops/ranking.py)."""
    from open_ocr_spark.dataops.ranking import distributed_ntile

    o = _t(spark, sf_dir, "orders")
    return (
        distributed_ntile(
            o, 4, ["o_totalprice", "o_orderkey"], out_col="quartile"
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("quartile")
    )


def q_stats_corr_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covar_samp / stddev_samp) — single
    pass, map-side partial aggregation like any hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("stddev_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


def q_range_join_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) self-join: per user, count follower events within 300 s
    strictly after an event. A naive theta-join is a per-user cross
    product; the scale path buckets time into window-sized bins and turns
    the band predicate into an equi-join on (user_id, bucket) with each
    probe row exploded into its two candidate bins — shuffle-partitionable,
    no cartesian node (the same trick SNIPPETS.md shows for interval
    joins)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").alias("a_ts")
    )
    bucket = F.floor(F.unix_timestamp("a_ts") / 300)
    left = e.withColumn("bucket", bucket)
    probe = (
        _t(spark, sf_dir, "events")
        .select("user_id", F.col("ts").alias("b_ts"))
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    F.floor(F.unix_timestamp("b_ts") / 300),
                    F.floor(F.unix_timestamp("b_ts") / 300) - 1,
                )
            ),
        )
    )
    pairs = left.join(probe, ["user_id", "bucket"]).filter(
        (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 300 SECONDS"))
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


def q_extract_docx_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOXML conversion through the FULL kernel path (r4,
    kernels/docx_text.py): every document becomes a real .docx — stdlib
    zip container, [Content_Types].xml + word/document.xml — whose two
    paragraphs carry the document text and a tab + XML-entity line
    ('<' and '&' escaped in the package, decoded on extraction);
    magic-byte routing must pick the DOCX branch and return the text
    byte-exactly.  A zip-walk, run-concatenation, w:tab/w:br or
    entity-decode bug changes extracted_text and breaks the hash."""
    import pandas as pd

    def _docx_wrap(batches):
        from open_ocr_spark.kernels.docx_text import build_docx

        for pdf in batches:
            out = []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                paras = [
                    text if text is not None else "",
                    f"Doc {i}\t<tagged & checked>",
                ]
                out.append(
                    (i, f"https://docs.example.com/docx/{i}",
                     bytearray(build_docx(paras)))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "url", "html"]
            )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pages = docs.mapInPandas(
        _docx_wrap, "doc_id long, url string, html binary"
    ).select(
        "url",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        "html",
        F.lit("eng").alias("lang"),
        "doc_id",
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_extract_xlsx_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpreadsheetML conversion through the FULL kernel path (r4,
    kernels/docx_text.py xlsx sibling — completes the OOXML trio):
    every document becomes a real two-sheet .xlsx whose string cells go
    through a deduplicated sharedStrings table (the indirection real
    Excel files use) and whose numeric cells are literal <v> values;
    magic-byte routing must distinguish the workbook from the other
    office zips and return tab/newline/blank-line flat text
    byte-exactly."""
    import pandas as pd

    def _xlsx_wrap(batches):
        from open_ocr_spark.kernels.docx_text import build_xlsx

        for pdf in batches:
            out = []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                t = text if text is not None else ""
                sheets = [
                    [["Doc", str(i)], [t], ["<cells & rows>", "", "-3.5"]],
                    [["Doc", "total"], [str(i), str(i)]],
                ]
                out.append(
                    (i, f"https://docs.example.com/xlsx/{i}",
                     bytearray(build_xlsx(sheets)))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "url", "html"]
            )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pages = docs.mapInPandas(
        _xlsx_wrap, "doc_id long, url string, html binary"
    ).select(
        "url",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        "html",
        F.lit("eng").alias("lang"),
        "doc_id",
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_lang_id_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID made hash-checkable (r4): the library's labeled
    16-language/9-script fixture runs through the real vectorized
    classifier and the oracle states every expected label in closed
    form — a trigram-profile or script-rule regression flips a row and
    fails the driver hash (previously lang-id was rows-only)."""
    from open_ocr_spark.dataops.textstats import (
        LANG_ID_FIXTURE,
        with_lang_id,
    )

    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(LANG_ID_FIXTURE)],
        "sample_id long, expected string, text string",
    )
    return (
        with_lang_id(df)
        .select("sample_id", "expected", "lang_pred")
        .orderBy("sample_id")
    )


def q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-archive CDX index (r4, dataops/urls.py): SURT keys over the
    capture table + content digests, range-ordered so prefix lookups
    are contiguous. The oracle rebuilds the SURT transform and the md5
    digest of the exact wrapped html bytes in SQL."""
    from open_ocr_spark.dataops.urls import cdx_index

    pages = pages_from_documents(spark, sf_dir)
    return cdx_index(pages)


def q_warc_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Common-Crawl ingest chain (r4): WARC container →
    records_from_warc → http_responses. Each document becomes a real
    gzip-member WARC holding one `response` record whose payload is a
    raw HTTP message; five variants cycle the capture-reality layers —
    plain Content-Length, chunked, gzip Content-Encoding, chunked gzip
    (coding inside transfer-coding, as real stacks send it), and a
    truncated chunked body that must surface as an error VALUE."""
    import pandas as pd

    def _wrap(batches):
        from open_ocr_spark.sources import build_http_response, build_warc

        for pdf in batches:
            out = []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                body = (text or "").encode("utf-8")
                v = i % 5
                if v == 4:
                    # pad so the 8-byte cut always lands in the LAST
                    # CHUNK'S data (an empty body's chunked payload is
                    # just the 5-byte terminator and the cut would eat
                    # the header block -> a different error message);
                    # body content is irrelevant here, the oracle
                    # expects a NULL body for the error row
                    body += b" " * 16
                raw = build_http_response(
                    body,
                    status=200 + (i % 2) * 204,
                    chunked=v in (1, 3, 4),
                    gzipped=v in (2, 3),
                )
                if v == 4:
                    raw = raw[:-8]  # cut into the last chunk's data
                warc = build_warc(
                    [(f"https://h{i % 20}.example.com/{i}", raw)],
                    gzip_members=True,
                )
                out.append((i, bytearray(warc)))
            yield pd.DataFrame(out, columns=["doc_id", "warc"])

    from open_ocr_spark.sources import http_responses, records_from_warc

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    files = docs.mapInPandas(_wrap, "doc_id long, warc binary")
    recs = records_from_warc(files).select("doc_id", "payload")
    return (
        http_responses(recs)
        .select(
            "doc_id",
            "http_status",
            "http_content_type",
            F.decode("body", "utf-8").alias("body_text"),
            "http_error",
        )
        .orderBy("doc_id")
    )


def q_robots_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness metadata (r4, robots.py sibling of robots_gate): each
    host's robots.txt carries a googlebot Crawl-delay that must NOT
    leak into the '*' group, a fractional '*' delay (exact integer
    millis), a malformed delay line that must be ignored, and two
    global Sitemap lines whose file order must survive. One row per
    (host, sitemap) with the host's delay."""
    from open_ocr_spark.dataops.robots import parse_robots_meta

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    hid = (F.col("doc_id") % 20).cast("string")
    robots = docs.select(hid.alias("hid")).distinct().select(
        "hid",
        F.concat(F.lit("h"), F.col("hid"), F.lit(".example.com")).alias(
            "host"
        ),
        F.concat(
            F.lit(
                "User-agent: googlebot\nCrawl-delay: 99\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /x\nCrawl-delay: "
            ),
            F.col("hid"),
            F.lit(
                ".5\nCrawl-delay: oops\n"
                "Sitemap: https://h"
            ),
            F.col("hid"),
            F.lit(".example.com/sitemap.xml\nSitemap: https://h"),
            F.col("hid"),
            F.lit(".example.com/news.xml # freshest\n"),
        ).alias("robots_txt"),
    )
    meta = parse_robots_meta(robots, agent="*")
    return meta.select(
        "host",
        "crawl_delay_ms",
        F.posexplode("sitemaps").alias("sm_index", "sitemap"),
    ).orderBy("host", "sm_index")


_BLOCKLIST = ["table scan", "slow join", "batch", "window"]


def q_phrase_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist-phrase gate (C4-style bad-phrase filtering, the list a
    parameter): one codegen'd word-boundary alternation counts hits per
    document — the oracle runs the IDENTICAL generated pattern, so
    escaping, boundaries, case folding and overlap order all
    hash-check."""
    from open_ocr_spark.dataops.quality_rules import phrase_gate

    docs = _t(spark, sf_dir, "documents")
    return phrase_gate(docs, _BLOCKLIST).orderBy("doc_id")


def q_json_ld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema.org JSON-LD harvest (r4, dataops/htmlmeta.py): pages carry
    two valid typed ld+json blocks (built with to_json so names are
    properly JSON-escaped), one valid @graph container with NO top-level
    @type (kept with NULL ld_type — ADVICE r4), one malformed block, and
    one non-ld script; the extractor must find exactly the valid blocks,
    unescape the names byte-exactly, and drop only the malformed and
    non-ld ones — pure Catalyst, no Python."""
    from open_ocr_spark.dataops.htmlmeta import extract_json_ld

    docs = _t(spark, sf_dir, "documents")
    b1 = F.to_json(
        F.struct(
            F.lit("Article").alias("@type"),
            F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40).alias(
                "name"
            ),
        )
    )
    b2 = F.to_json(
        F.struct(
            F.lit("Product").alias("@type"),
            F.concat(F.lit("Item "), F.col("doc_id")).alias("name"),
        )
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit('<html><head><script type="application/ld+json">'),
            b1,
            F.lit("</script><script type='application/ld+json'>"),
            b2,
            F.lit('</script><script type="application/ld+json">'
                  '{"@context":"https://schema.org","@graph":'
                  '[{"@type":"WebSite"}]}'),
            F.lit('</script><script type="application/ld+json">{oops'),
            F.lit('</script><script type="text/javascript">'
                  '{"@type":"Nope","name":"x"}</script>'
                  "</head><body>content</body></html>"),
        ).alias("html"),
    )
    return extract_json_ld(pages).orderBy("doc_id", "ld_type")


def q_extract_glyph_ocr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's literal image→text contract in the pixel domain
    (r4, kernels/glyph_ocr.py): every document's text is rasterized
    into a REAL PNG with the deterministic 5×7 glyph font (the writer
    twin, via the repo's own PNG encoder), the payload routes through
    the extraction kernel's image branch by magic bytes, and template-
    matching OCR over the decoded pixels must recover the text exactly.
    The oracle is the font-normalization transform (upper, drop
    unsupported glyphs, 96-glyph line, trailing-pad strip)."""
    import pandas as pd

    def _render(batches):
        from open_ocr_spark.kernels.glyph_ocr import render_text_png

        for pdf in batches:
            out = []
            for i, t in zip(pdf["doc_id"], pdf["clean"]):
                i = int(i)
                out.append(
                    (i, f"https://docs.example.com/scan/{i}",
                     bytearray(render_text_png(t)))
                )
            yield pd.DataFrame(out, columns=["doc_id", "url", "html"])

    clean = F.rtrim(
        F.substring(
            F.regexp_replace(
                F.upper(F.coalesce(F.col("text"), F.lit(""))),
                r"[^A-Z0-9 .,'&-]",
                "",
            ),
            1,
            96,
        )
    )
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", clean.alias("clean")
    )
    pages = docs.mapInPandas(
        _render, "doc_id long, url string, html binary"
    ).select(
        "url",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        "html",
        F.lit("eng").alias("lang"),
        "doc_id",
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_extract_epub_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPUB conversion through the FULL kernel path (r4, the OCF/OPF
    e-book branch): every document becomes a real two-chapter .epub —
    both chapters are boilerplate-wrapped XHTML, the manifest enumerates
    them REVERSED while the spine holds reading order, so only a
    spine-order reader roundtrips; each chapter runs through the
    engine's own HTML boilerplate-strip kernel, so the oracle is the
    same normalization identity extract_main_text uses, per chapter."""
    import pandas as pd

    def _epub_wrap(batches):
        from open_ocr_spark.kernels.docx_text import build_epub

        for pdf in batches:
            out = []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                t = text if text is not None else ""
                ch1 = (_WRAP_PREFIX + t + _WRAP_SUFFIX).encode("utf-8")
                ch2 = (
                    _WRAP_PREFIX
                    + f"Chapter {i} of the epub & appendix"
                    + _WRAP_SUFFIX
                ).encode("utf-8")
                out.append(
                    (i, f"https://docs.example.com/epub/{i}",
                     bytearray(build_epub([ch1, ch2])))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "url", "html"]
            )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pages = docs.mapInPandas(
        _epub_wrap, "doc_id long, url string, html binary"
    ).select(
        "url",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        "html",
        F.lit("eng").alias("lang"),
        "doc_id",
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_extract_pptx_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PresentationML conversion through the FULL kernel path (r4,
    kernels/docx_text.py pptx sibling): every document becomes a real
    two-slide .pptx — slide 1 carries the document text, slide 2 two
    paragraphs with an a:br line break and XML entities; magic-byte
    routing must distinguish the deck from DOCX/ODT zips and return all
    slides' text in numeric slide order, byte-exactly."""
    import pandas as pd

    def _pptx_wrap(batches):
        from open_ocr_spark.kernels.docx_text import build_pptx

        for pdf in batches:
            out = []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                slides = [
                    [text if text is not None else ""],
                    [f"Slide {i}", "<deck & notes>\nend"],
                ]
                out.append(
                    (i, f"https://docs.example.com/pptx/{i}",
                     bytearray(build_pptx(slides)))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "url", "html"]
            )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pages = docs.mapInPandas(
        _pptx_wrap, "doc_id long, url string, html binary"
    ).select(
        "url",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        "html",
        F.lit("eng").alias("lang"),
        "doc_id",
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_extract_odt_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ODF conversion through the FULL kernel path (r4, the
    OpenDocument sibling of the DOCX branch): every document becomes a
    real .odt — mimetype member (STORED first, per spec) + content.xml
    — whose paragraphs carry the document text and a
    run-length-space + entity line; magic-byte routing must
    disambiguate ODT from DOCX inside the shared PK branch and return
    the text byte-exactly."""
    import pandas as pd

    def _odt_wrap(batches):
        from open_ocr_spark.kernels.docx_text import build_odt

        for pdf in batches:
            out = []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                paras = [
                    text if text is not None else "",
                    f"Odt {i}\t<open & doc>",
                ]
                out.append(
                    (i, f"https://docs.example.com/odt/{i}",
                     bytearray(build_odt(paras)))
                )
            yield pd.DataFrame(out, columns=["doc_id", "url", "html"])

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pages = docs.mapInPandas(
        _odt_wrap, "doc_id long, url string, html binary"
    ).select(
        "url",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        "html",
        F.lit("eng").alias("lang"),
        "doc_id",
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_extract_rtf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RTF conversion through the FULL kernel path (r4,
    kernels/rtf_text.py — the third office sibling after DOCX/ODT):
    every document becomes a real .rtf via the writer twin — header with
    fonttbl/colortbl/ignorable-generator destinations that must be
    skipped, body with \\uN? Unicode escapes, \\tab, and \\par between
    paragraphs; magic-byte routing must pick the RTF branch and return
    the text byte-exactly.  A tokenizer, destination-skip, \\uc
    fallback, or \\par-convention bug changes extracted_text and breaks
    the hash."""
    import pandas as pd

    def _rtf_wrap(batches):
        from open_ocr_spark.kernels.rtf_text import build_rtf

        for pdf in batches:
            out = []
            for i, text in zip(pdf["doc_id"], pdf["text"]):
                i = int(i)
                paras = [
                    text if text is not None else "",
                    f"Rtf {i}\t«rich & text»",
                ]
                out.append(
                    (i, f"https://docs.example.com/rtf/{i}",
                     bytearray(build_rtf(paras)))
                )
            yield pd.DataFrame(out, columns=["doc_id", "url", "html"])

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pages = docs.mapInPandas(
        _rtf_wrap, "doc_id long, url string, html binary"
    ).select(
        "url",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        "html",
        F.lit("eng").alias("lang"),
        "doc_id",
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def _rules_page_col():
    """Deterministic multi-line page per document for the quality-rule
    queries: the raw text (single-line word soup in the fixtures) plus
    four constructed lines that flip every Gopher/C4 rule branch both
    ways across doc_ids.  The oracle rebuilds the identical page in SQL,
    so the whole gate is hash-checked end to end."""
    i = F.col("doc_id")
    t = F.coalesce(F.col("text"), F.lit(""))
    tail1 = (
        F.when(i % 4 == 0, F.lit("."))
        .when(i % 4 == 1, F.lit(" …"))
        .when(i % 4 == 2, F.lit(" ### ##"))
        .otherwise(F.lit(""))
    )
    l3 = F.when(
        i % 3 == 0,
        F.lit(
            "This line truly ends with terminal punctuation and the"
            " word of quality."
        ),
    ).otherwise(F.lit("short trailing thought..."))
    l4 = F.when(
        i % 5 == 0, F.lit("Enable javascript to view { this } page now.")
    ).otherwise(
        F.lit("Readers have come here with patience and that shows today.")
    )
    l5 = F.when(
        i % 11 == 0, F.lit("Lorem Ipsum dolor sit amet consectetur.")
    ).otherwise(F.lit("The end of the story arrives quietly tonight."))
    return F.concat(
        t,
        tail1,
        F.lit("\n- bullet item number "),
        (i % 7).cast("string"),
        F.lit("\n"),
        l3,
        F.lit("\n"),
        l4,
        F.lit("\n"),
        l5,
    )


# the same page in DuckDB SQL — keep in lockstep with _rules_page_col
_RULES_PAGE_SQL = """coalesce(text, '')
            || CASE doc_id % 4 WHEN 0 THEN '.' WHEN 1 THEN ' …'
                    WHEN 2 THEN ' ### ##' ELSE '' END
            || chr(10) || '- bullet item number ' || (doc_id % 7)::VARCHAR
            || chr(10) || CASE WHEN doc_id % 3 = 0
                   THEN 'This line truly ends with terminal punctuation and the word of quality.'
                   ELSE 'short trailing thought...' END
            || chr(10) || CASE WHEN doc_id % 5 = 0
                   THEN 'Enable javascript to view { this } page now.'
                   ELSE 'Readers have come here with patience and that shows today.' END
            || chr(10) || CASE WHEN doc_id % 11 = 0
                   THEN 'Lorem Ipsum dolor sit amet consectetur.'
                   ELSE 'The end of the story arrives quietly tonight.' END"""


def q_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-level quality rules (Rae et al. 2021, table A1)
    over constructed multi-line pages: per-rule booleans plus the
    integer evidence counters, all in one codegen'd projection — zero
    shuffles, integer-exact ratios (symbols*10 <= words, never a
    float).  The oracle rebuilds the page and every counter in DuckDB
    list SQL, so a split, counter, or threshold bug breaks the hash."""
    from open_ocr_spark.dataops.quality_rules import gopher_gate

    docs = (
        _t(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .select("doc_id", _rules_page_col().alias("text"))
    )
    return gopher_gate(docs).select(
        "doc_id",
        "n_words",
        "n_word_chars",
        "n_alpha_words",
        "n_stop_hits",
        "n_symbol_marks",
        "n_lines",
        "n_bullet_lines",
        "n_ellipsis_lines",
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_bullet_lines",
        "rule_ellipsis_lines",
        "rule_alpha_words",
        "rule_stop_words",
        "keep",
    )


def q_c4_line_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2) over the same
    constructed pages: keep lines ending in terminal punctuation with
    >= 5 words and no 'javascript'; gate pages on braces, 'lorem
    ipsum', and a >= 3-sentence minimum.  text_clean itself is in the
    hashed output, so the kept-line set and join order are pinned
    byte-exactly."""
    from open_ocr_spark.dataops.quality_rules import c4_clean

    docs = (
        _t(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .select("doc_id", _rules_page_col().alias("text"))
    )
    return c4_clean(docs).select(
        "doc_id",
        "text_clean",
        "n_lines_kept",
        "n_sentences",
        "has_brace",
        "has_lorem",
        "keep",
    )


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (dataops/search.py) for a 3-term query over
    the documents corpus: Robertson idf, length-normalized tf against
    the corpus average.  The query-term filter sits directly on the
    token explode so only query-term postings ever shuffle; df and
    corpus stats broadcast.  Scores round to 4dp (the repo's float
    contract); no top-k cutoff on the hashed surface, so ranking is
    fully value-checked without cutoff-tie sensitivity."""
    from open_ocr_spark.dataops.search import bm25_rank

    docs = _t(spark, sf_dir, "documents")
    return (
        bm25_rank(docs, ["spark", "vector", "hash"])
        .select(
            "doc_id",
            "n_terms_matched",
            F.round("score", 4).alias("score_e4"),
        )
        .orderBy("doc_id")
    )


def q_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual (dHash) image near-dup grouping (dataops/phash.py),
    REAL pixel path: each document becomes an 8x8 grayscale BMP whose
    pixel base values are a formula of its group (doc_id % 17) plus a
    per-document LOW-BIT noise term that dHash must ignore — base values
    are doubled so a +-1 noise can never flip a neighbor comparison.
    The kernel decodes the real BMP bytes (strict=True), grayscales,
    and hashes; the oracle recomputes each group's 56 comparison bits
    straight from the generation formula in SQL.  Same-pixel PNG/BMP
    agreement and block-mean downsampling exactness are pinned in
    tests/test_phash.py."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from open_ocr_spark.dataops.phash import image_near_dup_groups

    def _img_wrap(ids):
        import numpy as np

        from open_ocr_spark.dataops.multimodal import encode_bmp24

        xs, ys = np.arange(8)[None, :], np.arange(8)[:, None]
        out = []
        for i in ids:
            g = int(i) % 17
            base = (g * 31 + 7 * xs + 13 * ys) % 120
            noise = (int(i) * (xs + 1) * (ys + 3)) % 2
            v = (base * 2 + noise).astype(np.uint8)
            out.append(encode_bmp24(np.stack([v, v, v], axis=2)))
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.withColumn(
        "payload", pandas_udf(_img_wrap, "binary")(F.col("doc_id"))
    )
    return image_near_dup_groups(media, strict=True).orderBy("dhash")


def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram top-k (dataops/textstats.top_ngrams): the canonical
    count-everything job — two-phase hash aggregate, TakeOrdered top-50
    with a deterministic total order (count desc, ngram asc), never a
    global sort of the corpus."""
    from open_ocr_spark.dataops.textstats import top_ngrams

    return top_ngrams(_t(spark, sf_dir, "documents"), n=2, k=50)


def q_key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew Gini diagnostic (dataops/skew.py) over events.user_id —
    the measurement behind salt-factor / AQE-threshold choices.  Exact
    int64 weighted-rank numerator on the hashed surface; ties on count
    are provably order-independent, so the value is engine- and
    parallelism-invariant."""
    from open_ocr_spark.dataops.skew import key_skew_gini

    return key_skew_gini(_t(spark, sf_dir, "events"), "user_id")


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear classifier serving (dataops/classifier.py): hashing-trick
    weights, mean-pool, sigmoid — the CCNet/fastText quality-gate shape
    with an exact int64 fixed-point accumulator, so labels are
    integer-exact at any parallelism and the only float is the reported
    probability (4dp contract).  Oracle recomputes every md5 weight in
    SQL."""
    from open_ocr_spark.dataops.classifier import hashed_linear_score

    docs = _t(spark, sf_dir, "documents")
    return (
        hashed_linear_score(docs)
        .select(
            "doc_id",
            "n_tokens",
            "weight_sum",
            F.round("prob", 4).alias("prob_e4"),
            "label",
        )
        .orderBy("doc_id")
    )


def q_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed classifier TRAINING (r5, dataops/classifier.py
    perceptron_train — VERDICT r4 item 5): two integer-exact batch-
    perceptron epochs over the documents corpus with in-corpus labels
    (y=+1 for lang='en', the CCNet reference-vs-crawl shape), no collect,
    per-epoch work one term equi-join + two hash aggregates. The oracle
    REPLAYS BOTH EPOCHS as an unrolled CTE (score under w, misclassify
    with the score>=0 tie rule, sum y*cnt deltas, full-outer merge), so
    tokenization, tie-breaks and every weight value hash-check."""
    from open_ocr_spark.dataops.classifier import perceptron_train

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.when(F.col("lang") == "en", F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
    )
    return perceptron_train(docs, iters=2).orderBy("term")


def _classifier_train_oracle(iters: int = 2) -> str:
    """Unrolled-CTE replay of perceptron_train: w0 is empty, epoch i
    scores under w{i-1} (missing terms = 0), misclassifies with the
    score>=0 -> +1 tie rule, and merges sum(y*cnt) over misclassified
    docs into w{i}."""
    ctes = [
        """toks AS (
            SELECT doc_id, term, count(*)::BIGINT AS cnt
            FROM (
                SELECT doc_id,
                       unnest(string_split_regex(
                           lower(coalesce(text, '')), '\\s+')) AS term
                FROM documents
            )
            WHERE term <> ''
            GROUP BY doc_id, term
        )""",
        """labels AS (
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 1 ELSE -1 END::BIGINT AS y
            FROM documents
        )""",
        "w0 AS (SELECT '' AS term, 0::BIGINT AS w WHERE false)",
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""s{i} AS (
            SELECT t.doc_id, sum(w.w * t.cnt)::BIGINT AS score
            FROM toks t JOIN w{i - 1} w USING (term)
            GROUP BY t.doc_id
        )""")
        ctes.append(f"""m{i} AS (
            SELECT l.doc_id, l.y
            FROM labels l LEFT JOIN s{i} s USING (doc_id)
            WHERE (CASE WHEN coalesce(s.score, 0) >= 0
                        THEN 1 ELSE -1 END) <> l.y
        )""")
        ctes.append(f"""w{i} AS (
            SELECT coalesce(w.term, d.term) AS term,
                   (coalesce(w.w, 0) + coalesce(d.d, 0))::BIGINT AS w
            FROM w{i - 1} w
            FULL OUTER JOIN (
                SELECT t.term, sum(m.y * t.cnt)::BIGINT AS d
                FROM m{i} m JOIN toks t USING (doc_id)
                GROUP BY t.term
            ) d ON w.term = d.term
        )""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT term, w AS weight FROM w{iters} WHERE w <> 0 "
        "ORDER BY term"
    )


def q_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured table extraction (kernels/tables.py) through the real
    HTML parse: each document becomes a page with nav/footer
    boilerplate and one 2x3 table — an entity-bearing header row plus a
    data row whose cells are formulas of doc_id.  The kernel must parse
    the real markup, keep document order, decode entities, and
    collapse whitespace; the oracle regenerates every expected cell in
    SQL.  Nesting/malformed-row behavior is pinned in
    tests/test_tables.py."""
    import pandas as pd

    def _page_wrap(batches):
        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                html = (
                    "<html><body><nav><a href='/'>home</a></nav>"
                    "<table><tr><th>name &amp; id</th><th>qty</th>"
                    "<th>price</th></tr>"
                    f"<tr><td> item-{i} </td><td>{i % 7}</td>"
                    f"<td>{(i * 3) % 100}</td></tr></table>"
                    "<footer>(c) corp</footer></body></html>"
                )
                out.append((i, bytearray(html.encode())))
            yield pd.DataFrame(out, columns=["doc_id", "html"])

    from open_ocr_spark.kernels.tables import html_tables

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    pages = docs.mapInPandas(_page_wrap, "doc_id long, html binary")
    return html_tables(pages).orderBy("doc_id", "table_idx", "row_idx",
                                      "col_idx")


def q_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease (dataops/textstats.with_readability): exact
    integer word/sentence/vowel-group counts in one codegen'd
    projection, float only in the final formula (4dp contract).  The
    oracle replays the identical expression shape in DuckDB."""
    from open_ocr_spark.dataops.textstats import with_readability

    docs = _t(spark, sf_dir, "documents")
    return (
        with_readability(docs)
        .select(
            "doc_id",
            "n_words",
            "n_sentences",
            "n_syllables",
            F.round("flesch", 4).alias("flesch_e4"),
        )
        .orderBy("doc_id")
    )


def q_bloom_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 Bloom filter membership pruning (dataops/bloom.py): build the
    filter over customers with a 2001+ order ("recent buyers"), probe
    every customer, and account exactly for true/false positives.
    Because every bit position is md5-derived (Kirsch-Mitzenmacher
    double hashing), the false-positive SET — not just its size — is
    engine-independent, and this single-row summary hash-checks it
    against DuckDB.  Probe side joins the broadcast sparse filter; no
    shuffle of probe payloads."""
    from open_ocr_spark.dataops.bloom import bloom_build, bloom_members

    M_BITS, K = 65536, 5
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    keys = (
        orders.where(F.col("o_orderdate") >= "2001-01-01")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    bits = bloom_build(keys, "key", M_BITS, K)
    probes = cust.select(F.col("c_custkey").alias("key")).distinct()
    hits = bloom_members(probes, "key", bits, M_BITS, K)
    hit_truth = hits.join(
        keys.withColumn("is_member", F.lit(1)), "key", "left"
    ).agg(
        F.count("*").cast("long").alias("bloom_positives"),
        F.count("is_member").cast("long").alias("true_positives"),
        (F.count("*") - F.count("is_member"))
        .cast("long")
        .alias("false_positives"),
    )
    return (
        keys.agg(F.count("*").cast("long").alias("n_keys"))
        .crossJoin(bits.agg(F.count("*").cast("long").alias("n_bits_set")))
        .crossJoin(probes.agg(F.count("*").cast("long").alias("n_probes")))
        .crossJoin(hit_truth)
    )


def q_hll_distinct_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5-based HyperLogLog register histogram (dataops/hll.py) — the
    hash-checkable twin of `approx_distinct_users`: Spark's built-in
    HLL++ is sealed in the JVM, but this sketch is built from md5 +
    bin() primitives both engines share, so the full register table is
    bit-identical across engines and the driver can hash it.  The float
    cardinality estimate lives outside the data plane (tests bound its
    error vs exact)."""
    from open_ocr_spark.dataops.hll import hll_register_histogram

    ev = _t(spark, sf_dir, "events")
    return hll_register_histogram(ev, "user_id").orderBy("rho")


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning (dataops/bpe_train.py): 8 rounds of
    corpus-global pair-count argmax over the word histogram, ties broken
    (lhs, rhs) ascending.  The oracle replays the ENTIRE training run in
    SQL — 8 unrolled stages, each with its own pair-count aggregate,
    1-row argmax, and space-delimited string-replace merge (replace's
    left-to-right non-overlapping scan IS greedy BPE merging, identical
    on both engines) — so a histogram, pair-window, tie-break, or merge-
    application bug anywhere in 8 iterations breaks the hash."""
    from open_ocr_spark.dataops.bpe_train import learn_bpe_merges, merges_df

    docs = _t(spark, sf_dir, "documents")
    return merges_df(spark, learn_bpe_merges(docs, k=8)).orderBy(
        "merge_rank"
    )


def _bpe_train_stages(k: int = 8) -> list:
    """The shared WITH-stages of the DuckDB BPE-training replay: word
    histogram s0, then per-rank pair counts p_i, argmax b_i, merged
    vocab s_i (see q_bpe_train for the storage-form contract)."""
    stages = [
        """tok AS (
            SELECT unnest(list_filter(
                regexp_split_to_array(coalesce(text, ''), '\\s+'),
                x -> x <> '')) AS word
            FROM documents
        ),
        w AS (SELECT word, count(*)::BIGINT AS freq FROM tok GROUP BY word),
        s0 AS (
            -- storage form: double-space-joined symbols, single-space pad
            -- (' l  o  w '), so merge-by-replace keeps adjacent boundaries
            SELECT ' ' || rtrim(regexp_replace(word, '(.)', '\\1  ', 'g'))
                   || ' ' AS syms,
                   freq
            FROM w
        )"""
    ]
    for i in range(1, k + 1):
        stages.append(
            f"""p{i} AS (
            SELECT sl[g.i] AS lhs, sl[g.i + 1] AS rhs,
                   sum(freq)::BIGINT AS pair_freq
            FROM (SELECT list_filter(string_split(syms, ' '),
                                     x -> x <> '') AS sl, freq
                  FROM s{i - 1}) t,
                 UNNEST(generate_series(1, len(t.sl) - 1)) AS g(i)
            GROUP BY 1, 2
        ),
        b{i} AS (
            SELECT lhs, rhs, pair_freq FROM p{i}
            ORDER BY pair_freq DESC, lhs, rhs LIMIT 1
        ),
        s{i} AS (
            SELECT replace(syms,
                           ' ' || b.lhs || '  ' || b.rhs || ' ',
                           ' ' || b.lhs || b.rhs || ' ') AS syms,
                   freq
            FROM s{i - 1}, b{i} b
        )"""
        )
    return stages


def _bpe_oracle_sql(k: int = 8) -> str:
    """Generated k-stage DuckDB replay of learn_bpe_merges (see
    q_bpe_train)."""
    stages = _bpe_train_stages(k)
    unions = "\n            UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, lhs, rhs, pair_freq"
        f" FROM b{i}"
        for i in range(1, k + 1)
    )
    return (
        "WITH "
        + ",\n        ".join(stages)
        + f"\n        SELECT * FROM ({unions}) ORDER BY merge_rank"
    )


def q_bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst-only BPE tokenization with the learned merge table
    (dataops/bpe_train.apply_bpe_merges): the 8 merges replay per word
    as literal replaces inside transform() — zero Python per row, zero
    shuffles in the encode stage.  The oracle re-learns the same 8
    merges in SQL, then applies them per word position and re-assembles
    each document's token stream in order, so training, greedy merge
    application, and token-order preservation are all hash-checked."""
    from open_ocr_spark.dataops.bpe_train import (
        apply_bpe_merges,
        learn_bpe_merges,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, k=8)
    return (
        apply_bpe_merges(docs, merges)
        .select(
            "doc_id",
            F.size("bpe_tokens").alias("n_tokens"),
            F.concat_ws(" ", F.slice("bpe_tokens", 1, 8)).alias(
                "head_tokens"
            ),
        )
        .orderBy("doc_id")
    )


def _bpe_encode_oracle_sql(k: int = 8) -> str:
    """Generated DuckDB replay of train-then-encode (see
    q_bpe_encode_docs)."""
    stages = _bpe_train_stages(k)
    stages.append(
        """d AS (
            SELECT doc_id, g.i AS pos, wl[g.i] AS word
            FROM (SELECT doc_id,
                         list_filter(regexp_split_to_array(
                             coalesce(text, ''), '\\s+'), x -> x <> '')
                         AS wl
                  FROM documents) t,
                 UNNEST(generate_series(1, len(t.wl))) AS g(i)
        ),
        e0 AS (
            SELECT doc_id, pos,
                   ' ' || rtrim(regexp_replace(word, '(.)', '\\1  ', 'g'))
                   || ' ' AS syms
            FROM d
        )"""
    )
    for i in range(1, k + 1):
        stages.append(
            f"""e{i} AS (
            SELECT doc_id, pos,
                   replace(syms,
                           ' ' || b.lhs || '  ' || b.rhs || ' ',
                           ' ' || b.lhs || b.rhs || ' ') AS syms
            FROM e{i - 1}, b{i} b
        )"""
        )
    stages.append(
        f"""per AS (
            SELECT doc_id,
                   flatten(array_agg(
                       list_filter(string_split(syms, ' '), x -> x <> '')
                       ORDER BY pos)) AS toks
            FROM e{k} GROUP BY doc_id
        )"""
    )
    return (
        "WITH "
        + ",\n        ".join(stages)
        + """
        SELECT docs.doc_id,
               coalesce(len(per.toks), 0)::INT AS n_tokens,
               coalesce(array_to_string(per.toks[1:8], ' '), '')
                   AS head_tokens
        FROM documents docs LEFT JOIN per ON docs.doc_id = per.doc_id
        ORDER BY docs.doc_id"""
    )


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier scheduling end to end (dataops/frontier.py): each
    document discovers three links — a page URL in two raw spellings
    (www + :443 + trailing slash + tracking params + fragment vs the
    clean form; a canonicalization bug splits the referrer counts), its
    host's homepage (higher in-degree tier), and a /private/ URL the
    per-host robots.txt disallows.  Seen history (messy raw forms, 1 in
    5 pages) is anti-joined after canonicalization; the per-host quota
    of 4 genuinely binds on half the hosts.  The oracle rebuilds the
    canonical candidates in closed form and replays the count / anti /
    gate / rank pipeline relationally, so it holds at any doc_id
    density."""
    from open_ocr_spark.dataops.frontier import frontier_schedule
    from open_ocr_spark.dataops.robots import parse_robots

    i = F.col("doc_id")
    h = (i % 10).cast("string")
    p = (i % 25).cast("string")
    raw_page = F.when(
        i % 2 == 0,
        F.concat(
            F.lit("https://www.h"), h, F.lit(".example.com:443/page/"), p,
            F.lit("/?utm_source=feed&b=2&a=1#frag"),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://h"), h, F.lit(".example.com/page/"), p,
            F.lit("?a=1&b=2"),
        )
    )
    home = F.concat(F.lit("https://h"), h, F.lit(".example.com/"))
    priv = F.concat(
        F.lit("https://h"), h, F.lit(".example.com/private/"),
        i.cast("string"),
    )
    src = F.concat(F.lit("https://s"), i.cast("string"), F.lit(".example.com/"))

    docs = _t(spark, sf_dir, "documents")
    candidates = docs.select(
        src.alias("src_url"),
        F.explode(F.array(raw_page, home, priv)).alias("dst_url"),
    )
    robots = (
        docs.select(
            F.concat(F.lit("h"), h, F.lit(".example.com")).alias("host")
        )
        .distinct()
        .select(
            "host",
            F.lit("User-agent: *\nDisallow: /private/\n").alias("robots_txt"),
        )
    )
    seen = (
        docs.filter(i % 25 < 5)
        .select(
            F.concat(
                F.lit("https://h"), h, F.lit(".example.com/page/"), p,
                F.lit("?b=2&a=1&utm_medium=social"),
            ).alias("url")
        )
        .distinct()
    )
    return frontier_schedule(
        candidates, parse_robots(robots), seen, per_host_quota=4
    ).orderBy("host", "fetch_order")


def q_frontier_polite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frontier_schedule x robots politeness, composed (r5, VERDICT r4
    item 7 — dataops/frontier.py frontier_polite): the same candidate /
    robots / seen fixture as frontier_schedule, but every host's
    robots.txt now declares a '*'-group Crawl-delay of (hid).5 seconds
    behind a googlebot distractor group (99 s — leaking it across groups
    flips nearly every row).  With a 10-second round budget the delay
    budget OVERRIDES the quota of 4 on hosts 3..9 (h3/h4 fit 2 fetches,
    h5..h9 fit 1) and leaves it binding on h0..h2; each kept fetch gets
    its polite start offset.  The oracle replays BOTH stages — the full
    count / anti-join / gate / rank frontier pipeline, then the delay
    join, budget filter and offset arithmetic — in closed form."""
    from open_ocr_spark.dataops.frontier import frontier_polite
    from open_ocr_spark.dataops.robots import parse_robots, parse_robots_meta

    i = F.col("doc_id")
    h = (i % 10).cast("string")
    p = (i % 25).cast("string")
    raw_page = F.when(
        i % 2 == 0,
        F.concat(
            F.lit("https://www.h"), h, F.lit(".example.com:443/page/"), p,
            F.lit("/?utm_source=feed&b=2&a=1#frag"),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://h"), h, F.lit(".example.com/page/"), p,
            F.lit("?a=1&b=2"),
        )
    )
    home = F.concat(F.lit("https://h"), h, F.lit(".example.com/"))
    priv = F.concat(
        F.lit("https://h"), h, F.lit(".example.com/private/"),
        i.cast("string"),
    )
    src = F.concat(F.lit("https://s"), i.cast("string"), F.lit(".example.com/"))

    docs = _t(spark, sf_dir, "documents")
    candidates = docs.select(
        src.alias("src_url"),
        F.explode(F.array(raw_page, home, priv)).alias("dst_url"),
    )
    robots = (
        docs.select(
            F.concat(F.lit("h"), h, F.lit(".example.com")).alias("host"),
            h.alias("hid"),
        )
        .distinct()
        .select(
            "host",
            F.concat(
                F.lit(
                    "User-agent: googlebot\nCrawl-delay: 99\nDisallow: /\n\n"
                    "User-agent: *\nDisallow: /private/\nCrawl-delay: "
                ),
                F.col("hid"),
                F.lit(".5\n"),
            ).alias("robots_txt"),
        )
    )
    seen = (
        docs.filter(i % 25 < 5)
        .select(
            F.concat(
                F.lit("https://h"), h, F.lit(".example.com/page/"), p,
                F.lit("?b=2&a=1&utm_medium=social"),
            ).alias("url")
        )
        .distinct()
    )
    return frontier_polite(
        candidates,
        parse_robots(robots),
        parse_robots_meta(robots, agent="*"),
        seen,
        per_host_quota=4,
        round_ms=10_000,
    ).orderBy("host", "fetch_order")


def q_wet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET export (r5, VERDICT r4 item 6 — dataops/wet.py): the
    extraction output packed into Common-Crawl-style WET segment files
    (warcinfo lead record + one text/plain `conversion` record per
    document, md5-url bucketed into 8 files, pure Catalyst), then
    exploded BACK through the engine's own WARC parser.  The oracle
    rebuilds every record in closed form — file assignment via the
    shared md5-bucket expression, in-file rec_index from the uri sort,
    the warcinfo body verbatim — so a header, bucketing, ordering or
    Content-Length byte bug breaks the hash."""
    from open_ocr_spark.dataops.wet import wet_files
    from open_ocr_spark.sources import records_from_warc

    docs = _t(spark, sf_dir, "documents")
    extracted = docs.select(
        F.concat(
            F.lit("https://crawl.example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.coalesce(F.col("text"), F.lit("")).alias("extracted_text"),
    )
    files = wet_files(extracted, num_buckets=8)
    return (
        records_from_warc(files, "wet")
        .select(
            "file_id",
            "rec_index",
            "warc_type",
            "target_uri",
            "content_type",
            F.decode("payload", "utf-8").alias("text"),
        )
        .orderBy("file_id", "rec_index")
    )


def q_wat_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAT export (r5, VERDICT r4 item 6 — dataops/wet.py): pages with
    three link shapes (no outlinks / one double-quoted / two mixed-quote
    links) become WAT `metadata` records whose JSON envelope composes the
    engine's OWN html parsers (htmlmeta title, links outlinks), packed
    into WARC segment files and exploded back through the WARC parser;
    the JSON is then re-parsed with from_json.  The oracle states title,
    link count and first sorted link in closed form, so the envelope
    build, the container roundtrip and the JSON schema all sit on the
    value path."""
    from open_ocr_spark.dataops.wet import wat_files
    from open_ocr_spark.sources import records_from_warc

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id").cast("string")
    v = F.col("doc_id") % 3
    link1 = F.concat(
        F.lit("https://h"), (F.col("doc_id") % 20).cast("string"),
        F.lit(".example.com/p/"), i,
    )
    link2 = F.concat(F.lit("https://ref.example.org/"), i)
    html = F.concat(
        F.lit("<title>Doc "), i, F.lit("</title>"),
        F.when(
            v >= 1, F.concat(F.lit('<a href="'), link1, F.lit('">x</a>'))
        ).otherwise(F.lit("")),
        F.when(
            v == 2, F.concat(F.lit("<a href='"), link2, F.lit("'>y</a>"))
        ).otherwise(F.lit("")),
        F.lit("<body>b</body>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://p.example.com/"), i).alias("url"),
        html.alias("html"),
    )
    env_schema = (
        "struct<Envelope:struct<"
        "`WARC-Header-Metadata`:struct<`WARC-Target-URI`:string>,"
        "`Payload-Metadata`:struct<`HTML-Metadata`:struct<"
        "Head:struct<Title:string>,Links:array<struct<url:string>>>>>>"
    )
    recs = records_from_warc(wat_files(pages, num_buckets=8), "wat").filter(
        F.col("warc_type") == "metadata"
    )
    parsed = F.from_json(F.decode("payload", "utf-8"), env_schema)
    hm = parsed["Envelope"]["Payload-Metadata"]["HTML-Metadata"]
    return recs.select(
        "target_uri",
        hm["Head"]["Title"].alias("title"),
        F.size(hm["Links"]).cast("long").alias("n_links"),
        F.try_element_at(hm["Links"], F.lit(1))["url"].alias("first_link"),
    ).orderBy("target_uri")


def q_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte content-type sniffing (dataops/mime.py) over 16 payload
    shapes cycled by doc_id — every container family the kernels route
    (pdf/rtf/zip/png/gif/jpeg/bmp/webm/warc/wav/avi/mp4/gzip), the HTML
    tag-marker case, a NUL-free text fallback, and a NUL-bearing
    octet-stream — each payload built JVM-side as unhex(prefix ||
    hex(text)) so real document bytes ride behind the magic.  The oracle
    states the 16 verdicts in closed form; a prefix-table, offset-magic
    (RIFF fourcc at byte 9, ftyp at byte 5), or text-tail bug flips rows
    and breaks the hash."""
    from open_ocr_spark.dataops.mime import sniff_mime_col

    i = F.col("doc_id")
    filler = F.hex(F.encode(F.coalesce(F.col("text"), F.lit("x")), "utf-8"))

    def mk(prefix_hex: str):
        return F.unhex(F.concat(F.lit(prefix_hex), filler))

    payload = (
        F.when(i % 16 == 0, mk("255044462D312E34"))  # %PDF-1.4
        .when(i % 16 == 1, mk("7B5C72746631"))  # {\rtf1
        .when(i % 16 == 2, mk("504B0304"))
        .when(i % 16 == 3, mk("89504E470D0A1A0A"))
        .when(i % 16 == 4, mk("474946383961"))
        .when(i % 16 == 5, mk("FFD8FFE0"))
        .when(i % 16 == 6, mk("424D"))
        .when(i % 16 == 7, mk("1A45DFA3"))
        .when(i % 16 == 8, mk("574152432F312E30"))  # WARC/1.0
        .when(i % 16 == 9, mk("524946461000000057415645"))  # RIFF..WAVE
        .when(i % 16 == 10, mk("524946461000000041564920"))  # RIFF..AVI
        .when(i % 16 == 11, mk("000000186674797069736F6D"))  # ....ftypisom
        .when(i % 16 == 12, mk("1F8B0800"))
        .when(
            i % 16 == 13,
            F.encode(
                F.concat(
                    F.lit("<!DOCTYPE html><p>"),
                    F.coalesce(F.col("text"), F.lit("")),
                ),
                "utf-8",
            ),
        )
        .when(
            i % 16 == 14,
            F.encode(
                F.concat(
                    F.lit("plain text "), F.coalesce(F.col("text"), F.lit(""))
                ),
                "utf-8",
            ),
        )
        .otherwise(mk("00FF00AA"))  # NUL prefix: octet-stream
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.select("doc_id", sniff_mime_col(payload))
        .orderBy("doc_id")
    )


def q_stratified_sample_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable twin of q_stratified_sample (VERDICT r3 item 1
    pattern): the same per-language fractions, but acceptance is
    md5(lang ':' doc_id) < floor(fraction·2^32) instead of sampleBy's
    engine-seeded RNG — the kept SET is a pure function of the ids, so
    the oracle hashes exactly which documents survive, not just counts.
    Zero shuffles: literal when-chain cutoff + one md5 per row."""
    from open_ocr_spark.dataops.mixing import stratified_sample_exact

    docs = _t(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "es": 0.25, "fr": 0.25, "de": 0.25, "zh": 0.1}
    return (
        stratified_sample_exact(docs, fractions)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def q_anchor_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation (the web's free target-page labels): pages
    carry four anchor shapes — mode competition between 'click here' /
    'read more' / 'site N' texts on the t-hosts, a messy-whitespace
    unicode text on the u-hosts, a nested-markup anchor (empty capture,
    dropped), and a relative href (dropped).  One (dst,text) hash agg +
    one window exchange; the oracle replays the regex pairing with
    DuckDB's lockstep unnest and the mode tie-break with row_number —
    a capture-alignment, collapse, count, or tie-break bug breaks the
    hash."""
    from open_ocr_spark.dataops.links import anchor_text_stats, extract_anchors

    i = F.col("doc_id")
    t_dst = F.concat(
        F.lit("https://t"), (i % 10).cast("string"), F.lit(".example.com/")
    )
    u_dst = F.concat(
        F.lit("https://u"), (i % 7).cast("string"), F.lit(".example.com/x")
    )
    html = F.concat(
        F.lit('<html><body><a href="'),
        t_dst,
        F.lit('">'),
        F.when(i % 3 == 1, F.lit("read more")).otherwise(F.lit("click here")),
        F.lit('</a> <A HREF="'),
        t_dst,
        F.lit('">  site   '),
        (i % 2).cast("string"),
        F.lit("\n page</A><a href=\""),
        u_dst,
        F.lit('" rel=nofollow>Example — Site '),
        (i % 13).cast("string"),
        F.lit('</a><a href="'),
        t_dst,
        F.lit('"><b>skip</b></a><a href="/rel">skip too</a>'),
        F.lit("</body></html>"),
    )
    pages = _t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://h"), (i % 20).cast("string"),
            F.lit(".example.com/p/"), i.cast("string"),
        ).alias("url"),
        html.alias("html"),
    )
    return anchor_text_stats(extract_anchors(pages)).orderBy("dst_url")


def q_extract_pdf_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 parity, oracle-checked end-to-end: every document is wrapped as a
    minimal uncompressed PDF (one literal-string Tj text-show op, escapes
    applied in pure Catalyst), routed by magic bytes through the PDF
    branch of the kernel, and must come back byte-exact."""
    docs = _t(spark, sf_dir, "documents")
    esc = F.col("text")
    for find, repl in (("\\", "\\\\"), ("(", "\\("), (")", "\\)")):
        esc = F.replace(esc, F.lit(find), F.lit(repl))
    pages = docs.select(
        F.concat(F.lit("https://docs.example.com/pdf/"), F.col("doc_id")).alias(
            "url"
        ),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("%PDF-1.4\nBT\n("),
                F.coalesce(esc, F.lit("")),
                F.lit(") Tj\nET\n%%EOF\n"),
            ),
            "utf-8",
        ).alias("html"),
        F.lit("eng").alias("lang"),
        "doc_id",
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_url_fetch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 parity, oracle-checked end-to-end: every document becomes a
    self-contained RFC 2397 ``data:`` URL (base64 of the boilerplate-
    wrapped page, encoded in pure Catalyst), resolved by the fetch stage
    (sources.fetch_url_payloads — the url2bytes recast,
    /root/reference/ocr_util.go:35-51), extracted, and must round-trip to
    the normalized text."""
    from open_ocr_spark.sources import fetch_url_payloads

    docs = _t(spark, sf_dir, "documents")
    reqs = docs.select(
        F.concat(
            F.lit("data:text/html;base64,"),
            F.base64(
                F.encode(
                    F.concat(
                        F.lit(_WRAP_PREFIX),
                        F.coalesce(F.col("text"), F.lit("")),
                        F.lit(_WRAP_SUFFIX),
                    ),
                    "utf-8",
                )
            ),
        ).alias("url"),
        "doc_id",
    )
    fetched = fetch_url_payloads(reqs).withColumn("lang", F.lit("eng"))
    extracted = extract_stage(
        fetched.filter(F.col("fetch_error").isNull()), passthrough=["doc_id"]
    )
    return (
        extracted.select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_multipart_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 parity, oracle-checked end-to-end: every document is packed into
    a multipart/related request body (JSON part with url/engine + image
    part with the boilerplate-wrapped page — body assembled in pure
    Catalyst concat), parsed by the stdlib-MIME ingestion kernel
    (sources.requests_from_multipart), extracted, and must round-trip to
    the normalized text (/root/reference/ocr_http_multipart_handler.go:26-88)."""
    from open_ocr_spark.sources import requests_from_multipart

    docs = _t(spark, sf_dir, "documents")
    boundary = "graftbnd"
    json_part = F.concat(
        F.lit(f'--{boundary}\r\nContent-Type: application/json\r\n\r\n'
              '{"img_url": "https://docs.example.com/doc/'),
        F.col("doc_id").cast("string"),
        F.lit('", "engine": "tesseract"}\r\n'),
    )
    img_part_head = F.lit(
        f"--{boundary}\r\nContent-Type: image/png\r\n\r\n"
    )
    body = F.concat(
        F.encode(F.concat(json_part, img_part_head), "utf-8"),
        F.encode(
            F.concat(
                F.lit(_WRAP_PREFIX),
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(_WRAP_SUFFIX),
            ),
            "utf-8",
        ),
        F.encode(F.lit(f"\r\n--{boundary}--\r\n"), "utf-8"),
    )
    reqs = docs.select(
        body.alias("body"),
        F.lit(f'multipart/related; boundary="{boundary}"').alias(
            "content_type"
        ),
    )
    parsed = requests_from_multipart(reqs).withColumn(
        "lang", F.coalesce(F.col("lang"), F.lit("eng"))
    )
    extracted = extract_stage(parsed.filter(F.col("error").isNull()))
    return (
        extracted.select(
            F.regexp_extract(F.col("url"), r"/doc/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            "extracted_text",
            "status",
        )
        .orderBy("doc_id")
    )


def q_extract_pdf_flate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 parity for real-world (compressed) PDFs, oracle-checked: every
    document becomes a PDF whose content stream is zlib-deflated behind
    /Filter /FlateDecode — the form Ghostscript handles for the reference
    (/root/reference/convert-pdf.go:51-62) — and every ODD doc_id
    additionally armors the deflated bytes in ASCII85, declaring the
    [/ASCII85Decode /FlateDecode] FILTER CHAIN, so chain decoding is
    driver-value-checked, not just unit-tested. The wrap uses an
    Arrow-batched pandas UDF (fixture construction only; the measured
    kernel is the unwrap); the kernel decodes with stdlib zlib/base64 and
    must return the text byte-exact."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # annotations set explicitly: `from __future__ import annotations`
    # stringifies hints, which pandas_udf cannot resolve for local names
    def _flate_wrap(ids, texts):
        import base64
        import zlib

        out = []
        for i, t in zip(ids, texts):
            s = (t or "").replace("\\", "\\\\")
            s = s.replace("(", "\\(").replace(")", "\\)")
            body = zlib.compress(("BT\n(" + s + ") Tj\nET\n").encode("utf-8"))
            if int(i) % 2 == 1:
                body = base64.a85encode(body) + b"~>"
                filt = b"[/ASCII85Decode /FlateDecode]"
            else:
                filt = b"/FlateDecode"
            out.append(
                b"%PDF-1.5\n1 0 obj\n<< /Filter " + filt + b" /Length "
                + str(len(body)).encode()
                + b" >>\nstream\n"
                + body
                + b"\nendstream\nendobj\n%%EOF\n"
            )
        return pd.Series(out)

    _flate_wrap.__annotations__ = {
        "ids": pd.Series, "texts": pd.Series, "return": pd.Series
    }
    _flate_wrap = pandas_udf(_flate_wrap, "binary")

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("https://docs.example.com/pdfz/"), F.col("doc_id")).alias(
            "url"
        ),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        _flate_wrap(F.col("doc_id"), F.col("text")).alias("html"),
        F.lit("eng").alias("lang"),
        "doc_id",
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_extract_pdf_cmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 depth for how real-world PDFs actually store text (r5, VERDICT
    r4 item 4): every document becomes a COMPOSITE-FONT PDF whose show
    string carries per-document font codes (assigned by first appearance,
    so a byte-fallback read is mojibake) resolved through an embedded
    ToUnicode CMap — bfchar pairs, array-destination bfrange, an
    incrementing hex bfrange and a multi-code-unit ligature destination
    all on the value path, content stream FlateDecode'd
    (kernels/pdf_text.py render_pdf_cmap, the writer twin). The kernel
    must map codes back to Unicode byte-exactly: text + 'abc<<>>'."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cmap_wrap(texts):
        from open_ocr_spark.kernels.pdf_text import render_pdf_cmap

        return pd.Series([render_pdf_cmap(t or "") for t in texts])

    _cmap_wrap.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    _cmap_wrap = pandas_udf(_cmap_wrap, "binary")

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(
            F.lit("https://docs.example.com/pdfcmap/"), F.col("doc_id")
        ).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        _cmap_wrap(F.col("text")).alias("html"),
        F.lit("eng").alias("lang"),
        "doc_id",
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_extract_pdf_tj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 parity for the text-show forms real PDF generators emit
    (/root/reference/convert-pdf.go:51-62 ingests them via Ghostscript):
    a kerned ``[(..) -120 (..)] TJ`` array (the dominant form in the wild),
    a hex-string ``<...> Tj``, and the ``aw ac (..) \"`` operator. The page
    is assembled in pure Catalyst: the document text is split in half
    BEFORE escaping (so an escape sequence can never straddle the array
    elements), each half becomes one TJ array element, and the kernel must
    concatenate them back byte-exact; line 2 is hex-encoded, line 3 uses
    the quote operator."""
    docs = _t(spark, sf_dir, "documents")
    txt = F.coalesce(F.col("text"), F.lit(""))
    half = (F.length(txt) / 2).cast("int")
    parts = [
        F.substring(txt, 1, half),
        txt.substr(half + 1, F.length(txt)),
    ]
    for j, p in enumerate(parts):
        for find, repl in (("\\", "\\\\"), ("(", "\\("), (")", "\\)")):
            p = F.replace(p, F.lit(find), F.lit(repl))
        parts[j] = p
    hex_line = F.hex(
        F.encode(
            F.concat(F.lit("Doc "), F.col("doc_id").cast("string")), "utf-8"
        )
    )
    pages = docs.select(
        F.concat(F.lit("https://docs.example.com/pdftj/"), F.col("doc_id")).alias(
            "url"
        ),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit("%PDF-1.4\nBT\n[("),
                parts[0],
                F.lit(") -120 ("),
                parts[1],
                F.lit(")] TJ\n<"),
                hex_line,
                F.lit("> Tj\n2 0.5 (END) \"\nET\n%%EOF\n"),
            ),
            "utf-8",
        ).alias("html"),
        F.lit("eng").alias("lang"),
        "doc_id",
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_extract_structured_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11 hOCR-recast parity, oracle-checked: run the kernel in
    structured-output mode (engine_args.config_vars.tessedit_create_hocr,
    tesseract_engine_test.go:50), then PARSE the span JSON back to rows so
    the oracle checks ids/offsets/text as values, not as a JSON string.

    The fixture is RAGGED (VERDICT r2 item 8): doc_id % 3 selects 0, 1 or
    2 appendix paragraphs after the original text, every appendix is
    preceded by a literally-empty ``<p></p>`` (exercising the
    empty-paragraph drop mid-document), and documents with empty text
    exercise the leading-empty edge — so span ids and running offsets are
    stressed unevenly (1–3 spans per doc, shifted starts), not as one
    fixed shape."""
    docs = _t(spark, sf_dir, "documents")
    a1 = F.concat(
        F.lit("Appendix section for document "),
        F.col("doc_id").cast("string"),
        F.lit(" - closing remarks."),
    )
    a2 = F.concat(
        F.lit("Second appendix for document "),
        F.col("doc_id").cast("string"),
        F.lit("."),
    )
    k = F.pmod(F.col("doc_id"), F.lit(3))
    body = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.when(k >= 1, F.concat(F.lit("</p><p></p><p>"), a1)).otherwise(
            F.lit("")
        ),
        F.when(k == 2, F.concat(F.lit("</p><p></p><p>"), a2)).otherwise(
            F.lit("")
        ),
    )
    pages = docs.select(
        F.concat(F.lit("https://docs.example.com/doc/"), F.col("doc_id")).alias(
            "url"
        ),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(
            F.concat(F.lit(_WRAP_PREFIX), body, F.lit(_WRAP_SUFFIX)),
            "utf-8",
        ).alias("html"),
        F.lit("eng").alias("lang"),
        F.col("doc_id"),
    ).withColumn(
        "engine_args_json",
        F.lit('{"config_vars": {"tessedit_create_hocr": "1"}}'),
    )
    extracted = extract_stage(pages, passthrough=["doc_id"])
    return (
        extracted.select(
            "doc_id",
            F.explode(
                F.from_json(
                    F.col("extracted_text"),
                    "struct<spans: array<struct<id:int,start:int,end:int,text:string>>>",
                )["spans"]
            ).alias("span"),
        )
        .select(
            "doc_id",
            F.col("span.id").alias("span_id"),
            F.col("span.start").alias("start"),
            F.col("span.end").alias("end"),
            F.col("span.text").alias("span_text"),
        )
        .orderBy("doc_id", "span_id")
    )


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 train/test split by content-independent hash —
    the split a training pipeline must be able to reproduce on any engine,
    at any parallelism, forever. md5 of the doc id (not xxhash64: that's
    engine-specific) ⇒ the oracle reproduces the exact assignment."""
    docs = _t(spark, sf_dir, "documents").orderBy("doc_id")  # sort-early
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    return docs.select(
        "doc_id",
        F.when(bucket % 10 < 8, F.lit("train")).otherwise(F.lit("test")).alias(
            "split"
        ),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE_NONE (engine-specific RNG): seeded per-language stratified
    sample (`sampleBy`) — the data-mixing primitive; deterministic for a
    fixed seed, so the rows-only check is stable across driver runs."""
    docs = _t(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "es": 0.25, "fr": 0.25, "de": 0.25, "zh": 0.1}
    return docs.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE_NONE: one-to-many frame-sampling plumbing (mapInPandas fans
    each payload out to its deterministic stub frames)."""
    from open_ocr_spark.dataops.multimodal import sample_frames

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return sample_frames(media).select(
        "media_id", "frame_idx", "ts_s", F.octet_length("frame").alias("n_bytes")
    )


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel path, oracle-checked end-to-end (VERDICT r2 item 10):
    each document becomes a 2x2 24-bit BMP whose four pixel values are
    formulas of doc_id (built in an Arrow-batched pandas kernel), resized
    2x by the numpy nearest-neighbor path (strict=True — no stub can
    leak in), and the four CORNERS of the 4x4 output are read back with
    pure-Catalyst byte arithmetic on the BMP layout (54-byte header +
    bottom-up rows, stride 12). Nearest-neighbor 2x replicates each source
    pixel into a 2x2 block, so corner k must equal source pixel k — the
    oracle recomputes the formulas in SQL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from open_ocr_spark.dataops.multimodal import resize_images

    def _bmp_wrap(ids):
        import numpy as np

        from open_ocr_spark.dataops.multimodal import encode_bmp24

        out = []
        for i in ids:
            a = int(i) % 251
            b = (int(i) * 3 + 7) % 251
            c = (int(i) * 5 + 11) % 251
            d = (int(i) * 7 + 13) % 251
            arr = np.array(
                [[[a] * 3, [b] * 3], [[c] * 3, [d] * 3]], dtype=np.uint8
            )
            out.append(encode_bmp24(arr))
        return pd.Series(out)

    _bmp_wrap.__annotations__ = {"ids": pd.Series, "return": pd.Series}
    _bmp_wrap = pandas_udf(_bmp_wrap, "binary")

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), _bmp_wrap(F.col("doc_id")).alias("payload")
    )
    resized = resize_images(media, 4, 4, strict=True)

    def px(pos_1based: int):
        # one channel of a pixel as an int (all three are equal by design)
        return F.conv(
            F.hex(F.substring(F.col("payload"), pos_1based, 1)), 16, 10
        ).cast("int")

    # output rows are bottom-up: file row r = image row (3 - r), stride 12
    return resized.select(
        F.col("media_id").alias("doc_id"),
        F.col("n_bytes"),
        px(55 + 3 * 12).alias("p00"),       # image (0,0)  <- src a
        px(55 + 3 * 12 + 3 * 3).alias("p01"),  # image (0,3) <- src b
        px(55).alias("p10"),                # image (3,0)  <- src c
        px(55 + 3 * 3).alias("p11"),        # image (3,3)  <- src d
    ).orderBy("doc_id")


def q_media_resize_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG codec (dataops PNG decode + encode) through the driver gate:
    each document becomes a 2x2 truecolor PNG whose pixels are formulas of
    doc_id, resized 2x by the real pixel path (strict=True), and the
    resized payload — itself a PNG — is decoded back in a second Arrow
    kernel to read the four corners. PNG is lossless, so the oracle's SQL
    formulas must match exactly; a bug in EITHER the encoder or the
    decoder (filter handling, chunk layout, palette, CRC offsets) breaks
    the hash."""
    import pandas as pd

    from open_ocr_spark.dataops.multimodal import resize_images

    def _png_wrap(batches):
        import numpy as np

        from open_ocr_spark.dataops.multimodal import encode_png

        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                a, b = i % 241, (i * 11 + 3) % 241
                c, d = (i * 13 + 29) % 241, (i * 17 + 31) % 241
                arr = np.array(
                    [[[a] * 3, [b] * 3], [[c] * 3, [d] * 3]], dtype=np.uint8
                )
                out.append((i, bytearray(encode_png(arr))))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(_png_wrap, "media_id long, payload binary")
    resized = resize_images(media, 4, 4, strict=True)

    def _corners(batches):
        from open_ocr_spark.dataops.multimodal import decode_pixels

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_pixels(bytes(payload))
                out.append(
                    (
                        int(mid), int(arr[0, 0, 0]), int(arr[0, 3, 0]),
                        int(arr[3, 0, 0]), int(arr[3, 3, 0]),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "p00", "p01", "p10", "p11"]
            )

    return resized.mapInPandas(
        _corners, "doc_id long, p00 int, p01 int, p10 int, p11 int"
    ).orderBy("doc_id")


def q_media_resize_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG codec (dataops/jpeg.py) through the driver gate: each
    document becomes an 8x16 grayscale JPEG of two flat 8x8 blocks whose
    gray levels are formulas of doc_id, resized to 8x8 by the real pixel
    path (strict=True; decode -> nearest-neighbor -> re-encode as JPEG),
    and the resized JPEG is decoded back to read one pixel per source
    block. With all-ones quant tables, flat gray blocks survive BOTH
    encode/decode round trips exactly (DC is the only nonzero
    coefficient and it is integer), so the oracle is exact equality —
    any drift in the huffman tables, DCT basis, colorspace constants or
    marker layout breaks the hash."""
    import pandas as pd

    from open_ocr_spark.dataops.multimodal import resize_images

    def _jpeg_wrap(batches):
        import numpy as np

        from open_ocr_spark.dataops.jpeg import encode_jpeg

        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                a, b = (i * 2 + 5) % 250, (i * 9 + 40) % 250
                arr = np.empty((8, 16, 3), dtype=np.uint8)
                arr[:, :8] = a
                arr[:, 8:] = b
                out.append((i, bytearray(encode_jpeg(arr, grayscale=True))))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(_jpeg_wrap, "media_id long, payload binary")
    resized = resize_images(media, 8, 8, strict=True)

    def _pixels(batches):
        from open_ocr_spark.dataops.jpeg import decode_jpeg

        for pdf in batches:
            out = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                arr = decode_jpeg(bytes(payload))
                out.append(
                    (
                        int(mid), int(w), int(h),
                        int(arr[0, 0, 0]), int(arr[7, 7, 0]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "p_left", "p_right"],
            )

    return resized.mapInPandas(
        _pixels,
        "doc_id long, width int, height int, p_left int, p_right int",
    ).orderBy("doc_id")


def q_media_resize_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive (SOF2) JPEG through the driver gate, two checks in one
    plan.  (1) Exact pixel path: each document becomes an 8x16 grayscale
    PROGRESSIVE JPEG (DC-first/DC-refine + two spectral AC bands with
    successive approximation) of two flat 8x8 blocks with doc_id-formula
    gray levels, resized to 8x8 by the real path (progressive decode ->
    nearest-neighbor -> baseline re-encode -> decode): flat blocks
    survive both roundtrips exactly, so p_left/p_right are closed-form.
    (2) AC-machinery equivalence: a doc_id-seeded NON-flat 16x16 image is
    encoded both baseline and progressive in the kernel and
    ``ac_agree=1`` records that both decodes are byte-identical — this is
    the invariant the progressive scan assembly must satisfy (the
    baseline path is itself pinned by media_resize_jpeg's oracle), and it
    exercises EOB runs, ZRL-in-refinement and correction bits on real
    coefficient data inside the driver-checked query."""
    import pandas as pd

    from open_ocr_spark.dataops.multimodal import resize_images

    def _jpeg_wrap(batches):
        import numpy as np

        from open_ocr_spark.dataops.jpeg import encode_jpeg_progressive

        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                a, b = (i * 3 + 11) % 250, (i * 7 + 60) % 250
                arr = np.empty((8, 16, 3), dtype=np.uint8)
                arr[:, :8] = a
                arr[:, 8:] = b
                out.append(
                    (i, bytearray(encode_jpeg_progressive(arr,
                                                          grayscale=True)))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(_jpeg_wrap, "media_id long, payload binary")
    resized = resize_images(media, 8, 8, strict=True)

    def _pixels(batches):
        import numpy as np

        from open_ocr_spark.dataops.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        for pdf in batches:
            out = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                arr = decode_jpeg(bytes(payload))
                mid = int(mid)
                # doc-seeded non-flat content: every AC scan type fires
                rich = (
                    (np.arange(16)[:, None] * 31 + np.arange(16) * 17
                     + mid * 13) % 256
                ).astype(np.uint8)[:, :, None].repeat(3, axis=2)
                base = decode_jpeg(encode_jpeg(rich, grayscale=True))
                prog = decode_jpeg(
                    encode_jpeg_progressive(rich, grayscale=True)
                )
                out.append(
                    (
                        mid, int(w), int(h),
                        int(arr[0, 0, 0]), int(arr[7, 7, 0]),
                        int(np.array_equal(base, prog)),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "p_left", "p_right",
                         "ac_agree"],
            )

    return resized.mapInPandas(
        _pixels,
        "doc_id long, width int, height int, p_left int, p_right int, "
        "ac_agree int",
    ).orderBy("doc_id")


def q_media_resize_jpeg_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic-coded (SOF9, QM entropy — dataops/jpeg_arith.py) JPEG
    through the driver gate, mirroring the progressive query's two
    checks.  (1) Exact pixel path: each document becomes an 8x16
    grayscale ARITHMETIC JPEG of two flat blocks with doc_id-formula
    gray levels, resized to 8x8 by the real path (QM decode →
    nearest-neighbor → baseline re-encode → decode): flat blocks survive
    exactly, so p_left/p_right are closed-form.  (2) Entropy-layer
    equivalence on real coefficient data: a doc_id-seeded non-flat
    16x16 image encoded both huffman-baseline and arithmetic must decode
    byte-identically (``arith_agree=1``) — DC conditioning contexts, the
    AC decision tree and the QM state machine all fire inside the
    driver-checked query."""
    import pandas as pd

    from open_ocr_spark.dataops.multimodal import resize_images

    def _jpeg_wrap(batches):
        import numpy as np

        from open_ocr_spark.dataops.jpeg_arith import encode_jpeg_arith

        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                a, b = (i * 5 + 23) % 250, (i * 11 + 42) % 250
                arr = np.empty((8, 16, 3), dtype=np.uint8)
                arr[:, :8] = a
                arr[:, 8:] = b
                out.append(
                    (i, bytearray(encode_jpeg_arith(arr, grayscale=True)))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(_jpeg_wrap, "media_id long, payload binary")
    resized = resize_images(media, 8, 8, strict=True)

    def _pixels(batches):
        import numpy as np

        from open_ocr_spark.dataops.jpeg import decode_jpeg, encode_jpeg
        from open_ocr_spark.dataops.jpeg_arith import encode_jpeg_arith

        for pdf in batches:
            out = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                arr = decode_jpeg(bytes(payload))
                mid = int(mid)
                rich = (
                    (np.arange(16)[:, None] * 29 + np.arange(16) * 13
                     + mid * 7) % 256
                ).astype(np.uint8)[:, :, None].repeat(3, axis=2)
                base = decode_jpeg(encode_jpeg(rich, grayscale=True))
                arith = decode_jpeg(encode_jpeg_arith(rich, grayscale=True))
                out.append(
                    (
                        mid, int(w), int(h),
                        int(arr[0, 0, 0]), int(arr[7, 7, 0]),
                        int(np.array_equal(base, arith)),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "p_left", "p_right",
                         "arith_agree"],
            )

    return resized.mapInPandas(
        _pixels,
        "doc_id long, width int, height int, p_left int, p_right int, "
        "arith_agree int",
    ).orderBy("doc_id")


def q_media_frame_sample_mp4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-BMFF demux (dataops/mp4.py) through the driver gate: each
    document becomes a real MP4 with 1 + doc_id%4 one-second video
    samples whose bytes are doc_id-formulas, and sample_frames
    (strict=True — the REAL container path, no stub) must emit every
    sample byte-exactly with its true timestamp. A wrong stsz/stco/stsc
    interpretation, a broken tick->sample mapping or a bad mdat offset
    changes first_byte/frame_len/ts_s and breaks the hash."""
    import pandas as pd

    from open_ocr_spark.dataops.multimodal import sample_frames

    def _mp4_wrap(batches):
        from open_ocr_spark.dataops.mp4 import mux_mp4

        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = 1 + i % 4
                samples = [
                    bytes([(i * 7 + k * 3) % 256]) * (1 + (i + k) % 5)
                    for k in range(n)
                ]
                out.append(
                    (i, bytearray(mux_mp4(samples, 64, 48, timescale=600,
                                          sample_delta=600)))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(_mp4_wrap, "media_id long, payload binary")
    frames = sample_frames(media, fps=1.0, strict=True)
    return frames.select(
        F.col("media_id").alias("doc_id"),
        F.col("frame_idx"),
        F.col("ts_s"),
        F.conv(F.hex(F.substring(F.col("frame"), 1, 1)), 16, 10)
        .cast("int").alias("first_byte"),
        F.octet_length("frame").cast("long").alias("frame_len"),
    ).orderBy("doc_id", "frame_idx")


def q_media_resize_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF codec (dataops/gif.py) through the driver gate, hitting every
    decoder feature the format throws at a crawler in ONE oracle-checked
    plan: each document becomes a 4x4 INTERLACED GIF89a (rows stored in
    4-pass order), 32-entry palette, a graphic-control extension marking
    index 16 transparent, and a transparent pixel at display (1,1) that
    must resolve to the background-index color.  The real pixel path
    (strict=True) decodes it, 2x-downsamples (sampling display pixels
    (1,1),(1,3),(3,1),(3,3)), re-encodes as GIF (exact re-palettization),
    and a second kernel decodes THAT to read the four survivors.  A wrong
    LZW width bump, interlace row map, transparency/bg rule or palette
    write breaks the hash."""
    import pandas as pd

    from open_ocr_spark.dataops.multimodal import resize_images

    def _gif_wrap(batches):
        import struct

        from open_ocr_spark.dataops.gif import lzw_encode

        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                # palette: 16 pixel grays + transparent slot + bg gray
                pal = bytearray()
                for k in range(16):
                    v = (i * 3 + k * 7 + 10) % 239
                    pal += bytes((v, v, v))
                pal += b"\x00\x00\x00"  # 16: transparent (color unused)
                bg = (i * 29 + 31) % 239
                pal += bytes((bg, bg, bg))  # 17: background
                pal += b"\x00" * (3 * (32 - 18))
                # display indices: pixel (r,c) -> 4r+c, except (1,1)
                # carries the transparent index; stored INTERLACED
                disp = [[r * 4 + c for c in range(4)] for r in range(4)]
                disp[1][1] = 16
                stored = [disp[r] for r in (0, 2, 1, 3)]  # pass order, h=4
                idx = [p for row in stored for p in row]
                lzw = lzw_encode(idx, 5)
                gif = (
                    b"GIF89a"
                    + struct.pack("<HHBBB", 4, 4, 0x80 | 0x04, 17, 0)
                    + bytes(pal)
                    + b"\x21\xf9\x04\x01\x00\x00\x10\x00"  # GCE: transp=16
                    + b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0x40)
                    + b"\x05" + bytes([len(lzw)]) + lzw + b"\x00"
                    + b"\x3b"
                )
                out.append((i, bytearray(gif)))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(_gif_wrap, "media_id long, payload binary")
    resized = resize_images(media, 2, 2, strict=True)

    def _corners(batches):
        from open_ocr_spark.dataops.multimodal import decode_pixels

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = decode_pixels(bytes(payload))
                out.append(
                    (
                        int(mid), int(arr[0, 0, 0]), int(arr[0, 1, 0]),
                        int(arr[1, 0, 0]), int(arr[1, 1, 0]),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "p00", "p01", "p10", "p11"]
            )

    return resized.mapInPandas(
        _corners, "doc_id long, p00 int, p01 int, p10 int, p11 int"
    ).orderBy("doc_id")


def q_media_frame_sample_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first FULLY real video path — container demux AND pixel
    decode, no stub at any stage: each document becomes an MJPEG AVI
    (dataops/avi.py) of 1 + doc_id%3 flat-gray 8x8 baseline-JPEG frames
    at 2 fps, sample_frames (strict=True) must emit each frame's exact
    JPEG bytes at its true tick, and a second kernel decodes those bytes
    with the repo's own JPEG decoder (dataops/jpeg.py) to read the gray
    level back.  Flat blocks with all-ones quant tables survive the
    codec exactly, so the oracle is closed-form in doc_id — a RIFF walk
    bug, a dwRate/dwScale mix-up, a tick->frame off-by-one or any JPEG
    regression breaks the hash."""
    import pandas as pd

    from open_ocr_spark.dataops.multimodal import sample_frames

    def _avi_wrap(batches):
        import numpy as np

        from open_ocr_spark.dataops.avi import build_avi
        from open_ocr_spark.dataops.jpeg import encode_jpeg

        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = 1 + i % 3
                frames = [
                    encode_jpeg(
                        np.full((8, 8, 3), (i * 2 + k * 9 + 5) % 250,
                                np.uint8),
                        grayscale=True,
                    )
                    for k in range(n)
                ]
                out.append((i, bytearray(build_avi(frames, 8, 8, fps=2.0))))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(_avi_wrap, "media_id long, payload binary")
    # sampling at the source rate: every frame exactly once, ts = k/2
    frames = sample_frames(media, fps=2.0, strict=True)

    def _gray(batches):
        from open_ocr_spark.dataops.jpeg import decode_jpeg

        for pdf in batches:
            out = []
            for mid, k, ts, frame in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["ts_s"], pdf["frame"]
            ):
                arr = decode_jpeg(bytes(frame))
                out.append(
                    (int(mid), int(k), float(ts), int(arr[0, 0, 0]),
                     int(arr[7, 7, 0]))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "ts_s", "gray", "gray2"]
            )

    return frames.mapInPandas(
        _gray,
        "doc_id long, frame_idx int, ts_s double, gray int, gray2 int",
    ).orderBy("doc_id", "frame_idx")


def q_media_frame_sample_webm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EBML/Matroska demux (dataops/ebml.py) through the driver gate:
    each document becomes a real webm — EBML header, Info with a 1 ms
    TimestampScale and float Duration, a VP9-tagged video TrackEntry,
    one Cluster per frame — carrying 1 + doc_id%3 codec samples whose
    bytes are doc_id-formulas, and sample_frames (strict=True — the
    REAL container path, no stub) must emit every sample byte-exactly
    with its true cluster timestamp.  A vint-width bug, a wrong
    TimestampScale application, a missed Cluster boundary or a
    SimpleBlock-header miscount changes first_byte/frame_len/ts_s and
    breaks the hash."""
    import pandas as pd

    from open_ocr_spark.dataops.multimodal import sample_frames

    def _webm_wrap(batches):
        from open_ocr_spark.dataops.ebml import build_webm

        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = 1 + i % 3
                frames = [
                    bytes([(i * 5 + k * 11 + 3) % 256])
                    * (1 + (i + 2 * k) % 7)
                    for k in range(n)
                ]
                out.append(
                    (i, bytearray(build_webm(frames, 64, 48, fps=2.0)))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(_webm_wrap, "media_id long, payload binary")
    # sampling at the source rate: every block exactly once, ts = k/2
    frames = sample_frames(media, fps=2.0, strict=True)
    return frames.select(
        F.col("media_id").alias("doc_id"),
        F.col("frame_idx"),
        F.col("ts_s"),
        F.conv(F.hex(F.substring(F.col("frame"), 1, 1)), 16, 10)
        .cast("int").alias("first_byte"),
        F.octet_length("frame").cast("long").alias("frame_len"),
    ).orderBy("doc_id", "frame_idx")


def q_audio_stats_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PCM decode (decode_wav) through the driver gate: each document
    becomes a mono 16-bit WAV of 4 + doc_id%5 formula samples and
    audio_stats (strict=True — real decode only) must reproduce the exact
    integer reductions. The oracle recomputes frame count, first sample,
    peak and total absolute amplitude from the same formulas with a
    range join + aggregation — a byte-order, channel-shape or chunk-walk
    bug changes the integers."""
    import pandas as pd

    from open_ocr_spark.dataops.multimodal import audio_stats

    def _wav_wrap(batches):
        import numpy as np

        from open_ocr_spark.dataops.multimodal import encode_wav

        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                n = 4 + i % 5
                samples = np.array(
                    [(i * 13 + k * 57) % 201 - 100 for k in range(n)],
                    dtype=np.int16,
                )
                out.append((i, bytearray(encode_wav(samples, 8000))))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.mapInPandas(_wav_wrap, "media_id long, payload binary")
    return (
        audio_stats(media, strict=True)
        .withColumnRenamed("media_id", "doc_id")
        .orderBy("doc_id")
    )


def q_engine_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12/A13 parity, oracle-checked: a per-row `engine` column routes
    each document through the kernel dispatch — every 10th doc uses the
    mock engine (the reference's verbatim constant, mock_engine.go:3-10),
    the rest the real extractor. The oracle reproduces both branches in
    SQL, so the dispatch itself is value-checked by the driver."""
    pages = pages_from_documents(spark, sf_dir).withColumn(
        "engine",
        F.when(F.col("doc_id") % 10 == 0, F.lit("mock")).otherwise(
            F.lit("tesseract")
        ),
    )
    return (
        extract_stage(pages, passthrough=["doc_id"])
        .select("doc_id", "extracted_text", "status")
        .orderBy("doc_id")
    )


def q_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (dataops/asof.py): each event gets the most recent order
    of the same user at-or-before the event time — union + one running
    window, no range cross product. Right side pre-deduped on (key, ts)
    as the operator (and DuckDB's ASOF) requires."""
    from open_ocr_spark.dataops.asof import asof_join

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ots"),
            "o_orderkey",
        )
    )
    joined = asof_join(
        e, o, on="user_id", left_ts="ts", right_ts="ots",
        value_cols=["o_orderkey"],
    )
    return joined.select(
        "event_id", "user_id", F.col("o_orderkey").alias("last_order_key")
    ).orderBy("event_id")


def q_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: highest-value 3 orders per customer via a
    partitioned row_number window (one shuffle, per-partition sort;
    unlike global top-k this never funnels to one task)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey", "rk", "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
        )
        .orderBy("o_custkey", "rk")
    )


# ---------------------------------------------------------------------------
# Registry + oracles
# ---------------------------------------------------------------------------

# Registry ORDER is load-bearing: the driver records CORRECTNESS rows for
# exactly the first DRIVER_WINDOW entries in insertion order.  Policy
# (enforced by tools/check_contract.py --window): a query may sit past the
# window only if it already has a recorded green in a prior round's
# CORRECTNESS_r*.json.  Round 4 leads with the 5 new queries and the 3
# ANN queries that just gained full oracles, then rotates through every
# query whose last driver row predates the r3/r4 code changes (VERDICT r3
# item 3), then the r3-green queries whose code paths r4 touched; only
# r3-green queries with r4-untouched code sit past the window.
DRIVER_WINDOW = 50

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- r5-new: never driver-checked, must sit inside the window -------
    "extract_pdf_cmap": q_extract_pdf_cmap,
    "classifier_train": q_classifier_train,
    "wet_roundtrip": q_wet_roundtrip,
    "wat_metadata": q_wat_metadata,
    "frontier_polite": q_frontier_polite,
    # -- made stale by the r5 frontier_polite commit (frontier.py dep)
    "frontier_schedule": q_frontier_schedule,
    # -- r4 window-overflow diagnostics (VERDICT r4 item 1): never
    # -- driver-checked; the OVERFLOW_OK_r4 exemption expires when
    # -- CORRECTNESS_r05.json lands, so these four lead the rotation
    "top_bigrams": q_top_bigrams,
    "key_skew_gini": q_key_skew_gini,
    "readability_scores": q_readability_scores,
    "bloom_prune_stats": q_bloom_prune_stats,
    # -- made stale by the r5 CMap/perceptron commit itself (pdf_text.py
    # -- and classifier.py are deps of these four r3/r4-green queries)
    "extract_pdf_flate": q_extract_pdf_flate,
    "extract_pdf_tj": q_extract_pdf_tj,
    "extract_pdf_text": q_extract_pdf_text,
    "quality_classifier": q_quality_classifier,
    # -- stale greens (VERDICT r4 item 3): newest driver row predates a
    # -- code change to a dep module, in check_contract rotation order
    "media_features": q_media_features,
    "binary_payload_stats": q_binary_payload_stats,
    "warc_roundtrip": q_warc_roundtrip,
    "url_fetch_roundtrip": q_url_fetch_roundtrip,
    "repetition_stats": q_repetition_stats,
    "pii_scrub": q_pii_scrub,
    "multipart_roundtrip": q_multipart_roundtrip,
    "canonical_url_dedup": q_canonical_url_dedup,
    "bpe_token_counts": q_bpe_token_counts,
    "temperature_sample": q_temperature_sample,
    "host_pagerank": q_host_pagerank,
    "host_link_graph": q_host_link_graph,
    "pack_training_sequences": q_pack_training_sequences,
    "media_resize_png": q_media_resize_png,
    "media_resize_jpeg": q_media_resize_jpeg,
    "media_resize": q_media_resize,
    "media_frame_sample_mp4": q_media_frame_sample_mp4,
    "media_frame_sample": q_media_frame_sample,
    "audio_stats_wav": q_audio_stats_wav,
    "semantic_dedup": q_semantic_dedup,
    "kmeans_clusters": q_kmeans_clusters,
    "json_ld": q_json_ld,
    "html_meta": q_html_meta,
    "extract_glyph_ocr": q_extract_glyph_ocr,
    # -- oldest surviving greens (r2 vintage): refresh while slots allow
    "agg_pricing_summary": q_agg_pricing_summary,
    "anti_join_resume": q_anti_join_resume,
    "base64_roundtrip": q_base64_roundtrip,
    "cube_source_lang": q_cube_source_lang,
    "daily_event_stats": q_daily_event_stats,
    "distinct_counts": q_distinct_counts,
    "doc_fingerprints": q_doc_fingerprints,
    "embedding_topk": q_embedding_topk,
    "fact_fact_join_revenue": q_fact_fact_join_revenue,
    "full_outer_user_activity": q_full_outer_user_activity,
    "grouping_sets_docs": q_grouping_sets_docs,
    "intersect_user_ids": q_intersect_user_ids,
    "join_region_nation_customer": q_join_region_nation_customer,
    "join_top_customers": q_join_top_customers,
    "lang_id": q_lang_id,
    "orders_above_avg": q_orders_above_avg,
    # -- past the window (83): fresh r3/r4 greens whose deps are
    # -- unchanged since their newest driver row, in prior order
    "minhash_lsh_pairs_md5": q_minhash_lsh_pairs_md5,
    "simhash_fingerprints_md5": q_simhash_fingerprints_md5,
    "media_resize_jpeg_progressive": q_media_resize_jpeg_progressive,
    "media_resize_gif": q_media_resize_gif,
    "media_frame_sample_avi": q_media_frame_sample_avi,
    "media_frame_sample_webm": q_media_frame_sample_webm,
    "substring_dedup": q_substring_dedup,
    "host_quota_sample": q_host_quota_sample,
    "crawl_delta": q_crawl_delta,
    "ngram_fluency": q_ngram_fluency,
    "robots_gate": q_robots_gate,
    "chunk_documents": q_chunk_documents,
    "sitemap_discovery": q_sitemap_discovery,
    "unicode_nfc": q_unicode_nfc,
    "media_resize_jpeg_arith": q_media_resize_jpeg_arith,
    "pack_multimodal": q_pack_multimodal,
    "feed_discovery": q_feed_discovery,
    "extract_docx_text": q_extract_docx_text,
    "extract_odt_text": q_extract_odt_text,
    "extract_rtf_text": q_extract_rtf_text,
    "gopher_gate": q_gopher_gate,
    "c4_line_clean": q_c4_line_clean,
    "anchor_text_stats": q_anchor_text_stats,
    "stratified_sample_md5": q_stratified_sample_md5,
    "mime_sniff": q_mime_sniff,
    "bpe_train": q_bpe_train,
    "bpe_encode_docs": q_bpe_encode_docs,
    "bm25_search": q_bm25_search,
    "image_dhash_dedup": q_image_dhash_dedup,
    "extract_pptx_text": q_extract_pptx_text,
    "html_tables": q_html_tables,
    "hll_distinct_md5": q_hll_distinct_md5,
    "char_entropy": q_char_entropy,
    "extract_xlsx_text": q_extract_xlsx_text,
    "extract_epub_text": q_extract_epub_text,
    "phrase_gate": q_phrase_gate,
    "robots_meta": q_robots_meta,
    "warc_http": q_warc_http,
    "cdx_index": q_cdx_index,
    "lang_id_fixture": q_lang_id_fixture,
    "embedding_lsh_topk": q_embedding_lsh_topk,
    "embedding_ivf_topk": q_embedding_ivf_topk,
    "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
    "quality_scores": q_quality_scores,
    "token_counts": q_token_counts,
    "pivot_order_status": q_pivot_order_status,
    "percentile_order_value": q_percentile_order_value,
    "scan_filter_project": q_scan_filter_project,
    "window_latest_event_per_user": q_window_latest_event_per_user,
    "window_running_revenue": q_window_running_revenue,
    "semi_join_events": q_semi_join_events,
    "set_except_sources": q_set_except_sources,
    "union_lang_totals": q_union_lang_totals,
    "top_unshipped_orders": q_top_unshipped_orders,
    "window_event_gaps": q_window_event_gaps,
    "embedding_near_dup": q_embedding_near_dup,
    "extract_main_text": q_extract_main_text,
    "extract_status_rollup": q_extract_status_rollup,
    "extract_structured_spans": q_extract_structured_spans,
    "exact_dedup_groups": q_exact_dedup_groups,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "dedup_clusters": q_dedup_clusters,
    "prepare_corpus_full": q_prepare_corpus_full,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "simhash_fingerprints": q_simhash_fingerprints,
    "engine_dispatch": q_engine_dispatch,
    "asof_last_order": q_asof_last_order,
    "topk_orders_per_customer": q_topk_orders_per_customer,
    "session_window_stats": q_session_window_stats,
    "line_dedup_docs": q_line_dedup_docs,
    "decontaminate_docs": q_decontaminate_docs,
    "ntile_order_quartiles": q_ntile_order_quartiles,
    "range_join_event_pairs": q_range_join_event_pairs,
    "stats_corr_revenue": q_stats_corr_revenue,
    "train_test_split": q_train_test_split,
    "stratified_sample": q_stratified_sample,
    "rollup_source_lang": q_rollup_source_lang,
    "salted_host_counts": q_salted_host_counts,
    "approx_distinct_users": q_approx_distinct_users,
    "sessionize_events": q_sessionize_events,
    "host_doc_counts": q_host_doc_counts,
    "prepare_corpus": q_prepare_corpus,
}

# DuckDB oracles. Omitted keys = rows-only check (kernel / hash-seeded ops).
ORACLES: dict[str, str] = {
    "extract_main_text": """
        SELECT doc_id,
               trim(regexp_replace(coalesce(text, ''), '[ \t\n\r]+', ' ', 'g'))
                   AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "extract_status_rollup": """
        SELECT 'ok' AS status,
               count(*) AS docs,
               CAST(sum(length(trim(regexp_replace(coalesce(text, ''),
                   '[ \t\n\r]+', ' ', 'g')))) AS BIGINT) AS total_chars
        FROM documents
    """,
    "scan_filter_project": """
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 4) AS net_price
        FROM lineitem
        WHERE l_quantity > 45 AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber
    """,
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "join_top_customers": """
        SELECT c_custkey, c_name,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 10
    """,
    "join_region_nation_customer": """
        SELECT r_name AS region_name,
               count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY region_name
    """,
    "window_latest_event_per_user": """
        SELECT user_id, event_id, event_type, round(value, 4) AS value
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
        ORDER BY user_id
    """,
    "window_running_revenue": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_total
        FROM orders
        ORDER BY o_custkey, o_orderkey
    """,
    "anti_join_resume": """
        SELECT doc_id, lang, source
        FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
        ORDER BY doc_id
    """,
    "semi_join_events": """
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
        ORDER BY c_custkey
    """,
    "rollup_source_lang": """
        SELECT source, lang, count(*) AS docs,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents
        GROUP BY ROLLUP (source, lang)
        ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST
    """,
    "distinct_counts": """
        SELECT count(DISTINCT user_id) AS n_users,
               count(DISTINCT event_type) AS n_event_types,
               count(*) AS n_events
        FROM events
    """,
    "daily_event_stats": """
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
               count(*) AS n,
               round(sum(value), 4) AS sum_value,
               round(min(value), 4) AS min_value,
               round(max(value), 4) AS max_value
        FROM events
        GROUP BY day, event_type
        ORDER BY day, event_type
    """,
    "set_except_sources": """
        SELECT source FROM documents
        EXCEPT
        SELECT source FROM documents WHERE n_chars >= 200
        ORDER BY source
    """,
    "union_lang_totals": """
        SELECT lang, bucket, count(*) AS docs FROM (
            SELECT lang, 'small' AS bucket FROM documents WHERE n_chars < 200
            UNION ALL
            SELECT lang, 'large' AS bucket FROM documents WHERE n_chars >= 200
        )
        GROUP BY lang, bucket
        ORDER BY lang, bucket
    """,
    "fact_fact_join_revenue": """
        SELECT o_orderstatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    "top_unshipped_orders": """
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "salted_host_counts": """
        SELECT source || '.example.com' AS host,
               count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents
        GROUP BY host
        ORDER BY host
    """,
    "sessionize_events": """
        WITH gaps AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ), sess AS (
            SELECT *, CAST(sum(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                AS session_id
            FROM gaps
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value,
               CAST(floor(min(epoch(ts))) AS BIGINT) AS start_epoch,
               CAST(floor(max(epoch(ts))) AS BIGINT) AS end_epoch
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "session_window_stats": """
        WITH gaps AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
        ), sess AS (
            SELECT *, sum(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS session_id
            FROM gaps
        )
        SELECT user_id,
               CAST(floor(min(epoch(ts))) AS BIGINT) AS start_epoch,
               CAST(floor(max(epoch(ts))) AS BIGINT) + 1800 AS close_epoch,
               count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM sess
        GROUP BY user_id, session_id
        ORDER BY user_id, start_epoch
    """,
    "cube_source_lang": """
        SELECT source, lang, count(*) AS docs
        FROM documents
        GROUP BY CUBE (source, lang)
        ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST
    """,
    "intersect_user_ids": """
        SELECT user_id AS id FROM events
        INTERSECT
        SELECT c_custkey AS id FROM customer
        ORDER BY id
    """,
    "window_event_gaps": """
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) - floor(epoch(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC)))
                   AS BIGINT) AS gap_seconds
        FROM events
        ORDER BY user_id, event_id
    """,
    "host_doc_counts": """
        SELECT source || '.example.com' AS host,
               count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents
        GROUP BY host
        ORDER BY host
    """,
    "base64_roundtrip": """
        SELECT doc_id, text AS roundtrip_text, TRUE AS matches
        FROM documents
        ORDER BY doc_id
    """,
    "exact_dedup_groups": """
        SELECT md5(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))
                   AS content_hash,
               min(doc_id) AS keep_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY content_hash
        ORDER BY content_hash
    """,
    "ngram_jaccard_pairs": """
        WITH toks AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')), ' ')
                       AS t
            FROM documents
        ),
        idx AS (
            SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
            FROM toks WHERE len(t) >= 3
        ),
        shingles AS (
            SELECT DISTINCT doc_id,
                   t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
            FROM idx
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM shingles a JOIN shingles b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               round(n_inter / (sa.n + sb.n - n_inter), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.8
        ORDER BY doc_a, doc_b
    """,
    "embedding_near_dup": """
        WITH base AS (
            SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        ),
        pert AS (
            SELECT vec_id + 100000 AS vec_id,
                   list_prepend(CAST(CAST(e[1] + 0.05 AS FLOAT) AS DOUBLE),
                                e[2:]) AS e
            FROM base WHERE vec_id % 10 = 0
        ),
        corpus AS (
            SELECT * FROM base UNION ALL SELECT * FROM pert
        ),
        pairs AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_dot_product(a.e, b.e)
                         / (sqrt(list_dot_product(a.e, a.e))
                            * sqrt(list_dot_product(b.e, b.e))), 4) AS cos_sim
            FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.e, a.e) > 0
              AND list_dot_product(b.e, b.e) > 0
        )
        SELECT vec_a, vec_b, cos_sim FROM pairs
        WHERE cos_sim >= 0.99
        ORDER BY vec_a, vec_b
    """,
    "dedup_clusters": """
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')), ' ')
                       AS t
            FROM documents
        ),
        idx AS (
            SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
            FROM toks WHERE len(t) >= 3
        ),
        shingles AS (
            SELECT DISTINCT doc_id,
                   t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
            FROM idx
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM shingles a JOIN shingles b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
            SELECT doc_a, doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.8
        ),
        edges AS (
            SELECT doc_a AS x, doc_b AS y FROM pairs
            UNION
            SELECT doc_b AS x, doc_a AS y FROM pairs
        ),
        reach(id, lab) AS (
            SELECT x, x FROM edges
            UNION
            SELECT e.x, r.lab FROM edges e JOIN reach r ON r.id = e.y
        ),
        comp AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id)
        SELECT d.doc_id,
               CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        ORDER BY d.doc_id
    """,
    "token_counts": """
        SELECT doc_id,
               CASE WHEN length(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'))) = 0
                    THEN 0
                    ELSE len(string_split(
                        trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')), ' '))
               END AS n_tokens
        FROM documents
        ORDER BY doc_id
    """,
    "prepare_corpus": """
        WITH base AS (
            SELECT doc_id, text,
                   trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) AS nt
            FROM documents
        ),
        dedup AS (
            SELECT min(doc_id) AS doc_id FROM base GROUP BY nt
        ),
        kept AS (
            SELECT b.doc_id, b.text, b.nt FROM base b JOIN dedup USING (doc_id)
        ),
        q AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   CASE WHEN length(nt) = 0 THEN 0
                        ELSE len(string_split(nt, ' ')) END AS n_tokens,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
            FROM kept
        ),
        scored AS (
            SELECT doc_id, n_tokens,
                   floor((least(1.0, n_tokens / 100.0) * 0.5
                          + (CASE WHEN n_chars > 0 THEN n_alpha / n_chars
                                  ELSE 0.0 END) * 0.3
                          + least(1.0, (CASE WHEN n_tokens > 0
                                        THEN (n_chars - (n_tokens - 1)) / n_tokens
                                        ELSE 0.0 END) / 8.0) * 0.2)
                         * 10000.0 + 0.5) / 10000.0 AS quality_score
            FROM q
        )
        SELECT doc_id,
               CASE WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::INT
                         % 10 < 8
                    THEN 'train' ELSE 'test' END AS split,
               n_tokens, quality_score
        FROM scored
        WHERE quality_score >= 0.3
        ORDER BY doc_id
    """,
    "orders_above_avg": """
        WITH cents AS (
            SELECT o_orderpriority,
                   CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
            FROM orders
        ),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS s, count(*) AS n FROM cents)
        SELECT o_orderpriority, count(*) AS n_orders,
               floor(sum(c) / count(*) + 0.5) / 100.0 AS avg_price
        FROM cents, tot
        WHERE c * n > s
        GROUP BY o_orderpriority
        HAVING count(*) > 10
        ORDER BY o_orderpriority
    """,
    "bpe_token_counts": """
        SELECT doc_id,
               CASE WHEN length(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'))) = 0
                    THEN 0
                    ELSE len(string_split(
                        trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')), ' '))
               END AS n_tokens,
               len(regexp_extract_all(text,
                   ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r]+|[ \t\n\r]+'))
                   AS n_bpe_tokens
        FROM documents
        ORDER BY doc_id
    """,
    "pii_scrub": """
        SELECT doc_id,
               text || ' contact <EMAIL> or call <PHONE>' AS scrubbed
        FROM documents
        ORDER BY doc_id
    """,
    "repetition_stats": """
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN length(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'))) = 0
                        THEN []::VARCHAR[]
                        ELSE string_split(
                            trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')), ' ')
                   END AS t
            FROM documents
        ),
        bi AS (
            SELECT doc_id, len(t) AS n_tokens,
                   CASE WHEN len(t) < 2 THEN []::VARCHAR[]
                        ELSE list_transform(generate_series(1, len(t) - 1),
                                            i -> t[i] || ' ' || t[i + 1])
                   END AS bigrams
            FROM base
        ),
        biagg AS (
            SELECT doc_id, n_tokens,
                   CASE WHEN len(bigrams) > 0
                        THEN floor((1.0 - len(list_distinct(bigrams)) / len(bigrams))
                                   * 10000.0 + 0.5) / 10000.0
                        ELSE 0.0 END AS dup_bigram_frac
            FROM bi
        ),
        tc AS (
            SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(t) AS tok FROM base)
            GROUP BY doc_id, tok
        ),
        top AS (
            SELECT doc_id, max(c) / sum(c) AS f FROM tc GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_tokens, b.dup_bigram_frac,
               floor(coalesce(top.f, 0.0) * 10000.0 + 0.5) / 10000.0
                   AS top_token_frac
        FROM biagg b LEFT JOIN top USING (doc_id)
        ORDER BY b.doc_id
    """,
    "quality_scores": """
        WITH base AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   CASE WHEN length(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'))) = 0
                        THEN 0
                        ELSE len(string_split(
                            trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')), ' '))
                   END AS n_tokens,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
            FROM documents
        ), derived AS (
            SELECT doc_id, n_tokens,
                   CASE WHEN n_tokens > 0
                        THEN (n_chars - (n_tokens - 1)) / n_tokens
                        ELSE 0.0 END AS avg_tok,
                   CASE WHEN n_chars > 0 THEN n_alpha / n_chars
                        ELSE 0.0 END AS alpha_ratio
            FROM base
        )
        SELECT doc_id, n_tokens,
               round(avg_tok, 4) AS avg_token_len,
               round(alpha_ratio, 4) AS alpha_ratio,
               floor((least(1.0, n_tokens / 100.0) * 0.5
                      + alpha_ratio * 0.3
                      + least(1.0, avg_tok / 8.0) * 0.2) * 10000.0 + 0.5)
                   / 10000.0 AS quality_score
        FROM derived
        ORDER BY doc_id
    """,
    "doc_fingerprints": """
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g'))))
                   AS fingerprint
        FROM documents
        ORDER BY doc_id
    """,
    "embedding_topk": """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, label,
               round(list_dot_product(embedding, qe)
                     / (sqrt(list_dot_product(embedding, embedding))
                        * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
        FROM embeddings, q
        WHERE vec_id != 0
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """,
    "binary_payload_stats": """
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
        ORDER BY media_id
    """,
    "pivot_order_status": """
        SELECT o_orderpriority,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
               count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "percentile_order_value": """
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
               count(*) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "grouping_sets_docs": """
        SELECT source, lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY GROUPING SETS ((source, lang), (source), ())
        ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST
    """,
    "full_outer_user_activity": """
        WITH p AS (
            SELECT user_id, count(*) AS n_purchases,
                   round(sum(value), 2) AS purchase_value
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ), c AS (
            SELECT user_id, count(*) AS n_clicks
            FROM events WHERE event_type = 'click' GROUP BY user_id
        )
        SELECT coalesce(p.user_id, c.user_id) AS user_id,
               coalesce(n_purchases, 0) AS n_purchases,
               coalesce(purchase_value, 0.0) AS purchase_value,
               coalesce(n_clicks, 0) AS n_clicks
        FROM p FULL OUTER JOIN c ON p.user_id = c.user_id
        ORDER BY user_id
    """,
    "ntile_order_quartiles": """
        SELECT quartile, count(*) AS n_orders,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price
        FROM (
            SELECT o_totalprice, ntile(4) OVER (
                ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
            FROM orders
        )
        GROUP BY quartile
        ORDER BY quartile
    """,
    "stats_corr_revenue": """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 2)
                   AS covar_qty_price,
               round(stddev_samp(l_extendedprice), 2) AS stddev_price,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "range_join_event_pairs": """
        SELECT a.user_id, count(*) AS n_pairs
        FROM events a JOIN events b ON a.user_id = b.user_id
         AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 300 SECONDS
        GROUP BY a.user_id
        ORDER BY a.user_id
    """,
    "extract_docx_text": """
        SELECT doc_id,
               coalesce(text, '') || chr(10) || chr(10)
                   || 'Doc ' || doc_id::VARCHAR || chr(9)
                   || '<tagged & checked>' AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "extract_odt_text": """
        SELECT doc_id,
               coalesce(text, '') || chr(10) || chr(10)
                   || 'Odt ' || doc_id::VARCHAR || chr(9)
                   || '<open & doc>' AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "json_ld": """
        SELECT doc_id, 'Article' AS ld_type,
               substring(coalesce(text, ''), 1, 40) AS name
        FROM documents
        UNION ALL
        SELECT doc_id, 'Product', 'Item ' || doc_id::VARCHAR
        FROM documents
        UNION ALL
        SELECT doc_id, NULL, NULL  -- the @graph container block
        FROM documents
        ORDER BY doc_id, ld_type
    """,
    "extract_glyph_ocr": """
        SELECT doc_id,
               rtrim(substring(regexp_replace(upper(coalesce(text, '')),
                                              '[^A-Z0-9 .,''&-]', '', 'g'),
                               1, 96), ' ') AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "extract_epub_text": """
        SELECT doc_id,
               trim(regexp_replace(coalesce(text, ''),
                                   '[ \t\n\r]+', ' ', 'g'))
                   || chr(10) || chr(10) || 'Chapter ' || doc_id::VARCHAR
                   || ' of the epub & appendix' AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "extract_xlsx_text": """
        SELECT doc_id,
               'Doc' || chr(9) || doc_id::VARCHAR || chr(10)
                   || coalesce(text, '') || chr(10)
                   || '<cells & rows>' || chr(9) || chr(9) || '-3.5'
                   || chr(10) || chr(10)
                   || 'Doc' || chr(9) || 'total' || chr(10)
                   || doc_id::VARCHAR || chr(9) || doc_id::VARCHAR
                   AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "extract_pptx_text": """
        SELECT doc_id,
               coalesce(text, '') || chr(10) || chr(10)
                   || 'Slide ' || doc_id::VARCHAR || chr(10) || chr(10)
                   || '<deck & notes>' || chr(10) || 'end'
                   AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "extract_rtf_text": """
        SELECT doc_id,
               coalesce(text, '') || chr(10) || chr(10)
                   || 'Rtf ' || doc_id::VARCHAR || chr(9)
                   || '«rich & text»' AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "gopher_gate": f"""
        WITH p AS (
            SELECT doc_id, {_RULES_PAGE_SQL} AS t
            FROM documents
        ), w AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(t, '\\s+'),
                               x -> x <> '') AS words,
                   list_transform(regexp_split_to_array(t, '\\n'),
                                  x -> trim(x)) AS lines,
                   t
            FROM p
        ), m AS (
            SELECT doc_id,
                   len(words)::BIGINT AS n_words,
                   coalesce(list_sum(list_transform(words,
                       x -> length(x))), 0)::BIGINT AS n_word_chars,
                   len(list_filter(words,
                       x -> regexp_matches(x, '[A-Za-z]')))::BIGINT
                       AS n_alpha_words,
                   (list_contains(list_transform(words, x -> lower(x)), 'the')::BIGINT
                    + list_contains(list_transform(words, x -> lower(x)), 'be')::BIGINT
                    + list_contains(list_transform(words, x -> lower(x)), 'to')::BIGINT
                    + list_contains(list_transform(words, x -> lower(x)), 'of')::BIGINT
                    + list_contains(list_transform(words, x -> lower(x)), 'and')::BIGINT
                    + list_contains(list_transform(words, x -> lower(x)), 'that')::BIGINT
                    + list_contains(list_transform(words, x -> lower(x)), 'have')::BIGINT
                    + list_contains(list_transform(words, x -> lower(x)), 'with')::BIGINT
                   ) AS n_stop_hits,
                   ((length(t) - length(replace(t, '#', '')))
                    + (length(t) - length(replace(t, '...', ''))) // 3
                    + (length(t) - length(replace(t, '…', ''))))::BIGINT
                       AS n_symbol_marks,
                   len(lines)::BIGINT AS n_lines,
                   len(list_filter(lines, s -> left(s, 1) IN
                       ('-', '*', '•', '●', '▪')))::BIGINT AS n_bullet_lines,
                   len(list_filter(lines, s -> right(s, 3) = '...'
                       OR right(s, 1) = '…'))::BIGINT AS n_ellipsis_lines
            FROM w
        )
        SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_stop_hits,
               n_symbol_marks, n_lines, n_bullet_lines, n_ellipsis_lines,
               (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
               (n_word_chars >= 3 * n_words
                AND n_word_chars <= 10 * n_words) AS rule_mean_word_len,
               (n_symbol_marks * 10 <= n_words) AS rule_symbol_ratio,
               (n_bullet_lines * 10 <= 9 * n_lines) AS rule_bullet_lines,
               (n_ellipsis_lines * 10 <= 3 * n_lines) AS rule_ellipsis_lines,
               (n_alpha_words * 5 >= 4 * n_words) AS rule_alpha_words,
               (n_stop_hits >= 2) AS rule_stop_words,
               ((n_words >= 50 AND n_words <= 100000)
                AND (n_word_chars >= 3 * n_words
                     AND n_word_chars <= 10 * n_words)
                AND n_symbol_marks * 10 <= n_words
                AND n_bullet_lines * 10 <= 9 * n_lines
                AND n_ellipsis_lines * 10 <= 3 * n_lines
                AND n_alpha_words * 5 >= 4 * n_words
                AND n_stop_hits >= 2) AS keep
        FROM m
        ORDER BY doc_id
    """,
    "c4_line_clean": f"""
        WITH p AS (
            SELECT doc_id, {_RULES_PAGE_SQL} AS t
            FROM documents
        ), k AS (
            SELECT doc_id, t,
                   list_filter(
                       list_transform(regexp_split_to_array(t, '\\n'),
                                      x -> trim(x)),
                       s -> right(s, 1) IN ('.', '!', '?', '"')
                            AND len(list_filter(
                                    regexp_split_to_array(s, '\\s+'),
                                    w -> w <> '')) >= 5
                            AND NOT contains(lower(s), 'javascript')
                   ) AS kept
            FROM p
        ), c AS (
            SELECT doc_id, t, kept,
                   coalesce(array_to_string(kept, chr(10)), '') AS text_clean
            FROM k
        )
        SELECT doc_id, text_clean,
               len(kept)::BIGINT AS n_lines_kept,
               (length(text_clean) - length(regexp_replace(
                   text_clean, '[.!?]', '', 'g')))::BIGINT AS n_sentences,
               contains(t, '{{') AS has_brace,
               contains(lower(t), 'lorem ipsum') AS has_lorem,
               ((length(text_clean) - length(regexp_replace(
                    text_clean, '[.!?]', '', 'g'))) >= 3
                AND NOT contains(t, '{{')
                AND NOT contains(lower(t), 'lorem ipsum')) AS keep
        FROM c
        ORDER BY doc_id
    """,
    "bpe_train": _bpe_oracle_sql(8),
    "bpe_encode_docs": _bpe_encode_oracle_sql(8),
    "bm25_search": """
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                lower(coalesce(text, '')), '\\s+'), x -> x <> '')) AS term
            FROM documents
        ),
        lens AS (
            SELECT doc_id, len(list_filter(regexp_split_to_array(
                lower(coalesce(text, '')), '\\s+'), x -> x <> ''))::BIGINT
                AS dl
            FROM documents
        ),
        stats AS (
            SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM lens
        ),
        tf AS (
            SELECT term, doc_id, count(*)::DOUBLE AS tf FROM toks
            WHERE term IN ('spark', 'vector', 'hash') GROUP BY 1, 2
        ),
        dfx AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
        scored AS (
            -- same operand order/associativity as the Spark expression
            SELECT tf.doc_id,
                   ln(1.0 + (s.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
                   * (tf.tf * 2.2
                      / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / s.avgdl)))
                   AS term_score
            FROM tf JOIN dfx USING (term) JOIN lens USING (doc_id), stats s
        )
        SELECT doc_id, count(*)::BIGINT AS n_terms_matched,
               round(sum(term_score), 4) AS score_e4
        FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    "image_dhash_dedup": """
        WITH grp AS (SELECT DISTINCT doc_id % 17 AS g FROM documents),
        hashes AS (
            SELECT g,
                   sum(CASE WHEN ((g*31 + 7*(c.i+1) + 13*r.i) % 120)
                             > ((g*31 + 7*c.i + 13*r.i) % 120)
                        THEN (1::BIGINT << (r.i*7 + c.i))
                        ELSE 0 END)::BIGINT AS dhash
            FROM grp,
                 UNNEST(generate_series(0, 7)) AS r(i),
                 UNNEST(generate_series(0, 6)) AS c(i)
            GROUP BY g
        )
        SELECT h.dhash,
               count(*)::BIGINT AS n_docs,
               min(d.doc_id) AS min_doc,
               max(d.doc_id) AS max_doc
        FROM documents d JOIN hashes h ON d.doc_id % 17 = h.g
        GROUP BY h.dhash
        ORDER BY h.dhash
    """,
    "top_bigrams": """
        WITH toks AS (
            SELECT list_filter(regexp_split_to_array(
                lower(coalesce(text, '')), '\\s+'), x -> x <> '') AS tl
            FROM documents
        ),
        grams AS (
            SELECT tl[g.i] || ' ' || tl[g.i + 1] AS ngram
            FROM toks, UNNEST(generate_series(1, len(tl) - 1)) AS g(i)
        )
        SELECT ngram, count(*)::BIGINT AS n_occurrences
        FROM grams GROUP BY ngram
        ORDER BY n_occurrences DESC, ngram
        LIMIT 50
    """,
    "key_skew_gini": """
        WITH c AS (
            SELECT user_id, count(*)::BIGINT AS cnt
            FROM events GROUP BY user_id
        ),
        r AS (
            SELECT cnt,
                   row_number() OVER (ORDER BY cnt, user_id)::BIGINT AS i
            FROM c
        )
        SELECT count(*)::BIGINT AS n_keys,
               sum(cnt)::BIGINT AS total_rows,
               sum(i * cnt)::BIGINT AS weighted_rank_sum,
               round((2.0 * sum(i * cnt) - (count(*) + 1.0) * sum(cnt))
                     / (count(*) * sum(cnt)), 4) AS gini_e4
        FROM r
    """,
    "quality_classifier": """
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(regexp_split_to_array(
                lower(coalesce(text, '')), '\\s+'), x -> x <> '')) AS term
            FROM documents
        ),
        sums AS (
            SELECT doc_id,
                   count(*)::BIGINT AS n_tokens,
                   sum((('0x' || substring(md5(term), 1, 8))::BIGINT
                        % 2147483647) % 2001 - 1000)::BIGINT AS weight_sum
            FROM toks GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce(s.weight_sum, 0)::BIGINT AS weight_sum,
               round(1.0 / (1.0 + exp(-(CASE WHEN coalesce(s.n_tokens, 0) > 0
                   THEN coalesce(s.weight_sum, 0)
                        / (1000.0 * s.n_tokens)
                   ELSE 0.0 END))), 4) AS prob_e4,
               coalesce(s.weight_sum, 0) >= 0 AS label
        FROM documents d LEFT JOIN sums s ON d.doc_id = s.doc_id
        ORDER BY d.doc_id
    """,
    "html_tables": """
        SELECT doc_id,
               CAST(0 AS BIGINT) AS table_idx,
               g.r::BIGINT AS row_idx,
               g.c::BIGINT AS col_idx,
               CASE WHEN g.r = 0 THEN
                   CASE g.c WHEN 0 THEN 'name & id'
                            WHEN 1 THEN 'qty'
                            ELSE 'price' END
               ELSE
                   CASE g.c WHEN 0 THEN 'item-' || doc_id::VARCHAR
                            WHEN 1 THEN (doc_id % 7)::VARCHAR
                            ELSE ((doc_id * 3) % 100)::VARCHAR END
               END AS cell
        FROM documents,
             (VALUES (0,0),(0,1),(0,2),(1,0),(1,1),(1,2)) AS g(r, c)
        ORDER BY doc_id, table_idx, row_idx, col_idx
    """,
    "readability_scores": """
        WITH counts AS (
            SELECT doc_id,
                   CASE WHEN length(trim(regexp_replace(
                            coalesce(text, ''), '[ \t\n\r]+', ' ', 'g'))) = 0
                        THEN 0
                        ELSE len(string_split(trim(regexp_replace(
                            coalesce(text, ''), '[ \t\n\r]+', ' ', 'g')),
                            ' '))
                   END::BIGINT AS n_words,
                   greatest(1, len(regexp_extract_all(
                       coalesce(text, ''), '[.!?]+')))::BIGINT
                       AS n_sentences,
                   len(regexp_extract_all(lower(coalesce(text, '')),
                       '[aeiouy]+'))::BIGINT AS n_syllables
            FROM documents
        )
        SELECT doc_id, n_words, n_sentences, n_syllables,
               round(CASE WHEN n_words > 0
                     THEN 206.835 - 1.015 * (n_words / n_sentences)
                          - 84.6 * (n_syllables / n_words)
                     ELSE 0.0 END, 4) AS flesch_e4
        FROM counts
        ORDER BY doc_id
    """,
    "bloom_prune_stats": """
        WITH keys AS (
            SELECT DISTINCT o_custkey AS key FROM orders
            WHERE o_orderdate >= '2001-01-01'
        ),
        kh AS (
            SELECT key,
                ('0x'||substring(md5(key::VARCHAR),1,8))::BIGINT
                    % 2147483647 AS h1,
                ('0x'||substring(md5(key::VARCHAR),9,8))::BIGINT
                    % 2147483647 AS h2
            FROM keys
        ),
        bits AS (
            SELECT DISTINCT (h1 + g.i * h2) % 65536 AS bit
            FROM kh, UNNEST(generate_series(0, 4)) AS g(i)
        ),
        probes AS (SELECT DISTINCT c_custkey AS key FROM customer),
        ph AS (
            SELECT key,
                ('0x'||substring(md5(key::VARCHAR),1,8))::BIGINT
                    % 2147483647 AS h1,
                ('0x'||substring(md5(key::VARCHAR),9,8))::BIGINT
                    % 2147483647 AS h2
            FROM probes
        ),
        ppos AS (
            SELECT key, (h1 + g.i * h2) % 65536 AS bit
            FROM ph, UNNEST(generate_series(0, 4)) AS g(i)
        ),
        hits AS (
            SELECT key FROM ppos JOIN bits USING (bit)
            GROUP BY key HAVING count(*) = 5
        )
        SELECT
            (SELECT count(*) FROM keys)::BIGINT AS n_keys,
            (SELECT count(*) FROM bits)::BIGINT AS n_bits_set,
            (SELECT count(*) FROM probes)::BIGINT AS n_probes,
            (SELECT count(*) FROM hits)::BIGINT AS bloom_positives,
            (SELECT count(*) FROM hits WHERE key IN
                (SELECT key FROM keys))::BIGINT AS true_positives,
            (SELECT count(*) FROM hits WHERE key NOT IN
                (SELECT key FROM keys))::BIGINT AS false_positives
    """,
    "hll_distinct_md5": """
        WITH h AS (
            SELECT ('0x' || substring(md5(user_id::VARCHAR), 1, 15))::BIGINT
                   AS h
            FROM events
        ),
        reg AS (
            SELECT h % 4096 AS bucket,
                   max(CASE WHEN (h >> 12) = 0 THEN 49
                            ELSE 49 - length(bin(h >> 12)) END) AS rho
            FROM h GROUP BY 1
        )
        SELECT rho::INT AS rho, count(*)::BIGINT AS n_buckets
        FROM reg GROUP BY rho ORDER BY rho
    """,
    "frontier_schedule": """
        WITH cand AS (
            SELECT 'https://s' || doc_id::VARCHAR || '.example.com/' AS src_url,
                   'https://h' || (doc_id % 10)::VARCHAR
                       || '.example.com/page/' || (doc_id % 25)::VARCHAR
                       || '?a=1&b=2' AS url
            FROM documents
            UNION ALL
            SELECT 'https://s' || doc_id::VARCHAR || '.example.com/',
                   'https://h' || (doc_id % 10)::VARCHAR || '.example.com'
            FROM documents
            -- /private/ candidates omitted: robots-disallowed, the
            -- engine must drop every one of them
        ),
        agg AS (
            SELECT url, count(DISTINCT src_url)::BIGINT AS in_degree
            FROM cand GROUP BY url
        ),
        fresh AS (
            SELECT * FROM agg WHERE url NOT IN (
                SELECT DISTINCT 'https://h' || (doc_id % 10)::VARCHAR
                           || '.example.com/page/' || (doc_id % 25)::VARCHAR
                           || '?a=1&b=2'
                FROM documents WHERE doc_id % 25 < 5
            )
        ),
        ranked AS (
            SELECT url,
                   regexp_extract(url, 'https://([^/?]+)', 1) AS host,
                   in_degree,
                   row_number() OVER (
                       PARTITION BY regexp_extract(url, 'https://([^/?]+)', 1)
                       ORDER BY in_degree DESC, url
                   ) AS fetch_order
            FROM fresh
        )
        SELECT url, host, in_degree, fetch_order
        FROM ranked
        WHERE fetch_order <= 4
        ORDER BY host, fetch_order
    """,
    "frontier_polite": """
        WITH cand AS (
            SELECT 'https://s' || doc_id::VARCHAR || '.example.com/' AS src_url,
                   'https://h' || (doc_id % 10)::VARCHAR
                       || '.example.com/page/' || (doc_id % 25)::VARCHAR
                       || '?a=1&b=2' AS url
            FROM documents
            UNION ALL
            SELECT 'https://s' || doc_id::VARCHAR || '.example.com/',
                   'https://h' || (doc_id % 10)::VARCHAR || '.example.com'
            FROM documents
        ),
        agg AS (
            SELECT url, count(DISTINCT src_url)::BIGINT AS in_degree
            FROM cand GROUP BY url
        ),
        fresh AS (
            SELECT * FROM agg WHERE url NOT IN (
                SELECT DISTINCT 'https://h' || (doc_id % 10)::VARCHAR
                           || '.example.com/page/' || (doc_id % 25)::VARCHAR
                           || '?a=1&b=2'
                FROM documents WHERE doc_id % 25 < 5
            )
        ),
        ranked AS (
            SELECT url,
                   regexp_extract(url, 'https://([^/?]+)', 1) AS host,
                   in_degree,
                   row_number() OVER (
                       PARTITION BY regexp_extract(url, 'https://([^/?]+)', 1)
                       ORDER BY in_degree DESC, url
                   ) AS fetch_order
            FROM fresh
        ),
        delays AS (
            SELECT DISTINCT
                   'h' || (doc_id % 10)::VARCHAR || '.example.com' AS host,
                   ((doc_id % 10) * 1000 + 500)::BIGINT AS delay_ms
            FROM documents
        )
        SELECT r.url, r.host, r.in_degree, r.fetch_order, d.delay_ms,
               ((r.fetch_order - 1) * d.delay_ms)::BIGINT AS fetch_at_ms
        FROM ranked r JOIN delays d USING (host)
        WHERE r.fetch_order <= 4
          AND r.fetch_order <= greatest(10000 // d.delay_ms, 1)
        ORDER BY host, fetch_order
    """,
    "wet_roundtrip": """
        WITH recs AS (
            SELECT 'https://crawl.example.com/doc/' || doc_id::VARCHAR AS uri,
                   coalesce(text, '') AS text
            FROM documents
        ),
        bucketed AS (
            SELECT (('0x' || substring(md5(uri), 1, 4))::INT % 8)::BIGINT
                       AS file_id,
                   uri, text
            FROM recs
        ),
        conv AS (
            SELECT file_id,
                   row_number() OVER (
                       PARTITION BY file_id ORDER BY uri
                   )::INT AS rec_index,
                   'conversion' AS warc_type,
                   uri AS target_uri,
                   'text/plain' AS content_type,
                   text
            FROM bucketed
        ),
        info AS (
            SELECT DISTINCT file_id,
                   0::INT AS rec_index,
                   'warcinfo' AS warc_type,
                   NULL::VARCHAR AS target_uri,
                   'application/warc-fields' AS content_type,
                   'software: open-ocr-spark WET/WAT writer' || chr(13)
                       || chr(10) || 'format: WARC File Format 1.0'
                       || chr(13) || chr(10) AS text
            FROM bucketed
        )
        SELECT * FROM (
            SELECT * FROM conv UNION ALL SELECT * FROM info
        )
        ORDER BY file_id, rec_index
    """,
    "wat_metadata": """
        SELECT 'https://p.example.com/' || doc_id::VARCHAR AS target_uri,
               'Doc ' || doc_id::VARCHAR AS title,
               (CASE WHEN doc_id % 3 = 0 THEN 0
                     WHEN doc_id % 3 = 1 THEN 1
                     ELSE 2 END)::BIGINT AS n_links,
               CASE WHEN doc_id % 3 >= 1
                    THEN 'https://h' || (doc_id % 20)::VARCHAR
                         || '.example.com/p/' || doc_id::VARCHAR
               END AS first_link
        FROM documents
        ORDER BY target_uri
    """,
    "mime_sniff": """
        SELECT doc_id,
               CASE doc_id % 16
                   WHEN 0 THEN 'application/pdf'
                   WHEN 1 THEN 'application/rtf'
                   WHEN 2 THEN 'application/zip'
                   WHEN 3 THEN 'image/png'
                   WHEN 4 THEN 'image/gif'
                   WHEN 5 THEN 'image/jpeg'
                   WHEN 6 THEN 'image/bmp'
                   WHEN 7 THEN 'video/webm'
                   WHEN 8 THEN 'application/warc'
                   WHEN 9 THEN 'audio/wav'
                   WHEN 10 THEN 'video/x-msvideo'
                   WHEN 11 THEN 'video/mp4'
                   WHEN 12 THEN 'application/gzip'
                   WHEN 13 THEN 'text/html'
                   WHEN 14 THEN 'text/plain'
                   ELSE 'application/octet-stream'
               END AS mime
        FROM documents
        ORDER BY doc_id
    """,
    "stratified_sample_md5": """
        SELECT doc_id, lang
        FROM documents
        WHERE ('0x' || substring(md5(lang || ':' || doc_id::VARCHAR), 1, 8))::BIGINT
              < CASE lang WHEN 'en' THEN 2147483648
                          WHEN 'es' THEN 1073741824
                          WHEN 'fr' THEN 1073741824
                          WHEN 'de' THEN 1073741824
                          WHEN 'zh' THEN 429496729
                          ELSE 0 END
        ORDER BY doc_id
    """,
    "anchor_text_stats": """
        WITH pages AS (
            SELECT 'https://h' || (doc_id % 20)::VARCHAR
                       || '.example.com/p/' || doc_id::VARCHAR AS url,
                   '<html><body><a href="'
                       || 'https://t' || (doc_id % 10)::VARCHAR || '.example.com/'
                       || '">'
                       || CASE WHEN doc_id % 3 = 1 THEN 'read more'
                               ELSE 'click here' END
                       || '</a> <A HREF="'
                       || 'https://t' || (doc_id % 10)::VARCHAR || '.example.com/'
                       || '">  site   ' || (doc_id % 2)::VARCHAR
                       || chr(10) || ' page</A><a href="'
                       || 'https://u' || (doc_id % 7)::VARCHAR || '.example.com/x'
                       || '" rel=nofollow>Example — Site '
                       || (doc_id % 13)::VARCHAR
                       || '</a><a href="'
                       || 'https://t' || (doc_id % 10)::VARCHAR || '.example.com/'
                       || '"><b>skip</b></a><a href="/rel">skip too</a>'
                       || '</body></html>' AS html
            FROM documents
        ),
        raw AS (
            SELECT unnest(regexp_extract_all(html,
                       '(?i)<a\\s(?:[^>]*\\s)?href\\s*=\\s*"([^"]*)"[^>]*>([^<]*)</a>',
                       1)) AS dst_url,
                   unnest(regexp_extract_all(html,
                       '(?i)<a\\s(?:[^>]*\\s)?href\\s*=\\s*"([^"]*)"[^>]*>([^<]*)</a>',
                       2)) AS raw_text
            FROM pages
        ),
        a AS (
            SELECT dst_url,
                   trim(regexp_replace(raw_text, '[ \t\n\r]+', ' ', 'g'))
                       AS anchor_text
            FROM raw
            WHERE (dst_url LIKE 'http://%' OR dst_url LIKE 'https://%')
        ),
        c AS (
            SELECT dst_url, anchor_text, count(*)::BIGINT AS n
            FROM a WHERE anchor_text <> ''
            GROUP BY dst_url, anchor_text
        )
        SELECT dst_url, n_anchors, n_unique_texts,
               anchor_text AS top_anchor_text, n AS top_n
        FROM (
            SELECT dst_url, anchor_text, n,
                   sum(n) OVER (PARTITION BY dst_url)::BIGINT AS n_anchors,
                   count(*) OVER (PARTITION BY dst_url)::BIGINT
                       AS n_unique_texts,
                   row_number() OVER (PARTITION BY dst_url
                                      ORDER BY n DESC, anchor_text) AS rn
            FROM c
        )
        WHERE rn = 1
        ORDER BY dst_url
    """,
    "extract_pdf_text": """
        SELECT doc_id, coalesce(text, '') AS extracted_text, 'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "extract_pdf_flate": """
        SELECT doc_id, coalesce(text, '') AS extracted_text, 'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "extract_pdf_cmap": """
        SELECT doc_id, coalesce(text, '') || 'abc<<>>' AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "media_resize": """
        SELECT doc_id,
               CAST(102 AS BIGINT) AS n_bytes,  -- 54 + 4 rows * stride 12
               CAST(doc_id % 251 AS INTEGER) AS p00,
               CAST((doc_id * 3 + 7) % 251 AS INTEGER) AS p01,
               CAST((doc_id * 5 + 11) % 251 AS INTEGER) AS p10,
               CAST((doc_id * 7 + 13) % 251 AS INTEGER) AS p11
        FROM documents
        ORDER BY doc_id
    """,
    "media_resize_png": """
        SELECT doc_id,
               CAST(doc_id % 241 AS INTEGER) AS p00,
               CAST((doc_id * 11 + 3) % 241 AS INTEGER) AS p01,
               CAST((doc_id * 13 + 29) % 241 AS INTEGER) AS p10,
               CAST((doc_id * 17 + 31) % 241 AS INTEGER) AS p11
        FROM documents
        ORDER BY doc_id
    """,
    "media_resize_jpeg": """
        SELECT doc_id,
               CAST(8 AS INTEGER) AS width,
               CAST(8 AS INTEGER) AS height,
               CAST((doc_id * 2 + 5) % 250 AS INTEGER) AS p_left,
               CAST((doc_id * 9 + 40) % 250 AS INTEGER) AS p_right
        FROM documents
        ORDER BY doc_id
    """,
    "media_resize_jpeg_progressive": """
        SELECT doc_id,
               CAST(8 AS INTEGER) AS width,
               CAST(8 AS INTEGER) AS height,
               CAST((doc_id * 3 + 11) % 250 AS INTEGER) AS p_left,
               CAST((doc_id * 7 + 60) % 250 AS INTEGER) AS p_right,
               CAST(1 AS INTEGER) AS ac_agree
        FROM documents
        ORDER BY doc_id
    """,
    "media_resize_jpeg_arith": """
        SELECT doc_id,
               CAST(8 AS INTEGER) AS width,
               CAST(8 AS INTEGER) AS height,
               CAST((doc_id * 5 + 23) % 250 AS INTEGER) AS p_left,
               CAST((doc_id * 11 + 42) % 250 AS INTEGER) AS p_right,
               CAST(1 AS INTEGER) AS arith_agree
        FROM documents
        ORDER BY doc_id
    """,
    "audio_stats_wav": """
        SELECT d.doc_id,
               CAST(8000 AS INTEGER) AS sample_rate,
               CAST(1 AS INTEGER) AS n_channels,
               CAST(4 + d.doc_id % 5 AS BIGINT) AS n_samples,
               CAST((d.doc_id * 13) % 201 - 100 AS INTEGER) AS first_sample,
               CAST(MAX(ABS((d.doc_id * 13 + u.i * 57) % 201 - 100))
                   AS INTEGER) AS peak_amp,
               CAST(SUM(ABS((d.doc_id * 13 + u.i * 57) % 201 - 100))
                   AS BIGINT) AS sum_abs
        FROM documents d
        JOIN (SELECT unnest(range(0, 16)) AS i) u ON u.i < 4 + d.doc_id % 5
        GROUP BY d.doc_id
        ORDER BY d.doc_id
    """,
    "media_frame_sample_mp4": """
        SELECT d.doc_id,
               CAST(u.i AS INTEGER) AS frame_idx,
               CAST(u.i AS DOUBLE) AS ts_s,
               CAST((d.doc_id * 7 + u.i * 3) % 256 AS INTEGER) AS first_byte,
               CAST(1 + (d.doc_id + u.i) % 5 AS BIGINT) AS frame_len
        FROM documents d
        JOIN (SELECT unnest(range(0, 8)) AS i) u ON u.i <= d.doc_id % 4
        ORDER BY doc_id, frame_idx
    """,
    "media_resize_gif": """
        SELECT doc_id,
               CAST((doc_id * 29 + 31) % 239 AS INTEGER) AS p00,
               CAST((doc_id * 3 + 59) % 239 AS INTEGER) AS p01,
               CAST((doc_id * 3 + 101) % 239 AS INTEGER) AS p10,
               CAST((doc_id * 3 + 115) % 239 AS INTEGER) AS p11
        FROM documents
        ORDER BY doc_id
    """,
    "media_frame_sample_avi": """
        SELECT d.doc_id,
               CAST(u.i AS INTEGER) AS frame_idx,
               CAST(u.i / 2.0 AS DOUBLE) AS ts_s,
               CAST((d.doc_id * 2 + u.i * 9 + 5) % 250 AS INTEGER) AS gray,
               CAST((d.doc_id * 2 + u.i * 9 + 5) % 250 AS INTEGER) AS gray2
        FROM documents d
        JOIN (SELECT unnest(range(0, 3)) AS i) u ON u.i <= d.doc_id % 3
        ORDER BY doc_id, frame_idx
    """,
    "unicode_nfc": """
        WITH raw AS (
            SELECT doc_id,
                   CASE doc_id % 4
                     WHEN 0 THEN 'cafe' || chr(769) || ' ' || doc_id::VARCHAR
                     WHEN 1 THEN 'caf' || chr(233) || ' ' || doc_id::VARCHAR
                     WHEN 2 THEN 'A' || chr(778) || 'rhus ' || doc_id::VARCHAR
                     ELSE 'plain ' || doc_id::VARCHAR
                   END AS raw_text
            FROM documents
        )
        SELECT doc_id,
               nfc_normalize(raw_text) AS norm_text,
               nfc_normalize(raw_text) <> raw_text AS changed,
               CAST(length(nfc_normalize(raw_text)) AS BIGINT) AS norm_len
        FROM raw
        ORDER BY doc_id
    """,
    "feed_discovery": """
        WITH hosts AS (
            SELECT DISTINCT (doc_id % 20) AS hid FROM documents
        ),
        lm AS (
            SELECT hid,
                   'https://h' || hid::VARCHAR || '.example.com'
                       AS base
            FROM hosts
        )
        SELECT base || '/feed' AS feed_url,
               CASE WHEN hid % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind,
               CASE WHEN hid % 2 = 0 THEN
                   CASE u.i WHEN 0 THEN base || '/p/a'
                            ELSE base || '/p/b' END
               ELSE
                   CASE u.i WHEN 0 THEN base || '/e/1'
                            ELSE base || '/e/2' END
               END AS link,
               CASE WHEN hid % 2 = 0 THEN
                   CASE u.i WHEN 0
                       THEN 'News ' || hid::VARCHAR || ' & views'
                       ELSE 'Deep <dive>' END
               ELSE
                   CASE u.i WHEN 0 THEN 'Entry ' || hid::VARCHAR
                            ELSE 'Plain' END
               END AS title,
               CASE WHEN u.i = 0 AND hid % 2 = 0
                    THEN 'Mon, 17 Aug 2026 0' || (hid % 10)::VARCHAR
                         || ':00:00 GMT'
                    WHEN u.i = 0 THEN '2026-08-17T10:00:00Z'
                    ELSE NULL END AS published
        FROM lm
        JOIN (SELECT unnest(range(0, 2)) AS i) u ON true
        ORDER BY feed_url, link
    """,
    "sitemap_discovery": """
        WITH hosts AS (
            SELECT DISTINCT (doc_id % 20) AS hid FROM documents
        ),
        lm AS (
            SELECT hid,
                   'h' || hid::VARCHAR || '.example.com' AS host,
                   'https://h' || hid::VARCHAR || '.example.com' AS base,
                   '2026-0' || ((hid % 8) + 1)::VARCHAR || '-15' AS lastmod
            FROM hosts
        )
        SELECT host,
               CASE WHEN hid % 2 = 0 THEN 'urlset' ELSE 'index' END AS kind,
               CASE WHEN hid % 2 = 0 THEN
                   CASE u.i WHEN 0 THEN base || '/p/a?x=1&y=2'
                            ELSE base || '/p/b' END
               ELSE
                   CASE u.i WHEN 0 THEN base || '/sitemap-0.xml'
                            ELSE base || '/sitemap-1.xml' END
               END AS loc,
               CASE WHEN u.i = 0 THEN lastmod ELSE NULL END AS lastmod
        FROM lm
        JOIN (SELECT unnest(range(0, 2)) AS i) u ON true
        ORDER BY host, loc
    """,
    "chunk_documents": """
        WITH docs2 AS (
            SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
            FROM documents
        ),
        nc AS (
            SELECT doc_id, w,
                   1 + greatest(0, (len(w) - 16 + 12 - 1) // 12) AS n_chunks
            FROM docs2
        )
        SELECT d.doc_id,
               CAST(u.k AS INTEGER) AS chunk_idx,
               md5(array_to_string(w[u.k*12+1 : u.k*12+16], ' '))
                   AS chunk_md5,
               CAST(least(len(w) - u.k*12, 16) AS INTEGER) AS n_tokens
        FROM nc d
        JOIN (SELECT unnest(range(0, 64)) AS k) u ON u.k < d.n_chunks
        ORDER BY doc_id, chunk_idx
    """,
    "robots_gate": """
        SELECT 'https://h' || (doc_id % 20)::VARCHAR || '.example.com'
                   || CASE doc_id % 6
                        WHEN 0 THEN '/p/' || (doc_id % 20)::VARCHAR
                        WHEN 1 THEN '/p/' || (doc_id % 20)::VARCHAR
                                    || '/pub/x'
                        WHEN 2 THEN '/tmp/cache/1'
                        WHEN 3 THEN '/exact'
                        WHEN 4 THEN '/exactly'
                        ELSE '/other' END
                   || '?q=' || doc_id::VARCHAR AS url,
               doc_id % 6 NOT IN (0, 2, 3) AS allowed
        FROM documents
        ORDER BY url
    """,
    "ngram_fluency": """
        WITH docs2 AS (
            SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
            FROM documents
        ),
        bound AS (SELECT max(len(w)) AS mx FROM docs2),
        pairs AS (
            SELECT d.doc_id, u.i AS pos, w[u.i+1] AS w1, w[u.i+2] AS w2
            FROM docs2 d
            JOIN (SELECT unnest(range(0, (SELECT mx FROM bound))) AS i) u
              ON u.i <= len(d.w) - 2
        ),
        ref AS (
            SELECT w1, w2, count(*) AS c2
            FROM pairs WHERE doc_id % 10 = 0 GROUP BY w1, w2
        ),
        c1t AS (SELECT w1, sum(c2) AS c1 FROM ref GROUP BY w1),
        model AS (
            SELECT r.w1, r.w2, 1000000 * r.c2 AS num, c.c1
            FROM ref r JOIN c1t c USING (w1)
        ),
        scored AS (
            SELECT p.doc_id, coalesce(m.num // m.c1, 0) AS s
            FROM pairs p
            LEFT JOIN model m ON m.w1 = p.w1 AND m.w2 = p.w2
        ),
        agg AS (
            SELECT doc_id, count(*) AS n_pairs,
                   sum(s) // count(*) AS fluency
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(a.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(coalesce(a.fluency, 0) AS BIGINT) AS fluency
        FROM docs2 d LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id
    """,
    "crawl_delta": """
        SELECT 'https://h' || (doc_id % 20)::VARCHAR || '.example.com/p/'
                   || doc_id::VARCHAR AS url,
               CASE WHEN doc_id % 5 = 4 THEN 'added'
                    WHEN doc_id % 5 = 3 THEN 'removed'
                    WHEN doc_id % 7 = 0 THEN 'changed'
                    ELSE 'unchanged' END AS status,
               CASE WHEN doc_id % 5 = 4 THEN NULL
                    ELSE md5('v1-' || doc_id::VARCHAR) END AS old_md5,
               CASE WHEN doc_id % 5 = 3 THEN NULL
                    WHEN doc_id % 7 = 0 THEN md5('v2-' || doc_id::VARCHAR)
                    ELSE md5('v1-' || doc_id::VARCHAR) END AS new_md5
        FROM documents
        ORDER BY url
    """,
    "html_meta": """
        SELECT doc_id,
               'Doc ' || doc_id::VARCHAR AS title,
               CASE WHEN doc_id % 4 = 2 THEN NULL
                    ELSE 'desc ' || ((doc_id * 7) % 100)::VARCHAR
               END AS meta_description,
               'https://h' || (doc_id % 20)::VARCHAR
                   || '.example.com/p/' || doc_id::VARCHAR AS canonical_url,
               CASE WHEN doc_id % 4 = 3 THEN NULL
                    ELSE 'OG ' || doc_id::VARCHAR
               END AS og_title
        FROM documents
        ORDER BY doc_id
    """,
    "host_quota_sample": """
        WITH hosts AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 10 < 7 THEN 'big.example.com'
                        WHEN doc_id % 10 < 9 THEN 'mid.example.com'
                        ELSE 'small.example.com' END AS host
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, host,
                   row_number() OVER (
                       PARTITION BY host
                       ORDER BY ('0x' || substring(md5(doc_id::VARCHAR),
                                                   1, 8))::BIGINT,
                                doc_id
                   ) AS rk
            FROM hosts
        )
        SELECT doc_id, host FROM ranked WHERE rk <= 30
        ORDER BY doc_id
    """,
    "substring_dedup": """
        WITH docs2 AS (
            SELECT doc_id,
                   string_split(coalesce(text, ''), ' ') AS w
            FROM documents
        ),
        bound AS (SELECT max(len(w)) AS mx FROM docs2),
        occ AS (
            SELECT d.doc_id, u.i AS pos,
                   md5(array_to_string(w[u.i+1 : u.i+8], ' ')) AS gh
            FROM docs2 d
            JOIN (SELECT unnest(range(0, (SELECT mx FROM bound))) AS i) u
              ON u.i <= len(d.w) - 8
        ),
        rem AS (
            SELECT doc_id, pos FROM (
                SELECT doc_id, pos,
                       row_number() OVER (PARTITION BY gh
                                          ORDER BY doc_id, pos) AS rn,
                       count(*) OVER (PARTITION BY gh) AS cnt
                FROM occ
            ) WHERE cnt > 1 AND rn > 1
        ),
        toks AS (
            SELECT d.doc_id, u.i AS ti, d.w[u.i+1] AS tok
            FROM docs2 d
            JOIN (SELECT unnest(range(0, (SELECT mx FROM bound))) AS i) u
              ON u.i < len(d.w)
        ),
        kept AS (
            SELECT t.doc_id, t.ti, t.tok
            FROM toks t
            WHERE NOT EXISTS (
                SELECT 1 FROM rem r
                WHERE r.doc_id = t.doc_id
                  AND r.pos <= t.ti AND t.ti < r.pos + 8
            )
        )
        SELECT d.doc_id,
               md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.ti), ''))
                   AS clean_md5,
               CAST(len(d.w) AS BIGINT) AS n_tokens,
               CAST(len(d.w) - count(k.ti) AS BIGINT) AS n_removed
        FROM docs2 d LEFT JOIN kept k ON k.doc_id = d.doc_id
        GROUP BY d.doc_id, len(d.w)
        ORDER BY d.doc_id
    """,
    "media_frame_sample_webm": """
        SELECT d.doc_id,
               CAST(u.i AS INTEGER) AS frame_idx,
               CAST(u.i / 2.0 AS DOUBLE) AS ts_s,
               CAST((d.doc_id * 5 + u.i * 11 + 3) % 256 AS INTEGER)
                   AS first_byte,
               CAST(1 + (d.doc_id + 2 * u.i) % 7 AS BIGINT) AS frame_len
        FROM documents d
        JOIN (SELECT unnest(range(0, 3)) AS i) u ON u.i <= d.doc_id % 3
        ORDER BY doc_id, frame_idx
    """,
    "extract_pdf_tj": """
        SELECT doc_id,
               coalesce(text, '') || chr(10) || 'Doc ' || doc_id
                   || chr(10) || 'END' AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "multipart_roundtrip": """
        SELECT doc_id,
               trim(regexp_replace(coalesce(text, ''), '[ \t\n\r]+', ' ', 'g'))
                   AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "url_fetch_roundtrip": """
        SELECT doc_id,
               trim(regexp_replace(coalesce(text, ''), '[ \t\n\r]+', ' ', 'g'))
                   AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "extract_structured_spans": """
        WITH norm AS (
            SELECT doc_id,
                   trim(regexp_replace(coalesce(text, ''),
                        '[ \t\n\r]+', ' ', 'g')) AS t,
                   'Appendix section for document ' || doc_id
                       || ' - closing remarks.' AS a1,
                   'Second appendix for document ' || doc_id || '.' AS a2,
                   doc_id % 3 AS k
            FROM documents
        ),
        base AS (
            SELECT *,
                   CASE WHEN length(t) > 0 THEN 1 ELSE 0 END AS has_t,
                   CASE WHEN length(t) > 0 THEN length(t) + 2 ELSE 0 END
                       AS off1
            FROM norm
        )
        SELECT doc_id, span_id, "start", "end", span_text FROM (
            SELECT doc_id, 0 AS span_id, 0 AS "start",
                   length(t) AS "end", t AS span_text
            FROM base WHERE has_t = 1
            UNION ALL
            SELECT doc_id, has_t AS span_id, off1 AS "start",
                   off1 + length(a1) AS "end", a1 AS span_text
            FROM base WHERE k >= 1
            UNION ALL
            SELECT doc_id, has_t + 1 AS span_id,
                   off1 + length(a1) + 2 AS "start",
                   off1 + length(a1) + 2 + length(a2) AS "end",
                   a2 AS span_text
            FROM base WHERE k = 2
        )
        ORDER BY doc_id, span_id
    """,
    "train_test_split": """
        SELECT doc_id,
               CASE WHEN ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::INT
                         % 10 < 8
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
        ORDER BY doc_id
    """,
    "line_dedup_docs": """
        WITH chunks AS (
            SELECT doc_id, i AS pos,
                   array_to_string(w[i*10+1 : i*10+10], ' ') AS line
            FROM (
                SELECT doc_id, w,
                       unnest(range(CAST(ceil(len(w)/10.0) AS BIGINT))) AS i
                FROM (
                    SELECT doc_id,
                           string_split(coalesce(text, ''), ' ') AS w
                    FROM documents
                )
            )
        ),
        doclines AS (
            SELECT doc_id, CAST(-1 AS BIGINT) AS pos,
                   'Accept cookies to continue' AS line
            FROM documents
            UNION ALL
            SELECT doc_id, pos, line FROM chunks
            UNION ALL
            SELECT doc_id, CAST(2147483647 AS BIGINT),
                   'All rights reserved. Powered by ExampleCMS.'
            FROM documents
        ),
        freq AS (
            SELECT line FROM (
                SELECT line, count(DISTINCT doc_id) AS nd
                FROM doclines GROUP BY line
            ) WHERE nd >= 2
        )
        SELECT d.doc_id,
               count(*) AS n_lines,
               count(*) FILTER (WHERE f.line IS NULL) AS n_kept,
               coalesce(string_agg(d.line, chr(10) ORDER BY d.pos)
                            FILTER (WHERE f.line IS NULL), '') AS text_clean
        FROM doclines d LEFT JOIN freq f ON d.line = f.line
        GROUP BY d.doc_id
        ORDER BY d.doc_id
    """,
    "canonical_url_dedup": """
        WITH urls AS (
            SELECT doc_id,
                   CASE doc_id % 4
                     WHEN 0 THEN 'https://www.src'
                          || ((doc_id // 4) % 20)::VARCHAR
                          || '.example.com:443/page/' || (doc_id // 4)::VARCHAR
                          || '?utm_source=feed&b=2&a=1#frag'
                     WHEN 1 THEN 'HTTPS://SRC'
                          || ((doc_id // 4) % 20)::VARCHAR
                          || '.EXAMPLE.COM/page/' || (doc_id // 4)::VARCHAR
                          || '/?a=1&b=2'
                     WHEN 2 THEN 'https://src'
                          || ((doc_id // 4) % 20)::VARCHAR
                          || '.example.com/page/' || (doc_id // 4)::VARCHAR
                          || '?b=2&utm_campaign=x&a=1&ref=rss'
                     ELSE 'https://src'
                          || ((doc_id // 4) % 20)::VARCHAR
                          || '.example.com:8080/page/' || (doc_id // 4)::VARCHAR
                          || '?a=1&b=2'
                   END AS url
            FROM documents
        ),
        auth AS (
            SELECT doc_id, url,
                   lower(regexp_extract(url,
                       '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                   lower(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))
                       AS authority
            FROM urls
        ),
        parts AS (
            SELECT doc_id, scheme,
                   regexp_replace(regexp_replace(authority,
                       ':[0-9]+$', ''), '^www\\.', '')
                   || CASE WHEN regexp_extract(authority,
                               ':([0-9]+)$', 1) <> ''
                            AND NOT (scheme = 'https' AND regexp_extract(
                                authority, ':([0-9]+)$', 1) = '443')
                            AND NOT (scheme = 'http' AND regexp_extract(
                                authority, ':([0-9]+)$', 1) = '80')
                       THEN ':' || regexp_extract(authority, ':([0-9]+)$', 1)
                       ELSE '' END AS host,
                   regexp_replace(regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1),
                       '/+$', '') AS path,
                   array_to_string(list_sort(list_filter(
                       string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                       p -> p <> '' AND NOT regexp_matches(p,
                           '^(utm_[^=]*|fbclid|gclid|ref)='))), '&') AS qs
            FROM auth
        )
        SELECT scheme || '://' || host || path
               || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END
                   AS canonical_url,
               count(*) AS n_variants,
               min(doc_id) AS rep_doc
        FROM parts
        GROUP BY 1
        ORDER BY canonical_url
    """,
    "pack_training_sequences": """
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(string_split(coalesce(text, ''), ' '))
                       AS BIGINT) AS n_tokens,
                   CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::INT
                       % 8 AS BIGINT) AS bucket
            FROM documents
        ),
        cum AS (
            SELECT bucket, doc_id, n_tokens,
                   sum(n_tokens) OVER (
                       PARTITION BY bucket ORDER BY doc_id) AS running
            FROM toks
        )
        SELECT bucket,
               CAST((running - n_tokens) // 200 AS BIGINT) AS seq_id,
               count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM cum
        GROUP BY bucket, seq_id
        ORDER BY bucket, seq_id
    """,
    "pack_multimodal": """
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(string_split(coalesce(text, ''), ' '))
                       AS BIGINT) AS n_text,
                   CAST(doc_id % 3 AS BIGINT) AS n_imgs,
                   CAST(('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::INT
                       % 8 AS BIGINT) AS bucket
            FROM documents
        ),
        cum AS (
            SELECT bucket, doc_id, n_text, n_imgs,
                   n_text + 64 * n_imgs AS cost,
                   sum(n_text + 64 * n_imgs) OVER (
                       PARTITION BY bucket ORDER BY doc_id) AS running
            FROM toks
        )
        SELECT bucket,
               CAST((running - cost) // 512 AS BIGINT) AS seq_id,
               count(*) AS n_docs,
               CAST(sum(n_imgs) AS BIGINT) AS n_images,
               CAST(sum(n_text) AS BIGINT) AS text_tokens,
               CAST(sum(n_imgs) * 64 AS BIGINT) AS image_token_cost,
               CAST(sum(cost) AS BIGINT) AS seq_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM cum
        GROUP BY bucket, seq_id
        ORDER BY bucket, seq_id
    """,
    "temperature_sample": """
        WITH docs AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 10 < 6 THEN 'head'
                        WHEN doc_id % 10 < 9 THEN 'body'
                        ELSE 'tail' END AS source
            FROM documents
        ),
        counts AS (
            SELECT source, count(*) AS n FROM docs GROUP BY source
        ),
        mn AS (SELECT min(n) AS nmin FROM counts),
        cutoffs AS (
            SELECT source,
                   CAST(floor(sqrt(CAST(nmin AS DOUBLE) / CAST(n AS DOUBLE))
                              * 4294967296.0) AS BIGINT) AS cutoff
            FROM counts, mn
        )
        SELECT d.doc_id, d.source
        FROM docs d JOIN cutoffs c USING (source)
        WHERE ('0x' || substring(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT
              < c.cutoff
        ORDER BY d.doc_id
    """,
    "host_link_graph": """
        WITH pages AS (
            SELECT 'https://h' || (doc_id % 20)::VARCHAR
                       || '.example.com/p/' || doc_id::VARCHAR AS url,
                   '<html><body><p>intro</p><a href="'
                       || 'https://h' || ((doc_id * 7 + 1) % 20)::VARCHAR
                       || '.example.com/x">one</a> <a href='''
                       || 'https://h' || ((doc_id * 3 + 2) % 20)::VARCHAR
                       || '.example.com/y''>two</a><a href=/rel>skip</a><a href='
                       || 'https://h' || ((doc_id * 7 + 1) % 20)::VARCHAR
                       || '.example.com/bare>three</a><map name=m>'
                       || '<area shape=rect href="'
                       || 'https://h' || ((doc_id * 11 + 5) % 20)::VARCHAR
                       || '.example.com/map"></map></body></html>' AS html
            FROM documents
        ),
        links AS (
            SELECT url AS src_url,
                   unnest(
                       regexp_extract_all(html,
                           '<[aA](?:[rR][eE][aA])?\\s[^>]*[hH][rR][eE][fF]\\s*=\\s*"([^"]*)"', 1)
                       || regexp_extract_all(html,
                           '<[aA](?:[rR][eE][aA])?\\s[^>]*[hH][rR][eE][fF]\\s*=\\s*''([^'']*)''', 1)
                       || regexp_extract_all(html,
                           '<[aA](?:[rR][eE][aA])?\\s[^>]*[hH][rR][eE][fF]\\s*=\\s*([^\\s>"''][^\\s>]*)', 1)
                   ) AS dst_url
            FROM pages
        )
        SELECT lower(regexp_extract(src_url, '^https?://([^/?#]+)', 1))
                   AS src_host,
               lower(regexp_extract(dst_url, '^https?://([^/?#]+)', 1))
                   AS dst_host,
               count(*) AS n_links
        FROM links
        WHERE dst_url LIKE 'http://%' OR dst_url LIKE 'https://%'
        GROUP BY 1, 2
        ORDER BY src_host, dst_host
    """,
    "host_pagerank": """
        WITH es AS (
            SELECT DISTINCT (doc_id % 20) AS src,
                            ((doc_id * 7 + 1) % 20) AS dst
            FROM documents
            UNION
            SELECT DISTINCT (doc_id % 20), ((doc_id * 3 + 2) % 20)
            FROM documents
            UNION
            SELECT DISTINCT (doc_id % 20), ((doc_id * 11 + 5) % 20)
            FROM documents
        ),
        nodes AS (SELECT src AS n FROM es UNION SELECT dst FROM es),
        dg AS (SELECT src, count(*) AS deg FROM es GROUP BY src),
        r0 AS (SELECT n, CAST(1000000000 AS BIGINT) AS rank FROM nodes),
        r1 AS (
            SELECT n.n, CAST(150000000
                       + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS n, sum(r.rank // d.deg) AS c
                FROM es e JOIN r0 r ON r.n = e.src JOIN dg d ON d.src = e.src
                GROUP BY e.dst) s ON s.n = n.n
        ),
        r2 AS (
            SELECT n.n, CAST(150000000
                       + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS n, sum(r.rank // d.deg) AS c
                FROM es e JOIN r1 r ON r.n = e.src JOIN dg d ON d.src = e.src
                GROUP BY e.dst) s ON s.n = n.n
        ),
        r3 AS (
            SELECT n.n, CAST(150000000
                       + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS n, sum(r.rank // d.deg) AS c
                FROM es e JOIN r2 r ON r.n = e.src JOIN dg d ON d.src = e.src
                GROUP BY e.dst) s ON s.n = n.n
        ),
        r4 AS (
            SELECT n.n, CAST(150000000
                       + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS n, sum(r.rank // d.deg) AS c
                FROM es e JOIN r3 r ON r.n = e.src JOIN dg d ON d.src = e.src
                GROUP BY e.dst) s ON s.n = n.n
        ),
        r5 AS (
            SELECT n.n, CAST(150000000
                       + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) AS rank
            FROM nodes n LEFT JOIN (
                SELECT e.dst AS n, sum(r.rank // d.deg) AS c
                FROM es e JOIN r4 r ON r.n = e.src JOIN dg d ON d.src = e.src
                GROUP BY e.dst) s ON s.n = n.n
        )
        SELECT 'h' || n::VARCHAR || '.example.com' AS host, rank
        FROM r5
        ORDER BY host
    """,
    "prepare_corpus_full": """
        WITH src AS (
            SELECT doc_id,
                   coalesce(text, '')
                   || ' contact a1.b-c@mail-host.example.net'
                   || ' or call +1-555-0100-22' AS t
            FROM documents
        ),
        chunks AS (
            SELECT doc_id, i AS pos,
                   array_to_string(w[i*10+1 : i*10+10], ' ') AS line
            FROM (
                SELECT doc_id, w,
                       unnest(range(CAST(ceil(len(w)/10.0) AS BIGINT))) AS i
                FROM (SELECT doc_id, string_split(t, ' ') AS w FROM src)
            )
        ),
        doclines AS (
            SELECT doc_id, CAST(-1 AS BIGINT) AS pos,
                   'Accept cookies to continue' AS line
            FROM documents
            UNION ALL
            SELECT doc_id, pos, line FROM chunks
            UNION ALL
            SELECT doc_id, CAST(2147483647 AS BIGINT),
                   'All rights reserved. Powered by ExampleCMS.'
            FROM documents
        ),
        freq AS (
            SELECT line FROM (
                SELECT line, count(DISTINCT doc_id) AS nd
                FROM doclines GROUP BY line
            ) WHERE nd >= 2
        ),
        cleaned AS (
            SELECT d.doc_id,
                   coalesce(string_agg(d.line, chr(10) ORDER BY d.pos)
                                FILTER (WHERE f.line IS NULL), '') AS text
            FROM doclines d LEFT JOIN freq f ON d.line = f.line
            GROUP BY d.doc_id
        ),
        base AS (
            SELECT doc_id, text,
                   trim(regexp_replace(text, '[ \t\n]+', ' ', 'g')) AS nt
            FROM cleaned
        ),
        dedup AS (
            SELECT min(doc_id) AS doc_id FROM base GROUP BY nt
        ),
        kept AS (
            SELECT b.doc_id, b.text, b.nt FROM base b JOIN dedup USING (doc_id)
        ),
        q AS (
            SELECT doc_id, text,
                   length(text) AS n_chars,
                   CASE WHEN length(nt) = 0 THEN 0
                        ELSE len(string_split(nt, ' ')) END AS n_tokens,
                   length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
            FROM kept
        ),
        scored AS (
            SELECT doc_id, text, n_tokens,
                   floor((least(1.0, n_tokens / 100.0) * 0.5
                          + (CASE WHEN n_chars > 0 THEN n_alpha / n_chars
                                  ELSE 0.0 END) * 0.3
                          + least(1.0, (CASE WHEN n_tokens > 0
                                        THEN (n_chars - (n_tokens - 1)) / n_tokens
                                        ELSE 0.0 END) / 8.0) * 0.2)
                         * 10000.0 + 0.5) / 10000.0 AS quality_score
            FROM q
        ),
        gated AS (
            SELECT doc_id, n_tokens, quality_score,
                   regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+',
                       '<EMAIL>', 'g'),
                       '[+][0-9]{1,2}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}',
                       '<PHONE>', 'g') AS text
            FROM scored
            WHERE quality_score >= 0.3
        ),
        bgrams AS (
            SELECT DISTINCT array_to_string(w[i+1 : i+5], ' ') AS gram
            FROM (
                SELECT w, unnest(range(greatest(len(w) - 4, 0))) AS i
                FROM (
                    SELECT string_split(trim(regexp_replace(
                        coalesce(text, ''), '[ \t\n\r]+', ' ', 'g')), ' ')
                        AS w
                    FROM documents WHERE doc_id % 50 = 0
                )
            )
        ),
        cgrams AS (
            SELECT DISTINCT doc_id, array_to_string(w[i+1 : i+5], ' ') AS gram
            FROM (
                SELECT doc_id, w, unnest(range(greatest(len(w) - 4, 0))) AS i
                FROM (SELECT doc_id, string_split(trim(regexp_replace(
                          text, '[ \t\n\r]+', ' ', 'g')), ' ') AS w
                      FROM gated)
            )
        ),
        bad AS (
            SELECT DISTINCT c.doc_id FROM cgrams c JOIN bgrams b USING (gram)
        )
        SELECT g.doc_id,
               CASE WHEN ('0x' || substring(md5(g.doc_id::VARCHAR), 1, 4))::INT
                         % 10 < 8
                    THEN 'train' ELSE 'test' END AS split,
               g.n_tokens, g.quality_score, g.text
        FROM gated g LEFT JOIN bad ON g.doc_id = bad.doc_id
        WHERE bad.doc_id IS NULL
        ORDER BY g.doc_id
    """,
    "decontaminate_docs": """
        WITH words AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(coalesce(text, ''),
                       '[ \t\n\r]+', ' ', 'g')), ' ') AS w
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(w[i+1 : i+5], ' ') AS gram
            FROM (
                SELECT doc_id, w,
                       unnest(range(greatest(len(w) - 4, 0))) AS i
                FROM words
            )
        ),
        bench AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0
        ),
        totals AS (
            SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
        ),
        hits AS (
            SELECT g.doc_id, count(*) AS n_hits
            FROM grams g JOIN bench b USING (gram)
            GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(t.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               coalesce(h.n_hits, 0) > 0 AS contaminated
        FROM documents d
        LEFT JOIN totals t ON d.doc_id = t.doc_id
        LEFT JOIN hits h ON d.doc_id = h.doc_id
        ORDER BY d.doc_id
    """,
    "warc_roundtrip": """
        SELECT doc_id // 10 AS file_id,
               CAST(row_number() OVER (PARTITION BY doc_id // 10
                                       ORDER BY doc_id) - 1
                   AS INTEGER) AS rec_index,
               'response' AS warc_type,
               'https://crawl.example.com/doc/' || doc_id::VARCHAR
                   AS target_uri,
               CAST(octet_length(encode(coalesce(text, ''))) AS INTEGER)
                   AS n_bytes,
               coalesce(text, '') AS text
        FROM documents
        ORDER BY file_id, rec_index
    """,
    "engine_dispatch": """
        SELECT doc_id,
               CASE WHEN doc_id % 10 = 0 THEN 'mock engine decoder response'
                    ELSE trim(regexp_replace(coalesce(text, ''),
                         '[ \t\n\r]+', ' ', 'g'))
               END AS extracted_text,
               'ok' AS status
        FROM documents
        ORDER BY doc_id
    """,
    "asof_last_order": """
        WITH o1 AS (
            SELECT o_custkey AS user_id, o_orderdate AS ots,
                   max(o_orderkey) AS o_orderkey
            FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, e.user_id, o1.o_orderkey AS last_order_key
        FROM events e ASOF LEFT JOIN o1
          ON e.user_id = o1.user_id AND e.ts >= o1.ots
        ORDER BY e.event_id
    """,
    "topk_orders_per_customer": """
        SELECT o_custkey, rk, o_orderkey, round(o_totalprice, 2) AS price
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
            FROM orders
        )
        WHERE rk <= 3
        ORDER BY o_custkey, rk
    """,
}


# --- generated oracles (md5-hashed dedup tiers) ------------------------------
# The md5 MinHash/SimHash oracles enumerate 32 permutation minima / 62 bit
# votes, so they are GENERATED from the same _PERMS constants the Spark
# plan uses rather than hand-written — one source of truth for the
# permutation parameters.  Formulated doc-level (no exact-collapse): the
# collapse is a pure execution optimization (identical normalized text ⇒
# identical shingle/token sets ⇒ identical signatures and fingerprints),
# so the doc-level formulation is result-identical and much simpler SQL;
# the pytest suite separately asserts collapsed == direct.


def _minhash_md5_oracle() -> str:
    per_band = len(_PERMS) // 8
    mins = ",\n                   ".join(
        f"min(({a} * h31 + {b}) % {_MH_PRIME}) AS m{i}"
        for i, (a, b) in enumerate(_PERMS)
    )
    bands = "\n                OR ".join(
        "("
        + " AND ".join(
            f"a.m{j} = b.m{j}"
            for j in range(bnd * per_band, (bnd + 1) * per_band)
        )
        + ")"
        for bnd in range(8)
    )
    return f"""
        WITH norm AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')), ' ')
                       AS t
            FROM documents
        ),
        idx AS (
            SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
            FROM norm WHERE len(t) >= 3
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
            FROM idx
        ),
        h AS (
            SELECT doc_id, shingle,
                   ('0x' || substring(md5(shingle), 1, 8))::BIGINT
                       % {_MH_PRIME} AS h31
            FROM sh
        ),
        sig AS (
            SELECT doc_id,
                   {mins}
            FROM h GROUP BY doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        cand AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE {bands}
        ),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS n_inter
            FROM cand c
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(n_inter / (sa.n + sb.n - n_inter), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.8
        ORDER BY doc_a, doc_b
    """


def _simhash_md5_oracle(bits: int = 62) -> str:
    votes = ",\n                   ".join(
        f"sum(CASE WHEN ((h62 >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits)
    )
    assemble = "\n             + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i}::BIGINT ELSE 0::BIGINT END)"
        for i in range(bits)
    )
    return f"""
        WITH norm AS (
            SELECT doc_id,
                   trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) AS t
            FROM documents WHERE text IS NOT NULL
        ),
        toks AS (
            SELECT DISTINCT doc_id, unnest(string_split(t, ' ')) AS tok
            FROM norm
        ),
        h AS (
            SELECT doc_id,
                   (('0x' || substring(md5(tok), 1, 8))::BIGINT % 2147483648)
                       * 2147483648
                   + (('0x' || substring(md5(tok), 9, 8))::BIGINT % 2147483648)
                       AS h62
            FROM toks
        ),
        votes AS (
            SELECT doc_id,
                   {votes}
            FROM h GROUP BY doc_id
        )
        SELECT doc_id,
               {assemble} AS simhash
        FROM votes
        ORDER BY doc_id
    """


ORACLES["minhash_lsh_pairs_md5"] = _minhash_md5_oracle()
ORACLES["simhash_fingerprints_md5"] = _simhash_md5_oracle()


# --- generated oracles (hyperplane-LSH / IVF ANN) ----------------------------
# The ANN tiers are approximate-by-construction but fully DETERMINISTIC:
# hyperplanes are fixed LCG ±1 patterns and IVF seeds from label means, so
# an external engine can replay candidate generation exactly.  The plane
# literals are emitted from the SAME _hyperplane() the Spark plan uses —
# one source of truth.  Float determinism: both engines fold the dot
# products over the same float32 leaf values in index order in float64,
# and every EMITTED similarity is rounded to 4dp; the only cross-engine
# exposure is the sign test of raw bucket dots / argmax over cell sims,
# which can differ only on exact float ties (checked empirically at all
# three SFs by tools/check_contract.py).


def _plane_sql(plane_id: int, dim: int = 64) -> str:
    from open_ocr_spark.dataops.similarity import _hyperplane

    vals = ", ".join(
        "1.0" if x > 0 else "-1.0" for x in _hyperplane(dim, plane_id)
    )
    return f"[{vals}]"


def _bucket_sql(vec_expr: str, n_planes: int = 8, plane_offset: int = 0) -> str:
    bits = "\n                 + ".join(
        f"(CASE WHEN list_dot_product({vec_expr}, {_plane_sql(p + plane_offset)})"
        f" >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"({bits})"


def _lsh_topk_oracle() -> str:
    return f"""
        WITH b AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v,
                   {_bucket_sql('embedding::DOUBLE[]')} AS bucket
            FROM embeddings
        ),
        q AS (SELECT v AS qe, bucket AS qb FROM b WHERE vec_id = 0)
        SELECT vec_id, label,
               round(list_dot_product(v, qe)
                     / (sqrt(list_dot_product(v, v))
                        * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
        FROM b, q
        WHERE vec_id != 0 AND bucket = qb
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """


_NEAR_DUP_CORPUS_SQL = """
        base AS (
            SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        ),
        pert AS (
            SELECT vec_id + 100000 AS vec_id,
                   list_prepend(CAST(CAST(e[1] + 0.05 AS FLOAT) AS DOUBLE),
                                e[2:]) AS e
            FROM base WHERE vec_id % 10 = 0
        ),
        corpus AS (
            SELECT * FROM base UNION ALL SELECT * FROM pert
        )"""


def _near_dup_lsh_oracle(bands: int = 2, n_planes: int = 8) -> str:
    band_selects = "\n            UNION ALL\n            ".join(
        f"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.e AS ea, b.e AS eb
            FROM (SELECT vec_id, e, {_bucket_sql('e', n_planes, bnd * n_planes)}
                      AS bkt FROM corpus) a
            JOIN (SELECT vec_id, e, {_bucket_sql('e', n_planes, bnd * n_planes)}
                      AS bkt FROM corpus) b
              ON a.bkt = b.bkt AND a.vec_id < b.vec_id"""
        for bnd in range(bands)
    )
    return f"""
        WITH {_NEAR_DUP_CORPUS_SQL},
        cand AS (
            {band_selects}
        )
        SELECT DISTINCT vec_a, vec_b,
               round(list_dot_product(ea, eb)
                     / (sqrt(list_dot_product(ea, ea))
                        * sqrt(list_dot_product(eb, eb))), 4) AS cos_sim
        FROM cand
        WHERE round(list_dot_product(ea, eb)
                    / (sqrt(list_dot_product(ea, ea))
                       * sqrt(list_dot_product(eb, eb))), 4) >= 0.99
    """


def _ivf_topk_oracle(k: int = 10, nprobe: int = 2, dim: int = 64) -> str:
    return f"""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        ),
        pos AS (SELECT unnest(range({dim})) AS p),
        seed AS (
            SELECT cell, list(m ORDER BY p) AS centroid FROM (
                SELECT label AS cell, p, round(avg(v[p + 1]), 4) AS m
                FROM e, pos GROUP BY label, p
            ) GROUP BY cell
        ),
        a1 AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, s.cell, row_number() OVER (
                    PARTITION BY e.vec_id ORDER BY
                    coalesce(CASE WHEN list_dot_product(e.v, e.v) > 0
                                   AND list_dot_product(s.centroid, s.centroid) > 0
                             THEN list_dot_product(e.v, s.centroid)
                                  / (sqrt(list_dot_product(e.v, e.v))
                                     * sqrt(list_dot_product(s.centroid, s.centroid)))
                             END, -1.0) DESC, s.cell ASC) AS rn
                FROM e, seed s
            ) WHERE rn = 1
        ),
        refined AS (
            SELECT cell, list(m ORDER BY p) AS centroid FROM (
                SELECT a1.cell, p, avg(e.v[p + 1]) AS m
                FROM e JOIN a1 USING (vec_id), pos GROUP BY a1.cell, p
            ) GROUP BY cell
        ),
        a2 AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, r.cell, row_number() OVER (
                    PARTITION BY e.vec_id ORDER BY
                    coalesce(CASE WHEN list_dot_product(e.v, e.v) > 0
                                   AND list_dot_product(r.centroid, r.centroid) > 0
                             THEN list_dot_product(e.v, r.centroid)
                                  / (sqrt(list_dot_product(e.v, e.v))
                                     * sqrt(list_dot_product(r.centroid, r.centroid)))
                             END, -1.0) DESC, r.cell ASC) AS rn
                FROM e, refined r
            ) WHERE rn = 1
        ),
        q AS (SELECT v AS qe FROM e WHERE vec_id = 0),
        probe AS (
            SELECT r.cell FROM refined r, q
            ORDER BY list_dot_product(r.centroid, qe)
                     / (sqrt(list_dot_product(r.centroid, r.centroid))
                        * sqrt(list_dot_product(qe, qe))) DESC, r.cell ASC
            LIMIT {nprobe}
        )
        SELECT e.vec_id, e.label,
               round(list_dot_product(e.v, qe)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
        FROM e JOIN a2 USING (vec_id), q
        WHERE a2.cell IN (SELECT cell FROM probe) AND e.vec_id != 0
        ORDER BY cos_sim DESC, e.vec_id ASC
        LIMIT {k}
    """


ORACLES["embedding_lsh_topk"] = _lsh_topk_oracle()
ORACLES["embedding_near_dup_lsh"] = _near_dup_lsh_oracle()
ORACLES["embedding_ivf_topk"] = _ivf_topk_oracle()


# --- generated oracles (integer-exact k-means / SemDeDup) --------------------
# The k-means oracle unrolls every Lloyd iteration as a CTE, exactly like
# host_pagerank's r0..r5: all state is scaled integers, so DuckDB's
# double arithmetic replays the loop bit-exactly (< 2^53 everywhere).


def _kmeans_ctes(iters: int = 2, dim: int = 64, source: str = "q_src") -> str:
    """CTE chain q, c0, a1, c1, ..., af over `source(vec_id, label,
    e DOUBLE[])` mirroring dataops/kmeans.py: quantize -> label-seeded
    integer means -> iters x (argmin assign, integer-mean update) ->
    final assign."""
    assign = """a{t} AS (
            SELECT vec_id, cell FROM (
                SELECT q.vec_id, c.cell,
                       row_number() OVER (PARTITION BY q.vec_id ORDER BY
                           (list_dot_product(c.cq, c.cq)
                            - 2 * list_dot_product(q.vq, c.cq)) ASC,
                           c.cell ASC) AS rn
                FROM q CROSS JOIN c{prev} c
            ) WHERE rn = 1
        )"""
    parts = [f"""q AS (
        SELECT vec_id, label,
               list_transform(e, v -> round(v * 10000, 0)) AS vq
        FROM {source}
    )""", f"""c0 AS (
        SELECT cell, list(m ORDER BY pos) AS cq FROM (
            SELECT cell, i AS pos, floor(sum(vq[i+1]) / count(*)) AS m
            FROM (SELECT label AS cell, vq, unnest(range({dim})) AS i FROM q)
            GROUP BY cell, i
        ) GROUP BY cell
    )"""]
    for t in range(1, iters + 1):
        parts.append(assign.format(t=t, prev=t - 1))
        parts.append(f"""c{t} AS (
            SELECT cell, list(m ORDER BY pos) AS cq FROM (
                SELECT cell, i AS pos, floor(sum(vq[i+1]) / count(*)) AS m
                FROM (SELECT a.cell, q.vq, unnest(range({dim})) AS i
                      FROM q JOIN a{t} a ON a.vec_id = q.vec_id)
                GROUP BY cell, i
            ) GROUP BY cell
        )""")
    parts.append(assign.format(t="f", prev=iters))
    return ",\n".join(parts)


def _kmeans_oracle(iters: int = 2) -> str:
    return f"""
        WITH q_src AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
        ),
        {_kmeans_ctes(iters)}
        SELECT vec_id, cell FROM af ORDER BY vec_id
    """


def _semdedup_oracle(iters: int = 2, threshold: float = 0.99) -> str:
    # same perturbed corpus as the embedding_near_dup family
    return f"""
        WITH base AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
        ),
        pert AS (
            SELECT vec_id + 100000 AS vec_id, label,
                   list_prepend(CAST(CAST(e[1] + 0.05 AS FLOAT) AS DOUBLE),
                                e[2:]) AS e
            FROM base WHERE vec_id % 10 = 0
        ),
        q_src AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        {_kmeans_ctes(iters)},
        wc AS (
            SELECT s.vec_id, a.cell, s.e
            FROM q_src s JOIN af a ON a.vec_id = s.vec_id
        ),
        dropped AS (
            SELECT DISTINCT b.vec_id
            FROM wc a JOIN wc b ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.e, b.e)
                  / (sqrt(list_dot_product(a.e, a.e))
                     * sqrt(list_dot_product(b.e, b.e))), 4) >= {threshold}
        )
        SELECT w.vec_id, w.cell, d.vec_id IS NULL AS kept
        FROM wc w LEFT JOIN dropped d ON d.vec_id = w.vec_id
        ORDER BY w.vec_id
    """


ORACLES["kmeans_clusters"] = _kmeans_oracle()
ORACLES["semantic_dedup"] = _semdedup_oracle()
ORACLES["classifier_train"] = _classifier_train_oracle()

ORACLES["char_entropy"] = """
    WITH chars AS (
        SELECT doc_id, unnest(string_split(coalesce(text, ''), '')) AS ch
        FROM documents
    ),
    hist AS (
        SELECT doc_id, ch, count(*) AS c
        FROM chars WHERE ch != '' GROUP BY doc_id, ch
    ),
    tot AS (SELECT doc_id, sum(c) AS n FROM hist GROUP BY doc_id),
    ent AS (
        SELECT h.doc_id, max(t.n) AS n_chars,
               round(-sum((h.c::DOUBLE / t.n) * log2(h.c::DOUBLE / t.n)), 4)
                   AS entropy_bits
        FROM hist h JOIN tot t USING (doc_id) GROUP BY h.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(e.n_chars, 0) AS BIGINT) AS n_chars,
           coalesce(e.entropy_bits, 0.0) AS entropy_bits
    FROM documents d LEFT JOIN ent e ON e.doc_id = d.doc_id
    ORDER BY d.doc_id
"""


def _phrase_gate_oracle() -> str:
    # generated from the SAME alternation builder the Spark plan uses —
    # one source of truth for escaping and longest-first order
    from open_ocr_spark.dataops.quality_rules import _phrase_regex

    pat = _phrase_regex(_BLOCKLIST).replace("'", "''")
    return f"""
        SELECT doc_id,
               len(regexp_extract_all(coalesce(text, ''),
                                      '{pat}', 0))::BIGINT AS n_hits,
               len(regexp_extract_all(coalesce(text, ''),
                                      '{pat}', 0)) > 0 AS blocked
        FROM documents
        ORDER BY doc_id
    """


ORACLES["phrase_gate"] = _phrase_gate_oracle()

ORACLES["robots_meta"] = """
    WITH hosts AS (SELECT DISTINCT (doc_id % 20) AS hid FROM documents)
    SELECT 'h' || hid::VARCHAR || '.example.com' AS host,
           CAST(hid * 1000 + 500 AS BIGINT) AS crawl_delay_ms,
           s.sm_index,
           'https://h' || hid::VARCHAR || '.example.com/' || s.name
               AS sitemap
    FROM hosts, (VALUES (0, 'sitemap.xml'), (1, 'news.xml'))
        AS s(sm_index, name)
    ORDER BY host, sm_index
"""

ORACLES["warc_http"] = """
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 4 THEN NULL
                ELSE 200 + (doc_id % 2) * 204 END AS http_status,
           CASE WHEN doc_id % 5 = 4 THEN NULL
                ELSE 'text/html; charset=utf-8' END AS http_content_type,
           CASE WHEN doc_id % 5 = 4 THEN NULL
                ELSE coalesce(text, '') END AS body_text,
           CASE WHEN doc_id % 5 = 4 THEN 'truncated chunk data'
                ELSE NULL END AS http_error
    FROM documents
    ORDER BY doc_id
"""


def _cdx_oracle() -> str:
    pre = _WRAP_PREFIX.replace("'", "''")
    suf = _WRAP_SUFFIX.replace("'", "''")
    return f"""
        SELECT 'com,example,docs)/doc/' || doc_id::VARCHAR AS surt,
               TIMESTAMP '2024-01-01 00:00:00' AS warc_ts,
               'https://docs.example.com/doc/' || doc_id::VARCHAR AS url,
               md5('{pre}' || coalesce(text, '') || '{suf}') AS digest
        FROM documents
        ORDER BY surt
    """


ORACLES["cdx_index"] = _cdx_oracle()


def _lang_id_fixture_oracle() -> str:
    from open_ocr_spark.dataops.textstats import LANG_ID_FIXTURE

    values = ", ".join(
        f"({i}, '{lang}', '{lang}')"
        for i, (lang, _) in enumerate(LANG_ID_FIXTURE)
    )
    return f"""
        SELECT * FROM (VALUES {values})
            AS t(sample_id, expected, lang_pred)
        ORDER BY sample_id
    """


ORACLES["lang_id_fixture"] = _lang_id_fixture_oracle()
