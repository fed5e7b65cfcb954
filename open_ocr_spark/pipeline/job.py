"""End-to-end extraction job: read → ingest → dedupe → bucket → extract →
write + manifest. This is the reference's whole §3.1 lifecycle as ONE batch
plan, plus resumability.

Two entry points:
- ``extraction_plan``      pure DataFrame → DataFrame (what tests/oracle
                           compare; no side effects; single Spark job)
- ``run_extraction_job``   the resumable spark-submit job: processes
                           bucket groups, committing a manifest per bucket
                           (checkpoint.py); a rerun skips committed buckets
                           via partition pruning before any work happens.

At 100 TB the bucket count is sized so one bucket ≈ a few hundred GB of
input (e.g. B=1024); locally the tests use B=8. Buckets are processed in
groups per Spark action to amortize job-scheduling overhead while keeping
the commit granularity fine enough for cheap resume.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_ocr_spark.pipeline.checkpoint import (
    BUCKET_COL,
    commit_bucket,
    committed_buckets,
    derive_snapshot_id,
    read_manifests,
    snapshot_chain,
    with_bucket,
    write_snapshot,
)
from open_ocr_spark.pipeline.dedupe import latest_per_url
from open_ocr_spark.pipeline.ingest import ingest
from open_ocr_spark.pipeline.partitioning import bucket_by_url_hash
from open_ocr_spark.pipeline.stages import extract_stage, mock_stage


def extraction_plan(
    pages: DataFrame,
    *,
    num_partitions: int | None = None,
    use_mock: bool = False,
) -> DataFrame:
    """The flagship query as a single declarative plan:

        scan → ingest-normalize → latest-per-url dedupe (ONE url-hash
        shuffle) → mapInArrow extraction kernel

    (SURVEY.md §7.1 minimum slice). Returns (url, extracted_text, status,
    error, n_bytes).

    The dedupe's groupBy(url) exchange IS the bucket-by-url-hash shuffle:
    its output is already hash-distributed by url, so no second exchange
    sits in front of the kernel. ``num_partitions`` forces an explicit
    extra repartition — used by tests to prove partition-count invariance,
    never on the hot path.

    Column pruning happens BEFORE the dedupe, not after: any column left
    in the frame here (the crawl table's ``text`` snapshot column in
    particular — as large as ``html``) would ride the url-hash exchange
    and the window sort buffers. Projecting first roughly halves the
    shuffle volume on an input_hint-shaped table."""
    df = ingest(pages)
    needed = ["url", "warc_ts", "html", "lang"]
    from open_ocr_spark.pipeline.stages import _OPTION_COLS

    keep = needed + [c for c in _OPTION_COLS if c in df.columns]
    df = df.select(*[c for c in keep if c in df.columns])
    df = latest_per_url(df)
    if num_partitions:
        df = bucket_by_url_hash(df, num_partitions)
    return mock_stage(df) if use_mock else extract_stage(df)


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    *,
    num_buckets: int = 8,
    buckets_per_commit: int = 1,
    input_snapshot_id: str | None = None,
    run_id: str | None = None,
    max_buckets: int | None = None,
    use_mock: bool = False,
) -> dict:
    """Resumable extraction over bucket groups.

    ``max_buckets`` processes only that many uncommitted buckets then stops
    — the kill-after-k hook the resume test uses (SURVEY.md §5.2.4).
    ``input_snapshot_id`` defaults to a fingerprint of the input file
    listing (checkpoint.derive_snapshot_id); on resume, committed manifests
    written against a DIFFERENT snapshot id are surfaced in the summary
    (``snapshot_mismatch_buckets``) and as a warning — their outputs were
    computed from an input that has since changed.
    Returns summary counters.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    if input_snapshot_id is None:
        input_snapshot_id = derive_snapshot_id(pages)
    done = committed_buckets(out_dir)
    # manifests from before snapshot-id derivation carry the old default
    # constant (or nothing): treat those as UNKNOWN, not stale — flagging
    # every legacy bucket would teach operators to ignore the warning
    _legacy_ids = (None, "snapshot-0")
    stale = sorted(
        m["bucket"]
        for m in read_manifests(out_dir)
        if m.get("input_snapshot_id") not in _legacy_ids
        and m.get("input_snapshot_id") != input_snapshot_id
    )
    if stale:
        import warnings

        warnings.warn(
            f"resume: {len(stale)} committed bucket(s) {stale} were built "
            f"from a different input snapshot than the current one "
            f"({input_snapshot_id}); their outputs may be stale",
            stacklevel=2,
        )
    all_buckets = [b for b in range(num_buckets) if b not in done]
    if max_buckets is not None:
        all_buckets = all_buckets[:max_buckets]

    if not all_buckets:
        chain = snapshot_chain(out_dir)
        return {
            "run_id": run_id,
            "buckets_processed": 0,
            "docs": 0,
            "snapshot_mismatch_buckets": stale,
            # no-op runs add no snapshot; report the current head
            "snapshot_id": chain[-1]["snapshot_id"] if chain else None,
        }

    base = with_bucket(ingest(pages), num_buckets)

    total_docs = 0
    processed = 0
    for group_start in range(0, len(all_buckets), buckets_per_commit):
        group = all_buckets[group_start : group_start + buckets_per_commit]
        # partition-prune committed buckets BEFORE the dedupe work: the
        # filter sits directly on the scan projection
        subset = base.filter(F.col(BUCKET_COL).isin(group))
        result = extraction_plan(
            subset.drop(BUCKET_COL), use_mock=use_mock
        ).withColumn(
            BUCKET_COL,
            F.pmod(F.xxhash64(F.col("url")), F.lit(num_buckets)),
        )
        # ONE action per group: the dynamic-partition-overwrite write (only
        # this group's bucket dirs are replaced; committed buckets are
        # untouched), with per-bucket manifest stats collected as
        # df.observe() metrics DURING that same pass — no persist/cache of
        # the extraction output (at 100 TB a cached group would not fit),
        # no second job. Manifests commit strictly after the write — a
        # kill between them recomputes the group idempotently.
        from pyspark.sql import Observation

        obs = Observation(f"bucket-stats-{group_start}")
        aggs = []
        for b in group:
            in_b = F.col(BUCKET_COL) == b
            aggs += [
                F.sum(in_b.cast("long")).alias(f"docs_{b}"),
                F.sum(F.when(in_b, F.col("n_bytes")).otherwise(0)).alias(
                    f"bytes_{b}"
                ),
                F.sum(
                    F.when(in_b & (F.col("status") != "ok"), 1).otherwise(0)
                ).alias(f"failures_{b}"),
            ]
        (
            # dir name must not start with '_' (Spark's file index
            # hides underscore-prefixed paths) -> rename for the write
            result.observe(obs, *aggs)
            .withColumnRenamed(BUCKET_COL, "bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(f"{out_dir}/data")
        )
        stats = obs.get  # blocks until the write action finishes
        for b in group:
            docs = stats.get(f"docs_{b}") or 0
            commit_bucket(
                out_dir,
                b,
                run_id=run_id,
                input_snapshot_id=input_snapshot_id,
                docs=docs,
                bytes_processed=stats.get(f"bytes_{b}") or 0,
                failures=stats.get(f"failures_{b}") or 0,
            )
            total_docs += docs
            processed += 1

    snapshot = write_snapshot(
        out_dir,
        run_id=run_id,
        input_snapshot_id=input_snapshot_id,
        buckets_processed=[b for b in all_buckets],
    )
    return {
        "run_id": run_id,
        "buckets_processed": processed,
        "docs": total_docs,
        "snapshot_mismatch_buckets": stale,
        "snapshot_id": snapshot["snapshot_id"],
    }


def read_extracted(
    spark: SparkSession, out_dir: str, as_of: str | int | None = None
) -> DataFrame:
    """Read the extracted table; ``as_of`` (snapshot_id or sequence
    number) time-travels to that snapshot's committed-bucket set — a
    partition-pruning filter on the bucket column, so unselected bucket
    directories are never scanned. Committed buckets are immutable (only
    uncommitted buckets are ever overwritten, and recomputes are
    byte-identical), so an as-of read reproduces that run's state
    exactly."""
    df = spark.read.parquet(f"{out_dir}/data")
    if as_of is not None:
        chain = snapshot_chain(out_dir)
        match = [
            s for s in chain
            if s["snapshot_id"] == as_of or s["sequence_number"] == as_of
        ]
        if not match:
            known = [s["snapshot_id"] for s in chain]
            raise ValueError(f"unknown snapshot {as_of!r}; have {known}")
        df = df.filter(F.col("bucket").isin(match[0]["committed_buckets"]))
    # partition discovery surfaces the bucket dir as a column; hide it
    return df.drop("bucket") if "bucket" in df.columns else df
