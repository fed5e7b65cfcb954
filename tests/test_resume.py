"""Resume tier (SURVEY.md §5.2.4): kill after k buckets, restart, assert
zero recomputation and byte-identical final output vs an uninterrupted
run."""

import pyspark.sql.functions as F

from open_ocr_spark.fixtures import golden_df, pages_df
from open_ocr_spark.pipeline.checkpoint import committed_buckets, read_manifests
from open_ocr_spark.pipeline.job import read_extracted, run_extraction_job

N_ROWS = 200
BUCKETS = 6


def test_kill_resume_identical_output(spark, tmp_path):
    pages = pages_df(spark, N_ROWS)
    out_interrupted = str(tmp_path / "interrupted")
    out_clean = str(tmp_path / "clean")

    # killed run: stops after 2 buckets
    first = run_extraction_job(
        spark, pages, out_interrupted, num_buckets=BUCKETS, max_buckets=2
    )
    assert first["buckets_processed"] == 2
    assert len(committed_buckets(out_interrupted)) == 2

    # resume: must process exactly the remaining buckets
    second = run_extraction_job(
        spark, pages, out_interrupted, num_buckets=BUCKETS
    )
    assert second["buckets_processed"] == BUCKETS - 2
    assert len(committed_buckets(out_interrupted)) == BUCKETS

    # third run: idempotent no-op
    third = run_extraction_job(spark, pages, out_interrupted, num_buckets=BUCKETS)
    assert third["buckets_processed"] == 0

    # uninterrupted reference run
    run_extraction_job(spark, pages, out_clean, num_buckets=BUCKETS)

    a = read_extracted(spark, out_interrupted).select(
        "url", "extracted_text", "status"
    )
    b = read_extracted(spark, out_clean).select("url", "extracted_text", "status")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_manifest_lineage_counts(spark, tmp_path):
    pages = pages_df(spark, N_ROWS)
    out = str(tmp_path / "run")
    run_extraction_job(
        spark, pages, out, num_buckets=4, input_snapshot_id="snap-42"
    )
    manifests = read_manifests(out)
    assert len(manifests) == 4
    assert all(m["input_snapshot_id"] == "snap-42" for m in manifests)
    total = sum(m["docs_processed"] for m in manifests)
    golden = golden_df(spark, N_ROWS)
    assert total == golden.count()
    failures = sum(m["failure_count"] for m in manifests)
    expected_failures = golden.filter(F.col("status") != "ok").count()
    assert failures == expected_failures


def test_snapshot_id_derived_and_mismatch_surfaced(spark, tmp_path):
    """input_snapshot_id defaults to a fingerprint of the input file
    listing; rewriting the input between a kill and a resume changes the
    id, and the resume surfaces the committed-under-old-snapshot buckets."""
    import warnings

    from open_ocr_spark.pipeline.checkpoint import derive_snapshot_id

    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    pages_df(spark, N_ROWS).write.parquet(src)

    pages1 = spark.read.parquet(src)
    snap1 = derive_snapshot_id(pages1)
    assert snap1.startswith("snap-")
    assert derive_snapshot_id(spark.read.parquet(src)) == snap1  # stable

    first = run_extraction_job(spark, pages1, out, num_buckets=4, max_buckets=2)
    assert first["snapshot_mismatch_buckets"] == []
    for m in read_manifests(out):
        assert m["input_snapshot_id"] == snap1

    # rewrite the input (same rows, new files): snapshot id must change
    pages_df(spark, N_ROWS).repartition(3).write.mode("overwrite").parquet(src)
    pages2 = spark.read.parquet(src)
    snap2 = derive_snapshot_id(pages2)
    assert snap2 != snap1

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        second = run_extraction_job(spark, pages2, out, num_buckets=4)
    assert len(second["snapshot_mismatch_buckets"]) == 2  # the killed run's
    assert any("different input snapshot" in str(w.message) for w in caught)
    # and the new manifests carry the new snapshot id
    snap_ids = {m["input_snapshot_id"] for m in read_manifests(out)}
    assert snap_ids == {snap1, snap2}


def test_snapshot_seq_survives_deleted_earlier_snapshot(tmp_path):
    """Sequence numbers come from max(existing)+1, not len(chain): deleting
    an early snapshot file must never cause the next run to REUSE a live
    sequence number and overwrite a committed snapshot (ADVICE r2)."""
    import os

    import pytest as _pytest

    from open_ocr_spark.pipeline.checkpoint import (
        snapshot_chain,
        write_snapshot,
    )

    out = str(tmp_path / "run")
    for i in range(3):
        write_snapshot(out, run_id=f"r{i}", input_snapshot_id="snap-x",
                       buckets_processed=[i])
    os.unlink(os.path.join(out, "snapshots", "snap-000000.json"))

    snap = write_snapshot(out, run_id="r3", input_snapshot_id="snap-x",
                          buckets_processed=[3])
    assert snap["sequence_number"] == 3  # NOT 2 == len(remaining chain)
    seqs = [s["sequence_number"] for s in snapshot_chain(out)]
    assert seqs == [1, 2, 3]  # nothing overwritten

    # and a forced collision fails loudly instead of overwriting
    collider = os.path.join(out, "snapshots", "snap-000004.json")
    with open(collider, "w") as f:
        f.write("{}")
    with _pytest.raises(RuntimeError, match="snapshot collision"):
        write_snapshot(out, run_id="r4", input_snapshot_id="snap-x",
                       buckets_processed=[4])


def test_snapshot_commit_without_hardlinks(tmp_path, monkeypatch):
    """On filesystems where os.link raises OSError (object-store FUSE
    mounts: EPERM/EOPNOTSUPP), the commit falls back to an atomic
    os.replace — still succeeds, a collision still fails loudly, and no
    tmp file or torn final file is ever left behind (an O_EXCL+write
    fallback would leave a torn snap-NNNNNN.json on a crash mid-copy,
    which poisons snapshot_chain and blocks every later commit)."""
    import errno
    import os

    import pytest as _pytest

    from open_ocr_spark.pipeline.checkpoint import (
        snapshot_chain,
        write_snapshot,
    )

    def no_link(src, dst, **kw):
        raise OSError(errno.EPERM, "hard links not supported")

    monkeypatch.setattr(os, "link", no_link)
    out = str(tmp_path / "run")
    for i in range(2):
        write_snapshot(out, run_id=f"r{i}", input_snapshot_id="snap-x",
                       buckets_processed=[i])
    seqs = [s["sequence_number"] for s in snapshot_chain(out)]
    assert seqs == [0, 1]
    # fallback commits are complete JSON and leave no tmp residue
    import json

    sdir = os.path.join(out, "snapshots")
    names = sorted(os.listdir(sdir))
    assert names == ["snap-000000.json", "snap-000001.json"]
    for name in names:
        with open(os.path.join(sdir, name)) as f:
            assert "snapshot_id" in json.load(f)
    # exclusivity preserved through the fallback path too
    collider = os.path.join(out, "snapshots", "snap-000002.json")
    with open(collider, "w") as f:
        f.write("{}")
    with _pytest.raises(RuntimeError, match="snapshot collision"):
        write_snapshot(out, run_id="r2", input_snapshot_id="snap-x",
                       buckets_processed=[2])


def test_snapshot_chain_and_time_travel(spark, tmp_path):
    """Each completed run appends one snapshot with a parent link; reading
    as-of an earlier snapshot returns exactly the buckets committed then,
    byte-identical; no-op runs add no snapshot."""
    from open_ocr_spark.pipeline.checkpoint import snapshot_chain

    pages = pages_df(spark, N_ROWS)
    out = str(tmp_path / "run")

    first = run_extraction_job(spark, pages, out, num_buckets=4, max_buckets=2)
    second = run_extraction_job(spark, pages, out, num_buckets=4)
    noop = run_extraction_job(spark, pages, out, num_buckets=4)

    chain = snapshot_chain(out)
    assert len(chain) == 2  # the no-op added none
    assert chain[0]["parent_snapshot_id"] is None
    assert chain[1]["parent_snapshot_id"] == chain[0]["snapshot_id"]
    assert first["snapshot_id"] == chain[0]["snapshot_id"]
    assert noop["snapshot_id"] == chain[1]["snapshot_id"]
    assert len(chain[0]["committed_buckets"]) == 2
    assert len(chain[1]["committed_buckets"]) == 4

    full = read_extracted(spark, out).count()
    asof1 = read_extracted(spark, out, as_of=chain[0]["snapshot_id"])
    asof1_by_seq = read_extracted(spark, out, as_of=0)
    assert asof1.count() == asof1_by_seq.count() < full
    # as-of content equals the subset of today's table in those buckets
    assert asof1.exceptAll(read_extracted(spark, out)).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown snapshot"):
        read_extracted(spark, out, as_of="nope")
