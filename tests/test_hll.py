"""md5-based HyperLogLog: registers vs a pure-Python reference,
estimate accuracy vs exact, parallelism invariance."""

import hashlib

from pyspark.sql import functions as F

from open_ocr_spark.dataops.hll import (
    estimate_from_histogram,
    hll_register_histogram,
    hll_registers,
)


def _ref_registers(values, p=12):
    regs = {}
    wbits = 60 - p
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        bucket, w = h % (1 << p), h >> p
        rho = wbits + 1 if w == 0 else wbits + 1 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_registers_match_reference(spark):
    vals = [f"user-{i}" for i in range(500)] + ["user-7", "user-7"]
    df = spark.createDataFrame([(v,) for v in vals], "uid string")
    got = {r.bucket: r.rho for r in hll_registers(df, "uid").collect()}
    assert got == _ref_registers(vals)


def test_histogram_consistent_with_registers(spark):
    df = spark.range(300).select(F.col("id").cast("string").alias("uid"))
    regs = hll_registers(df, "uid").collect()
    hist = {
        r.rho: r.n_buckets
        for r in hll_register_histogram(df, "uid").collect()
    }
    want = {}
    for r in regs:
        want[r.rho] = want.get(r.rho, 0) + 1
    assert hist == want


def test_estimate_within_tolerance(spark):
    # p=12 -> relative error sigma ~ 1.04/sqrt(4096) = 1.6%; allow 5%
    n = 20_000
    df = spark.range(n).select(F.col("id").cast("string").alias("uid"))
    rows = [
        (r.rho, r.n_buckets)
        for r in hll_register_histogram(df, "uid").collect()
    ]
    est = estimate_from_histogram(rows)
    assert abs(est - n) / n < 0.05


def test_linear_counting_small_range(spark):
    df = spark.range(40).select(F.col("id").cast("string").alias("uid"))
    rows = [
        (r.rho, r.n_buckets)
        for r in hll_register_histogram(df, "uid").collect()
    ]
    est = estimate_from_histogram(rows)
    assert abs(est - 40) / 40 < 0.1


def test_parallelism_invariant(spark):
    df = spark.range(2_000).select(F.col("id").cast("string").alias("uid"))
    outs = []
    for parts in ("2", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            outs.append(
                sorted(
                    (r.rho, r.n_buckets)
                    for r in hll_register_histogram(df, "uid").collect()
                )
            )
        finally:
            spark.conf.unset("spark.sql.shuffle.partitions")
    assert outs[0] == outs[1]


def test_register_agg_is_single_exchange(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("uid"))
    plan = (
        hll_registers(df, "uid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one shuffle on bucket; partial max happens map-side
    assert plan.count("Exchange") == 1
