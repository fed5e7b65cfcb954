"""Engine-independent HyperLogLog sketch (Flajolet et al. 2007) built
from md5 — the oracle-checkable twin of `approx_count_distinct`.

Spark's built-in HLL++ is sealed inside the JVM (xxhash64 + bias tables),
so `approx_distinct_users` can only ever get a rows-only driver check.
This module rebuilds the sketch from primitives both engines share —
`md5`, integer arithmetic, `bin()` (minimal-width binary, identical in
Spark and DuckDB) — so the REGISTER TABLE is bit-identical across
engines and parallelism levels and the driver can hash-compare it.

Layout: 60-bit hash from the first 15 md5 hex digits (sign-safe in
int64); low p bits select one of m=2^p registers; the remaining 60-p
bits w give rho = leading-zero count + 1 = (60-p) - bitlen(w) + 1,
computed EXACTLY as length(bin(w)) — no float log2 anywhere.  The
sketch itself (register values, and the histogram the query returns) is
pure integers; the float estimate is derived OUTSIDE the data plane
(`estimate_from_histogram`, used by tests to bound error vs exact).

Scale: one hash-partial groupBy(bucket).max(rho) over the corpus — the
classic mergeable-sketch shape; register maxes combine associatively so
map-side partial aggregation does almost all the work, and the final
histogram is at most m rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 md5 hex digits: positive in int64 on both engines


def _hash60(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def hll_registers(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """(bucket, rho): the nonempty HLL registers — exact integers,
    deterministic at any parallelism."""
    m = 1 << p
    wbits = HASH_BITS - p
    h = _hash60(F.col(col))
    w = F.shiftright(h, p)  # top 60-p bits (exact: never float division)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select((h % m).cast("int").alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def hll_register_histogram(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """(rho, n_buckets): the register-value histogram — the sketch
    compressed to <= 60-p+1 rows, still losslessly enough to compute the
    cardinality estimate (empty registers = m - sum(n_buckets))."""
    return (
        hll_registers(df, col, p)
        .groupBy("rho")
        .agg(F.count("*").alias("n_buckets"))
    )


def estimate_from_histogram(rows, p: int = 12) -> float:
    """The HLL cardinality estimate (with the standard small-range
    linear-counting correction) from (rho, n_buckets) pairs.  Driver-side
    model math over <= 50 values — never touches the data plane."""
    m = 1 << p
    nonempty = sum(n for _, n in rows)
    zeros = m - nonempty
    s = zeros * 1.0 + sum(n * 2.0 ** -rho for rho, n in rows)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / s
    if e <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return e
