"""Count-Min sketch over md5 hash rows — the heavy-hitter counter.

Completes the repo's sketch tier (Bloom membership `bloom.py`, HLL
cardinality `hll.py`): CMS answers "roughly how often does key X
occur" in O(d·w) memory regardless of key cardinality (Cormode &
Muthukrishnan 2005).  d independent hash rows each bucket every
occurrence into w counters; a key's estimate is the MIN of its d
counters — always ≥ the true count (collisions only add), with the
overestimate bounded by N·e/w at confidence 1-e^-d.

Engine-exact discipline (the hll_distinct_md5 pattern): row i's hash is
``('0x' || substr(md5(i || ':' || key), 1, 8)) % w`` — md5 exists
bit-identically in both engines, so the sketch, the estimates, and
every collision are reproducible in the DuckDB oracle, and the
overestimate-≥-truth invariant is hash-checked rather than asserted.

Scale shape: the sketch build is ONE hash aggregate over the exploded
(row, bucket) stream — d·w ≤ a few thousand reduce keys, map-side
combine collapses everything before the exchange; estimation broadcasts
the finished sketch (d·w rows) against the query keys.  The sketch
never grows with the corpus: that is its whole point at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row: int, width: int) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{row}:"), key)), 1, 8), 16, 10
    ).cast("long") % F.lit(width)


def cms_build(
    items: DataFrame, key_col: str = "key", depth: int = 4, width: int = 64
) -> DataFrame:
    """(row, bucket, cnt): the d×w counter table for one occurrence
    stream.  Buckets with zero hits are absent (sparse form — estimation
    coalesces them to 0)."""
    key = F.col(key_col)
    hashes = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _bucket(key, i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        items.select(F.explode(hashes).alias("h"))
        .groupBy(F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """(key, cms_est): the min-over-rows estimate for each query key.
    The sketch broadcasts (≤ d·w rows); each key probes its d buckets
    via an exploded equi-join and takes the MIN, coalescing absent
    buckets to 0."""
    key = F.col(key_col)
    probes = keys.select(
        key.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(key, i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("h"),
    ).select("key", F.col("h.row").alias("row"), F.col("h.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(
                "cms_est"
            )
        )
    )
