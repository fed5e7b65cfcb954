"""Distributed global ranking: exact ntile without a single-task window.

A global (unpartitioned) window funnels every row through ONE task — the
canonical 100 TB scale-killer. `distributed_ntile` reproduces Spark's
ntile(n) semantics exactly with only parallel operators:

1. `repartitionByRange` on the order keys — a sampled range exchange, so
   partition p holds a contiguous slice of the global order;
2. per-partition `row_number` (window partitioned by partition id — every
   partition ranks in parallel);
3. partition row-counts, cumulated into starting offsets — a metadata-
   sized aggregate (#partitions rows), broadcast back;
4. exact global index = offset + local rank, then the ntile bucket
   formula (first n%b buckets get one extra row).

The order keys must form a total order (include a unique tiebreaker);
then the output is deterministic regardless of sampled range bounds.
Cost: two parallel passes over the data instead of one serial pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def distributed_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list[Column | str],
    out_col: str = "ntile",
    num_partitions: int | None = None,
    _pin: bool = True,
) -> DataFrame:
    """Add `out_col` = ntile(n_buckets) over a GLOBAL order, computed with
    parallel operators only (see module docstring). `order_cols` must be a
    total order (append a unique key as tiebreaker). ``_pin=False`` skips
    the localCheckpoint barrier — ONLY for plan-shape tests that need to
    inspect the pre-checkpoint plan."""
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]

    ranged = df.repartitionByRange(num_partitions, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    wloc = Window.partitionBy("_pid").orderBy(*cols)
    # PIN the ranked layout before it fans out to two consumers (the
    # offsets aggregate and the final join): range-partition bounds come
    # from sampling, so two independent evaluations of this subtree could
    # disagree on _pid assignment and silently corrupt the global index if
    # exchange reuse ever fails to kick in (disabled conf, plan-canonical
    # mismatch, stage recovery). localCheckpoint materializes it once.
    local = ranged.withColumn("_lrn", F.row_number().over(wloc))
    if _pin:
        local = local.localCheckpoint(eager=False)

    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # #partitions rows: the global window + total here run over metadata,
    # not data — this is the same trick RDD.zipWithIndex uses.
    wcum = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(wcum), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )

    i = F.col("_off") + F.col("_lrn") - 1  # exact 0-based global index
    base = F.floor(F.col("_n") / n_buckets)
    rem = F.col("_n") % n_buckets
    cut = rem * (base + 1)  # rows below `cut` sit in the wider buckets
    bucket = (
        F.when(i < cut, F.floor(i / (base + 1)))
        .otherwise(rem + F.floor((i - cut) / base))
        .cast("int")
        + 1
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, bucket)
        .drop("_pid", "_lrn", "_off", "_n")
    )
