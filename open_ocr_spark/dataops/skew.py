"""Key-skew diagnostics: the measurement you run BEFORE choosing a
partitioning strategy (salt factor, AQE skew-join thresholds, host
quotas).  At 100 TB the shuffle plan lives or dies on key concentration,
and "how skewed is this key" deserves a first-class, engine-checked
answer rather than a guess.

Gini here is computed from EXACT integers: per-key counts, a
deterministic rank (ties on count are order-independent in the
weighted sum, so any tie-break yields the same value), and the
classic formula G = (2*sum(i*x_i) - (n+1)*sum(x_i)) / (n*sum(x_i))
over ascending-sorted counts.  Everything except the final division is
int64, so the hashed surface carries the exact numerator.

Scale note: the rank stage sorts the AGGREGATED per-key table (one row
per distinct key), not the corpus — a single count-shuffle plus one
sort of #keys rows, the same cost class as any top-k-by-key report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_gini(df: DataFrame, key_col: str) -> DataFrame:
    """One row: (n_keys, total_rows, weighted_rank_sum, gini_e4) for
    the distribution of rows per distinct key."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    ranked = counts.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.asc("cnt"), F.asc("k")))
        .cast("long")
        .alias("i"),
    )
    return ranked.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("total_rows"),
        F.sum(F.col("i") * F.col("cnt")).cast("long")
        .alias("weighted_rank_sum"),
        F.round(
            (
                F.lit(2.0) * F.sum(F.col("i") * F.col("cnt"))
                - (F.count("*") + F.lit(1.0)) * F.sum("cnt")
            )
            / (F.count("*") * F.sum("cnt")),
            4,
        ).alias("gini_e4"),
    )
