"""As-of (point-in-time) join: attach to each left row the most recent
right row with ``right_ts <= left_ts`` for the same key.

The reference has no relational operators at all (SURVEY.md §2.B) — this
is a training-data-pipeline addition (joining events/pages against the
latest preceding snapshot of a dimension: model version, crawl config,
exchange rate...).

Scale design: the naive formulation is a range theta-join (per-key cross
product then argmax — quadratic in key group size). This implementation
is the union trick: tag both sides, union them into one frame, then one
``last(ignorenulls)`` running window per key ordered by timestamp carries
the latest right-side values forward onto each left row. Cost is ONE
shuffle + per-partition sort over |L|+|R| rows — the same exchange any
windowed dedupe pays; no join node, no cartesian blowup, skew bounded by
the hottest key exactly like any partitioned window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For every left row, append ``value_cols`` from the latest right row
    whose ``right_ts`` <= ``left_ts`` (inclusive as-of — a right row at
    exactly ``left_ts`` matches, DuckDB ``ASOF JOIN ... >=`` semantics).
    Left rows with no preceding right row keep nulls (left-outer as-of).
    Right-side duplicates on (key, ts) must be resolved by the caller
    first (pre-aggregate) — as DuckDB also requires.

    Output: all left columns (``left_ts`` name preserved) + value_cols.
    """
    keys = [on] if isinstance(on, str) else list(on)
    left_extra = [c for c in left.columns if c not in keys and c != left_ts]
    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias(_SIDE),
        *left_extra,
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(c)
            for c in value_cols
        ],
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extra],
        *value_cols,
    )
    # right rows sort BEFORE left rows at equal ts (side 0 < 1): inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_tagged.unionByName(r_tagged)
        .select(
            *keys,
            "_ts",
            _SIDE,
            *left_extra,
            *[
                F.last(F.col(c), ignorenulls=True).over(w).alias(c)
                for c in value_cols
            ],
        )
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE)
        .withColumnRenamed("_ts", left_ts)
    )
