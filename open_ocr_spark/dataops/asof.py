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
from pyspark.sql.types import StructField, StructType

_SIDE = "_asof_side"
_TS = "_ts"
_VALS = "_asof_vals"


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

    The value columns are packed into ONE struct and carried forward with
    a single ``last(ignorenulls)``, so the matched right row is attached
    atomically: a legitimately-NULL value column in the matched row stays
    NULL instead of leaking the value from an older right row (DuckDB ASOF
    attaches the matched row as a unit; carrying each column independently
    would not).

    Output: all left columns (``left_ts`` name preserved) + value_cols.
    """
    keys = [on] if isinstance(on, str) else list(on)
    left_extra = [c for c in left.columns if c not in keys and c != left_ts]

    reserved = {_TS, _SIDE, _VALS}
    clashes = reserved.intersection(left_extra) | reserved.intersection(keys)
    if clashes:
        raise ValueError(
            f"asof_join: left columns {sorted(clashes)} collide with "
            f"reserved working names {sorted(reserved)}; rename them first"
        )
    overlap = set(value_cols).intersection(left_extra) | set(
        value_cols
    ).intersection(keys)
    if overlap:
        raise ValueError(
            f"asof_join: value_cols {sorted(overlap)} already exist on the "
            "left frame; rename one side first"
        )
    missing = [c for c in value_cols if c not in right.columns]
    if missing:
        raise ValueError(f"asof_join: value_cols {missing} not in right frame")

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *left_extra,
        # programmatic StructType, not DDL-string concat: a value column
        # whose name holds non-identifier chars (space, ':', ',') would
        # fail DDL parsing with an opaque AnalysisException
        F.lit(None)
        .cast(
            StructType(
                [
                    StructField(c, right.schema[c].dataType)
                    for c in value_cols
                ]
            )
        )
        .alias(_VALS),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_extra],
        F.struct(*value_cols).alias(_VALS),
    )
    # right rows sort BEFORE left rows at equal ts (side 0 < 1): inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col(_VALS), ignorenulls=True).over(w)
    return (
        l_tagged.unionByName(r_tagged)
        .select(
            *keys,
            _TS,
            _SIDE,
            *left_extra,
            *[carried[c].alias(c) for c in value_cols],
        )
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE)
        .withColumnRenamed(_TS, left_ts)
    )
