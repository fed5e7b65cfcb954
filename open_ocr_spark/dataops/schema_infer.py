"""CSV schema inference: typed columns from exploded cell records.

A crawl corpus' data files arrive untyped (kernels/csv_text.py gives
the cell grid); the ingestion step every data lake runs next is type
inference — decide, per column, the most specific SQL type EVERY
non-empty body value satisfies. From-scratch over the obvious
specificity lattice (the same rule Spark's own CSV inferSchema and
DuckDB's sniffer implement, reduced to its deterministic core):

- candidate classes, each a total anchored regex in the shared
  Java-regex/RE2 subset: bigint (``[+-]?\\d{1,18}`` — bounded so every
  accepted value fits an int64), double (decimal/scientific forms,
  a superset of bigint), date (ISO ``yyyy-mm-dd``), boolean
  (``true``/``false``, case-insensitive);
- row 0 is the header (its field is reported, never typed); empty or
  whitespace-only body fields are nulls — ignored by inference,
  counted in ``n_nulls``;
- a column types as the FIRST class in [bigint, double, date,
  boolean] that every non-empty body value matches, else ``varchar``;
  a column with no non-empty body values is ``varchar``.

Scale shape: one hash aggregate on the uniform (doc_id, col_idx) key —
match flags are codegen'd projections riding the cell explode, so
inference over a 100 TB corpus of attached CSVs is a single
well-spread shuffle with map-side partials. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# anchored, total on any field; RE2-compatible (no lookaround)
INT_RE = r"^[+-]?\d{1,18}$"
FLOAT_RE = r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$"
DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
BOOL_RE = r"^(?i)(true|false)$"


def infer_column_types(
    cells: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, col_idx, header, sql_type, n_rows, n_nulls) per CSV
    column, from (doc_id, row_idx, col_idx, field) cell records."""
    body = F.col("row_idx") > 0
    val = F.trim(F.col("field"))
    nonempty = body & (F.length(val) > 0)

    def n_match(pattern: str):
        return F.sum((nonempty & val.rlike(pattern)).cast("long"))

    agg = (
        cells.groupBy(F.col(id_col), F.col("col_idx"))
        .agg(
            F.max(F.when(F.col("row_idx") == 0, F.col("field"))).alias(
                "header"
            ),
            F.sum(body.cast("long")).alias("n_rows"),
            F.sum((body & (F.length(val) == 0)).cast("long")).alias(
                "n_nulls"
            ),
            F.sum(nonempty.cast("long")).alias("_n"),
            n_match(INT_RE).alias("_int"),
            n_match(FLOAT_RE).alias("_float"),
            n_match(DATE_RE).alias("_date"),
            n_match(BOOL_RE).alias("_bool"),
        )
    )
    n = F.col("_n")
    sql_type = (
        F.when(n == 0, F.lit("varchar"))
        .when(F.col("_int") == n, F.lit("bigint"))
        .when(F.col("_float") == n, F.lit("double"))
        .when(F.col("_date") == n, F.lit("date"))
        .when(F.col("_bool") == n, F.lit("boolean"))
        .otherwise(F.lit("varchar"))
    )
    return agg.select(
        id_col, "col_idx", "header", sql_type.alias("sql_type"),
        "n_rows", "n_nulls",
    )
