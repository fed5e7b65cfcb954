"""Linear text-classifier serving at corpus scale (the CCNet/fastText
quality-gate shape): tokenize, look up a per-token weight, mean-pool,
sigmoid.  This is the stage a real pipeline runs over every crawled
document with weights learned offline; here the weight table is either

- caller-supplied (term, weight) pairs — broadcast-joined, the
  production path, or
- the hashing trick's deterministic fallback: weight(token) =
  (md5_31(token) mod 2001) - 1000, an integer in [-1000, 1000]
  standing for a fixed-point w/1000 — so the engine contract is
  testable without shipping a model, and the DuckDB oracle can
  recompute every weight.

Scale shape: one explode + hash aggregate per document (map-side
partial sums), weights broadcast.  The accumulator is an exact int64
(sum of fixed-point weights), so classification decisions
(sum >= 0 <=> p >= 0.5) are integer-exact and parallelism-invariant;
the only float is the reported probability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TWO31 = 2147483647


def _hash_weight(col):
    """Deterministic fallback weight in [-1000, 1000] (fixed-point
    thousandths), same expression DuckDB spells with md5/substring."""
    h = F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(_TWO31),
    )
    return (h % 2001 - F.lit(1000)).cast("long")


def hashed_linear_score(
    docs: DataFrame,
    weights: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, weight_sum, prob, label): mean-pooled linear
    score per document.  weight_sum is the exact fixed-point
    accumulator; label = weight_sum >= 0 (integer-exact); prob =
    sigmoid(weight_sum / (1000 * n_tokens)).  Documents with no tokens
    score weight_sum 0, prob 0.5, label true."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                        r"\s+"),
                lambda w: w != F.lit(""),
            )
        ).alias("term"),
    )
    if weights is not None:
        weighted = toks.join(F.broadcast(weights), "term").select(
            id_col, F.col("weight").cast("long").alias("w")
        )
    else:
        weighted = toks.select(
            id_col, _hash_weight(F.col("term")).alias("w")
        )
    sums = weighted.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("w").cast("long").alias("weight_sum"),
    )
    # left join back so empty documents keep a row
    base = docs.select(id_col).join(sums, id_col, "left").select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("weight_sum", F.lit(0)).cast("long").alias("weight_sum"),
    )
    logit = F.when(
        F.col("n_tokens") > 0,
        F.col("weight_sum") / (F.lit(1000.0) * F.col("n_tokens")),
    ).otherwise(F.lit(0.0))
    return base.select(
        id_col,
        "n_tokens",
        "weight_sum",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("prob"),
        (F.col("weight_sum") >= 0).alias("label"),
    )
