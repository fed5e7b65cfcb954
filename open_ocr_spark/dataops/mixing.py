"""Source-temperature mixing: deterministic downsampling so the corpus'
source mixture matches target proportions ∝ n_s^tau (the standard
multi-source rebalancing for pretraining — tau = 1 keeps the natural
mix, tau = 0 equalizes sources, 0 < tau < 1 damps the head).

Given per-source counts n_s, the kept count is m_s = K·n_s^tau with the
largest K for which every m_s <= n_s, i.e. K = n_min^(1-tau) — the
smallest source is kept whole and every larger source is thinned by
rate_s = (n_min/n_s)^(1-tau).

Acceptance is hash-deterministic, not random: a document is kept iff
the first 32 bits of md5(id) fall below floor(rate_s·2^32).  The kept
SET is therefore a pure function of (ids, counts) — identical at any
parallelism, on reruns, and across engines — which is what lets a
DuckDB oracle value-hash the sampled ids instead of checking counts
only.  Cross-engine float note: for tau = 0.5 the rate is
sqrt(n_min/n_s); IEEE-754 requires division and sqrt to be correctly
rounded, so BOTH engines compute bit-identical cutoffs.  Arbitrary tau
uses pow(), whose last ulp may differ between libm implementations —
fine for production, but oracle queries should stick to tau = 0.5.

Scale shape: one hash aggregate on the low-cardinality source column
(map-side combine collapses it), a one-row global min broadcast back,
and a broadcast join of the ~|sources| rate table onto the corpus —
the corpus itself is scanned once and never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 4294967296  # 2^32


def _md5_32(col) -> F.Column:
    """First 32 bits of md5(id) as a long — the same expression DuckDB
    spells ('0x' || substring(md5(...), 1, 8))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def temperature_sample(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    tau: float = 0.5,
) -> DataFrame:
    """The rows of `docs` kept by temperature-tau source rebalancing
    (all original columns pass through).  tau = 0.5 is the cross-engine
    bit-exact case (see module docstring)."""
    if not 0.0 <= tau <= 1.0:
        raise ValueError(f"tau out of range [0, 1]: {tau}")
    counts = docs.groupBy(source_col).agg(F.count("*").alias("_n"))
    nmin = counts.agg(F.min("_n").alias("_nmin"))
    if tau == 0.5:
        rate = F.sqrt(F.col("_nmin") / F.col("_n"))
    else:
        rate = F.pow(F.col("_nmin") / F.col("_n"), F.lit(1.0 - tau))
    cutoffs = (
        counts.crossJoin(F.broadcast(nmin))
        .select(
            source_col,
            F.floor(rate * F.lit(float(_HASH_SPACE)))
            .cast("long")
            .alias("_cutoff"),
        )
    )
    return (
        docs.join(F.broadcast(cutoffs), source_col)
        .filter(_md5_32(F.col(id_col)) < F.col("_cutoff"))
        .drop("_cutoff")
    )


def quota_sample(
    docs: DataFrame,
    group_col: str = "host",
    id_col: str = "doc_id",
    quota: int = 100,
) -> DataFrame:
    """At most `quota` rows per group (all original columns pass
    through), selection hash-deterministic: each group keeps the rows
    with the `quota` smallest (md5_32(id), id) keys — a pure function of
    the ids, identical at any parallelism and across engines.

    This is crawl-balancing ("domain cap"): without it the head hosts
    dominate a 100 TB corpus.  Unlike temperature mixing (global rates
    per SOURCE) the cap is a per-GROUP top-k over millions of hosts.

    Scale shape: one shuffle on the group key; rank <= quota compiles to
    a window with a WindowGroupLimit map-side prune (each map task keeps
    only `quota` rows per group before the exchange), so skewed hosts
    shrink to quota rows on the map side instead of flooding one
    reducer.  The md5 sort key also decorrelates from crawl order, so
    the kept rows are an unbiased-by-construction slice of each host."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1: {quota}")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        _md5_32(F.col(id_col)), F.col(id_col)
    )
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )


def stratified_sample_exact(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum Bernoulli sampling with hash-deterministic acceptance:
    a row is kept iff the first 32 bits of md5(stratum ':' id) fall below
    floor(fraction · 2^32).  The kept SET is a pure function of the ids —
    identical at any parallelism, on reruns, and across engines — which
    makes it oracle-checkable where `DataFrame.sampleBy` (engine-seeded
    XORShift, see q_stratified_sample) can only be rows-only.  Strata
    absent from `fractions` are dropped, matching sampleBy semantics.

    Scale shape: a literal when-chain cutoff + one md5 per row — pure
    projection and filter, zero shuffles, no rate table to broadcast."""
    cutoff = F.lit(None).cast("long")
    expr = None
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction out of range [0, 1]: {frac}")
        bound = F.lit(int(frac * _HASH_SPACE)).cast("long")
        expr = (
            F.when(F.col(strata_col) == stratum, bound)
            if expr is None
            else expr.when(F.col(strata_col) == stratum, bound)
        )
    cutoff = expr.otherwise(F.lit(0).cast("long")) if expr is not None \
        else F.lit(0).cast("long")
    key = F.concat(
        F.col(strata_col), F.lit(":"), F.col(id_col).cast("string")
    )
    return docs.filter(_md5_32(key) < cutoff)
