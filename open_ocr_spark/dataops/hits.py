"""Deterministic integer-domain HITS (hubs & authorities) over a
(src, dst) edge table.

Kleinberg's HITS (JACM 46(5), 1999) is the classic companion to
PageRank for crawl-frontier quality: an *authority* is a page many good
hubs point to, a *hub* is a page that points to many good authorities.
The mutual recursion

    auth(v) = Σ_{u→v} hub(u)        hub(u) = Σ_{u→v} auth(v)

is normalized each half-step so the scores stay bounded.  As with
``dataops/pagerank.py``, a floating-point formulation would sum in
shuffle order and drift in the last ulp between runs and engines, so
everything here is scaled 64-bit integer arithmetic:

- scores start at ``SCALE`` (1e9);
- each half-step computes raw sums, then renormalizes with an INTEGER
  divisor ``greatest(1, max(raw) DIV SCALE)`` — the one global scalar
  per half-step, obtained from a 1-row aggregate and broadcast.  After
  the divide the maximum score lands back in [SCALE, 2·SCALE), so raw
  sums are bounded by ``2·SCALE·max_degree`` and never overflow a long
  at crawl scale (1e8 hosts, degree 1e4 → 2e13·… « 2^63).  The divisor
  is deterministic in both engines (DuckDB ``greatest(1, max // SCALE)``),
  which is what lets the oracle value-hash the scores instead of
  epsilon-comparing floats.  The truncation is one-sided and bounded
  (< 1 unit per node per half-step) — far below any ranking decision.

Scale shape (same as pagerank): each half-step is one equi-join
(edges ⋈ scores) + one hash aggregate on the opposite endpoint + a left
join back to the node set — all shuffles on uniform hash keys, O(E) per
iteration, never driver-side except the 1-row max (a model parameter,
the same class as the BPE argmax).  The loop localCheckpoints each
round so plans stay O(1) deep; iteration count is a fixed parameter
(HITS is classically run 5-20 rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def _half_step(
    nodes: DataFrame, edeg: DataFrame, scores: DataFrame,
    from_col: str, to_col: str, score_col: str, out_col: str,
) -> DataFrame:
    """One HITS half-step: push ``score_col`` along edges from
    ``from_col`` to ``to_col``, sum per target, renormalize by the
    integer divisor, and rebase onto the full node set (zero for nodes
    with no incident edge in this direction)."""
    raw = (
        edeg.join(scores, edeg[from_col] == scores["node"])
        .select(F.col(to_col).alias("t"), F.col(score_col).alias("s"))
        .groupBy("t")
        .agg(F.sum("s").alias("raw"))
    )
    divisor = raw.agg(
        F.expr(f"greatest(1L, coalesce(max(raw) DIV {SCALE}, 1L))")
        .alias("divisor")
    )
    return (
        nodes.join(raw, nodes["node"] == raw["t"], "left")
        .crossJoin(F.broadcast(divisor))
        .select(
            "node",
            F.expr("coalesce(raw, 0L) DIV divisor")
            .cast("long")
            .alias(out_col),
        )
    )


def hits_int(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, hub, authority) after ``iterations`` rounds; both scores
    are scaled integers (SCALE = 1e9 = the starting hub mass).  Edges
    are de-duplicated (multi-edges count once, matching the pagerank
    convention); every endpoint appears in the output."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: {iterations}")
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).distinct()
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = e.localCheckpoint()
    hubs = nodes.withColumn("hub", F.lit(SCALE).cast("long"))
    auths = None
    for _ in range(int(iterations)):
        auths = _half_step(
            nodes, e, hubs, "s", "d", "hub", "authority"
        ).localCheckpoint()
        hubs = _half_step(
            nodes, e, auths, "d", "s", "authority", "hub"
        ).localCheckpoint()
    return (
        hubs.join(auths, "node")
        .select("node", "hub", "authority")
    )
