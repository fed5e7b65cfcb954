"""Deterministic integer-domain PageRank over a (src, dst) edge table.

Floating-point PageRank sums contributions in whatever order the shuffle
delivers them, so two runs (or two engines) disagree in the last ulp —
unacceptable for an engine whose contract is byte-identical reruns
(SURVEY §7.3 Hard #2).  This formulation does ALL arithmetic in scaled
64-bit integers: ranks start at SCALE, each node sends
``rank DIV out_degree`` along each out-edge, and the update is

    rank' = (100 - d)*SCALE DIV 100  +  d * sum(contribs) DIV 100

Integer addition is associative and commutative, so the result is exact
and identical at any parallelism, any partitioning, and in any engine
that has 64-bit integer division — which is what lets a DuckDB oracle
value-hash the ranks instead of epsilon-comparing them.  The DIV
truncation loses < 1 unit per edge per iteration (bounded, one-sided);
at SCALE = 1e9 that is a relative error < 1e-6 per hop, far below any
ranking decision threshold.  Dangling nodes (out-degree 0) keep
receiving the teleport term but their own mass is dropped, the common
simplification (total mass decays; RELATIVE ranks are what callers use).

Scale shape (a crawl-scale host graph: ~1e8 nodes, ~1e10 edges): each
iteration is one equi-join (edges ⋈ ranks on src) + one hash aggregate
on dst + one left join back to the node set — all shuffles on uniform
hash keys, volume O(E) per iteration, never driver-side.  The loop
localCheckpoints each round (same rationale as
dataops/clusters.py): plans stay O(1) deep instead of O(iterations),
and the lineage cut prevents exchange-reuse divergence.  Iteration
count is a fixed parameter (crawl ranking uses 10-20 rounds), so unlike
connected components there is no data-dependent convergence loop to
bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def pagerank_int(
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) after `iterations` rounds; rank is a scaled integer
    (SCALE = 1e9 = the starting mass of every node).  Edges are
    de-duplicated (multi-edges count once, as in classic PageRank over a
    link-DISTINCT graph); self-loops participate like any edge."""
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct out of range: {damping_pct}")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # Pin the loop-invariant frames ONCE (same rationale as the ranks pin
    # below): without this, every iteration's plan re-runs the edge
    # distinct + degree aggregate + join — iterations× redundant full
    # edge-list shuffles at the ~1e10-edge target scale.
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    edeg = e.join(deg, "src").select("src", "dst", "deg").localCheckpoint()
    base = (100 - damping_pct) * SCALE // 100
    ranks = nodes.withColumn("rank", F.lit(SCALE).cast("long"))
    for _ in range(int(iterations)):
        contrib = (
            edeg.join(ranks, edeg["src"] == ranks["node"])
            .select(F.col("dst"), F.expr("rank DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({int(damping_pct)} * coalesce(c, 0L)) DIV 100")
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks
