"""Duplicate-cluster resolution: connected components over a near-dup pair
list, so every document maps to ONE canonical cluster id (the minimum
doc_id in its component) — the step a training pipeline runs after pair
generation (minhash_lsh_pairs / ngram_jaccard_pairs) to pick one canonical
representative per duplicate cluster.

Scale design: the alternating large-star / small-star formulation
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
— each round is two rounds of pure DataFrame joins + hash aggregates over
the edge list, and the edge set converges to min-centered stars in
O(log^2 n) rounds REGARDLESS of component diameter. This replaced the
round-1/2 min-label propagation, whose O(diameter) rounds were fine for
star-shaped dup clusters but could not survive a 100 TB chain-shaped
graph (crawl mirror rings): a 10^6-long path needs 10^6 propagation
rounds but only ~40 star rounds. Convergence is detected with a one-row
checksum aggregate per round (count + exact decimal sums of per-edge
hashes) — never a collect of data rows; lineage is truncated with
localCheckpoint so plans stay constant size. Non-convergence within
max_iter still raises rather than shipping partial labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to min(Γ(u) ∪ {u}).

    Input edges in either direction; output edges are (u, v) with u > v
    (child → candidate parent), self-loop-free, distinct.
    """
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).filter(F.col("u") != F.col("v"))
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least(F.col("u"), F.col("_mv")).alias("_m"))
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor ≤ u, and u itself, to min of those neighbors.

    Input edges must be (u, v) with u > v (large-star output); output stays
    in that canonical direction.
    """
    m = e.groupBy("u").agg(F.min("v").alias("_m"))
    joined = e.join(m, "u")
    return (
        joined.select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .unionByName(m.select("u", F.col("_m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _checksum(e: DataFrame) -> tuple:
    """One-row set fingerprint: count + exact (decimal, non-overflowing)
    sums of two independent per-edge hashes. Equal fingerprints on the
    monotone star-contraction sequence mean the edge set is unchanged."""
    row = e.agg(
        F.count(F.lit(1)),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
        F.sum(F.xxhash64("v", "u").cast("decimal(38,0)")),
    ).collect()[0]
    return tuple(row)


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, cluster_id) for every vertex in `edges`; cluster_id = min
    vertex id reachable through the undirected pair graph. O(log^2 n)
    large-star/small-star rounds — diameter-independent."""
    vertices = (
        edges.select(F.col(src).alias("id"))
        .unionByName(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    prev = None
    converged = False
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # silently returning partial labels would ship wrong clusters
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "large-star/small-star rounds; the edge list is pathological "
            "(rounds grow with log^2 of component size, not diameter)"
        )
    # Converged: e is a union of min-centered stars (u = member, v = center).
    # Members take their center; every other vertex (centers, vertices whose
    # every incident edge was a self-loop) is its own cluster.
    member = e.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    rest = vertices.join(member.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("cluster_id")
    )
    return member.unionByName(rest)


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Every document's cluster id: component minimum for paired docs,
    its own id for singletons (broadcast-eligible label join — the label
    table holds only docs that appear in some pair)."""
    labels = connected_components(pairs)
    return (
        docs.select(id_col)
        .join(labels, docs[id_col] == labels["id"], "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    )
