"""Duplicate-cluster resolution: connected components over a near-dup pair
list, so every document maps to ONE canonical cluster id (the minimum
doc_id in its component) — the step a training pipeline runs after pair
generation (minhash_lsh_pairs / ngram_jaccard_pairs) to pick one canonical
representative per duplicate cluster.

Scale design: min-label propagation — per iteration ONE join of the
(small) label table against the symmetrized edge list plus a hash
aggregate, lineage truncated with localCheckpoint so plans stay constant
size. Convergence is O(component diameter) iterations; near-dup clusters
are shallow (stars around a popular page), so a handful of rounds
suffices. Convergence is detected with a one-row aggregate per iteration
(sum of labels, strictly decreasing until fixpoint) — never a collect of
data rows. For adversarially deep graphs the two-phase large-star /
small-star variant (Kiveris et al., "Connected Components in MapReduce")
drops rounds to O(log n); not needed for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster_id) for every vertex in `edges`; cluster_id = min
    vertex id reachable through the undirected pair graph."""
    sym = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .unionByName(edges.select(F.col(dst).alias("x"), F.col(src).alias("y")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("x").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
    )
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym["y"] == labels["id"])
            .groupBy("x")
            .agg(F.min("cluster_id").alias("_nmin"))
        )
        labels = (
            labels.join(neigh, labels["id"] == neigh["x"], "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("_nmin"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)  # constant-size plan per round
        )
        cur_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
        if cur_sum == prev_sum:  # fixpoint: labels strictly decrease until done
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # silently returning partial labels would ship wrong clusters;
        # a diameter above max_iter means the graph is not dedup-shaped
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations; raise max_iter or use a large-star/small-star "
            "formulation for deep graphs"
        )
    return labels


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
