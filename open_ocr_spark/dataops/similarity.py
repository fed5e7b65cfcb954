"""Similarity search over `embeddings(vec_id, embedding array<float>, label)`.

Two paths:
- cosine_topk          brute-force cosine top-k vs a query vector — the
                       correctness baseline. Dot products are pure Catalyst
                       (`aggregate`/`zip_with` — whole-stage codegen, no
                       Python); top-k is orderBy+limit (Spark's TakeOrdered,
                       no full sort at scale).
- lsh_bucketed_topk    the scale path: random-hyperplane LSH buckets
                       (SimHash-for-vectors) so the query only scans its own
                       bucket(s) — at 10^9 vectors the full scan dies, the
                       bucket scan doesn't.
- knn_join_brute       all-pairs k-NN within a label partition (grouped
                       brute force) — the evaluation helper.

All float math is done in float64 with explicit 4dp rounding at the output
so results hash-compare across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_sim(a, b):
    """Cosine similarity between two array<float> columns, float64
    accumulation, NULL on zero norms (never a divide-by-zero under ANSI)."""
    na, nb = _norm(a), _norm(b)
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb))


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    """Brute-force top-k by cosine vs the embedding of ``query_vec_id``.

    The 1-row query side is crossJoin-broadcast (explicitly): every task
    scans only its own partition once; the "sort" is TakeOrdered(k).
    Deterministic ordering: (cos_sim desc, vec_id asc) on ROUNDED scores so
    tie order is engine-independent.
    """
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding")
    )
    return (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine_sim(F.col("embedding"), F.col("q_embedding")), 4).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


# --- LSH-bucketed ANN ---------------------------------------------------------

_LSH_PRIME = 2147483647


def _hyperplane(dim: int, plane_id: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: ±1 pattern derived from a
    fixed LCG — identical on every executor and run, no RNG state."""
    out = []
    state = (plane_id * 2654435761 + 1013904223) % _LSH_PRIME
    for _ in range(dim):
        state = (state * 1103515245 + 12345) % _LSH_PRIME
        out.append(1.0 if state & 1 else -1.0)
    return out


def lsh_bucket_col(emb_col, dim: int, n_planes: int = 8, plane_offset: int = 0):
    """Random-hyperplane signature: bit i = sign(dot(v, plane_i)). Pure
    Catalyst; one long bucket id per vector. ``plane_offset`` selects an
    independent plane set (multi-band candidate generation)."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p + plane_offset)])
        bits.append(
            F.when(_dot(emb_col, plane) >= 0, F.lit(1 << p).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
) -> DataFrame:
    """ANN: scan only the query's LSH bucket. Recall < 1.0 by construction;
    the bench compares its hit rate against cosine_topk. At scale the
    bucket column is a partition/bucketing key so the scan prunes to
    ~1/2^n_planes of the table before any math runs."""
    with_bucket = embeddings.withColumn(
        "bucket", lsh_bucket_col(F.col("embedding"), dim, n_planes)
    )
    q = with_bucket.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding"), F.col("bucket").alias("q_bucket")
    )
    return (
        with_bucket.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .select(
            "vec_id",
            "label",
            F.round(cosine_sim(F.col("embedding"), F.col("q_embedding")), 4).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


# --- IVF (inverted-file) ANN -------------------------------------------------


def _mean_vectors(members: DataFrame, key: str) -> DataFrame:
    """Element-wise mean of `embedding` per `key` via posexplode + groupBy
    — two uniform shuffles, no Python, any dimension."""
    return (
        members.select(key, F.posexplode("embedding").alias("pos", "val"))
        .groupBy(key, "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .groupBy(key)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pairs")
        )
        .select(
            key,
            F.transform(F.col("pairs"), lambda s: s["m"]).alias("centroid"),
        )
    )


def ivf_index(embeddings: DataFrame, dim: int = 64) -> tuple:
    """(centroids, assignments) for IVF search.

    Training is deterministic: seed cells from the per-label means, then
    ONE Lloyd refinement (assign every vector to its nearest seed by
    cosine, recompute cell means). Everything is Catalyst: the centroid
    table is tiny and broadcast; the argmax assignment is a max_by
    aggregate; the means are posexplode + groupBy.

    At scale the assignment's `cell` column is the partition/bucketing key
    of the stored index table, so a query's nprobe-cell scan prunes to
    cells/nprobe of the data before any distance math runs.
    """
    seeds = centroid_per_label(embeddings, dim).select(
        F.col("label").alias("cell"), "centroid"
    )

    def assign(cents: DataFrame) -> DataFrame:
        scored = embeddings.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            "cell",
            # zero-norm vectors get sim -1 for every cell (instead of NULL,
            # which would make max_by return a null cell)
            F.coalesce(
                cosine_sim(F.col("embedding"), F.col("centroid")), F.lit(-1.0)
            ).alias("sim"),
        )
        return scored.groupBy("vec_id").agg(
            F.max_by("cell", F.struct(F.col("sim"), -F.col("cell"))).alias(
                "cell"
            )
        )

    first = assign(seeds)
    refined = _mean_vectors(
        embeddings.join(first, "vec_id").select("cell", "embedding"), "cell"
    )
    return refined, assign(refined)


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dim: int = 64,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN: rank cells by centroid similarity to the query, scan only
    the top ``nprobe`` cells, exact cosine within them, top-k. Recall <1.0
    by construction; tests compare the hit rate against cosine_topk.
    No collect anywhere: the probed-cell set is a limit-nprobe DataFrame
    semi-joined against the assignments."""
    centroids, assignments = ivf_index(embeddings, dim)
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding")
    )
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            "cell",
            cosine_sim(F.col("centroid"), F.col("q_embedding")).alias("c_sim"),
        )
        .orderBy(F.desc("c_sim"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    candidate_ids = assignments.join(
        F.broadcast(probe_cells), "cell", "left_semi"
    ).select("vec_id")
    return (
        embeddings.join(candidate_ids, "vec_id", "left_semi")
        .filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                cosine_sim(F.col("embedding"), F.col("q_embedding")), 4
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def centroid_per_label(embeddings: DataFrame, dim: int = 64) -> DataFrame:
    """IVF-style coarse quantization step: per-label centroids via
    element-wise array aggregation (posexplode + groupBy — two uniform
    shuffles, no Python)."""
    exploded = embeddings.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    means = (
        exploded.groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("mean_val"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("mean_val")))
            ).alias("pairs")
        )
        .select(
            "label",
            F.transform(F.col("pairs"), lambda s: F.round(s["mean_val"], 4)).alias(
                "centroid"
            ),
        )
    )
    return means


# --- embedding-cosine near-dup pairs ----------------------------------------


def embedding_cosine_pairs(
    embeddings: DataFrame, threshold: float = 0.99
) -> DataFrame:
    """EXACT all-pairs cosine near-dups (vec_a < vec_b, cos >= threshold).
    Declared correctness baseline, like cosine_topk: the self-join is
    O(n²) and exists to oracle-check the LSH form below — at scale use
    embedding_near_dup_pairs."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("_ea")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("_eb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_sim(F.col("_ea"), F.col("_eb")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    dim: int = 64,
    n_planes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Scale path for embedding-cosine near-dup detection: per band, an
    equi-join on the hyperplane-LSH bucket id (independent plane set per
    band — a pair is a candidate if it shares a bucket in ANY band), then
    exact cosine verification >= threshold. No all-pairs node anywhere:
    each band shuffles on a uniform bucket key, candidate volume is
    sum-of-squares of bucket sizes, and verification is proportional to
    candidates. Recall misses only pairs split by a hyperplane in every
    band: P(miss) ≈ prod_b (1 - (1 - theta/pi)^n_planes), vanishing for
    near-dup angles."""
    cands = None
    for band in range(bands):
        with_b = embeddings.select(
            "vec_id",
            "embedding",
            lsh_bucket_col(
                F.col("embedding"), dim, n_planes, plane_offset=band * n_planes
            ).alias("_bucket"),
        )
        a = with_b.select(
            F.col("vec_id").alias("vec_a"),
            F.col("embedding").alias("_ea"),
            "_bucket",
        )
        b = with_b.select(
            F.col("vec_id").alias("vec_b"),
            F.col("embedding").alias("_eb"),
            "_bucket",
        )
        pairs = a.join(b, "_bucket").filter(F.col("vec_a") < F.col("vec_b"))
        cands = pairs if cands is None else cands.unionByName(pairs)
    # Verify BEFORE deduplicating across bands: a pair colliding in both
    # bands costs one extra (cheap) cosine, while dedup-first would drag
    # the embedding arrays through the aggregate — var-length buffers
    # force SortAggregate over vector payloads. After scoring, the
    # distinct() runs on three fixed-width columns (hash agg, map-side
    # combine) over the already-thresholded pair set.
    return (
        cands.select(
            "vec_a",
            "vec_b",
            F.round(cosine_sim(F.col("_ea"), F.col("_eb")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
