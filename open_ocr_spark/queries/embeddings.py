"""Registry: embedding-space operators — brute/LSH/IVF ANN top-k,
embedding near-dup (exact + multi-band LSH), integer-exact k-means and
SemDeDup; the generated oracles replay hyperplanes, IVF build and every
Lloyd iteration in SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from open_ocr_spark.dataops.similarity import cosine_topk, lsh_bucketed_topk
from open_ocr_spark.queries._shared import _t

ORACLES: dict[str, str] = {}


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, query_vec_id=0, k=10)


def q_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN. Approximate vs exact top-k, but fully
    deterministic: the hyperplanes are fixed LCG ±1 patterns, so the
    oracle replays bucket assignment and the bucket-restricted top-k
    exactly (generated from the same _hyperplane constants)."""
    emb = _t(spark, sf_dir, "embeddings")
    return lsh_bucketed_topk(emb, query_vec_id=0, k=10)


def q_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN — label-seeded centroids + one Lloyd refinement,
    nprobe-cell search. Approximate vs exact top-k but deterministic end
    to end, so the oracle replays the whole index build (seed means,
    argmax assignment, refined means, reassignment) and the probed-cell
    search in SQL."""
    from open_ocr_spark.dataops.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, query_vec_id=0, k=10, nprobe=2)


def _near_dup_embedding_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ slightly-perturbed copies of every 10th vector (first
    component +0.05, float32-rounded — replicable in SQL), so the corpus
    contains KNOWN near-dup pairs at cos ≈ 0.999 while the synthetic base
    vectors stay mutually far (max pairwise cos 0.51)."""
    emb = _t(spark, sf_dir, "embeddings")
    pert = emb.filter((F.col("vec_id") % 10) == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(
                (F.col("embedding")[0].cast("double") + F.lit(0.05)).cast(
                    "float"
                )
            ),
            F.expr("slice(embedding, 2, size(embedding) - 1)"),
        ).alias("embedding"),
        "label",
    )
    return emb.unionByName(pert)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, EXACT all-pairs form — the
    correctness baseline the LSH variant is checked against (the brief's
    'embedding-cosine near-dup' dedup tier). Oracle: the same all-pairs
    cosine in DuckDB list arithmetic over the same perturbed corpus."""
    from open_ocr_spark.dataops.similarity import embedding_cosine_pairs

    corpus = _near_dup_embedding_corpus(spark, sf_dir)
    return embedding_cosine_pairs(corpus, threshold=0.99).orderBy(
        "vec_a", "vec_b"
    )


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: multi-band hyperplane-LSH candidates + exact
    verification (no all-pairs node). Deterministic plane constants make
    the candidate generation — including LSH's false negatives — SQL
    replayable, so the oracle checks the full banded pipeline; recall
    vs exact is additionally pytest-checked."""
    from open_ocr_spark.dataops.similarity import embedding_near_dup_pairs

    corpus = _near_dup_embedding_corpus(spark, sf_dir)
    return embedding_near_dup_pairs(corpus, threshold=0.99)


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact k-means (Lloyd's, label-seeded, 2 updates) over the
    embeddings table — the semantic-clustering tier (dataops/kmeans.py).
    The oracle unrolls every iteration as a CTE (the host_pagerank
    pattern), so quantization, seeding, integer means, and argmin
    tie-breaks are all hash-checked; any drift flips an assignment."""
    from open_ocr_spark.dataops.kmeans import kmeans_assignments

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_assignments(emb, iters=2).orderBy("vec_id")


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cosine near-dup pruning restricted
    to within k-means cells, min-id representative kept — over the same
    perturbed corpus the embedding_near_dup family uses, so the known
    near-dup pairs exist to be dropped. Full SQL replay: k-means loop +
    in-cell pair join + keep rule."""
    from open_ocr_spark.dataops.kmeans import semantic_dedup

    corpus = _near_dup_embedding_corpus(spark, sf_dir)
    return semantic_dedup(corpus, threshold=0.99, iters=2).orderBy("vec_id")


def _plane_sql(plane_id: int, dim: int = 64) -> str:
    from open_ocr_spark.dataops.similarity import _hyperplane

    vals = ", ".join(
        "1.0" if x > 0 else "-1.0" for x in _hyperplane(dim, plane_id)
    )
    return f"[{vals}]"


def _bucket_sql(vec_expr: str, n_planes: int = 8, plane_offset: int = 0) -> str:
    bits = "\n                 + ".join(
        f"(CASE WHEN list_dot_product({vec_expr}, {_plane_sql(p + plane_offset)})"
        f" >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    return f"({bits})"


def _lsh_topk_oracle() -> str:
    return f"""
        WITH b AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v,
                   {_bucket_sql('embedding::DOUBLE[]')} AS bucket
            FROM embeddings
        ),
        q AS (SELECT v AS qe, bucket AS qb FROM b WHERE vec_id = 0)
        SELECT vec_id, label,
               round(list_dot_product(v, qe)
                     / (sqrt(list_dot_product(v, v))
                        * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
        FROM b, q
        WHERE vec_id != 0 AND bucket = qb
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """


_NEAR_DUP_CORPUS_SQL = """
        base AS (
            SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        ),
        pert AS (
            SELECT vec_id + 100000 AS vec_id,
                   list_prepend(CAST(CAST(e[1] + 0.05 AS FLOAT) AS DOUBLE),
                                e[2:]) AS e
            FROM base WHERE vec_id % 10 = 0
        ),
        corpus AS (
            SELECT * FROM base UNION ALL SELECT * FROM pert
        )"""


def _near_dup_lsh_oracle(bands: int = 2, n_planes: int = 8) -> str:
    band_selects = "\n            UNION ALL\n            ".join(
        f"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.e AS ea, b.e AS eb
            FROM (SELECT vec_id, e, {_bucket_sql('e', n_planes, bnd * n_planes)}
                      AS bkt FROM corpus) a
            JOIN (SELECT vec_id, e, {_bucket_sql('e', n_planes, bnd * n_planes)}
                      AS bkt FROM corpus) b
              ON a.bkt = b.bkt AND a.vec_id < b.vec_id"""
        for bnd in range(bands)
    )
    return f"""
        WITH {_NEAR_DUP_CORPUS_SQL},
        cand AS (
            {band_selects}
        )
        SELECT DISTINCT vec_a, vec_b,
               round(list_dot_product(ea, eb)
                     / (sqrt(list_dot_product(ea, ea))
                        * sqrt(list_dot_product(eb, eb))), 4) AS cos_sim
        FROM cand
        WHERE round(list_dot_product(ea, eb)
                    / (sqrt(list_dot_product(ea, ea))
                       * sqrt(list_dot_product(eb, eb))), 4) >= 0.99
    """


def _ivf_topk_oracle(k: int = 10, nprobe: int = 2, dim: int = 64) -> str:
    return f"""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        ),
        pos AS (SELECT unnest(range({dim})) AS p),
        seed AS (
            SELECT cell, list(m ORDER BY p) AS centroid FROM (
                SELECT label AS cell, p, round(avg(v[p + 1]), 4) AS m
                FROM e, pos GROUP BY label, p
            ) GROUP BY cell
        ),
        a1 AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, s.cell, row_number() OVER (
                    PARTITION BY e.vec_id ORDER BY
                    coalesce(CASE WHEN list_dot_product(e.v, e.v) > 0
                                   AND list_dot_product(s.centroid, s.centroid) > 0
                             THEN list_dot_product(e.v, s.centroid)
                                  / (sqrt(list_dot_product(e.v, e.v))
                                     * sqrt(list_dot_product(s.centroid, s.centroid)))
                             END, -1.0) DESC, s.cell ASC) AS rn
                FROM e, seed s
            ) WHERE rn = 1
        ),
        refined AS (
            SELECT cell, list(m ORDER BY p) AS centroid FROM (
                SELECT a1.cell, p, avg(e.v[p + 1]) AS m
                FROM e JOIN a1 USING (vec_id), pos GROUP BY a1.cell, p
            ) GROUP BY cell
        ),
        a2 AS (
            SELECT vec_id, cell FROM (
                SELECT e.vec_id, r.cell, row_number() OVER (
                    PARTITION BY e.vec_id ORDER BY
                    coalesce(CASE WHEN list_dot_product(e.v, e.v) > 0
                                   AND list_dot_product(r.centroid, r.centroid) > 0
                             THEN list_dot_product(e.v, r.centroid)
                                  / (sqrt(list_dot_product(e.v, e.v))
                                     * sqrt(list_dot_product(r.centroid, r.centroid)))
                             END, -1.0) DESC, r.cell ASC) AS rn
                FROM e, refined r
            ) WHERE rn = 1
        ),
        q AS (SELECT v AS qe FROM e WHERE vec_id = 0),
        probe AS (
            SELECT r.cell FROM refined r, q
            ORDER BY list_dot_product(r.centroid, qe)
                     / (sqrt(list_dot_product(r.centroid, r.centroid))
                        * sqrt(list_dot_product(qe, qe))) DESC, r.cell ASC
            LIMIT {nprobe}
        )
        SELECT e.vec_id, e.label,
               round(list_dot_product(e.v, qe)
                     / (sqrt(list_dot_product(e.v, e.v))
                        * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
        FROM e JOIN a2 USING (vec_id), q
        WHERE a2.cell IN (SELECT cell FROM probe) AND e.vec_id != 0
        ORDER BY cos_sim DESC, e.vec_id ASC
        LIMIT {k}
    """


def _kmeans_ctes(iters: int = 2, dim: int = 64, source: str = "q_src") -> str:
    """CTE chain q, c0, a1, c1, ..., af over `source(vec_id, label,
    e DOUBLE[])` mirroring dataops/kmeans.py: quantize -> label-seeded
    integer means -> iters x (argmin assign, integer-mean update) ->
    final assign."""
    assign = """a{t} AS (
            SELECT vec_id, cell FROM (
                SELECT q.vec_id, c.cell,
                       row_number() OVER (PARTITION BY q.vec_id ORDER BY
                           (list_dot_product(c.cq, c.cq)
                            - 2 * list_dot_product(q.vq, c.cq)) ASC,
                           c.cell ASC) AS rn
                FROM q CROSS JOIN c{prev} c
            ) WHERE rn = 1
        )"""
    parts = [f"""q AS (
        SELECT vec_id, label,
               list_transform(e, v -> round(v * 10000, 0)) AS vq
        FROM {source}
    )""", f"""c0 AS (
        SELECT cell, list(m ORDER BY pos) AS cq FROM (
            SELECT cell, i AS pos, floor(sum(vq[i+1]) / count(*)) AS m
            FROM (SELECT label AS cell, vq, unnest(range({dim})) AS i FROM q)
            GROUP BY cell, i
        ) GROUP BY cell
    )"""]
    for t in range(1, iters + 1):
        parts.append(assign.format(t=t, prev=t - 1))
        parts.append(f"""c{t} AS (
            SELECT cell, list(m ORDER BY pos) AS cq FROM (
                SELECT cell, i AS pos, floor(sum(vq[i+1]) / count(*)) AS m
                FROM (SELECT a.cell, q.vq, unnest(range({dim})) AS i
                      FROM q JOIN a{t} a ON a.vec_id = q.vec_id)
                GROUP BY cell, i
            ) GROUP BY cell
        )""")
    parts.append(assign.format(t="f", prev=iters))
    return ",\n".join(parts)


def _kmeans_oracle(iters: int = 2) -> str:
    return f"""
        WITH q_src AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
        ),
        {_kmeans_ctes(iters)}
        SELECT vec_id, cell FROM af ORDER BY vec_id
    """


def _semdedup_oracle(iters: int = 2, threshold: float = 0.99) -> str:
    # same perturbed corpus as the embedding_near_dup family
    return f"""
        WITH base AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
        ),
        pert AS (
            SELECT vec_id + 100000 AS vec_id, label,
                   list_prepend(CAST(CAST(e[1] + 0.05 AS FLOAT) AS DOUBLE),
                                e[2:]) AS e
            FROM base WHERE vec_id % 10 = 0
        ),
        q_src AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
        {_kmeans_ctes(iters)},
        wc AS (
            SELECT s.vec_id, a.cell, s.e
            FROM q_src s JOIN af a ON a.vec_id = s.vec_id
        ),
        dropped AS (
            SELECT DISTINCT b.vec_id
            FROM wc a JOIN wc b ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE round(list_dot_product(a.e, b.e)
                  / (sqrt(list_dot_product(a.e, a.e))
                     * sqrt(list_dot_product(b.e, b.e))), 4) >= {threshold}
        )
        SELECT w.vec_id, w.cell, d.vec_id IS NULL AS kept
        FROM wc w LEFT JOIN dropped d ON d.vec_id = w.vec_id
        ORDER BY w.vec_id
    """


ORACLES["embedding_near_dup"] = """
        WITH base AS (
            SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        ),
        pert AS (
            SELECT vec_id + 100000 AS vec_id,
                   list_prepend(CAST(CAST(e[1] + 0.05 AS FLOAT) AS DOUBLE),
                                e[2:]) AS e
            FROM base WHERE vec_id % 10 = 0
        ),
        corpus AS (
            SELECT * FROM base UNION ALL SELECT * FROM pert
        ),
        pairs AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_dot_product(a.e, b.e)
                         / (sqrt(list_dot_product(a.e, a.e))
                            * sqrt(list_dot_product(b.e, b.e))), 4) AS cos_sim
            FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
            WHERE list_dot_product(a.e, a.e) > 0
              AND list_dot_product(b.e, b.e) > 0
        )
        SELECT vec_a, vec_b, cos_sim FROM pairs
        WHERE cos_sim >= 0.99
        ORDER BY vec_a, vec_b
    """


ORACLES["embedding_topk"] = """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, label,
               round(list_dot_product(embedding, qe)
                     / (sqrt(list_dot_product(embedding, embedding))
                        * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
        FROM embeddings, q
        WHERE vec_id != 0
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """


ORACLES["embedding_lsh_topk"] = _lsh_topk_oracle()


ORACLES["embedding_near_dup_lsh"] = _near_dup_lsh_oracle()


ORACLES["embedding_ivf_topk"] = _ivf_topk_oracle()


ORACLES["kmeans_clusters"] = _kmeans_oracle()


ORACLES["semantic_dedup"] = _semdedup_oracle()
