"""Integer-exact k-means + SemDeDup: agreement with an independent NumPy
reference implementation, bit-identical assignments across parallelism
levels, and the SemDeDup keep rule (min-id representative survives, its
near-dups in the same cell drop)."""

import numpy as np
import pyspark.sql.functions as F

from open_ocr_spark.dataops.kmeans import (
    SCALE,
    kmeans_assignments,
    kmeans_fit,
    quantize,
    semantic_dedup,
)

SF = "/root/testdata/sf0.001"


def _numpy_kmeans(vecs: dict, labels: dict, iters: int = 2) -> dict:
    """Independent reference: same semantics (round-half-away quantize,
    label-seeded floor-div integer means, argmin of ||c||^2 - 2<v,c>,
    ties to smallest cell), pure NumPy int64."""

    def _round_half_away(x):
        return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))

    vq = {
        i: _round_half_away(np.asarray(v, dtype=np.float64) * SCALE).astype(
            np.int64
        )
        for i, v in vecs.items()
    }

    def int_means(groups):
        cents = {}
        for cell, ids in groups.items():
            if not ids:
                continue
            s = np.sum([vq[i] for i in ids], axis=0, dtype=np.int64)
            cents[cell] = np.floor(s / len(ids)).astype(np.int64)
        return cents

    def assign(cents):
        out = {}
        for i, v in vq.items():
            best = None
            for cell in sorted(cents):
                c = cents[cell]
                score = int(c @ c) - 2 * int(v @ c)
                if best is None or score < best[0]:
                    best = (score, cell)
            out[i] = best[1]
        return out

    groups = {}
    for i in vq:
        groups.setdefault(labels[i], []).append(i)
    cents = int_means(groups)
    for _ in range(iters):
        asg = assign(cents)
        groups = {}
        for i, cell in asg.items():
            groups.setdefault(cell, []).append(i)
        cents = int_means(groups)
    return assign(cents)


def test_kmeans_matches_numpy_reference(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.collect()
    vecs = {r.vec_id: r.embedding for r in rows}
    labels = {r.vec_id: r.label for r in rows}
    want = _numpy_kmeans(vecs, labels, iters=2)
    got = {
        r.vec_id: r.cell for r in kmeans_assignments(emb, iters=2).collect()
    }
    assert got == want


def test_kmeans_parallelism_invariant(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a1 = {
        r.vec_id: r.cell
        for r in kmeans_assignments(emb.repartition(1), iters=2).collect()
    }
    a16 = {
        r.vec_id: r.cell
        for r in kmeans_assignments(emb.repartition(16), iters=2).collect()
    }
    assert a1 == a16


def test_kmeans_centroids_are_integer_longs(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents, _ = kmeans_fit(emb, iters=1)
    assert dict(cents.dtypes)["cq"] == "array<bigint>"
    row = cents.orderBy("cell").first()
    assert all(isinstance(x, int) for x in row.cq)


def test_quantize_round_half_away(spark):
    df = spark.createDataFrame(
        [(1, [0.00015, -0.00015, 0.12345678])],
        "vec_id long, embedding array<float>",
    )
    vq = quantize(df).select("vq").first().vq
    # float32(0.00015)*1e4 = 1.50000002... -> 2 ; negative mirrors to -2
    assert vq[0] == 2 and vq[1] == -2
    assert vq[2] == round(
        float(np.float32(0.12345678)) * SCALE
    )


def test_semantic_dedup_drops_only_perturbed_copies(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
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
    corpus = emb.unionByName(pert)
    out = semantic_dedup(corpus, threshold=0.99, iters=2).collect()
    dropped = {r.vec_id for r in out if not r.kept}
    # every dropped id is a perturbed copy (min-id rep is its base, which
    # survives); base vectors are mutually far (max pairwise cos 0.51)
    assert dropped and all(v >= 100000 for v in dropped)
    kept = {r.vec_id for r in out if r.kept}
    assert kept | dropped == {r.vec_id for r in out}
    # recall vs the all-pairs form: a dropped copy means k-means put it
    # in the same cell as its base; misses only cross-cell splits
    n_pert = corpus.filter(F.col("vec_id") >= 100000).count()
    assert len(dropped) >= 0.9 * n_pert


def test_char_entropy_hand_values(spark):
    # placed here to share the module's session fixture; op lives in
    # textstats (hand values: 'hello' H = -(1/5)lg(1/5)*3-(2/5)lg(2/5)
    # = 1.9219; uniform 'ab c' = 2.0; constant 'aaaa' = 0)
    from open_ocr_spark.dataops.textstats import char_entropy

    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, None), (4, "aaaa"), (5, "ab c")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_chars, r.entropy_bits) for r in char_entropy(df).collect()}
    assert got == {
        1: (5, 1.9219),
        2: (0, 0.0),
        3: (0, 0.0),
        4: (4, 0.0),
        5: (4, 2.0),
    }
