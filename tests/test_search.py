"""Inverted index + BM25 vs a pure-Python reference."""

import math
from collections import Counter

from pyspark.sql import functions as F

from open_ocr_spark.dataops.search import bm25_rank, inverted_index

TEXTS = [
    "spark scan merge spark spark window",
    "vector hash vector table",
    "the quick join filter",
    "spark vector hash spark hash",
    "",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def _ref_bm25(texts, terms, k1=1.2, b=0.75):
    toks = [t.lower().split() for t in texts]
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks) / n
    df = Counter()
    for t in toks:
        for q in set(t) & set(terms):
            df[q] += 1
    out = {}
    for i, t in enumerate(toks):
        tf = Counter(w for w in t if w in terms)
        if not tf:
            continue
        score = 0.0
        for q, f in tf.items():
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            score += idf * (
                f * (k1 + 1.0)
                / (f + k1 * ((1.0 - b) + b * len(t) / avgdl))
            )
        out[i] = (len(tf), score)
    return out


def test_inverted_index(spark):
    idx = {
        (r.term, r.doc_id): r.tf
        for r in inverted_index(_docs(spark)).collect()
    }
    assert idx[("spark", 0)] == 3
    assert idx[("vector", 1)] == 2
    assert ("spark", 2) not in idx
    want = Counter(
        (w, i) for i, t in enumerate(TEXTS) for w in t.lower().split()
    )
    assert idx == dict(want)


def test_bm25_matches_reference(spark):
    terms = ["spark", "vector", "hash"]
    got = {
        r.doc_id: (r.n_terms_matched, r.score)
        for r in bm25_rank(_docs(spark), terms).collect()
    }
    want = _ref_bm25(TEXTS, terms)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 1e-9, d


def test_bm25_broadcasts_small_sides(spark):
    plan = (
        bm25_rank(_docs(spark), ["spark"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan  # 1-row stats crossJoin


def test_bm25_parallelism_invariant(spark):
    terms = ["spark", "vector", "hash"]
    outs = []
    for parts in ("2", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            outs.append(
                sorted(
                    (r.doc_id, r.n_terms_matched, round(r.score, 4))
                    for r in bm25_rank(_docs(spark), terms).collect()
                )
            )
        finally:
            spark.conf.unset("spark.sql.shuffle.partitions")
    assert outs[0] == outs[1]
