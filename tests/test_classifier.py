"""Hashed linear classifier: reference weights, supplied-weight path,
empty docs, parallelism invariance."""

import hashlib
import math

from open_ocr_spark.dataops.classifier import hashed_linear_score

TEXTS = ["spark join merge", "slow slow slow bad", "", "Mixed CASE mixed"]


def _w(tok):
    h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 2147483647
    return h % 2001 - 1000


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_matches_reference(spark):
    got = {
        r.doc_id: (r.n_tokens, r.weight_sum, r.prob, r.label)
        for r in hashed_linear_score(_docs(spark)).collect()
    }
    for i, t in enumerate(TEXTS):
        toks = t.lower().split()
        s = sum(_w(x) for x in toks)
        n = len(toks)
        p = 1.0 / (1.0 + math.exp(-(s / (1000.0 * n)))) if n else 0.5
        assert got[i][0] == n and got[i][1] == s
        assert abs(got[i][2] - p) < 1e-12
        assert got[i][3] == (s >= 0)


def test_supplied_weight_table(spark):
    w = spark.createDataFrame(
        [("spark", 500), ("slow", -800), ("join", 100)],
        "term string, weight long",
    )
    got = {
        r.doc_id: (r.n_tokens, r.weight_sum, r.label)
        for r in hashed_linear_score(_docs(spark), weights=w).collect()
    }
    # unknown terms drop out of the join: n_tokens counts WEIGHTED tokens
    assert got[0] == (2, 600, True)     # spark + join
    assert got[1] == (3, -2400, False)  # slow x3
    assert got[2] == (0, 0, True)       # empty doc keeps its row
    assert got[3] == (0, 0, True)       # no vocab hits


def test_parallelism_invariant(spark):
    df = spark.range(300).selectExpr(
        "id as doc_id",
        "concat('tok', cast(id % 17 as string), ' tok', "
        "cast(id % 5 as string)) as text",
    )
    outs = []
    for parts in ("2", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            outs.append(
                sorted(
                    (r.doc_id, r.weight_sum, r.label)
                    for r in hashed_linear_score(df).collect()
                )
            )
        finally:
            spark.conf.unset("spark.sql.shuffle.partitions")
    assert outs[0] == outs[1]
