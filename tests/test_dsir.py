"""DSIR importance resampling (dataops/dsir.py): feature bag shape,
fixed-point weight model, score additivity, and the resampling order."""

import pytest
from pyspark.sql import functions as F

from open_ocr_spark.dataops.dsir import (
    SCALE,
    dsir_bucket_weights,
    dsir_resample,
    dsir_scores,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # target-domain docs (is_target=True): heavy on "good data"
        (0, "good data good data good", True),
        (1, "good data makes good models", True),
        # raw-only docs: heavy on "spam junk"
        (2, "spam junk spam junk spam", False),
        (3, "junk spam junk", False),
        # mixed doc
        (4, "good data and spam junk", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")


def test_feature_bag_is_unigrams_plus_bigrams(spark, corpus):
    scores = dsir_scores(corpus, F.col("tgt"), buckets=64).collect()
    by_id = {r.doc_id: r for r in scores}
    # "good data good data good" -> 5 unigrams + 4 bigrams = 9 grams
    assert by_id[0].n_grams == 9
    # "junk spam junk" -> 3 + 2 = 5
    assert by_id[3].n_grams == 5


def test_weights_are_fixed_point_integers(spark, corpus):
    w = dsir_bucket_weights(corpus, F.col("tgt"), buckets=64)
    row = w.first()
    assert isinstance(row.weight_fp, int)
    assert dict(w.dtypes)["weight_fp"] == "bigint"


def test_target_like_docs_outscore_raw_like(spark, corpus):
    scores = {
        r.doc_id: r.score_fp
        for r in dsir_scores(corpus, F.col("tgt"), buckets=64).collect()
    }
    # pure target-vocabulary docs rank above pure raw-vocabulary docs
    assert min(scores[0], scores[1]) > max(scores[2], scores[3])
    # the mixed doc sits strictly between the two pure groups
    assert scores[2] < scores[4] < scores[0]


def test_resample_order_and_k(spark, corpus):
    top = dsir_resample(corpus, F.col("tgt"), k=3, buckets=64).collect()
    assert len(top) == 3
    fps = [r.score_fp for r in top]
    assert fps == sorted(fps, reverse=True)
    assert top[0].doc_id in (0, 1)
    # reported float score is the fixed-point value, 4dp
    assert top[0].score == round(top[0].score_fp / SCALE, 4)


def test_score_is_sum_of_bucket_weights(spark, corpus):
    """Cross-check one document's score against a hand-join of its grams'
    bucket weights (the additivity the int64 sum claims)."""
    weights = {
        r.bucket: r.weight_fp
        for r in dsir_bucket_weights(corpus, F.col("tgt"), buckets=64)
        .collect()
    }
    import hashlib

    def bucket(gram: str) -> int:
        return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % 64

    text = "junk spam junk"
    toks = text.split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    expected = sum(weights[bucket(g)] for g in grams)
    got = {
        r.doc_id: r.score_fp
        for r in dsir_scores(corpus, F.col("tgt"), buckets=64).collect()
    }[3]
    assert got == expected
