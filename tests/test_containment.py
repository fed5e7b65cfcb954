"""Containment near-dup: subset relations Jaccard misses."""

from open_ocr_spark.dataops.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)

_LONG = " ".join(f"w{i}" for i in range(40))
_PREFIX = " ".join(f"w{i}" for i in range(10))
_OTHER = " ".join(f"z{i}" for i in range(40))


def _df(spark):
    return spark.createDataFrame(
        [(1, _LONG), (2, _PREFIX), (3, _OTHER)],
        "doc_id long, text string",
    )


def test_prefix_is_fully_contained(spark):
    got = {(r.doc_a, r.doc_b): r.containment
           for r in ngram_containment_pairs(_df(spark), threshold=0.8)
           .collect()}
    assert got == {(1, 2): 1.0}


def test_jaccard_misses_the_subset_pair(spark):
    # 8 prefix shingles vs 38 long shingles -> jaccard 8/38 ~ 0.21
    assert ngram_jaccard_pairs(_df(spark), threshold=0.8).count() == 0


def test_exact_duplicates_pair_at_one(spark):
    df = spark.createDataFrame(
        [(1, _LONG), (2, _LONG)], "doc_id long, text string"
    )
    got = ngram_containment_pairs(df, threshold=0.8).collect()
    assert [(r.doc_a, r.doc_b, r.containment) for r in got] == [(1, 2, 1.0)]
