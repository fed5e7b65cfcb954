"""Whole-query determinism across shuffle-partition counts: the
engine-exactness claim (md5 keys, integer arithmetic, rank-1 windows)
says every registered result is a pure function of the input — so the
FULL composed chains must produce identical rows at 2 and 32 shuffle
partitions, not just the per-operator pieces the unit tests pin."""

import pytest

SF = "/root/testdata/sf0.001"

CHAINS = [
    "prepare_corpus_full",  # line-dedup→dedup→gate→scrub→decontam→split
    "substring_dedup",      # window-rank duplicate spans
    "host_pagerank",        # 5 integer-exact rank iterations
    "pack_training_sequences",
    "ngram_fluency",        # train + score in one plan
    "host_quota_sample",    # per-group hash top-k
]


@pytest.mark.parametrize("name", CHAINS)
def test_chain_invariant_across_shuffle_partitions(spark, name):
    from open_ocr_spark.queries import QUERIES

    q = QUERIES[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = sorted(map(tuple, q(spark, SF).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = sorted(map(tuple, q(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
    assert len(a) > 0
