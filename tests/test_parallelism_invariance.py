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
    "dsir_resample",        # fixed-point importance model + top-k (r5)
    "extract_markdown",     # structured md extraction kernel (r5)
    "ccnet_buckets",        # value-based perplexity terciles (r5)
    "registrable_domain",   # PSL longest-match rollup (r5)
    "tfidf_top_terms",      # integer-ranked tf-idf heads (r5)
    "resolved_link_graph",  # regex extract + RFC 3986 resolve (r5)
    "base_href_links",      # <base href> override resolution (r5)
    "redirect_chains",      # pointer-doubling with pinned rounds (r5)
    "canonical_assignment", # rel-canonical > redirect > self (r5)
    "cms_term_counts",      # sketch build + broadcast estimate (r5)
    "crawl_delta_near",     # two-snapshot simhash delta (r5)
    "host_hits",            # 3 integer-exact hub/authority rounds (r5)
    "clean_web_corpus",     # repair -> template strip -> reflow (r5)
]


@pytest.mark.parametrize("name", CHAINS)
def test_chain_invariant_across_shuffle_partitions(spark, name):
    from open_ocr_spark.queries import QUERIES

    q = QUERIES[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731 null-safe
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        a = sorted(map(tuple, q(spark, SF).collect()), key=key)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = sorted(map(tuple, q(spark, SF).collect()), key=key)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
    assert len(a) > 0
