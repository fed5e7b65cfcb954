"""Distributed BPE training vs an independent pure-Python reference,
plus Catalyst-only application of the learned merges."""

from collections import Counter

from pyspark.sql import functions as F

from open_ocr_spark.dataops.bpe_train import (
    apply_bpe_merges,
    learn_bpe_merges,
    word_histogram,
)


def _ref_apply(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_bpe(texts, k):
    freqs = Counter(w for t in texts for w in t.split())
    vocab = {tuple(w): f for w, f in freqs.items()}
    merges = []
    for rank in range(1, k + 1):
        counts = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (a, b), n = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, a, b, n))
        nxt = {}
        for syms, f in vocab.items():
            ns = _ref_apply(syms, a, b)
            nxt[ns] = nxt.get(ns, 0) + f
        vocab = nxt
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "a ab abc abcd ababab",
]


def test_learn_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = learn_bpe_merges(docs, k=10)
    assert got == _ref_bpe(TEXTS, 10)


def test_overlapping_run_merges_greedily(spark):
    docs = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    got = learn_bpe_merges(docs, k=2)
    # 'a a a a' has 3 (a,a) pairs x freq 2; greedy merge -> 'aa aa'
    assert got[0] == (1, "a", "a", 6)
    assert got[1] == (2, "aa", "aa", 2)


def test_apply_matches_reference_encoding(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = learn_bpe_merges(docs, k=6)
    enc = {
        r.doc_id: r.bpe_tokens
        for r in apply_bpe_merges(docs, merges).collect()
    }

    def ref_encode(text):
        out = []
        for w in text.split():
            syms = tuple(w)
            for _, a, b, _ in merges:
                syms = _ref_apply(syms, a, b)
            out.extend(syms)
        return out

    for i, t in enumerate(TEXTS):
        assert enc[i] == ref_encode(t), (i, t)


def test_histogram_is_one_aggregate(spark):
    docs = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = (
        word_histogram(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # vocab agg only: corpus scanned once


def test_apply_is_shuffle_free(spark):
    docs = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    merges = [(1, "a", "b", 1)]
    plan = (
        apply_bpe_merges(docs, merges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
