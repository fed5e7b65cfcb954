"""Winnowing: the SIGMOD'03 guarantee and selection semantics."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from open_ocr_spark.dataops.winnowing import K, W, winnowing_fingerprints


def _py_winnow(text: str) -> set:
    """Independent Python reference of rightmost-minimal winnowing."""
    t = " ".join(text.split()).split(" ")
    if len(t) < K:
        return set()
    grams = [" ".join(t[i:i + K]) for i in range(len(t) - K + 1)]
    keys = [
        hashlib.md5(g.encode()).hexdigest()
        + str(999_999_999 - i).zfill(9)
        for i, g in enumerate(grams)
    ]
    out = set()
    for i in range(len(grams) - W + 1):
        k = min(keys[i:i + W])
        out.add((999_999_999 - int(k[32:]), k[:32]))
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        d: {(r.pos, r.fingerprint)
            for r in winnowing_fingerprints(df).collect() if r.doc_id == d}
        for d in {x[0] for x in rows}
    }


def test_matches_python_reference(spark):
    text = "a b c a b c d e f a b c g h"
    got = _run(spark, [(1, text)])
    assert got[1] == _py_winnow(text)


def test_shared_run_guarantee(spark):
    # two docs sharing a run of >= W + K - 1 = 6 tokens MUST share a
    # fingerprint hash (the winnowing guarantee)
    shared = "q w e r t y"  # 6 tokens
    a = f"one two {shared} three"
    b = f"alpha beta gamma {shared} delta epsilon"
    got = _run(spark, [(1, a), (2, b)])
    fps1 = {f for _, f in got[1]}
    fps2 = {f for _, f in got[2]}
    assert fps1 & fps2


def test_short_docs_yield_nothing(spark):
    # fewer than K + W - 1 tokens -> no full window
    got = _run(spark, [(1, "a b c d e")])
    assert got[1] == set()


@settings(max_examples=30, deadline=None)
@given(text=st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=30)
       .map(" ".join))
def test_property_matches_reference(spark, text):
    got = _run(spark, [(1, text)])
    assert got[1] == _py_winnow(text)
