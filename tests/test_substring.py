"""Cross-document substring dedup: keeper semantics, overlap union,
within-doc repeats, parallelism invariance, and the plan-shape
guarantees (no cartesian, codegen'd hash agg on the gram key)."""

import pyspark.sql.functions as F

from open_ocr_spark.dataops.substring import dedup_substrings


def _clean(spark, rows, window=4):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in dedup_substrings(df, window=window).collect()
    }


def test_first_occurrence_wins_and_span_blanked(spark):
    got = _clean(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "X alpha beta gamma delta epsilon zeta Y"),
            (3, "totally unique words here nothing shared"),
        ],
    )
    # keeper (lowest doc_id) untouched; the full 6-token duplicated
    # region in doc 2 is the union of three overlapping 4-grams
    assert got[1] == ("alpha beta gamma delta epsilon zeta", 6, 0)
    assert got[2] == ("X Y", 8, 6)
    assert got[3][2] == 0


def test_keeper_is_positional_not_whole_doc(spark):
    # doc 1 contains the span at a LATER position than doc 0's: keeper
    # is min (doc_id, pos) per gram, so doc 0 keeps, doc 1 loses
    got = _clean(
        spark,
        [
            (0, "a b c d tail1 tail2"),
            (1, "lead1 lead2 a b c d"),
        ],
    )
    assert got[0] == ("a b c d tail1 tail2", 6, 0)
    assert got[1] == ("lead1 lead2", 6, 4)


def test_within_doc_repeat_removed(spark):
    got = _clean(spark, [(5, "p q r s MID p q r s")])
    assert got[5] == ("p q r s MID", 9, 4)


def test_short_and_null_docs_pass_through(spark):
    got = _clean(
        spark,
        [(1, "one two three"), (2, None), (3, "one two three")],
    )
    # 3 tokens < window=4: no grams, nothing dedupable even though the
    # docs are identical (that's doc-level dedup's job)
    assert got[1] == ("one two three", 3, 0)
    assert got[2] == ("", 1, 0)  # split('') -> [''], same as the oracle
    assert got[3] == ("one two three", 3, 0)


def test_parallelism_invariance(spark):
    rows = [
        (i, " ".join(f"w{(i * 3 + k) % 17}" for k in range(30)))
        for i in range(40)
    ]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    df16 = spark.createDataFrame(rows, "doc_id long, text string").repartition(16)
    a = sorted(map(tuple, dedup_substrings(df1, 5).collect()))
    b = sorted(map(tuple, dedup_substrings(df16, 5).collect()))
    assert a == b


def _brute_dedup(texts, window):
    """Naive single-process reference: same semantics, no Spark — every
    W-gram's first (doc_id, pos) occurrence survives, all other
    occurrences mark [pos, pos+W) for removal."""
    words = {d: t.split(" ") for d, t in texts}
    first = {}
    removed = {d: set() for d, _ in texts}
    for d, _ in sorted(texts):
        w = words[d]
        for p in range(len(w) - window + 1):
            g = " ".join(w[p : p + window])
            if g not in first:
                first[g] = (d, p)
            elif first[g] != (d, p):
                removed[d].update(range(p, p + window))
    out = {}
    for d, _ in texts:
        w = words[d]
        kept = [t for i, t in enumerate(w) if i not in removed[d]]
        out[d] = (" ".join(kept), len(w), len(w) - len(kept))
    return out


def test_matches_bruteforce_reference_on_random_corpora(spark):
    import random

    for seed in (7, 41, 1999):
        rng = random.Random(seed)
        vocab = [f"t{k}" for k in range(12)]  # tiny vocab -> many dups
        rows = [
            (d, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 25))))
            for d in range(30)
        ]
        want = _brute_dedup(rows, window=3)
        got = _clean(spark, rows, window=3)
        assert got == want, f"seed {seed}"


def test_plan_no_cartesian_and_hash_agg(spark):
    from tests.test_plan_shape import plan_of

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w1 w2 w3 w4 w5 w6 tail"),
                 (F.col("id") % 7).cast("string")).alias("text"),
    )
    plan = plan_of(dedup_substrings(df, window=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # duplicate detection is one window pass on the md5 gram key — no
    # SortAggregate (struct-min has no hash buffer; the rn>1 form does)
    assert "SortAggregate" not in plan
    assert plan.count("Window") >= 1
