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

def _direct_containment(docs, k=3, t=0.8):
    """The pre-prefix-filter formulation (raw shingle self-join), kept
    verbatim as the equivalence reference for the lossless claim."""
    from pyspark.sql import functions as F

    from open_ocr_spark.dataops.dedup import (
        _content_collapsed,
        _expand_rep_pairs,
        shingle_rows,
    )

    members, reps = _content_collapsed(docs)
    sh = shingle_rows(reps.select("doc_id", "text"), k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "n_shingles", "sa"
            ),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_shingles", "sb"
            ),
            "doc_b",
        )
        .withColumn(
            "containment", F.round(F.col("n_inter") / F.least("sa", "sb"), 4)
        )
        .filter(F.col("containment") >= t)
        .select("doc_a", "doc_b", "containment")
    )
    return _expand_rep_pairs(members, reps, out, k, value_col="containment")


def test_prefix_filter_is_lossless_on_repeated_phrase_corpus(spark):
    """The prefix filter's pigeonhole bound is valid because shingles are
    per-doc DISTINCT (shingles_of_tokens array_distinct) — on a bag
    semantics a partner's multiplicity could inflate the overlap past the
    bound. This corpus is built from a 6-word vocab so trigrams repeat
    heavily inside every doc; if anyone drops the array_distinct, the
    seeded sweep here is shaped to catch the resulting missed pairs."""
    import random

    rng = random.Random(42)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(6, 18))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = ngram_containment_pairs(df, threshold=0.8)
    ref = _direct_containment(df, t=0.8)
    assert new.exceptAll(ref).count() == 0
    missed = ref.exceptAll(new).count()
    assert missed == 0, f"prefix filter dropped {missed} qualifying pairs"
    assert ref.count() > 0  # the sweep must actually exercise pairs

def test_jaccard_prefix_filter_matches_direct_form(spark):
    """ngram_jaccard_pairs (prefix-filtered) must equal
    _ngram_jaccard_pairs_direct + expansion on a corpus engineered to
    have qualifying pairs at every margin: exact copies, one-word edits
    (J just under 1), half-overlaps (J well under t), and repeated-phrase
    docs stressing the distinct-shingle assumption."""
    import random

    from pyspark.sql import functions as F  # noqa: F401

    from open_ocr_spark.dataops.dedup import (
        _content_collapsed,
        _expand_rep_pairs,
        _ngram_jaccard_pairs_direct,
    )

    rng = random.Random(7)
    rows, did = [], 0
    for i in range(30):
        n = rng.randint(12, 30)
        base = [f"w{rng.randint(0, 60)}" for _ in range(n)]
        rows.append((did, " ".join(base))); did += 1
        if i % 3 == 0:  # exact copy
            rows.append((did, " ".join(base))); did += 1
        if i % 3 == 1:  # one-word edit
            mut = list(base); mut[rng.randrange(n)] = "EDIT"
            rows.append((did, " ".join(mut))); did += 1
        if i % 3 == 2:  # half overlap
            rows.append((did, " ".join(base[: n // 2]))); did += 1
    for i in range(20):  # repeated-phrase stress
        rows.append((did, " ".join(
            rng.choice(["aa", "bb", "cc", "dd"]) for _ in range(rng.randint(8, 20))
        ))); did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")

    new = ngram_jaccard_pairs(df, threshold=0.8)
    members, reps = _content_collapsed(df)
    ref = _expand_rep_pairs(
        members, reps,
        _ngram_jaccard_pairs_direct(
            reps.select("doc_id", "text"), k=3, threshold=0.8
        ),
        3,
    )
    assert new.exceptAll(ref).count() == 0
    missed = ref.exceptAll(new).count()
    assert missed == 0, f"prefix filter dropped {missed} qualifying pairs"
    assert ref.count() > 0

def test_prefix_filter_prunes_boilerplate_skew(spark):
    """The deterministic volume property behind the scale claim: on a
    corpus where every doc shares a site template (heavy-tailed shingle
    df — the raw self-join's quadratic regime), the prefix is drawn from
    each doc's RARE tail shingles, and after the df>=2 trim the
    candidate join finds nothing to pair — candidates collapse to zero
    while the raw join would carry ~n²/2 template pairs. Volume, not
    timing, so the assertion is stable on any host."""
    from pyspark.sql import functions as F

    from open_ocr_spark.dataops.dedup import (
        _content_collapsed,
        _prefix_candidates,
        shingle_rows,
    )

    boiler = " ".join(f"nav{j}" for j in range(32))
    rows = [
        (i, boiler + " " + " ".join(f"u{i}x{j}" for j in range(30)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _, reps = _content_collapsed(df)
    sh = shingle_rows(reps.select("doc_id", "text"), 3)
    alpha = F.greatest(
        F.lit(1), F.ceil((F.lit(0.8) - F.lit(1e-4)) * F.col("n_shingles"))
    )
    assert _prefix_candidates(sh, alpha).count() == 0
    # sanity: the corpus really is in the quadratic regime for the raw
    # join — the template shingles are shared by every doc
    freq = sh.groupBy("shingle").count()
    assert freq.agg(F.max("count")).first()[0] == 200
    # and the end-to-end result agrees with the direct formulation
    assert ngram_containment_pairs(df, threshold=0.8).count() == 0
    assert _direct_containment(df, t=0.8).count() == 0
