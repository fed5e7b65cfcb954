"""Gopher gate and C4 line cleaner: rule boundaries, both outcomes per
rule, and degenerate inputs — all through the real Spark plans."""

from pyspark.sql import functions as F

from open_ocr_spark.dataops.quality_rules import c4_clean, gopher_gate


def _gate_row(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_gate(df, **kw).collect()[0]


def _clean_row(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_clean(df).collect()[0]


def test_word_count_boundaries(spark):
    passing = " ".join(["the", "of"] + ["word"] * 48)  # exactly 50
    failing = " ".join(["the", "of"] + ["word"] * 47)  # 49
    assert _gate_row(spark, passing).rule_word_count
    assert _gate_row(spark, passing).keep
    assert not _gate_row(spark, failing).rule_word_count


def test_mean_word_length_boundaries(spark):
    # exactly 3.0 chars/word passes, below fails (integer-exact compare)
    three = " ".join(["the"] * 50 + ["of", "to"] + ["abcd"] * 2)
    row = _gate_row(spark, three)
    assert row.rule_mean_word_len == (
        row.n_word_chars >= 3 * row.n_words
        and row.n_word_chars <= 10 * row.n_words
    )
    short = " ".join(["a"] * 60 + ["the", "of"])
    assert not _gate_row(spark, short).rule_mean_word_len


def test_symbol_ratio_boundary_equality_passes(spark):
    # 5 symbol marks over exactly 50 words: 5*10 <= 50 holds
    text = " ".join(["the", "of"] + ["word"] * 48) + " #####"
    row = _gate_row(spark, text)
    # the '#####' run is itself a 51st word
    assert row.n_symbol_marks == 5 and row.n_words == 51
    assert row.rule_symbol_ratio
    text6 = " ".join(["the", "of"] + ["word"] * 48) + " ######"
    assert not _gate_row(spark, text6).rule_symbol_ratio


def test_ellipsis_counts_both_forms(spark):
    row = _gate_row(spark, "wait... for … it")
    assert row.n_symbol_marks == 2


def test_bullet_and_ellipsis_line_rules(spark):
    bullets = "\n".join(["- item here now"] * 10)
    row = _gate_row(spark, bullets)
    assert row.n_bullet_lines == 10 and not row.rule_bullet_lines
    ell = "\n".join(["ends like this..."] * 4 + ["plain line"] * 6)
    row = _gate_row(spark, ell)
    assert row.n_ellipsis_lines == 4 and not row.rule_ellipsis_lines
    ok = "\n".join(["ends like this..."] * 3 + ["plain line"] * 7)
    assert _gate_row(spark, ok).rule_ellipsis_lines


def test_alpha_words_and_stopwords(spark):
    nums = " ".join(["123"] * 30 + ["the", "of"] + ["word"] * 20)
    row = _gate_row(spark, nums)
    assert row.n_alpha_words == 22 and not row.rule_alpha_words
    nostop = " ".join(["word"] * 60)
    row = _gate_row(spark, nostop)
    assert row.n_stop_hits == 0 and not row.rule_stop_words
    onestop = " ".join(["The"] + ["word"] * 60)  # case-folded
    assert _gate_row(spark, onestop).n_stop_hits == 1


def test_gopher_empty_and_null_text(spark):
    row = _gate_row(spark, None)
    assert row.n_words == 0 and not row.keep
    row = _gate_row(spark, "")
    assert row.n_words == 0 and row.n_lines == 1


def test_c4_line_retention_rules(spark):
    text = "\n".join(
        [
            "This sentence has five words.",  # kept
            "Only four words here.",  # < 5 words: dropped
            "no terminal punctuation on this line",  # dropped
            "Please enable JavaScript to continue browsing here.",  # dropped
            'He said the quote ends well."',  # quote-terminal: kept
            "  Padded line still counts five words.  ",  # trimmed, kept
        ]
    )
    row = _clean_row(spark, text)
    assert row.n_lines_kept == 3
    assert row.text_clean.splitlines()[0] == "This sentence has five words."
    assert "JavaScript" not in row.text_clean
    assert row.n_sentences == 3 and row.keep


def test_c4_page_gates(spark):
    good = "\n".join(["A good long sentence lives right here."] * 3)
    assert _clean_row(spark, good).keep
    assert not _clean_row(spark, good + "\nvar x = { 1 };").keep  # brace
    assert not _clean_row(
        spark, good + "\nLorem Ipsum dolor sit amet friends."
    ).keep
    two = "\n".join(["A good long sentence lives right here."] * 2)
    row = _clean_row(spark, two)
    assert row.n_sentences == 2 and not row.keep


def test_c4_empty_text(spark):
    row = _clean_row(spark, "")
    assert row.text_clean == "" and row.n_lines_kept == 0
    assert row.n_sentences == 0 and not row.keep


def test_gate_is_shuffle_free(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the of and words here for doc "), F.col("id"))
        .alias("text"),
    )
    plan = gopher_gate(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    plan2 = c4_clean(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan2


# --- phrase-blocklist gate -----------------------------------------------------


def test_phrase_gate_boundaries_case_and_overlap(spark):
    from open_ocr_spark.dataops.quality_rules import phrase_gate

    rows = [
        (1, "Click Here to subscribe, then click here again"),  # 2 hits
        (2, "a classic tale"),        # 'class' must NOT match inside
        (3, "LOREM IPSUM dolor"),     # case-insensitive
        (4, None),                    # null text -> 0 hits
        (5, "class act"),             # boundary hit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_hits, r.blocked)
        for r in phrase_gate(df, ["click here", "lorem ipsum", "class"]).collect()
    }
    assert got == {1: (2, True), 2: (0, False), 3: (1, True),
                   4: (0, False), 5: (1, True)}


def test_phrase_gate_longest_first_and_escaping(spark):
    from open_ocr_spark.dataops.quality_rules import phrase_gate

    # "table scan" beats "table" at the same position; regex
    # metacharacters in a phrase are literal
    df = spark.createDataFrame(
        [(1, "full table scan here"), (2, "cost (est.) is fine")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_hits
           for r in phrase_gate(df, ["table scan", "table", "(est.)"]).collect()}
    assert got == {1: 1, 2: 1}


def test_phrase_gate_empty_list_raises(spark):
    import pytest as _pytest

    from open_ocr_spark.dataops.quality_rules import phrase_gate

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        phrase_gate(df, [])


def test_phrase_gate_rejects_non_ascii(spark):
    import pytest as _pytest

    from open_ocr_spark.dataops.quality_rules import phrase_gate

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="non-ASCII"):
        phrase_gate(df, ["café"])
