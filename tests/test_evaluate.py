"""token_prf: hand-computed multiset P/R/F1 and edge semantics."""

from open_ocr_spark.dataops.evaluate import token_prf


def _run(spark, gold, cand):
    g = spark.createDataFrame(gold, "doc_id long, text string")
    c = spark.createDataFrame(cand, "doc_id long, text string")
    return {r.doc_id: r for r in token_prf(g, c).collect()}


def test_hand_computed_multiset_prf(spark):
    # golden: a a b c   (4)   candidate: a b b d (4)
    # match = min-counts: a:1, b:1 -> 2 ; P = R = 2/4 ; F1 = 4/8
    rows = _run(spark, [(1, "a a b c")], [(1, "a b b d")])
    r = rows[1]
    assert (r.n_gold, r.n_cand, r.n_match) == (4, 4, 2)
    assert (r.precision, r.recall, r.f1) == (0.5, 0.5, 0.5)


def test_perfect_and_disjoint(spark):
    rows = _run(spark, [(1, "x y z"), (2, "p q")],
                [(1, "x y z"), (2, "a b c")])
    assert (rows[1].precision, rows[1].recall, rows[1].f1) == (1.0, 1.0, 1.0)
    assert (rows[2].n_match, rows[2].f1) == (0, 0.0)


def test_whitespace_tokenization_and_multiplicity(spark):
    # repeated tokens count with multiplicity; runs of whitespace are one
    # separator
    rows = _run(spark, [(1, "w  w\tw\nv")], [(1, "w w")])
    r = rows[1]
    assert (r.n_gold, r.n_cand, r.n_match) == (4, 2, 2)
    assert r.precision == 1.0 and r.recall == 0.5
    assert r.f1 == round(2 * 2 / (4 + 2), 4)


def test_doc_only_on_one_side_still_scores(spark):
    # a doc with no golden row: recall is undefined (null), precision 0
    rows = _run(spark, [(1, "a")], [(1, "b"), (2, "c")])
    assert rows[2].n_gold == 0 and rows[2].n_match == 0
    assert rows[2].recall is None


def test_vertical_tab_tokenization_matches_duckdb(spark):
    # \x0b is whitespace to Java regex \s but NOT to RE2 — the operator
    # must use the explicit class so both engines keep it inside tokens
    import duckdb

    from open_ocr_spark.dataops.evaluate import token_prf_oracle_sql

    rows = _run(spark, [(1, "a\x0bb")], [(1, "a\x0bb x")])
    sql = token_prf_oracle_sql(
        "SELECT 1 AS doc_id, 'a' || chr(11) || 'b' AS text",
        "SELECT 1 AS doc_id, 'a' || chr(11) || 'b x' AS text",
    )
    oracle = duckdb.sql(sql).fetchone()
    assert (rows[1].n_gold, rows[1].n_cand, rows[1].n_match) == oracle[1:4]
    assert rows[1].n_gold == 1  # 'a\x0bb' is ONE token in both engines
