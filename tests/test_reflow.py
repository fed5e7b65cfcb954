"""Text reflow (dataops/reflow.py): de-hyphenation, line unwrap,
paragraph preservation — exact expected strings plus the idempotence
property the chain is designed around."""

from pyspark.sql import functions as F

from open_ocr_spark.dataops.reflow import n_paragraphs, reflow_text


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    rows = (
        df.select(
            "i",
            reflow_text(F.col("t")).alias("r"),
            n_paragraphs(F.col("t")).alias("n"),
        )
        .orderBy("i")
        .collect()
    )
    return [(r.r, r.n) for r in rows]


def test_wrap_hyphen_lowercase_joins(spark):
    [(r, n)] = _run(spark, ["a hyphen-\n  ated word"])
    assert r == "a hyphenated word"
    assert n == 1


def test_compound_hyphen_keeps_hyphen(spark):
    out = _run(spark, ["Navier-\nStokes", "ISO-\n8859"])
    assert out[0][0] == "Navier-Stokes"
    assert out[1][0] == "ISO-8859"


def test_paragraphs_survive_and_lines_unwrap(spark):
    [(r, n)] = _run(spark, ["line one\nline two\n\npara two\n \n\npara three"])
    assert r == "line one line two\n\npara two\n\npara three"
    assert n == 3


def test_crlf_and_soft_hyphen(spark):
    [(r, n)] = _run(spark, ["soft­hyphen\r\nnext\rline"])
    assert r == "softhyphen next line"
    assert n == 1


def test_non_ascii_hyphen_survives_documented_tradeoff(spark):
    # documented: only ASCII letter classes join; the hyphen stays and
    # the newline becomes a space
    [(r, _)] = _run(spark, ["café-\néclair"])
    assert r == "café- éclair"


def test_empty_and_blank(spark):
    out = _run(spark, ["", "   ", "\n\n\n"])
    assert out[0] == ("", 0)
    assert out[1] == ("", 0)
    # pure blank-line run collapses to a single paragraph mark, which
    # both engines count identically (the mark survives the space trim)
    assert out[2][0] == "\n\n"


def test_idempotent(spark):
    texts = [
        "a hyphen-\n  ated word",
        "line one\nline two\n\npara two",
        "Navier-\nStokes equations\r\nwrap",
    ]
    once = [r for r, _ in _run(spark, texts)]
    twice = [r for r, _ in _run(spark, once)]
    assert once == twice
