"""Unicode normalization column: forms, null passthrough, and agreement
with Python's unicodedata on canonical/compatibility cases."""

import unicodedata

import pytest

from open_ocr_spark.dataops.normalize import unicode_normalize

CASES = [
    "café",       # decomposed accent -> composes under NFC
    "café",        # precomposed -> stable
    "Århus",      # combining ring -> composes
    "ﬁne print",   # ligature fi: canonical keeps, compatibility folds
    "ｆullwidth",   # fullwidth f: same split
    "ẋ̣",    # combining reorder (dot below + dot above)
    "plain ascii",
]


@pytest.mark.parametrize("form", ["NFC", "NFD", "NFKC", "NFKD"])
def test_matches_unicodedata(spark, form):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)],
                               "i long, s string")
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", unicode_normalize("s", form).alias("n")
        ).collect()
    }
    for i, s in enumerate(CASES):
        assert got[i] == unicodedata.normalize(form, s), (form, s)


def test_null_passthrough_and_bad_form(spark):
    df = spark.createDataFrame([(1, None)], "i long, s string")
    assert df.select(
        unicode_normalize("s").alias("n")
    ).collect()[0]["n"] is None
    with pytest.raises(ValueError, match="form"):
        unicode_normalize("s", "NFX")


def test_nfc_enables_exact_dedup(spark):
    # the motivating case: two spellings of the same visible string hash
    # equal only after normalization
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "café"), (2, "café")], "i long, s string"
    )
    raw = df.select(F.countDistinct("s").alias("n")).collect()[0]["n"]
    norm = df.select(
        F.countDistinct(unicode_normalize("s")).alias("n")
    ).collect()[0]["n"]
    assert (raw, norm) == (2, 1)
