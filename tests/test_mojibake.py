"""Mojibake repair (dataops/mojibake.py): exact round-trip identity over
adversarial inputs, gate behavior on non-mojibake text, double-encoding
peels one layer per pass."""

from pyspark.sql import functions as F

from open_ocr_spark.dataops.mojibake import (
    CP1252_TABLE,
    corrupt_to_mojibake,
    is_mojibake,
    repair_mojibake,
)


def _repair_all(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    rows = (
        df.select(
            "i",
            repair_mojibake(F.col("t")).alias("r"),
            is_mojibake(F.col("t")).alias("m"),
        )
        .orderBy("i")
        .collect()
    )
    return [(r.r, r.m) for r in rows]


def _roundtrip(spark, cleans):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cleans)], "i long, t string"
    )
    rows = (
        df.select(
            "i", repair_mojibake(corrupt_to_mojibake(F.col("t"))).alias("r")
        )
        .orderBy("i")
        .collect()
    )
    return [r.r for r in rows]


ADVERSARIAL = [
    "Crème brûlée — ‘smart’ “quotes”… €5",
    "all cp1252 specials: " + "".join(chr(v) for v in CP1252_TABLE.values()),
    "native C1 controls \x80\x99\x9f inside",
    "boundary points ߿ࠀ￿\U00010000\U0010ffff",
    "emoji 🎉 with ASCII and é accents",
    "ä" * 200,  # long run of 2-byte sequences
]


def test_roundtrip_identity_adversarial(spark):
    assert _roundtrip(spark, ADVERSARIAL) == ADVERSARIAL


def test_classic_digraphs_repair(spark):
    out = _repair_all(spark, ["CrÃ¨me brÃ»lÃ©e", "donâ€™t â€” really"])
    assert out[0] == ("Crème brûlée", True)
    assert out[1] == ("don’t — really", True)


def test_ascii_and_genuine_accents_pass_through(spark):
    texts = ["plain ascii", "café naïve résumé", "emoji 🎉 only"]
    out = _repair_all(spark, texts)
    assert out == [(t, False) for t in texts]


def test_mixed_damage_fails_closed(spark):
    # mojibake AND a supplementary-plane char in one row: all-or-nothing
    # policy -> unchanged
    t = "CrÃ¨me 🎉"
    [(r, m)] = _repair_all(spark, [t])
    assert (r, m) == (t, False)


def test_double_encoding_peels_one_layer_per_pass(spark):
    clean = "déjà vu — encore"
    df = spark.createDataFrame([(clean,)], "t string")
    once = corrupt_to_mojibake(F.col("t"))
    twice = corrupt_to_mojibake(once)
    row = df.select(
        repair_mojibake(twice).alias("r1"),
        repair_mojibake(repair_mojibake(twice)).alias("r2"),
    ).collect()[0]
    assert row.r2 == clean
    assert row.r1 != clean  # one pass peels exactly one layer


def test_truncated_sequence_not_repaired(spark):
    # a lone lead byte char (Ã at end of string) is invalid as bytes
    t = "broken tail Ã"
    [(r, m)] = _repair_all(spark, [t])
    assert (r, m) == (t, False)
