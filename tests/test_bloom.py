"""md5 Bloom filter vs a pure-Python reference: exact bit set, no
false negatives, deterministic false positives, broadcast probe plan."""

import hashlib

from pyspark.sql import functions as F

from open_ocr_spark.dataops.bloom import bloom_build, bloom_members

M, K = 2048, 5


def _ref_positions(v, m=M, k=K):
    hx = hashlib.md5(str(v).encode()).hexdigest()
    h1 = int(hx[:8], 16) % 2147483647
    h2 = int(hx[8:16], 16) % 2147483647
    return [(h1 + i * h2) % m for i in range(k)]


def _ref_bits(values):
    return {p for v in values for p in _ref_positions(v)}


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "key long")


def test_bits_match_reference(spark):
    keys = list(range(0, 400, 3))
    got = {r.bit for r in bloom_build(_df(spark, keys), "key", M, K).collect()}
    assert got == _ref_bits(keys)


def test_membership_matches_reference(spark):
    keys = list(range(0, 600, 2))   # evens in the filter
    probes = list(range(600))       # probe everything
    bits = bloom_build(_df(spark, keys), "key", M, K)
    got = {
        r.key
        for r in bloom_members(_df(spark, probes), "key", bits, M, K).collect()
    }
    refbits = _ref_bits(keys)
    want = {
        p for p in probes if all(x in refbits for x in _ref_positions(p))
    }
    assert got == want
    # no false negatives, ever
    assert set(keys) <= got
    # the tight filter must produce SOME false positives here, or the
    # test proves nothing about FP determinism
    assert got - set(keys)


def test_probe_join_is_broadcast(spark):
    bits = bloom_build(_df(spark, [1, 2, 3]), "key", M, K)
    plan = (
        bloom_members(_df(spark, [1, 5]), "key", bits, M, K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_parallelism_invariant(spark):
    keys, probes = list(range(0, 1000, 7)), list(range(500))
    outs = []
    for parts in ("2", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            bits = bloom_build(_df(spark, keys), "key", M, K)
            outs.append(
                sorted(
                    r.key
                    for r in bloom_members(
                        _df(spark, probes), "key", bits, M, K
                    ).collect()
                )
            )
        finally:
            spark.conf.unset("spark.sql.shuffle.partitions")
    assert outs[0] == outs[1]
