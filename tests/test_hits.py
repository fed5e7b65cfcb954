"""Integer-domain HITS (dataops/hits.py): known-graph semantics, score
bounds, and edge direction — the shuffle-count invariance of the full
host_hits chain is pinned in test_parallelism_invariance.py."""

import pytest

from open_ocr_spark.dataops.hits import SCALE, hits_int


def _run(spark, edges, iterations=3):
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = hits_int(df, iterations=iterations).collect()
    return {r["node"]: (r["hub"], r["authority"]) for r in rows}


def test_star_graph_hub_vs_authority(spark):
    # one hub pointing at three leaves: the center is a pure hub, the
    # leaves are pure (equal) authorities
    scores = _run(spark, [("c", "l1"), ("c", "l2"), ("c", "l3")])
    assert scores["c"][1] == 0          # nothing points at the center
    assert scores["l1"][0] == 0         # leaves point at nothing
    assert scores["l1"] == scores["l2"] == scores["l3"]
    assert scores["c"][0] > 0 and scores["l1"][1] > 0


def test_authority_ranks_by_in_hub_mass(spark):
    # two hubs point at "a", one at "b": authority(a) > authority(b)
    scores = _run(spark, [("h1", "a"), ("h2", "a"), ("h2", "b")])
    assert scores["a"][1] > scores["b"][1]
    # h2 points at both targets, h1 at one: hub(h2) > hub(h1)
    assert scores["h2"][0] > scores["h1"][0]


def test_multi_edges_count_once(spark):
    once = _run(spark, [("h", "a"), ("h", "b")])
    dup = _run(spark, [("h", "a"), ("h", "a"), ("h", "b")])
    assert once == dup


def test_scores_bounded_by_renormalization(spark):
    edges = [(f"s{i}", f"d{(i * 3 + 1) % 7}") for i in range(20)]
    scores = _run(spark, edges, iterations=5)
    assert all(
        0 <= h < 2 * SCALE and 0 <= a < 2 * SCALE
        for h, a in scores.values()
    )


def test_iterations_must_be_positive(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="iterations"):
        hits_int(df, iterations=0)
