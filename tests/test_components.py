"""connected_components unit tests: chains, stars, disjoint sets —
shapes that need >1 propagation round (transitivity, the thing pair
output alone can't give you)."""

from __future__ import annotations

from cdc_via_flink_spark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, several rounds to converge
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_keep_separate_keepers(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30}


def test_star_and_reversed_edges(spark):
    # star centered high, edges in arbitrary direction: min wins anyway
    got = _cc(spark, [(100, 7), (100, 8), (9, 100)])
    assert got == {7: 7, 8: 7, 9: 7, 100: 7}
