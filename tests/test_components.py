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


def test_long_path_converges_in_log_rounds(spark):
    # 1000-node path, diameter 999: plain label propagation needs ~999
    # rounds; pointer jumping must land it within the default
    # max_iter=20 (~log2(999) ≈ 10 rounds of doubling).
    got = _cc(spark, [(i, i + 1) for i in range(1, 1000)])
    assert len(got) == 1000 and set(got.values()) == {1}


def test_nonconvergence_raises_not_silent(spark):
    import pytest

    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)
    # strict=False degrades to a warning and still returns labels
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = connected_components(df, max_iter=1, strict=False)
        assert out.count() == 40
        assert any(issubclass(x.category, RuntimeWarning) for x in w)
