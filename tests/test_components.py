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


def test_union_recursive_cte_probe_and_sql_twin(spark):
    """Probe whether this Spark supports UNION-distinct recursion (the
    form the terminating closure needs). Today it raises
    UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE — when a future Spark ships
    it, this test runs the TRUE recursive form and compares it to the
    unrolled dedup_clusters_sql surface; until then it documents the
    gate by skipping that half cleanly."""
    import pytest

    from cdc_via_flink_spark.plans.dedup_queries import (
        _unrolled_components_sql,
    )
    from tests.conftest import SF0001

    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (7, 8)], "id_a long, id_b long"
    ).createOrReplaceTempView("probe_pairs")
    # unrolled surface on a cyclic graph: exact components + converged
    got = {
        (r.node, r.component, r.converged)
        for r in spark.sql(_unrolled_components_sql("probe_pairs")).collect()
    }
    assert got == {
        (1, 1, True), (2, 1, True), (3, 1, True), (7, 7, True), (8, 7, True),
    }

    recursive_form = """
WITH RECURSIVE sym AS (
  SELECT id_a AS u, id_b AS v FROM probe_pairs
  UNION SELECT id_b, id_a FROM probe_pairs
),
reach(u, r) AS (
  SELECT DISTINCT u, u FROM sym
  UNION
  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.u
)
SELECT u AS node, min(r) AS component FROM reach GROUP BY u
"""
    try:
        rows = spark.sql(recursive_form).collect()
    except Exception as e:
        if "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE" in str(e):
            pytest.skip("Spark recursive CTE is still UNION ALL-only")
        raise
    assert {(r.node, r.component) for r in rows} == {
        (n, c) for n, c, _ in got
    }
