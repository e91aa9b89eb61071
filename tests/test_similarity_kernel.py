"""Bit-parity pin for the Arrow sequential-order dot kernel
(operators/similarity._seqdot_map_in_arrow, VERDICT r12 #5): the
kernel's float64 summation must reproduce the Catalyst
zip_with+aggregate fold EXACTLY — same IEEE multiply, same
left-to-right add order, same 0.0 init — because the verified cosine
is rounded to 6 dp and compared against a threshold, so a single ulp
of drift can flip a pair in or out of the declared output.

Pins equality on every fixture SF (the full verified pair set of
sim_embedding_neardup under both paths) plus adversarial local cases:
catastrophic-cancellation vectors where pairwise (np.sum/np.dot)
association provably differs from sequential, null vectors, and
length mismatches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import cdc_via_flink_spark.operators.similarity as S
from cdc_via_flink_spark.functions.vectors import dot

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.fixture()
def _restore_flag():
    prev = S._VERIFY_VIA_ARROW
    yield
    S._VERIFY_VIA_ARROW = prev


def _rows(spark, sf, flag):
    from cdc_via_flink_spark.plans.registry import load_all

    S._VERIFY_VIA_ARROW = flag
    df = load_all()["sim_embedding_neardup"].fn(spark, sf)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("sf", SFS)
def test_neardup_pairs_bit_identical_under_arrow_kernel(spark, sf, _restore_flag):
    assert _rows(spark, sf, False) == _rows(spark, sf, True)


def test_seqdot_matches_fold_on_cancellation_vectors(spark, _restore_flag):
    # sequential ((1e16 + 1) - 1e16) + 1 = 2.0 exactly in float64 only
    # under LEFT-TO-RIGHT association; pairwise (1e16 + 1) + (-1e16 + 1)
    # gives the same here, so also include a case where they differ:
    # [1e16, 1.0, -1e16, 1.0] sequential = 2.0 but np.dot/pairwise can
    # fold (1e16 + 1.0) -> 1e16 first. The kernel must match the FOLD.
    cases = [
        [1e16, 1.0, -1e16, 1.0],
        [1.0, 1e100, 1.0, -1e100],
        [0.3, 0.1, -0.4, 1e-17, 1e-17, 1e-17],
        [-0.0, 0.0, -0.0],
        [float("1e-308"), 1e308, -1e308, 1.0],
    ]
    rows = [(i, c, c) for i, c in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "id_a long, va array<double>, vb array<double>"
    ).withColumn("id_b", F.col("id_a")).withColumn("den", F.lit(1.0))
    jvm = {
        r["id_a"]: r["d"]
        for r in df.select(
            "id_a", dot(F.col("va"), F.col("vb")).alias("d")
        ).collect()
    }
    arrow = {
        r["id_a"]: r["dt"]
        for r in S._seqdot_map_in_arrow(
            df.select("id_a", "id_b", "va", "vb", "den")
        ).collect()
    }
    for k in jvm:
        # repr-level equality = bit equality for float64 (incl. -0.0)
        assert repr(jvm[k]) == repr(arrow[k]), (k, jvm[k], arrow[k])


def test_seqdot_null_semantics(spark, _restore_flag):
    rows = [
        (0, None, [1.0, 2.0]),  # null side -> null dot
        (1, [1.0, 2.0], [1.0]),  # length mismatch -> null (zip_with pads null)
        (2, [], []),  # empty arrays -> fold init 0.0
    ]
    df = spark.createDataFrame(
        rows, "id_a long, va array<double>, vb array<double>"
    ).withColumn("id_b", F.col("id_a")).withColumn("den", F.lit(1.0))
    jvm = {
        r["id_a"]: r["d"]
        for r in df.select(
            "id_a", dot(F.col("va"), F.col("vb")).alias("d")
        ).collect()
    }
    arrow = {
        r["id_a"]: r["dt"]
        for r in S._seqdot_map_in_arrow(
            df.select("id_a", "id_b", "va", "vb", "den")
        ).collect()
    }
    assert jvm == arrow
