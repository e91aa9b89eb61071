"""approx_count_distinct (A3) error-bound check — no cross-engine
oracle is possible for HLL sketches, so the test asserts the declared
relative-error guarantee against the exact count."""

from __future__ import annotations

from cdc_via_flink_spark.plans.registry import load_all
from tests.conftest import SF0001


def test_approx_distinct_within_bound(spark):
    spec = load_all()["q_approx_distinct"]
    for r in spec.fn(spark, SF0001).collect():
        rel_err = abs(r.approx_parts - r.exact_parts) / max(r.exact_parts, 1)
        assert rel_err < 0.1, f"{r.l_returnflag}: {r.approx_parts} vs {r.exact_parts}"
