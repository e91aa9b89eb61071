"""Causal-analysis report on the engine's public API — the five
standard identification strategies, each a declared (oracle-checked)
query, composed into the one-page readout an experimentation platform
produces when a true A/B test isn't available:

    1. q_uplift_by_segment        — randomized lift (the gold standard
                                    when assignment WAS random)
    2. q_diff_in_diff             — parallel-trends identification
    3. q_regression_discontinuity — assignment by threshold
    4. q_iv_wald_estimate         — encouragement / instrument
    5. q_propensity_att           — observational matching (as-of
                                    union-scan, bucketed fill)
    + q_fdr_bh                    — the multiple-testing layer over
                                    the per-segment tests

Every number is oracle-checked in the registry (CORRECTNESS_FULL);
this example composes them. On TPC-H the "effects" are honest ~0s /
illustrative — the REPORT SHAPE is the product.

Run: ``python examples/causal_report.py [sf_dir]``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from cdc_via_flink_spark.plans.registry import load_all
from cdc_via_flink_spark.session import get_spark, tune_for_session


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("causal-report", cpus=8)
    tune_for_session(spark)
    specs = load_all()

    print("\n== Uplift by segment (randomized-lift view) ==")
    specs["q_uplift_by_segment"].fn(spark, sf_dir).show(truncate=False)

    print("== Difference-in-differences (parallel trends) ==")
    specs["q_diff_in_diff"].fn(spark, sf_dir).show(truncate=False)

    rd = specs["q_regression_discontinuity"].fn(spark, sf_dir).head()
    print(
        f"== Regression discontinuity == jump at cutoff = "
        f"{rd['rd_estimate']} (slopes {rd['slope_left']} | "
        f"{rd['slope_right']}, n = {rd['n_left']}+{rd['n_right']})"
    )

    iv = specs["q_iv_wald_estimate"].fn(spark, sf_dir).head()
    print(
        f"== IV / Wald == first stage = {iv['first_stage']}, "
        f"reduced form = {iv['reduced_form']}, LATE = {iv['wald_late']}"
    )

    m = specs["q_propensity_att"].fn(spark, sf_dir).head()
    print(
        f"== Matching == ATT = {m['att']} over {m['n_matched']}/"
        f"{m['n_treated']} matched (mean score gap {m['mean_score_gap']})"
    )

    print("\n== FDR control over the per-nation tests ==")
    specs["q_fdr_bh"].fn(spark, sf_dir).show(25, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
