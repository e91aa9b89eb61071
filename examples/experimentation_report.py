"""Experimentation one-pager on the engine's public API — the full
measurement lifecycle, each step a declared (oracle-checked) query:

    1. q_mde_power           — DESIGN: smallest detectable lift per
                               segment at alpha=.05 / power=.80
    2. q_treatment_balance_smd — VALIDITY: are the cohorts comparable
                               (|SMD| < 0.1 rule) before reading any
                               effect?
    3. q_cuped_adjustment    — SENSITIVITY: pre-period covariate
                               shrinks the metric variance by rho^2
    4. q_sprt_monitor        — PEEKING: the always-valid sequential
                               decision state
    5. q_ab_test_proportions — READOUT: the fixed-n test
    6. q_fdr_bh              — MULTIPLICITY: BH control over the
                               per-segment test family

Every number is oracle-checked in the registry; this example composes
them. On TPC-H the "effects" are honest ~0s — the REPORT SHAPE is
the product.

Run: ``python examples/experimentation_report.py [sf_dir]``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from cdc_via_flink_spark.plans.registry import load_all
from cdc_via_flink_spark.session import get_spark, tune_for_session


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("experimentation-report", cpus=8)
    tune_for_session(spark)
    specs = load_all()

    print("\n== 1. Design: minimum detectable effect per segment ==")
    specs["q_mde_power"].fn(spark, sf_dir).show(truncate=False)

    print("== 2. Validity: covariate balance (|SMD| < 0.1 is healthy) ==")
    specs["q_treatment_balance_smd"].fn(spark, sf_dir).show(truncate=False)

    print("== 3. Sensitivity: CUPED variance reduction ==")
    cuped = specs["q_cuped_adjustment"].fn(spark, sf_dir)
    cuped.show(truncate=False)
    vr = cuped.head()["var_reduction"]
    print(
        f"   rho^2 = {vr}: the same experiment needs ~{1.0 / (1.0 - vr):.2f}x"
        " fewer users at equal power with the adjusted metric.\n"
    )

    sprt = specs["q_sprt_monitor"].fn(spark, sf_dir).head()
    print(
        f"== 4. Peeking: SPRT state == {sprt['decision']} after "
        f"{sprt['n_at_decision']} trials (LLR {sprt['llr']})\n"
    )

    print("== 5. Readout: fixed-n two-proportion test ==")
    specs["q_ab_test_proportions"].fn(spark, sf_dir).show(truncate=False)

    print("== 6. Multiplicity: BH rejections over the segment family ==")
    specs["q_fdr_bh"].fn(spark, sf_dir).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
