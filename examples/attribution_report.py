"""Marketing-attribution report on the engine's public API — the five
credit-assignment rules, each a declared (oracle-checked) query,
composed into the one-page readout a growth team reads before moving
budget:

    1. q_attribution_last_touch — winner-takes-all recency
    2. q_attribution_linear     — equal split across the window
    3. q_attribution_time_decay — recency-weighted (2-day half-life)
    4. q_attribution_shapley    — exact coalition-game credit
                                  (efficiency + symmetry + dummy)
    5. q_attribution_markov     — counterfactual removal effect on an
                                  absorbing-chain journey model

plus the cross-rule AGREEMENT summary this composition exists for:
per-channel credit shares side by side and the min/max spread — the
"does the rule choice change the decision" number. Every input number
is oracle-checked in the registry (CORRECTNESS_FULL); this example
composes them.

Run: ``python examples/attribution_report.py [sf_dir]``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_via_flink_spark.plans.registry import load_all
from cdc_via_flink_spark.session import get_spark, tune_for_session

RULES = (
    ("last_touch", "q_attribution_last_touch", "share"),
    ("linear", "q_attribution_linear", "share"),
    ("time_decay", "q_attribution_time_decay", "share"),
    ("shapley", "q_attribution_shapley", "credit_share"),
    ("markov", "q_attribution_markov", "credit_share"),
)


def build_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per channel: each rule's credit share plus the
    cross-rule spread (max - min share). 'direct' rows (last-touch /
    linear / time-decay only) are kept with nulls under the
    exposure-based rules."""
    specs = load_all()
    out = None
    for label, name, share_col in RULES:
        df = specs[name].fn(spark, sf_dir).select(
            "channel", F.col(share_col).alias(label)
        )
        out = df if out is None else out.join(df, "channel", "full_outer")
    shares = F.array(*[F.col(label) for label, _, _ in RULES])
    present = F.filter(shares, lambda x: x.isNotNull())
    return out.select(
        "channel",
        *[F.col(label) for label, _, _ in RULES],
        F.round(
            F.array_max(present) - F.array_min(present), 6
        ).alias("share_spread"),
    ).orderBy("channel")


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("attribution-report", cpus=8)
    tune_for_session(spark)

    print("\n== Credit shares by rule (per channel) ==")
    cmp_df = build_comparison(spark, sf_dir)
    cmp_df.show(truncate=False)

    spread = cmp_df.agg(F.max("share_spread").alias("mx")).head()["mx"]
    print(
        f"Max cross-rule spread: {spread} — above ~0.1 the rule choice "
        "IS the budget decision; take the Shapley/Markov numbers "
        "(principled) over the positional heuristics.\n"
    )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
