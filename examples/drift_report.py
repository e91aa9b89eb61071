"""Distribution-drift report on the engine's public API — the check a
training-data pipeline runs between corpus snapshots before kicking
off an expensive retrain:

    1. q_psi_drift           — WHERE the distribution moved (binned)
    2. q_ks_two_sample       — DID it move (exact integer-lattice D)
    3. q_permutation_test    — IS the move significant (dist.-free p)
    4. q_welch_ttest         — did the MEAN move (parametric view)
    5. sim_embedding_drift   — did the EMBEDDING SPACE move
    6. stream_psi_monitor    — the same PSI maintained per micro-batch

Every number is oracle-checked in the registry (CORRECTNESS_FULL);
this example just composes them into the one-page report.

Run: ``python examples/drift_report.py [sf_dir]``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from cdc_via_flink_spark.plans.registry import load_all
from cdc_via_flink_spark.session import get_spark, tune_for_session


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("drift-report", cpus=8)
    tune_for_session(spark)
    specs = load_all()

    psi = specs["q_psi_drift"].fn(spark, sf_dir)
    total = psi.select("psi_total").head()["psi_total"]
    print(f"\n== PSI by bucket (total {total}) ==")
    psi.show(12, truncate=False)
    verdict = (
        "stable" if total < 0.1 else "watch" if total < 0.25 else "INVESTIGATE"
    )
    print(f"PSI verdict: {verdict}")

    ks = specs["q_ks_two_sample"].fn(spark, sf_dir).head()
    print(
        f"\n== KS two-sample == D = {ks['d_stat']} "
        f"(n_a={ks['n_a']}, n_b={ks['n_b']})"
    )

    perm = specs["q_permutation_test"].fn(spark, sf_dir).head()
    print(
        f"== Randomization test == d_obs = {perm['d_obs']}, "
        f"p = {perm['p_value']} ({perm['n_ge']}/{perm['n_perms']} replicates "
        "as extreme)"
    )

    welch = specs["q_welch_ttest"].fn(spark, sf_dir).head()
    print(
        f"== Welch t == t = {welch['t_stat']}, df = {welch['welch_df']} "
        f"(means {welch['mean_1']} vs {welch['mean_2']})"
    )

    print("\n== Embedding drift (per-label centroid cosine) ==")
    specs["sim_embedding_drift"].fn(spark, sf_dir).show(truncate=False)

    print("== Streaming PSI monitor (per micro-batch) ==")
    specs["stream_psi_monitor"].fn(spark, sf_dir).orderBy("ep").show(
        truncate=False
    )

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
