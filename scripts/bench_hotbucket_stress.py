"""Hot-bucket stress for the skew-guarded band self-join
(operators/banding.py, VERDICT r5 #7 "done" criterion): one
pathological bucket whose pair space would land on a single task
without the guard.

Corpus: ONE band bucket holding N rows (plus a scatter of normal
buckets), so the plain self-join owes C(N, 2) pair evaluations on one
task while the guard spreads them over s² = ceil(N/cap)² tasks.
Measures wall time and verifies the pair COUNT is identical between
the guarded (default cap) and effectively-unguarded (cap ≥ N) runs;
the full pair-set equality at smaller N is pinned by
tests/test_banding.py.

Prints ONE JSON line; recorded as STRESS_r{N}_hotbucket.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.banding import BUCKET_CAP, band_self_join
from cdc_via_flink_spark.session import get_spark

N_HOT = 24_000          # C(N,2) = 2.88e8 pairs in ONE bucket
N_COLD_BUCKETS = 64     # background: 64 normal buckets x 64 rows


def main() -> None:
    spark = get_spark("hotbucket-stress")
    hot = spark.range(N_HOT).select(
        F.lit(0).alias("band"),
        F.lit("hot").alias("bsig"),
        F.col("id").alias("doc_id"),
    )
    cold = spark.range(N_COLD_BUCKETS * 64).select(
        F.lit(1).alias("band"),
        (F.col("id") % N_COLD_BUCKETS).cast("string").alias("bsig"),
        (F.col("id") + 1_000_000).alias("doc_id"),
    )
    banded = hot.unionByName(cold).repartition(32).localCheckpoint(eager=True)

    expected = N_HOT * (N_HOT - 1) // 2 + N_COLD_BUCKETS * (64 * 63 // 2)
    results = {}
    for label, cap in (("guarded", BUCKET_CAP), ("single_task", 10**9)):
        t0 = time.time()
        n = band_self_join(banded, ("band", "bsig"), "doc_id", cap=cap).count()
        results[label] = {
            "cap": cap,
            "pairs": n,
            "sec": round(time.time() - t0, 2),
            "exact": n == expected,
        }
    s = -(-N_HOT // BUCKET_CAP)
    print(
        json.dumps(
            {
                "metric": "hotbucket_stress",
                "n_hot": N_HOT,
                "sub_buckets": s,
                "expected_pairs": expected,
                "results": results,
                "speedup": round(
                    results["single_task"]["sec"] / results["guarded"]["sec"], 2
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
