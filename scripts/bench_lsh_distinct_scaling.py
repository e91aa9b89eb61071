"""DISTINCT-vector scaling check for the SRP-LSH near-dup candidate
stage (VERDICT r5 finding #1 "done" criterion): the clone-based
scaling corpus (bench_scaling.py) holds the distinct-vector count d
fixed — the exact-duplicate class collapse absorbs the copies — so it
cannot see the candidate-stage blowup that adaptive band sizing
(similarity.lsh_plan) exists to prevent. This harness grows d itself:
each m× corpus holds the sf0.1 embeddings plus (m-1) PERTURBED clones
per vector (deterministic hash noise, amplitude 1e-3 → cos ~ 0.99998
to the source: distinct vectors, real near-dup structure).

Measured per m ∈ {1, 3, 10} at the production near-dup threshold
(cos >= 0.9):
  - candidate-pair count out of the bucket self-join
    (similarity._rep_candidates) under (a) ADAPTIVE lsh_plan sizing
    and (b) the old FIXED (bits=3, tables=64);
  - wall time of the full neardup_lsh_pairs operator under adaptive
    sizing (pairs + exact verify + class expansion).

Fixed sizing is measured at m ∈ {1, 3} only: at m=10 its bucket join
emits ~1.6e9 pre-dedup rows (the quadratic blowup this change
removes) — the m=1→3 exponent (~2.0) already pins it, and the skipped
cell is reported explicitly (no silent caps).

All timed cells are MIN-OF-2 (VERDICT r7 #1: the single-run r7
artifact's 10x operator cell read 63.7 s vs 19.72 s in r6 at identical
sizing and candidates — ambient host noise recorded as a regression;
bench.py's min-of-N precedent). The 10x cell additionally A/Bs the
adaptive guard's layout decision (auto vs explicit force/pin — every
layout emits the identical pair set) so a real layout regression is
attributable in-artifact.

Prints ONE JSON line; recorded as SCALING_r{N}_lsh_distinct.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.similarity import (
    _rep_candidates,
    lsh_plan,
    neardup_lsh_pairs,
    to_double,
)
from cdc_via_flink_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp"
)
TAU = 0.9
OFFSET = 1_000_000_000


def build_distinct_scaled(spark, m: int) -> str:
    """sf0.1 embeddings + (m-1) perturbed copies per vector, written
    once. Perturbation is a pure hash expression (RNG-free,
    reproducible): +/- <= 1e-3 per dim from xxhash64(vec_id, dim, k)."""
    out = os.path.join(OUT_ROOT, f"lsh_distinct_{m}x")
    dest = os.path.join(out, "embeddings.parquet")
    if os.path.isdir(dest):
        return out
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", to_double(F.col("embedding")).alias("embedding")
    )
    parts = [base]
    for k in range(1, m):
        noise = F.transform(
            F.col("embedding"),
            lambda x, i: x
            + (
                F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit(k)), F.lit(1001))
                - 500
            )
            / F.lit(500_000.0),
        )
        parts.append(
            base.select(
                (F.col("vec_id") + k * OFFSET).alias("vec_id"),
                noise.alias("embedding"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(dest)
    return out


def main() -> None:
    spark = get_spark("bench-lsh-distinct")

    # Recall cell: the declared sf0.1 query point (threshold 0.4) under
    # its ADAPTIVE sizing must still recover every exact all-pairs
    # true pair — the zero-miss anchor the operator docstring cites.
    from cdc_via_flink_spark.functions.vectors import cosine

    e0 = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    got = neardup_lsh_pairs(e0, threshold=0.4).select("id_a", "id_b")
    d0 = e0.select("vec_id", to_double(F.col("embedding")).alias("v"))
    exact = (
        d0.withColumnsRenamed({"vec_id": "id_a", "v": "va"})
        .join(
            d0.withColumnsRenamed({"vec_id": "id_b", "v": "vb"}),
            F.col("id_a") < F.col("id_b"),
        )
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 6) >= 0.4)
        .select("id_a", "id_b")
    )
    recall_cell = {
        "true_pairs": exact.count(),
        "missed": exact.exceptAll(got).count(),
        "spurious": got.exceptAll(exact).count(),
    }

    results = {}
    for m in (1, 3, 10):
        d_dir = build_distinct_scaled(spark, m)
        e = spark.read.parquet(os.path.join(d_dir, "embeddings.parquet"))
        n = e.count()
        reps = e.select("vec_id", F.col("embedding").alias("v"))
        cell: dict = {"n_distinct": n}

        ab, at = lsh_plan(n, TAU)
        from cdc_via_flink_spark.operators.banding import probe_guard
        from cdc_via_flink_spark.operators.similarity import with_lsh_codes

        decision = probe_guard(
            lambda dd: with_lsh_codes(
                dd.select("vec_id", "v"), "v", bits=ab, tables=at
            ).select(F.posexplode("codes").alias("t", "bucket")),
            reps,
            ("t", "bucket"),
        )

        def timed(fn, runs=2):
            best = float("inf")
            for _ in range(runs):
                t0 = time.time()
                fn()
                best = min(best, time.time() - t0)
            return round(best, 2)

        cand = _rep_candidates(reps, bits=ab, tables=at, probe_input=reps)
        n_cand = cand.count()
        cell["adaptive"] = {
            "bits": ab,
            "tables": at,
            "guard_decision": decision,
            "candidates": n_cand,
            "cand_sec": timed(cand.count),
            "operator_sec": timed(
                lambda: neardup_lsh_pairs(e, threshold=TAU)
                .write.format("noop")
                .mode("overwrite")
                .save()
            ),
        }
        if m == 10:
            # layout A/B (VERDICT r7 #1): identical pair set, only the
            # physical self-join layout differs
            cell["adaptive"]["operator_sec_by_guard"] = {
                g: timed(
                    lambda g=g: neardup_lsh_pairs(e, threshold=TAU, guard=g)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                for g in ("force", "pin")
            }

        if m <= 3:
            fixed = _rep_candidates(reps, bits=3, tables=64, probe_input=reps)
            nf = fixed.count()
            cell["fixed_3_64"] = {"candidates": nf, "cand_sec": timed(fixed.count)}
        else:
            cell["fixed_3_64"] = "skipped: ~1.6e9-row bucket join (the quadratic cell this change removes)"
        results[f"{m}x"] = cell

    def expo(a, b, ma, mb):
        return round(math.log(b / a) / math.log(mb / ma), 2)

    summary = {
        "adaptive_candidates_exponent_1to10": expo(
            results["1x"]["adaptive"]["candidates"],
            results["10x"]["adaptive"]["candidates"],
            1,
            10,
        ),
        "fixed_candidates_exponent_1to3": expo(
            results["1x"]["fixed_3_64"]["candidates"],
            results["3x"]["fixed_3_64"]["candidates"],
            1,
            3,
        ),
        "adaptive_operator_exponent_1to10": expo(
            results["1x"]["adaptive"]["operator_sec"],
            results["10x"]["adaptive"]["operator_sec"],
            1,
            10,
        ),
    }
    print(
        json.dumps(
            {
                "metric": "lsh_distinct_scaling",
                "threshold": TAU,
                "sf01_recall_tau04": recall_cell,
                "queries": results,
                "summary": summary,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
