"""Interleaved A/B harness (VERDICT r12 #2): times a bench cell under
two code variants ALTERNATED within one session (A,B,A,B,...), state
dropped between runs, so host phase shifts cancel. Usage:

    python scripts/ab_r13.py kmeans_routing [n_pairs]
    python scripts/ab_r13.py gmm_tail [n_pairs]

Writes /tmp/ab_r13_<exp>.json and prints each run as it lands.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


EXPERIMENTS = {
    # exp -> (bench query, module path, flag attr, {variant: value})
    "kmeans_routing": (
        "dedup_semantic",
        "cdc_via_flink_spark.operators.kmeans",
        "_ROUTING_VIA_COLLECT",
        {"collect_r12": True, "checkpoint_r11": False},
    ),
    "gmm_tail": (
        "q_gmm_em_1d",
        "cdc_via_flink_spark.plans.stats_queries",
        "_GMM_TAIL_EXPLODE",
        {"explode_r12": True, "union_r11": False},
    ),
    "minhash_sig": (
        "dedup_minhash_lsh",
        "cdc_via_flink_spark.operators.dedup",
        "_SIG_VIA_ARRAYS",
        {"arrays_r13": True, "agg_r12": False},
    ),
    "verify_arrow": (
        "sim_embedding_neardup",
        "cdc_via_flink_spark.operators.similarity",
        "_VERIFY_VIA_ARROW",
        {"arrow_seqsum_r13": True, "jvm_fold_r12": False},
    ),
    "nb_slp_shj": (
        "text_nb_classify",
        "cdc_via_flink_spark.plans.text_queries",
        "_NB_SLP_SHJ",
        {"shj_r13": True, "smj_r12": False},
    ),
    "sem_drops_shj": (
        "dedup_semantic",
        "cdc_via_flink_spark.operators.dedup",
        "_SEM_DROPS_SHJ",
        {"shj_r13": True, "smj_r12": False},
    ),
}


def main() -> None:
    import importlib

    exp = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    qname, mod_path, attr, variants = EXPERIMENTS[exp]
    mod = importlib.import_module(mod_path)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cdc_via_flink_spark.plans.registry import load_all
    from cdc_via_flink_spark.session import get_spark

    specs = load_all()
    spec = specs[qname]
    spark = get_spark("ab-r13")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _drop() -> None:
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(True)
        spark.sparkContext._jvm.System.gc()
        from cdc_via_flink_spark.operators import banding, similarity

        similarity._SIZING_MEMO.clear()
        banding._GUARD_MEMO.clear()

    # plan-warm both variants at sf0.001 (codegen/JIT out of the cells)
    for vname, vval in variants.items():
        setattr(mod, attr, vval)
        spec.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    _drop()

    runs: dict[str, list[float]] = {v: [] for v in variants}
    order = list(variants.items())
    for i in range(n_pairs):
        for vname, vval in order:
            setattr(mod, attr, vval)
            t0 = time.time()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            runs[vname].append(dt)
            print(json.dumps({"pair": i, "variant": vname, "sec": dt}), flush=True)
            _drop()
        order.reverse()  # ABBA ordering: cancels linear drift too

    out = {
        "experiment": exp,
        "query": qname,
        "sf_dir": sf_dir,
        "runs": runs,
        "min": {v: min(r) for v, r in runs.items()},
        "median": {v: sorted(r)[len(r) // 2] for v, r in runs.items()},
    }
    with open(f"/tmp/ab_r13_{exp}.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
