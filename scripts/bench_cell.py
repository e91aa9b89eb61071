"""Time individual bench cells with the exact bench.py methodology
(noop sink, warm plan at sf0.001, min-of-N, cross-cell state drop) —
the optimization round's A/B harness. Usage:

    python scripts/bench_cell.py q_pagerank3 [q_kcore_peel ...]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CELL_RUNS
(default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_CELL_RUNS", "3"))
    names = sys.argv[1:]

    from cdc_via_flink_spark.plans.registry import load_all
    from cdc_via_flink_spark.session import get_spark

    specs = load_all()
    spark = get_spark("bench-cell")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _drop() -> None:
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(True)
        spark.sparkContext._jvm.System.gc()
        # Python-side memos too (VERDICT r12 #4) — keep the A/B
        # harness's cell definition identical to bench.py's.
        from cdc_via_flink_spark.operators import banding, similarity

        similarity._SIZING_MEMO.clear()
        banding._GUARD_MEMO.clear()

    warm_dir = "/root/testdata/sf0.001"
    out = {}
    for name in names:
        spec = specs[name]
        if os.path.realpath(warm_dir) != os.path.realpath(sf_dir):
            spec.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        if name.startswith("stream_"):
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        _drop()
        best, all_runs = float("inf"), []
        for _ in range(runs):
            t0 = time.time()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            all_runs.append(round(dt, 3))
            best = min(best, dt)
            _drop()
        out[name] = {"min": round(best, 3), "runs": all_runs}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
