"""Scaling check: run the bench headline queries at sf0.1 and at a
synthesized N× dataset (same session, plans pre-compiled) and print
per-query times, ratios and SCALING EXPONENTS as one JSON line.

Usage: python scripts/bench_scaling.py [copies]   (default 3)

The N× set is sf0.1 unioned N times with key columns offset by
1e9 per copy (join integrity preserved; fixed dims region/nation kept
as-is), written once to .tmp/sf0.{N}x. copies=10 synthesizes sf1.
A near-1× ratio means the query is bottlenecked on fixed costs
(scales out flat); near-N× means CPU-bound per-row work (scales out
linearly with executors). The exponent log(ratio)/log(N) normalizes
across N: 1.0 = linear, <1 sub-linear, >1 super-linear (a plan that
would NOT survive 100×). Recorded in BASELINE.md "Scaling check".
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cdc_via_flink_spark.plans.registry import load_all
from cdc_via_flink_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 3
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp",
    f"sf0.{COPIES}x",
)
OFFSET = 1_000_000_000

ID_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def build_scaled(spark) -> None:
    if os.path.isdir(OUT_DIR):
        shutil.rmtree(OUT_DIR)
    os.makedirs(OUT_DIR, exist_ok=True)
    for t in FIXED:
        shutil.copy(os.path.join(SF_DIR, f"{t}.parquet"), os.path.join(OUT_DIR, f"{t}.parquet"))
    for t, ids in ID_COLS.items():
        base = spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet"))
        parts = []
        for k in range(COPIES):
            df = base
            for c in ids:
                df = df.withColumn(c, F.col(c) + F.lit(k * OFFSET))
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(OUT_DIR, f"{t}.parquet"))


def main() -> None:
    spark = get_spark("bench-scaling")
    # events.parquet copies: Spark rewrites ts as int64 micros TIMESTAMP
    # (not nanos), which load_table handles only for the original nanos
    # layout — so write ts as the raw long it was read as.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    build_scaled(spark)

    # SPARK_GRAFT_SCALING_ONLY=name1,name2 measures an explicit query
    # list instead of the bench headline set (unknown names rejected).
    all_specs = load_all()
    only = os.environ.get("SPARK_GRAFT_SCALING_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = sorted(set(names) - set(all_specs))
        if unknown:
            raise SystemExit(f"unknown queries in SPARK_GRAFT_SCALING_ONLY: {unknown}")
        specs = {n: all_specs[n] for n in names}
    else:
        specs = {n: s for n, s in all_specs.items() if s.bench}
    # warm both plan shapes
    for _n, s in sorted(specs.items()):
        s.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    def _drop_persistent_rdds() -> None:
        # iterative queries localCheckpoint intermediates (lineage
        # cuts); the blocks live until session end, so without this
        # the NEXT cell pays the previous cell's storage/GC pressure
        # (measured: q_kcore_peel 12.3 s alone vs 20-44 s after other
        # cells). Between-cell cleanup measures each query's own cost.
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(True)

    results = {}
    big = f"sf0.{COPIES}x"
    for name, s in sorted(specs.items()):
        _drop_persistent_rdds()
        t = {}
        for label, d in (("sf0.1", SF_DIR), (big, OUT_DIR)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                s.fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            t[label] = round(best, 3)
        t["ratio"] = round(t[big] / t["sf0.1"], 2)
        t["exponent"] = round(
            math.log(max(t["ratio"], 0.01)) / math.log(COPIES), 2
        )
        results[name] = t
    print(
        json.dumps(
            {"metric": f"bench_scaling_{COPIES}x", "copies": COPIES, "queries": results}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
