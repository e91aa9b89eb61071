"""Per-batch fixed-cost curve of the stateful streaming cell vs
STATE-PARTITION COUNT and state-store provider (VERDICT r12 #8 — the
honest version of the rejected local-mode shuffle-partition shrink:
the knob ships as an explicit deployment conf with the default
UNCHANGED, and this artifact records what it buys/costs locally).

Runs the benched representative (stream_temporal_join) interleaved
across {session-default, 16, 8} state partitions x {hdfs, rocksdb}
providers, bench_cell methodology (untimed staging pre-run, min-of-N,
state drop between runs). Writes STATESTORE_r13_partitions.json.

Usage: python scripts/bench_statestore_r13.py [n_rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY = "stream_temporal_join"
PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    ),
}


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cdc_via_flink_spark.plans.registry import load_all
    from cdc_via_flink_spark.session import get_spark

    specs = load_all()
    spec = specs[QUERY]
    spark = get_spark("statestore-r13")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    default_parts = spark.conf.get("spark.sql.shuffle.partitions")

    def _drop() -> None:
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(True)
        spark.sparkContext._jvm.System.gc()

    # untimed staging pre-run (replay staging + codegen)
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    _drop()

    variants = []
    for pname, pclass in PROVIDERS.items():
        for parts in (None, 16, 8):
            variants.append((pname, pclass, parts))

    runs: dict[str, list[float]] = {}
    pkey = "spark.sql.streaming.stateStore.providerClass"
    prev_provider = spark.conf.get(pkey, None)
    order = list(variants)
    for i in range(rounds):
        for pname, pclass, parts in order:
            label = f"{pname}-p{parts or default_parts}"
            spark.conf.set(pkey, pclass)
            if parts is None:
                os.environ.pop("SPARK_GRAFT_STREAM_STATE_PARTITIONS", None)
            else:
                os.environ["SPARK_GRAFT_STREAM_STATE_PARTITIONS"] = str(parts)
            t0 = time.time()
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            runs.setdefault(label, []).append(dt)
            print(json.dumps({"round": i, "variant": label, "sec": dt}), flush=True)
            _drop()
        order.reverse()
    os.environ.pop("SPARK_GRAFT_STREAM_STATE_PARTITIONS", None)
    if prev_provider:
        spark.conf.set(pkey, prev_provider)
    else:
        spark.conf.unset(pkey)

    out = {
        "query": QUERY,
        "sf_dir": sf_dir,
        "session_default_partitions": int(default_parts),
        "methodology": (
            "interleaved ABBA rounds, untimed staging pre-run, noop sink, "
            "cross-cell state drop between runs; default variant = conf "
            "knob UNSET (the shipped bench behavior)"
        ),
        "runs": runs,
        "min": {k: min(v) for k, v in runs.items()},
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STATESTORE_r13_partitions.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
