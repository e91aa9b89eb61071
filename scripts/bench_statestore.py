"""State-store profile for the ST1 streaming assembler (VERDICT r3
next-round #5): HDFS-backed vs RocksDB (and RocksDB + changelog
checkpointing) under MULTI-BATCH load with a GROWING key space.

Workload: B micro-batches (maxFilesPerTrigger=1, distinct file
mtimes so arrival order is deterministic); batch b introduces K new
transactions (C change events each) and delivers the ENDs for batch
b-1's transactions — so ~K keys of state persist across every batch
boundary and each batch both inserts and removes keys, the shape a
long-running CDC assembler sustains. Event time advances 20 s per
batch (inside the 1-minute watermark, so nothing is dropped as late).

Per provider it prints wall, marginal events/s, the final on-disk
checkpoint state size, and the PER-BATCH state curve (rows + state
bytes from StreamingQueryProgress.stateOperators) as one JSON line.

Run: python scripts/bench_statestore.py [batches] [keys_per_batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 10
K = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
C = 3  # change events per transaction
STEP_MS = 20_000  # event-time advance per batch

PROVIDERS = {
    "hdfs": {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming."
            "state.HDFSBackedStateStoreProvider"
        ),
    },
    "rocksdb": {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "false",
    },
    "rocksdb_changelog": {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    },
}


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            if os.path.isfile(p):
                total += os.path.getsize(p)
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from cdc_via_flink_spark.operators.debezium import (
        parse_debezium,
        render_change_envelope,
        render_txn_envelope,
    )
    from cdc_via_flink_spark.plans.streaming_queries import STAGE_ROOT
    from cdc_via_flink_spark.session import get_spark
    from cdc_via_flink_spark.streaming.assembler import (
        assemble_transactions_stream,
    )
    from cdc_via_flink_spark.streaming.sources import ENVELOPE_STREAM_SCHEMA

    spark = get_spark("cdc_via_flink_spark-statestore-bench")
    stage = os.path.join(STAGE_ROOT, "statestore_bench", "envelopes")
    if os.path.isdir(stage):
        shutil.rmtree(stage)
    os.makedirs(stage)

    # ------------------------------------------------------------------
    # Stage B batch files with distinct mtimes (FileStreamSource orders
    # by modification time; maxFilesPerTrigger=1 -> one file per batch).
    # ------------------------------------------------------------------
    n_events = 0
    for b in range(B):
        gen = spark.range(K).select(
            (F.col("id") + b * K).alias("n"),
        )
        base_ts = 1_700_000_000_000 + b * STEP_MS
        changes = gen.select(
            F.explode(F.sequence(F.lit(0), F.lit(C - 1))).alias("i"), "n"
        ).select(
            (F.col("n") * (C + 1) + F.col("i")).alias("seq"),
            render_change_envelope(
                F.lit("u"),
                F.lit(base_ts) + F.col("n") % 1000,
                F.concat(F.lit("txn-"), F.col("n").cast("string")),
                F.lit(None).cast("string"),
                F.to_json(F.struct(F.col("n").alias("k"))),
            ).alias("value"),
        )
        parts = [changes]
        if b > 0:
            prev = spark.range(K).select((F.col("id") + (b - 1) * K).alias("n"))
            ends = prev.select(
                (F.col("n") * (C + 1) + C).alias("seq"),
                render_txn_envelope(
                    F.lit("END"),
                    F.concat(F.lit("txn-"), F.col("n").cast("string")),
                    F.lit(C).cast("long"),
                ).alias("value"),
            )
            parts.append(ends)
        batch = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        n_events += batch.count()
        batch.coalesce(1).write.mode("append").parquet(stage)
        time.sleep(0.05)  # distinct mtimes -> deterministic batch order

    results = {}
    for name, confs in PROVIDERS.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        ckpt = os.path.join(STAGE_ROOT, "statestore_bench", f"ckpt_{name}")
        if os.path.isdir(ckpt):
            shutil.rmtree(ckpt)
        stream = (
            spark.readStream.schema(ENVELOPE_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        event_time = F.coalesce(
            F.timestamp_millis(F.col("ts_ms")),
            # END rows carry no ts: pin them to their generation's time
            F.timestamp_millis(
                (
                    F.lit(1_700_000_000_000)
                    + F.floor(F.col("seq") / ((C + 1) * K)) * STEP_MS
                ).cast("long")
            ),
        )
        assembled = assemble_transactions_stream(
            parse_debezium(stream), event_time=event_time
        )
        qname = f"statestore_{name}"
        t0 = time.time()
        q = (
            assembled.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.time() - t0
        n_out = spark.table(qname).count()
        curve = []
        for p in q.recentProgress:
            ops = p.get("stateOperators") or []
            if not ops:
                continue
            curve.append(
                {
                    "batch": p["batchId"],
                    "input_rows": p["numInputRows"],
                    "batch_ms": p["durationMs"].get("triggerExecution"),
                    "state_rows": ops[0].get("numRowsTotal"),
                    "state_bytes": ops[0].get("stateMemory")
                    or ops[0].get("memoryUsedBytes"),
                }
            )
        results[name] = {
            "wall_sec": round(wall, 3),
            "events_per_sec": round(n_events / wall, 1),
            "transactions_emitted": n_out,
            "checkpoint_state_bytes": _du(os.path.join(ckpt, "state")),
            "curve": curve,
        }

    print(
        json.dumps(
            {
                "metric": "st1_statestore_profile",
                "batches": B,
                "keys_per_batch": K,
                "changes_per_txn": C,
                "events": n_events,
                "providers": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
