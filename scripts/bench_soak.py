"""Streaming soak one decade up (round-4 VERDICT next-round #5):
replay ~1M envelope events (10x the STATESTORE_r04 volume) through
BOTH stateful assemblers (applyInPandasWithState and the Spark-4
transformWithStateInPandas twin) and the stateful temporal table
join, under RocksDB + changelog checkpointing, paced with
maxFilesPerTrigger=1 micro-batches.

What the curves must show (the artifact's point):
- assembler: FLAT state across batches (emit+clear — every batch both
  inserts ~K keys and removes the ~K keys whose END arrived), so
  state never trends with total volume;
- temporal join: state bounded by O(unmatured probes + in-watermark-
  lag dim versions + 1 compacted version per key) — flat once the
  watermark starts maturing, NOT proportional to replayed volume.

Prints ONE JSON line; the round artifact is STATESTORE_r05.json.
Run: python scripts/bench_soak.py [batches] [keys_per_batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 25
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
C = 3  # change events per transaction
STEP_MS = 20_000
BASE_TS = 1_700_000_000_000

ROCKS_CHANGELOG = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            if os.path.isfile(p):
                total += os.path.getsize(p)
    return total


def _curve(q):
    out = []
    for p in q.recentProgress:
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        out.append(
            {
                "batch": p["batchId"],
                "input_rows": p["numInputRows"],
                "batch_ms": p["durationMs"].get("triggerExecution"),
                "state_rows": ops[0].get("numRowsTotal"),
                "state_bytes": ops[0].get("stateMemory")
                or ops[0].get("memoryUsedBytes"),
            }
        )
    return out


def _run_stream(spark, sdf, ckpt, qname):
    t0 = time.time()
    q = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    return q, wall, spark.table(qname).count()


def _stage_assembler(spark, F, stage):
    """B batch files: batch b brings K new txns (C changes each) and
    the ENDs for batch b-1's txns (same shape as bench_statestore)."""
    from cdc_via_flink_spark.operators.debezium import (
        render_change_envelope,
        render_txn_envelope,
    )

    n_events = 0
    for b in range(B):
        gen = spark.range(K).select((F.col("id") + b * K).alias("n"))
        base_ts = BASE_TS + b * STEP_MS
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
            parts.append(
                prev.select(
                    (F.col("n") * (C + 1) + C).alias("seq"),
                    render_txn_envelope(
                        F.lit("END"),
                        F.concat(F.lit("txn-"), F.col("n").cast("string")),
                        F.lit(C).cast("long"),
                    ).alias("value"),
                )
            )
        batch = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        n_events += batch.count()
        batch.coalesce(1).write.mode("append").parquet(stage)
        time.sleep(0.05)
    return n_events


STEP_MS_T = 120_000  # temporal batches advance 2 min of event time so
# the 10-minute watermark starts maturing probes ~5 batches in — the
# curve then shows in-lag-bounded state, not volume-proportional state


def _stage_temporal(spark, F, stage):
    """B batch files of tagged P/D rows: batch b writes K dim-version
    updates and K probes for ITS OWN event-time window, so versions
    mature out of state as the watermark advances — in-lag state stays
    O(K), not O(total)."""
    n_events = 0
    for b in range(B):
        base_ts = BASE_TS + b * STEP_MS_T
        gen = spark.range(K).select(F.col("id").alias("n"))
        dims = gen.select(
            F.concat(F.lit("k-"), F.col("n").cast("string")).alias("txn_id"),
            (F.lit(b * 2 * K) + F.col("n")).alias("seq"),
            F.lit("D").alias("side"),
            F.lit("u").alias("op"),
            (F.lit(base_ts) + F.col("n") % 500).alias("ts_ms"),
        )
        probes = gen.select(
            F.concat(F.lit("k-"), F.col("n").cast("string")).alias("txn_id"),
            (F.lit(b * 2 * K + K) + F.col("n")).alias("seq"),
            F.lit("P").alias("side"),
            F.lit("u").alias("op"),
            (F.lit(base_ts) + F.lit(1000) + F.col("n") % 500).alias("ts_ms"),
        )
        batch = dims.unionByName(probes)
        n_events += batch.count()
        batch.coalesce(1).write.mode("append").parquet(stage)
        time.sleep(0.05)
    return n_events


def main() -> None:
    from pyspark.sql import functions as F

    from cdc_via_flink_spark.operators.debezium import parse_debezium
    from cdc_via_flink_spark.plans.streaming_queries import STAGE_ROOT
    from cdc_via_flink_spark.session import get_spark
    from cdc_via_flink_spark.streaming.assembler import (
        assemble_transactions_stream,
    )
    from cdc_via_flink_spark.streaming.assembler_tws import (
        assemble_transactions_stream_tws,
    )
    from cdc_via_flink_spark.streaming.sources import ENVELOPE_STREAM_SCHEMA
    from cdc_via_flink_spark.streaming.temporal import temporal_join_stream
    from cdc_via_flink_spark.streaming.temporal_tws import (
        temporal_join_stream_tws,
    )

    spark = get_spark("cdc_via_flink_spark-soak")
    for k, v in ROCKS_CHANGELOG.items():
        spark.conf.set(k, v)
    root = os.path.join(STAGE_ROOT, "soak_bench")
    if os.path.isdir(root):
        shutil.rmtree(root)

    results: dict[str, dict] = {}

    # ---------------- assemblers (shared staged input) ----------------
    stage_a = os.path.join(root, "envelopes")
    os.makedirs(stage_a)
    n_events = _stage_assembler(spark, F, stage_a)
    event_time = F.coalesce(
        F.timestamp_millis(F.col("ts_ms")),
        F.timestamp_millis(
            (
                F.lit(BASE_TS) + F.floor(F.col("seq") / ((C + 1) * K)) * STEP_MS
            ).cast("long")
        ),
    )
    for name, wire in (
        ("assembler_apiws", assemble_transactions_stream),
        ("assembler_tws", assemble_transactions_stream_tws),
    ):
        stream = (
            spark.readStream.schema(ENVELOPE_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_a)
        )
        assembled = wire(parse_debezium(stream), event_time=event_time)
        ckpt = os.path.join(root, f"ckpt_{name}")
        q, wall, n_out = _run_stream(spark, assembled, ckpt, f"soak_{name}")
        results[name] = {
            "events": n_events,
            "wall_sec": round(wall, 3),
            "events_per_sec": round(n_events / wall, 1),
            "transactions_emitted": n_out,
            "checkpoint_state_bytes": _du(os.path.join(ckpt, "state")),
            "curve": _curve(q),
        }

    # ---------------- temporal join (both APIs) ----------------
    stage_t = os.path.join(root, "tagged")
    os.makedirs(stage_t)
    n_t = _stage_temporal(spark, F, stage_t)
    for name, wire in (
        ("temporal_apiws", temporal_join_stream),
        ("temporal_tws", temporal_join_stream_tws),
    ):
        stream = (
            spark.readStream.schema(
                "txn_id string, seq long, side string, op string, ts_ms long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_t)
        )
        joined = wire(stream)
        ckpt = os.path.join(root, f"ckpt_{name}")
        q, wall, n_out = _run_stream(spark, joined, ckpt, f"soak_{name}")
        results[name] = {
            "events": n_t,
            "wall_sec": round(wall, 3),
            "events_per_sec": round(n_t / wall, 1),
            "rows_emitted": n_out,
            "checkpoint_state_bytes": _du(os.path.join(ckpt, "state")),
            "curve": _curve(q),
        }

    # -------- SCD2 maintainers (eager + watermark-buffered, r6) -------
    # reuse the temporal staging's dim side as a change stream: both
    # maintainers must show FLAT state (eager: one open version per
    # key; buffered: open version + in-watermark-lag buffer only)
    from cdc_via_flink_spark.streaming.scd2 import (
        scd2_stream,
        scd2_stream_buffered,
    )

    for name, wire in (
        ("scd2_eager", scd2_stream),
        ("scd2_buffered", scd2_stream_buffered),
    ):
        stream = (
            spark.readStream.schema(
                "txn_id string, seq long, side string, op string, ts_ms long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_t)
        )
        ch = stream.filter(F.col("side") == "D").select(
            "txn_id", "seq", "op", "ts_ms"
        )
        # only the dim half of the staged rows reaches the maintainer —
        # report THAT count, not n_t (review finding: n_t would
        # overstate throughput 2×)
        n_ch = n_t // 2
        ckpt = os.path.join(root, f"ckpt_{name}")
        q, wall, n_out = _run_stream(spark, wire(ch), ckpt, f"soak_{name}")
        results[name] = {
            "events": n_ch,
            "wall_sec": round(wall, 3),
            "events_per_sec": round(n_ch / wall, 1),
            "rows_emitted": n_out,
            "checkpoint_state_bytes": _du(os.path.join(ckpt, "state")),
            "curve": _curve(q),
        }

    print(
        json.dumps(
            {
                "metric": "streaming_soak_10x",
                "batches": B,
                "keys_per_batch": K,
                "changes_per_txn": C,
                "state_store": "rocksdb+changelog",
                "streams": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
