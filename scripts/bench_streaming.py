"""Streaming-path throughput: events/s through the full ST1 pipeline
(file-replay envelopes → parse → watermark → stateful assembler →
memory sink), availableNow replay at $SPARK_GRAFT_SF_DIR.

Usage: python scripts/bench_streaming.py [apiws|tws]
  apiws (default) — applyInPandasWithState (streaming/assembler.py)
  tws             — transformWithStateInPandas (assembler_tws.py;
                    forces the RocksDB state store, a tWS requirement)

Prints one JSON line: {"metric": "st1_stream_throughput",
"value": <events_per_sec>, ...} — complements bench.py (batch).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    api = sys.argv[1] if len(sys.argv) > 1 else "apiws"
    if api not in ("apiws", "tws"):
        raise SystemExit(f"api must be apiws|tws, got {api!r}")

    from pyspark.sql import functions as F

    from cdc_via_flink_spark.plans.cdc_queries import _envelopes
    from cdc_via_flink_spark.plans.streaming_queries import (
        _run_to_memory,
        _staged_envelope_stream,
    )
    from cdc_via_flink_spark.operators.debezium import parse_debezium
    from cdc_via_flink_spark.session import get_spark
    from cdc_via_flink_spark.sources.tables import load_table

    if api == "tws":
        from cdc_via_flink_spark.streaming.assembler_tws import (
            assemble_transactions_stream_tws as assemble_transactions_stream,
        )
        from cdc_via_flink_spark.vendor.proto_compat import ensure_protobuf

        ensure_protobuf()
    else:
        from cdc_via_flink_spark.streaming.assembler import (
            assemble_transactions_stream,
        )

    spark = get_spark("cdc_via_flink_spark-stream-bench")
    if api == "tws":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider",
        )
        from cdc_via_flink_spark.vendor.proto_compat import ship_to_workers

        ship_to_workers(spark)
    n_events = _envelopes(spark, sf_dir).count()  # also warms the stage dir

    base_ms = (
        load_table(spark, sf_dir, "events").agg(F.max("ts_ms").alias("m")).collect()[0]["m"]
    )
    event_time = F.coalesce(
        F.timestamp_millis(F.col("ts_ms")),
        F.timestamp_millis(F.lit(base_ms) + F.col("seq")),
    )

    # Parallel staging: the declared query's single-file stage keeps
    # multi-batch replays in arrival order (its docstring), but this
    # availableNow bench processes everything in ONE batch, where
    # within-batch order is irrelevant (the assembler sorts by seq per
    # key) — so stage N files and let N cores parse.
    from cdc_via_flink_spark.plans.streaming_queries import STAGE_ROOT
    from cdc_via_flink_spark.session import default_parallelism
    from cdc_via_flink_spark.streaming.sources import file_envelope_stream

    # Warm-up: run the identical pipeline once at sf0.001 so codegen,
    # Python workers, and the state-store machinery are hot (a
    # long-running streaming job amortizes these; a cold JVM should
    # not be charged for them per measurement).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        wstage = os.path.join(STAGE_ROOT, "stream_bench_warm")
        wstream = file_envelope_stream(spark, _envelopes(spark, warm_dir), wstage)
        _run_to_memory(
            assemble_transactions_stream(parse_debezium(wstream), event_time=event_time),
            "append",
        )

    def run_once(env_df, stage_name: str) -> tuple[float, int]:
        stage = os.path.join(STAGE_ROOT, stage_name)
        stream = file_envelope_stream(
            spark, env_df.repartition(default_parallelism()), stage
        )  # stages to disk here, before the timer
        t0 = time.time()
        out = _run_to_memory(
            assemble_transactions_stream(parse_debezium(stream), event_time=event_time),
            "append",
        )
        n_txns = out.count()
        return time.time() - t0, n_txns

    # One-shot availableNow replay (comparable to prior rounds): wall
    # includes the fixed query-startup cost, which at sf0.1 is a large
    # fraction of the total — a long-running streaming job amortizes it.
    base = _envelopes(spark, sf_dir)
    wall_1, n_txns = run_once(base, "stream_bench")

    # Steady-state: replay the same envelope log R times with per-replica
    # seq offsets (replica k's rows sort after replica k-1's within each
    # txn_id, so each replica buffers and ENDs again — valid re-buffer
    # semantics, R× the keyed-state work). Differencing the R× and 1×
    # walls cancels the fixed startup cost: marginal events/sec is the
    # number a long-running job sustains.
    replay = int(os.environ.get("SPARK_GRAFT_STREAM_REPLAY", "10"))
    max_seq = base.agg(F.max("seq").alias("m")).collect()[0]["m"] + 1
    reps = spark.range(replay).withColumnRenamed("id", "rep")
    expanded = base.crossJoin(F.broadcast(reps)).select(
        (F.col("seq") + F.col("rep") * max_seq).alias("seq"), "value"
    )
    wall_r, n_txns_r = run_once(expanded, "stream_bench_replay")
    steady = (replay - 1) * n_events / max(wall_r - wall_1, 1e-9)

    print(
        json.dumps(
            {
                "metric": "st1_stream_throughput",
                "api": api,
                "value": round(n_events / wall_1, 1),
                "unit": "events/sec",
                "steady_state_events_per_sec": round(steady, 1),
                "replay_factor": replay,
                "events": n_events,
                "transactions_emitted": n_txns,
                "transactions_emitted_replay": n_txns_r,
                "wall_sec": round(wall_1, 3),
                "wall_sec_replay": round(wall_r, 3),
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
