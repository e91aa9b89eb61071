"""Runnable transaction-reconstruction job — the engine's equivalent of
the reference's V1 ``main()`` (reference:
DebeziumTransactionReconstructor.java:33-95, submitted per
readme.md:4-5).

Usage (mirrors `flink run <jar>`):

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver> \
        -m cdc_via_flink_spark.jobs.reconstructor \
        --bootstrap broker:9092 \
        --changes-topic mysql-server.db_1.user_1 \
        --txn-topic mysql-server.transaction \
        --sink console --checkpoint /tmp/ckpt

Hermetic replay (no Kafka in this container):

    python -m cdc_via_flink_spark.jobs.reconstructor \
        --replay-dir /root/testdata/sf0.001 --sink parquet --out /tmp/txns

Reference-config mapping (SURVEY.md ST5):
- restart ×3/10 s (`:36`)            -> ``--max-restarts/--restart-delay``
  retry loop around awaitTermination (driver-side in Spark)
- checkpoint 60 s (`:37`)            -> ``--checkpoint`` dir; Spark commits
  offsets+state atomically per micro-batch (stronger)
- named job (`:39-41,88-89`)         -> ``queryName``
- parallelism 4 (`:90`)              -> spark.sql.shuffle.partitions (session)
- print() sink (`:92`)               -> ``--sink console`` | parquet dual-sink
  with dead-letter (S4) replacing the reference's OutputTag (`:133,151,167`)
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_via_flink_spark.operators.debezium import parse_debezium
from cdc_via_flink_spark.session import get_spark
from cdc_via_flink_spark.streaming.assembler import assemble_transactions_stream
from cdc_via_flink_spark.streaming.sinks import dual_sink_query, split_dead_letter
from cdc_via_flink_spark.streaming.sources import (
    file_envelope_stream,
    kafka_debezium_stream,
)


def build_stream(spark: SparkSession, args: argparse.Namespace) -> DataFrame:
    """Source → parse → assemble. One unioned stream replaces the
    reference's connect() of two keyed streams (SURVEY.md J1): both
    topics carry the same envelope union schema."""
    if args.replay_dir:
        from cdc_via_flink_spark.plans.cdc_queries import _envelopes

        env = file_envelope_stream(
            spark, _envelopes(spark, args.replay_dir), args.stage_dir
        )
    else:
        changes = kafka_debezium_stream(spark, args.bootstrap, subscribe=args.changes_topic)
        txns = kafka_debezium_stream(spark, args.bootstrap, subscribe=args.txn_topic)
        env = changes.unionByName(txns)
    return parse_debezium(env)


def run(args: argparse.Namespace) -> int:
    spark = get_spark("debezium-transaction-reconstructor")
    parsed = build_stream(spark, args)
    good, dead = split_dead_letter(parsed)
    assembled = assemble_transactions_stream(
        good, event_time=F.timestamp_millis(F.col("seq"))
    )

    if args.sink == "upsert":
        from cdc_via_flink_spark.streaming.upsert import upsert_latest_state_query

        q = upsert_latest_state_query(parsed, args.out, args.checkpoint)
        q.awaitTermination()
        return 0
    if args.sink == "publish":
        # consume -> reconstruct -> PUBLISH: reconstructed transactions
        # land on a topic-style log through the debezium_replay writer
        # (Kafka-producer twin, per-epoch idempotent commits) — the
        # relay shape a downstream consumer reads back with the
        # debezium_replay source. On a real cluster swap format() for
        # "kafka" + topic option; the row contract (value string) is
        # identical.
        from cdc_via_flink_spark.sources.python_datasource import register

        register(spark)
        out_rows = assembled.select(
            F.to_json(F.struct("*")).alias("value")
        )
        q = (
            out_rows.writeStream.format("debezium_replay")
            .option("path", args.out)
            .option("topic", args.publish_topic)
            .option("checkpointLocation", args.checkpoint)
            .queryName("debezium-transaction-relay")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return 0
    if args.sink == "view":
        # consume -> maintain a LIVE grouped-SUM materialized view via
        # retract deltas (streaming/retract_view.py): the Debezium-fed
        # Materialize shape. Only well-formed change rows feed the
        # view; txn/dead-letter rows are irrelevant to row state.
        from cdc_via_flink_spark.streaming.retract_view import retract_view_query

        changes = good.filter(F.col("kind") == "change").select(
            "txn_id", F.col("seq").cast("long").alias("seq"),
            F.col("ts_ms").cast("long").alias("ts_ms"), "op", "after"
        )
        q = retract_view_query(changes, args.out, args.checkpoint)
        q.awaitTermination()
        return 0
    if args.sink == "console":
        q = (
            assembled.writeStream.format("console")
            .outputMode("append")
            .queryName("debezium-transaction-reconstruction")  # ref :39-41
            .option("checkpointLocation", args.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    else:
        q = dual_sink_query(
            parsed,
            good_dir=args.out,
            dead_dir=args.out + "_dead",
            checkpoint_dir=args.checkpoint,
            transform_good=lambda df: df,
        )
        q.processAllAvailable()
        q.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bootstrap")
    p.add_argument("--changes-topic", default="mysql-server.db_1.user_1")  # ref :52
    p.add_argument("--txn-topic", default="mysql-server.transaction")  # ref :64
    p.add_argument("--replay-dir", help="hermetic replay from an sf dir (no Kafka)")
    p.add_argument("--stage-dir", default=tempfile.mkdtemp(prefix="cdc_replay_"))
    p.add_argument(
        "--sink",
        choices=["console", "parquet", "upsert", "publish", "view"],
        default="console",
    )  # upsert = latest-state table; publish = topic relay; view = live retract-delta SUM view
    p.add_argument("--publish-topic", default="reconstructed.transactions")
    p.add_argument("--out", default=tempfile.mkdtemp(prefix="cdc_out_"))
    p.add_argument("--checkpoint", default=tempfile.mkdtemp(prefix="cdc_ckpt_"))
    p.add_argument("--max-restarts", type=int, default=3)  # ref :36
    p.add_argument("--restart-delay", type=float, default=10.0)  # ref :36
    args = p.parse_args(argv)
    if not args.replay_dir and not args.bootstrap:
        p.error("need --bootstrap (Kafka) or --replay-dir (hermetic replay)")

    # ST5: the reference's fixedDelayRestart(3, 10 s) becomes a driver-
    # side retry loop around the streaming query (restarts resume from
    # the checkpoint, so no reprocessing of committed epochs).
    attempt = 0
    while True:
        try:
            return run(args)
        except Exception:
            attempt += 1
            if attempt > args.max_restarts:
                raise
            time.sleep(args.restart_delay)


if __name__ == "__main__":
    sys.exit(main())
