"""Gated REAL-Kafka acceptance test (SURVEY S1/S2; VERDICT r2 item 7).

The container has neither the spark-sql-kafka connector jar nor a
broker, so `kafka_debezium_stream` has never executed here — every
hermetic test runs the file/DataSource replay twins. This module is
the executable acceptance test for the first real deployment: point
`SPARK_GRAFT_KAFKA_BOOTSTRAP` at a broker and launch pytest under a
session that carries the connector (see DEPLOY.md "Submit":
``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>``),
and it produces Debezium envelopes to a scratch topic, consumes them
through the REAL Kafka source path, and checks the parsed output —
the same (seq, value) contract every downstream operator consumes.

Skips cleanly (no failure) when the broker env var or the jar is
absent, so CI in this container stays green while the test remains
runnable evidence for production.
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP", "")


def _kafka_connector_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not BOOTSTRAP, reason="SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no broker)"
)
def test_kafka_roundtrip_debezium_envelopes(spark, tmp_path):
    if not _kafka_connector_present(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")

    from cdc_via_flink_spark.operators.debezium import parse_debezium
    from cdc_via_flink_spark.streaming.sources import kafka_debezium_stream

    topic = f"spark_graft_accept_{uuid.uuid4().hex[:8]}"
    envelopes = [
        '{"payload":{"op":"c","ts_ms":1000,'
        '"transaction":{"id":"t1"},"after":"{\\"v\\": 1}"}}',
        '{"payload":{"op":"u","ts_ms":2000,'
        '"transaction":{"id":"t1"},"after":"{\\"v\\": 2}"}}',
    ]
    # produce via Spark's own kafka batch sink — no extra client needed
    (
        spark.createDataFrame([(v,) for v in envelopes], "value string")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    stream = kafka_debezium_stream(spark, BOOTSTRAP, subscribe=topic)
    q = (
        parse_debezium(stream)
        .writeStream.format("memory")
        .queryName("kafka_accept")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.sql(
        "SELECT txn_id, op, ts_ms FROM kafka_accept ORDER BY seq"
    ).collect()
    assert [(r.txn_id, r.op, r.ts_ms) for r in rows] == [
        ("t1", "c", 1000),
        ("t1", "u", 2000),
    ]


@pytest.mark.skipif(
    not BOOTSTRAP, reason="SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no broker)"
)
def test_kafka_pattern_subscribe(spark, tmp_path):
    """S2: subscribePattern over two topics sharing a prefix — the
    reference's mysql-server.db_1.* naming — lands rows from both."""
    if not _kafka_connector_present(spark):
        pytest.skip("spark-sql-kafka connector jar not on the classpath")

    from cdc_via_flink_spark.streaming.sources import kafka_debezium_stream

    prefix = f"spark_graft_pat_{uuid.uuid4().hex[:8]}"
    for suffix, payload in [("a", "one"), ("b", "two")]:
        (
            spark.createDataFrame([(payload,)], "value string")
            .write.format("kafka")
            .option("kafka.bootstrap.servers", BOOTSTRAP)
            .option("topic", f"{prefix}.{suffix}")
            .save()
        )

    stream = kafka_debezium_stream(
        spark, BOOTSTRAP, subscribe_pattern=f"{prefix}\\..*"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("kafka_pat_accept")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    vals = {r.value for r in spark.sql("SELECT value FROM kafka_pat_accept").collect()}
    assert vals == {"one", "two"}
