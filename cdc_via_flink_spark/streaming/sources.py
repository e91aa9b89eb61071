"""Streaming sources (SURVEY.md S1/S2/S6).

Production path: Kafka (`kafka_debezium_stream`) — subscribes the two
Debezium topics exactly like the reference's KafkaSource pair
(reference: DebeziumTransactionReconstructor.java:52-65), value read
as UTF-8 string, offset carried as `seq`. The Kafka connector jar is
not in this container, so the builder raises a clear error if the
format is unavailable; tests use the file-replay twin below.

Test/replay path: `file_envelope_stream` materializes a batch envelope
frame to parquet once and replays it with readStream — micro-batch
replay with identical schema, which is how the driver-visible
streaming queries run hermetically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("value", T.StringType()),
    ]
)


def kafka_reader_options(
    bootstrap: str,
    subscribe: str | None = None,
    subscribe_pattern: str | None = None,
) -> dict[str, str]:
    """Build the Kafka reader option map (unit-testable without the
    connector jar — the only runtime evidence possible for S2 in this
    container). Exactly one of subscribe / subscribe_pattern, mirroring
    the reference's setTopics vs setTopicPattern choice
    (DebeziumTransactionReconstructor.java:52-65)."""
    if bool(subscribe) == bool(subscribe_pattern):
        raise ValueError("need exactly one of subscribe or subscribe_pattern")
    opts = {
        "kafka.bootstrap.servers": bootstrap,
        "startingOffsets": "earliest",
    }
    if subscribe:
        opts["subscribe"] = subscribe
    else:
        opts["subscribePattern"] = subscribe_pattern
    return opts


def kafka_debezium_stream(
    spark: SparkSession,
    bootstrap: str,
    subscribe: str | None = None,
    subscribe_pattern: str | None = None,
) -> DataFrame:
    """Kafka source (S1 fixed-topic / S2 pattern). Returns (seq, value)
    with seq = kafka offset — the arrival order the reference's
    single-partition topic guarantees (reference readme.md:1)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(bootstrap, subscribe, subscribe_pattern).items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:  # kafka jar absent in this container
        raise RuntimeError(
            "Kafka connector unavailable (spark-sql-kafka jar not on the "
            "classpath); use file_envelope_stream for hermetic replay"
        ) from e
    return raw.selectExpr("offset AS seq", "CAST(value AS STRING) AS value")


_ENVELOPE_STAGE_MEMO: set[str] = set()


def file_envelope_stream(
    spark: SparkSession,
    envelopes: DataFrame,
    stage_dir: str,
    skip_if_staged: bool = False,
) -> DataFrame:
    """Materialize (seq, value) envelopes once and replay as a stream.

    skip_if_staged=True memoizes per (process, stage_dir) so repeat
    invocations (the bench's min-of-N) measure the stream, not the
    staging. It is OPT-IN because the memo is keyed on the path alone:
    only a caller whose staged content is a pure function of the path
    (the declared queries' _staged_envelope_stream derives it from
    sf_dir) may assert that — a general caller passing different
    envelope frames to the same dir must restage."""
    os.makedirs(stage_dir, exist_ok=True)
    out = os.path.join(stage_dir, "envelopes")
    if not (skip_if_staged and out in _ENVELOPE_STAGE_MEMO):
        envelopes.select(
            F.col("seq").cast("long"), F.col("value").cast("string")
        ).write.mode("overwrite").parquet(out)
        if skip_if_staged:
            # memoize ONLY under the caller's pure-function-of-path
            # assertion — a skip_if_staged=False caller never vouches
            # for the dir's content, so a later =True call to the same
            # path must restage rather than trust it (ADVICE r6)
            _ENVELOPE_STAGE_MEMO.add(out)
    return spark.readStream.schema(ENVELOPE_STREAM_SCHEMA).parquet(out)
