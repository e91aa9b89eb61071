"""Debezium envelope model: schema, render, parse.

Re-expresses the reference's hand-rolled Jackson parsing
(reference: DebeziumTransactionReconstructor.java:97-129) as a
declarative `from_json` projection (SURVEY.md P1/P2/P5). PERMISSIVE
mode yields NULL on malformed input, matching the reference's
null-and-filter behavior (reference :104-107,124-127); the
discriminator is `status IS NOT NULL`, matching
`payload.has("status")` (reference :109).

`before`/`after` row images stay raw JSON strings end-to-end, exactly
as the reference passes JsonNode through opaquely
(DebeziumChangeEvent.java:8-9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

# Schema of the union envelope: change-event fields AND
# transaction-metadata fields; whichever half is absent parses to NULL.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    # change event (reference :117-122)
                    T.StructField("op", T.StringType()),
                    T.StructField("ts_ms", T.LongType()),
                    T.StructField(
                        "transaction",
                        T.StructType([T.StructField("id", T.StringType())]),
                    ),
                    T.StructField("before", T.StringType()),
                    T.StructField("after", T.StringType()),
                    # transaction metadata event (reference :109-114)
                    T.StructField("status", T.StringType()),
                    T.StructField("id", T.StringType()),
                    T.StructField("event_count", T.LongType()),
                ]
            ),
        )
    ]
)


def render_change_envelope(
    op: Column, ts_ms: Column, txn_id: Column, before: Column, after: Column
) -> Column:
    """Serialize change-event fields into a Debezium-shaped JSON string."""
    return F.to_json(
        F.struct(
            F.struct(
                op.alias("op"),
                ts_ms.alias("ts_ms"),
                F.struct(txn_id.alias("id")).alias("transaction"),
                before.alias("before"),
                after.alias("after"),
            ).alias("payload")
        )
    )


def render_txn_envelope(status: Column, txn_id: Column, event_count: Column) -> Column:
    """Serialize transaction-metadata fields into a Debezium-shaped JSON string."""
    return F.to_json(
        F.struct(
            F.struct(
                status.alias("status"),
                txn_id.alias("id"),
                event_count.alias("event_count"),
            ).alias("payload")
        )
    )


def parse_debezium(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse a stream/frame of Debezium JSON strings into the flat union schema.

    Output columns:
      kind        'change' | 'txn' | NULL (malformed)
      txn_id      grouping key (reference :112,:118)
      op, ts_ms, before, after      (change half)
      status, event_count           (txn half)

    Malformed records keep kind NULL so callers can dead-letter them
    (SURVEY.md S4 side-output mapping).
    """
    parsed = df.withColumn("_env", F.from_json(F.col(value_col), ENVELOPE_SCHEMA))
    p = F.col("_env.payload")
    return (
        parsed.withColumn(
            "kind",
            F.when(p.isNull(), F.lit(None).cast("string"))
            .when(p.getField("status").isNotNull(), F.lit("txn"))
            .when(p.getField("op").isNotNull(), F.lit("change"))
            .otherwise(F.lit(None).cast("string")),
        )
        .withColumn(
            "txn_id",
            F.when(F.col("kind") == "txn", p.getField("id")).otherwise(
                p.getField("transaction").getField("id")
            ),
        )
        .withColumn("op", p.getField("op"))
        .withColumn("ts_ms", p.getField("ts_ms"))
        .withColumn("before", p.getField("before"))
        .withColumn("after", p.getField("after"))
        .withColumn("status", p.getField("status"))
        .withColumn("event_count", p.getField("event_count"))
        .drop("_env")
    )
