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


# Evolved envelope (schema version 2): Debezium deployments add
# payload fields over time (source block, LSN); a consumer pinned to
# the OLD schema must keep parsing v2 records (from_json ignores
# unknown JSON fields), and a NEW consumer must read v1 records with
# the added fields null — both directions are oracle-gated by
# cdc_schema_evolution. The superset schema is the new-reader view.
ENVELOPE_SCHEMA_V2 = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                list(ENVELOPE_SCHEMA["payload"].dataType.fields)
                + [
                    T.StructField("lsn", T.LongType()),
                    T.StructField(
                        "source",
                        T.StructType(
                            [T.StructField("version", T.StringType())]
                        ),
                    ),
                ]
            ),
        )
    ]
)


def render_change_envelope_v2(
    op: Column,
    ts_ms: Column,
    txn_id: Column,
    before: Column,
    after: Column,
    lsn: Column,
    version: Column,
) -> Column:
    """Serialize a v2 change event: the v1 fields plus the evolved
    payload.lsn and payload.source.version block."""
    return F.to_json(
        F.struct(
            F.struct(
                op.alias("op"),
                ts_ms.alias("ts_ms"),
                F.struct(txn_id.alias("id")).alias("transaction"),
                before.alias("before"),
                after.alias("after"),
                lsn.alias("lsn"),
                F.struct(version.alias("version")).alias("source"),
            ).alias("payload")
        )
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


def parse_debezium(
    df: DataFrame,
    value_col: str = "value",
    schema: T.StructType = ENVELOPE_SCHEMA,
) -> DataFrame:
    """Parse a stream/frame of Debezium JSON strings into the flat union schema.

    ``schema`` selects the reader's envelope version (default v1;
    pass ENVELOPE_SCHEMA_V2 for the evolved reader — v1 records then
    parse with the added fields null, and the output gains the
    evolved columns `lsn` / `source_version`; see
    cdc_schema_evolution).

    Output columns:
      kind        'change' | 'txn' | NULL (malformed)
      txn_id      grouping key (reference :112,:118)
      op, ts_ms, before, after      (change half)
      status, event_count           (txn half)

    Malformed records keep kind NULL so callers can dead-letter them
    (SURVEY.md S4 side-output mapping).
    """
    parsed = df.withColumn("_env", F.from_json(F.col(value_col), schema))
    p = F.col("_env.payload")
    payload_fields = {f.name for f in schema["payload"].dataType.fields}
    extra = []
    if "lsn" in payload_fields:
        extra.append(("lsn", p.getField("lsn")))
    if "source" in payload_fields:
        extra.append(
            ("source_version", p.getField("source").getField("version"))
        )
    out = (
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
    )
    for name, col in extra:
        out = out.withColumn(name, col)
    return out.drop("_env")
