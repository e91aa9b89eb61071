"""Multi-format batch sources (SURVEY.md S1 batch-twin generalization).

Parquet is the engine's primary format (columnar, pushdown, pruning);
CSV/JSON/XML readers exist for interchange with explicit schemas ONLY —
schema inference is a full extra pass over the data and type-drifts
between engines, so it's deliberately not exposed. JSON and XML
reading use the same PERMISSIVE corrupt-record routing as the
Debezium parser (dead-letter via `_corrupt_record`). XML rides
Spark 4's NATIVE xml source (the integrated spark-xml) — no extra
jar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

CORRUPT_COL = "_corrupt_record"


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType, dead_letter: bool = False
) -> DataFrame:
    """JSON lines with PERMISSIVE malformed-row routing. With
    dead_letter=True the frame carries `_corrupt_record` holding the
    raw text of unparseable lines (NULL elsewhere)."""
    s = schema
    if dead_letter:
        s = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    reader = spark.read.schema(s).option("mode", "PERMISSIVE")
    if dead_letter:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    row_tag: str = "row",
    dead_letter: bool = False,
) -> DataFrame:
    """XML via Spark 4's native xml source: one record per `row_tag`
    element, explicit schema, PERMISSIVE malformed-element routing
    (dead_letter=True carries the raw element text in
    `_corrupt_record`, NULL elsewhere — the read_json contract)."""
    s = schema
    if dead_letter:
        s = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    reader = (
        spark.read.schema(s)
        .format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
    )
    if dead_letter:
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.load(path)


def write_format(df: DataFrame, path: str, fmt: str) -> None:
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true")
    if fmt == "xml":
        w = w.option("rowTag", "row")
    w.format(fmt).save(path)
