"""SparkSession factory tuned for the engine.

Local-mode settings mirror what a cluster deployment would set per
executor: shuffle parallelism ~ cores, AQE on (runtime coalescing +
skew-join handling), Arrow for the Python boundary, UTC session time
zone (oracle parity with DuckDB's naive timestamps).

The reference pins parallelism 4 and a 60 s checkpoint interval
(reference: DebeziumTransactionReconstructor.java:37,90); here
parallelism scales with the session (`spark.sql.shuffle.partitions`)
and checkpointing is per-query (see streaming.assembler).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# events.parquet has shipped as both INT64 TIMESTAMP(NANOS) and plain
# TIMESTAMP micros across testdata generations. The NANOS encoding is
# refused by Spark's vectorized parquet reader unless read as a raw
# long; sources.tables.load_table branches on what the file carries.
_NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "cdc_via_flink_spark", cpus: int | None = None) -> SparkSession:
    # Before the gateway JVM launches: put the protobuf fallback shim
    # on PYTHONPATH so transformWithStateInPandas' Python workers can
    # import it (no-op when a real protobuf install exists).
    from cdc_via_flink_spark.vendor.proto_compat import ensure_protobuf

    ensure_protobuf()
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(_NANOS_AS_LONG, "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # call-site capture for error context wraps EVERY Column op in
        # ~4 extra py4j round-trips (getActiveSession + conf.get +
        # origin set/clear); a wide plan (54-agg MinHash signature)
        # measurably pays seconds of pure driver latency per build.
        # Error MESSAGES keep their class/state — only the Python call
        # -site line is dropped.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_session(spark: SparkSession, shuffle_partitions: int | None = None) -> None:
    """Adjust runtime-settable knobs on an externally provided session.

    The driver hands us its own SparkSession in ``__spark_entry__``;
    static confs (driver memory, nanosAsLong) can't change there, but
    shuffle parallelism and AQE can.
    """
    n = shuffle_partitions or default_parallelism()
    for k, v in [
        ("spark.sql.shuffle.partitions", str(n)),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        # plan-build latency: see get_spark. PySpark caches the flag at
        # the FIRST Column op, so this helps only when tuning runs
        # before any expression is built — harmless otherwise.
        ("spark.python.sql.dataFrameDebugging.enabled", "false"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked down — proceed with session defaults
