"""Batch parquet sources for the engine's fixture tables.

Maps the reference's Kafka string sources (SURVEY.md S1/S2;
reference: DebeziumTransactionReconstructor.java:52-65) onto Spark's
columnar parquet scans for the batch-verifiable surface. Filters and
projections on these frames push down to the scan (Catalyst), which is
the 100 TB story: a query touching 2 columns of lineitem reads 2
columns.

``events.ts`` has shipped in two physical encodings across driver
rounds: INT64 TIMESTAMP(NANOS) (round 1) and plain TIMESTAMP micros
(round 2+). The loader detects which one the file carries and derives
the same logical columns either way:

- ``ts``      TIMESTAMP_NTZ at microsecond precision (DuckDB parity:
              its TIMESTAMP_NS -> python datetime also truncates to µs)
- ``ts_ms``   epoch milliseconds BIGINT (== DuckDB ``epoch_ms(ts)``)
- ``ts_ns``   epoch nanoseconds BIGINT (raw long for NANOS files,
              µs × 1000 for micros files)

For the NANOS encoding Spark needs ``spark.sql.legacy.parquet
.nanosAsLong`` to read the column at all (as a raw long).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor: their
# cardinality is fixed (TPC-H region=5, nation=25) or grows far slower
# than the fact tables.
BROADCAST_TABLES = frozenset({"region", "nation"})


def _ensure_nanos_conf(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # already set statically or locked; the read will tell


def _estimate_scan_partitions(df: DataFrame) -> int | None:
    """Estimate the scan's split count from file sizes using Spark's
    own FilePartition formula (maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, bytesPerCore))) — metadata only, no job, no
    RDD conversion. Returns None when the inputs aren't local files or
    a conf doesn't parse; callers fall back to the exact RDD probe."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        sizes = []
        for f in files:
            if not f.startswith("file:"):
                return None
            p = "/" + f[5:].lstrip("/")
            sizes.append(os.path.getsize(p))
        spark = df.sparkSession
        open_cost = int(spark.conf.get("spark.sql.files.openCostInBytes", "4194304"))
        max_pb = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes", str(128 << 20))
        )
        parallelism = spark.sparkContext.defaultParallelism
        padded = sum(sizes) + len(sizes) * open_cost
        bytes_per_core = padded // max(parallelism, 1)
        max_split = min(max_pb, max(open_cost, bytes_per_core))
        return max(1, -(-padded // max(max_split, 1)))
    except Exception:
        return None


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the scan under-splits.

    Parquet splits at row-group granularity; a single-row-group file
    scans as ONE partition, serializing any CPU-heavy per-row work
    (JSON codec, shingling, vector math) that precedes the first
    shuffle. At 100 TB inputs have thousands of row groups and this is
    a no-op — the guard makes the repartition a small-input-only cost,
    never an extra full-table shuffle at scale.

    The probe prefers a metadata-only estimate of the split count
    (Spark's FilePartition sizing formula over `inputFiles()` sizes —
    no job, no RDD conversion); only non-local or non-estimable inputs
    pay the `df.rdd.getNumPartitions()` fallback (~170 ms of driver
    time, a full Python-RDD conversion). Either way the result is
    cached on the DataFrame — load_table returns memoized frames,
    making repeat calls free.
    """
    if n is None:
        from cdc_via_flink_spark.session import default_parallelism

        n = default_parallelism()
    cached = getattr(df, "_min_parts_cache", None)
    if cached is not None and cached[0] == n:
        return cached[1]
    parts = _estimate_scan_partitions(df)
    if parts is None:
        parts = df.rdd.getNumPartitions()
    out = df.repartition(n) if parts < n else df
    try:
        df._min_parts_cache = (n, out)
    except Exception:
        pass  # frozen/slotted frames: skip caching, stay correct
    return out


# Per-session memo of loaded tables: spark.read.parquet costs ~160 ms
# of driver-side footer/analysis work per call, and the fixture tables
# are immutable for a session's lifetime. WeakKey so a collected
# session drops its frames.
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = _TABLE_MEMO.setdefault(spark, {})
    key = (os.path.realpath(sf_dir), name)
    hit = per_session.get(key)
    if hit is not None:
        return hit
    _ensure_nanos_conf(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as a raw long via nanosAsLong.
            # Integer `div`, NOT float division: a double quotient of an
            # ~1.7e18 nanos value can round up across the next millisecond.
            df = (
                df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts_ms", F.expr("ts_ns div 1000000"))
                .withColumn(
                    "ts",
                    F.timestamp_micros(F.expr("ts_ns div 1000")).cast("timestamp_ntz"),
                )
            )
        else:
            # TIMESTAMP micros (NTZ or LTZ). Session tz is pinned UTC
            # (session.py) so the ntz->ltz cast is instant-preserving
            # and unix_micros gives the epoch the file stores.
            micros = F.unix_micros(F.col("ts").cast("timestamp"))
            df = (
                df.withColumn("ts_ns", micros * F.lit(1000))
                .withColumn("ts_ms", F.expr("ts_ns div 1000000"))
                .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
            )
    per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> dict[str, DataFrame]:
    """Register every fixture table as a temp view for the SQL surface."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(prefix + name)
    return dfs
