"""Batch sinks: partitioned and bucketed parquet (SURVEY.md S3/S4's
batch complement — the reference only ever print()s, reference:
DebeziumTransactionReconstructor.java:92; a real deployment lands
reconstructed transactions in object storage).

Scale design:
- `write_partitioned`: hive-style directory partitioning. Readers with
  a predicate on the partition column scan only matching directories
  (partition pruning — at 100 TB this is the difference between
  reading one day and reading three years).
- `write_bucketed`: pre-shuffles once at write time into N buckets on
  the join/agg key. Two tables co-bucketed on the same key join with
  ZERO exchange at read time — the shuffle is paid once, not per
  query. This is Spark's answer to the reference's keyBy-partitioned
  state locality (reference :73-86).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, DataFrameWriter, functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, per-file-sorted parquet layout.

    repartitionByRange gives each output file a DISJOINT value range
    of the sort key; sortWithinPartitions orders rows inside. Parquet
    row-group min/max stats then let any reader skip whole files/row
    groups for range predicates — the lakehouse data-skipping layout
    (verified from the actual footer stats in tests/test_writers.py).
    """
    parts = [df[c] for c in sort_cols]
    rp = (
        df.repartitionByRange(num_files, *parts)
        if num_files
        else df.repartitionByRange(*parts)
    )
    rp.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-bucketed) managed
    table. Sorted buckets additionally let sort-merge joins skip the
    per-task sort."""
    w: DataFrameWriter = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of ``cols``, each min-max normalized
    to ``bits`` bits. Pure JVM expressions (shift/or over longs), so
    the key evaluates inside whole-stage codegen; the only driver-side
    work is one tiny min/max aggregate (2×len(cols) scalars).

    len(cols) * bits must be <= 63 (signed-long key).
    """
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols × {bits} bits exceeds a long key")
    ranges = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    scale = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = ranges[f"mn_{c}"], ranges[f"mx_{c}"]
        span = (mx - mn) or 1.0
        q = F.least(
            F.lit(scale),
            ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * scale).cast("long"),
        )
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * len(cols) + i)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: rows are range-partitioned and sorted
    by the Morton interleave of ``cols``, so parquet footer min/max
    stats stay tight on EVERY clustered column at once — predicates on
    any of them skip files/row groups. A linear sort (write_sorted)
    only skips on its leading column; Z-order is the multi-dimensional
    data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER equivalent).
    """
    zk = zorder_key(df, cols, bits).alias("_zkey")
    with_key = df.withColumn("_zkey", zk)
    rp = (
        with_key.repartitionByRange(num_files, "_zkey")
        if num_files
        else with_key.repartitionByRange("_zkey")
    )
    rp.sortWithinPartitions("_zkey").drop("_zkey").write.mode(mode).parquet(path)
