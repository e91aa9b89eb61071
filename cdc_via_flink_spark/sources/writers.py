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

from pyspark.sql import DataFrame, DataFrameWriter


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
