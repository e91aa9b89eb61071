"""Upsert sink: materialize CDC latest-row state into a keyed table.

The reference demonstrates reconstruction and prints it (reference:
DebeziumTransactionReconstructor.java:92); a production CDC pipeline
lands the CURRENT state of every key somewhere queryable. Spark has
no built-in MERGE sink for plain parquet, so this implements the
standard foreachBatch upsert recipe:

  per micro-batch: reduce the batch to one latest row per key
  (window on (ts_ms, seq)) -> full-outer merge with the previous
  snapshot -> write a NEW versioned snapshot dir + move a pointer.

Epoch-versioned snapshot dirs + last-committed pointer make replayed
epochs idempotent (a restarted batch overwrites its own version and
re-points; readers only ever see a committed pointer): effectively
exactly-once. At 100 TB the same recipe targets a real lakehouse
table (Delta/Iceberg MERGE); the per-batch work is bounded by batch
size + snapshot join, and the key-partitioned snapshot keeps the
merge a co-partitioned join. Delete events (op='d') persist in the
snapshot as tombstones — filtered out at read time, so an out-of-order
older update arriving after the delete cannot resurrect the key — and
are garbage-collected past ``tombstone_retention_ms``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql.streaming import StreamingQuery

LATEST_PTR = "_LATEST"


def _snapshot_path(table_dir: str) -> str | None:
    ptr = os.path.join(table_dir, LATEST_PTR)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        rel = f.read().strip()
    return os.path.join(table_dir, rel) if rel else None


def read_latest_snapshot(
    spark: SparkSession, table_dir: str, include_tombstones: bool = False
) -> DataFrame | None:
    """Read the committed snapshot. Tombstones (op='d') are persisted in
    the snapshot so that a late out-of-order update for a deleted key
    cannot resurrect it; readers filter them out here by default."""
    path = _snapshot_path(table_dir)
    if path is None:
        return None
    df = spark.read.parquet(path)
    return df if include_tombstones else df.filter(F.col("op") != "d")


def _gc_old_snapshots(table_dir: str, keep_snapshots: int) -> None:
    """Delete committed-and-superseded ``v=<epoch>`` snapshot dirs,
    keeping the committed one plus ``keep_snapshots - 1`` predecessors
    (a reader holding a just-replaced pointer can still finish its
    scan). Dirs NEWER than the committed pointer are uncommitted
    partials from a crashed epoch — left alone; the replayed epoch
    overwrites them. Without GC the table accumulates one full snapshot
    per micro-batch forever, which at 100 TB state is an unbounded
    storage leak."""
    committed = _snapshot_path(table_dir)
    if committed is None:
        return
    cur = os.path.basename(committed)
    versions = sorted(
        (d for d in os.listdir(table_dir) if d.startswith("v=")),
        key=lambda d: int(d.split("=", 1)[1]),
    )
    if cur not in versions:
        return
    cutoff = versions.index(cur) - (max(keep_snapshots, 1) - 1)
    for d in versions[:max(cutoff, 0)]:
        shutil.rmtree(os.path.join(table_dir, d), ignore_errors=True)


def _merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    table_dir: str,
    epoch_id: int,
    tombstone_retention_ms: int | None = None,
    keep_snapshots: int | None = 2,
) -> None:
    version_dir = f"v={epoch_id}"
    committed = _snapshot_path(table_dir)
    if committed is not None and os.path.basename(committed) == version_dir:
        # Replayed epoch whose snapshot already committed (crash landed
        # between the pointer move and Spark's checkpoint commit):
        # writing again would overwrite the very directory `prev` is
        # lazily read from. The epoch is already materialized — no-op.
        return
    # one latest row per key WITHIN the batch
    w = W.partitionBy("txn_id").orderBy(F.col("ts_ms").desc(), F.col("seq").desc())
    latest = (
        batch.filter(F.col("kind") == "change")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("txn_id", "op", "ts_ms", "seq", "after")
    )
    prev = read_latest_snapshot(spark, table_dir, include_tombstones=True)
    if prev is not None:
        # keep whichever side is newer per key ((ts_ms, seq) order)
        merged = (
            prev.unionByName(latest)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        merged = latest
    # Tombstones stay in the snapshot (so older replayed updates lose
    # the merge window against the delete); optionally GC ones older
    # than the retention horizon relative to the newest event seen.
    if tombstone_retention_ms is not None:
        horizon = merged.agg(F.max("ts_ms").alias("_max_ts"))
        merged = (
            merged.join(F.broadcast(horizon))
            .filter(
                (F.col("op") != "d")
                | (F.col("ts_ms") >= F.col("_max_ts") - F.lit(tombstone_retention_ms))
            )
            .drop("_max_ts")
        )

    merged.write.mode("overwrite").parquet(os.path.join(table_dir, version_dir))
    tmp = os.path.join(table_dir, LATEST_PTR + ".tmp")
    with open(tmp, "w") as f:
        f.write(version_dir)
    os.replace(tmp, os.path.join(table_dir, LATEST_PTR))  # atomic pointer move
    if keep_snapshots is not None:
        _gc_old_snapshots(table_dir, keep_snapshots)


def upsert_latest_state_query(
    parsed: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    tombstone_retention_ms: int | None = None,
    keep_snapshots: int | None = 2,
) -> StreamingQuery:
    """Start a streaming query that upserts parse_debezium output into
    the latest-state table at ``table_dir``. Caller awaits it.
    ``keep_snapshots`` bounds on-disk versions (committed + N-1
    predecessors); ``None`` disables GC."""
    os.makedirs(table_dir, exist_ok=True)

    def sink(batch: DataFrame, epoch_id: int) -> None:
        _merge_batch(
            batch.sparkSession,
            batch,
            table_dir,
            epoch_id,
            tombstone_retention_ms=tombstone_retention_ms,
            keep_snapshots=keep_snapshots,
        )

    return (
        parsed.writeStream.foreachBatch(sink)
        .queryName("cdc_latest_state_upsert")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
