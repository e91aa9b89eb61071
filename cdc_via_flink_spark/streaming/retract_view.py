"""Streaming incremental materialized view over a CDC change stream —
the LIVE form of cdc_retract_view (plans/cdc_queries.py): a grouped
SUM view maintained by per-batch RETRACT deltas through foreachBatch,
the way Flink's retract mode / a Debezium-fed Materialize view keeps
an aggregate current without ever rescanning history.

Per micro-batch:
1. reduce the batch to each key's END image (intermediate intra-batch
   versions cancel telescopically for a SUM view — only endpoints
   matter);
2. join against the KEY SNAPSHOT (per-key latest image from all prior
   batches; deletes persist as tombstones) to get the true
   before-image — the cross-batch state the batch itself cannot see;
3. emit signed deltas: retract the before-image from its group, add
   the end image to its (possibly different — group migration) group;
4. fold the deltas into the VIEW table and advance the key snapshot,
   both written as epoch-versioned dirs behind an atomically-renamed
   pointer. A replayed epoch (restart mid-commit) is SKIPPED when the
   pointer already records it — the idempotent-upsert recipe from
   streaming/upsert.py, so the view is effectively exactly-once.

Scale: per-batch work is O(batch keys) — one batch-local argmax, one
key-snapshot join (co-partitioned by key in a real lakehouse MERGE),
one tiny grouped sum. The view table is group-cardinality-sized.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql.streaming import StreamingQuery

PTR = "_COMMITTED"


def _read_ptr(table_dir: str) -> tuple[int, str, str] | None:
    p = os.path.join(table_dir, PTR)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        parts = f.read().strip().split("\t")
    epoch, name = parts[0], parts[1]
    run = parts[2] if len(parts) > 2 else ""  # pre-run-identity pointer
    return int(epoch), name, run


def _write_ptr(table_dir: str, epoch: int, name: str, run: str) -> None:
    tmp = os.path.join(table_dir, PTR + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"{epoch}\t{name}\t{run}")
    os.replace(tmp, os.path.join(table_dir, PTR))


def read_view(spark: SparkSession, table_dir: str) -> DataFrame:
    """Committed view state: (bucket long, view_sum long)."""
    ptr = _read_ptr(table_dir)
    if ptr is None:
        return spark.createDataFrame([], "bucket long, view_sum long")
    return spark.read.parquet(os.path.join(table_dir, ptr[1], "view"))


def retract_view_query(
    changes: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 5,
) -> StreamingQuery:
    """Start the view-maintenance query over a streaming change frame
    (txn_id, seq, ts_ms, op, after-JSON with $.k). Caller awaits.

    Replay safety: epoch ids are scoped to the CHECKPOINT, so the
    committed pointer also records a run identity (the canonical
    checkpoint path). Re-running the same checkpoint replays/extends
    idempotently; pointing a DIFFERENT checkpoint at an existing
    table_dir fails loudly instead of silently skipping the first
    committed+1 batches (epoch numbering would restart at 0 and alias
    into the guard, corrupting the view with no error)."""
    os.makedirs(table_dir, exist_ok=True)
    run_key = os.path.abspath(checkpoint_dir)

    def sink(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        committed = _read_ptr(table_dir)
        if committed is not None and committed[2] not in ("", run_key):
            raise RuntimeError(
                f"retract_view table {table_dir!r} was built by checkpoint "
                f"{committed[2]!r}; refusing epochs from {run_key!r} — "
                "epoch ids are checkpoint-scoped, so folding a different "
                "run into this table would corrupt it. Use the original "
                "checkpoint, or remove the table to rebuild."
            )
        if committed is not None and epoch_id <= committed[0]:
            return  # replayed epoch: already folded in, skip (idempotent)

        k = F.when(
            F.col("op") != "d",
            F.get_json_object(F.col("after"), "$.k").cast("long"),
        )
        end_img = (
            batch.select("txn_id", "seq", "ts_ms", k.alias("k"))
            .groupBy("txn_id")
            .agg(F.max(F.struct("ts_ms", "seq", "k")).alias("li"))
            .select("txn_id", F.col("li.k").alias("end_k"))
        )

        if committed is None:
            prev_keys = spark.createDataFrame([], "txn_id string, k long")
        else:
            prev_keys = spark.read.parquet(
                os.path.join(table_dir, committed[1], "keys")
            )
        joined = end_img.join(
            prev_keys.select("txn_id", F.col("k").alias("prev_k")),
            "txn_id",
            "left",
        )
        deltas = joined.select(
            F.explode(
                F.array_compact(
                    F.array(
                        F.when(
                            F.col("prev_k").isNotNull(),
                            F.struct(
                                (F.col("prev_k") % n_buckets).alias("bucket"),
                                (-F.col("prev_k")).alias("delta"),
                            ),
                        ),
                        F.when(
                            F.col("end_k").isNotNull(),
                            F.struct(
                                (F.col("end_k") % n_buckets).alias("bucket"),
                                F.col("end_k").alias("delta"),
                            ),
                        ),
                    )
                )
            ).alias("d")
        )
        batch_view = deltas.groupBy(F.col("d.bucket").alias("bucket")).agg(
            F.sum("d.delta").cast("long").alias("view_sum")
        )
        new_view = (
            read_view(spark, table_dir)
            .unionByName(batch_view)
            .groupBy("bucket")
            .agg(F.sum("view_sum").cast("long").alias("view_sum"))
        )
        # advance the key snapshot; batch keys (incl. tombstones with
        # end_k null) replace their previous images
        new_keys = prev_keys.join(end_img, "txn_id", "left_anti").unionByName(
            end_img.select("txn_id", F.col("end_k").alias("k"))
        )

        vname = f"v{epoch_id}"
        out = os.path.join(table_dir, vname)
        new_view.write.mode("overwrite").parquet(os.path.join(out, "view"))
        new_keys.write.mode("overwrite").parquet(os.path.join(out, "keys"))
        _write_ptr(table_dir, epoch_id, vname, run_key)

    return (
        changes.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
