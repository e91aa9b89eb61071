"""Streaming LSH keeper election (streaming/neardup.py): multi-batch
arrival — keepers persist in state across micro-batches and are
FIRST-SEEN (a later, smaller doc_id does not steal keepership), while
within one batch the election is min-doc_id (the oracle equivalence)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from cdc_via_flink_spark.plans.streaming_queries import (
    STAGE_ROOT,
    _run_to_memory,
    _stage_ordered_files,
)
from cdc_via_flink_spark.streaming.neardup import neardup_collisions_stream

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", LongType()),
        StructField("bsig", StringType()),
    ]
)


def test_keeper_first_seen_across_batches(spark):
    # Batch 1: bucket X claimed by doc 5 (min of {5, 9} in-batch).
    b1 = [(5, 0, "X"), (9, 0, "X"), (7, 1, "Y")]
    # Batch 2: doc 3 < 5 arrives later — must NOT steal keepership of
    # X; doc 8 collides in Y with keeper 7.
    b2 = [(3, 0, "X"), (8, 1, "Y")]
    frames = [spark.createDataFrame(r, schema=SCHEMA) for r in (b1, b2)]
    dest = os.path.join(STAGE_ROOT, "neardup_unit")
    _stage_ordered_files(spark, frames, dest)
    sd = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    banded = sd.select("doc_id", F.col("band").cast("int").alias("band"), "bsig")
    out = _run_to_memory(neardup_collisions_stream(banded), "append")
    got = {
        (r["band"], r["doc_id"]): r["keeper_id"] for r in out.collect()
    }
    assert got == {
        (0, 9): 5,  # in-batch election: min id keeps
        (0, 3): 5,  # late smaller id does not steal; it collides
        (1, 8): 7,
    }


def _stage_one(spark, rows, dest_dir, name, mtime):
    import glob
    import shutil

    tmp = dest_dir + f"_w_{name}"
    spark.createDataFrame(rows, schema=SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, f"{name}.parquet")
    shutil.copy(part, dest)
    os.utime(dest, (mtime, mtime))
    shutil.rmtree(tmp)


def test_keeper_state_survives_restart(spark, tmp_path):
    """ST5: the bucket keeper survives a full query restart — a doc
    arriving after the restart must collide against the keeper elected
    BEFORE the stop, recovered from the checkpointed state store."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _stage_one(spark, [(4, 0, "X")], src, "0", 1_000_000_000)

    def run_once():
        sd = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        banded = sd.select(
            "doc_id", F.col("band").cast("int").alias("band"), "bsig"
        )
        q = (
            neardup_collisions_stream(banded)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # doc 4 claims bucket X; no collisions yet
    assert spark.read.parquet(sink).count() == 0

    _stage_one(spark, [(9, 0, "X")], src, "1", 1_000_000_100)
    run_once()  # restart: keeper 4 recovered, doc 9 collides
    rows = spark.read.parquet(sink).collect()
    assert [(r["doc_id"], r["keeper_id"]) for r in rows] == [(9, 4)]
