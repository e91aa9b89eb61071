"""Streaming incremental view (streaming/retract_view.py): epoch
idempotency under full replay, restart increments, and group-migration
retraction across batches."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from cdc_via_flink_spark.streaming.retract_view import (
    read_view,
    retract_view_query,
)

SCHEMA = "txn_id string, seq long, ts_ms long, op string, after string"


def _stage(spark, rows, dest_dir, name, mtime):
    tmp = dest_dir + f"_w_{name}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, f"{name}.parquet")
    shutil.copy(part, dest)
    os.utime(dest, (mtime, mtime))
    shutil.rmtree(tmp)


def _run(spark, src, table, ckpt):
    sch = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = retract_view_query(sch, table, ckpt)
    q.awaitTermination()


def _view(spark, table):
    return {
        r["bucket"]: r["view_sum"] for r in read_view(spark, table).collect()
    }


def test_retract_view_replay_idempotent_and_migrating(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: key A -> k=7 (bucket 2), key B -> k=3 (bucket 3)
    _stage(
        spark,
        [("A", 1, 1000, "c", '{"k": 7}'), ("B", 2, 1000, "c", '{"k": 3}')],
        src,
        "0",
        1_000_000_000,
    )
    # batch 1: A migrates to k=9 (bucket 4): retract 7@2, add 9@4
    _stage(spark, [("A", 3, 2000, "u", '{"k": 9}')], src, "1", 1_000_000_100)
    _run(spark, src, table, ckpt)
    assert _view(spark, table) == {2: 0, 3: 3, 4: 9}

    # full epoch replay (checkpoint wiped): committed pointer must skip
    # every replayed epoch — a broken guard doubles the sums.
    shutil.rmtree(ckpt)
    _run(spark, src, table, ckpt)
    assert _view(spark, table) == {2: 0, 3: 3, 4: 9}

    # restart with NEW data on the original checkpoint lineage:
    # B deleted (retract 3@3), C inserted k=3 (add 3@3)
    _stage(
        spark,
        [("B", 4, 3000, "d", None), ("C", 5, 3000, "c", '{"k": 3}')],
        src,
        "2",
        1_000_000_200,
    )
    _run(spark, src, table, ckpt)
    got = _view(spark, table)
    assert got[4] == 9 and got[3] == 3 and got[2] == 0
    # key snapshot holds B as a tombstone: re-running adds nothing
    _run(spark, src, table, ckpt)
    assert _view(spark, table) == got


def test_retract_view_rejects_foreign_checkpoint(spark, tmp_path):
    """Epoch ids are checkpoint-scoped: a FRESH/different checkpoint
    restarts at epoch 0, which the <=committed guard would silently
    swallow, dropping the first committed+1 batches. The committed
    pointer records the run identity and the sink fails loudly on a
    mismatch instead of corrupting the view."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")

    _stage(spark, [("A", 1, 1000, "c", '{"k": 7}')], src, "0", 1_000_000_000)
    _stage(spark, [("A", 2, 2000, "u", '{"k": 9}')], src, "1", 1_000_000_100)
    _run(spark, src, table, str(tmp_path / "ckpt1"))
    before = _view(spark, table)
    assert before == {2: 0, 4: 9}

    with pytest.raises(StreamingQueryException, match="checkpoint"):
        _run(spark, src, table, str(tmp_path / "ckpt2"))
    # view untouched by the refused run
    assert _view(spark, table) == before
