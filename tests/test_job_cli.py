"""The runnable job (jobs/reconstructor.py) end-to-end on hermetic
replay — the engine's answer to `flink run <jar>` (reference
readme.md:4-5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_via_flink_spark.jobs import reconstructor
from tests.conftest import SF0001


def test_job_console_sink_replay(spark, tmp_path):
    # spark fixture keeps the session alive; the job's get_spark()
    # getOrCreate() reuses it rather than starting a second JVM.
    rc = reconstructor.main(
        [
            "--replay-dir",
            SF0001,
            "--sink",
            "console",
            "--stage-dir",
            str(tmp_path / "stage"),
            "--checkpoint",
            str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0  # console output goes to JVM stdout (verified by
    # the parquet twin below; the sink itself is the reference's :92)


def test_job_parquet_dual_sink_replay(spark, tmp_path):
    out_dir = str(tmp_path / "txns")
    rc = reconstructor.main(
        [
            "--replay-dir",
            SF0001,
            "--sink",
            "parquet",
            "--out",
            out_dir,
            "--stage-dir",
            str(tmp_path / "stage"),
            "--checkpoint",
            str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    good = spark.read.parquet(out_dir)
    assert good.count() > 0
    # dead-letter dir exists alongside (S4 dual sink)
    assert os.path.isdir(out_dir + "_dead")


def test_job_publish_relay_roundtrip(spark, tmp_path):
    """--sink publish: consume -> reconstruct -> publish to the
    debezium_replay topic log; read the published topic back and check
    the reconstruction row count survives the relay."""
    import json

    from cdc_via_flink_spark.jobs import reconstructor
    from cdc_via_flink_spark.plans.registry import load_all

    out = str(tmp_path / "relay")
    rc = reconstructor.main(
        [
            "--replay-dir", "/root/testdata/sf0.001",
            "--stage-dir", str(tmp_path / "stage"),
            "--sink", "publish",
            "--publish-topic", "reconstructed.txns",
            "--out", out,
            "--checkpoint", str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    back = (
        spark.read.format("debezium_replay")
        .option("path", out)
        .option("subscribe", "reconstructed.txns")
        .load()
    )
    expected = load_all()["cdc_reconstruct_end"].fn(spark, "/root/testdata/sf0.001")
    assert back.count() == expected.count()
    one = json.loads(back.head().value)
    assert {"txn_id", "end_seq", "n_events", "ops_concat"} <= set(one)


def test_job_view_sink_replay(spark, tmp_path):
    """--sink view maintains the live retract-delta SUM view; after the
    replay the committed view must equal the direct aggregate over
    final row images (the stream_retract_view invariant, via the CLI)."""
    from cdc_via_flink_spark.operators.reconstruct import derive_change_stream
    from cdc_via_flink_spark.sources.tables import load_table
    from cdc_via_flink_spark.streaming.retract_view import read_view

    out = str(tmp_path / "view")
    rc = reconstructor.main(
        [
            "--replay-dir",
            SF0001,
            "--sink",
            "view",
            "--stage-dir",
            str(tmp_path / "stage"),
            "--checkpoint",
            str(tmp_path / "ckpt"),
            "--out",
            out,
        ]
    )
    assert rc == 0
    got = {
        r["bucket"]: r["view_sum"]
        for r in read_view(spark, out).collect()
        if r["view_sum"] != 0
    }
    ch = derive_change_stream(load_table(spark, SF0001, "events"))
    k = F.when(
        F.col("op") != "d", F.get_json_object("after", "$.k").cast("long")
    )
    li = (
        ch.select("txn_id", "seq", "ts_ms", k.alias("k"))
        .groupBy("txn_id")
        .agg(F.max(F.struct("ts_ms", "seq", "k")).alias("li"))
        .filter(F.col("li.k").isNotNull())
    )
    exp = {
        r["bucket"]: r["direct"]
        for r in li.groupBy((F.col("li.k") % 5).alias("bucket"))
        .agg(F.sum("li.k").cast("long").alias("direct"))
        .collect()
        if r["direct"] != 0
    }
    assert got == exp
