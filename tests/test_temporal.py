"""Streaming temporal table join (streaming/temporal.py): multi-batch
arrival exercising the incremental paths a single-batch replay never
touches — watermark-matured emission, dim-version compaction, the TTL
timeout flush, and unmatched-probe stand-ins."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

import pytest

from cdc_via_flink_spark.plans.streaming_queries import (
    STAGE_ROOT,
    _run_to_memory,
    _stage_ordered_files,
)
from cdc_via_flink_spark.streaming.temporal import temporal_join_stream


def _run_temporal(spark, sev, variant):
    """Run either stateful-API implementation of the temporal join."""
    if variant == "apiws":
        return _run_to_memory(temporal_join_stream(sev), "append")
    from cdc_via_flink_spark.streaming.temporal_tws import (
        temporal_join_stream_tws,
    )
    from cdc_via_flink_spark.vendor.proto_compat import (
        ensure_protobuf,
        ship_to_workers,
    )

    assert ensure_protobuf() != "unavailable"
    ship_to_workers(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return _run_to_memory(temporal_join_stream_tws(sev), "append")


SCHEMA = StructType(
    [
        StructField("txn_id", StringType()),
        StructField("seq", LongType()),
        StructField("side", StringType()),
        StructField("op", StringType()),
        StructField("ts_ms", LongType()),
    ]
)

BASE = 1_000_000_000_000  # ~2001-09 in epoch ms
DAY = 86_400_000


def _dim(key, seq, ts):
    return (key, seq, "D", "u", ts)


def _probe(key, seq, ts):
    return (key, seq, "P", None, ts)


@pytest.mark.parametrize("variant", ["apiws", "tws"])
def test_temporal_join_multibatch(spark, variant):
    # Batch 1: two dim versions + two probes for key k, plus a probe
    # for key u that has no dim versions at all.
    b1 = [
        _dim("k", 1, BASE),
        _dim("k", 2, BASE + 100_000),
        _probe("k", 10, BASE + 50_000),
        _probe("k", 11, BASE + 150_000),
        _probe("u", 20, BASE + 60_000),
    ]
    # Batch 2: a far-ahead dim version — advances the watermark so that
    # batch 3's invocation sees probes 10/11 as matured (incremental
    # emission, not the timeout path) and compacts dim 1 away.
    b2 = [_dim("k", 3, BASE + 10_000_000)]
    # Batch 3: a probe BETWEEN dim 2 and dim 3 in event time but ahead
    # of the current watermark (so it buffers): correct compaction must
    # have kept dim 2 (the newest version at-or-behind the watermark)
    # for it to match at flush time. Plus a probe after dim 3.
    b3 = [
        _probe("k", 13, BASE + 9_700_000),
        _probe("k", 12, BASE + 10_000_500),
    ]
    # Sentinels: advance the watermark past every TTL so remaining
    # probes flush via the event-time timeout.
    s1 = [_dim("flush", -1, BASE + 10 * DAY)]
    s2 = [_dim("flush", -2, BASE + 20 * DAY)]

    frames = [
        spark.createDataFrame(rows, schema=SCHEMA) for rows in (b1, b2, b3, s1, s2)
    ]
    dest = os.path.join(STAGE_ROOT, f"temporal_unit_{variant}")
    _stage_ordered_files(spark, frames, dest)

    sev = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    out = _run_temporal(spark, sev, variant)
    got = {
        r["probe_seq"]: (
            r["txn_id"],
            r["dim_seq"],
            r["dim_op"],
            r["dim_ts_ms"],
            r["staleness_ms"],
        )
        for r in out.filter(F.col("txn_id") != "flush").collect()
    }
    assert got == {
        10: ("k", 1, "u", BASE, 50_000),
        11: ("k", 2, "u", BASE + 100_000, 50_000),
        13: ("k", 2, "u", BASE + 100_000, 9_600_000),
        12: ("k", 3, "u", BASE + 10_000_000, 500),
        20: ("u", -1, "none", -1, -1),
    }


def test_temporal_join_tie_breaks_to_highest_seq(spark):
    # Two dim versions at the SAME timestamp: the match must take the
    # highest seq; a probe at exactly that timestamp matches inclusively.
    rows = [
        _dim("k", 1, BASE),
        _dim("k", 2, BASE),
        _probe("k", 10, BASE),
    ]
    s1 = [_dim("flush", -1, BASE + 10 * DAY)]
    s2 = [_dim("flush", -2, BASE + 20 * DAY)]
    frames = [
        spark.createDataFrame(r, schema=SCHEMA) for r in (rows, s1, s2)
    ]
    dest = os.path.join(STAGE_ROOT, "temporal_unit_tie")
    _stage_ordered_files(spark, frames, dest)
    sev = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    out = _run_to_memory(temporal_join_stream(sev), "append")
    rows = out.filter(F.col("txn_id") == "k").collect()
    assert len(rows) == 1
    assert rows[0]["dim_seq"] == 2
    assert rows[0]["staleness_ms"] == 0


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


def test_temporal_join_state_survives_restart(spark, tmp_path):
    """ST5 for the temporal join: probes and dim versions buffer in
    run 1 (watermark never reaches them, nothing emits), the query
    STOPS, sentinels arrive, a NEW query restarts from the same
    checkpoint — both buffers must be recovered from the state store
    and the as-of matches emitted by the recovered TTL timer."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _stage_one(
        spark,
        [_dim("k", 1, BASE), _probe("k", 10, BASE + 50_000), _probe("u", 20, BASE + 60_000)],
        src,
        "0",
        1_000_000_000,
    )

    def run_once():
        sev = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            temporal_join_stream(sev)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(sink).count() == 0  # everything buffered

    _stage_one(spark, [_dim("flush", -1, BASE + 10 * DAY)], src, "1", 1_000_000_100)
    _stage_one(spark, [_dim("flush", -2, BASE + 20 * DAY)], src, "2", 1_000_000_200)
    run_once()  # restart: buffers recovered, timers fire
    got = {
        r["probe_seq"]: (r["dim_seq"], r["staleness_ms"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {10: (1, 50_000), 20: (-1, -1)}
