"""Streaming activity-bitmap maintainer
(streaming/bitmap_maintenance.py, the sixth kernel adapter): per-epoch
new-active counts equal a first-epoch-wins recompute, membership is
EXACT (words after the run equal a fresh batch build over everything),
compaction is a pure physical rewrite, replay is idempotent, and
layout metadata refuses drift."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_via_flink_spark.plans.streaming_queries import (
    STAGE_ROOT,
    _STAGED_DESTS,
    _stage_ordered_files,
)
from cdc_via_flink_spark.sources.tables import load_table
from cdc_via_flink_spark.streaming.bitmap_maintenance import (
    _words,
    bitmap_maintenance_query,
    compact_bitmap_index,
    read_bitmap_words,
    read_dau,
    save_streaming_bitmap_index,
)
from tests.conftest import SF0001

SCHEMA = "user_id long, day date"


def _split(spark):
    ev = load_table(spark, SF0001, "events").select(
        "event_id",
        "user_id",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    )
    base = ev.filter(F.col("event_id") % 2 == 0).select("user_id", "day")
    strm = ev.filter(F.col("event_id") % 2 == 1).select(
        "user_id", "day",
        ((F.col("event_id") / 2).cast("long") % 3).alias("ep"),
    )
    return base, strm


def _run(spark, tmp_path, base, strm, name, epochs=3):
    idx = str(tmp_path / f"{name}_idx")
    out = str(tmp_path / f"{name}_dau")
    ckpt = str(tmp_path / f"{name}_ckpt")
    save_streaming_bitmap_index(base, idx)
    frames = [
        strm.filter(F.col("ep") == k).select("user_id", "day").orderBy(
            "user_id", "day"
        )
        for k in range(epochs)
    ]
    dest = os.path.join(STAGE_ROOT, f"bitmap_maint_test_{name}")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = bitmap_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    return idx, out, ckpt, dest


def test_dau_first_epoch_wins_and_words_exact(spark, tmp_path):
    base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "main")

    # per-epoch new actives == first-epoch-wins recompute over the
    # same split (the oracle's algebra, recomputed here row-wise)
    got = {(r.ep, r.day): r.new_actives for r in read_dau(spark, out, idx).collect()}
    base_set = {(r.user_id, r.day) for r in base.collect()}
    firsts: dict[tuple, int] = {}
    for r in strm.orderBy("ep").collect():
        k = (r.user_id, r.day)
        if k not in base_set and k not in firsts:
            firsts[k] = r.ep
    grid = {(r.ep, r.day) for r in strm.select("ep", "day").distinct().collect()}
    want = {g: 0 for g in grid}
    for (u, day), ep in firsts.items():
        want[(ep, day)] += 1
    assert got == want

    # EXACT membership: maintained words == fresh build over base ∪ stream
    maintained = {
        (r.day, r.blk, r.word) for r in read_bitmap_words(spark, idx).collect()
    }
    fresh = {
        (r.day, r.blk, r.word)
        for r in _words(
            base.unionByName(strm.select("user_id", "day"))
        ).collect()
    }
    assert maintained == fresh

    # replay idempotency: fresh query, same checkpoint -> nothing new
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q2 = bitmap_maintenance_query(stream, idx, out, ckpt)
    q2.awaitTermination()
    assert sorted(os.listdir(out)) == before

    # foreign checkpoint refused against the same index lineage
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q3 = bitmap_maintenance_query(stream, idx, out, str(tmp_path / "other_ckpt"))
    with pytest.raises(Exception, match="refusing epochs"):
        q3.awaitTermination()


def test_compaction_is_pure_physical_rewrite(spark, tmp_path):
    from cdc_via_flink_spark.streaming import index_kernel as ik
    from cdc_via_flink_spark.streaming.bitmap_maintenance import BITMAP_PTR

    base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "compact")

    merged_before = {
        (r.day, r.blk, r.word) for r in read_bitmap_words(spark, idx).collect()
    }
    assert len(ik.committed_deltas(idx, BITMAP_PTR)) == 3

    res = compact_bitmap_index(spark, idx)
    assert res == {"deltas_folded": 3}
    assert ik.committed_deltas(idx, BITMAP_PTR) == []
    merged_after = {
        (r.day, r.blk, r.word) for r in read_bitmap_words(spark, idx).collect()
    }
    assert merged_after == merged_before  # bit_or fold is lossless

    # folded epochs still skip on replay (pointer high-water survives)
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = bitmap_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    assert sorted(os.listdir(out)) == before


def test_meta_validation(spark, tmp_path):
    from cdc_via_flink_spark.streaming.bitmap_maintenance import (
        BLOCK_BITS,
        read_bitmap_meta,
    )

    base, _ = _split(spark)
    idx = str(tmp_path / "meta_idx")
    save_streaming_bitmap_index(base.limit(20), idx)
    assert read_bitmap_meta(spark, idx + "/base/meta") == BLOCK_BITS
    with pytest.raises(ValueError, match="predates layout"):
        read_bitmap_meta(spark, str(tmp_path / "nonexistent/meta"))
    # drifted block width refused
    spark.createDataFrame(
        [(64, 1)], "block_bits bigint, version bigint"
    ).coalesce(1).write.mode("overwrite").parquet(idx + "/base/meta")
    with pytest.raises(ValueError, match="block width"):
        read_bitmap_meta(spark, idx + "/base/meta")
