"""Streaming Bloom maintainer (streaming/bloom_maintenance.py): the
maintained gate's verdicts equal the algebraic batch simulation
(probe-before-insert epoch semantics), redeliveries can never read
"miss", epochs are replay-idempotent, compaction is a pure physical
rewrite (bit_or fold), and foreign checkpoints / stale meta refuse."""

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
from cdc_via_flink_spark.streaming.bloom_maintenance import (
    bloom_maintenance_query,
    compact_bloom_index,
    read_bloom_bitmap,
    read_verdicts,
    save_streaming_bloom_index,
)
from tests.conftest import SF0001

SCHEMA = "doc_id long, text string"
M, K = 1 << 14, 5


def _corpus(spark):
    d = load_table(spark, SF0001, "documents").select("doc_id", "text")
    old = d.filter(F.col("doc_id") % 5 != 0)
    redeliver = old.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    fresh = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    return old, redeliver.unionByName(fresh)


def _run(spark, tmp_path, old, batch, name, epochs=3):
    idx = str(tmp_path / f"{name}_idx")
    out = str(tmp_path / f"{name}_verdicts")
    ckpt = str(tmp_path / f"{name}_ckpt")
    save_streaming_bloom_index(old, idx, m_bits=M, k=K)
    frames = [
        batch.filter(F.pmod(F.col("doc_id"), epochs) == k).orderBy("doc_id")
        for k in range(epochs)
    ]
    dest = os.path.join(STAGE_ROOT, f"bloom_maint_test_{name}")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = bloom_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    return idx, out, ckpt, dest


def test_verdicts_redeliveries_hit_and_replay_idempotent(spark, tmp_path):
    old, batch = _corpus(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, old, batch, "main")

    v = read_verdicts(spark, out, index_path=idx)
    got = {r.doc_id: r.bloom_hit for r in v.collect()}
    assert len(got) == batch.count()

    # the Bloom guarantee: every redelivered doc (text in the base
    # corpus) MUST read hit — a false negative is impossible
    redel = {r.doc_id for r in batch.filter(F.col("doc_id") < 2_000_000).collect()}
    assert all(got[i] for i in redel)
    # fresh docs overwhelmingly miss at this sizing (some may
    # false-positive; none may crash the invariant above)
    fresh = [i for i in got if i >= 2_000_000]
    assert sum(not got[i] for i in fresh) > len(fresh) * 0.8

    # replay idempotency: fresh query, same checkpoint -> nothing new
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q2 = bloom_maintenance_query(stream, idx, out, ckpt)
    q2.awaitTermination()
    assert sorted(os.listdir(out)) == before
    assert {r.doc_id: r.bloom_hit for r in read_verdicts(spark, out).collect()} == got

    # foreign checkpoint refused against the same index lineage
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q3 = bloom_maintenance_query(stream, idx, out, str(tmp_path / "other_ckpt"))
    with pytest.raises(Exception, match="refusing epochs"):
        q3.awaitTermination()


def test_later_epoch_sees_earlier_batch(spark, tmp_path):
    """A text first seen in epoch 0 must read HIT when redelivered in
    a later epoch — the delta fold-in is live, not just the base."""
    old, _ = _corpus(spark)
    first = old.limit(0)  # no redeliveries; construct a controlled pair
    probe = spark.createDataFrame(
        [
            (3_000_000, "a brand new sentence never in the corpus"),
            (3_000_001, "a brand new sentence never in the corpus"),
        ],
        SCHEMA,
    )
    # epoch split on pmod 2: 3_000_000 -> epoch 0, 3_000_001 -> epoch 1
    idx = str(tmp_path / "late_idx")
    out = str(tmp_path / "late_verdicts")
    ckpt = str(tmp_path / "late_ckpt")
    save_streaming_bloom_index(old, idx, m_bits=M, k=K)
    frames = [
        probe.filter(F.col("doc_id") == 3_000_000),
        probe.filter(F.col("doc_id") == 3_000_001),
    ]
    dest = os.path.join(STAGE_ROOT, "bloom_maint_test_late")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = bloom_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    got = {r.doc_id: r.bloom_hit for r in read_verdicts(spark, out).collect()}
    assert got[3_000_000] is False  # truly new at its own epoch
    assert got[3_000_001] is True  # the epoch-0 delta covers it
    assert first.count() == 0


def test_compaction_is_pure_physical_rewrite(spark, tmp_path):
    from cdc_via_flink_spark.streaming import index_kernel as ik
    from cdc_via_flink_spark.streaming.bloom_maintenance import BLOOM_PTR

    old, batch = _corpus(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, old, batch, "compact")

    merged_before = {
        (r.word, r.bits) for r in read_bloom_bitmap(spark, idx).collect()
    }
    assert len(ik.committed_deltas(idx, BLOOM_PTR)) == 3

    res = compact_bloom_index(spark, idx)
    assert res == {"deltas_folded": 3}
    assert ik.committed_deltas(idx, BLOOM_PTR) == []
    merged_after = {
        (r.word, r.bits) for r in read_bloom_bitmap(spark, idx).collect()
    }
    assert merged_after == merged_before  # bit_or fold is lossless

    # folded epochs still skip on replay (pointer high-water survives)
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = bloom_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    assert sorted(os.listdir(out)) == before


def test_meta_validation(spark, tmp_path):
    from cdc_via_flink_spark.streaming.bloom_maintenance import read_bloom_meta

    old, _ = _corpus(spark)
    idx = str(tmp_path / "meta_idx")
    save_streaming_bloom_index(old.limit(20), idx, m_bits=M, k=K)
    assert read_bloom_meta(spark, idx + "/base/meta") == (M, K)
    with pytest.raises(ValueError, match="predates sizing"):
        read_bloom_meta(spark, str(tmp_path / "nonexistent/meta"))
