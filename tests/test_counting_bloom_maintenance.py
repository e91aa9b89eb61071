"""Streaming counting-Bloom maintainer
(streaming/counting_bloom_maintenance.py): deletes retract membership
across epochs, retained members never false-negative, epochs are
replay-idempotent via the kernel pointer (the sum fold is NOT
idempotent by algebra — the protocol must carry it), compaction is a
pure fold that drops exact-zero rows, and foreign checkpoints
refuse."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_via_flink_spark.plans.streaming_queries import (
    STAGE_ROOT,
    _STAGED_DESTS,
    _stage_ordered_files,
)
from cdc_via_flink_spark.streaming import index_kernel as ik
from cdc_via_flink_spark.streaming.counting_bloom_maintenance import (
    CB_PTR,
    compact_counting_bloom_index,
    counting_bloom_maintenance_query,
    read_cb_counters,
    read_cb_verdicts,
    save_streaming_counting_bloom_index,
)

SCHEMA = "doc_id long, op string, text string"
M, K = 1 << 14, 5


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _run(spark, tmp_path, name, frames, corpus):
    idx = str(tmp_path / f"{name}_idx")
    out = str(tmp_path / f"{name}_verdicts")
    ckpt = str(tmp_path / f"{name}_ckpt")
    save_streaming_counting_bloom_index(corpus, idx, m_bits=M, k=K)
    dest = os.path.join(STAGE_ROOT, f"cbloom_test_{name}")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    counting_bloom_maintenance_query(stream, idx, out, ckpt).awaitTermination()
    return idx, out, ckpt, dest


def test_delete_retracts_membership_across_epochs(spark, tmp_path):
    corpus = _mk(
        spark,
        [(1, "c", "alpha doc kept"), (2, "c", "beta doc deleted"),
         (3, "c", "gamma doc kept")],
    ).select("doc_id", "text")
    frames = [
        _mk(spark, [(10, "d", "beta doc deleted")]),  # ep0: delete beta
        _mk(spark, [  # ep1 probes
            (20, "r", "beta doc deleted"),   # deleted -> miss
            (21, "r", "alpha doc kept"),     # retained -> hit
            (22, "r", "gamma doc kept"),     # retained -> hit
            (23, "r", "never inserted txt"),  # fresh -> miss
        ]),
    ]
    idx, out, ckpt, dest = _run(spark, tmp_path, "retract", frames, corpus)
    got = {r.doc_id: (r.op, r.cb_hit) for r in read_cb_verdicts(spark, out, index_path=idx).collect()}
    assert got[10] == ("d", True)  # the delete itself probed pre-apply: member then
    assert got[20] == ("r", False)
    assert got[21] == ("r", True)
    assert got[22] == ("r", True)
    assert got[23][1] is False


def test_insert_then_delete_then_reprobe(spark, tmp_path):
    """Full lifecycle of ONE digest across three epochs: miss before
    insert, hit after insert, miss after delete — counters net exactly
    (the retract path a bitmap cannot express)."""
    corpus = _mk(spark, [(1, "c", "seed")]).select("doc_id", "text")
    frames = [
        _mk(spark, [(10, "r", "target text"), (11, "c", "target text")]),
        _mk(spark, [(20, "r", "target text"), (21, "d", "target text")]),
        _mk(spark, [(30, "r", "target text")]),
    ]
    idx, out, ckpt, dest = _run(spark, tmp_path, "lifecycle", frames, corpus)
    got = {r.doc_id: r.cb_hit for r in read_cb_verdicts(spark, out, index_path=idx).collect()}
    assert got[10] is False  # before its insert epoch
    assert got[20] is True  # inserted in ep0
    assert got[30] is False  # deleted in ep1


def test_replay_idempotent_and_foreign_checkpoint(spark, tmp_path):
    corpus = _mk(spark, [(1, "c", "base text")]).select("doc_id", "text")
    frames = [
        _mk(spark, [(10, "c", "x1"), (11, "d", "base text")]),
        _mk(spark, [(20, "r", "x1")]),
    ]
    idx, out, ckpt, dest = _run(spark, tmp_path, "replay", frames, corpus)
    counters_before = {
        (r.pos, r.cnt) for r in read_cb_counters(spark, idx).collect()
    }
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    counting_bloom_maintenance_query(stream, idx, out, ckpt).awaitTermination()
    # a replay must not double-apply any delta (sum is not idempotent;
    # the pointer protocol must carry exactly-once)
    assert {
        (r.pos, r.cnt) for r in read_cb_counters(spark, idx).collect()
    } == counters_before
    assert sorted(os.listdir(out)) == before

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = counting_bloom_maintenance_query(
        stream, idx, out, str(tmp_path / "other_ckpt")
    )
    with pytest.raises(Exception, match="refusing epochs"):
        q.awaitTermination()


def test_compaction_fold_drops_zero_rows(spark, tmp_path):
    """Compaction = merged sum minus exact-zero rows; probe-visible
    state (the merged counter sum) is unchanged, and a fully-churned
    digest's rows vanish from the base."""
    corpus = _mk(spark, [(1, "c", "will churn"), (2, "c", "stays")]).select(
        "doc_id", "text"
    )
    frames = [
        _mk(spark, [(10, "d", "will churn")]),
        _mk(spark, [(20, "c", "new member")]),
    ]
    idx, out, ckpt, dest = _run(spark, tmp_path, "compact", frames, corpus)
    merged_before = {
        (r.pos, r.cnt)
        for r in read_cb_counters(spark, idx).filter(F.col("cnt") != 0).collect()
    }
    assert len(ik.committed_deltas(idx, CB_PTR)) == 2
    assert compact_counting_bloom_index(spark, idx) == {"deltas_folded": 2}
    assert ik.committed_deltas(idx, CB_PTR) == []
    after = {(r.pos, r.cnt) for r in read_cb_counters(spark, idx).collect()}
    assert after == merged_before  # zero rows gone, sums intact
    assert all(c != 0 for _, c in after)
