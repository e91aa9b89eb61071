"""Bloom-gated exact-dedup composition (streaming/ingest_gate.py):
the miss branch must be structurally incapable of touching the
corpus (the 100 TB short-circuit), redeliveries can never slip
through (no false negatives ⇒ gate+dedup == dedup-alone), the
verdict counts expose the skipped work, and compaction is a pure
physical rewrite of BOTH index parts under the one shared pointer."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_via_flink_spark.plans.streaming_queries import (
    STAGE_ROOT,
    _STAGED_DESTS,
    _stage_ordered_files,
)
from cdc_via_flink_spark.sources.tables import load_table
from cdc_via_flink_spark.streaming import index_kernel as ik
from cdc_via_flink_spark.streaming.bloom_maintenance import _digest
from cdc_via_flink_spark.streaming.ingest_gate import (
    GATE_PTR,
    compact_gated_index,
    gate_and_dedup,
    gated_dedup_query,
    read_corpus_digests,
    read_gate_bitmap,
    read_gate_verdicts,
    save_gated_dedup_index,
)
from tests.conftest import SF0001

SCHEMA = "doc_id long, text string"
M, K = 1 << 14, 5


def test_miss_branch_never_scans_corpus(spark, tmp_path):
    """Structural short-circuit pin: in the composed plan the corpus
    relation appears EXACTLY once — under the bloom-hit branch. If the
    miss branch ever joined (or the union were computed corpus-first
    and filtered later), the corpus scan would appear twice or the
    hit-filter would sit above the join."""
    corpus_path = str(tmp_path / "corpus_digests")
    spark.range(100).select((F.col("id") * 7).alias("digest")).write.parquet(
        corpus_path
    )
    corpus = spark.read.parquet(corpus_path)
    bd = spark.range(50).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("digest")
    )
    bitmap = spark.createDataFrame([(0, 7), (1, 2)], "word long, bits long")
    plan = gate_and_dedup(bd, bitmap, corpus, M, K)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )
    # the corpus parquet relation appears once in the optimized tree
    # (the bitmap and arrivals are in-memory frames, so the single
    # parquet relation IS the corpus — only the hit branch holds it)
    optimized = plan.split("== Optimized Logical Plan ==")[1].split(
        "== Physical Plan =="
    )[0]
    assert optimized.count("] parquet") == 1, plan
    # and the bloom-hit filter is present under that branch while the
    # miss branch carries only the literal-false projection
    assert "NOT bloom_hit" in optimized and "bloom_hit" in optimized, plan


def _run(spark, tmp_path, epochs=3):
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    redeliver = old.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    fresh = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    batch = redeliver.unionByName(fresh)
    idx = str(tmp_path / "gate_idx")
    out = str(tmp_path / "gate_verdicts")
    ckpt = str(tmp_path / "gate_ckpt")
    save_gated_dedup_index(old, idx, m_bits=M, k=K)
    frames = [
        batch.filter(F.pmod(F.col("doc_id"), epochs) == k).orderBy("doc_id")
        for k in range(epochs)
    ]
    dest = os.path.join(STAGE_ROOT, "ingest_gate_test")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    gated_dedup_query(stream, idx, out, ckpt).awaitTermination()
    return idx, out, ckpt, dest, batch


def test_gate_equals_dedup_alone_and_counts(spark, tmp_path):
    idx, out, ckpt, dest, batch = _run(spark, tmp_path)
    v = read_gate_verdicts(spark, out, index_path=idx)
    rows = {r.doc_id: r for r in v.collect()}
    assert len(rows) == batch.count()

    # dedup-alone ground truth, computed directly (no Bloom): digest
    # in base corpus or in an earlier epoch's arrivals
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    base_dig = {
        r.digest
        for r in docs.filter(F.col("doc_id") % 5 != 0)
        .select(_digest("text").alias("digest"))
        .collect()
    }
    arr = batch.select(
        "doc_id", (F.col("doc_id") % 3).alias("ep"), _digest("text").alias("digest")
    ).collect()
    by_ep: dict[int, set] = {}
    for r in arr:
        by_ep.setdefault(r.ep, set()).add(r.digest)
    for r in arr:
        seen = base_dig | set().union(
            *(by_ep.get(e, set()) for e in range(r.ep))
        )
        want = r.digest in seen
        assert rows[r.doc_id].exact_dup == want, r.doc_id
        if want:  # no false negatives: every true dup was bloom-probed
            assert rows[r.doc_id].bloom_hit

    # count columns: per epoch, probed + skipped == epoch size and the
    # probed count equals the bloom_hit count — the short-circuit is
    # visible work reduction, with real skips present at this sizing
    for ep in by_ep:
        ep_rows = [rows[r.doc_id] for r in arr if r.ep == ep]
        probed = sum(1 for x in ep_rows if x.bloom_hit)
        assert all(x.ep_probed == probed for x in ep_rows)
        assert all(x.ep_skipped == len(ep_rows) - probed for x in ep_rows)
    assert sum(1 for x in rows.values() if not x.bloom_hit) > 0


def test_compaction_pure_rewrite_and_replay_skip(spark, tmp_path):
    idx, out, ckpt, dest, _ = _run(spark, tmp_path)
    bm_before = {(r.word, r.bits) for r in read_gate_bitmap(spark, idx).collect()}
    dig_before = {r.digest for r in read_corpus_digests(spark, idx).collect()}
    assert len(ik.committed_deltas(idx, GATE_PTR)) == 3
    assert compact_gated_index(spark, idx) == {"deltas_folded": 3}
    assert ik.committed_deltas(idx, GATE_PTR) == []
    assert {(r.word, r.bits) for r in read_gate_bitmap(spark, idx).collect()} == bm_before
    assert {r.digest for r in read_corpus_digests(spark, idx).collect()} == dig_before

    # folded epochs still skip on replay (pointer high-water survives)
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    gated_dedup_query(stream, idx, out, ckpt).awaitTermination()
    assert sorted(os.listdir(out)) == before
