"""State-store-native dedup gate (streaming/ingest_gate_tws.py): the
transformWithStateInPandas backend must enforce the kernel gate's
committed-epochs-only verdict contract (same-epoch duplicates ALL
admitted), seed corpus members through the initial-state channel
(first_seen_ep = -1), and record the admitting epoch as state."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cdc_via_flink_spark.vendor.proto_compat import ensure_protobuf


pytestmark = pytest.mark.skipif(
    ensure_protobuf() == "unavailable",
    reason="transformWithStateInPandas needs protobuf (real or shim)",
)


def _run_gate(spark, tmp_path, corpus_rows, batches):
    """Replay ``batches`` (list of lists of (doc_id, text, ep)) through
    the TWS gate seeded from ``corpus_rows`` [(doc_id, text)]."""
    from cdc_via_flink_spark.streaming.ingest_gate_tws import (
        gated_dedup_stream_tws,
    )
    from cdc_via_flink_spark.vendor.proto_compat import ship_to_workers

    ship_to_workers(spark)
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    frames = [
        spark.createDataFrame(b, "doc_id long, text string, ep long")
        for b in batches
    ]
    dest = str(tmp_path / "staged")
    shutil.rmtree(dest, ignore_errors=True)
    from cdc_via_flink_spark.plans.streaming_queries import (
        _STAGED_DESTS,
        _stage_ordered_files,
    )

    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema("doc_id long, text string, ep long")
        .option("maxFilesPerTrigger", 1)
        .parquet(dest)
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        verd = gated_dedup_stream_tws(stream, corpus)
        q = (
            verd.writeStream.format("memory")
            .queryName("gate_tws_test")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r["doc_id"]: (r["exact_dup"], r["first_seen_ep"])
            for r in spark.table("gate_tws_test").collect()
        }
    finally:
        if prev:
            spark.conf.set(provider_key, prev)
        else:
            spark.conf.unset(provider_key)


def test_gate_tws_state_machine(spark, tmp_path):
    """One run exercises every verdict class: corpus redelivery
    (dup, first_seen_ep=-1), same-epoch duplicates (both admitted),
    cross-epoch redelivery (dup, first_seen_ep = admitting epoch),
    and a fresh singleton (not dup, null state)."""
    corpus = [(1, "alpha text"), (2, "beta text")]
    batches = [
        # ep 0: corpus redelivery + same-ep duplicate pair + fresh
        [
            (10, "alpha text", 0),
            (11, "gamma text", 0),
            (12, "gamma text", 0),
            (13, "delta text", 0),
        ],
        # ep 1: redelivery of the ep-0 admission + fresh singleton
        [(20, "gamma text", 1), (21, "epsilon text", 1)],
    ]
    out = _run_gate(spark, tmp_path, corpus, batches)
    assert out[10] == (True, -1)  # corpus member, seeded state
    assert out[11] == (False, None)  # first sight
    assert out[12] == (False, None)  # SAME epoch: also admitted
    assert out[13] == (False, None)
    assert out[20] == (True, 0)  # admitted at ep 0, state says so
    assert out[21] == (False, None)


def test_gate_tws_normalized_digest(spark, tmp_path):
    """The digest family normalizes whitespace/case exactly like the
    kernel gate, so the two backends admit the same corpus."""
    corpus = [(1, "Hello   World")]
    batches = [[(10, "hello world", 0)]]
    out = _run_gate(spark, tmp_path, corpus, batches)
    assert out[10] == (True, -1)
