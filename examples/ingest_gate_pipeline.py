"""Streaming ingest-gate pipeline on the engine's public API: the
front door a pre-training corpus runs at 100 TB —

    arriving documents (3 micro-batches)
      → maintained Bloom+digest gate (streaming/ingest_gate.py):
        definite-miss docs short-circuit, only maybe-dups join the
        corpus digest set; the batch folds in crash-atomically
      → per-epoch probed/skipped accounting (the work the gate saved)
      → retraction demo (streaming/counting_bloom_maintenance.py):
        a counting-Bloom index deletes a document's text and the next
        probe reads miss — the right-to-be-forgotten path

Run: ``python examples/ingest_gate_pipeline.py [sf_dir]``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import cdc_via_flink_spark as eng


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = eng.get_spark("ingest-gate-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    from cdc_via_flink_spark.operators.bloom import bloom_plan
    from cdc_via_flink_spark.streaming.counting_bloom_maintenance import (
        counting_bloom_maintenance_query,
        read_cb_verdicts,
        save_streaming_counting_bloom_index,
    )
    from cdc_via_flink_spark.streaming.ingest_gate import (
        gated_dedup_query,
        read_gate_verdicts,
        save_gated_dedup_index,
    )

    work = tempfile.mkdtemp(prefix="ingest_gate_")
    docs = eng.load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)

    # ---- 1. maintained Bloom+digest gate over 3 arrival batches ----
    m_bits, k = bloom_plan(5000, 0.01)  # sized for corpus + arrivals
    idx = os.path.join(work, "gate_idx")
    out = os.path.join(work, "gate_verdicts")
    save_gated_dedup_index(corpus, idx, m_bits=m_bits, k=k)

    arrivals = corpus.limit(20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"  # redeliveries
    ).unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"  # fresh
        )
    )
    staged = os.path.join(work, "staged")
    for i in range(3):
        arrivals.filter(F.pmod(F.col("doc_id"), 3) == i).coalesce(1).write.mode(
            "append"
        ).parquet(staged)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    gated_dedup_query(stream, idx, out, os.path.join(work, "ckpt")).awaitTermination()

    v = read_gate_verdicts(spark, out, index_path=idx)
    print("gate verdicts (bloom_hit=False rows never joined the corpus):")
    v.orderBy("ep", "doc_id").show(8)
    v.groupBy("ep").agg(
        F.first("ep_probed").alias("probed"),
        F.first("ep_skipped").alias("skipped"),
        F.count(F.when(F.col("exact_dup"), 1)).alias("confirmed_dups"),
    ).orderBy("ep").show()

    # ---- 2. retraction: counting-Bloom delete → miss ----
    cb_idx = os.path.join(work, "cb_idx")
    cb_out = os.path.join(work, "cb_verdicts")
    save_streaming_counting_bloom_index(corpus, cb_idx, m_bits=m_bits, k=k)
    target = corpus.orderBy("doc_id").limit(1).collect()[0]
    events = spark.createDataFrame(
        [
            (1, "r", target.text),  # member → hit
            (2, "d", target.text),  # retract it
            (3, "r", target.text),  # post-delete probe → miss
        ],
        "doc_id long, op string, text string",
    )
    ev_staged = os.path.join(work, "cb_staged")
    for i in (1, 2, 3):
        events.filter(F.col("doc_id") == i).coalesce(1).write.mode("append").parquet(
            ev_staged
        )
    stream = (
        spark.readStream.schema("doc_id long, op string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_staged)
    )
    counting_bloom_maintenance_query(
        stream, cb_idx, cb_out, os.path.join(work, "cb_ckpt")
    ).awaitTermination()
    print("retraction lifecycle (hit → delete → miss):")
    read_cb_verdicts(spark, cb_out, index_path=cb_idx).orderBy("doc_id").show()

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
