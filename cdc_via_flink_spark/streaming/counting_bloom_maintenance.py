"""Streaming-maintained COUNTING-Bloom gate — the deletion-capable
form of streaming/bloom_maintenance.py (fifth adapter over the shared
maintained-index kernel): a CDC-shaped event stream (op `c` insert /
`d` delete / `r` probe-only — the Debezium op codes this engine's CDC
surface already speaks) maintains per-position NET COUNTERS, so
membership can be RETRACTED — the streaming right-to-be-forgotten
path a plain bitmap cannot express.

Per micro-batch (probe-before-apply epoch semantics, matching the
bitmap maintainer):

  1. every event is probed against counters(base ∪ committed deltas)
     — verdict (doc_id, op, cb_hit); a doc deleted in an EARLIER
     epoch reads miss (its counters netted to zero), a doc deleted in
     THIS batch still reads hit;
  2. the batch's net counter delta (inserts +1 / deletes −1 per
     position; `r` rows contribute nothing) folds in as a
     crash-atomic committed delta.

Contract (the standard counting-Bloom precondition, restated for
streams): each distinct digest is inserted at most once across the
stream's life and deletes refer to previously-inserted digests —
exactly what an upstream CDC feed guarantees (a row is created once,
deleted once, in order). Under that contract retained members keep
ZERO false negatives (their own +1 per position cannot be cancelled)
and a full churn nets counters exactly to zero.

Unlike the bitmap (bit_or: associative AND idempotent), the sum fold
is associative but NOT idempotent — exactly-once delta application
comes from the kernel's pointer protocol (replayed epochs skip), the
same guarantee every non-bitmap maintainer already relies on.

Scale: state is ≤ m counter rows TOTAL regardless of corpus size;
per-batch work = k pure-expression hashes per event + one join
against the counter table + an m-bounded delta write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.operators.bloom import (
    counting_bloom_counts,
    counting_bloom_probe,
)
from cdc_via_flink_spark.streaming import index_kernel as ik
from cdc_via_flink_spark.streaming.bloom_maintenance import (
    _digest,
    read_bloom_meta,
    write_bloom_meta,
)

CB_PTR = "_CBLOOM_COMMITTED"

CB_VERDICT_SCHEMA = "doc_id bigint, op string, cb_hit boolean"


def save_streaming_counting_bloom_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 16,
    k: int = 7,
) -> None:
    """Base index over the existing corpus: `base/counters`
    (pos, cnt — ≤ m rows) + `base/meta` (sizing + family pin)."""
    spark = df.sparkSession
    digests = df.select(_digest(text_col).alias("digest")).distinct()
    counting_bloom_counts(
        digests, digests.limit(0), "digest", m_bits, k
    ).coalesce(1).write.mode("overwrite").parquet(path + "/base/counters")
    write_bloom_meta(spark, path + "/base/meta", m_bits, k)


def read_cb_counters(spark: SparkSession, index_path: str) -> DataFrame:
    """Merged counters over base ∪ committed deltas (sum by pos — the
    kernel guarantees each committed epoch is applied exactly once).
    Recovers a crashed compaction first."""
    ik.recover_compaction(index_path, "base")
    c = spark.read.parquet(index_path + "/base/counters")
    for d in ik.committed_deltas(index_path, CB_PTR):
        c = c.unionByName(spark.read.parquet(d + "/counters"))
    return c.groupBy("pos").agg(F.sum("cnt").alias("cnt"))


def compact_counting_bloom_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base: the merged sum written
    back, minus exact-zero rows (the sum's identity — absent and zero
    probe identically, so dropping them is a pure size win after
    churn). MAINTAINER MUST BE STOPPED. Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        read_cb_counters(spark, index_path).filter(
            F.col("cnt") != 0
        ).coalesce(1).write.mode("overwrite").parquet(tmp + "/counters")

    return ik.compact_index(
        index_path, CB_PTR, "base", write_folded, copy_meta=True
    )


def counting_bloom_maintenance_query(
    new_events: DataFrame,
    index_path: str,
    verdicts_out: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    op_col: str = "op",
) -> StreamingQuery:
    """Start the maintained counting gate over a streaming event frame
    (doc_id long, op string in {c,d,r}, text string). Per-event
    verdicts land in verdicts_out/e<epoch>; the batch's net counter
    delta joins the index as delta e<epoch>. Sizing comes from the
    index's validated meta. Caller awaits the query."""
    spark = new_events.sparkSession
    m_bits, k = read_bloom_meta(spark, index_path + "/base/meta")

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        bsess = batch.sparkSession
        counters = read_cb_counters(bsess, index_path)
        bd = batch.select(
            F.col(id_col).alias("doc_id"),
            F.col(op_col).alias("op"),
            _digest(text_col).alias("digest"),
        )
        verdicts = counting_bloom_probe(
            bd.select("doc_id", "digest"), "doc_id", "digest", counters, m_bits, k
        ).join(bd.select("doc_id", "op"), "doc_id").select(
            "doc_id", "op", "cb_hit"
        )
        ik.publish_epoch_output(verdicts, verdicts_out, epoch_id)

        delta = counting_bloom_counts(
            bd.filter(F.col("op") == "c").select("digest"),
            bd.filter(F.col("op") == "d").select("digest"),
            "digest",
            m_bits,
            k,
        )
        delta.coalesce(1).write.mode("overwrite").parquet(delta_tmp + "/counters")

    return ik.run_maintenance(
        new_events,
        index_path,
        CB_PTR,
        "counting-bloom index",
        checkpoint_dir,
        process,
        gc_roots=(verdicts_out,),
    )


def read_cb_verdicts(
    spark: SparkSession, verdicts_out: str, index_path: str | None = None
) -> DataFrame:
    """Union of emitted verdict epochs; with ``index_path``, only
    epochs covered by the COMMITTED pointer. Empty → typed empty."""
    return ik.read_epoch_outputs(
        spark,
        verdicts_out,
        CB_VERDICT_SCHEMA,
        index_path=index_path,
        ptr_name=CB_PTR if index_path is not None else None,
    )
