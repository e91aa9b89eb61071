"""Streaming winnowing-fingerprint index maintenance — the
INGEST-TIME decontamination gate in its maintained form (the third
instance of the maintained-index recipe, next to
streaming/dedup_maintenance.py and streaming/ann_maintenance.py):
documents arrive as a stream, and every micro-batch is

  1. overlap-checked against the maintained fingerprint index
     (base ∪ COMMITTED deltas) AND against itself — emitting the
     winnowing pairs (shared_fps >= the index's min_shared) that
     involve a batch document, with the common-fingerprint cut
     evaluated over the CORPUS AS OF THIS EPOCH (stored per-fh counts
     + the batch's — cut-at-emission is the deployment semantics: an
     admission decision at ingest cannot consult future arrivals);
  2. appended as a crash-atomic committed DELTA (the batch's distinct
     (doc, fh) rows + its per-fh counts, so later epochs extend the
     cut's ledger without re-aggregating the full index).

Crash-atomicity (exactly-once epochs, compaction recovery, foreign-
checkpoint refusal) comes from the shared maintained-index kernel
(streaming/index_kernel.py); this adapter contributes the winnowing
content: delta layout, meta validation, and per-epoch pair emission.
The cut/report thresholds (fp_cap, min_shared) are read FROM the
index's validated meta — pinned at save time, they drive behavior for
the index's whole life, so a later change to the module constants
cannot silently shift an existing index's policy (round-8 ADVICE).

A pair is emitted exactly once — at the epoch its LAST member
arrives (earlier epochs lack that member entirely; later epochs see
no batch member for it). The union of per-epoch outputs therefore
equals the sum over epochs of incremental_pairs_against(prefix_k,
batch_k) — which the declared stream_winnow_incremental query pins
against a 3-epoch UNROLLED SQL oracle.

Scale: per-batch work = tokenizing the BATCH (map-side winnowing),
one fh equi-join against stored fingerprint rows, a count merge over
the (tiny) per-fh count parts, and a delta-sized write; the base
index is never rewritten. CAPACITY (differenced,
STATESTORE_r09_marginal.json): the one-shot 55 docs/s of
STATESTORE_r08_winnow.json was a fixed-cost artifact of tiny epochs
(~2.3 s/epoch of planning + commits, 87 % of a 500-doc epoch); the
MARGINAL rate on the non-colliding bulk is ~1,400 docs/s per
local[32] host — the number an ingest gate sizes against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.streaming import index_kernel as ik

WINNOW_PTR = "_WINNOW_COMMITTED"
COMPACT_MARKER = ik.COMPACT_MARKER

# schema of the emitted pair frames (incremental_pairs_against output)
PAIRS_SCHEMA = "id_a bigint, id_b bigint, shared_fps bigint"


def _read_ptr(index_path: str) -> tuple[int, str] | None:
    return ik.read_ptr(index_path, WINNOW_PTR)


def _write_ptr(index_path: str, epoch: int, run: str) -> None:
    ik.write_ptr(index_path, WINNOW_PTR, epoch, run)


def _committed_deltas(index_path: str) -> list[str]:
    return ik.committed_deltas(index_path, WINNOW_PTR)


def save_streaming_winnow_index(
    df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Base index for the maintained flow: save_winnow_index's parts
    under ONE `base/` dir (fp clustered by fh, per-fh counts, sizing/
    version meta) so compaction can publish a folded replacement with
    a single two-rename swap (the dedup_maintenance recipe)."""
    from cdc_via_flink_spark.operators.winnow import (
        WINNOW_FP_CAP,
        WINNOW_K,
        WINNOW_MIN_SHARED,
        WINNOW_VERSION,
        WINNOW_W,
        winnow_fingerprints,
    )

    fp = winnow_fingerprints(df, text_col, id_col)
    fp.repartition("fh").sortWithinPartitions("fh").write.mode(
        "overwrite"
    ).parquet(path + "/base/fp")
    fp.groupBy("fh").agg(F.count(F.lit(1)).alias("n_docs")).write.mode(
        "overwrite"
    ).parquet(path + "/base/fp_counts")
    df.sparkSession.createDataFrame(
        [(WINNOW_K, WINNOW_W, WINNOW_FP_CAP, WINNOW_MIN_SHARED, WINNOW_VERSION)],
        "k int, w int, fp_cap int, min_shared int, version int",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/base/meta")


def read_winnow_index(
    spark: SparkSession, index_path: str
) -> tuple[DataFrame, DataFrame]:
    """(fp, counts) over base ∪ committed deltas: fp rows unioned,
    counts per fh summed across the (small) per-part count frames.
    Recovers a crashed compaction first so readers never observe the
    mid-swap window."""
    ik.recover_compaction(index_path, "base")
    fp = spark.read.parquet(index_path + "/base/fp")
    cnt = spark.read.parquet(index_path + "/base/fp_counts")
    for d in _committed_deltas(index_path):
        fp = fp.unionByName(spark.read.parquet(d + "/fp"))
        cnt = cnt.unionByName(spark.read.parquet(d + "/fp_counts"))
    cnt = cnt.groupBy("fh").agg(F.sum("n_docs").alias("n_docs"))
    return fp, cnt


def _recover_compaction(index_path: str) -> None:
    ik.recover_compaction(index_path, "base")


def compact_winnow_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base. Pure physical rewrite: the
    folded fp set and summed counts equal the union the readers
    already saw; meta is invariant (the kernel carries it into the
    replacement base). MAINTAINER MUST BE STOPPED. The maintenance
    pointer survives (epoch high-water must keep replayed epochs
    skipping). Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        fp, cnt = read_winnow_index(spark, index_path)
        fp.repartition("fh").sortWithinPartitions("fh").write.mode(
            "overwrite"
        ).parquet(tmp + "/fp")
        cnt.write.mode("overwrite").parquet(tmp + "/fp_counts")

    return ik.compact_index(
        index_path, WINNOW_PTR, "base", write_folded, copy_meta=True
    )


def winnow_maintenance_query(
    new_docs: DataFrame,
    index_path: str,
    pairs_out: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the maintained overlap gate over a streaming document
    frame (doc_id long, text string). Batch-involving pairs land in
    pairs_out/e<epoch>; the batch's fingerprints + counts join the
    index as delta e<epoch>. The index's base/meta is validated
    BEFORE the stream starts (fingerprint-function mismatch = silent
    zero-overlap, so it raises here instead), and the validated meta's
    fp_cap/min_shared drive the per-batch cut — the stored index keeps
    its own recorded policy across module-constant changes (round-8
    ADVICE). Caller awaits the query."""
    from cdc_via_flink_spark.operators.winnow import (
        check_winnow_meta,
        incremental_pairs_against,
        winnow_fingerprints,
    )

    meta = check_winnow_meta(new_docs.sparkSession, index_path + "/base")
    fp_cap, min_shared = int(meta.fp_cap), int(meta.min_shared)

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        spark = batch.sparkSession
        fp_old, cnt_old = read_winnow_index(spark, index_path)
        pairs = incremental_pairs_against(
            fp_old, cnt_old, batch, fp_cap=fp_cap, min_shared=min_shared
        )
        ik.publish_epoch_output(pairs, pairs_out, epoch_id)

        fp_b = winnow_fingerprints(batch)
        fp_b.write.mode("overwrite").parquet(delta_tmp + "/fp")
        fp_b.groupBy("fh").agg(F.count(F.lit(1)).alias("n_docs")).write.mode(
            "overwrite"
        ).parquet(delta_tmp + "/fp_counts")

    return ik.run_maintenance(
        new_docs,
        index_path,
        WINNOW_PTR,
        "winnow index",
        checkpoint_dir,
        process,
        gc_roots=(pairs_out,),
    )


def read_emitted_pairs(
    spark: SparkSession, pairs_out: str, index_path: str | None = None
) -> DataFrame:
    """Union of emitted pair epochs. With ``index_path`` given, only
    epochs covered by the index's COMMITTED pointer are read (an epoch
    published by a crash that died before its pointer commit is
    excluded — it will be rewritten on replay); without it, all
    published epochs. Empty output → an empty typed frame, not an
    error (round-8 ADVICE)."""
    return ik.read_epoch_outputs(
        spark,
        pairs_out,
        PAIRS_SCHEMA,
        index_path=index_path,
        ptr_name=WINNOW_PTR if index_path is not None else None,
    )
