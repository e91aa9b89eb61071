"""Streaming winnowing-fingerprint index maintenance — the
INGEST-TIME decontamination gate in its maintained form (the third
instance of the maintained-index recipe, next to
streaming/dedup_maintenance.py and streaming/ann_maintenance.py):
documents arrive as a stream, and every micro-batch is

  1. overlap-checked against the maintained fingerprint index
     (base ∪ COMMITTED deltas) AND against itself — emitting the
     winnowing pairs (shared_fps >= WINNOW_MIN_SHARED) that involve a
     batch document, with the common-fingerprint cut evaluated over
     the CORPUS AS OF THIS EPOCH (stored per-fh counts + the batch's
     — cut-at-emission is the deployment semantics: an admission
     decision at ingest cannot consult future arrivals);
  2. appended as a crash-atomic committed DELTA (the batch's distinct
     (doc, fh) rows + its per-fh counts, so later epochs extend the
     cut's ledger without re-aggregating the full index), behind the
     epoch + checkpoint-identity pointer recipe: tmp staging,
     one-rename publish, pointer commit last, orphan GC, replayed
     epochs skipped, foreign checkpoints refused.

A pair is emitted exactly once — at the epoch its LAST member
arrives (earlier epochs lack that member entirely; later epochs see
no batch member for it). The union of per-epoch outputs therefore
equals the sum over epochs of incremental_pairs_against(prefix_k,
batch_k) — which the declared stream_winnow_incremental query pins
against a 3-epoch UNROLLED SQL oracle (the cut-at-emission epoch
structure expressed as per-epoch cumulative fh counts; see
plans/streaming_queries-style template in text_queries).

Scale: per-batch work = tokenizing the BATCH (map-side winnowing),
one fh equi-join against stored fingerprint rows, a count merge over
the (tiny) per-fh count parts, and a delta-sized write; the base
index is never rewritten.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

WINNOW_PTR = "_WINNOW_COMMITTED"
COMPACT_MARKER = "_COMPACTING"


def _read_ptr(index_path: str) -> tuple[int, str] | None:
    p = os.path.join(index_path, WINNOW_PTR)
    if not os.path.exists(p):
        return None
    epoch, _, run = open(p).read().strip().partition("\t")
    return int(epoch), run


def _write_ptr(index_path: str, epoch: int, run: str) -> None:
    tmp = os.path.join(index_path, WINNOW_PTR + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"{epoch}\t{run}")
    os.replace(tmp, os.path.join(index_path, WINNOW_PTR))


def _committed_deltas(index_path: str) -> list[str]:
    ptr = _read_ptr(index_path)
    if ptr is None:
        return []
    droot = os.path.join(index_path, "deltas")
    if not os.path.isdir(droot):
        return []
    out = [
        os.path.join(droot, d)
        for d in os.listdir(droot)
        if d.startswith("e") and d[1:].isdigit() and int(d[1:]) <= ptr[0]
    ]
    return sorted(out, key=lambda p: int(os.path.basename(p)[1:]))


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
    _recover_compaction(index_path)
    fp = spark.read.parquet(index_path + "/base/fp")
    cnt = spark.read.parquet(index_path + "/base/fp_counts")
    for d in _committed_deltas(index_path):
        fp = fp.unionByName(spark.read.parquet(d + "/fp"))
        cnt = cnt.unionByName(spark.read.parquet(d + "/fp_counts"))
    cnt = cnt.groupBy("fh").agg(F.sum("n_docs").alias("n_docs"))
    return fp, cnt


def _recover_compaction(index_path: str) -> None:
    """dedup_maintenance._recover_compaction's recipe over the single
    base/ unit: marker records the max folded epoch; which of
    base/_base_old/_base_compact_tmp exist determines abort / finish
    swap / finish cleanup."""
    marker = os.path.join(index_path, COMPACT_MARKER)
    base = os.path.join(index_path, "base")
    old = os.path.join(index_path, "_base_old")
    tmp = os.path.join(index_path, "_base_compact_tmp")
    if not os.path.exists(marker):
        shutil.rmtree(tmp, ignore_errors=True)  # pre-marker orphan
        return
    max_epoch = int(open(marker).read().strip())
    if os.path.isdir(tmp) and os.path.isdir(base) and not os.path.isdir(old):
        shutil.rmtree(tmp)
        os.remove(marker)
        return
    if os.path.isdir(old) and not os.path.isdir(base):
        os.rename(tmp, base)
    droot = os.path.join(index_path, "deltas")
    if os.path.isdir(droot):
        for d in os.listdir(droot):
            if d.startswith("e") and d[1:].isdigit() and int(d[1:]) <= max_epoch:
                shutil.rmtree(os.path.join(droot, d), ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)


def compact_winnow_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base. Pure physical rewrite: the
    folded fp set and summed counts equal the union the readers
    already saw; meta is invariant. MAINTAINER MUST BE STOPPED. The
    maintenance pointer survives (epoch high-water must keep replayed
    epochs skipping). Returns {"deltas_folded": n}."""
    _recover_compaction(index_path)
    deltas = _committed_deltas(index_path)
    if not deltas:
        return {"deltas_folded": 0}
    max_epoch = max(int(os.path.basename(d)[1:]) for d in deltas)
    fp, cnt = read_winnow_index(spark, index_path)
    base = os.path.join(index_path, "base")
    old = os.path.join(index_path, "_base_old")
    tmp = os.path.join(index_path, "_base_compact_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    fp.repartition("fh").sortWithinPartitions("fh").write.mode(
        "overwrite"
    ).parquet(tmp + "/fp")
    cnt.write.mode("overwrite").parquet(tmp + "/fp_counts")
    if os.path.isdir(base + "/meta"):
        shutil.copytree(base + "/meta", tmp + "/meta")
    marker = os.path.join(index_path, COMPACT_MARKER)
    with open(marker + ".tmp", "w") as f:
        f.write(str(max_epoch))
    os.replace(marker + ".tmp", marker)
    os.rename(base, old)
    os.rename(tmp, base)
    for d in deltas:
        shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)
    return {"deltas_folded": len(deltas)}


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
    BEFORE the stream starts (sizing/version mismatch = silent
    zero-overlap, so it raises here instead). Caller awaits the
    query."""
    from cdc_via_flink_spark.operators.winnow import (
        check_winnow_meta,
        incremental_pairs_against,
        winnow_fingerprints,
    )

    check_winnow_meta(new_docs.sparkSession, index_path + "/base")
    run_key = os.path.abspath(checkpoint_dir)
    droot = os.path.join(index_path, "deltas")

    def sink(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        committed = _read_ptr(index_path)
        if committed is not None and committed[1] not in ("", run_key):
            raise RuntimeError(
                f"winnow index {index_path!r} is maintained by checkpoint "
                f"{committed[1]!r}; refusing epochs from {run_key!r} — "
                "epoch ids are checkpoint-scoped."
            )
        if committed is not None and epoch_id <= committed[0]:
            return  # replayed epoch already committed — skip
        os.makedirs(droot, exist_ok=True)
        os.makedirs(pairs_out, exist_ok=True)
        for root in (droot, pairs_out):
            for d in os.listdir(root):
                if d.startswith("_tmp_"):
                    shutil.rmtree(os.path.join(root, d), ignore_errors=True)

        fp_old, cnt_old = read_winnow_index(spark, index_path)
        pairs = incremental_pairs_against(fp_old, cnt_old, batch)
        ptmp = os.path.join(pairs_out, f"_tmp_{uuid.uuid4().hex}")
        pairs.write.mode("overwrite").parquet(ptmp)
        pfinal = os.path.join(pairs_out, f"e{epoch_id}")
        if os.path.isdir(pfinal):
            shutil.rmtree(pfinal)  # crash between renames: rewrite
        os.replace(ptmp, pfinal)

        fp_b = winnow_fingerprints(batch)
        dtmp = os.path.join(droot, f"_tmp_{uuid.uuid4().hex}")
        fp_b.write.mode("overwrite").parquet(dtmp + "/fp")
        fp_b.groupBy("fh").agg(F.count(F.lit(1)).alias("n_docs")).write.mode(
            "overwrite"
        ).parquet(dtmp + "/fp_counts")
        dfinal = os.path.join(droot, f"e{epoch_id}")
        if os.path.isdir(dfinal):
            shutil.rmtree(dfinal)
        os.replace(dtmp, dfinal)
        _write_ptr(index_path, epoch_id, run_key)

    return (
        new_docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_emitted_pairs(spark: SparkSession, pairs_out: str) -> DataFrame:
    """Union of all committed epochs' pair outputs."""
    dirs = sorted(
        os.path.join(pairs_out, d)
        for d in os.listdir(pairs_out)
        if d.startswith("e") and d[1:].isdigit()
    )
    out = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        out = out.unionByName(spark.read.parquet(d))
    return out
