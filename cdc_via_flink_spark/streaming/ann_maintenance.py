"""Streaming ANN index maintenance — incremental IVF append as new
vectors ARRIVE (SURVEY.md X2 index lifecycle, live form): each
micro-batch of embeddings is routed to the persisted index's FIXED
centroid set (operators/ivf.py append semantics) and committed as a
cluster-partitioned DELTA directory behind an atomically-renamed
pointer, so the index a prober sees is always a consistent base ∪
committed-deltas view and a probe after maintenance is value-identical
to probing a monolithic rebuild with the same centroids (the invariant
sim_ivf_append_topk pins with an exact oracle).

Exactly-once without rewriting the base: raw parquet appends are not
replay-safe (a restarted epoch would double-insert), so each epoch's
delta lands as its own dir:

  write  deltas/_tmp_<uuid>   (cluster-partitioned parquet)
  rename deltas/e<epoch>      (atomic dir rename)
  point  _MAINT_COMMITTED = "<epoch>\t<run-key>"

A replayed epoch <= the committed pointer is skipped; a crash between
rename and pointer leaves a deterministic dir the replay simply
rewrites; orphaned _tmp_* dirs are GC'd on the next batch. The pointer
records the checkpoint identity (run key) and the maintainer REFUSES a
different checkpoint against an existing maintenance lineage — epoch
ids are checkpoint-scoped (the retract_view.py lesson).

Scale: per-batch work is one map-side broadcast-argmin assignment of
the batch plus a delta-sized write; the base lists are never read or
rewritten. Readers take one extra parquet-path union per retained
delta — compaction (folding committed deltas into the base and
resetting the pointer) is the same rename recipe run offline.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.operators.ivf import assign_clusters

MAINT_PTR = "_MAINT_COMMITTED"


def _read_maint_ptr(index_path: str) -> tuple[int, str] | None:
    p = os.path.join(index_path, MAINT_PTR)
    if not os.path.exists(p):
        return None
    epoch, _, run = open(p).read().strip().partition("\t")
    return int(epoch), run


def _write_maint_ptr(index_path: str, epoch: int, run: str) -> None:
    tmp = os.path.join(index_path, MAINT_PTR + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"{epoch}\t{run}")
    os.replace(tmp, os.path.join(index_path, MAINT_PTR))


def committed_delta_dirs(index_path: str) -> list[str]:
    """Delta dirs covered by the committed pointer, epoch order."""
    ptr = _read_maint_ptr(index_path)
    if ptr is None:
        return []
    droot = os.path.join(index_path, "deltas")
    if not os.path.isdir(droot):
        return []
    out = []
    for d in sorted(os.listdir(droot)):
        if d.startswith("e") and d[1:].isdigit() and int(d[1:]) <= ptr[0]:
            out.append(os.path.join(droot, d))
    return sorted(out, key=lambda p: int(os.path.basename(p)[1:]))


def read_maintained_index(
    spark: SparkSession, index_path: str
) -> tuple[DataFrame, DataFrame]:
    """(assignments, centroids) over base lists ∪ committed deltas.
    All paths share the cluster_id partition layout, so a probe's
    dynamic partition pruning applies to every path in the union."""
    cents = spark.read.parquet(index_path + "/centroids")
    paths = [index_path + "/lists"] + committed_delta_dirs(index_path)
    assigned = spark.read.option("basePath", paths[0]).parquet(paths[0])
    for p in paths[1:]:
        assigned = assigned.unionByName(spark.read.parquet(p))
    return assigned, cents


COMPACT_MARKER = "_COMPACTING"


def _recover_compaction(index_path: str) -> None:
    """Make the index consistent after a crash at ANY point of
    compact_maintained_index's sequence (deterministic from side-dir
    state; runs automatically before compaction and may be called by
    loaders). States, keyed by which artifacts exist alongside the
    ``_COMPACTING`` marker (which records the max folded epoch):

      tmp + lists, no old  -> fold prepared but not applied: abort
                              (rm tmp, rm marker; deltas intact)
      old + tmp, no lists  -> crashed between the two renames: finish
                              (tmp -> lists), then cleanup
      old + lists, no tmp  -> swap done: cleanup (rm folded deltas,
                              rm old, rm marker)
      lists only           -> cleanup crashed mid-way: re-run the
                              idempotent delta removal, rm marker
    """
    marker = os.path.join(index_path, COMPACT_MARKER)
    lists = os.path.join(index_path, "lists")
    old = os.path.join(index_path, "_lists_old")
    tmp = os.path.join(index_path, "_lists_compact_tmp")
    if not os.path.exists(marker):
        # no compaction in flight; a stray tmp is a pre-marker orphan
        shutil.rmtree(tmp, ignore_errors=True)
        return
    max_epoch = int(open(marker).read().strip())
    if os.path.isdir(tmp) and os.path.isdir(lists) and not os.path.isdir(old):
        shutil.rmtree(tmp)
        os.remove(marker)
        return
    if os.path.isdir(old) and not os.path.isdir(lists):
        os.rename(tmp, lists)
    droot = os.path.join(index_path, "deltas")
    if os.path.isdir(droot):
        for d in os.listdir(droot):
            if d.startswith("e") and d[1:].isdigit() and int(d[1:]) <= max_epoch:
                shutil.rmtree(os.path.join(droot, d), ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)


def compact_maintained_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base lists (the Delta OPTIMIZE /
    FAISS merge analog for the ANN index): rewrite base ∪ deltas as
    one cluster-partitioned layout and drop the folded delta dirs.
    The maintenance pointer is left untouched — its epoch high-water
    must survive compaction so a replay of an already-folded epoch
    still skips (folding it again would double-insert).

    MAINTAINER MUST BE STOPPED (same contract as
    sources/writers.compact_parquet_dir): compaction under live
    appends would race the delta set. Crash at any step recovers
    deterministically via ``_recover_compaction``. Returns
    {"deltas_folded": n}."""
    _recover_compaction(index_path)
    deltas = committed_delta_dirs(index_path)
    if not deltas:
        return {"deltas_folded": 0}
    max_epoch = max(int(os.path.basename(d)[1:]) for d in deltas)
    assigned, _cents = read_maintained_index(spark, index_path)
    lists = os.path.join(index_path, "lists")
    old = os.path.join(index_path, "_lists_old")
    tmp = os.path.join(index_path, "_lists_compact_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)
    marker = os.path.join(index_path, COMPACT_MARKER)
    with open(marker + ".tmp", "w") as f:
        f.write(str(max_epoch))
    os.replace(marker + ".tmp", marker)
    os.rename(lists, old)
    os.rename(tmp, lists)
    for d in deltas:
        shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)
    return {"deltas_folded": len(deltas)}


def ann_maintenance_query(
    new_vectors: DataFrame,
    index_path: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the maintenance query over a streaming embeddings frame
    (vec_id long, embedding array<float>). Caller awaits."""
    run_key = os.path.abspath(checkpoint_dir)
    droot = os.path.join(index_path, "deltas")

    def sink(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        committed = _read_maint_ptr(index_path)
        if committed is not None and committed[1] not in ("", run_key):
            raise RuntimeError(
                f"ANN index {index_path!r} is maintained by checkpoint "
                f"{committed[1]!r}; refusing epochs from {run_key!r} — "
                "epoch ids are checkpoint-scoped. Use the original "
                "checkpoint or compact/rebuild the index."
            )
        if committed is not None and epoch_id <= committed[0]:
            return  # replayed epoch already committed — skip
        os.makedirs(droot, exist_ok=True)
        # GC orphaned staging dirs from crashed epochs
        for d in os.listdir(droot):
            if d.startswith("_tmp_"):
                shutil.rmtree(os.path.join(droot, d), ignore_errors=True)

        cents = spark.read.parquet(index_path + "/centroids")
        assigned = assign_clusters(batch, cents)
        tmp = os.path.join(droot, f"_tmp_{uuid.uuid4().hex}")
        assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)
        final = os.path.join(droot, f"e{epoch_id}")
        if os.path.isdir(final):
            # crash between rename and pointer: the replay rewrites
            # the deterministic delta
            shutil.rmtree(final)
        os.replace(tmp, final)
        _write_maint_ptr(index_path, epoch_id, run_key)

    return (
        new_vectors.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
